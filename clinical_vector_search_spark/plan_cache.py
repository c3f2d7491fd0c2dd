"""Cache-handle registry for prepared plans (see pipeline/modes.py).

A mode build may ``.cache()`` sub-frames several layers down (e.g. the
BM25 postings index inside ``rag_pipeline``). Whoever owns the prepared
plan must also own those handles so eviction can ``unpersist()`` them —
otherwise MEMORY_AND_DISK blocks evicted from storage memory spill to
executor disk and live until app exit. ``tracked_cache`` is the one
cache-point used by plan-building code: inside a registered build it
appends the handle to the active registry; outside one it is a plain
``.cache()`` whose lifecycle the caller owns.

The registry is **thread-local and reentrant**: a long-lived server may
build plans from several request threads at once, and a build may itself
invoke another cached build (nested ``begin_build``/``end_build`` pairs
form a per-thread stack, so an inner build's handles never leak into —
or get stolen by — the outer build's registry).
"""

from __future__ import annotations

import itertools
import threading

from pyspark.sql import DataFrame

_TLS = threading.local()
_PIN_SEQ = itertools.count()


def _stack() -> list[list[DataFrame]]:
    s = getattr(_TLS, "stack", None)
    if s is None:
        s = _TLS.stack = []
    return s


def tracked_cache(df: DataFrame) -> DataFrame:
    df = df.cache()
    s = _stack()
    if s:
        s[-1].append(df)
    return df


def pin(df: DataFrame, eager: bool = True) -> DataFrame:
    """Multi-consumer pin for CORPUS-SCALE intermediates — the one
    policy point for "this frame is consumed by N subtrees and Spark
    will not reuse the exchange across them" (r16, VERDICT r15 task 3).

    Implementation: ``persist(MEMORY_AND_DISK)``, NOT ``localCheckpoint``.
    localCheckpoint truncates lineage and stores non-reliable blocks on
    executors — at the 100 TB target one lost executor kills the whole
    job with no recompute path, and the blocks can neither spill
    beyond their executor nor be rebuilt. persist keeps the lineage
    (lost blocks recompute), spills to disk under memory pressure, and
    shows up in plans as the same InMemoryTableScan reuse the pin
    exists for. Iterative DRIVER LOOPS (dedup label propagation, BPE,
    k-means) keep localCheckpoint deliberately: there the point is
    truncating a per-round growing plan, the pinned frames are
    batch-/vocab-bounded, and a loop re-derivation is the failure mode
    being paid for.

    ``eager=True`` (default) materializes the cache with one
    ``count()`` before returning — broadcast-exchange subtrees build
    CONCURRENTLY at execution, so a lazy cache can be computed twice by
    racing broadcast stages before either populates it; one cheap
    column-complete pass (DataFrame caches store whole rows) keeps the
    upstream corpus pass single-run, which is the measured behavior the
    r15 numbers were taken under. Callers that merely want reuse across
    their OWN sequential actions may pass ``eager=False``.

    Lifecycle: the pin routes through :func:`tracked_cache`, so inside
    a registered plan build (``begin_build``/``end_build``) the handle
    is owned — and unpersisted — by the build's plan-cache entry;
    outside one the caller owns it (operators that pin inside a
    one-shot plan intentionally leak the blocks to the session, exactly
    as the former localCheckpoint did).

    Per-call cache identity: Spark's CacheManager keys entries on the
    CANONICALIZED ANALYZED PLAN, so a second ``pin`` of an identical
    plan (same source paths, same expressions) would silently resolve
    to the FIRST call's cached blocks. That aliasing is wrong twice:
    (a) correctness — a read-back view over a MUTABLE directory index
    (``bm25_read_index`` over ``df/``) folded once stays frozen across
    later ingests (caught by test_maintained_index: stale n_docs/avgdl
    after a batch add); (b) measurement — a re-run of the same operator
    would serve the previous run's cache instead of recomputing from
    the inputs. A per-call unique always-true filter literal keys each
    pin privately; the optimizer constant-folds it out of the physical
    plan, so the executed plan is unchanged — exactly localCheckpoint's
    per-call semantics, with recomputable lineage."""
    from pyspark.sql import functions as F

    df = df.filter(F.lit(f"__pin_{next(_PIN_SEQ)}").isNotNull())
    df = tracked_cache(df)
    if eager:
        df.count()
    return df


def begin_build() -> None:
    _stack().append([])


def end_build() -> list[DataFrame]:
    s = _stack()
    return s.pop() if s else []


def unpersist_all(handles: list[DataFrame]) -> None:
    """Best-effort non-blocking unpersist (session may already be gone)."""
    for h in handles:
        try:
            h.unpersist(blocking=False)
        except Exception:  # noqa: BLE001
            pass
