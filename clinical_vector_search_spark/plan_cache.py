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

import threading

from pyspark.sql import DataFrame

_TLS = threading.local()


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
