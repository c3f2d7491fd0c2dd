"""Z-order (Morton-curve) data layout clustering.

At 100 TB the cheapest query is the one that never reads the data:
parquet scans prune files and row groups whose column min/max statistics
exclude the predicate. Sorting by a single column gives tight statistics
for that column only; interleaving the bits of SEVERAL quantized columns
(the Morton / Z-order curve) keeps every participating dimension locally
clustered, so a write clustered by the z-key yields files whose min/max
envelopes cover a small fraction of EACH dimension's domain — multi-
dimensional predicates prune on all of them (the layout strategy behind
Delta/Iceberg OPTIMIZE ZORDER BY).

Everything here is deterministic integer arithmetic expressed with
built-in column functions (shift/mask/sum — JVM-side, codegen'd, exactly
reproducible in ANSI SQL for the DuckDB oracle): no UDFs, no sampling
other than the range partitioner's, no driver-side data movement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(
    cols: list[tuple[str, int, int]],
    bits: int = 8,
) -> Column:
    """Morton key for ``cols = [(name, lo, hi), ...]`` with ``bits`` of
    resolution per dimension.

    Each column is clamped to [lo, hi] and quantized to ``2**bits``
    integer buckets with exact integer arithmetic
    (``(x - lo) * 2**bits div (hi - lo + 1)``), then the bucket bits are
    interleaved dimension-major: output bit ``b * ndims + i`` is bit ``b``
    of dimension ``i``. Bounds are explicit (one ``agg(min, max)`` if the
    caller doesn't know them) so the key is a pure deterministic
    expression — the same value in Spark and the SQL oracle.

    ``ndims * bits`` must fit a signed long (<= 63).
    """
    n = len(cols)
    if n == 0:
        raise ValueError("zorder_key needs at least one column")
    if n * bits > 63:
        raise ValueError(f"{n} dims x {bits} bits exceeds a signed long")
    nb = 1 << bits
    terms = []
    for i, (name, lo, hi) in enumerate(cols):
        if hi < lo:
            raise ValueError(f"{name}: hi {hi} < lo {lo}")
        if (hi - lo + 1) > (2**63 - 1) // nb:
            # (x - lo) * nb must stay inside int64 or the bigint multiply
            # wraps (or throws under ANSI) and the curve is garbage
            raise ValueError(
                f"{name}: domain width {hi - lo + 1} x 2^{bits} buckets "
                f"overflows int64 — use fewer bits or pre-scale the column "
                f"(e.g. epoch-ns -> epoch-s) before clustering"
            )
        # `div` (not `/` + cast) keeps the quantization in exact integer
        # arithmetic — `/` detours through double and loses ulps once
        # (x - lo) * nb crosses 2^53
        q = (
            f"least({nb - 1}, ((greatest(cast({lo} as bigint),"
            f" least(cast({hi} as bigint), cast({name} as bigint)))"
            f" - {lo}) * {nb}) div {hi - lo + 1})"
        )
        for b in range(bits):
            terms.append(
                f"shiftleft(shiftright({q}, {b}) & 1, {b * n + i})"
            )
    return F.expr("cast(" + " + ".join(terms) + " as bigint)")


def zorder_key_sql(cols: list[tuple[str, object, object]], bits: int = 8) -> str:
    """ANSI-SQL rendering of :func:`zorder_key` (DuckDB-compatible) —
    the oracle twin, generated from the same spec so the two engines
    compute bit-identical keys. ``lo``/``hi`` may be int literals OR SQL
    scalar expressions (e.g. ``(SELECT min(k) FROM t)``) — the range
    arithmetic happens in SQL, so data-derived bounds stay in sync with a
    Spark side that collected the same min/max."""
    n = len(cols)
    nb = 1 << bits
    terms = []
    for i, (name, lo, hi) in enumerate(cols):
        q = (
            f"least({nb - 1}, ((greatest(({lo}), least(({hi}), {name}))"
            f" - ({lo})) * {nb}) // (({hi}) - ({lo}) + 1))"
        )
        for b in range(bits):
            terms.append(f"((({q} >> {b}) & 1) << {b * n + i})")
    return "(" + " + ".join(terms) + ")::BIGINT"


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[tuple[str, int, int]],
    n_files: int = 32,
    bits: int = 8,
) -> None:
    """Cluster ``df`` on the Morton curve of ``cols`` and write parquet.

    ``repartitionByRange`` on the z-key assigns contiguous curve segments
    to files (sampled range boundaries — one extra pass over the key
    column only), and the within-file sort tightens row-group statistics.
    Result: every file's min/max envelope on EVERY clustered column spans
    a small fraction of its domain, so predicates on any subset of the
    dimensions prune files/row groups at scan time. One wide shuffle —
    the same cost as any global sort — and nothing driver-side.
    """
    keyed = df.withColumn("_zkey", zorder_key(cols, bits))
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
