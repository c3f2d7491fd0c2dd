"""2-D skyline (Pareto frontier) as window arithmetic — the classic
"preference query" operator (Börzsönyi et al., ICDE 2001) relational
engines ship as a dedicated SKYLINE clause. No reference analog;
training-data use: pick non-dominated corpus slices / model configs on
two competing axes (quality vs cost, recall vs latency).

A point q is DOMINATED iff some p has p.x ≥ q.x AND p.y ≥ q.y with at
least one strict. The naive spelling is the O(n²) NOT-EXISTS self-join
(exactly what the DuckDB oracle runs); here the 2-D case collapses to
per-x group maxima plus ONE reverse running max over the distinct-x
frame:

- m_eq = max(y) per x group                         → q survives case
  "p.x = q.x, p.y > q.y" iff y = m_eq;
- m_gt = running max of m_eq over STRICTLY larger x → q survives case
  "p.x > q.x, p.y ≥ q.y" iff m_gt < y (NULL-safe: no larger x at all).

Exact-duplicate points (x and y both equal) dominate neither and all
survive — the standard skyline convention.

Scale note: x should be an integer-exact key (the repo's cents
convention — double keys make cross-engine equality an ulp lottery).
The global window is unpartitioned (skylines are global by definition)
but runs at DISTINCT-X granularity with an O(n) ROWS running frame —
NOT the per-row RANGE(1, unboundedFollowing) spelling, whose
UnboundedFollowingWindowFunctionFrame re-scans per row: O(n²) in one
task (measured quadratic at 25k/50k/100k rows — tools/scale_probe.py).
Callers still aggregate the fact table to one row per entity first;
for entity counts beyond one task, ``local_prefilter=True`` adds a
zero-shuffle per-partition local skyline (a superset-filter of the
global one — the classic distributed-skyline reduction) so the global
step sees only local survivors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _local_skyline_prefilter(
    df: DataFrame, x_col: str, y_col: str
) -> DataFrame:
    """Per-partition local skyline — the distributed-skyline reduction
    (Börzsönyi et al.): a point dominated by a co-partitioned point is
    dominated globally, so dropping it is safe, and every GLOBAL skyline
    point is dominated by nothing and survives any local pass — local
    output ⊇ global skyline (property-tested). Zero shuffle: one
    ``mapInPandas`` over whatever partitions the input already has
    (Arrow may split a partition into several batches; a per-batch
    skyline is just a finer-grained — weaker but still correct —
    superset filter). The global window then sorts survivors only:
    at N entities across P tasks the unpartitioned sort sees ~the
    skyline-candidate count instead of N."""
    import numpy as np

    def local(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            x = pdf[x_col].to_numpy()
            y = pdf[y_col].to_numpy()
            # Spark SQL orders NaN ABOVE every double and NaN==NaN is
            # true, while every numpy comparison against NaN is False —
            # raw comparisons would silently drop NaN-y rows here that
            # the global window keeps. Compare through a NaN→+inf
            # substitute so the local pass uses Spark's ordering. (The
            # one remaining divergence — y mixing literal +inf WITH NaN,
            # where Spark ranks NaN strictly above inf but this
            # substitute ties them — is outside the operator contract;
            # see skyline_2d's docstring.)
            y = np.where(np.isnan(y), np.inf, y)
            order = np.lexsort((-y, -x))  # x desc, y desc
            xs, ys = x[order], y[order]
            new_grp = np.empty(n, dtype=bool)
            new_grp[0] = True
            new_grp[1:] = xs[1:] != xs[:-1]
            gid = np.cumsum(new_grp) - 1
            gmax = ys[new_grp]  # y desc within x → first of group is max
            prefix = np.concatenate(
                ([-np.inf], np.maximum.accumulate(gmax)[:-1])
            )  # max y over STRICTLY larger x, by group
            keep_sorted = (ys > prefix[gid]) & (ys == gmax[gid])
            mask = np.zeros(n, dtype=bool)
            mask[order[keep_sorted]] = True
            yield pdf[mask]

    return df.mapInPandas(local, df.schema)


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    local_prefilter: bool = False,
) -> DataFrame:
    """Rows of ``df`` on the maximal (x, y) Pareto frontier.

    ``x_col`` must be integer-typed (exact cross-engine group keys);
    ``y_col`` any orderable numeric — NaN is handled (it ranks above
    every double, Spark SQL semantics, in BOTH the global window and
    the local prefilter), but a ``y_col`` mixing literal ``+inf`` with
    NaN is outside the contract: Spark ranks NaN strictly above inf
    while the prefilter's NaN→inf comparison substitute ties them, so
    the two paths can disagree on exactly that input. Rows with a NULL
    coordinate are excluded by contract (a NULL x or y neither
    dominates nor is dominated meaningfully) — enforced with explicit
    ``isNotNull`` filters rather than left to the join/comparison
    null-propagation, so the behavior is the same on every path.
    Preserves all input columns and appends nothing; output rows are
    exactly the non-dominated input rows (duplicates included).

    ``local_prefilter=True`` inserts the zero-shuffle per-partition
    local-skyline superset filter before the global step — identical
    results (property-tested). With the O(n) distinct-x window the
    global step no longer cliffs quadratically, but the prefilter still
    collapses the x-shuffle and the single-task distinct-x frame to
    ~the local-survivor count — the right shape when candidates exceed
    one task. Off by default: at the intended candidate granularity
    (one row per entity after aggregation) the extra Python stage costs
    more than it saves.
    """
    # NULL exclusion is explicit, not an artifact: a NULL x would only
    # ever vanish implicitly (the join back on x never matches NULL)
    # and a NULL y would fail the y == m_eq comparison — filter both up
    # front so every path behaves identically.
    df = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    if local_prefilter:
        # Arrow collapses SQL NULL and NaN to the same pandas NaN in
        # BOTH directions, so the pandas stage can't tell them apart.
        # SQL NULLs were dropped JVM-side above — so every NaN the
        # prefilter sees, and every NULL it hands back, is an original
        # NaN, which we restore so the global window applies the same
        # NaN-ranks-top semantics the plain path does.
        df = _local_skyline_prefilter(df, x_col, y_col)
        df = df.withColumn(
            y_col,
            F.when(F.col(y_col).isNull(), F.lit(float("nan")))
            .otherwise(F.col(y_col)),
        )
    # m_gt (max y over STRICTLY larger x) at distinct-x granularity:
    # per-x group maxima, then a reverse RUNNING max over the distinct-x
    # frame excluding the current group. A ROWS running frame is O(n)
    # (incremental add); the former per-row spelling — RANGE(1,
    # unboundedFollowing) on the full input — hit Spark's
    # UnboundedFollowingWindowFunctionFrame, which re-scans the frame
    # per row: O(n²) in ONE task (measured: 25k rows 11 s, 50k 39 s,
    # 100k 151 s — tools/scale_probe.py). The single-task window now
    # sees one row per DISTINCT x and does linear work; the join back
    # on x reuses the groupBy's hash partitioning (or broadcasts when
    # the distinct-x frame is small — AQE decides).
    def fresh(base: str) -> str:  # collision-proof internal names
        while base in df.columns:
            base += "_"
        return base

    m_eq, m_gt = fresh("_m_eq"), fresh("_m_gt")
    gm = df.groupBy(x_col).agg(F.max(y_col).alias(m_eq))
    w_desc = (
        Window.orderBy(F.desc(x_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    gm = gm.withColumn(m_gt, F.max(m_eq).over(w_desc))
    cols = [c for c in df.columns]
    return (
        df.join(gm, x_col)
        .filter(
            (F.col(m_gt).isNull() | (F.col(m_gt) < F.col(y_col)))
            & (F.col(y_col) == F.col(m_eq))
        )
        .select(*cols)
    )
