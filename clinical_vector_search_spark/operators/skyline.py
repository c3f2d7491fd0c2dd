"""2-D skyline (Pareto frontier) as window arithmetic — the classic
"preference query" operator (Börzsönyi et al., ICDE 2001) relational
engines ship as a dedicated SKYLINE clause. No reference analog;
training-data use: pick non-dominated corpus slices / model configs on
two competing axes (quality vs cost, recall vs latency).

A point q is DOMINATED iff some p has p.x ≥ q.x AND p.y ≥ q.y with at
least one strict. The naive spelling is the O(n²) NOT-EXISTS self-join
(exactly what the DuckDB oracle runs); here the 2-D case collapses to
two window maxima, O(n log n) with ONE sort and zero joins:

- m_gt = max(y) over points with STRICTLY larger x  → q survives case
  "p.x > q.x, p.y ≥ q.y" iff m_gt < y (NULL-safe: no larger x at all);
- m_eq = max(y) over points with EQUAL x            → q survives case
  "p.x = q.x, p.y > q.y" iff y = m_eq.

Exact-duplicate points (x and y both equal) dominate neither and all
survive — the standard skyline convention.

Scale note: the strict-greater frame needs a RANGE window on x, so x
must be an integer-exact key (the repo's cents convention — a double
order key would make "strictly larger" an ulp lottery across engines).
The window is unpartitioned (skylines are global by definition), but it
runs at CANDIDATE granularity: callers aggregate the fact table to one
row per entity first, so the sorted frame is dimension-sized. For
entity counts beyond one task, pre-filter with per-partition local
skylines (a local skyline is a superset-filter of the global one) —
the classic distributed-skyline reduction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Rows of ``df`` on the maximal (x, y) Pareto frontier.

    ``x_col`` must be integer-typed (exact RANGE frame bounds);
    ``y_col`` any orderable numeric. Preserves all input columns and
    appends nothing; output rows are exactly the non-dominated input
    rows (duplicates included).
    """
    w_gt = (
        Window.orderBy(x_col)
        .rangeBetween(1, Window.unboundedFollowing)
    )
    w_eq = Window.partitionBy(x_col)
    m_gt = F.max(y_col).over(w_gt)
    m_eq = F.max(y_col).over(
        w_eq.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    return (
        df.withColumn("_m_gt", m_gt)
        .withColumn("_m_eq", m_eq)
        .filter(
            (F.col("_m_gt").isNull() | (F.col("_m_gt") < F.col(y_col)))
            & (F.col(y_col) == F.col("_m_eq"))
        )
        .drop("_m_gt", "_m_eq")
    )
