"""Skew-resistant aggregation (100 TB design note, SURVEY §4.3 extension).

A hot grouping key (one language, one event_type, one near-empty text
hash…) concentrates an entire reduce partition on one executor. The classic
fix is two-phase salted aggregation: partial-aggregate on (key, salt) —
spreading the hot key over ``n_salts`` reducers — then re-aggregate on key.
Exact for any associative+commutative aggregate (count/sum/min/max); the
result is salt-independent, so it stays oracle-checkable in plain SQL.

Spark's AQE skew handling (spark.sql.adaptive.skewJoin) covers JOIN skew at
runtime; aggregation skew still needs this plan shape when the partial
(map-side) combine can't compress the hot key enough — e.g. high-cardinality
secondary grouping or collect-style aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the (large, skewed) left side gets a salt
    in [0, n_salts); the (small) right side is replicated once per salt via
    ``explode(sequence(...))``; the join key becomes (on…, salt), so a hot
    key's rows spread over ``n_salts`` reducers instead of melting one
    executor. EXACT for inner/left joins — each left row still meets each
    matching right row exactly once (on its own salt), so the result is
    salt-independent and plain-SQL oracle-checkable.

    AQE's skew-join split handles moderate runtime skew; this is the
    explicit plan-shape fix when one key exceeds what a single task can
    hold, at the cost of an n_salts× replication of the right side —
    keep the right side the small one.
    """
    allowed = {
        "inner", "left", "left_outer", "leftouter",
        "left_semi", "leftsemi", "left_anti", "leftanti",
    }
    if how not in allowed:
        # right/full outer would emit each UNMATCHED replicated right row
        # once per salt — wrong by construction
        raise ValueError(f"salted_join supports {sorted(allowed)}, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    salted_l = left.withColumn(
        "_salt", F.pmod(F.spark_partition_id(), F.lit(n_salts))
    )
    salted_r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_l.join(salted_r, [*keys, "_salt"], how).drop("_salt")


def salted_count_sum(
    df: DataFrame,
    key_cols: list[str],
    value_col: str | None = None,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase count(+sum) per key: (key..., n_rows[, sum_value]).

    Salt = spark_partition_id() mod n_salts — free to compute, already
    uniform over input partitions, and irrelevant to the final result
    (both phases are exact)."""
    salt = F.pmod(F.spark_partition_id(), F.lit(n_salts)).alias("_salt")
    partial_aggs = [F.count("*").alias("_n")]
    final_aggs: list[Column] = [F.sum("_n").alias("n_rows")]
    if value_col is not None:
        partial_aggs.append(F.sum(value_col).alias("_s"))
        final_aggs.append(F.sum("_s").alias("sum_value"))
    partial = df.withColumn("_salt", salt).groupBy(*key_cols, "_salt").agg(
        *partial_aggs
    )
    return partial.groupBy(*key_cols).agg(*final_aggs)
