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
