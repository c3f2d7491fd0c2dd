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


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_spec: list[tuple[str, bool]],
    k: int,
    strategy: str = "partial",
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k rows per group — the quality-quota primitive ("keep the 5
    best docs per domain") — with a skew-safe scale path.

    ``order_spec`` is [(column, ascending), ...] and must be a total
    order within a group (add a unique id as the last key) so results
    are deterministic and oracle-checkable. Appends ``rank_col`` (1-based).

    ``strategy``:

    * ``"window"`` — the classic one-shuffle row_number window. One task
      sorts each group: fine until a hot group (one domain with 10⁹
      docs) funnels into a single straggler.
    * ``"partial"`` (default) — ZERO-shuffle Arrow-batch prune first:
      within every batch of every input partition, only a group's local
      top-k can contain a global top-k row, so each batch keeps ≤ k rows
      per group present in it (the same argument as kNN partial_topk).
      The global window then ranks ≤ k × n_batches candidates per group
      — the hot group's 10⁹ rows never meet one task. Prune order
      replicates Spark's null placement (asc ⇒ NULLS FIRST) so no
      candidate is lost; values pass through unchanged and the FINAL
      ranking is always the Spark window, so both strategies are
      bit-identical (equivalence-tested).
    """
    from pyspark.sql.window import Window

    if strategy not in ("window", "partial"):
        raise ValueError(f"unknown topk_per_group strategy: {strategy!r}")
    order_exprs = [
        (F.col(c).asc() if asc else F.col(c).desc()) for c, asc in order_spec
    ]
    w = Window.partitionBy(*group_cols).orderBy(*order_exprs)
    src = df
    if strategy == "partial":
        import pandas as pd
        import pyarrow as pa

        names = [c for c, _ in order_spec]
        ascs = [asc for _, asc in order_spec]
        schema = df.schema

        # mapInArrow + ArrowDtype-backed pandas, NOT mapInPandas: the
        # default Arrow→pandas conversion turns a nullable int64 batch
        # into float64, silently corrupting values past 2^53 on the way
        # THROUGH the prune (measured: two distinct 2^60-range ids
        # collapsing). ArrowDtype columns round-trip losslessly.
        def prune(batches):
            for batch in batches:
                if batch.num_rows == 0:
                    continue
                pdf = batch.to_pandas(types_mapper=pd.ArrowDtype)
                # iterative stable sorts, last key first, each with
                # Spark's null placement (asc=NULLS FIRST, desc=LAST)
                for c, asc in reversed(list(zip(names, ascs))):
                    pdf = pdf.sort_values(
                        c,
                        ascending=asc,
                        kind="mergesort",
                        na_position="first" if asc else "last",
                    )
                # dropna=False: a NULL group key is a group like any other
                # (pandas would silently drop those rows, diverging from
                # the window strategy)
                out = pdf.groupby(
                    list(group_cols), sort=False, dropna=False
                ).head(k)
                yield pa.RecordBatch.from_pandas(
                    out, schema=batch.schema, preserve_index=False
                )

        src = df.mapInArrow(prune, schema)
    return (
        src.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def bloom_filtered_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    m: int = 1 << 20,
    k: int = 5,
    how: str = "inner",
) -> DataFrame:
    """Semi-join reduction: probe the BIG side against a Bloom filter of
    the small side's keys BEFORE the join shuffle, so rows that cannot
    match never enter the exchange.

    This is the classic distributed-join optimization for the regime
    between "broadcast the small side" and "shuffle everything": at
    100 TB a 10⁸-key dimension is too big for a broadcast HASH TABLE
    (keys + values + object overhead) but its Bloom filter at ~10
    bits/key is ~125 MB — shippable to every scan task as a literal.
    With a 1% selective dimension the fact-side exchange shrinks ~100×,
    which is usually the whole job. Catalyst's own runtime row-group
    filters help only below thresholds and only for some plan shapes;
    this operator makes the reduction explicit and engine-portable.

    EXACT for ``inner`` and ``left_semi`` (the only allowed ``how``):
    Bloom false positives pass the probe but are dropped by the real
    join; false negatives cannot exist, so no matching row is lost.
    (Outer/anti joins are rejected — the probe removes non-matching big
    rows that an outer join must keep.)

    Keys are rendered as strings (cross-type, engine-portable md5). The
    driver materializes m/32 longs (2 MiB per 2²³ bits) — same bound as
    ``decontaminate_bloom``.
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(
            f"bloom_filtered_join is exact only for inner/left_semi, got {how!r}"
        )
    from clinical_vector_search_spark.functions.hashing import (
        bloom_build,
        bloom_probe,
        bloom_words_array,
    )

    keys = small.select(F.col(key).cast("string").alias("_k")).distinct()
    words = bloom_words_array(bloom_build(keys, "_k", m, k), m)
    probed = big.filter(
        bloom_probe(F.col(key).cast("string"), words, m, k)
    )
    return probed.join(small, key, how)
