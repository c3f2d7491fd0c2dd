"""Retrieval-evaluation metrics as grouped aggregations (SURVEY.md §2.5).

The reference computes these driver-side over Python lists
(src/pipeline/evaluation.py:46-63, evaluation.py:70-82,316-324); here they
are expressions over a rank-joined results table so they distribute — one
shuffle on query_id, then pure aggregation.

Inputs are two "results" DataFrames with columns (query_id, rank, doc_id):
``base`` is the ground-truth ranking (exact search — the reference's oracle,
evaluation.py:202-208) and ``other`` the system under test.

Metric definitions reproduced exactly, including the NONSTANDARD "NDCG"
(evaluation.py:70-74,316-324): relevance of other[i] = the doc's 1-based
position in the BASELINE list (0 if absent) — so a doc that baseline ranked
LAST contributes the LARGEST gain; gain weight for other-position r is
1/log2(r+1); score = Σ rel·w / Σ w. Values can exceed 1 (4.4047 in
evaluation_results.csv:2) and must NOT be "corrected" to textbook NDCG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def evaluate_against_baseline(
    base: DataFrame, other: DataFrame, k: int
) -> DataFrame:
    """Per-query recall/precision/accuracy/MRR/"NDCG" of ``other`` vs ``base``.

    A1 recall@k    = |base ∩ other| / |base|      (src/pipeline/evaluation.py:46-47)
    A2 precision@k = |base ∩ other| / |other|     (:50-51)
    A3 accuracy@k  = mean(position-wise id match) (:54-55, evaluation.py:77-82)
    A4 MRR         = 1/rank of first hit else 0   (:59-63)
    A5 "NDCG"@k    = Σ rel/log2(rank+1) / Σ 1/log2(rank+1), where rel of
                     other[rank] = base_rank (the doc's 1-based baseline
                     position) if present else 0 (evaluation.py:316-324).
    """
    b = base.select(
        F.col("query_id"), F.col("rank").alias("b_rank"), F.col("doc_id")
    )
    o = other.select(
        F.col("query_id"), F.col("rank").alias("o_rank"), F.col("doc_id")
    )

    # hits: other rows annotated with their baseline rank (null if absent)
    hits = o.join(b, ["query_id", "doc_id"], "left")

    per_query = hits.groupBy("query_id").agg(
        (F.count("b_rank") / F.lit(float(k))).alias("recall"),
        (F.count("b_rank") / F.count("*").cast("double")).alias("precision"),
        F.avg(
            F.when(F.col("b_rank") == F.col("o_rank"), 1.0).otherwise(0.0)
        ).alias("accuracy"),
        F.coalesce(
            F.lit(1.0)
            / F.min(F.when(F.col("b_rank").isNotNull(), F.col("o_rank"))),
            F.lit(0.0),
        ).alias("mrr"),
        (
            F.sum(
                F.coalesce(F.col("b_rank").cast("double"), F.lit(0.0))
                / F.log2(F.col("o_rank").cast("double") + F.lit(1.0))
            )
            / F.sum(F.lit(1.0) / F.log2(F.col("o_rank").cast("double") + F.lit(1.0)))
        ).alias("ndcg"),
    )
    return per_query


def set_overlap(base: DataFrame, other: DataFrame) -> DataFrame:
    """R6: |A∩B| / |A| per query over two results tables
    (src/pipeline/evaluation.py:46-47, pipeline_mode.py:184)."""
    b = base.groupBy("query_id").agg(F.collect_set("doc_id").alias("a"))
    o = other.groupBy("query_id").agg(F.collect_set("doc_id").alias("b"))
    return b.join(o, "query_id").select(
        "query_id",
        (
            F.size(F.array_intersect("a", "b")).cast("double")
            / F.size("a").cast("double")
        ).alias("overlap"),
    )
