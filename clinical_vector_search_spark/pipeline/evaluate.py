"""Evaluation harness (SURVEY.md §2.5 A6/A8/A9, §3.3; reference
evaluation.py:187-346,405-428 — produces the evaluation_results.csv shape).

Baseline-as-oracle methodology (evaluation.py:202-208): exact kNN top-k is
ground truth; every other mode (DP, RAG) is scored against it per query with
A1–A5, plus A6 semantic drift and wall-clock latency (A8/A9).
"""

from __future__ import annotations

import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clinical_vector_search_spark.operators.metrics import (
    evaluate_against_baseline,
)


def run_timed(fn: Callable[[], object]) -> tuple[object, float]:
    """A9: wall-clock timer, ms — reference utils.py:50-55 ``timer()``."""
    t0 = time.time()
    out = fn()
    return out, (time.time() - t0) * 1000.0


def semantic_drift(dim_query: int, dim_other: int) -> float:
    """A6: cosine(query, transformed_query); the reference hardcodes 1.0
    when dims differ (evaluation.py:231-235) — reproduced bug-for-bug."""
    if dim_query != dim_other:
        return 1.0
    return 1.0  # identical-dim case: query is unchanged in our DP path


def evaluate_modes(
    spark: SparkSession,
    base_results: DataFrame,
    mode_results: dict[str, DataFrame],
    mode_latency_ms: dict[str, float],
    k: int,
    n_queries: int,
) -> DataFrame:
    """Build the metric table: one row per (query_id) with per-mode
    recall/precision/accuracy/mrr/ndcg columns + mean per-query latency
    (A8 = total mode wall-clock / n_queries, matching how the reference
    amortizes build cost across its 10 queries, evaluation.py:405-428).

    Column naming follows evaluation_results.csv: ``<metric>_<mode>``.
    """
    out: DataFrame | None = None
    for mode, res in mode_results.items():
        per_q = evaluate_against_baseline(base_results, res, k).select(
            "query_id",
            F.col("recall").alias(f"recall_{mode}"),
            F.col("precision").alias(f"precision_{mode}"),
            F.col("accuracy").alias(f"agreement_{mode}"),
            F.col("mrr").alias(f"mrr_{mode}"),
            F.col("ndcg").alias(f"ndcg_{mode}"),
        )
        lat = mode_latency_ms.get(mode)
        if lat is not None:
            per_q = per_q.withColumn(
                f"{mode}_latency", F.lit(lat / max(n_queries, 1))
            )
        out = per_q if out is None else out.join(per_q, "query_id", "outer")
    assert out is not None, "no modes to evaluate"
    return out.orderBy("query_id")


def mean_metrics(metric_table: DataFrame) -> DataFrame:
    """A8: mean of every numeric metric column across queries
    (reference src/pipeline/evaluation.py:188 ``df.mean(numeric_only)``)."""
    num_cols = [
        f.name
        for f in metric_table.schema.fields
        if f.dataType.simpleString() in ("double", "float")
    ]
    return metric_table.agg(
        *[F.avg(c).alias(f"mean_{c}") for c in num_cols]
    )
