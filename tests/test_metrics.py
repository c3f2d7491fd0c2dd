"""Metric golden tests on hand-computed tiny lists (SURVEY §5), including
the nonstandard reference "NDCG" (must match evaluation.py:70-74 values,
NOT textbook NDCG — self-compare @ k=10 = 4.4047 per evaluation_results.csv:2)."""

from __future__ import annotations

import math

import pytest

from clinical_vector_search_spark.operators.metrics import (
    evaluate_against_baseline,
    set_overlap,
)


def results_df(spark, data):
    return spark.createDataFrame(data, "query_id long, rank int, doc_id long")


def test_identical_lists_all_metrics(spark):
    base = results_df(spark, [(1, r, 100 + r) for r in range(1, 11)])
    m = evaluate_against_baseline(base, base, 10).collect()[0]
    assert m.recall == 1.0
    assert m.precision == 1.0
    assert m.accuracy == 1.0
    assert m.mrr == 1.0
    # reference "NDCG" self-compare @ k=10: Σ r/log2(r+1) / Σ 1/log2(r+1)
    num = sum(r / math.log2(r + 1) for r in range(1, 11))
    den = sum(1 / math.log2(r + 1) for r in range(1, 11))
    assert abs(m.ndcg - num / den) < 1e-9
    # evaluation_results.csv:2 golden value
    assert abs(m.ndcg - 4.4047) < 1e-3


def test_disjoint_lists(spark):
    base = results_df(spark, [(1, r, r) for r in range(1, 6)])
    other = results_df(spark, [(1, r, 100 + r) for r in range(1, 6)])
    m = evaluate_against_baseline(base, other, 5).collect()[0]
    assert m.recall == 0.0 and m.precision == 0.0
    assert m.accuracy == 0.0 and m.mrr == 0.0 and m.ndcg == 0.0


def test_partial_overlap_hand_computed(spark):
    # base: [1,2,3,4]; other: [3,9,1,8] at k=4
    base = results_df(spark, [(1, 1, 1), (1, 2, 2), (1, 3, 3), (1, 4, 4)])
    other = results_df(spark, [(1, 1, 3), (1, 2, 9), (1, 3, 1), (1, 4, 8)])
    m = evaluate_against_baseline(base, other, 4).collect()[0]
    assert m.recall == 2 / 4  # docs 3 and 1 hit
    assert m.precision == 2 / 4
    assert m.accuracy == 0.0  # no positional agreement
    assert m.mrr == 1.0  # first hit at other-rank 1
    # ndcg: rel = [3,0,1,0] (baseline ranks), weights 1/log2(r+1)
    w = [1 / math.log2(r + 1) for r in (1, 2, 3, 4)]
    expect = (3 * w[0] + 0 + 1 * w[2] + 0) / sum(w)
    assert abs(m.ndcg - expect) < 1e-9


def test_mrr_first_hit_not_rank1(spark):
    base = results_df(spark, [(1, 1, 5), (1, 2, 6)])
    other = results_df(spark, [(1, 1, 99), (1, 2, 98), (1, 3, 6)])
    m = evaluate_against_baseline(base, other, 2).collect()[0]
    assert m.mrr == 1 / 3


def test_set_overlap(spark):
    base = results_df(spark, [(1, 1, 10), (1, 2, 11), (1, 3, 12)])
    other = results_df(spark, [(1, 1, 12), (1, 2, 13), (1, 3, 10)])
    o = set_overlap(base, other).collect()[0]
    assert abs(o.overlap - 2 / 3) < 1e-9


def test_multi_query_grouping(spark):
    base = results_df(spark, [(1, 1, 1), (1, 2, 2), (2, 1, 7), (2, 2, 8)])
    other = results_df(spark, [(1, 1, 1), (1, 2, 2), (2, 1, 9), (2, 2, 10)])
    rows = {r.query_id: r for r in evaluate_against_baseline(base, other, 2).collect()}
    assert rows[1].recall == 1.0 and rows[2].recall == 0.0


def test_cohens_kappa_entry_semantics(spark):
    """κ hand-check through the entry's arithmetic: perfect agreement →
    κ = 1; agreement at exactly chance level → κ = 0."""
    # po == 1 ⇒ kappa == 1 regardless of marginals: every vector in its
    # own cluster-majority class. Build po/pe directly: (hits=n) case.
    # Validate on the formula level via tiny frames mirroring the plan.
    from pyspark.sql import functions as SF

    sc = spark.createDataFrame(
        [(0, 0), (1, 1), (0, 0), (1, 1)], "label long, pred long"
    )
    agree = sc.agg(
        SF.count(SF.lit(1)).alias("n"),
        SF.count_if(SF.col("label") == SF.col("pred")).alias("hits"),
    ).collect()[0]
    s = (
        sc.groupBy("label").agg(SF.count(SF.lit(1)).alias("n_l"))
        .join(sc.groupBy(SF.col("pred").alias("label")).agg(
            SF.count(SF.lit(1)).alias("n_p")), "label")
        .agg(SF.sum(SF.col("n_l") * SF.col("n_p")).alias("s"))
        .collect()[0]["s"]
    )
    po = agree["hits"] / agree["n"]
    pe = s / (agree["n"] ** 2)
    assert po == 1.0 and abs((po - pe) / (1 - pe) - 1.0) < 1e-12

    # chance-level: pred constant 0, labels half 0 half 1 -> po = 0.5,
    # pe = 0.5 * 1.0 = 0.5 -> kappa = 0
    sc2 = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 0), (1, 0)], "label long, pred long"
    )
    a2 = sc2.agg(
        SF.count(SF.lit(1)).alias("n"),
        SF.count_if(SF.col("label") == SF.col("pred")).alias("hits"),
    ).collect()[0]
    s2 = (
        sc2.groupBy("label").agg(SF.count(SF.lit(1)).alias("n_l"))
        .join(sc2.groupBy(SF.col("pred").alias("label")).agg(
            SF.count(SF.lit(1)).alias("n_p")), "label")
        .agg(SF.sum(SF.col("n_l") * SF.col("n_p")).alias("s"))
        .collect()[0]["s"]
    )
    po2, pe2 = a2["hits"] / a2["n"], s2 / (a2["n"] ** 2)
    assert po2 == 0.5 and pe2 == 0.5
    assert abs((po2 - pe2) / (1 - pe2)) < 1e-12
