"""TF-IDF maintained-index SERVING parity — the index-specific half of
the lifecycle coverage: the add/delete/compact/stream protocol tests
moved to the parameterized shared suite (test_maintained_index.py, r14),
which runs them over BM25, TF-IDF and IVF-PQ identically; what stays
here is the scoring contract only (served scores over the reconstructed
view == scores over a one-shot `tfidf_index`)."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clinical_vector_search_spark.operators.sparse import (
    tfidf_cosine_topk,
    tfidf_index,
    tfidf_index_add,
    tfidf_read_index,
)


@pytest.fixture()
def docs(spark):
    rows = [
        (0, "alpha bravo charlie delta"),
        (1, "alpha bravo echo"),
        (2, "zephyr quorl alpha"),
        (3, "bravo charlie foxtrot"),
        (4, "delta echo golf alpha bravo"),
        (5, "charlie golf hotel"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_served_scores_match_one_shot_index(spark, docs, tmp_path):
    idx = str(tmp_path / "tfidf")
    for i in range(2):
        tfidf_index_add(spark, docs.filter(F.col("doc_id") % 2 == i), i, idx)
    q = spark.createDataFrame(
        [("q0", "alpha", 1.0), ("q0", "charlie", 1.0), ("q1", "golf", 1.0)],
        "query_id string, term string, qtf double",
    )

    def score_snap(index):
        return sorted(
            (r.query_id, r.rank, r.doc_id, r.score)
            for r in tfidf_cosine_topk(index, q, 5).collect()
        )

    got = score_snap(tfidf_read_index(spark, idx))
    assert got == score_snap(tfidf_index(docs)) and got