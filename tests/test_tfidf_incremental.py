"""TF-IDF index maintenance lifecycle (add / delete / compact / serve),
the VSM twin of the BM25 lifecycle tests in test_bm25.py: the
reconstructed view must be VALUE-IDENTICAL to a one-shot `tfidf_index`
over the surviving corpus at every step — the additive statistics (tf
postings, df deltas, n_docs scalars) make that an exact-integer
contract, with idf refolded at read time."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clinical_vector_search_spark.operators.sparse import (
    tfidf_cosine_topk,
    tfidf_index,
    tfidf_index_add,
    tfidf_index_delete,
    tfidf_read_index,
    streaming_tfidf_ingest,
)


def _snap(df):
    return sorted(
        (r.doc, r.term, r.tf, round(r.idf, 10), round(r.w, 10))
        for r in df.collect()
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


def test_incremental_add_matches_one_shot(spark, docs, tmp_path):
    idx = str(tmp_path / "tfidf")
    for i in range(3):
        tfidf_index_add(spark, docs.filter(F.col("doc_id") % 3 == i), i, idx)
    got = _snap(tfidf_read_index(spark, idx))
    assert got == _snap(tfidf_index(docs)) and got

    # at-least-once retry of a batch id is bit-identical (overwrite sink)
    tfidf_index_add(spark, docs.filter(F.col("doc_id") % 3 == 1), 1, idx)
    assert _snap(tfidf_read_index(spark, idx)) == got


def test_delete_matches_one_shot_over_survivors(spark, docs, tmp_path):
    idx = str(tmp_path / "tfidf")
    tfidf_index_add(spark, docs, 0, idx)
    tfidf_index_delete(spark, docs.filter(F.col("doc_id") == 2), 0, idx)
    # doc 2 held the only 'zephyr'/'quorl' postings — those terms must
    # leave the vocabulary, and idf over the survivors must refold
    want = _snap(tfidf_index(docs.filter(F.col("doc_id") != 2)))
    after_first = _snap(tfidf_read_index(spark, idx))
    assert after_first == want

    # re-delete under a FRESH batch id: fenced no-op (no double-subtract)
    tfidf_index_delete(spark, docs.filter(F.col("doc_id") == 2), 1, idx)
    assert _snap(tfidf_read_index(spark, idx)) == after_first

    # mixed batch (already-deleted 2 + live 4, 4 duplicated): only 4's
    # deltas apply, once
    mixed = docs.filter(F.col("doc_id").isin(2, 4)).unionByName(
        docs.filter(F.col("doc_id") == 4)
    )
    tfidf_index_delete(spark, mixed, 2, idx)
    want2 = _snap(tfidf_index(docs.filter(~F.col("doc_id").isin(2, 4))))
    assert _snap(tfidf_read_index(spark, idx)) == want2

    # at-least-once retry of the mixed batch id: bit-identical
    tfidf_index_delete(spark, mixed, 2, idx)
    assert _snap(tfidf_read_index(spark, idx)) == want2


def test_compaction_preserves_view_and_fences_redelivery(
    spark, docs, tmp_path
):
    from clinical_vector_search_spark.io.tables import (
        compact_batched,
        compact_tombstoned,
    )

    idx = str(tmp_path / "tfidf")
    b0 = docs.filter(F.col("doc_id") < 3)
    b1 = docs.filter(F.col("doc_id") >= 3)
    tfidf_index_add(spark, b0, 0, idx)
    tfidf_index_delete(spark, docs.filter(F.col("doc_id") == 2), 0, idx)
    before = _snap(tfidf_read_index(spark, idx))

    for sub in ("df", "scalars"):
        compact_batched(spark, f"{idx}/{sub}")
    # physical erasure of tombstoned postings + tombstone clear
    assert compact_tombstoned(
        spark, f"{idx}/postings", f"{idx}/deleted", "doc"
    ) >= 1
    assert _snap(tfidf_read_index(spark, idx)) == before

    # redelivery of the folded ingest batch is refused loudly
    with pytest.raises(ValueError, match="already"):
        tfidf_index_add(spark, b0, 0, idx)
    # fresh batches keep ingesting and still reconstruct exactly
    tfidf_index_add(spark, b1, 1, idx)
    assert _snap(tfidf_read_index(spark, idx)) == _snap(
        tfidf_index(docs.filter(F.col("doc_id") != 2))
    )


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


def test_streaming_tfidf_ingest_matches_one_shot(spark, docs, tmp_path):
    docs_path = str(tmp_path / "docs")
    docs.repartition(3).write.parquet(docs_path)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(docs_path)
    )
    idx = str(tmp_path / "tfidf")
    qy = streaming_tfidf_ingest(
        spark, stream, idx,
        checkpoint_path=str(tmp_path / "ckpt"), run_id="day1",
    )
    assert qy.awaitTermination(300)
    assert len(qy.recentProgress) > 1  # >1 micro-batch actually ran
    got = _snap(tfidf_read_index(spark, idx))
    assert got == _snap(tfidf_index(docs)) and got
    import os

    assert any(
        d.startswith("batch-day1-") for d in os.listdir(f"{idx}/postings")
    )
