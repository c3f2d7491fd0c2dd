"""BM25 Okapi parity with a pure-Python rank_bm25 reimplementation.

The formula contract (operators/bm25.py docstring) is rank_bm25.BM25Okapi
with defaults k1=1.5, b=0.75, epsilon=0.25: Robertson idf with negatives
floored to epsilon * mean(raw idf), duplicate query terms scored per
occurrence. The oracle below reimplements that contract independently
(from the published Okapi BM25 formula — no rank_bm25 import needed).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from clinical_vector_search_spark.operators.bm25 import (
    bm25_index,
    bm25_score,
    bm25_score_index,
)

CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "a quick brown cat sleeps on the mat"),
    (2, "dogs and cats are common household pets"),
    (3, "the fox is quick and the fox is brown"),
    (4, "completely unrelated text about spark clusters"),
    (5, "spark spark spark distributed compute engine"),
]


def okapi_reference(corpus: list[str], query: list[str]) -> list[float]:
    """Independent BM25Okapi: k1=1.5 b=0.75 eps=0.25."""
    k1, b, eps = 1.5, 0.75, 0.25
    toks = [doc.lower().split() for doc in corpus]
    n = len(toks)
    avgdl = sum(len(t) for t in toks) / n
    df: dict[str, int] = {}
    for t in toks:
        for w in set(t):
            df[w] = df.get(w, 0) + 1
    raw = {w: math.log((n - d + 0.5) / (d + 0.5)) for w, d in df.items()}
    avg_idf = sum(raw.values()) / len(raw)
    idf = {w: (eps * avg_idf if v < 0 else v) for w, v in raw.items()}
    scores = []
    for t in toks:
        dl = len(t)
        s = 0.0
        for q in query:  # per occurrence
            if q not in idf:
                continue
            tf = t.count(q)
            s += idf[q] * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
        scores.append(s)
    return scores


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


@pytest.mark.parametrize(
    "query",
    [
        ["quick", "fox"],
        ["the"],  # high-df term → negative raw idf → epsilon floor
        ["spark", "spark"],  # duplicate terms → per-occurrence scoring
        ["zzz_absent"],
    ],
)
def test_bm25_matches_reference(docs, query):
    got = {
        r.doc_id: r.bm25 for r in bm25_score(docs, query).collect()
    }
    expect = okapi_reference([t for _, t in CORPUS], query)
    for i, e in enumerate(expect):
        assert abs(got[i] - e) < 1e-9, f"doc {i}: {got[i]} != {e}"


def test_index_reuse_across_queries(docs):
    idx = bm25_index(docs).cache()
    s1 = {r.doc_id: r.bm25 for r in bm25_score_index(idx, docs, ["fox"]).collect()}
    s2 = {r.doc_id: r.bm25 for r in bm25_score_index(idx, docs, ["cat"]).collect()}
    one = bm25_score(docs, ["fox"])
    assert s1 == {r.doc_id: r.bm25 for r in one.collect()}
    assert s2[1] > 0 and s1[3] > 0


def test_zero_overlap_scores_zero(docs):
    got = bm25_score(docs, ["nonexistent_term"]).collect()
    assert all(r.bm25 == 0.0 for r in got)
    assert len(got) == len(CORPUS)  # zero-score docs kept


def test_tfidf_cosine_topk_hand_check(spark):
    """Tiny-corpus hand check of the sparse tf-idf cosine: doc sharing
    the rarer query term outranks the doc sharing a common one; OOV
    query terms contribute nothing (including to the query norm)."""
    import math

    from clinical_vector_search_spark.operators.sparse import (
        tfidf_cosine_topk,
        tfidf_index,
    )

    docs = spark.createDataFrame(
        [
            (1, "apple banana"),
            (2, "apple cherry"),
            (3, "apple apple"),
        ],
        "doc_id long, text string",
    )
    idx = tfidf_index(docs)
    # idf: apple ln(3/3)=0, banana ln(3/1), cherry ln(3/1)
    q = spark.createDataFrame(
        [("q", "banana", 1.0), ("q", "apple", 1.0), ("q", "zzz_oov", 1.0)],
        "query_id string, term string, qtf double",
    )
    got = [
        (r.rank, r.doc_id, r.score)
        for r in tfidf_cosine_topk(idx, q, 10)
        .orderBy("rank")
        .collect()
    ]
    # doc 1: shares banana (idf ln3) -> cosine 1.0 (its vector is
    # exactly the banana axis after apple's idf-0 zeroes out; query
    # likewise; the OOV term contributes nothing to the query norm).
    # doc 2: only apple overlap (weight 0) -> dot 0, score 0.
    # doc 3 ("apple apple"): norm 0 -> undefined direction, EXCLUDED
    # (the zero-norm guard; ANSI division would otherwise raise).
    assert got[0][:2] == (1, 1) and abs(got[0][2] - 1.0) < 1e-9
    assert [g[1] for g in got] == [1, 2]
    assert got[1][2] == 0.0


def test_query_expansion_broadens_retrieval(spark):
    """PMI expansion must add terms to the query frame and pull in docs a
    plain single-term query cannot reach (docs containing only the
    collocate, not the original term)."""
    from clinical_vector_search_spark.functions.text import pmi_cooccurrence
    from clinical_vector_search_spark.operators.bm25 import (
        bm25_index,
        bm25_topk_set_df,
    )

    # 30 docs: 'alpha' and 'bravo' co-occur strongly; 5 docs have ONLY
    # 'bravo' — reachable solely through expansion
    rows = [(i, "alpha bravo filler%d" % i) for i in range(25)]
    rows += [(100 + i, "bravo lonely%d" % i) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pmi = pmi_cooccurrence(df, min_count=5)
    pairs = {(r.term_a, r.term_b) for r in pmi.collect()}
    assert ("alpha", "bravo") in pairs
    idx = bm25_index(df)
    plain = spark.createDataFrame(
        [("q", "alpha", 1.0)], ["query_id", "term", "qw"]
    )
    expanded = spark.createDataFrame(
        [("q", "alpha", 1.0), ("q", "bravo", 0.5)],
        ["query_id", "term", "qw"],
    )
    got_plain = {
        r.doc_id
        for r in bm25_topk_set_df(idx, plain, 30, round_to=6).collect()
    }
    got_exp = {
        r.doc_id
        for r in bm25_topk_set_df(idx, expanded, 30, round_to=6).collect()
    }
    only = {100 + i for i in range(5)}
    assert not (only & got_plain)
    assert only <= got_exp


def test_bm25_incremental_index_matches_one_shot(spark, sf_dir, tmp_path):
    """Folding the corpus in as 3 batches of additive sufficient
    statistics reconstructs the one-shot bm25_index view value-for-value
    (global idf/avgdl/epsilon floor rebuilt at read time), an
    at-least-once retry of a batch leaves the index bit-identical, and a
    LATER ingest shifts every global stat exactly as a full rebuild
    would (the live-stats property a baked-idf index cannot have)."""
    from clinical_vector_search_spark.operators.bm25 import (
        bm25_index,
        bm25_index_add,
        bm25_read_index,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 300)
    )
    first = docs.filter(F.col("doc_id") < 200)
    later = docs.filter(F.col("doc_id") >= 200)
    idx_path = str(tmp_path / "bm25_index")
    for i in range(2):
        bm25_index_add(
            spark, first.filter(F.col("doc_id") % 2 == i), i, idx_path
        )

    def snap(df):
        return sorted(
            (
                r.doc, r.term, r.tf, r.dl,
                round(r.idf, 10), r.n_docs, round(r.avgdl, 10),
            )
            for r in df.collect()
        )

    got = snap(bm25_read_index(spark, idx_path))
    assert got == snap(bm25_index(first)) and got
    # at-least-once retry: bit-identical state
    bm25_index_add(spark, first.filter(F.col("doc_id") % 2 == 1), 1, idx_path)
    assert snap(bm25_read_index(spark, idx_path)) == got
    # later ingest: stats refresh exactly like a full rebuild over the
    # grown corpus (n_docs/avgdl/idf all move)
    bm25_index_add(spark, later, 2, idx_path)
    assert snap(bm25_read_index(spark, idx_path)) == snap(bm25_index(docs))


def test_bm25_incremental_delete_matches_rebuild(spark, tmp_path):
    """bm25_index_delete runs the additive algebra in reverse: after a
    delete batch the reconstructed view must be value-identical to a
    one-shot bm25_index over the SURVIVING docs — including the epsilon
    floor's avg(raw_idf), which only matches if a term whose last doc
    died leaves the vocabulary (the df > 0 fold filter)."""
    from clinical_vector_search_spark.operators.bm25 import (
        bm25_index,
        bm25_index_add,
        bm25_index_delete,
        bm25_read_index,
    )

    rows = [
        (0, "alpha bravo charlie delta"),
        (1, "alpha bravo echo"),
        (2, "zephyr quorl alpha"),       # zephyr/quorl live ONLY here
        (3, "bravo charlie foxtrot"),
        (4, "delta echo golf alpha bravo"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = str(tmp_path / "bm25")
    bm25_index_add(spark, docs.filter(F.col("doc_id") < 3), 0, idx)
    bm25_index_add(spark, docs.filter(F.col("doc_id") >= 3), 1, idx)
    # delete doc 2 — its unique terms must vanish from the vocabulary
    bm25_index_delete(spark, docs.filter(F.col("doc_id") == 2), 0, idx)

    def snap(df):
        return sorted(
            (
                r.doc, r.term, r.tf, r.dl,
                round(r.idf, 10), r.n_docs, round(r.avgdl, 10),
            )
            for r in df.collect()
        )

    survivors = docs.filter(F.col("doc_id") != 2)
    got = snap(bm25_read_index(spark, idx))
    assert got == snap(bm25_index(survivors)) and got
    assert not any("zephyr" == t for _, t, *_ in got)
    # delete retry (at-least-once): bit-identical state
    bm25_index_delete(spark, docs.filter(F.col("doc_id") == 2), 0, idx)
    assert snap(bm25_read_index(spark, idx)) == got


def test_bm25_tombstone_compaction(spark, tmp_path):
    """compact_tombstoned over the postings + deleted directories erases
    tombstoned postings physically; the reconstructed view is unchanged
    (the negative df/scalar deltas stay — they encode the vocabulary
    shrink the rebuild parity depends on)."""
    from clinical_vector_search_spark.io.tables import compact_tombstoned
    from clinical_vector_search_spark.operators.bm25 import (
        bm25_index,
        bm25_index_add,
        bm25_index_delete,
        bm25_read_index,
    )

    rows = [
        (0, "alpha bravo charlie"),
        (1, "alpha echo foxtrot"),
        (2, "zephyr quorl alpha"),
        (3, "bravo charlie golf"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = str(tmp_path / "bm25")
    bm25_index_add(spark, docs, 0, idx)
    bm25_index_delete(spark, docs.filter(F.col("doc_id") == 2), 0, idx)

    def snap():
        return sorted(
            (
                r.doc, r.term, r.tf, r.dl,
                round(r.idf, 10), r.n_docs, round(r.avgdl, 10),
            )
            for r in bm25_read_index(spark, idx).collect()
        )

    before = snap()
    assert compact_tombstoned(
        spark, f"{idx}/postings", f"{idx}/deleted", "doc"
    ) >= 1
    assert snap() == before
    assert before == sorted(
        (
            r.doc, r.term, r.tf, r.dl,
            round(r.idf, 10), r.n_docs, round(r.avgdl, 10),
        )
        for r in bm25_index(docs.filter(F.col("doc_id") != 2)).collect()
    )


def test_bm25_compact_batched_fences_redelivery(spark, sf_dir, tmp_path):
    """After compact_batched folds a batch's df/scalar deltas into flat
    files, redelivering that batch must be refused — a recreated batch
    subdirectory would double-count its df/n_docs/sum_dl into idf and
    avgdl silently. Fresh batches keep ingesting and still reconstruct
    the one-shot scores exactly."""
    import pytest

    from clinical_vector_search_spark.io.tables import compact_batched
    from clinical_vector_search_spark.operators.bm25 import (
        bm25_index,
        bm25_index_add,
        bm25_read_index,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 120)
    )
    idx = str(tmp_path / "bm25_idx")
    b0 = docs.filter(F.col("doc_id") < 60)
    b1 = docs.filter(F.col("doc_id") >= 60)
    bm25_index_add(spark, b0, 0, idx)
    for sub in ("postings", "df", "scalars"):
        compact_batched(spark, f"{idx}/{sub}")
    with pytest.raises(ValueError, match="already"):
        bm25_index_add(spark, b0, 0, idx)
    bm25_index_add(spark, b1, 1, idx)

    def snap(df):
        return sorted(
            (
                r.doc, r.term, r.tf, r.dl,
                round(r.idf, 10), r.n_docs, round(r.avgdl, 10),
            )
            for r in df.collect()
        )

    assert snap(bm25_read_index(spark, idx)) == snap(bm25_index(docs))


def test_bm25_redelete_is_a_noop(spark, tmp_path):
    """Re-deleting an already-deleted doc under a FRESH delete-batch id
    must be a no-op, not a silent double-subtract of its df/n_docs/
    sum_dl deltas (the postings anti-join was always safe; the idf/avgdl
    statistics were not). A mixed batch subtracts only its genuinely
    live docs, within-batch duplicate rows collapse, and the same-id
    retry still works (the fence excludes the batch's own tombstones)."""
    from clinical_vector_search_spark.operators.bm25 import (
        bm25_index,
        bm25_index_add,
        bm25_index_delete,
        bm25_read_index,
    )

    rows = [
        (0, "alpha bravo charlie delta"),
        (1, "alpha bravo echo"),
        (2, "zephyr quorl alpha"),
        (3, "bravo charlie foxtrot"),
        (4, "delta echo golf alpha bravo"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = str(tmp_path / "bm25")
    bm25_index_add(spark, docs, 0, idx)
    bm25_index_delete(spark, docs.filter(F.col("doc_id") == 2), 0, idx)

    def snap(df):
        return sorted(
            (
                r.doc, r.term, r.tf, r.dl,
                round(r.idf, 10), r.n_docs, round(r.avgdl, 10),
            )
            for r in df.collect()
        )

    after_first = snap(bm25_read_index(spark, idx))
    assert after_first == snap(bm25_index(docs.filter(F.col("doc_id") != 2)))

    # same doc, FRESH batch id: view unchanged (was: idf/avgdl drift)
    bm25_index_delete(spark, docs.filter(F.col("doc_id") == 2), 1, idx)
    assert snap(bm25_read_index(spark, idx)) == after_first

    # mixed batch (already-deleted 2 + live 4, with 4 duplicated):
    # only 4's deltas apply, once
    mixed = docs.filter(F.col("doc_id").isin(2, 4)).unionByName(
        docs.filter(F.col("doc_id") == 4)
    )
    bm25_index_delete(spark, mixed, 2, idx)
    want = snap(bm25_index(docs.filter(~F.col("doc_id").isin(2, 4))))
    assert snap(bm25_read_index(spark, idx)) == want

    # at-least-once retry of the mixed batch id: bit-identical
    bm25_index_delete(spark, mixed, 2, idx)
    assert snap(bm25_read_index(spark, idx)) == want


def test_streaming_bm25_ingest_matches_one_shot(spark, sf_dir, tmp_path):
    """Replaying the corpus through streaming_bm25_ingest in micro-
    batches (maxFilesPerTrigger=1, availableNow) accumulates additive
    statistics whose reconstructed scoring view is value-identical to a
    one-shot bm25_index over the whole corpus — chunking must not
    matter, because df deltas and scalars are additive and idf/avgdl
    are refolded at read time."""
    from clinical_vector_search_spark.operators.bm25 import (
        bm25_index,
        bm25_read_index,
        streaming_bm25_ingest,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 200)
    )
    docs_path = str(tmp_path / "docs")
    docs.repartitionByRange(4, "doc_id").write.parquet(docs_path)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(docs_path)
    )
    idx = str(tmp_path / "bm25")
    q = streaming_bm25_ingest(
        spark, stream, idx,
        checkpoint_path=str(tmp_path / "ckpt"), run_id="day1",
    )
    assert q.awaitTermination(300)
    assert len(q.recentProgress) > 1  # >1 micro-batch actually ran

    def snap(df):
        return sorted(
            (
                r.doc, r.term, r.tf, r.dl,
                round(r.idf, 10), r.n_docs, round(r.avgdl, 10),
            )
            for r in df.collect()
        )

    got = snap(bm25_read_index(spark, idx))
    assert got == snap(bm25_index(docs)) and got
    import os

    # run_id namespaced the batch subdirectories
    assert any(
        d.startswith("batch-day1-") for d in os.listdir(f"{idx}/postings")
    )
