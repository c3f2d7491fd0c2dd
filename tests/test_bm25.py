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