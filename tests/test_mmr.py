"""MMR re-rank vs an independent NumPy port of the reference algorithm
(src/pipeline/utils.py:17-41 semantics — SURVEY §5 e2e plan)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from clinical_vector_search_spark.operators.mmr import (
    mmr_rerank,
    mmr_rerank_dist,
    mmr_rerank_rows,
)


def reference_mmr(cand_vecs, query_vec, k, lam):
    """Reference greedy loop (utils.py:17-41): first = argmax sim; then
    argmax lam*sim - (1-lam)*max_sim_to_selected. Operates in candidate
    order; returns selected indices."""
    q = query_vec / (np.linalg.norm(query_vec) + 1e-9)
    c = cand_vecs / (np.linalg.norm(cand_vecs, axis=1, keepdims=True) + 1e-9)
    sims = c @ q
    selected = [int(np.argmax(sims))]
    while len(selected) < min(k, len(c)):
        best, best_score = None, -np.inf
        for i in range(len(c)):
            if i in selected:
                continue
            div = float(np.max(c[selected] @ c[i]))
            score = lam * sims[i] - (1 - lam) * div
            if score > best_score:
                best, best_score = i, score
        selected.append(best)
    return selected


@pytest.fixture(scope="module")
def cands():
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(20, 16))
    q = rng.normal(size=16)
    ids = list(range(100, 120))  # ascending ids = candidate order
    return ids, vecs, q


@pytest.mark.parametrize("lam", [0.3, 0.5, 0.7])
def test_mmr_rows_matches_reference(cands, lam):
    ids, vecs, q = cands
    got = mmr_rerank_rows(ids, vecs, q, k=8, lam=lam)
    expect = reference_mmr(vecs, q, k=8, lam=lam)
    assert [doc for _, doc in got] == [ids[i] for i in expect]


def test_mmr_lambda1_is_similarity_order(cands):
    """λ=1 ⇒ pure similarity ranking (SURVEY §5 property)."""
    ids, vecs, q = cands
    got = [doc for _, doc in mmr_rerank_rows(ids, vecs, q, k=20, lam=1.0)]
    qn = q / (np.linalg.norm(q) + 1e-9)
    cn = vecs / (np.linalg.norm(vecs, axis=1, keepdims=True) + 1e-9)
    sims = cn @ qn
    expect = [ids[i] for i in np.argsort(-sims, kind="stable")]
    assert got == expect


def test_mmr_dataframe_wrapper(spark, cands):
    ids, vecs, q = cands
    rows = [(1, ids[i], [float(x) for x in vecs[i]], [float(x) for x in q])
            for i in range(len(ids))]
    df = spark.createDataFrame(
        rows, "query_id long, doc_id long, embedding array<double>, "
        "query_vec array<double>"
    )
    out = mmr_rerank(spark, df, k=5, lam=0.5).orderBy("rank").collect()
    expect = reference_mmr(vecs, q, k=5, lam=0.5)
    assert [r.doc_id for r in out] == [ids[i] for i in expect]
    assert [r.rank for r in out] == [1, 2, 3, 4, 5]


def test_mmr_dist_parity_multi_query(spark, cands):
    """applyInPandas path == driver-loop path across several query groups
    (the distributed kernel is the same function, so ranks must match
    exactly)."""
    ids, vecs, q = cands
    rng = np.random.default_rng(11)
    rows = []
    for qid in range(4):
        qv = [float(x) for x in rng.normal(size=16)]
        for i in range(len(ids)):
            rows.append((qid, ids[i], [float(x) for x in vecs[i]], qv))
    df = spark.createDataFrame(
        rows, "query_id long, doc_id long, embedding array<double>, "
        "query_vec array<double>"
    )
    driver = {(r.query_id, r.rank): r.doc_id
              for r in mmr_rerank(spark, df, k=6, lam=0.4).collect()}
    dist = {(r.query_id, r.rank): r.doc_id
            for r in mmr_rerank_dist(df, k=6, lam=0.4).collect()}
    assert driver == dist
    assert len(dist) == 4 * 6

def test_rrf_fuse_handles_single_source_docs(spark):
    """RRF: a doc present in only one list still fuses (other side = 0),
    and a doc ranked well in both beats a single-source top doc."""
    from clinical_vector_search_spark.pipeline.rag import rrf_fuse

    vec = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id long, doc_id long, rank long",
    )
    bm = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)],
        "query_id long, doc_id long, rank long",
    )
    rows = {r.doc_id: (r.rank, r.rrf) for r in rrf_fuse(vec, bm, 4).collect()}
    # doc 11: 1/62 + 1/61 = top; doc 10: 1/61; doc 13: 1/62; doc 12: 1/63
    assert rows[11][0] == 1 and rows[10][0] == 2
    assert rows[13][0] == 3 and rows[12][0] == 4
    assert abs(rows[11][1] - round(1 / 62 + 1 / 61, 6)) < 1e-9
