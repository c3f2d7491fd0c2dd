"""MMR (maximal marginal relevance) re-ranking (SURVEY.md R4).

Semantics match the reference's greedy loop (src/pipeline/utils.py:17-41;
inline copy evaluation.py:293-310): first pick = argmax query-similarity;
each later pick = argmax over remaining candidates of
``lambda * sim_to_query - (1 - lambda) * max_sim_to_already_selected``;
ties resolved by candidate order (ascending doc id here — explicit, where
the reference inherits argmax's first-wins over FAISS candidate order).

MMR is inherently sequential WITHIN a query (each pick depends on all
previous picks) but embarrassingly parallel ACROSS queries. Two surfaces:

* :func:`mmr_rerank_dist` — ``applyInPandas`` grouped by query_id, the
  same greedy kernel per group with ZERO driver state. One shuffle on
  query_id (high-cardinality, uniform); scales with executors, so a 100k-
  query batch reranks cluster-wide. The default path.
* :func:`mmr_rerank` — the reference-shaped driver-side loop over the
  collected candidate set (small by construction: candidate_k + bm25_topk
  rows per query, pipeline_mode.py:240-249). Kept as the parity anchor and
  for driver-side use on tiny sets.

Both run :func:`mmr_rerank_rows`, so their outputs are identical
(parity-tested in tests/test_mmr.py).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession


def mmr_rerank_rows(
    cand_ids: list[int],
    cand_vecs: np.ndarray,
    query_vec: np.ndarray,
    k: int,
    lam: float = 0.5,
    round_to: int | None = None,
) -> list[tuple[int, int]]:
    """Greedy MMR over one query's candidates → [(rank, doc_id)].

    Pure-NumPy reimplementation of the published MMR algorithm (Carbonell &
    Goldstein 1998); k is clamped to the candidate count like utils.py:26.

    ``round_to`` rounds the query-similarities and pairwise similarities to
    N decimals BEFORE the greedy argmax — the same round-before-rank trick
    as bm25_topk_set: float-ulp differences between engines would otherwise
    flip greedy picks, so only the rounded variant is SQL-oracle-checkable
    (reference semantics = raw floats, round_to=None, the default).
    """
    n = len(cand_ids)
    k = min(k, n)
    if n == 0:
        return []
    # unit-normalize for cosine
    qv = query_vec / (np.linalg.norm(query_vec) + 1e-9)
    cv = cand_vecs / (np.linalg.norm(cand_vecs, axis=1, keepdims=True) + 1e-9)
    sims = cv @ qv
    pair = None
    if round_to is not None:
        # half-AWAY-from-zero, matching DuckDB round() and Spark F.round —
        # np.round's half-to-even would disagree exactly at the .5
        # boundaries the rounding exists to pin down
        scale = 10.0**round_to
        away = lambda a: np.sign(a) * np.floor(np.abs(a) * scale + 0.5) / scale  # noqa: E731
        sims = away(sims)
        pair = away(cv @ cv.T)
    selected: list[int] = []
    remaining = list(range(n))
    # deterministic candidate order: ascending doc id
    order = np.argsort(cand_ids, kind="stable")
    remaining = [int(i) for i in order]
    for _ in range(k):
        if not selected:
            best = max(remaining, key=lambda i: (sims[i], -cand_ids[i]))
        else:
            sel_mat = cv[selected] if pair is None else None
            best, best_score = None, -np.inf
            for i in remaining:
                if pair is not None:
                    div = float(np.max(pair[selected, i]))
                else:
                    div = float(np.max(sel_mat @ cv[i]))
                score = lam * float(sims[i]) - (1.0 - lam) * div
                if score > best_score:
                    best, best_score = i, score
        selected.append(best)
        remaining.remove(best)
    return [(r + 1, int(cand_ids[i])) for r, i in enumerate(selected)]


def mmr_rerank_dist(
    candidates: DataFrame,
    k: int,
    lam: float = 0.5,
    query_id: str = "query_id",
    doc_id: str = "doc_id",
    doc_vec: str = "embedding",
    query_vec: str = "query_vec",
    round_to: int | None = None,
) -> DataFrame:
    """Distributed MMR: the greedy kernel runs per query GROUP via
    ``applyInPandas`` — no driver collect, so the rerank scales with the
    number of queries instead of bottlenecking on driver memory.

    ``candidates`` carries (query_id, doc_id, doc_vec, query_vec) rows —
    the same gathered shape :func:`mmr_rerank` takes. Returns
    (query_id, rank, doc_id)."""
    import pandas as pd

    out_schema = f"{query_id} long, rank int, {doc_id} long"

    def per_query(pdf: pd.DataFrame) -> pd.DataFrame:
        # candidate sets may arrive with (query_id, doc_id) duplicates —
        # rag_pipeline unions kNN and BM25 hits WITHOUT a distinct (the
        # per-pair dedup here costs one pandas pass over ≤~100 rows, where
        # a plan-level distinct costs a full shuffle stage)
        pdf = pdf.drop_duplicates(subset=[doc_id])
        ids = pdf[doc_id].tolist()
        vecs = np.array(pdf[doc_vec].tolist(), dtype="float64")
        qv = np.array(pdf[query_vec].iloc[0], dtype="float64")
        picks = mmr_rerank_rows(ids, vecs, qv, k, lam, round_to)
        return pd.DataFrame(
            {
                query_id: [int(pdf[query_id].iloc[0])] * len(picks),
                "rank": [r for r, _ in picks],
                doc_id: [d for _, d in picks],
            }
        )

    return (
        candidates.select(query_id, doc_id, doc_vec, query_vec)
        .groupBy(query_id)
        .applyInPandas(per_query, out_schema)
    )


def mmr_rerank(
    spark: SparkSession,
    candidates: DataFrame,
    k: int,
    lam: float = 0.5,
    query_id: str = "query_id",
    doc_id: str = "doc_id",
    doc_vec: str = "embedding",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Re-rank candidate rows (query_id, doc_id, embedding, query_vec) →
    (query_id, rank, doc_id). Collects candidates (small) and distributes
    nothing further; see module docstring for why."""
    rows = candidates.select(query_id, doc_id, doc_vec, query_vec).collect()
    by_q: dict[int, dict] = {}
    qvecs: dict[int, np.ndarray] = {}
    for r in rows:
        # keyed by doc id: dedups (query_id, doc_id) duplicates, matching
        # the kernel-side drop_duplicates in mmr_rerank_dist
        by_q.setdefault(r[0], {})[r[1]] = r[2]
        qvecs[r[0]] = np.array(r[3], dtype="float64")
    out = []
    for q, item_map in by_q.items():
        items = list(item_map.items())
        ids = [i for i, _ in items]
        vecs = np.array([v for _, v in items], dtype="float64")
        for rank, did in mmr_rerank_rows(ids, vecs, qvecs[q], k, lam):
            out.append((q, rank, did))
    return spark.createDataFrame(
        out, schema=f"{query_id} long, rank int, {doc_id} long"
    )
