"""RAG-mode hybrid retrieval (SURVEY.md §3.2; reference
src/pipeline/pipeline_mode.py:198-264).

Pipeline shape (reference :240-249): cheap candidate generation — vector
kNN (candidate_k) ∪ BM25 top-N (R3 union, :244-246) — then greedy MMR
re-rank (R4) over the small candidate set. The expensive stages are fully
distributed; only the final MMR loop runs driver-side over ≤ (candidate_k +
bm25_topk) rows per query, matching the reference's own candidate-pruning
bound.

The BM25 index is built ONCE and reused across every query in the set
(fixing the reference's per-query rebuild, pipeline.py:171-172).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clinical_vector_search_spark.operators.bm25 import bm25_index, bm25_topk_set
from clinical_vector_search_spark.operators.knn import knn
from clinical_vector_search_spark.operators.mmr import mmr_rerank


def hybrid_union(vec_results: DataFrame, bm25_results: DataFrame) -> DataFrame:
    """R3: candidate id union per query (order-dropping set union,
    pipeline_mode.py:244-246). Inputs both carry (query_id, doc_id)."""
    return (
        vec_results.select("query_id", "doc_id")
        .union(bm25_results.select("query_id", "doc_id"))
        .distinct()
    )


def bm25_topk_per_query(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    topk: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 top-k for a query SET against one shared index in ONE plan:
    (query_id, doc_id, bm25). Ties broken by doc id ascending.

    The index is cached: it is the reusable build-once artifact (same
    lifecycle as the vector index — at 100 TB you persist it via
    io.tables.build_bm25_index_table). Spark's CacheManager dedups by
    canonicalized plan, so repeated calls over the same docs frame share
    one materialization instead of re-running tokenize→explode→tf/df."""
    index = bm25_index(docs, id_col, text_col).cache()
    qset = [
        (qid, [t for t in qtext.lower().split() if t]) for qid, qtext in queries
    ]
    return bm25_topk_set(index, qset, topk, id_col).select(
        "query_id", F.col(id_col).alias("doc_id"), "bm25"
    )


def rag_pipeline(
    queries: DataFrame,
    docs_vec: DataFrame,
    docs_text: DataFrame,
    k: int,
    candidate_k: int = 40,
    bm25_topk: int = 40,
    lam: float = 0.5,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    query_text: str = "query_text",
    doc_id: str = "doc_id",
    doc_vec: str = "embedding",
    text_col: str = "text",
) -> DataFrame:
    """Full hybrid retrieval: kNN candidates ∪ BM25 candidates → MMR top-k.

    ``queries`` carries (query_id, query_vec, query_text); ``docs_vec``
    (doc_id, embedding); ``docs_text`` (doc_id, text). Returns
    (query_id, rank, doc_id).
    """
    vec_cands = knn(
        queries, docs_vec, candidate_k,
        query_id=query_id, query_vec=query_vec,
        doc_id=doc_id, doc_vec=doc_vec,
    )
    qlist = [
        (r[0], r[1]) for r in queries.select(query_id, query_text).collect()
    ]
    bm_cands = bm25_topk_per_query(
        docs_text, qlist, bm25_topk, id_col=doc_id, text_col=text_col
    )
    cands = hybrid_union(vec_cands, bm_cands)
    # gather vectors for MMR: candidate rows + doc vec + query vec
    gathered = cands.join(docs_vec.select(doc_id, doc_vec), doc_id).join(
        F.broadcast(queries.select(query_id, query_vec)), query_id
    )
    return mmr_rerank(
        queries.sparkSession, gathered, k, lam,
        query_id=query_id, doc_id=doc_id,
        doc_vec=doc_vec, query_vec=query_vec,
    )
