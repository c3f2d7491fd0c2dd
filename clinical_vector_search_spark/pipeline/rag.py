"""RAG-mode hybrid retrieval (SURVEY.md §3.2; reference
src/pipeline/pipeline_mode.py:198-264).

Pipeline shape (reference :240-249): cheap candidate generation — vector
kNN (candidate_k) ∪ BM25 top-N (R3 union, :244-246) — then greedy MMR
re-rank (R4) over the small per-query candidate set.

The default path is fully distributed end-to-end: query tokenization,
BM25 scoring, candidate union, vector gather, and the MMR rerank
(applyInPandas grouped by query_id) all live in ONE lazy plan with zero
driver collects — a 100k-query batch shuffles on query_id instead of
bottlenecking on driver memory. ``distributed=False`` keeps the
reference-shaped driver-side loop (collected candidates, Python list of
query terms) as the parity anchor.

The BM25 index is built ONCE and reused across every query in the set
(fixing the reference's per-query rebuild, pipeline.py:171-172).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clinical_vector_search_spark.functions import text as TXT
from clinical_vector_search_spark.operators.bm25 import (
    bm25_index,
    bm25_topk_set,
    bm25_topk_set_df,
)
from clinical_vector_search_spark.operators.knn import knn
from clinical_vector_search_spark.operators.mmr import mmr_rerank, mmr_rerank_dist
from clinical_vector_search_spark.plan_cache import tracked_cache


def hybrid_union(vec_results: DataFrame, bm25_results: DataFrame) -> DataFrame:
    """R3: candidate id union per query (order-dropping set union,
    pipeline_mode.py:244-246). Inputs both carry (query_id, doc_id)."""
    return (
        vec_results.select("query_id", "doc_id")
        .union(bm25_results.select("query_id", "doc_id"))
        .distinct()
    )


def rrf_fuse(
    vec_results: DataFrame,
    bm25_results: DataFrame,
    k: int,
    k0: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of two ranked candidate lists (the standard
    alternative to MMR for hybrid retrieval): fused(d) = Σ_sources
    1/(k0 + rank_source(d)), missing-from-a-source contributes 0. Inputs
    both carry (query_id, doc_id, rank); returns (query_id, rank, doc_id,
    rrf) with the fused rank ≤ k, ties broken by doc_id.

    Pure DataFrame plan: one full-outer join on (query_id, doc_id) + one
    window top-k — rank-only fusion needs no score normalization across
    sources, which is exactly why RRF is robust at scale (BM25 and cosine
    live on incomparable scales). The 1/(k0+r) doubles are products of a
    single division, so cross-engine determinism is exact (no
    reassociation)."""
    v = vec_results.select("query_id", "doc_id", F.col("rank").alias("v_rank"))
    b = bm25_results.select("query_id", "doc_id", F.col("rank").alias("b_rank"))
    fused = (
        v.join(b, ["query_id", "doc_id"], "full_outer")
        .withColumn(
            "rrf",
            F.coalesce(F.lit(1.0) / (F.lit(float(k0)) + F.col("v_rank")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(float(k0)) + F.col("b_rank")), F.lit(0.0)),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("rrf"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", F.round("rrf", 6).alias("rrf"))
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
    index = tracked_cache(bm25_index(docs, id_col, text_col))
    qset = [
        (qid, [t for t in qtext.lower().split() if t]) for qid, qtext in queries
    ]
    return bm25_topk_set(index, qset, topk, id_col).select(
        "query_id", F.col(id_col).alias("doc_id"), "bm25"
    )


def query_term_weights(
    queries: DataFrame,
    query_id: str = "query_id",
    query_text: str = "query_text",
) -> DataFrame:
    """In-plan query tokenization: (query_id, term, qw) rows where qw is the
    term's multiplicity in the query (rank_bm25 scores duplicate query terms
    once per occurrence). The distributed twin of the driver-side
    ``Counter(text.lower().split())``.

    Computed per-row with array HOFs (distinct terms × per-term count)
    instead of explode→groupBy: the multiset count is local to one query
    string, so a shuffle stage for it is pure critical-path latency — this
    subplan feeds a broadcast, and every stage between the query scan and
    the broadcast delays the BM25 join behind it. O(distinct·n) per row is
    bounded by query length (fine for query strings; for document-length
    texts the explode→groupBy shape would win, but those aren't queries)."""
    toks = TXT.tokenize(query_text)
    ents = F.transform(
        F.array_distinct(toks),
        lambda t: F.struct(
            t.alias("term"),
            F.size(F.filter(toks, lambda x: x == t))
            .cast("double")
            .alias("qw"),
        ),
    )
    return queries.select(
        F.col(query_id).alias("query_id"), F.explode(ents).alias("e")
    ).select("query_id", F.col("e.term").alias("term"), F.col("e.qw").alias("qw"))


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
    distributed: bool = True,
) -> DataFrame:
    """Full hybrid retrieval: kNN candidates ∪ BM25 candidates → MMR top-k.

    ``queries`` carries (query_id, query_vec, query_text); ``docs_vec``
    (doc_id, embedding); ``docs_text`` (doc_id, text). Returns
    (query_id, rank, doc_id). ``distributed=True`` (default) keeps every
    stage — query tokenization, BM25, union, gather, MMR — in one lazy
    plan with no driver collect; ``False`` is the reference-shaped
    driver-side parity path (identical output, tests/test_pipeline.py).
    """
    vec_cands = knn(
        queries, docs_vec, candidate_k,
        query_id=query_id, query_vec=query_vec,
        doc_id=doc_id, doc_vec=doc_vec,
    )
    if distributed:
        # Cached-lifecycle caller: the index cache is the build-once
        # artifact, so the internal tf pin stays OFF (lazy default) —
        # measured cold A/B in fresh sessions (r16): the eager tf pin
        # costs more during the plan build than it saves at first
        # execution (build 7.9 s + first 4.5 s pinned vs 3.9 + 7.0
        # lazy, warm identical), because the cache build's three tf
        # consumers run as concurrent subtrees on idle cores anyway.
        index = tracked_cache(bm25_index(docs_text, doc_id, text_col))
        qterms = query_term_weights(queries, query_id, query_text)
        bm_cands = bm25_topk_set_df(index, qterms, bm25_topk, id_col=doc_id)
        bm_cands = bm_cands.select(
            F.col("query_id").alias(query_id),
            F.col(doc_id).alias("doc_id"),
            "bm25",
        )
    else:
        qlist = [
            (r[0], r[1]) for r in queries.select(query_id, query_text).collect()
        ]
        bm_cands = bm25_topk_per_query(
            docs_text, qlist, bm25_topk, id_col=doc_id, text_col=text_col
        )
    # union WITHOUT distinct: the (query_id, doc_id) pair dedup happens
    # inside the MMR kernel (a pandas drop_duplicates over ≤candidate_k +
    # bm25_topk rows per query) — a plan-level distinct costs a full
    # shuffle stage for work that is O(rows) within the group anyway
    cands = vec_cands.select(query_id, doc_id).union(
        bm_cands.select(query_id, "doc_id")
    )
    # gather vectors for MMR: candidate rows + doc vec + query vec. The
    # candidate side is tiny by construction ((candidate_k + bm25_topk) ×
    # n_queries rows of two longs) — broadcast it explicitly so the corpus
    # side never shuffles; without the hint the static planner sees an
    # unsized union subplan and falls back to a sort-merge join
    gathered = docs_vec.select(doc_id, doc_vec).join(
        F.broadcast(cands), doc_id
    ).join(F.broadcast(queries.select(query_id, query_vec)), query_id)
    if distributed:
        return mmr_rerank_dist(
            gathered, k, lam,
            query_id=query_id, doc_id=doc_id,
            doc_vec=doc_vec, query_vec=query_vec,
        )
    return mmr_rerank(
        queries.sparkSession, gathered, k, lam,
        query_id=query_id, doc_id=doc_id,
        doc_vec=doc_vec, query_vec=query_vec,
    )
