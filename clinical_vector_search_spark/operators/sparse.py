"""Sparse TF-IDF cosine retrieval — the inverted-index twin of the dense
ANN family (operators/knn.py) and the cosine twin of BM25
(operators/bm25.py; reference scores rank_bm25 at src/pipeline/
pipeline.py:171-175 — this module covers the classic tf-idf VSM scoring
the same retrieval stacks ship beside it).

Why a separate operator when dense kNN exists: at 100 TB the sparse
formulation never materializes a dense vector per document — scoring is
a posting-list equi-join on ``term`` (only terms the query mentions are
touched), one (query, doc) aggregation, and a windowed top-k. Query
volume scales by broadcasting the (query_id, term, weight) frame, or
past broadcast size by letting the term join shuffle — both shapes are
plain hash joins Catalyst already optimizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from clinical_vector_search_spark.functions import text as TXT


def tfidf_index(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Posting-list index: one row per (doc, term) with
    (tf, idf, w = tf·idf).

    idf = ln(n_docs / df) — the plain VSM formulation (SQL-mirrorable;
    df ≥ 1 for every indexed term so the log argument is ≥ 1 whenever
    the term exists). Lazy plan, no driver actions; cache to amortize
    across query batches (same lifecycle as bm25_index).

    Deliberately does NOT carry the doc norm: joining norms onto every
    posting row costs a postings-wide doc-key shuffle that scoring then
    throws away (only query-term postings survive the match). Norms
    live in the doc-granularity :func:`tfidf_doc_norms` frame and join
    AFTER the (query, doc) aggregation — measured ~2× off this
    operator's bench time at sf0.1."""
    toks = docs.select(
        F.col(id_col).alias("doc"), TXT.tokenize(text_col).alias("tokens")
    )
    terms = toks.select("doc", F.explode("tokens").alias("term"))
    tf = terms.groupBy("doc", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = toks.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    idf_tbl = dfreq.crossJoin(F.broadcast(n_docs)).select(
        "term", F.log(F.col("n_docs") / F.col("df")).alias("idf")
    )
    return tf.join(idf_tbl, "term").withColumn(
        "w", F.col("tf") * F.col("idf")
    )


def tfidf_doc_norms(index: DataFrame) -> DataFrame:
    """(doc, norm = ||doc tf-idf vector||₂) from the posting index —
    one doc-key aggregate, built once per index lifecycle."""
    return index.groupBy("doc").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("norm")
    )


def tfidf_cosine_topk(
    index: DataFrame,
    query_terms: DataFrame,
    k: int,
    round_to: int = 6,
) -> DataFrame:
    """Top-k docs per query by tf-idf cosine over the posting lists:
    (query_id, rank, doc_id, score). ``query_terms`` is a
    (query_id, term, qtf) frame — DataFrame-native so upstream query
    tokenization stays in the plan (same scale contract as
    bm25_topk_set_df).

    Query weights use the INDEX idf (qw = qtf·idf); out-of-vocabulary
    query terms contribute nothing — including to the query norm — the
    standard VSM treatment (an OOV term has no defined idf). Docs with
    zero term overlap are excluded (they can never outrank a match and
    materializing them is the crossJoin this plan avoids).

    Scores are rounded to ``round_to`` BEFORE ranking: the (query, doc)
    group-sum reassociates across engines/runs, and an ulp difference
    at the top-k cut would flip the doc-id tie-break (same contract as
    bm25_topk_set round_to).

    Zero-norm sides are EXCLUDED before the division (ANSI mode would
    raise): a document composed entirely of corpus-universal terms
    (every idf 0) or a query whose in-vocabulary terms all have idf 0
    has no direction in VSM space — its cosine is undefined, not 0."""
    # idf lookup for QUERY terms only: semi-filter the postings by a
    # broadcast of the (small) query term set BEFORE the distinct — a
    # distinct over the full posting list would shuffle vocabulary-
    # granularity rows to answer a |q|-term question (measured ~2x off
    # this operator's bench time at sf0.1)
    qterms = query_terms.select("term").distinct()
    vocab_idf = (
        index.join(F.broadcast(qterms), "term")
        .select("term", "idf")
        .distinct()
    )
    qw = query_terms.join(F.broadcast(vocab_idf), "term").select(
        "query_id", "term", (F.col("qtf") * F.col("idf")).alias("qw")
    )
    qnorm = qw.groupBy("query_id").agg(
        F.sqrt(F.sum(F.col("qw") * F.col("qw"))).alias("qnorm")
    )
    qside = F.broadcast(
        qw.join(qnorm, "query_id").filter(F.col("qnorm") > 0)
    )
    dots = (
        index.join(qside, "term")
        .groupBy("query_id", "doc")
        .agg(
            F.sum(F.col("w") * F.col("qw")).alias("_dot"),
            F.first("qnorm").alias("qnorm"),
        )
    )
    # norms join AFTER aggregation: (query, doc) granularity rows meet
    # the doc-granularity norm frame — never the full posting list
    scored = (
        dots.join(tfidf_doc_norms(index).filter(F.col("norm") > 0), "doc")
        .select(
            "query_id",
            "doc",
            F.round(
                F.col("_dot") / (F.col("norm") * F.col("qnorm")), round_to
            ).alias("score"),
        )
    )
    win = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc")
    )
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "rank", F.col("doc").alias("doc_id"), "score"
        )
    )


def trigram_postings(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Character-trigram posting list (pg_trgm style): one row per
    (doc, DISTINCT lowercase trigram). The index that turns substring /
    fuzzy search from a full corpus scan into a posting intersection —
    the character-level sibling of the tf-idf term postings above.
    Expression-level (transform over an index sequence, no UDF); docs
    shorter than 3 chars contribute nothing (CASE-guarded: Spark's
    sequence(1, 0) would DESCEND, not return empty)."""
    grams = F.expr(
        f"CASE WHEN length(lower({text_col})) >= 3 THEN "
        f"array_distinct(transform(sequence(1, length(lower({text_col})) - 2), "
        f"i -> substring(lower({text_col}), i, 3))) "
        "ELSE array() END"
    )
    return docs.select(F.col(id_col), F.explode(grams).alias("trigram"))


def trigram_search(
    postings: DataFrame,
    docs: DataFrame,
    pattern: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Substring search through the trigram index: candidates are docs
    whose postings contain ALL of the pattern's trigrams (a doc
    containing the substring necessarily contains every one — pruning
    is lossless), verified with an exact ``contains`` on the candidate
    set only.

    Scale shape: the pattern's trigrams are a literal IN-list pushed to
    the postings scan; the intersection is one count-distinct agg at
    candidate granularity; the expensive exact contains touches ONLY
    candidates (semi-join), never the corpus. Patterns shorter than 3
    chars have no trigrams — callers fall back to a scan (raised)."""
    p = pattern.lower()
    pats = sorted({p[i:i + 3] for i in range(len(p) - 2)})
    if not pats:
        raise ValueError("pattern must be >= 3 chars for trigram search")
    cand = (
        postings.filter(F.col("trigram").isin(pats))
        .groupBy(id_col)
        .agg(F.countDistinct("trigram").alias("_m"))
        .filter(F.col("_m") == len(pats))
        .select(id_col)
    )
    return docs.join(cand, id_col, "left_semi").filter(
        F.contains(F.lower(F.col(text_col)), F.lit(p))
    )
