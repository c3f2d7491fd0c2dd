"""BM25 Okapi lexical scoring as a pure DataFrame subplan (SURVEY.md R2).

Reference: rank_bm25.BM25Okapi over lower().split() tokens
(src/pipeline/pipeline.py:166-176), rebuilt per query. rank_bm25 defaults:
k1=1.5, b=0.75, idf = ln((N - df + 0.5)/(df + 0.5) + 1).

Here the corpus statistics (doc lengths, document frequencies, avgdl) are a
reusable DataFrame "index" — built once, usable by any number of queries —
and scoring a query is a broadcast join against the term postings. No UDFs,
no driver loops: everything is explode → groupBy → join → agg, so Catalyst
handles it and it scales horizontally (postings are partitioned by term;
the per-query term list is tiny and broadcast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clinical_vector_search_spark.functions import text as TXT

K1 = 1.5
B = 0.75


def bm25_index(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"):
    """Build corpus statistics. Returns (postings, doclens, n_docs, avgdl)
    as DataFrames/scalars; postings = (term, doc, tf, df)."""
    toks = docs.select(
        F.col(id_col).alias("doc"), TXT.tokenize(text_col).alias("tokens")
    )
    doclens = toks.select("doc", F.size("tokens").alias("dl"))
    terms = toks.select("doc", F.explode("tokens").alias("term"))
    tf = terms.groupBy("doc", "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    postings = tf.join(df_, "term")
    return postings, doclens


def bm25_score(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Score every document against ``query_terms``; returns (doc_id, bm25).

    Docs with zero term overlap score 0.0 (kept — the reference's argsort
    over the dense score vector keeps them too, pipeline.py:174-175).
    """
    postings, doclens = bm25_index(docs, id_col, text_col)
    n_docs = docs.count()
    avgdl_row = doclens.agg(F.avg("dl").alias("avgdl")).collect()[0]
    avgdl = float(avgdl_row["avgdl"])

    qt = F.array(*[F.lit(t) for t in query_terms])
    matched = postings.filter(F.array_contains(qt, F.col("term"))).join(
        doclens, "doc"
    )
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    term_score = idf * (
        F.col("tf") * F.lit(k1 + 1.0)
        / (F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl)))
    )
    scores = matched.select("doc", term_score.alias("s")).groupBy("doc").agg(
        F.sum("s").alias("bm25")
    )
    # left join back so zero-overlap docs appear with score 0
    return (
        docs.select(F.col(id_col).alias("doc"))
        .join(scores, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.coalesce(F.col("bm25"), F.lit(0.0)).alias("bm25"),
        )
    )
