"""Data-selection importance weighting (DSIR) — hashed n-gram importance
resampling per Xie et al., "Data Selection for Language Models via
Importance Resampling" (NeurIPS 2023).

The curation problem: given a large raw corpus and a small TARGET
distribution (a trusted domain, a language, a quality-vetted subset),
up-weight raw documents that look like the target. DSIR's estimator is
deliberately cheap at corpus scale: hash every token (or n-gram) into K
buckets, fit two multinomial bucket distributions — target p and corpus
q — and score each document by its log importance ratio
Σ_tokens log(p[b(t)] / q[b(t)]). Resampling by these weights then
shifts the corpus toward the target domain.

Scale shape: two bucket-count aggregations (each ONE map-side-combinable
groupBy over the exploded tokens, output ≤ K rows), a K-row broadcast of
the log-ratio table, and one per-doc aggregation — no shuffle ever
exceeds (doc, bucket) granularity and the model state is K doubles, so
the same plan runs unchanged on a 100 TB corpus. Everything is
deterministic expression arithmetic (md5 bucketing, add-one smoothing),
so the weights are value-hash checkable against ANSI SQL.

This is a beyond-reference extension (the reference has no curation
surface); it composes with doc_weighted_sample (A-Res) for the actual
resampling step.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from clinical_vector_search_spark.functions.hashing import md5_long
from clinical_vector_search_spark.functions.text import tokenize


def dsir_logweights(
    docs: DataFrame,
    is_target: Column,
    k_buckets: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 6,
    materialize: bool = True,
) -> DataFrame:
    """Per-document DSIR importance log-weight against the ``is_target``
    subset (a boolean Column over ``docs``; the target must be part of
    the corpus frame so both distributions come from one tokenization
    pass).

    Buckets: ``pmod(md5_long('dsir:' || token), k_buckets)`` — the same
    engine-portable hash family as the samplers. Both distributions are
    add-one smoothed over the full K buckets, so unseen-in-target
    buckets penalize rather than zero out (log of the Laplace ratio).
    Docs with no tokens drop (no defined weight).

    One-tokenization shape: the token stream collapses IMMEDIATELY to
    (doc, bucket, n) granularity — at most docs × K rows, typically
    ~1000× smaller than the tokens — and everything downstream (bucket
    totals AND per-doc sums) derives from that frame with n-weighted
    arithmetic. ``materialize=True`` (default) pins it with an eager
    ``localCheckpoint`` so the tokenize/explode/md5 pass runs ONCE per
    action instead of once per branch — at sf0.1 the operator is
    scheduling-bound either way (~1.8 s warm, unchanged), but at real
    corpus scale the duplicated branch is a second full corpus scan
    and the checkpoint is the difference between 1× and 2× ingest
    cost; pass False to keep the full lazy lineage (plan inspection,
    resumable callers). No ``.cache()`` handle escapes, so there is
    nothing for a caller to leak.

    Output: (id_col, n_toks, logw) with ``logw`` rounded — an
    n-weighted group-sum of ~unit-magnitude doubles,
    reassociation-safe at 1e-6 (the repo's round-before-compare rule;
    the oracle mirrors the n·lr association exactly).
    """
    toks = docs.select(
        F.col(id_col),
        is_target.alias("_t"),
        F.explode(tokenize(text_col)).alias("_tok"),
    ).select(
        id_col,
        "_t",
        F.pmod(
            md5_long(F.concat(F.lit("dsir:"), F.col("_tok"))),
            F.lit(k_buckets),
        ).alias("_b"),
    )
    db = toks.groupBy(id_col, "_t", "_b").agg(
        F.count(F.lit(1)).alias("_n")
    )
    if materialize:
        db = db.localCheckpoint(eager=True)
    corpus = db.groupBy("_b").agg(
        F.sum("_n").alias("_cc"),
        F.sum(
            F.when(F.col("_t"), F.col("_n")).otherwise(F.lit(0))
        ).alias("_tc"),
    )
    totals = corpus.agg(
        F.sum("_cc").alias("_nc"), F.sum("_tc").alias("_nt")
    )
    ratio = corpus.crossJoin(F.broadcast(totals)).select(
        "_b",
        (
            F.log((F.col("_tc") + 1) / (F.col("_nt") + k_buckets))
            - F.log((F.col("_cc") + 1) / (F.col("_nc") + k_buckets))
        ).alias("_lr"),
    )
    return (
        db.join(F.broadcast(ratio), "_b")
        .groupBy(id_col)
        .agg(
            F.sum("_n").alias("n_toks"),
            F.round(
                F.sum(F.col("_n").cast("double") * F.col("_lr")), round_to
            ).alias("logw"),
        )
    )
