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

    # The returned contract output is ALWAYS the deterministic plaintext
    # ranking over the projected vectors — the reference's own correctness
    # criterion for the encrypted path is top-k OVERLAP against exactly this
    # ranking (pipeline_mode.py:181-191), and CKKS decryption noise (~1e-8)
    # would make decrypted scores non-deterministic across runs. When
    # TenSEAL is importable the REAL CKKS loop runs on the same subset and
    # its ranking is checked against the plaintext one; an overlap below
    # 0.99 raises rather than silently shipping a bad encrypted ranking.
    result = knn(
        pqueries.select(query_id, F.col("proj_qvec").alias(query_vec)),
        pdocs.select(F.col(id_col).alias("doc_id"), F.col("proj_vec").alias("embedding")),
        k,
        query_id=query_id,
        query_vec=query_vec,
    )
    try:  # pragma: no cover - tenseal not installed in this environment
        import tenseal  # noqa: F401
    except ImportError:
        return result
    overlap = ckks_topk_overlap(
        pqueries, pdocs, k, id_col=id_col, query_id=query_id
    )
    if overlap < 0.99:  # pragma: no cover
        raise ValueError(
            f"CKKS ranking diverged from plaintext: overlap {overlap:.3f}"
        )
    return result


def ckks_topk_scores(
    pqueries: DataFrame,
    pdocs: DataFrame,
    k: int,
    id_col: str = "vec_id",
    query_id: str = "query_id",
    poly_modulus_degree: int = 8192,
    scale_bits: int = 40,
) -> list[tuple]:
    """REAL CKKS encrypted scoring over an already-projected, already-bounded
    subset — the reference's driver-side loop (pipeline_mode.py:151-175:
    context 8192/2^40, encrypt query, per-doc enc_q.dot(v), decrypt, top-k).

    Homomorphic dot products cannot distribute through Spark (ciphertexts
    are opaque multi-MB objects and TenSEAL contexts are not serializable
    across Python workers), so like the reference this collects the ≤300-row
    projected subset to the driver. Requires tenseal; callers gate on import.

    Returns [(query_id, rank, doc_id, decrypted_score), ...].
    """
    import tenseal as ts

    ctx = ts.context(
        ts.SCHEME_TYPE.CKKS,
        poly_modulus_degree=poly_modulus_degree,
        coeff_mod_bit_sizes=[60, scale_bits, scale_bits, 60],
    )
    ctx.global_scale = 2**scale_bits
    ctx.generate_galois_keys()

    doc_rows = pdocs.select(id_col, "proj_vec").collect()
    out: list[tuple] = []
    for qrow in pqueries.select(query_id, "proj_qvec").collect():
        enc_q = ts.ckks_vector(ctx, list(qrow["proj_qvec"]))
        scored = [
            (d[id_col], float(enc_q.dot(list(d["proj_vec"])).decrypt()[0]))
            for d in doc_rows
        ]
        scored.sort(key=lambda t: (-t[1], t[0]))
        out.extend(
            (qrow[query_id], rank, doc_id, score)
            for rank, (doc_id, score) in enumerate(scored[:k], start=1)
        )
    return out


def ckks_topk_overlap(
    pqueries: DataFrame,
    pdocs: DataFrame,
    k: int,
    id_col: str = "vec_id",
    query_id: str = "query_id",
) -> float:
    """Mean per-query top-k set overlap between the CKKS-encrypted ranking
    and the plaintext ranking over the SAME projected vectors — the
    reference's acceptance metric (pipeline_mode.py:181-191)."""
    enc = ckks_topk_scores(pqueries, pdocs, k, id_col=id_col, query_id=query_id)
    enc_sets: dict = {}
    for qid, _rank, doc_id, _score in enc:
        enc_sets.setdefault(qid, set()).add(doc_id)
    plain = knn(
        pqueries.select(query_id, F.col("proj_qvec").alias("query_vec")),
        pdocs.select(F.col(id_col).alias("doc_id"), F.col("proj_vec").alias("embedding")),
        k,
        query_id=query_id,
        query_vec="query_vec",
    ).collect()
    plain_sets: dict = {}
    for r in plain:
        plain_sets.setdefault(r[query_id], set()).add(r["doc_id"])
    overlaps = [
        len(enc_sets[q] & plain_sets[q]) / max(len(plain_sets[q]), 1)
        for q in plain_sets
    ]
    return sum(overlaps) / max(len(overlaps), 1)
