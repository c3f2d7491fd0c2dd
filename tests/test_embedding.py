"""Hash embedder: expression path ≡ mapInPandas path, normalization, and
end-to-end text→vector→kNN self-retrieval."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from clinical_vector_search_spark.functions import vector as V
from clinical_vector_search_spark.operators.knn import knn
from clinical_vector_search_spark.pipeline.embedding import (
    hash_embed,
    hash_embed_pd,
)

DIM = 32


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100).cache()
    )


def test_expression_and_pandas_paths_identical(docs):
    a = {r.doc_id: np.array(r.embedding) for r in hash_embed(docs, DIM).collect()}
    b = {r.doc_id: np.array(r.embedding) for r in hash_embed_pd(docs, DIM).collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert np.allclose(a[k], b[k], atol=1e-12), f"doc {k} differs"


def test_embeddings_normalized(docs):
    out = hash_embed(docs, DIM).select(
        V.l2_norm("embedding").alias("n")
    ).collect()
    for r in out:
        assert abs(r.n - 1.0) < 1e-8 or r.n == 0.0


def test_empty_text_zero_vector(spark):
    df = spark.createDataFrame([(0, ""), (1, "hello world")], "doc_id long, text string")
    out = {r.doc_id: r.embedding for r in hash_embed(df, 8).collect()}
    assert all(x == 0.0 for x in out[0])
    assert any(x != 0.0 for x in out[1])


def test_text_to_vector_to_knn_self_retrieval(docs):
    """SURVEY §7 step 4 e2e: embed → self-query → top-1 is itself."""
    vecs = hash_embed(docs, DIM).cache()
    q = vecs.limit(5).select(
        F.col("doc_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    top1 = knn(q, vecs, 3).filter(F.col("rank") == 1).collect()
    for r in top1:
        assert r.doc_id == r.query_id
        assert abs(r.score - 1.0) < 1e-6

def test_encode_pd_gate_raises_cleanly_without_package(spark, sf_dir):
    """encode_pd must fail at plan-build time with ImportError (not at
    executor runtime) when sentence_transformers is absent."""
    import importlib

    import pytest

    from clinical_vector_search_spark.pipeline.embedding import encode_pd

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(4)
    if importlib.util.find_spec("sentence_transformers") is None:
        with pytest.raises(ImportError):
            encode_pd(docs)
    else:
        pytest.skip("sentence_transformers installed; covered by parity test")


def test_encode_pd_parity_with_hash_plumbing(spark, sf_dir):
    """Gated: with a real model present, encode_pd must match hash_embed_pd
    plumbing — same output schema, unit-norm rows, one row per input doc."""
    import pytest

    pytest.importorskip("sentence_transformers")
    from clinical_vector_search_spark.pipeline.embedding import encode_pd

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(8)
    out = encode_pd(docs)
    assert [f.name for f in out.schema.fields] == ["doc_id", "embedding"]
    rows = out.collect()
    assert len(rows) == 8
    for r in rows:
        n = sum(x * x for x in r.embedding) ** 0.5
        assert abs(n - 1.0) < 1e-6
