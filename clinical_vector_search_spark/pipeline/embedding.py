"""V1 batch embedding (SURVEY.md §2.3 V1; reference src/pipeline/pipeline.py:
90-98 and the distributed `embed_partition` design at
src/pipeline/embedding.py:31-41).

The reference encodes with SentenceTransformer (no model weights in this
environment). The engine's contract is therefore a PLUGGABLE encoder with a
deterministic fallback — the hash embedder — that is:

  * computable identically in Spark expressions AND ANSI SQL (oracle-checkable
    down to the bit: md5-derived integer math only);
  * shaped exactly like a real encoder at the plan level (text column in,
    ``array<double>`` column out), so swapping in a real model is a drop-in
    replacement of the mapInPandas function.

Hash embedder definition (dim = ``dim``):
  for each token occurrence t (reference tokenizer: lower().split()):
      hv = first 60 bits of md5(t) as int64
      bucket  j = hv mod dim
      weight  w = ((hv >> 6) mod 2001) / 1000 - 1          # in [-1, 1]
  feature[j] = Σ weights of tokens in bucket j; missing buckets = 0.
  embedding = L2-normalized feature vector.

Docs whose text has zero tokens produce the ZERO feature vector (normalized
by the +eps epsilon to stay zero), kept in the output.

Two implementations with identical results:
  * :func:`hash_embed` — pure DataFrame expressions (explode → groupBy →
    dense assembly). The oracle path; also the scale path (one shuffle on
    (id, bucket), map-side combined).
  * :func:`hash_embed_pd` — ``mapInPandas`` with hashlib, the
    model-per-executor shape of reference embedding.py:31-41. A real
    SentenceTransformer encoder would replace only the inner function.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clinical_vector_search_spark.functions import hashing as H
from clinical_vector_search_spark.functions import text as TXT
from clinical_vector_search_spark.functions import vector as V

W_MOD = 2001  # weight quantization — odd so the [-1,1] range is symmetric


def hash_embed_features(
    df: DataFrame, dim: int, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Sparse (id, j, feature) rows — only non-empty buckets. Flattened shape
    used directly by the DuckDB oracle comparison."""
    toks = df.select(
        F.col(id_col), F.explode(TXT.tokenize(text_col)).alias("tok")
    )
    hv = H.md5_long(F.col("tok"))
    return (
        toks.select(
            id_col,
            F.pmod(hv, F.lit(dim)).cast("int").alias("j"),
            (
                F.pmod(F.shiftright(hv, 6), F.lit(W_MOD)).cast("double")
                / F.lit(1000.0)
                - F.lit(1.0)
            ).alias("w"),
        )
        .groupBy(id_col, "j")
        .agg(F.sum("w").alias("feature"))
    )


def hash_embed(
    df: DataFrame,
    dim: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "embedding",
    normalize: bool = True,
) -> DataFrame:
    """Dense hash embedding per doc: (id_col, out_col array<double>).

    Zero-token docs are preserved with the zero vector (left join from the
    source ids).
    """
    feats = hash_embed_features(df, dim, text_col, id_col)
    dense = (
        feats.groupBy(id_col)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("j", "feature"))
            ).alias("_m")
        )
        .select(
            F.col(id_col),
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda j: F.coalesce(
                    F.element_at(F.col("_m"), j.cast("int")), F.lit(0.0)
                ),
            ).alias(out_col),
        )
    )
    out = df.select(id_col).join(dense, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col(out_col), V.zeros(dim)).alias(out_col),
    )
    if normalize:
        out = out.withColumn(out_col, V.l2_normalize(out_col))
    return out


def _hash_embed_np(texts, dim: int):
    """NumPy/hashlib twin of the expression path — bit-identical features."""
    import hashlib

    import numpy as np

    out = np.zeros((len(texts), dim), dtype="float64")
    for r, t in enumerate(texts):
        if t is None:
            continue
        for tok in str(t).lower().split():
            hv = int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:15], 16)
            out[r, hv % dim] += ((hv >> 6) % W_MOD) / 1000.0 - 1.0
    return out


def hash_embed_pd(
    df: DataFrame,
    dim: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "embedding",
    normalize: bool = True,
) -> DataFrame:
    """mapInPandas embedder — the reference's embed_partition shape
    (embedding.py:31-41: "Model loads inside each Spark worker"). The
    encoder here is the deterministic hash embedder; a real model swaps in
    by replacing ``_hash_embed_np`` with ``model.encode`` (loaded once per
    partition, batched by Arrow)."""
    import numpy as np

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # model-load-once-per-partition would go here
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = _hash_embed_np(pdf[text_col].tolist(), dim)
            if normalize:
                mat = mat / (np.linalg.norm(mat, axis=1, keepdims=True) + V.EPS)
            yield pd.DataFrame({id_col: pdf[id_col], out_col: list(mat)})

    return df.select(id_col, text_col).mapInPandas(
        fn, f"{id_col} long, {out_col} array<double>"
    )


# per-worker-process model cache: mapInPandas calls fn per PARTITION, but
# the Python worker process is reused across partitions/tasks — caching by
# model name amortizes the multi-second model load across the whole job
_MODEL_CACHE: dict = {}


def _load_st_model(model_name: str):
    model = _MODEL_CACHE.get(model_name)
    if model is None:
        from sentence_transformers import SentenceTransformer

        model = SentenceTransformer(model_name)
        _MODEL_CACHE[model_name] = model
    return model


def encode_pd(
    df: DataFrame,
    model_name: str = "all-MiniLM-L6-v2",
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "embedding",
    normalize: bool = True,
    batch_size: int = 64,
) -> DataFrame:
    """Real-model mapInPandas embedder (reference pipeline.py:90-95 encoder,
    distributed per the embed_partition design at embedding.py:31-41): the
    SentenceTransformer loads once per executor Python worker and encodes
    Arrow-delivered batches. Same plan shape as :func:`hash_embed_pd` — the
    two differ only in the inner kernel, so every downstream operator
    (kNN/DP/RAG/dedup) is encoder-agnostic.

    Raises ImportError at plan-build time when sentence_transformers is not
    installed (this container has no model weights); callers gate on import
    or use the deterministic hash embedder.
    """
    import importlib.util

    if importlib.util.find_spec("sentence_transformers") is None:
        raise ImportError(
            "sentence_transformers is not installed; use hash_embed_pd"
        )
    import numpy as np

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = _load_st_model(model_name)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            texts = ["" if t is None else str(t) for t in pdf[text_col]]
            mat = np.asarray(
                model.encode(
                    texts, batch_size=batch_size, show_progress_bar=False
                ),
                dtype="float64",
            )
            if normalize:
                mat = mat / (np.linalg.norm(mat, axis=1, keepdims=True) + V.EPS)
            yield pd.DataFrame({id_col: pdf[id_col], out_col: list(mat)})

    return df.select(id_col, text_col).mapInPandas(
        fn, f"{id_col} long, {out_col} array<double>"
    )
