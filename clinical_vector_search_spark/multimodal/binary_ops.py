"""Opaque-binary (image/audio/video) column operators.

No reference analog — this is the multimodal extension a 100 TB training
pipeline needs. The design: media lives in a ``content: binary`` column with
typed metadata alongside; decode / feature-extract / resize / frame-sample
run as Arrow-batched ``mapInPandas`` stages so bytes never round-trip
per-row through Python.

The actual codecs (PIL/librosa/ffmpeg) are NOT installed in this container,
so the decode kernels are STUBS: with the libraries present the real decode
runs; without them a deterministic fake (seeded on content md5) keeps the
Spark-side plumbing — schema, partitioning, UDF signature, batch shape —
real and testable.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, content binary, mime string, "
    "width int, height int, duration_ms long"
)


def attach_binary_metadata(
    df: DataFrame, content_col: str = "content"
) -> DataFrame:
    """Cheap JVM-side metadata: byte length + content digest. Runs at scan
    speed — no Python."""
    return df.withColumn(
        "n_bytes", F.octet_length(F.col(content_col)).cast("long")
    ).withColumn("content_md5", F.md5(F.col(content_col)))


def _fake_feature(content: bytes, dim: int) -> list[float]:
    """Deterministic stand-in feature vector derived from the content
    digest. Clearly NOT a real embedding — placeholder until a codec +
    model is installed on the cluster."""
    h = hashlib.md5(content or b"").digest()
    return [((h[i % 16] * 31 + i) % 256) / 255.0 for i in range(dim)]


def extract_features(
    df: DataFrame, dim: int = 16, content_col: str = "content", id_col: str = "media_id"
) -> DataFrame:
    """Decode + feature-extract as a mapInPandas stage.

    Arrow batches of binary → feature vectors. With a real decoder
    installed, replace the except-branch; the Spark plan (schema,
    partition-parallel batches) is production-shaped either way.
    """
    out_schema = f"{id_col} long, feature array<double>"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            import PIL.Image  # noqa: F401

            raise NotImplementedError(
                "real image decode not wired: install pillow on executors "
                "and implement decode → resize → model.encode here"
            )
        except ImportError:
            pass
        for pdf in batches:
            feats = [
                _fake_feature(bytes(c) if c is not None else b"", dim)
                for c in pdf[content_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "feature": feats})

    return df.select(id_col, content_col).mapInPandas(kernel, out_schema)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """Decode → resize as a mapInPandas stage: (id, content, width, height).

    With PIL installed this would decode+resize real bytes; without it the
    deterministic stand-in passes content through and stamps the target
    dimensions, keeping the Spark-side contract (schema, Arrow batching,
    partition parallelism) real and testable."""
    out_schema = f"{id_col} long, content binary, width int, height int"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            import PIL.Image  # noqa: F401

            raise NotImplementedError(
                "real image resize not wired: install pillow on executors "
                "and implement decode → Image.resize → re-encode here"
            )
        except ImportError:
            pass
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "content": pdf[content_col],
                    "width": width,
                    "height": height,
                }
            )

    return df.select(id_col, content_col).mapInPandas(kernel, out_schema)


def frame_sample_plan(
    df: DataFrame,
    every_ms: int = 1000,
    id_col: str = "media_id",
    duration_col: str = "duration_ms",
) -> DataFrame:
    """Explode each video row into (media_id, frame_ts_ms) sample points —
    the shuffle-free fan-out stage that precedes per-frame decode. Pure
    JVM (sequence + explode); the decode itself would chain
    :func:`extract_features` on the fetched frames."""
    return df.select(
        F.col(id_col),
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col(duration_col) - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
