"""Opaque-binary (image/audio/video) column operators.

No reference analog — this is the multimodal extension a 100 TB training
pipeline needs. The design: media lives in a ``content: binary`` column with
typed metadata alongside; decode / feature-extract / resize / frame-sample
run as Arrow-batched ``mapInPandas`` stages so bytes never round-trip
per-row through Python.

Codec gating: when pillow is importable on the executors, the REAL decode
branch runs (decode → resize → feature); rows whose bytes do not decode as
an image fall back per-row to the deterministic fake (seeded on content
md5), so mixed/corrupt corpora degrade gracefully and the non-image test
fixtures stay bit-stable. Without pillow (this container), every row takes
the fake branch — the Spark-side plumbing (schema, partitioning, UDF
signature, Arrow batch shape) is identical either way. The PIL branch is
exercised by a gated pytest (skipped when pillow is absent).
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


def _image_feature(content: bytes, dim: int) -> list[float] | None:
    """Real decode branch: grayscale luminance histogram with ``dim``
    buckets, L1-normalized — a cheap, deterministic image descriptor (the
    seam where model.encode drops in). Returns None when the bytes do not
    decode as an image (caller falls back to the fake)."""
    import io

    try:
        from PIL import Image
    except ImportError:
        return None
    try:
        with Image.open(io.BytesIO(content)) as im:
            gray = im.convert("L").resize((32, 32))
            hist = gray.histogram()  # 256 buckets
    except Exception:  # undecodable bytes → caller's fake fallback
        return None
    per = 256 // dim
    buckets = [float(sum(hist[i * per : (i + 1) * per])) for i in range(dim)]
    total = sum(buckets) or 1.0
    return [b / total for b in buckets]


def extract_features(
    df: DataFrame, dim: int = 16, content_col: str = "content", id_col: str = "media_id"
) -> DataFrame:
    """Decode + feature-extract as a mapInPandas stage.

    Arrow batches of binary → feature vectors. With pillow on the
    executors, rows that decode as images get the real histogram feature
    (``_image_feature``); undecodable rows — and every row when pillow is
    absent — get the deterministic fake. The Spark plan (schema,
    partition-parallel batches) is identical either way.
    """
    out_schema = f"{id_col} long, feature array<double>"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for c in pdf[content_col]:
                raw = bytes(c) if c is not None else b""
                feats.append(
                    _image_feature(raw, dim) or _fake_feature(raw, dim)
                )
            yield pd.DataFrame({id_col: pdf[id_col], "feature": feats})

    return df.select(id_col, content_col).mapInPandas(kernel, out_schema)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """Decode → resize → re-encode as a mapInPandas stage:
    (id, content, width, height).

    With pillow on the executors, rows that decode as images are really
    resized (PNG re-encode); undecodable rows — and every row when pillow
    is absent — pass their bytes through with the target dims stamped, so
    the Spark-side contract (schema, Arrow batching, partition
    parallelism) holds in both branches."""
    import io

    out_schema = f"{id_col} long, content binary, width int, height int"

    def _resize(raw: bytes) -> bytes | None:
        try:
            from PIL import Image
        except ImportError:
            return None
        try:
            with Image.open(io.BytesIO(raw)) as im:
                out = io.BytesIO()
                im.resize((width, height)).save(out, format="PNG")
                return out.getvalue()
        except Exception:  # undecodable → passthrough
            return None

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = [
                _resize(bytes(c) if c is not None else b"") or c
                for c in pdf[content_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "content": content,
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
