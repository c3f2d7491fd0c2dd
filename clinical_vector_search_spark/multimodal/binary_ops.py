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


def _fake_pixels(content: bytes) -> list[int]:
    """Deterministic 8×8 'pixel' grid from the content digest — the
    codec-free stand-in (same digest arithmetic family as
    ``_fake_feature``, so it has a full SQL oracle)."""
    h = hashlib.md5(content or b"").digest()
    return [(h[i % 16] * 31 + i) % 256 for i in range(64)]


def _image_pixels(content: bytes) -> list[int] | None:
    """Real decode branch: 8×8 grayscale downsample → 64 luminance
    values. None when the bytes do not decode (caller takes the fake)."""
    import io

    try:
        from PIL import Image
    except ImportError:
        return None
    try:
        with Image.open(io.BytesIO(content)) as im:
            return list(im.convert("L").resize((8, 8)).getdata())
    except Exception:  # noqa: BLE001 — undecodable bytes
        return None


def perceptual_hash(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """64-bit average-hash (aHash) per media row: bit i is set iff pixel i
    is above the 8×8 grid's mean — near-identical images differ in a few
    bits, so near-dup detection becomes a Hamming problem
    (:func:`phash_candidate_pairs`), the image twin of SimHash for text.

    The mean test is INTEGER-exact (``64·p_i > Σp`` instead of a float
    mean) so the hash is bit-reproducible across engines. Emitted as two
    unsigned 32-bit halves (phash_hi = bits 32..63, phash_lo = 0..31):
    SQL engines with overflow-checked shifts can rebuild both halves
    (1<<63 would raise), and Hamming distance is
    bit_count(xor(hi)) + bit_count(xor(lo)) either way.

    Arrow-batched mapInPandas; real PIL decode per row when available,
    digest-derived fake otherwise — identical plumbing (same contract as
    ``extract_features``)."""
    schema = f"{id_col} long, phash_hi long, phash_lo long"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, his, los = [], [], []
            for mid, raw in zip(pdf[id_col], pdf[content_col]):
                content = bytes(raw) if raw is not None else b""
                px = _image_pixels(content) or _fake_pixels(content)
                s = sum(px)
                hi = lo = 0
                for i, p in enumerate(px):
                    if 64 * p > s:
                        if i < 32:
                            lo |= 1 << i
                        else:
                            hi |= 1 << (i - 32)
                ids.append(mid)
                his.append(hi)
                los.append(lo)
            yield pd.DataFrame(
                {id_col: ids, "phash_hi": his, "phash_lo": los}
            )

    return df.select(id_col, content_col).mapInPandas(kernel, schema)


def phash_candidate_pairs(
    hashes: DataFrame,
    max_hamming: int = 3,
    id_col: str = "media_id",
) -> DataFrame:
    """Near-dup media pairs from :func:`perceptual_hash` output: the
    64-bit hash splits into four 16-bit bands; pairs sharing ANY band
    value are candidates (band-bucket equi-join — never all-pairs),
    then the exact Hamming distance filters to ≤ ``max_hamming``.

    Pigeonhole guarantee: with 4 bands, every pair within Hamming
    distance ≤ 3 shares at least one untouched band — recall is EXACT
    for ``max_hamming < 4``; above that the band join is a recall
    tradeoff (same contract as the SimHash band path for text).

    Output: (a_id, b_id, hamming)."""
    bands = hashes.select(
        F.col(id_col),
        "phash_hi",
        "phash_lo",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("band"),
                    (F.col("phash_lo") % 65536).alias("val"),
                ),
                F.struct(
                    F.lit(1).alias("band"),
                    F.shiftright(F.col("phash_lo"), 16).alias("val"),
                ),
                F.struct(
                    F.lit(2).alias("band"),
                    (F.col("phash_hi") % 65536).alias("val"),
                ),
                F.struct(
                    F.lit(3).alias("band"),
                    F.shiftright(F.col("phash_hi"), 16).alias("val"),
                ),
            )
        ).alias("b"),
    ).select(id_col, "phash_hi", "phash_lo", "b.band", "b.val")
    a = bands.select(
        F.col(id_col).alias("a_id"),
        F.col("phash_hi").alias("a_hi"),
        F.col("phash_lo").alias("a_lo"),
        "band",
        "val",
    )
    b = bands.select(
        F.col(id_col).alias("b_id"),
        F.col("phash_hi").alias("b_hi"),
        F.col("phash_lo").alias("b_lo"),
        "band",
        "val",
    )
    ham = F.bit_count(
        F.col("a_hi").bitwiseXOR(F.col("b_hi"))
    ) + F.bit_count(F.col("a_lo").bitwiseXOR(F.col("b_lo")))
    return (
        a.join(b, ["band", "val"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
