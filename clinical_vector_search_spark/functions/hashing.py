"""Deterministic cross-engine hashing primitives.

Built exclusively on MD5 (available identically in Spark and every SQL
engine) so that hash-dependent operators — MinHash signatures, SimHash,
fingerprints, LSH buckets — are reproducible AND expressible as ANSI SQL
for the DuckDB correctness oracle. Spark's native ``hash()``/``xxhash64``
would be faster but engine-specific; these operators are not in the hot
path at scale (the hash is computed once per token/shingle).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_long(c: Column | str) -> Column:
    """First 60 bits of md5 as a non-negative BIGINT.

    15 hex chars < 2^60 so the value is exact in int64 (and in SQL engines
    that parse via double, though none we target do).
    DuckDB oracle equivalent: ``('0x' || substr(md5(x), 1, 15))::BIGINT``.
    """
    c = F.col(c) if isinstance(c, str) else c
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def salted_md5_long(c: Column | str, salt: int | Column) -> Column:
    """Independent hash family member: md5(salt || ':' || x)."""
    c = F.col(c) if isinstance(c, str) else c
    salt = F.lit(salt) if not isinstance(salt, Column) else salt
    return md5_long(F.concat_ws(":", salt.cast("string"), c))


def md5_bit(c: Column | str, bit: int) -> Column:
    """Bit ``bit`` (0-based, little-endian) of :func:`md5_long` — used by
    SimHash. Returns 0/1 int. ``bit`` must be a Python int (expressions are
    generated per-bit at plan-build time)."""
    return F.shiftright(md5_long(c), bit).bitwiseAND(F.lit(1))


def dataset_fingerprint(df, cols: list[str]):
    """Order-invariant content fingerprint of a DataFrame — the dataset
    identity primitive for lineage / reproducibility checks ("is the
    corpus we trained on byte-identical to the one we audited?"): one row
    (n_rows, content_hash) where content_hash is the XOR of each row's
    md5-long over ``cols`` rendered with an explicit NULL sentinel.

    Properties that matter at 100 TB: entirely map-side until a single
    scalar combine (XOR and count are commutative + associative, so
    partial aggregation does all the work), invariant to row order and
    partitioning, and exactly reproducible in any engine with md5 —
    including the SQL oracle. XOR (not sum) keeps the accumulator in
    int64 without overflow semantics entering the contract.

    Row rendering is INJECTIVE (netstring-style): each column becomes
    ``len:tag+value`` where tag is 'N' for NULL or 'V' + the value —
    a '|' (or any delimiter) inside a value cannot shift content across
    field boundaries, and NULL ≠ 'null' ≠ '' by the tag. Multiset
    caveat: XOR cancels PAIRS of identical rows; datasets that may
    contain exact duplicate rows should fingerprint after adding a
    disambiguating id column (e.g. a doc id, which every table here has).
    """
    from pyspark.sql import DataFrame  # noqa: F401  (doc typing only)

    def frame(c: str) -> Column:
        tagged = F.when(F.col(c).isNull(), F.lit("N")).otherwise(
            F.concat(F.lit("V"), F.col(c).cast("string"))
        )
        return F.concat(F.length(tagged).cast("string"), F.lit(":"), tagged)

    rendered = F.concat_ws("|", *[frame(c) for c in cols])
    return df.select(md5_long(rendered).alias("h")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("bit_xor(h)").alias("content_hash"),
    )
