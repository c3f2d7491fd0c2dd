"""Count-min sketch over the token stream — bounded-memory frequency
estimation (Cormode & Muthukrishnan 2005), the sketch behind heavy-hitter
mining when the exact per-term groupBy is too wide (a web-scale vocabulary
has billions of tails; the sketch is depth × width counters regardless).

Everything is deterministic md5 hashing, so the sketch AND its estimates
are reproducible in ANSI SQL — both get full value-hash oracles, unlike
typical randomized-sketch implementations.

Shapes:
  * :func:`cms_build` — explode tokens → d hash rows per occurrence →
    groupBy (row, col). Output cardinality ≤ depth × width no matter the
    vocabulary; the aggregation is map-side combined like any counter.
  * :func:`cms_estimate` — per query term, min over the d counters it
    hashes to (the classic overestimate-only bound: est ≥ true count,
    equality when no collision on some row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clinical_vector_search_spark.functions import hashing as H
from clinical_vector_search_spark.functions import text as TXT


def _cms_col(term, row: int, width: int):
    """Counter column for a term in hash row ``row``: md5 of the salted
    term, folded to [0, width). Same formula the SQL oracle replicates."""
    return F.pmod(H.md5_long(F.concat(F.lit(f"cms{row}:"), term)), F.lit(width))


def cms_build(
    docs: DataFrame,
    width: int = 1024,
    depth: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """Build the sketch: (row, col, cnt) with ≤ depth × width rows. ONE
    corpus pass: each token occurrence explodes to its ``depth`` (row, col)
    cells in-plan (a union of per-row branches would re-scan and
    re-tokenize the corpus depth times)."""
    toks = docs.select(F.explode(TXT.tokenize(text_col)).alias("term"))
    cells = toks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("row"),
                        _cms_col(F.col("term"), d, width).alias("col"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("_c")
    ).select(F.col("_c.row").alias("row"), F.col("_c.col").alias("col"))
    return cells.groupBy("row", "col").agg(F.count("*").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    terms: DataFrame,
    width: int = 1024,
    depth: int = 4,
    term_col: str = "term",
) -> DataFrame:
    """Estimate each term's count: min over its depth counters (absent
    counter ⇒ 0 ⇒ estimate 0). ``terms`` carries one row per probe term;
    the sketch side is ≤ depth × width rows, always broadcastable."""
    probes = terms.select(
        F.col(term_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("row"),
                        _cms_col(F.col(term_col), d, width).alias("col"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("_p"),
    ).select(term_col, F.col("_p.row").alias("row"), F.col("_p.col").alias("col"))
    return (
        probes.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy(term_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est_count"))
    )
