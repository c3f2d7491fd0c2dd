"""Python UDTF surface (Spark 4, SURVEY.md §2.9 breadth): user-defined
TABLE functions — one input row fans out to many output rows with a typed
schema, callable from SQL via ``spark.udtf.register``.

The UDTF here is the chunker twin of functions.text.chunk_rows (same
contract bit-for-bit, parity-tested in tests/test_text.py). The expression
path remains the scale default — a UDTF runs row-at-a-time in a Python
worker — but the surface is the right tool when the fan-out logic is
genuinely imperative (stateful parsers, tokenizer libraries), and this
module documents/covers the plumbing: lazy analysis, typed multi-row
yield, SQL registration.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_seq: long, chunk_text: string, n_tokens: long")
class ChunkUDTF:
    """Overlapping token-window chunker: yields one row per chunk of the
    input text (size 64 / overlap 16 — matching chunk_rows defaults; the
    UDTF decorator needs literal params, so callers needing other shapes
    subclass or re-decorate)."""

    SIZE = 64
    OVERLAP = 16

    def eval(self, text: str):  # noqa: A002 - UDTF contract name
        if text is None:
            return
        toks = [t for t in text.lower().split() if t]
        if not toks:
            return
        step = self.SIZE - self.OVERLAP
        seq = 0
        for start in range(0, max(len(toks) - self.OVERLAP, 1), step):
            window = toks[start : start + self.SIZE]
            if not window:
                break
            yield seq, " ".join(window), len(window)
            seq += 1


def chunk_rows_udtf(spark, df, text_col: str = "text", id_col: str = "doc_id"):
    """Apply ChunkUDTF via the SQL lateral-join surface; returns the same
    (id, chunk_seq, chunk_text, n_tokens) frame as chunk_rows.

    The temp view gets a per-call uuid name: spark.sql resolves the view at
    plan-build time, so a unique name keeps concurrent/interleaved calls in
    one session from silently rebinding each other's input between build
    and execution (the UDTF registration itself is idempotent)."""
    import uuid

    spark.udtf.register("chunk_udtf", ChunkUDTF)
    view = f"_chunk_in_{uuid.uuid4().hex[:12]}"
    df.createOrReplaceTempView(view)
    try:
        return spark.sql(
            f"""
            SELECT t.{id_col}, c.chunk_seq, c.chunk_text, c.n_tokens
            FROM {view} t, LATERAL chunk_udtf(t.{text_col}) c
            """
        )
    finally:
        # the view is resolved into the plan during spark.sql above, so
        # dropping it immediately is safe and keeps per-call views from
        # accumulating in the session catalog
        spark.catalog.dropTempView(view)
