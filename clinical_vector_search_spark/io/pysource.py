"""Custom Python Data Source (Spark 4 DataSource API): a deterministic
synthetic-documents source.

Demonstrates the third kind of source next to file formats and streams —
a source implemented in Python, partition-parallel, registered with
``spark.dataSource.register`` and read via
``spark.read.format("synthetic_docs")``. Rows are a pure function of the
row index through md5 (the repo's cross-engine hash), so the source's
output is reproducible ANYWHERE — including as DuckDB SQL, which gives a
custom data source a full value-hash oracle (rare for source plumbing).

Generation contract for row ``i`` (the SQL oracle mirrors it exactly):
  * n_tokens(i) = 5 + (md5_60bit("len:" + i) % 6)      → 5..10 tokens
  * token(i, j) = "w" + (md5_60bit(i + ":" + j) % 997)  → ~1k vocab
  * text = tokens joined by single spaces
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def synth_row(i: int) -> tuple[int, str]:
    n = 5 + (_md5_60(f"len:{i}") % 6)
    toks = [f"w{_md5_60(f'{i}:{j}') % 997}" for j in range(n)]
    return (i, " ".join(toks))


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))

    def partitions(self):
        # contiguous row ranges — each generator task is independent and
        # seeded by absolute row index, so parallelism never changes data
        per = max(1, -(-self.n_rows // self.n_parts))
        return [
            _RangePartition(lo, min(lo + per, self.n_rows))
            for lo in range(0, self.n_rows, per)
        ]

    def read(self, partition):
        for i in range(partition.start, partition.end):
            yield synth_row(i)


class SyntheticDocsDataSource(DataSource):
    """``spark.read.format("synthetic_docs").option("rows", N)`` — a
    partition-parallel deterministic corpus generator."""

    @classmethod
    def name(cls):
        return "synthetic_docs"

    def schema(self):
        return "doc_id bigint, text string"

    def reader(self, schema):
        return SyntheticDocsReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the source with a session."""
    spark.dataSource.register(SyntheticDocsDataSource)
