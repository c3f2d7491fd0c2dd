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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)


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

    def simpleStreamReader(self, schema):
        return SyntheticDocsStreamReader(self.options)


class SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    """STREAMING half of the Spark 4 Python DataSource API
    (``spark.readStream.format("synthetic_docs")``): the same
    md5-deterministic corpus, delivered as a bounded sequence of
    micro-batches of ``batch_rows`` each. Offsets are ``{"i": n}`` row
    cursors — a pure function of batch count, so ANY replay (including
    after checkpoint recovery, via ``readBetweenOffsets``) regenerates
    bit-identical rows: exactly-once without a log, because the source
    is content-addressed by row index. When the cursor reaches
    ``rows``, ``read`` returns an empty batch with an unchanged offset
    and the stream idles — ``processAllAvailable()`` then returns,
    which is what makes the entry a bounded, driver-checkable replay.

    Scale note: the Simple reader variant reads on the DRIVER by
    design (Spark buffers the batch to executors); it is the right
    shape for control-plane-ish sources (APIs, queues) — a
    data-volume stream belongs on the partition-parallel
    ``DataSourceStreamReader`` instead, exactly like the batch reader
    above.
    """

    def __init__(self, options):
        self.total = int(options.get("rows", 500))
        self.batch = int(options.get("batch_rows", 200))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        lo = int(start["i"])
        hi = min(lo + self.batch, self.total)
        return iter([synth_row(i) for i in range(lo, hi)]), {"i": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [synth_row(i) for i in range(int(start["i"]), int(end["i"]))]
        )

    def commit(self, end: dict) -> None:
        pass


def register(spark) -> None:
    """Idempotent registration of the source with a session."""
    spark.dataSource.register(SyntheticDocsDataSource)


# ---------------------------------------------------------------------------
# Python Data SINK (the writer half of the Spark 4 DataSource API)
# ---------------------------------------------------------------------------

class _JsonlCommit(WriterCommitMessage):
    def __init__(self, filename: str, n_rows: int):
        self.filename = filename
        self.n_rows = n_rows


class JsonlSinkWriter(DataSourceWriter):
    """Per-task JSONL writer with a two-phase commit: tasks write
    ``.inprogress`` part files and return (filename, row-count) commit
    messages; the DRIVER's ``commit`` renames the parts and writes a
    ``_MANIFEST`` listing exactly the committed files (+ row counts) —
    readers that go through the manifest never see output from failed,
    speculative, or aborted task attempts. ``abort`` deletes the
    orphans. This is the same visibility contract Spark's own file
    committers provide, expressed through the Python API.

    Filesystem contract: tasks write with ``open()`` on the EXECUTOR
    and the driver renames — correct only when ``path`` is a filesystem
    both sides share (local mode, NFS, a fuse-mounted object store). On
    a multi-node cluster with node-local disks the writes land on the
    wrong machines; point ``path`` at shared storage there (exactly the
    assumption Spark's own ``file://`` sinks make)."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_sink requires .option('path', ...)")
        self.overwrite = overwrite

    def write(self, iterator):
        import json
        import os
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        fn = f"part-{pid:05d}-{uuid.uuid4().hex[:12]}.jsonl"
        n = 0
        with open(f"{self.path}/{fn}.inprogress", "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), sort_keys=True) + "\n")
                n += 1
        return _JsonlCommit(fn, n)

    def commit(self, messages):
        """Publish order is chosen so a concurrent manifest-gated reader
        never sees a missing or half-written ``_MANIFEST``: (1) rename
        the new parts into place (uuid names — no collision with old
        parts), (2) write the new manifest to a temp name and
        ``os.replace`` it over ``_MANIFEST`` (atomic on POSIX — readers
        see the complete old listing or the complete new one, never a
        mix), (3) only then garbage-collect old parts the new manifest
        doesn't list. Single concurrent WRITER is still assumed (two
        simultaneous overwrites race on the GC step); a reader that
        loaded the OLD manifest just before the swap can lose its parts
        to step 3 — the usual snapshot-GC window every manifest-swap
        table format has."""
        import os

        committed = set()
        lines = []
        for m in messages:
            if m is None:
                continue
            os.rename(
                f"{self.path}/{m.filename}.inprogress",
                f"{self.path}/{m.filename}",
            )
            committed.add(m.filename)
            lines.append(f"{m.filename}\t{m.n_rows}\n")
        tmp = f"{self.path}/_MANIFEST.inprogress"
        with open(tmp, "w") as f:
            f.writelines(sorted(lines))
        os.replace(tmp, f"{self.path}/_MANIFEST")
        if self.overwrite:
            for old in os.listdir(self.path):
                if old.endswith(".jsonl") and old not in committed:
                    os.remove(f"{self.path}/{old}")

    def abort(self, messages):
        import os

        for m in messages:
            if m is None:
                continue
            try:
                os.remove(f"{self.path}/{m.filename}.inprogress")
            except FileNotFoundError:
                pass


class JsonlSinkDataSource(DataSource):
    """``df.write.format("jsonl_sink").option("path", p).mode("overwrite")``
    — a Python-implemented sink with manifest-gated atomic visibility."""

    @classmethod
    def name(cls):
        return "jsonl_sink"

    def writer(self, schema, overwrite: bool):
        return JsonlSinkWriter(self.options, overwrite)


def read_jsonl_sink(spark, path: str):
    """Manifest-gated read-back of a :class:`JsonlSinkDataSource`
    directory: only files the committed ``_MANIFEST`` lists are read —
    stray ``.inprogress`` or orphaned parts are invisible, completing
    the sink's exactly-the-committed-rows contract."""
    with open(f"{path}/_MANIFEST") as f:
        files = [
            f"{path}/{line.split(chr(9))[0]}" for line in f if line.strip()
        ]
    return spark.read.json(files)


def register_sink(spark) -> None:
    """Idempotent registration of the sink with a session."""
    spark.dataSource.register(JsonlSinkDataSource)
