"""Z-order layout: Morton-key exactness (vs a Python reference and the
SQL oracle twin) and the actual pruning payoff — clustered files must
have tight per-dimension min/max envelopes."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from clinical_vector_search_spark.io.layout import (
    zorder_key,
    zorder_key_sql,
    zorder_write,
)


def _morton_py(vals: list[int], bits: int) -> int:
    out = 0
    n = len(vals)
    for i, v in enumerate(vals):
        for b in range(bits):
            out |= ((v >> b) & 1) << (b * n + i)
    return out


def test_zorder_key_is_exact_morton_on_full_grid(spark):
    """On an aligned 2^bits x 2^bits grid the key must be the exact Morton
    permutation of 0..4^bits-1 — bijective, no quantization slack."""
    bits = 6
    side = 1 << bits
    df = spark.range(side * side).select(
        (F.col("id") / side).cast("long").alias("x"),
        (F.col("id") % side).alias("y"),
    )
    key = zorder_key([("x", 0, side - 1), ("y", 0, side - 1)], bits=bits)
    got = {(r.x, r.y): r.z for r in df.select("x", "y", key.alias("z")).collect()}
    assert len(set(got.values())) == side * side  # bijection
    for (x, y), z in got.items():
        assert z == _morton_py([x, y], bits)


def test_zorder_key_sql_twin_parity(spark):
    """Spark expression and DuckDB SQL rendering agree bit-for-bit,
    including clamping and non-power-of-two bounds quantization."""
    rows = [(i, 7 + (i * 37) % 450, -3 + (i * 91) % 800) for i in range(300)]
    pdf = pd.DataFrame(rows, columns=["rid", "a", "b"])
    cols = [("a", 10, 400), ("b", 0, 777)]  # clamps both ends
    sdf = spark.createDataFrame(pdf).select(
        "rid", zorder_key(cols, bits=7).alias("z")
    )
    got = {r.rid: r.z for r in sdf.collect()}

    con = duckdb.connect()
    con.register("t", pdf)
    sql = f"SELECT rid, {zorder_key_sql(cols, bits=7)} AS z FROM t"
    want = {int(rid): int(z) for rid, z in con.execute(sql).fetchall()}
    assert got == want


def test_zorder_write_tightens_file_envelopes(spark, sf_dir, tmp_path):
    """The point of the layout: after clustering lineitem on
    (l_partkey, l_suppkey), each output file's min/max envelope must cover
    a small fraction of BOTH key domains (so scans with predicates on
    either column can prune most files), while an unclustered shuffle
    write covers nearly all of each domain in every file."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_orderkey"
    )
    b = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_orderkey"), F.max("l_orderkey"),
    ).first()
    dom_p, dom_o = b[1] - b[0] + 1, b[3] - b[2] + 1
    cols = [("l_partkey", b[0], b[1]), ("l_orderkey", b[2], b[3])]

    def mean_envelope(path: str) -> tuple[float, float]:
        files = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(
                (F.max("l_partkey") - F.min("l_partkey")).alias("rp"),
                (F.max("l_orderkey") - F.min("l_orderkey")).alias("ro"),
            )
            .agg(F.avg("rp").alias("rp"), F.avg("ro").alias("ro"))
            .first()
        )
        return files.rp / dom_p, files.ro / dom_o

    zpath = str(tmp_path / "z")
    rpath = str(tmp_path / "r")
    zorder_write(li, zpath, cols, n_files=16, bits=8)
    li.repartition(16).write.mode("overwrite").parquet(rpath)

    zp, zo = mean_envelope(zpath)
    rp, ro = mean_envelope(rpath)
    # round-robin layout: every file sees ~the whole domain of both dims
    assert rp > 0.85 and ro > 0.85, (rp, ro)
    # z-order: 16 curve segments -> each file covers a small slice of BOTH
    # dims (a plain sort would give ~1/16 on one dim and ~1.0 on the other)
    assert zp < 0.55 and zo < 0.55, (zp, zo)


def test_zorder_key_rejects_int64_overflow_domains():
    import pytest

    from clinical_vector_search_spark.io.layout import zorder_key

    # epoch-ns over ~1.2 years at 8 bits: (hi-lo+1) * 256 > 2^63
    with pytest.raises(ValueError, match="overflows int64"):
        zorder_key([("ts_ns", 0, 4 * 10**16)], bits=8)
    # same domain at coarser pre-scaled resolution is fine
    zorder_key([("ts_s", 0, 4 * 10**7)], bits=8)


def test_python_datasource_deterministic_and_partition_independent(spark):
    """Spark 4 Python DataSource: rows are a pure function of the index,
    so partition count never changes the data; partitions() really
    parallelizes (one range per task)."""
    from clinical_vector_search_spark.io.pysource import register, synth_row

    register(spark)

    def load(rows, parts):
        return (
            spark.read.format("synthetic_docs")
            .option("rows", rows)
            .option("partitions", parts)
            .load()
        )

    a = {r.doc_id: r.text for r in load(97, 4).collect()}
    b = {r.doc_id: r.text for r in load(97, 13).collect()}
    assert a == b == {i: synth_row(i)[1] for i in range(97)}
    assert load(97, 4).rdd.getNumPartitions() == 4
    # text contract: 5..10 tokens from the ~1k vocab
    for t in a.values():
        toks = t.split()
        assert 5 <= len(toks) <= 10
        assert all(tok.startswith("w") for tok in toks)


def test_publish_and_verify_shards(spark, sf_dir, tmp_path):
    """Publish → verify roundtrip: manifest matches the data, shard
    assignment is a pure function of the key (stable across
    repartitioning), and tampering is detected."""
    from clinical_vector_search_spark.io.tables import (
        publish_shards,
        verify_shard_manifest,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    path = str(tmp_path / "shards")
    man = publish_shards(docs, path, 8, "doc_id", ["doc_id", "text"])
    rows = man.collect()
    assert sum(r.n_rows for r in rows) == docs.count()
    assert {r.shard for r in rows} <= set(range(8))

    # clean artifact verifies
    bad = verify_shard_manifest(spark, path, "doc_id", ["doc_id", "text"])
    assert bad.count() == 0

    # determinism: republishing from a shuffled layout -> identical manifest
    path2 = str(tmp_path / "shards2")
    man2 = publish_shards(
        docs.repartition(7), path2, 8, "doc_id", ["doc_id", "text"]
    )
    key = ["shard", "n_rows", "content_hash", "min_key", "max_key"]
    assert sorted(tuple(r[k] for k in key) for r in rows) == sorted(
        tuple(r[k] for k in key) for r in man2.collect()
    )

    # tamper: drop one row from a shard's data -> that shard mismatches
    data = spark.read.parquet(f"{path}/data")
    some_id = data.limit(1).collect()[0].doc_id
    tampered = str(tmp_path / "tampered")
    data.filter(F.col("doc_id") != some_id).write.partitionBy(
        "shard"
    ).parquet(f"{tampered}/data")
    spark.read.parquet(f"{path}/_manifest").write.parquet(
        f"{tampered}/_manifest"
    )
    bad = verify_shard_manifest(
        spark, tampered, "doc_id", ["doc_id", "text"]
    ).collect()
    assert len(bad) == 1
    assert bad[0].n_rows == bad[0].m_rows - 1


def test_jsonl_sink_roundtrip_and_manifest_gating(spark, sf_dir, tmp_path):
    """Custom Python sink: rows survive the write→manifest→read
    roundtrip exactly; files absent from the manifest are invisible;
    overwrite replaces prior committed output."""
    from clinical_vector_search_spark.io.pysource import (
        read_jsonl_sink,
        register_sink,
    )

    register_sink(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    path = str(tmp_path / "sink")
    docs.repartition(3).write.format("jsonl_sink").option(
        "path", path
    ).mode("overwrite").save()

    back = read_jsonl_sink(spark, path)
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in docs.collect()
    )

    # stray un-manifested file: invisible through the gated reader
    with open(f"{path}/part-99999-dead.jsonl", "w") as f:
        f.write('{"doc_id": -1, "n_chars": -1}\n')
    assert read_jsonl_sink(spark, path).filter("doc_id = -1").count() == 0

    # overwrite: previous committed parts are replaced, not appended
    docs.limit(10).repartition(2).write.format("jsonl_sink").option(
        "path", path
    ).mode("overwrite").save()
    assert read_jsonl_sink(spark, path).count() == 10


def test_write_audit_publish_gate(spark, sf_dir, tmp_path):
    """Single-pass WAP: a passing gate publishes atomically; a failing
    gate raises, leaves NO staged garbage, and preserves the previous
    publish."""
    import os

    import pytest as _p

    from clinical_vector_search_spark.io.tables import write_audit_publish

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    path = str(tmp_path / "wap")
    m = write_audit_publish(
        docs,
        path,
        {"n_rows": F.count(F.lit(1))},
        lambda mm: mm["n_rows"] > 0,
    )
    assert m["n_rows"] == docs.count()
    assert spark.read.parquet(path).count() == m["n_rows"]

    # failing gate: previous publish survives, nothing staged remains
    with _p.raises(ValueError, match="gate failed"):
        write_audit_publish(
            docs.limit(5),
            path,
            {"n_rows": F.count(F.lit(1))},
            lambda mm: mm["n_rows"] > 10,
        )
    assert spark.read.parquet(path).count() == m["n_rows"]
    parent = os.path.dirname(path)
    assert not [d for d in os.listdir(parent) if "__staged_" in d]


def test_route_dead_letters_observation_equals_aggregation(
    spark, sf_dir, tmp_path
):
    """The Observation riding the single write job reports exactly the
    counts a separate aggregation pass computes, and the partitioned
    split preserves every row: main ∪ dead == input, disjoint."""
    from clinical_vector_search_spark.io.tables import route_dead_letters

    e = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "props"
    )
    mangled = e.withColumn(
        "props",
        F.when(
            F.col("event_id") % 7 == 0,
            F.concat(F.lit("corrupt:"), F.col("props")),
        ).otherwise(F.col("props")),
    )
    bad = (
        F.col("props").isNotNull()
        & F.try_parse_json(F.col("props")).isNull()
    )
    path = str(tmp_path / "routed")
    got = route_dead_letters(mangled, path, bad)

    # the second-pass aggregation the Observation replaces
    agg = mangled.agg(
        F.count(F.lit(1)).alias("n"), F.sum(bad.cast("long")).alias("d")
    ).first()
    assert got["n_rows"] == agg.n
    assert got["n_dead"] == agg.d > 0

    back = spark.read.parquet(path)
    assert back.filter(F.col("_dead") == 1).count() == got["n_dead"]
    assert back.count() == got["n_rows"]
    # routed rows are exactly the mangled ones (event_id % 7)
    assert (
        back.filter((F.col("_dead") == 1) & (F.col("event_id") % 7 != 0))
        .count() == 0
    )
