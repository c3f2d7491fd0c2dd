"""dense_row_ids: exact row_number parity without the single-task sort."""

from __future__ import annotations

from pyspark.sql import functions as F

from clinical_vector_search_spark.functions.ids import dense_row_ids


def test_dense_row_ids_matches_global_row_number(spark, sf_dir):
    # (n_chars, doc_id) — composite with real ties on the first column,
    # made unique by the second
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    got = {
        r.doc_id: r.row_id
        for r in dense_row_ids(
            docs, ["n_chars", "doc_id"], n_partitions=7
        ).collect()
    }
    from pyspark.sql.window import Window

    w = Window.orderBy("n_chars", "doc_id")
    want = {
        r.doc_id: r.rid
        for r in docs.select(
            "doc_id", F.row_number().over(w).alias("rid")
        ).collect()
    }
    assert got == want
    n = len(want)
    assert set(got.values()) == set(range(1, n + 1))  # dense 1..N


def test_dense_row_ids_no_global_window_in_plan(spark, sf_dir):
    """The physical plan must not contain a single-partition window — the
    whole point is that every Window/Sort node runs per range partition."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = dense_row_ids(
        docs, ["n_chars", "doc_id"], n_partitions=8
    )._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan


def test_dense_row_ids_empty_frame(spark):
    df = spark.createDataFrame([], "k long")
    assert dense_row_ids(df, ["k"]).count() == 0


def test_dense_row_ids_broadcast_offsets_above_threshold(spark, monkeypatch):
    """Above _LITERAL_MAP_MAX_PARTITIONS the offsets ship as a
    broadcast-joined frame (bounded driver expression tree), with
    identical ids to the literal-map path."""
    import clinical_vector_search_spark.functions.ids as ids_mod

    df = spark.range(500).select((F.col("id") * 37 % 1000).alias("k"),
                                 F.col("id").alias("u"))
    small = {
        r.u: r.row_id
        for r in dense_row_ids(df, ["k", "u"], n_partitions=12).collect()
    }
    monkeypatch.setattr(ids_mod, "_LITERAL_MAP_MAX_PARTITIONS", 4)
    big_df = dense_row_ids(df, ["k", "u"], n_partitions=12)
    plan = big_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan  # offsets joined, not a literal
    assert "SinglePartition" not in plan, plan
    big = {r.u: r.row_id for r in big_df.collect()}
    assert big == small
    assert set(big.values()) == set(range(1, 501))
