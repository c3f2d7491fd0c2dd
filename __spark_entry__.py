"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship baseline-mode query on sf0.001.
``queries()`` exposes one callable per implemented operator from
SURVEY.md §2 (plus the training-data-pipeline extensions);
``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL for every
SQL-expressible one. Column names and value rounding are aligned
between the two sides so the driver's sorted-column value-hash
comparison is meaningful down to 1e-6.

Cross-engine determinism rules used throughout:
  * all float outputs rounded to 6 decimals on BOTH sides;
  * hashes via md5 only (identical in Spark and DuckDB);
  * LCG integer math kept below 2^63 in both engines;
  * Spark int32 outputs cast to long where DuckDB yields BIGINT.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# shared constants (mirrored in the oracle SQL strings below)
# ---------------------------------------------------------------------------

KNN_K = 10
KNN_NQ = 10
DP_SIGMA = 0.15
EMBED_DIM = 16
PROJ_OUT = 8
BM25_TERMS = ["spark", "table", "query"]
MINHASH_HASHES = 4
SHINGLE_N = 3
JACCARD_THR = 0.2
NEARDUP_THR = 0.2
WINDOW_SEC = 300
SESSION_GAP_SEC = 1800
CHUNK_SIZE = 32
CHUNK_OVERLAP = 8
TFIDF_TOPK = 5
WEIGHTED_SAMPLE_N = 100
DSIR_SAMPLE_N = 50
PACK_MAX_TOKENS = 128
PACK_MAX_OPEN = 64
DECAY_HALF_LIFE_SEC = 600
# NFC probe: e + combining acute (composes to é), fi-ligature and circled-1
# (compatibility chars — NFC must NOT touch them)
NFC_PROBE = " cafe\u0301 \ufb01le \u2460"

_STOPWORDS = (
    "the a an and or of to in is it for on with as at by from that this".split()
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _vecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # read_events is dtype-adaptive (timestamp[us] or legacy long epoch-ns);
    # the legacy flag + UTC tz are fallbacks for ns-typed parquet files.
    # session.get_spark sets both at build time, but the DRIVER's session
    # isn't ours. These are SparkSession-level (not app-level) confs, so a
    # ready-set keyed by applicationId would wrongly skip sibling sessions
    # (spark.newSession()) or a conf changed after first use — instead
    # check the live value and set only on mismatch (conf reads are local,
    # no job).
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    from clinical_vector_search_spark.streaming.events import read_events

    return read_events(spark, sf_dir)


def _scratch_dir(prefix: str, tag: str) -> str:
    """Deterministic per-(prefix, tag, pid) scratch path for IO-roundtrip
    entries. The pid suffix keeps concurrent runs (driver + local checker)
    from clobbering each other's overwrite mid-scan; siblings left behind
    by DEAD pids are reaped here so repeated runs don't accumulate /tmp
    garbage (live pids are left alone)."""
    import glob
    import os
    import shutil
    import tempfile

    base = tempfile.gettempdir()
    for p in glob.glob(f"{base}/{prefix}_{tag}_*"):
        pid = p.rsplit("_", 1)[-1]
        if pid.isdigit() and int(pid) != os.getpid() and not os.path.exists(
            f"/proc/{pid}"
        ):
            shutil.rmtree(p, ignore_errors=True)
    return f"{base}/{prefix}_{tag}_{os.getpid()}"


# ---------------------------------------------------------------------------
# entry — flagship query (driver smoke check, sf0.001)
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Baseline mode end-to-end (SURVEY §3.1): normalized exact kNN of the
    first 10 corpus vectors over the embeddings table, join-back to
    documents, snippet projection."""
    from clinical_vector_search_spark.pipeline.modes import baseline_mode

    return baseline_mode(spark, "/root/testdata/sf0.001", k=KNN_K, n_queries=KNN_NQ)


# ---------------------------------------------------------------------------
# Spark-side queries
# ---------------------------------------------------------------------------


def q_rel_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing rollup — scan+filter+agg at scale (§2.6)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


def q_rel_nation_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast equi-join chain orders⋈customer⋈nation + per-nation agg."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        )
    )


def q_rel_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 windowed analytics: per-customer running order total, previous
    order price (lag), and order sequence number."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("seq"),
        F.round(
            F.sum("o_totalprice").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
            2,
        ).alias("running_total"),
        F.round(F.lag("o_totalprice", 1).over(w), 2).alias("prev_price"),
    )


def q_events_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles of event value per type —
    the oracle anchor; percentile_approx is the 100 TB single-pass path
    (tested against this within tolerance in test_extensions)."""
    e = _events(spark, sf_dir)
    return e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


def q_doc_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 deterministic hash sample (~25%) — map-side filter, no sort."""
    from clinical_vector_search_spark.pipeline.documents import hash_sample

    return hash_sample(_docs(spark, sf_dir), 0.25).select("doc_id", "n_chars")


def q_rel_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 multi-level aggregation: ROLLUP over (orderstatus, priority)
    — subtotals and grand total in one pass (partial-agg friendly; at
    scale this is one shuffle, not three separate groupBys)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


def q_rel_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data profiling: per-column (rows, nulls, distinct, min, max) over
    orders in ONE aggregation pass (unpivot via stack → groupBy column) —
    the schema-audit primitive a pipeline runs before trusting a new drop."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderpriority"]
    stacked = o.select(
        F.expr(
            "stack({n}, {args}) AS (col_name, val)".format(
                n=len(cols),
                args=", ".join(f"'{c}', cast({c} AS string)" for c in cols),
            )
        )
    )
    return stacked.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("val").alias("n_notnull"),
        F.countDistinct("val").alias("n_distinct"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )


def q_rel_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 left-semi join: customers having at least one URGENT order —
    the existence filter twin of the anti join (rel_cust_no_orders)."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


def q_rel_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 multi-level aggregation: CUBE over (orderstatus, priority) —
    all four grouping-set combinations in one shuffle (the ROLLUP twin
    plus the priority-only marginal)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


def q_rel_window_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 full rank-function family over one window (orders per customer
    by date): rank, dense_rank, percent_rank, cume_dist, ntile(4), lead —
    one shuffle, all functions share the sort."""
    from pyspark.sql import Window

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.ntile(4).over(w).alias("quartile"),
        F.lead("o_orderkey", 1).over(w).alias("next_orderkey"),
    )


def q_rel_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join (lineitem⋈orders⋈customer⋈supplier⋈
    nation⋈region) with the local-supplier constraint (customer and
    supplier share a nation), one-year date filter pushed to the orders
    scan, ASIA region pruned via broadcast. Revenue per nation."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet").filter(
        F.col("r_name") == "ASIA"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))),
                2,
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def q_io_partitioned_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned sink → pruned scan: documents written partitioned
    by lang, read back with a lang filter that must prune at the directory
    level (io/tables.py write_partitioned; pruning asserted in
    tests/test_extensions.py)."""
    from clinical_vector_search_spark.io.tables import (
        read_partitioned,
        write_partitioned,
    )

    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    path = _scratch_dir("cvs_part_docs", tag)
    write_partitioned(
        _docs(spark, sf_dir).select("doc_id", "source", "n_chars", "lang"),
        path,
        ["lang"],
    )
    return (
        read_partitioned(spark, path)
        .filter(F.col("lang").isin("en", "de"))
        .groupBy("lang", "source")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("sum_chars"))
    )


def q_events_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC candles per event_type (streaming/events.py
    ohlc_bars): open/close via min_by/max_by on a zero-padded
    (ts_ns, event_id) composite — ONE map-side-combinable aggregation,
    no per-row window."""
    from clinical_vector_search_spark.streaming.events import ohlc_bars

    return ohlc_bars(_events(spark, sf_dir), 3600)


def q_text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus term-frequency distribution
    (functions/text.py zipf_fit): OLS of ln(freq) on ln(rank), ranks via
    dense_row_ids (no single-task global sort), min_count=5 support cut.
    One (n_terms, slope, intercept, r2) row — the vocabulary-level
    corpus-quality drift signal."""
    from clinical_vector_search_spark.functions.text import zipf_fit

    return zipf_fit(_docs(spark, sf_dir), min_count=5)


def q_rel_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom semi-join reduction (operators/skew.py bloom_filtered_join):
    lineitem is probed map-side against a Bloom filter of the high-value
    order keys BEFORE the join shuffle — the explicit engine-portable
    form of runtime filter pushdown for dimensions too big to broadcast
    as hash tables. Exact: FPs pass the probe, die in the join; result
    equals the plain join (the oracle)."""
    from clinical_vector_search_spark.operators.skew import (
        bloom_filtered_join,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").alias("okey"),
        "l_returnflag",
        "l_extendedprice",
        "l_discount",
    )
    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.col("o_totalprice") > 350000)
        .select(F.col("o_orderkey").alias("okey"), "o_orderpriority")
    )
    j = bloom_filtered_join(li, o, "okey", m=1 << 16, k=4)
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
    )


def q_io_wap_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-audit-publish roundtrip (io/tables.py write_audit_publish):
    documents published through a single-pass Observation quality gate
    (metrics ride the write job — no audit rescan); the entry returns
    the gate's realized metrics read back from the PUBLISHED artifact,
    which the oracle re-derives from the source table."""
    from clinical_vector_search_spark.io.tables import write_audit_publish

    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    path = _scratch_dir("cvs_wap", tag)
    docs = _docs(spark, sf_dir).select("doc_id", "lang", "text", "n_chars")
    write_audit_publish(
        docs,
        f"{path}/docs",
        {
            "n_rows": F.count(F.lit(1)),
            "n_null_text": F.count_if(F.col("text").isNull()),
            "sum_chars": F.sum("n_chars"),
        },
        lambda m: m["n_rows"] > 0 and m["n_null_text"] == 0,
    )
    pub = spark.read.parquet(f"{path}/docs")
    return pub.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(F.col("text").isNull()).alias("n_null_text"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


def q_rel_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-maintainable aggregate update (operators/audit.py
    incremental_agg_update): the per-priority order count/revenue rollup
    maintained from a change feed (every 13th order removed, every 17th
    re-added at 1.1× price) WITHOUT rescanning the base table — the
    oracle recomputes the perturbed table from scratch; matching proves
    the delta identity."""
    from clinical_vector_search_spark.operators.audit import (
        incremental_agg_update,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base_agg = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_totalprice").alias("revenue"),
    )
    removed = o.filter(F.col("o_orderkey") % 13 == 0).select(
        "o_orderpriority", F.col("o_totalprice").alias("revenue")
    )
    added = o.filter(F.col("o_orderkey") % 17 == 0).select(
        "o_orderpriority",
        (F.col("o_totalprice") * 1.1).alias("revenue"),
    )
    upd = incremental_agg_update(
        base_agg, added, removed, ["o_orderpriority"], ["revenue"]
    )
    return upd.select(
        "o_orderpriority", "n_rows", F.round("revenue", 2).alias("revenue")
    )


def q_events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next_type | type) from consecutive event pairs (lead
    window per user, ties by event_id) — the sequence-model prior
    session_paths' path strings summarize. One user-key window + one
    (from, to)-key agg; probabilities rounded 6."""
    from pyspark.sql import Window as W

    e = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts_ns", "event_id")
    pairs = (
        e.select(
            "user_id",
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = pairs.groupBy("from_type").agg(F.sum("n").alias("_t"))
    return pairs.join(tot, "from_type").select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.col("_t"), 6).alias("p"),
    )


def q_events_power_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration of activity: users at or above the p99
    event-count threshold and the share of ALL events they produce —
    the skew headline number behind salting decisions. Exact percentile
    on the user-granularity counts (bounded frame); one row. The
    threshold is rounded to 6 before the >= membership test on BOTH
    engines — an ulp-level cross-engine difference at an integer-valued
    interpolated quantile would otherwise flip membership (the repo's
    round-before-compare rule). Scale twin: power_user_stats(approx=True)
    swaps percentile → percentile_approx (closeness pytest)."""
    from clinical_vector_search_spark.streaming.events import (
        power_user_stats,
    )

    return power_user_stats(_events(spark, sf_dir), pct=0.99, approx=False)


def q_events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU actives with stickiness: rolling 7-day distinct users
    cannot ride a plain window (distinct doesn't decompose), so each
    (user, day) row fans out to the 7 trailing report days BEFORE the
    distinct — a bounded ×7 map-side explode on day-granularity rows
    (user-day distinct first, so the fan-out input is already tiny
    relative to events). Report days restricted to those with actual
    activity; stickiness = dau/wau rounded 6."""
    e = _events(spark, sf_dir)
    ud = e.select(
        "user_id", F.expr("ts_ns div 86400000000000").alias("day")
    ).distinct()
    dau = ud.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    fan = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.col("day") + F.lit(6))
        ).alias("day"),
    )
    wau = (
        fan.join(dau.select("day"), "day")  # only real activity days
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return (
        dau.join(wau, "day")
        .select(
            "day",
            "dau",
            "wau",
            F.round(F.col("dau") / F.col("wau"), 6).alias("stickiness"),
        )
    )


def q_doc_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc n-gram novelty in ingestion (doc_id) order: the fraction
    of a doc's distinct shingles whose FIRST occurrence is this doc —
    the curve curation teams watch to see a crawl go stale (novelty
    decaying toward 0 means new documents repeat the old corpus).
    First-owner is one shingle-key min-aggregation — no ordered scan,
    no window over the corpus. Docs with no shingles drop (no
    denominator). Bounded output: per source × novelty-decile counts."""
    from clinical_vector_search_spark.functions import text as TXT

    docs = _docs(spark, sf_dir)
    sh = TXT.shingle_rows(docs, SHINGLE_N, "text", "doc_id", distinct=True)
    first = sh.groupBy("shingle").agg(F.min("doc_id").alias("_first"))
    per_doc = (
        sh.join(first, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sh"),
            F.count_if(F.col("_first") == F.col("doc_id")).alias("n_new"),
        )
        .select(
            "doc_id",
            (
                F.floor(
                    F.col("n_new") * 10 / F.col("n_sh")
                ).cast("long")
            ).alias("decile"),
        )
        .withColumn(
            "decile", F.least(F.col("decile"), F.lit(9))
        )  # novelty 1.0 joins the top decile
    )
    return (
        per_doc.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source", "decile")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def q_events_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-level distribution summary composed on sessionize: one
    row of (n_sessions, p50/p90 duration seconds, mean events/session,
    bounce rate = single-event fraction) — the engagement dashboard's
    first query. Exact percentiles here (scalar output, oracle anchor);
    session_stats(approx=True) is the percentile_approx scale twin per
    the events_quantiles convention (closeness pytest)."""
    from clinical_vector_search_spark.streaming.events import session_stats

    return session_stats(
        _events(spark, sf_dir), SESSION_GAP_SEC, approx=False
    )


def q_text_token_dropout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic word-dropout augmentation (functions/text.py
    token_dropout): ~10% of tokens dropped by md5(doc:1-based-position),
    reproducible across epochs/engines/retries; zero-shuffle indexed-
    lambda expressions, digest output for hash-checkability."""
    from clinical_vector_search_spark.functions.text import token_dropout

    return token_dropout(_docs(spark, sf_dir), drop_mod=10)


def q_dedup_minhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator quality, measured where it matters: for every
    true near-dup pair (exact Jaccard ≥ 0.2), the signature-agreement
    estimate (matching components / num_hashes) against the exact
    Jaccard, with the absolute error — the sketch-calibration table a
    pipeline consults before trusting banded MinHash recall at a new
    threshold. MINHASH_HASHES-component signatures; all three frames
    reuse the oracle-certified derivations."""
    from clinical_vector_search_spark.operators.dedup import (
        minhash_signatures,
        ngram_jaccard_pairs,
    )

    docs = _docs(spark, sf_dir)
    pairs = ngram_jaccard_pairs(
        docs, shingle_size=SHINGLE_N, threshold=JACCARD_THR
    ).select("a_id", "b_id", "jaccard")
    sigs = minhash_signatures(
        docs, num_hashes=MINHASH_HASHES, shingle_size=SHINGLE_N
    )
    est = (
        pairs.join(
            sigs.select(
                F.col("doc_id").alias("a_id"), "hash_idx",
                F.col("sig").alias("_sa"),
            ),
            "a_id",
        )
        .join(
            sigs.select(
                F.col("doc_id").alias("b_id"), "hash_idx",
                F.col("sig").alias("_sb"),
            ),
            ["b_id", "hash_idx"],
        )
        .groupBy("a_id", "b_id")
        .agg(
            (
                F.count_if(F.col("_sa") == F.col("_sb"))
                / F.lit(float(MINHASH_HASHES))
            ).alias("_est"),
            F.first("jaccard").alias("_j"),
        )
    )
    return est.select(
        "a_id",
        "b_id",
        F.round("_j", 6).alias("jaccard"),
        F.round("_est", 6).alias("est"),
        F.round(F.abs(F.col("_est") - F.col("_j")), 6).alias("abs_err"),
    )


def q_events_value_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands (§2.7 pattern completeness): per user, the
    longest CONSECUTIVE run of events with value > 50 — runs identified
    by the classic row_number-difference trick (seq − seq_within_flag is
    constant inside an island), all inside per-user windows (no global
    sort). Output bounded to users whose longest run ≥ 5."""
    from pyspark.sql import Window as W

    e = _events(spark, sf_dir).select(
        "user_id", "event_id", "ts_ns", (F.col("value") > 50).alias("hot")
    )
    w_all = W.partitionBy("user_id").orderBy("ts_ns", "event_id")
    w_hot = W.partitionBy("user_id", "hot").orderBy("ts_ns", "event_id")
    runs = (
        e.withColumn("_grp", F.row_number().over(w_all) - F.row_number().over(w_hot))
        .filter(F.col("hot"))
        .groupBy("user_id", "_grp")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    return (
        runs.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_runs"),
            F.max("run_len").alias("longest_run"),
        )
        .filter(F.col("longest_run") >= 5)
    )


def q_evaluation_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label↔cluster agreement (A1–A5 family extension): assign each
    embedding to its argmax-centroid cluster (the semantic-dedup
    quantizer), predict each row as its cluster's MAJORITY label
    (ties → smallest label), and score purity (= accuracy vs majority)
    plus chance-corrected Cohen's κ — the metric that exposes
    'accurate' clusterings that merely echo the label marginals. One
    row: (n_rows, n_clusters_used, purity, kappa)."""
    from pyspark.sql import Window as W

    from clinical_vector_search_spark.operators.dedup import (
        semantic_clusters,
    )

    emb = _vecs(spark, sf_dir)
    asg = semantic_clusters(emb, dim=64, n_clusters=8).select(
        "vec_id", "cluster"
    )
    lab = emb.select("vec_id", F.col("label").cast("long").alias("label"))
    j = asg.join(lab, "vec_id")
    maj = (
        j.groupBy("cluster", "label")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "_r",
            F.row_number().over(
                W.partitionBy("cluster").orderBy(
                    F.desc("cnt"), F.asc("label")
                )
            ),
        )
        .filter(F.col("_r") == 1)
        .select("cluster", F.col("label").alias("pred"))
    )
    scored = j.join(maj, "cluster")
    # one lazy plan: the three scalar frames (agreement counts, marginal
    # product, clusters-used) meet in 1-row crossJoins — no driver
    # actions inside the entry
    agree = scored.agg(
        F.count(F.lit(1)).alias("_n"),
        F.count_if(F.col("label") == F.col("pred")).alias("_hits"),
    )
    marg = (
        scored.groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_l"))
        .join(
            scored.groupBy(F.col("pred").alias("label")).agg(
                F.count(F.lit(1)).alias("n_p")
            ),
            "label",
        )
        .agg(F.coalesce(F.sum(F.col("n_l") * F.col("n_p")), F.lit(0)).alias("_s"))
    )
    ncl = maj.agg(F.count(F.lit(1)).alias("_ncl"))
    po = F.col("_hits") / F.col("_n")
    pe = F.col("_s") / (F.col("_n") * F.col("_n"))
    return (
        agree.crossJoin(F.broadcast(marg))
        .crossJoin(F.broadcast(ncl))
        .select(
            F.col("_n").alias("n_rows"),
            F.col("_ncl").alias("n_clusters_used"),
            F.round(po, 6).alias("purity"),
            F.round((po - pe) / (1 - pe), 6).alias("kappa"),
        )
    )


def q_knn_matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style dimension-truncated retrieval: slice the leading
    16 of 64 dims, re-normalize, exact top-k — the adaptive-dimension
    serving pattern (coarse cheap pass on a prefix of the embedding;
    MRL-trained models make the prefix meaningful, and the engine-side
    plumbing — slice, renorm, same kNN plan — is identical either way).
    Full oracle: slicing is list arithmetic in SQL too."""
    from clinical_vector_search_spark.functions import vector as V
    from clinical_vector_search_spark.operators.knn import knn

    emb = _vecs(spark, sf_dir).select(
        "vec_id",
        V.l2_normalize(F.slice("embedding", 1, 16)).alias("embedding"),
    )
    docs = emb.select(F.col("vec_id").alias("doc_id"), "embedding")
    queries = emb.filter(F.col("vec_id") < KNN_NQ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    r = knn(queries, docs, KNN_K, strategy="window")
    return r.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


def q_retrieval_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training hard-negative mining: for each anchor, the
    top-5 most-similar docs that are neither the anchor itself nor
    near-duplicates (cosine ≥ 0.95 — a near-dup labeled 'negative'
    poisons the loss). One kNN pass over-fetches k+dup-budget, then the
    band filter + re-rank trims — the standard mining recipe as a plan."""
    from pyspark.sql import Window as W

    from clinical_vector_search_spark.functions import vector as V
    from clinical_vector_search_spark.operators.knn import knn

    emb = _vecs(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"),
        V.l2_normalize("embedding").alias("embedding"),
    )
    queries = emb.filter(F.col("doc_id") < KNN_NQ).select(
        F.col("doc_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    cand = knn(queries, emb, 25, strategy="window")
    kept = cand.filter(
        (F.col("doc_id") != F.col("query_id")) & (F.col("score") < 0.95)
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        kept.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= 5)
        .select(
            "query_id",
            F.col("neg_rank").cast("long").alias("neg_rank"),
            "doc_id",
            F.round("score", 6).alias("score"),
        )
    )


def q_events_json_deadletter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupt-record routing for JSON ingestion: every 7th event's
    props is deterministically mangled (LEADING garbage — Spark's JSON
    parsers silently accept trailing garbage, so a trailing mangle
    would classify differently across engines; documented trap),
    try_parse_json(props) IS NULL routes rows to a dead-letter
    partition (io/tables.py route_dead_letters: ONE write job,
    partitionBy(_dead) split, counts metered by an Observation riding
    the write — no second scan) while valid rows aggregate normally —
    the split-don't-drop ingestion contract. The entry drives the real
    sink end-to-end: aggregates are computed from the PUBLISHED
    artifact, and the Observation-vs-aggregation equality is pinned in
    tests/test_layout.py."""
    from clinical_vector_search_spark.io.tables import route_dead_letters

    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    path = _scratch_dir("cvs_deadletter", tag)
    e = _events(spark, sf_dir)
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
    route_dead_letters(mangled.select("event_id", "event_type", "props"),
                       f"{path}/events", bad)
    back = spark.read.parquet(f"{path}/events")
    v = F.try_parse_json(F.col("props"))
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("_dead").cast("long")).alias("n_corrupt"),
        F.sum(
            F.when(F.col("_dead") == 0, F.try_variant_get(v, "$.k", "int"))
        ).alias("sum_k_valid"),
    )


def q_events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust MAD outlier counts per event_type (operators/sketch.py
    mad_outliers): median/MAD flagging where z-scores self-destruct
    (outliers inflate their own σ); rounded-before-compare boundary,
    exact-percentile form mirrored by the oracle."""
    from clinical_vector_search_spark.operators.sketch import mad_outliers

    return mad_outliers(_events(spark, sf_dir), "value", ["event_type"], 3.0)


def q_events_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass Poisson-bootstrap CI for the per-type mean value
    (operators/sketch.py poisson_bootstrap_ci): 50 replicas drawn
    map-side from seeded md5 uniforms through a shared Poisson(1)
    inverse-CDF ladder — the distributable form of the resample loop.
    Fully deterministic ⇒ the whole CI hash-checks against SQL."""
    from clinical_vector_search_spark.operators.sketch import (
        poisson_bootstrap_ci,
    )

    return poisson_bootstrap_ci(
        _events(spark, sf_dir), "value", ["event_type"], n_replicas=50
    )


def q_events_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT path over the JSON props column: parse_json →
    variant_get with a typed cast — the modern (binary-encoded,
    schema-on-read) twin of the string-scraping get_json_object entry
    (events_json_extract). At scale VARIANT parses once into a binary
    column instead of re-tokenizing the JSON string per extraction."""
    e = _events(spark, sf_dir)
    v = e.select(
        "event_type",
        F.try_variant_get(
            F.parse_json(F.col("props")), "$.k", "int"
        ).alias("k"),
    )
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("k").alias("n_with_k"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )


def q_text_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE training's core aggregation in oracle-checkable form
    (operators/bpe.py adjacent_pair_counts over the initial character
    symbols): corpus-weighted adjacent symbol-pair counts — the ⊕ anchor
    for the iterative rows-only text_bpe_train twin."""
    from clinical_vector_search_spark.operators.bpe import (
        adjacent_pair_counts,
        word_symbol_frame,
    )

    v = word_symbol_frame(_docs(spark, sf_dir))
    return adjacent_pair_counts(v).select(
        F.col("left").alias("lsym"),
        F.col("right").alias("rsym"),
        "pair_count",
    )


def q_text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE merge-training (operators/bpe.py bpe_train): 20
    merge iterations over the word-frequency dictionary — each is one
    pair-count aggregation + a pure-expression leftmost-first fold.
    Rows-only by design (each iteration's pick depends on the previous
    merge — not reasonably SQL-expressible); anchored by the ⊕
    text_bpe_pair_counts twin and exact pytest parity with an
    independent single-node BPE."""
    from clinical_vector_search_spark.operators.bpe import (
        bpe_merges_df,
        bpe_train,
    )

    return bpe_merges_df(spark, bpe_train(_docs(spark, sf_dir), n_merges=20))


def q_text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the corpus with a corpus-trained BPE merge table
    (operators/bpe.py bpe_train → bpe_encode): per-doc whitespace vs
    BPE token counts — the compression-ratio artifact. Rows-only by
    design (iterative train + apply); pinned by exact pytest parity
    with an independent single-node implementation and anchored by the
    ⊕ text_bpe_pair_counts twin."""
    from clinical_vector_search_spark.operators.bpe import (
        bpe_encode,
        bpe_train,
    )

    docs = _docs(spark, sf_dir)
    merges = bpe_train(docs, n_merges=10)
    return bpe_encode(docs, merges)


PAGERANK_ITER = 5
PAGERANK_DAMP = 0.85


def q_dedup_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the n-gram-Jaccard near-dup graph
    (operators/graph.py pagerank): 5 fixed Pregel-style iterations with
    dangling-mass redistribution — ranks near-dup clusters by
    centrality (canonical-survivor selection signal). The oracle unrolls
    the identical iterations in SQL; ranks rounded to 9."""
    from clinical_vector_search_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )
    from clinical_vector_search_spark.operators.graph import pagerank

    docs = _docs(spark, sf_dir)
    pairs = ngram_jaccard_pairs(
        docs, shingle_size=SHINGLE_N, threshold=JACCARD_THR
    ).select("a_id", "b_id")
    edges = pairs.select(
        F.col("a_id").alias("src"), F.col("b_id").alias("dst")
    ).unionByName(
        pairs.select(F.col("b_id").alias("src"), F.col("a_id").alias("dst"))
    )
    nodes = docs.select(F.col("doc_id").alias("node"))
    r = pagerank(
        nodes, edges, n_iter=PAGERANK_ITER, damping=PAGERANK_DAMP
    )
    return r.select(
        F.col("node").alias("doc_id"), F.round("rank", 9).alias("rank")
    )


def q_rel_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 distribution-window completeness: percent_rank, cume_dist and
    ntile(4) of customer account balance WITHIN each market segment (the
    window is per-group — no SinglePartition funnel; the global-rank
    regime uses dense_row_ids instead, see text_ppl_buckets). Top-5 per
    segment by (balance, custkey) keeps the output bounded."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    from pyspark.sql import Window as W

    w = W.partitionBy("c_mktsegment").orderBy(
        F.asc("c_acctbal"), F.asc("c_custkey")
    )
    ranked = c.select(
        "c_mktsegment",
        "c_custkey",
        "c_acctbal",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    )
    top = W.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        ranked.withColumn("_rn", F.row_number().over(top))
        .filter(F.col("_rn") <= 5)
        .drop("_rn")
    )


def q_rel_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 GROUPING SETS (the general form rollup/cube specialize):
    order counts/revenue by (priority, status), (priority) and () in one
    pass, with grouping_id disambiguating real NULLs from subtotal rows
    — expressed through the SQL front-end like rel_sql_interface."""
    spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView(
        "orders_gs"
    )
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               grouping_id() AS gid,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                (o_orderpriority), ())
        """
    )


def q_rel_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 unpivot (wide→long melt, the inverse of rel_pivot): per-nation
    lineitem measure columns (sum qty / base price / discount-weighted
    revenue) melted into (nation, measure, value) rows via DataFrame
    unpivot — compiles to a generator expand, one scan, no shuffle
    beyond the aggregation's."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    wide = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                2,
            ).alias("sum_disc"),
        )
    )
    return wide.unpivot(
        ["n_name"],
        ["sum_qty", "sum_base", "sum_disc"],
        "measure",
        "value",
    )


def q_multimodal_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit perceptual average-hash per media row
    (multimodal/binary_ops.py perceptual_hash): integer-exact mean test,
    emitted as two 32-bit halves so overflow-checked SQL engines can
    rebuild it — the image twin of SimHash. Fake-decode branch here
    (no codec in this container) ⇒ full md5-arithmetic oracle; the
    banded Hamming pair search is pinned separately in pytest."""
    from clinical_vector_search_spark.multimodal.binary_ops import (
        perceptual_hash,
    )

    media = _docs(spark, sf_dir).select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
    )
    return perceptual_hash(media)


def q_io_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level snapshot diff (operators/audit.py snapshot_diff — the
    derived change-data-feed): documents vs a deterministically perturbed
    successor (every 13th id removed, every 7th n_chars bumped, every
    17th re-added under a shifted id) classified added/removed/changed
    via one null-safe full-outer join; identical rows cost no output."""
    from clinical_vector_search_spark.operators.audit import snapshot_diff

    base = _docs(spark, sf_dir).select("doc_id", "lang", "n_chars")
    survivors = base.filter(F.col("doc_id") % 13 != 0).withColumn(
        "n_chars",
        F.when(
            F.col("doc_id") % 7 == 0, F.col("n_chars") + 1
        ).otherwise(F.col("n_chars")),
    )
    added = base.filter(F.col("doc_id") % 17 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "lang", "n_chars"
    )
    new = survivors.unionByName(added)
    return snapshot_diff(base, new, ["doc_id"], ["lang", "n_chars"])


def q_io_python_datasink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python Data SINK (io/pysource.py JsonlSinkDataSource — the writer
    half of the Spark 4 DataSource API): documents written through the
    custom sink's two-phase manifest commit, read back manifest-gated,
    re-aggregated. The oracle derives the same aggregate from the source
    table — matching proves the sink persisted exactly the rows."""
    from clinical_vector_search_spark.io.pysource import (
        read_jsonl_sink,
        register_sink,
    )

    register_sink(spark)
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    path = _scratch_dir("cvs_pysink", tag)
    (
        _docs(spark, sf_dir)
        .select("doc_id", "lang", "n_chars")
        .repartition(4, "doc_id")
        .write.format("jsonl_sink")
        .option("path", path)
        .mode("overwrite")
        .save()
    )
    return (
        read_jsonl_sink(spark, path)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


SHARD_COLS = ["doc_id", "source", "text", "n_chars"]


def q_io_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic shard publisher roundtrip (io/tables.py
    publish_shards): documents frozen into 16 content-addressed shards
    (shard = md5(key) pmod 16 — engine-independent, repartition-stable)
    written Hive-partitioned, plus a per-shard manifest of
    (n_rows, order-invariant XOR content hash, key range). The entry
    returns the manifest READ BACK from the published directory, so the
    oracle checks the artifact, not the plan."""
    from clinical_vector_search_spark.io.tables import publish_shards

    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    path = _scratch_dir("cvs_shards", tag)
    return publish_shards(
        _docs(spark, sf_dir).select(*SHARD_COLS),
        path,
        16,
        "doc_id",
        hash_cols=SHARD_COLS,
    )


def q_rel_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 pivot: order counts per customer-nation × order status. Pivot
    compiles to conditional aggregates (one shuffle), which is also how
    the oracle expresses it (FILTER clauses)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "n_name",
            F.coalesce("O", F.lit(0)).alias("n_open"),
            F.coalesce("F", F.lit(0)).alias("n_filled"),
            F.coalesce("P", F.lit(0)).alias("n_partial"),
        )
    )


def q_text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (emails/SSNs/phones → typed placeholders) over the
    corpus — hash-compared against the RE2 oracle to prove the patterns
    behave identically across regex engines."""
    from clinical_vector_search_spark.functions import text as TXT

    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.md5(TXT.redact_pii("text")).alias("redacted_md5"),
        (TXT.redact_pii("text") != F.col("text")).alias("changed"),
    )


def q_events_streaming_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 REAL Structured Streaming run (not the batch twin): file
    source over the events table → watermark + event-time tumbling window
    → memory sink (availableNow, complete mode). A bounded replay must
    produce exactly the batch/SQL answer — this is the exactly-once
    contract the streaming path is sold on."""
    from clinical_vector_search_spark.streaming.events import (
        run_streaming_tumbling,
    )

    r = run_streaming_tumbling(spark, sf_dir, WINDOW_SEC)
    return r.select(
        "window_start",
        "event_type",
        "n_events",
        F.round("sum_value", 6).alias("sum_value"),
    )


def q_events_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-count aggregation per event type — the oracle anchor
    for cardinality estimation; approx_count_distinct (HyperLogLog++) is
    the single-pass sketch used at 100 TB, tolerance-tested against this
    in test_extensions."""
    e = _events(spark, sf_dir)
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


def q_doc_clean_snippet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2+P3+P9: cast → clean_text → 100-char snippet."""
    from clinical_vector_search_spark.functions import text as TXT

    d = _docs(spark, sf_dir)
    cleaned = TXT.clean_text(F.col("text").cast("string"))
    return d.select("doc_id", TXT.snippet(cleaned, 100).alias("snip"))


def q_doc_specialty_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: conditional '<specialty>, <text>' concat (lang as specialty)."""
    from clinical_vector_search_spark.functions import text as TXT

    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id", F.substring(TXT.specialty_concat("lang", "text"), 1, 80).alias("aug")
    )


def q_doc_attr_sentence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10: attribute sentence concat."""
    from clinical_vector_search_spark.functions import text as TXT

    d = _docs(spark, sf_dir)
    return d.select("doc_id", TXT.attr_sentence("lang", "source").alias("attr_text"))


def q_doc_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4+P11: null-drop filter + grouped count/avg."""
    d = _docs(spark, sf_dir)
    return (
        d.na.drop(subset=["text"])
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
    )


def q_doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: exact dedup, md5-keyed, min-id survivor."""
    from clinical_vector_search_spark.operators.dedup import exact_dedup

    return exact_dedup(_docs(spark, sf_dir))


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: token count, punctuation ratio, stopword ratio."""
    from clinical_vector_search_spark.functions import text as TXT

    d = _docs(spark, sf_dir)
    toks = TXT.tokenize("text")
    return d.select(
        "doc_id",
        TXT.token_count("text").cast("long").alias("n_tokens"),
        F.round(TXT.punct_ratio("text"), 6).alias("punct_ratio"),
        F.round(TXT.stopword_ratio(toks), 6).alias("stopword_ratio"),
    )


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring heuristic over documents."""
    from clinical_vector_search_spark.functions import text as TXT

    d = _docs(spark, sf_dir)
    return d.select("doc_id", F.round(TXT.quality_score("text"), 6).alias("quality"))


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: 60-bit md5 content hash."""
    from clinical_vector_search_spark.functions import hashing as H

    d = _docs(spark, sf_dir)
    return d.select("doc_id", H.md5_long(F.col("text")).alias("fp"))


def q_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID marker counts (en/es/de/fr) per doc."""
    from clinical_vector_search_spark.functions import text as TXT

    d = _docs(spark, sf_dir)
    toks = TXT.tokenize("text")
    return d.select(
        "doc_id",
        *[
            TXT.lang_score(toks, lang).cast("long").alias(f"hits_{lang}")
            for lang in ("en", "es", "de", "fr")
        ],
        TXT.lang_id(toks).alias("lang_pred"),
    )


def q_vec_norm_checkpoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V2 L2-normalize, validated via scalar checkpoints (norm before,
    first element + sum after) — avoids cross-engine array compare."""
    from clinical_vector_search_spark.functions import vector as V

    v = _vecs(spark, sf_dir)
    nv = V.l2_normalize("embedding")
    return v.select(
        "vec_id",
        F.round(V.l2_norm("embedding"), 6).alias("norm_before"),
        F.round(F.element_at(nv, 1), 6).alias("first_after"),
        F.round(F.aggregate(nv, F.lit(0.0), lambda a, x: a + x), 6).alias("sum_after"),
    )


def q_vec_dot_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V3 dot + cosine over consecutive vector pairs."""
    from clinical_vector_search_spark.functions import vector as V

    v = _vecs(spark, sf_dir)
    a = v.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("va"))
    b = v.select((F.col("vec_id") - 1).alias("a_id"), F.col("embedding").alias("vb"))
    return (
        a.join(b, "a_id")
        .select(
            "a_id",
            F.round(V.dot("va", "vb"), 6).alias("dot"),
            F.round(V.cosine("va", "vb"), 6).alias("cosine"),
        )
    )


def q_knn_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V4+R1+R5: exact kNN top-10 of the first 10 corpus vectors
    (partial_topk strategy — the scale path; oracle is the window plan)."""
    from clinical_vector_search_spark.functions import vector as V
    from clinical_vector_search_spark.operators.knn import knn

    v = _vecs(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"), V.l2_normalize("embedding").alias("embedding")
    )
    q = v.filter(F.col("doc_id") < KNN_NQ).select(
        F.col("doc_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    r = knn(q, v, KNN_K)
    return r.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


def q_knn_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V4 via the declarative crossJoin+window strategy (plan twin)."""
    from clinical_vector_search_spark.functions import vector as V
    from clinical_vector_search_spark.operators.knn import knn

    v = _vecs(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"), V.l2_normalize("embedding").alias("embedding")
    )
    q = v.filter(F.col("doc_id") < KNN_NQ).select(
        F.col("doc_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    r = knn(q, v, KNN_K, strategy="window")
    return r.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


def q_vec_dp_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V6+A7: deterministic LCG noise on the normalized vector; per-row
    noise-quality cosine."""
    from clinical_vector_search_spark.functions import vector as V

    v = _vecs(spark, sf_dir)
    dim = 64
    nv = V.l2_normalize("embedding")
    out = v.select("vec_id", nv.alias("nv")).withColumn(
        "noisy", V.add_noise("nv", "vec_id", DP_SIGMA, dim)
    )
    return out.select(
        "vec_id", F.round(V.cosine("nv", "noisy"), 6).alias("noise_cosine")
    )


def q_vec_weighted_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V7: 0.7/0.3 weighted concat + renormalize — checkpoint columns."""
    from clinical_vector_search_spark.functions import vector as V

    v = _vecs(spark, sf_dir)
    a = v.select(F.col("vec_id"), F.col("embedding").alias("va"))
    b = v.select((F.col("vec_id") - 1).alias("vec_id"), F.col("embedding").alias("vb"))
    j = a.join(b, "vec_id")
    cat = V.l2_normalize(
        V.weighted_concat(V.l2_normalize("va"), V.l2_normalize("vb"), 0.7, 0.3)
    )
    return j.select(
        "vec_id",
        F.round(F.element_at(cat, 1), 6).alias("first_elem"),
        F.round(F.element_at(cat, 65), 6).alias("first_b_elem"),
        F.round(F.aggregate(cat, F.lit(0.0), lambda acc, x: acc + x), 6).alias(
            "sum_all"
        ),
    )


def q_vec_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V8: deterministic 64→8 random projection, one column per output dim."""
    from clinical_vector_search_spark.functions import vector as V

    v = _vecs(spark, sf_dir)
    proj = V.random_projection("embedding", 64, PROJ_OUT)
    return v.select(
        "vec_id",
        *[
            F.round(F.element_at(proj, j + 1), 6).alias(f"p{j}")
            for j in range(PROJ_OUT)
        ],
    )


def q_embed_hash_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V1 fallback encoder: sparse hash-embedding features (doc, bucket, w)."""
    from clinical_vector_search_spark.pipeline.embedding import hash_embed_features

    feats = hash_embed_features(_docs(spark, sf_dir), EMBED_DIM)
    return feats.select(
        "doc_id", F.col("j").cast("long").alias("j"), F.round("feature", 6).alias("feature")
    )


def q_bm25_okapi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2: full-corpus BM25 Okapi scores for a fixed query."""
    from clinical_vector_search_spark.operators.bm25 import bm25_score

    scored = bm25_score(_docs(spark, sf_dir), BM25_TERMS)
    return scored.select("doc_id", F.round("bm25", 6).alias("bm25"))


def q_bm25_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental BM25 index maintenance (operators/bm25.py
    bm25_index_add — the lexical member of the maintenance trilogy next
    to dedup_minhash_incremental and knn_ivfpq_index_add): the corpus
    arrives as 3 batches folded into a persisted index of ADDITIVE
    sufficient statistics (immutable postings + per-batch df deltas +
    exact-integer scalars; global idf/avgdl/epsilon-floor reconstructed
    at read time at vocabulary granularity — old postings are never
    rescanned or rewritten on ingest, cost ∝ batch). Scoring the
    reconstructed view must equal the one-shot build bit-for-bit at
    6dp, so the oracle is the bm25_okapi SQL verbatim. Idempotent
    batch-id overwrite sinks; retry safety in tests/test_bm25.py."""
    import shutil
    import tempfile

    from clinical_vector_search_spark.operators.bm25 import (
        bm25_index_add,
        bm25_read_index,
        bm25_score_index,
    )

    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    base = f"{tempfile.gettempdir()}/cvs_bm25_incr_{tag}"
    shutil.rmtree(base, ignore_errors=True)
    docs = _docs(spark, sf_dir)
    for i in range(3):
        bm25_index_add(spark, docs.filter(F.col("doc_id") % 3 == i), i, base)
    scored = bm25_score_index(bm25_read_index(spark, base), docs, BM25_TERMS)
    return scored.select("doc_id", F.round("bm25", 6).alias("bm25"))


def q_bm25_incremental_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DELETE half of the BM25 maintenance lifecycle at the driver
    gate (operators/bm25.py bm25_index_delete — delete-by-replay): the
    corpus arrives as 3 ingest batches, then every doc with
    doc_id % 7 == 2 is deleted — one tiny write of NEGATIVE df/scalar
    deltas + broadcast tombstones, the postings files untouched (the
    100 TB takedown path; physical erasure deferred to compaction).
    Scoring the reconstructed view must equal a one-shot build over the
    SURVIVORS bit-for-bit at 6dp — including the epsilon floor over the
    surviving vocabulary (terms whose last doc died must vanish from
    the idf average) — so the oracle is the bm25_okapi SQL restricted
    to surviving docs."""
    import shutil
    import tempfile

    from clinical_vector_search_spark.operators.bm25 import (
        bm25_index_add,
        bm25_index_delete,
        bm25_read_index,
        bm25_score_index,
    )

    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    base = f"{tempfile.gettempdir()}/cvs_bm25_del_{tag}"
    shutil.rmtree(base, ignore_errors=True)
    docs = _docs(spark, sf_dir)
    for i in range(3):
        bm25_index_add(spark, docs.filter(F.col("doc_id") % 3 == i), i, base)
    bm25_index_delete(spark, docs.filter(F.col("doc_id") % 7 == 2), 0, base)
    survivors = docs.filter(F.col("doc_id") % 7 != 2)
    scored = bm25_score_index(
        bm25_read_index(spark, base), survivors, BM25_TERMS
    )
    return scored.select("doc_id", F.round("bm25", 6).alias("bm25"))


def _rank_frames(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Two deterministic SQL-expressible rankings used by the metric tests:
    base = top-10 per lang by (n_chars desc, doc_id), other = by doc_id."""
    d = _docs(spark, sf_dir)
    wb = Window.partitionBy("lang").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    wo = Window.partitionBy("lang").orderBy(F.asc("doc_id"))
    base = (
        d.withColumn("rank", F.row_number().over(wb))
        .filter(F.col("rank") <= 10)
        .select(F.col("lang").alias("query_id"), "rank", "doc_id")
    )
    other = (
        d.withColumn("rank", F.row_number().over(wo))
        .filter(F.col("rank") <= 10)
        .select(F.col("lang").alias("query_id"), "rank", "doc_id")
    )
    return base, other


def q_metrics_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1–A5 (incl. the nonstandard reference NDCG) over two rankings."""
    from clinical_vector_search_spark.operators.metrics import (
        evaluate_against_baseline,
    )

    base, other = _rank_frames(spark, sf_dir)
    m = evaluate_against_baseline(base, other, 10)
    return m.select(
        "query_id",
        *[
            F.round(c, 6).alias(c)
            for c in ("recall", "precision", "accuracy", "mrr", "ndcg")
        ],
    )


def q_set_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R6: per-query top-k set overlap."""
    from clinical_vector_search_spark.operators.metrics import set_overlap

    base, other = _rank_frames(spark, sf_dir)
    return set_overlap(base, other).select(
        "query_id", F.round("overlap", 6).alias("overlap")
    )


def q_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 extension: tumbling-window event aggregation (batch twin)."""
    from clinical_vector_search_spark.streaming.events import tumbling_agg

    t = tumbling_agg(_events(spark, sf_dir), WINDOW_SEC)
    return t.select(
        "window_start",
        "event_type",
        "n_events",
        F.round("sum_value", 6).alias("sum_value"),
        F.round("avg_value", 6).alias("avg_value"),
    )


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 extension: gap-based sessionization (lag + running sum)."""
    from clinical_vector_search_spark.streaming.events import sessionize

    s = sessionize(_events(spark, sf_dir), SESSION_GAP_SEC)
    # session bounds exposed at µs precision: DuckDB's parquet view truncates
    # timestamp[ns] to TIMESTAMP (µs), so ns-exact bounds can't be oracle-checked
    return s.select(
        "user_id",
        F.col("session_seq").cast("long").alias("session_seq"),
        "n_events",
        F.expr("session_start_ns div 1000").alias("session_start_us"),
        F.expr("session_end_ns div 1000").alias("session_end_us"),
        F.round("sum_value", 6).alias("sum_value"),
    )


def q_events_sessionize_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 extension: skew-resistant sessionization — salted by time range
    so no task holds one user's full history (streaming/events.py
    sessionize_skew); must agree with the single-window oracle exactly."""
    from clinical_vector_search_spark.streaming.events import sessionize_skew

    s = sessionize_skew(_events(spark, sf_dir), SESSION_GAP_SEC, range_sec=7200)
    return s.select(
        "user_id",
        F.col("session_num").cast("long").alias("session_num"),
        "n_events",
        F.expr("session_start_ns div 1000").alias("session_start_us"),
        F.expr("session_end_ns div 1000").alias("session_end_us"),
        F.round("sum_value", 6).alias("sum_value"),
    )


def q_events_streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8: REAL Structured Streaming session windows (F.session_window,
    availableNow replay, complete mode) — streaming/events.py
    run_streaming_sessionize."""
    from clinical_vector_search_spark.streaming.events import (
        run_streaming_sessionize,
    )

    _events(spark, sf_dir)  # pins UTC/nanos fallback session confs
    return run_streaming_sessionize(spark, sf_dir, SESSION_GAP_SEC)


def q_events_streaming_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8: stream-static enrichment join (events stream ⋈ broadcast
    customer dim) rolled up per segment — streaming/events.py
    run_streaming_enrich."""
    from clinical_vector_search_spark.streaming.events import (
        run_streaming_enrich,
    )

    _events(spark, sf_dir)  # pins session confs
    return run_streaming_enrich(spark, sf_dir)


def q_events_streaming_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9: custom stateful streaming operator (applyInPandasWithState
    keyed running totals) executed as a real availableNow replay —
    streaming/events.py run_streaming_user_totals."""
    from clinical_vector_search_spark.streaming.events import (
        run_streaming_user_totals,
    )

    _events(spark, sf_dir)  # pins session confs
    return run_streaming_user_totals(spark, sf_dir)


def q_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 extension: sliding-window aggregation (300s window / 60s slide)
    via JVM sequence+explode fan-out."""
    from clinical_vector_search_spark.streaming.events import sliding_agg

    s = sliding_agg(_events(spark, sf_dir), 300, 60)
    return s.select(
        "window_start", "event_type", "n_events",
        F.round("sum_value", 6).alias("sum_value"),
    )


def q_text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-pre-tokenizer token budgeting (letter runs/digit runs/symbols)."""
    from clinical_vector_search_spark.functions import text as TXT

    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id", TXT.bpe_token_count("text").cast("long").alias("n_bpe")
    )


def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase skew-salted aggregation — exact, salt-independent."""
    from clinical_vector_search_spark.operators.skew import salted_count_sum

    # 2dp: each group sums ~20k doubles, so reassociation error (~1e-9)
    # must stay far from the rounding spacing for cross-engine stability
    s = salted_count_sum(_events(spark, sf_dir), ["event_type"], "value")
    return s.select(
        "event_type", "n_rows", F.round("sum_value", 2).alias("sum_value")
    )


def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed approximate kNN (recall contract, rows-only)."""
    from clinical_vector_search_spark.functions import vector as V
    from clinical_vector_search_spark.operators.knn import knn_ivf

    v = _vecs(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"), V.l2_normalize("embedding").alias("embedding")
    )
    q = v.filter(F.col("doc_id") < KNN_NQ).select(
        F.col("doc_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    r = knn_ivf(q, v, KNN_K, dim=64, n_centroids=16, n_probe=4)
    return r.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


def q_knn_ivf_fullprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with n_probe == n_centroids scans every bucket, so it is exact
    by construction (test_extensions.py::test_ivf_full_probe_is_exact) —
    the SQL-oracle anchor for the IVF plan shape; q_knn_ivf keeps the
    recall-contract configuration."""
    from clinical_vector_search_spark.functions import vector as V
    from clinical_vector_search_spark.operators.knn import knn_ivf

    v = _vecs(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"), V.l2_normalize("embedding").alias("embedding")
    )
    q = v.filter(F.col("doc_id") < KNN_NQ).select(
        F.col("doc_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    r = knn_ivf(q, v, KNN_K, dim=64, n_centroids=8, n_probe=8)
    return r.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


def q_mmr_lambda1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R4 degenerate contract: MMR with λ=1 drops the diversity term, so
    the greedy loop must reproduce exact-kNN relevance order (ties by
    doc id in both) — the SQL-expressible anchor for the otherwise
    non-SQL greedy re-ranker."""
    from clinical_vector_search_spark.functions import vector as V
    from clinical_vector_search_spark.operators.knn import knn
    from clinical_vector_search_spark.operators.mmr import mmr_rerank

    v = _vecs(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"), V.l2_normalize("embedding").alias("embedding")
    )
    q = v.filter(F.col("doc_id") < KNN_NQ).select(
        F.col("doc_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    cands = knn(q, v, 40).select("query_id", "doc_id")
    gathered = cands.join(v, "doc_id").join(F.broadcast(q), "query_id")
    r = mmr_rerank(spark, gathered, KNN_K, 1.0)
    return r.select(
        "query_id", F.col("rank").cast("long").alias("rank"), "doc_id"
    )


RAG_NQ = 3
RAG_CAND_K = 20


def q_rag_union_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R3 oracle anchor: the hybrid candidate set (kNN top-C ∪ BM25 top-C
    per query) — everything in the RAG pipeline before the greedy MMR —
    is plain SQL. Query text = the query doc's own text (the rag_mode
    self-retrieval setup). BM25 ranks on round(bm25, 6) so the top-C cut
    is stable across engines (group-sum reassociation ulps would
    otherwise flip the doc-id tie-break between duplicate documents)."""
    from clinical_vector_search_spark.pipeline.rag import hybrid_union

    _raw, vec_ranked, bm_ranked = _rag_candidate_parts(spark, sf_dir)
    return hybrid_union(
        vec_ranked.select("query_id", "doc_id"),
        bm_ranked.select("query_id", "doc_id"),
    )


def q_doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic sampling (training-data mixing: different
    keep-rates per source) — pipeline/documents.py stratified_hash_sample."""
    from clinical_vector_search_spark.pipeline.documents import (
        stratified_hash_sample,
    )

    d = _docs(spark, sf_dir)
    s = stratified_hash_sample(
        d, {"src0": 1.0, "src1": 0.5, "src2": 0.1}, default_rate=0.25
    )
    return s.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("n_chars").alias("sum_chars")
    )


CMS_W, CMS_D = 256, 4


def q_text_cms_heavyhitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch term frequencies vs exact counts
    (operators/sketch.py): est >= true always; sketch is depth×width
    counters regardless of vocabulary size."""
    from clinical_vector_search_spark.functions import text as TXT
    from clinical_vector_search_spark.operators.sketch import (
        cms_build,
        cms_estimate,
    )

    docs = _docs(spark, sf_dir)
    toks = docs.select(F.explode(TXT.tokenize("text")).alias("term"))
    true = toks.groupBy("term").agg(F.count("*").alias("true_count"))
    sketch = cms_build(docs, CMS_W, CMS_D)
    est = cms_estimate(sketch, true.select("term"), CMS_W, CMS_D)
    return true.join(est, "term").select("term", "true_count", "est_count")


def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters over tokens (functions/text.py
    repetition_signals): dup-token fraction + top 1/2/3-gram fractions."""
    from clinical_vector_search_spark.functions.text import repetition_signals

    return repetition_signals(_docs(spark, sf_dir))


def q_rag_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of the kNN and BM25 rankings (k0=60) — the
    rank-only hybrid fusion twin of the MMR path (pipeline/rag.py
    rrf_fuse). Same candidate generators as q_rag_union_candidates."""
    from clinical_vector_search_spark.pipeline.rag import rrf_fuse

    _raw, vec_ranked, bm_ranked = _rag_candidate_parts(spark, sf_dir)
    return rrf_fuse(
        vec_ranked.select("query_id", "doc_id", "rank"),
        bm_ranked.select("query_id", "doc_id", "rank"),
        KNN_K,
    )


PQ_M, PQ_KSUB = 8, 16


def q_vec_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding (operators/pq.py): 64-dim vector →
    8 subspace codes against the deterministic LCG codebooks (128×
    compression; the trained-codebook path is the same plan with
    pq_codebooks_trained)."""
    from clinical_vector_search_spark.operators.pq import (
        pq_codebooks_lcg,
        pq_encode,
    )

    emb = _vecs(spark, sf_dir)
    enc = pq_encode(emb, pq_codebooks_lcg(64, PQ_M, PQ_KSUB))
    # flattened to scalar rows: the driver compare stringifies array cells
    # engine-dependently (numpy vs list repr)
    return enc.select(
        "vec_id", F.posexplode("codes").alias("sub", "code")
    ).select("vec_id", F.col("sub").cast("int").alias("sub"), "code")


def q_knn_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ADC top-k: per-query m×ksub distance table + m code lookups per
    doc — the codes table is the only corpus-sized input."""
    from clinical_vector_search_spark.operators.pq import (
        knn_pq_adc,
        pq_codebooks_lcg,
        pq_encode,
    )

    emb = _vecs(spark, sf_dir)
    books = pq_codebooks_lcg(64, PQ_M, PQ_KSUB)
    queries = emb.filter(F.col("vec_id") < KNN_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    codes = pq_encode(emb, books).withColumnRenamed("vec_id", "doc_id")
    return knn_pq_adc(queries, codes, books, KNN_K)


PQ_REFINE_COARSE = 50


def q_knn_pq_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage compressed search (operators/pq.py knn_pq_refine): ADC
    over PQ codes cuts the corpus to 50 candidates/query, then exact-L2
    rescoring of ONLY those candidates (doc-id equi-join, never
    corpus-sized) ranks the final top-k — the FAISS IndexRefineFlat
    architecture."""
    from clinical_vector_search_spark.operators.pq import (
        knn_pq_refine,
        pq_codebooks_lcg,
    )

    emb = _vecs(spark, sf_dir)
    books = pq_codebooks_lcg(64, PQ_M, PQ_KSUB)
    queries = emb.filter(F.col("vec_id") < KNN_NQ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    docs = emb.select(F.col("vec_id").alias("doc_id"), "embedding")
    return knn_pq_refine(
        queries, docs, books, KNN_K, k_coarse=PQ_REFINE_COARSE
    )


def q_knn_ivfpq_index_add(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF-PQ index maintenance (operators/pq.py
    ivfpq_index_add — FAISS IndexIVFPQ.add semantics): vectors with
    vec_id % 8 == 3 are a daily-ingest batch folded into a persisted
    trained index — coarse-assigned to the EXISTING centroids and
    PQ-encoded against the EXISTING codebooks entirely map-side (the
    plan is one Project over the batch scan: zero joins, zero shuffle,
    no corpus rescan — plan-audit check 54; the serving-side twin of
    dedup_minhash_incremental). Assignment is deterministic
    (ASSIGN_SCALE quantized argmax, first-min codes), so the oracle is
    the full-index rebuild restricted to batch rows. Flattened to
    (vec_id, cluster, sub, code) scalar rows for the driver compare;
    the persisted-sink composition (idempotent batch-id overwrite,
    retry safety, compaction cadence) is exercised in tests/test_pq.py."""
    from clinical_vector_search_spark.functions import vector as V
    from clinical_vector_search_spark.operators.pq import (
        ivfpq_encode,
        pq_codebooks_lcg,
    )

    batch = _vecs(spark, sf_dir).filter(F.col("vec_id") % 8 == 3).select(
        "vec_id", V.l2_normalize("embedding").alias("embedding")
    )
    enc = ivfpq_encode(
        batch, 64, pq_codebooks_lcg(64, PQ_M, PQ_KSUB), n_centroids=8
    )
    return enc.select(
        "vec_id", "cluster", F.posexplode("codes").alias("sub", "code")
    ).select(
        "vec_id", "cluster", F.col("sub").cast("int").alias("sub"), "code"
    )


def _ivfpq_reindexed_base(spark: SparkSession, sf_dir: str) -> str:
    """Shared RESIDUAL-reindexed lifecycle fixture for the
    knn_ivfpq_reindex + knn_ivfpq_serve entries (r14 VERDICT tasks 3+5
    merged): two frozen-geometry ingests, tombstoned deletes
    (vec_id % 16 == 5), then ONE leased retrain-and-re-encode with
    residual=True — the FAISS-default IVFADC discipline (operators/
    pq.py reindex_ivfpq; the r8 finding: books must quantize the
    residual distribution the encoder feeds them) — stamping a
    residual=true _TRAINED.json atomically with the re-encoded codes
    and clearing the tombstones last. Built ONCE per process/sf and
    reused by both entries (they previously rebuilt near-identical
    lifecycles independently — ~2x the window cost): a content-keyed
    marker file written LAST makes the reuse crash-safe (a crashed
    build leaves no marker -> rebuild) and testdata-refresh-safe (the
    key includes the embeddings table's mtime/size)."""
    import os
    import shutil
    import tempfile

    from clinical_vector_search_spark.functions import vector as V
    from clinical_vector_search_spark.operators.pq import (
        ivfpq_index_add,
        ivfpq_index_delete,
        pq_codebooks_lcg,
        reindex_ivfpq,
    )

    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    base = f"{tempfile.gettempdir()}/cvs_ivfpq_life_{tag}"
    emb = os.stat(f"{sf_dir}/embeddings.parquet")
    key = (
        f"residual-v1-m{PQ_M}-k{PQ_KSUB}-c8-"
        f"{int(emb.st_mtime)}-{emb.st_size}"
    )
    marker = f"{base}/_FIXTURE_OK"
    try:
        with open(marker) as fh:
            if fh.read() == key:
                return base
    except OSError:
        pass
    shutil.rmtree(base, ignore_errors=True)
    v = _vecs(spark, sf_dir).select(
        "vec_id", V.l2_normalize("embedding").alias("embedding")
    )
    books = pq_codebooks_lcg(64, PQ_M, PQ_KSUB)
    for i, batch in enumerate(
        (v.filter(F.col("vec_id") % 8 != 3), v.filter(F.col("vec_id") % 8 == 3))
    ):
        ivfpq_index_add(
            spark, batch, i, f"{base}/codes", 64, books, n_centroids=8
        )
    ivfpq_index_delete(
        spark, v.filter(F.col("vec_id") % 16 == 5), 0, f"{base}/dead"
    )
    reindex_ivfpq(
        spark, f"{base}/codes", v, 64, m=PQ_M, ksub=PQ_KSUB,
        n_centroids=8, n_iter=0, tombstone_path=f"{base}/dead",
        residual=True, encoder="expr",
    )
    with open(marker, "w") as fh:
        fh.write(key)
    return base


def q_knn_ivfpq_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path-only serving over the RESIDUAL-reindexed maintained index
    (operators/pq.py knn_ivfpq_serve, r14; residual lane driver-visible
    since r15): the serving tier holds NO geometry — the residual=true
    trained state is STAMPED into the index as the hidden
    ``_TRAINED.json`` (atomic with the codes it encodes, carried by
    every compaction swap) and serve reads it back (mid-swap self-heal
    BEFORE the state read, swap-consistency re-verify after the codes
    listing), so the sidecar round-trip alone must select the residual
    ADC path. Fullprobe disables IVF pruning, so the oracle is residual
    PQ ADC over the NORMALIZED survivors: per-(query, cell) distance
    tables over (q − centroid). Shares the lifecycle fixture with
    knn_ivfpq_reindex (built once per process/sf)."""
    from clinical_vector_search_spark.functions import vector as V
    from clinical_vector_search_spark.operators.pq import knn_ivfpq_serve

    base = _ivfpq_reindexed_base(spark, sf_dir)
    v = _vecs(spark, sf_dir).select(
        "vec_id", V.l2_normalize("embedding").alias("embedding")
    )
    queries = v.filter(F.col("vec_id") < KNN_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    r = knn_ivfpq_serve(
        spark, f"{base}/codes", queries, KNN_K, n_probe=8,
    )
    return r.select(
        "query_id", "rank", F.col("vec_id").alias("doc_id"), "adc_dist"
    )


def q_knn_ivfpq_index_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serving over the MAINTAINED index — the read half of the
    knn_ivfpq_index_add lifecycle (operators/pq.py read_ivfpq_index +
    knn_ivfpq_codes; FAISS read_index → search over an index built by
    ``add``/``remove_ids``): the corpus arrives as two idempotent
    batch-id-overwrite ingests into a persisted codes table, ids with
    vec_id % 16 == 5 are tombstoned (ivfpq_index_delete — the GDPR
    takedown path: one tiny write, no codes rewrite), and queries are
    answered by ADC over the READ-BACK codes — the raw vectors are
    never rescanned (the 100 TB point of the codes table: raw vectors
    are cold storage, queries touch the ~128×-smaller codes), and the
    tombstone filter is a broadcast anti-join (plan-audit check 55).
    Fullprobe (n_probe = n_centroids) disables IVF pruning, so the
    result must equal plain PQ ADC restricted to the survivors — the
    oracle is the knn_pq_adc SQL over NORMALIZED vectors (the encoding
    the index holds) with the tombstoned ids filtered out."""
    import shutil
    import tempfile

    from clinical_vector_search_spark.functions import vector as V
    from clinical_vector_search_spark.operators.pq import (
        ivfpq_index_add,
        ivfpq_index_delete,
        knn_ivfpq_codes,
        pq_codebooks_lcg,
        read_ivfpq_index,
    )

    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    base = f"{tempfile.gettempdir()}/cvs_ivfpq_idx_{tag}"
    shutil.rmtree(base, ignore_errors=True)
    v = _vecs(spark, sf_dir).select(
        "vec_id", V.l2_normalize("embedding").alias("embedding")
    )
    books = pq_codebooks_lcg(64, PQ_M, PQ_KSUB)
    for i, batch in enumerate(
        (v.filter(F.col("vec_id") % 8 != 3), v.filter(F.col("vec_id") % 8 == 3))
    ):
        ivfpq_index_add(
            spark, batch, i, f"{base}/codes", 64, books, n_centroids=8
        )
    ivfpq_index_delete(
        spark, v.filter(F.col("vec_id") % 16 == 5), 0, f"{base}/dead"
    )
    index = read_ivfpq_index(
        spark, f"{base}/codes", tombstone_path=f"{base}/dead"
    )
    queries = v.filter(F.col("vec_id") < KNN_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    r = knn_ivfpq_codes(
        queries, index, KNN_K, 64, books, n_centroids=8,
        doc_id="vec_id", n_probe=8,
    )
    return r.select(
        "query_id", "rank", F.col("vec_id").alias("doc_id"), "adc_dist"
    )


def q_knn_ivfpq_reindex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leased retrain-and-re-encode compaction (operators/pq.py
    reindex_ivfpq — the drift-recovery lifecycle stage; reference
    ancestor: the from-scratch FAISS rebuild the reference pays EVERY
    run, src/pipeline/pipeline.py:126-136): the corpus arrives as two
    idempotent ingests against frozen geometry, ids with
    vec_id % 16 == 5 are tombstoned, then ONE reindex under the
    single-writer compaction lease derives the surviving membership
    FROM the index, retrains on the survivors, re-encodes them in one
    batch pass, fences the old-geometry batch names, swaps with the
    trained state stamped atomically inside the new directory, and
    clears the tombstones last (physical erasure). RESIDUAL discipline
    since r15 (the FAISS IVFADC default and the r8 finding's whole
    point): the re-encode quantizes x − centroid, and the stamped
    sidecar carries residual=true so path-only serving selects the
    residual ADC. Run with n_iter=0 so the retrained geometry is the
    deterministic normalized-md5 centroids + LCG codebooks —
    SQL-expressible (the residual subtraction is one list
    comprehension over the assigned centroid), giving the whole
    lifecycle a full value-hash oracle; the trained-loop
    recall-restoration story is pinned in
    tests/test_pq.py::test_reindex_ivfpq_restores_recall_after_drift.
    encoder="expr" is the oracle-parity twin (bit-identical to the
    default "pd" path by the ivfpq_encode parity contract). Flattened
    to (vec_id, cluster, sub, code) scalar rows. Shares the lifecycle
    fixture with knn_ivfpq_serve (built once per process/sf)."""
    from clinical_vector_search_spark.operators.pq import read_ivfpq_index

    base = _ivfpq_reindexed_base(spark, sf_dir)
    idx = read_ivfpq_index(spark, f"{base}/codes")
    return idx.select(
        "vec_id", "cluster", F.posexplode("codes").alias("sub", "code")
    ).select(
        "vec_id", "cluster", F.col("sub").cast("int").alias("sub"), "code"
    )


def q_knn_ivfpq_index_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Refine-over-maintained-index serving (operators/pq.py
    knn_refine_codes — the full FAISS IndexRefineFlat(IndexIVFPQ)
    architecture over an index built by add/remove_ids; reference
    pipeline.py:126-136 holds the single-stage ancestor): same
    two-ingest + tombstone lifecycle as knn_ivfpq_index_search, but the
    ADC over the read-back codes is only the COARSE CUT — the top
    PQ_REFINE_COARSE candidates per query have their raw (normalized)
    vectors fetched through a doc-id equi-join at candidate granularity
    (Q·k_coarse rows; the corpus vectors are never scanned corpus-wide
    on the rescore side — plan-audit check 56) and re-ranked by the
    exact L2 distance. Fullprobe disables IVF pruning so the oracle is
    composable SQL: ADC-over-survivors rank ≤ k_coarse, then the
    knn_exact_l2 rescore fold over the candidates."""
    import shutil
    import tempfile

    from clinical_vector_search_spark.functions import vector as V
    from clinical_vector_search_spark.operators.pq import (
        ivfpq_index_add,
        ivfpq_index_delete,
        knn_refine_codes,
        pq_codebooks_lcg,
        read_ivfpq_index,
    )

    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    base = f"{tempfile.gettempdir()}/cvs_ivfpq_refine_{tag}"
    shutil.rmtree(base, ignore_errors=True)
    v = _vecs(spark, sf_dir).select(
        "vec_id", V.l2_normalize("embedding").alias("embedding")
    )
    books = pq_codebooks_lcg(64, PQ_M, PQ_KSUB)
    for i, batch in enumerate(
        (v.filter(F.col("vec_id") % 8 != 3), v.filter(F.col("vec_id") % 8 == 3))
    ):
        ivfpq_index_add(
            spark, batch, i, f"{base}/codes", 64, books, n_centroids=8
        )
    ivfpq_index_delete(
        spark, v.filter(F.col("vec_id") % 16 == 5), 0, f"{base}/dead"
    )
    index = read_ivfpq_index(
        spark, f"{base}/codes", tombstone_path=f"{base}/dead"
    )
    queries = v.filter(F.col("vec_id") < KNN_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    r = knn_refine_codes(
        queries, index, v, KNN_K, 64, books, n_centroids=8,
        k_coarse=PQ_REFINE_COARSE, doc_id="vec_id", n_probe=8,
    )
    return r.select(
        "query_id", "rank", F.col("vec_id").alias("doc_id"), "l2_dist"
    )


def q_vec_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PCA (operators/pca.py): one-pass covariance partials →
    driver eigh → literal-matrix projection. Rows-only by design — the
    eigendecomposition is not SQL-expressible; fit parity vs single-node
    NumPy and expr/pd transform parity are asserted in tests/test_pca.py."""
    from clinical_vector_search_spark.operators.pca import (
        pca_fit,
        pca_transform,
    )

    emb = _vecs(spark, sf_dir).select("vec_id", "embedding")
    model = pca_fit(emb, dim=64, k=8)
    out = pca_transform(emb, model)
    return out.select(
        "vec_id",
        F.round(F.element_at("pca_vec", 1), 6).alias("pc1"),
        F.round(F.element_at("pca_vec", 2), 6).alias("pc2"),
    )


def q_knn_exact_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Euclidean exact kNN over RAW embeddings (operators/knn.py knn_l2 —
    the FAISS IndexFlatL2 metric; ranking genuinely differs from the
    inner-product knn on unnormalized vectors)."""
    from clinical_vector_search_spark.operators.knn import knn_l2

    emb = _vecs(spark, sf_dir).select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") < KNN_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    docs = emb.select(F.col("vec_id").alias("doc_id"), "embedding")
    return knn_l2(queries, docs, KNN_K)


def _ivfpq_inputs(spark: SparkSession, sf_dir: str):
    # RAW embeddings — the knn_pq_adc oracle quantizes the unnormalized
    # vectors, and the fullprobe composite must match it bit-for-bit
    emb = _vecs(spark, sf_dir).select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") < KNN_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    docs = emb.select(F.col("vec_id").alias("doc_id"), "embedding")
    return queries, docs


def q_knn_ivfpq_fullprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ with every cell probed — pruning disabled, so the composite
    must exactly reproduce plain PQ ADC (same oracle as knn_pq_adc). This
    is the correctness anchor for the approximate path below."""
    from clinical_vector_search_spark.operators.pq import (
        knn_ivfpq,
        pq_codebooks_lcg,
    )

    queries, docs = _ivfpq_inputs(spark, sf_dir)
    books = pq_codebooks_lcg(64, PQ_M, PQ_KSUB)
    return knn_ivfpq(
        queries, docs, KNN_K, 64, books, n_centroids=8, n_probe=8
    )


def q_knn_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ, 4 of 8 cells probed — approximate by design (rows-only;
    recall contract in tests/test_pq.py, exactness anchored by
    knn_ivfpq_fullprobe)."""
    from clinical_vector_search_spark.operators.pq import (
        knn_ivfpq,
        pq_codebooks_lcg,
    )

    queries, docs = _ivfpq_inputs(spark, sf_dir)
    books = pq_codebooks_lcg(64, PQ_M, PQ_KSUB)
    return knn_ivfpq(
        queries, docs, KNN_K, 64, books, n_centroids=8, n_probe=4
    )


def _rag_candidate_parts(spark: SparkSession, sf_dir: str):
    """Shared candidate generation for the rag_* entries (kNN top-C over
    normalized vectors + BM25 top-C with round-6 ranking, query text = the
    query doc's own text). MUST stay in lockstep with the vsc/vr/vc and
    bsc/br/bc CTEs of the rag_* oracles — every entry that composes these
    parts shares one implementation so kernel and oracle cannot
    desynchronize entry-by-entry. Returns (raw, vec_ranked, bm_ranked)."""
    from clinical_vector_search_spark.functions import vector as V
    from clinical_vector_search_spark.operators.bm25 import (
        bm25_index,
        bm25_topk_set,
    )
    from clinical_vector_search_spark.operators.knn import knn

    docs = _docs(spark, sf_dir)
    raw = _vecs(spark, sf_dir).select("vec_id", "embedding")
    v = raw.select(
        F.col("vec_id").alias("doc_id"), V.l2_normalize("embedding").alias("embedding")
    )
    q = v.filter(F.col("doc_id") < RAG_NQ).select(
        F.col("doc_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    vec_ranked = knn(q, v, RAG_CAND_K)
    qtexts = (
        docs.filter(F.col("doc_id") < RAG_NQ).select("doc_id", "text").collect()
    )
    qset = [
        (r["doc_id"], [t for t in r["text"].lower().split() if t])
        for r in qtexts
    ]
    bm_ranked = bm25_topk_set(
        bm25_index(docs, materialize=True), qset, RAG_CAND_K, round_to=6
    ).withColumn("query_id", F.col("query_id").cast("long"))
    return raw, vec_ranked, bm_ranked


def q_rag_mmr_rounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL hybrid-RAG greedy MMR with an exact SQL oracle: the same
    kNN ∪ BM25 candidate generation as q_rag_union_candidates, then the
    distributed applyInPandas MMR kernel with round_to=6 — rounding the
    query/pairwise similarities before each greedy argmax makes every pick
    reproducible in DuckDB's recursive-CTE greedy (raw-float MMR semantics
    stay in rag_hybrid_mmr, rows-only by design)."""
    from clinical_vector_search_spark.operators.mmr import mmr_rerank_dist
    from clinical_vector_search_spark.pipeline.rag import hybrid_union

    raw, vec_ranked, bm_ranked = _rag_candidate_parts(spark, sf_dir)
    cands = hybrid_union(
        vec_ranked.select("query_id", "doc_id"),
        bm_ranked.select("query_id", "doc_id"),
    )
    # RAW vectors into the kernel: it normalizes internally exactly once,
    # which is what the oracle's single _NORMALIZE replicates
    gathered = cands.join(
        raw.select(F.col("vec_id").alias("doc_id"), "embedding"), "doc_id"
    ).join(
        F.broadcast(
            raw.filter(F.col("vec_id") < RAG_NQ).select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("query_vec"),
            )
        ),
        "query_id",
    )
    return mmr_rerank_dist(gathered, KNN_K, 0.5, round_to=6)


def q_dedup_minhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (4 salted md5 hash family members, 3-shingles)."""
    from clinical_vector_search_spark.operators.dedup import minhash_signatures

    return minhash_signatures(
        _docs(spark, sf_dir), num_hashes=MINHASH_HASHES, shingle_size=SHINGLE_N
    )


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash 16-bit document sketch."""
    from clinical_vector_search_spark.operators.dedup import simhash

    return simhash(_docs(spark, sf_dir), bits=16)


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (postings join)."""
    from clinical_vector_search_spark.operators.dedup import ngram_jaccard_pairs

    p = ngram_jaccard_pairs(
        _docs(spark, sf_dir), shingle_size=SHINGLE_N, threshold=JACCARD_THR
    )
    return p.select("a_id", "b_id", F.round("jaccard", 6).alias("jaccard"))


def q_dedup_soft_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SoftDeDup-style sampling reweighting (operators/dedup.py
    soft_dedup_weights; He et al. 2024): keep every document, DOWN-
    WEIGHT duplicated content — commonness = mean corpus document
    frequency of the doc's distinct 3-token shingles, weight =
    1/commonness. No pairwise stage at all (one shingle-frequency join
    + one doc aggregate), the reweighting complement of the hard dedup
    family. Docs with < 3 tokens excluded (no duplication signal)."""
    from clinical_vector_search_spark.operators.dedup import (
        soft_dedup_weights,
    )

    return soft_dedup_weights(_docs(spark, sf_dir), n=SHINGLE_N)


def q_dedup_soft_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SoftDeDup closed end-to-end (the paper's actual use of the
    weights): the reweighting (operators/dedup.py soft_dedup_weights —
    weight = 1/mean-shingle-df, no pairwise stage) feeds the weighted
    A-Res corpus draw (pipeline/documents.py weighted_hash_sample), so
    duplicated boilerplate is down-sampled and unique docs over-sampled
    in ONE deterministic top-N. Docs shorter than the shingle width
    carry no duplication signal and get the weight-1 default the
    soft_dedup_weights docstring prescribes (left join + coalesce).
    Log-priorities rounded to 9 dp before ranking (the
    doc_weighted_sample cross-engine determinism knob)."""
    from clinical_vector_search_spark.operators.dedup import (
        soft_dedup_weights,
    )
    from clinical_vector_search_spark.pipeline.documents import (
        weighted_hash_sample,
    )

    docs = _docs(spark, sf_dir)
    w = soft_dedup_weights(docs, n=SHINGLE_N).select("doc_id", "weight")
    weighted = docs.select("doc_id").join(w, "doc_id", "left").select(
        "doc_id", F.coalesce("weight", F.lit(1.0)).alias("weight")
    )
    return weighted_hash_sample(
        weighted, WEIGHTED_SAMPLE_N, "weight", round_to=9
    )


def q_dedup_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPJoin-style prefix-filtered EXACT Jaccard join
    (operators/dedup.py jaccard_prefix_pairs): candidates come from a
    self-join of each doc's (1-τ)·|d|+1 rarest shingles only (global
    (df, shingle) order + length filter), then exact verification —
    identical output to the full postings join, ~τ²-fraction of the
    join input. Run at τ=0.5 (vs the full-join entry's 0.2) so the two
    entries exercise different prune regimes; oracle is the plain
    all-pairs SQL at the same threshold."""
    from clinical_vector_search_spark.operators.dedup import (
        jaccard_prefix_pairs,
    )

    p = jaccard_prefix_pairs(
        _docs(spark, sf_dir), shingle_size=SHINGLE_N, threshold=0.5
    )
    return p.select("a_id", "b_id", F.round("jaccard", 6).alias("jaccard"))


def q_dedup_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (exact quadratic path — oracle side)."""
    from clinical_vector_search_spark.operators.dedup import embedding_neardup_pairs

    p = embedding_neardup_pairs(_vecs(spark, sf_dir), threshold=NEARDUP_THR)
    return p.select("a_id", "b_id", F.round("cosine", 6).alias("cosine"))


def q_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-components duplicate-group assignment over the n-gram
    Jaccard candidate pairs (iterative min-label propagation; oracle is a
    recursive-CTE transitive closure). group_id = min doc id of the
    component; singletons keep their own id."""
    from clinical_vector_search_spark.operators.dedup import (
        dedup_groups,
        ngram_jaccard_pairs,
    )

    docs = _docs(spark, sf_dir)
    pairs = ngram_jaccard_pairs(
        docs, shingle_size=SHINGLE_N, threshold=JACCARD_THR
    )
    return dedup_groups(docs.select("doc_id"), pairs)


def q_dedup_groups_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components via alternating large-star/small-star rounds
    (O(log n) convergence, Kiveris et al. SoCC'14) over the same n-gram
    Jaccard pairs — must agree exactly with q_dedup_groups, so it shares
    its recursive-CTE oracle."""
    from clinical_vector_search_spark.operators.dedup import (
        dedup_groups_star,
        ngram_jaccard_pairs,
    )

    docs = _docs(spark, sf_dir)
    pairs = ngram_jaccard_pairs(
        docs, shingle_size=SHINGLE_N, threshold=JACCARD_THR
    )
    return dedup_groups_star(docs.select("doc_id"), pairs)


def q_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-doc selection per duplicate group (keep longest text,
    ties min id) — operators/dedup.py dedup_survivors over the
    connected-components groups."""
    from clinical_vector_search_spark.operators.dedup import (
        dedup_groups,
        dedup_survivors,
        ngram_jaccard_pairs,
    )

    docs = _docs(spark, sf_dir)
    pairs = ngram_jaccard_pairs(
        docs, shingle_size=SHINGLE_N, threshold=JACCARD_THR
    )
    return dedup_survivors(docs, dedup_groups(docs.select("doc_id"), pairs))


DECON_N = 5
DECON_BENCH = 20  # doc_id < 20 plays the held-out benchmark set
BLOOM_M = 1 << 16  # bloom decontamination: filter bits
BLOOM_K = 4  # bloom decontamination: hash count


def q_doc_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag docs sharing any word 5-gram with
    the 'benchmark' subset (operators/dedup.py decontaminate; benchmark
    grams broadcast, corpus map-side)."""
    from clinical_vector_search_spark.operators.dedup import decontaminate

    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") < DECON_BENCH).select("text")
    return decontaminate(docs, bench, n=DECON_N)


def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted equi-join (orders ⋈ customer over a salted key) rolled
    up per segment — result is salt-independent, so the oracle is the
    plain join."""
    from clinical_vector_search_spark.operators.skew import salted_join

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey", "o_totalprice"
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    j = salted_join(o, c, "o_custkey", n_salts=8)
    return j.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


def q_doc_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2–P6 composed: the load→cast→clean→null-drop→dedup pipeline over
    the documents table, keeping the testdata's explicit doc ids."""
    from clinical_vector_search_spark.pipeline.documents import clean_documents

    out = clean_documents(_docs(spark, sf_dir), id_col="doc_id")
    return out.select("doc_id", F.md5(F.col("text")).alias("text_hash"), "lang")


def q_fhe_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V8+V9+P8+R1 composed: FHE mode — deterministic 300-row subset,
    64→16 random projection, re-normalize, top-5 kNN (plaintext scoring
    stand-in; ranking contract identical per pipeline_mode.py:181-191)."""
    from clinical_vector_search_spark.pipeline.modes import fhe_mode

    r = fhe_mode(spark, sf_dir, k=5, n_queries=5, out_dim=16, subset_n=300)
    return r.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


def q_evaluation_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1–A9 harness: per-query metric table across dp/rag/fhe modes vs
    the baseline oracle, with per-mode amortized latency. Rows-only:
    latency columns are wall-clock (nondeterministic by nature)."""
    from clinical_vector_search_spark.pipeline.evaluate import run_evaluation

    return run_evaluation(spark, sf_dir, k=5, n_queries=5)


def q_evaluation_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1–A5 metric half of the evaluation harness over REAL mode outputs:
    DP (expression path) and FHE rankings scored per query against the
    exact-kNN baseline — the deterministic, oracle-checkable core that
    q_evaluation_table wraps with wall-clock latency columns."""
    from clinical_vector_search_spark.pipeline.evaluate import evaluation_metrics

    m = evaluation_metrics(spark, sf_dir, k=5, n_queries=5)
    return m.select(
        "query_id",
        *[
            F.round(c, 6).alias(c)
            for c in m.columns
            if c != "query_id"
        ],
    )


def q_rag_hybrid_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R3+R4: hybrid kNN∪BM25 candidates → greedy MMR re-rank.
    No SQL oracle (sequential greedy loop) — rows-only check; unit-tested
    against a NumPy reimplementation in tests/test_mmr.py."""
    from clinical_vector_search_spark.pipeline.modes import rag_mode

    return rag_mode(
        spark, sf_dir, k=5, n_queries=3, candidate_k=20, bm25_topk=20
    )


def q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V5 analog: hyperplane-LSH bucketed approximate kNN. The recall
    CONTRACT is tested in tests/; the pipeline itself is deterministic
    (LCG hyperplanes) so its output is oracle-checked too."""
    from clinical_vector_search_spark.functions import vector as V
    from clinical_vector_search_spark.operators.knn import knn_lsh

    v = _vecs(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"), V.l2_normalize("embedding").alias("embedding")
    )
    q = v.filter(F.col("doc_id") < KNN_NQ).select(
        F.col("doc_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    r = knn_lsh(q, v, KNN_K, dim=64, n_planes=4)
    return r.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal binary-column plumbing (metadata + mapInPandas feature
    extraction with the clearly-labeled deterministic fake decoder).

    The feature vector is flattened to 4 rounded scalar columns: the
    driver's pandas canonicalizer sorts every column and array cells are
    unhashable (the one `err` in CORRECTNESS_r02). Scalars also make the
    fake feature DuckDB-expressible (md5 byte arithmetic), upgrading this
    entry from rows-only to a full oracle check."""
    from clinical_vector_search_spark.multimodal.binary_ops import (
        attach_binary_metadata,
        extract_features,
    )

    media = _docs(spark, sf_dir).select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
    )
    meta = attach_binary_metadata(media).select("media_id", "n_bytes", "content_md5")
    feats = extract_features(media, dim=4)
    return meta.join(feats, "media_id").select(
        "media_id",
        "n_bytes",
        "content_md5",
        *[F.round(F.col("feature")[i], 6).alias(f"f{i}") for i in range(4)],
    )


def q_events_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: every 'click' gets the EARLIEST same-user 'view'
    at or after it (direction='forward' — same union-merge single-shuffle
    plan with the ts sort flipped)."""
    from clinical_vector_search_spark.operators.temporal import asof_join

    ev = _events(spark, sf_dir).withColumn("ts_us", F.expr("ts_ns div 1000"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts_us"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts_us", "value"
    )
    out = asof_join(
        clicks, views, on="user_id", left_ts="ts_us", right_ts="ts_us",
        right_cols=("event_id", "value"), right_tiebreak="event_id",
        direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts_us",
        F.col("asof_ts").alias("view_ts_us"),
        F.col("asof_event_id").alias("view_event_id"),
        F.round("asof_value", 6).alias("view_value"),
    )


def q_events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: every 'click' event gets the most recent same-user
    'view' event at or before it (union-merge plan, one shuffle)."""
    from clinical_vector_search_spark.operators.temporal import asof_join

    # µs-truncated integer time on BOTH engines: DuckDB's parquet view
    # truncates timestamp[ns] to µs, so ns-exact comparison is impossible
    ev = _events(spark, sf_dir).withColumn("ts_us", F.expr("ts_ns div 1000"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts_us"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts_us", "value"
    )
    out = asof_join(
        clicks, views, on="user_id", left_ts="ts_us", right_ts="ts_us",
        right_cols=("event_id", "value"), right_tiebreak="event_id",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts_us",
        F.col("asof_ts").alias("view_ts_us"),
        F.col("asof_event_id").alias("view_event_id"),
        F.round("asof_value", 6).alias("view_value"),
    )


def q_events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: follow-up events within 1h after each same-user error
    event (bin-bucketed equi-join, no per-key cross product), rolled up
    to per-error counts."""
    from clinical_vector_search_spark.operators.temporal import range_join

    # µs domain for oracle exactness (see q_events_asof_join)
    ev = _events(spark, sf_dir).withColumn("ts_us", F.expr("ts_ns div 1000"))
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts_us"
    )
    pairs = range_join(
        errors, ev, on="user_id", left_ts="ts_us", right_ts="ts_us",
        max_delta=3600 * 1_000_000,
    )
    return pairs.groupBy(F.col("l_id").alias("error_event_id")).agg(
        F.count("*").alias("n_followups"),
        F.min("delta").alias("min_delta_us"),
    )


def q_events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props column: JSON field extraction + typed agg
    (the training-data-pipeline staple for metadata sidecars)."""
    ev = _events(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
        )
    )


def q_events_streaming_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL watermarked stream-stream interval join (clicks ⋈ preceding
    same-user views), availableNow replay — a genuine two-stream stateful
    Structured Streaming run whose rollup hash-matches the batch SQL."""
    from clinical_vector_search_spark.streaming.events import (
        run_streaming_interval_join,
    )

    _events(spark, sf_dir)  # sets the nanosAsLong session conf
    return run_streaming_interval_join(spark, sf_dir, max_delta_sec=3600)


def q_events_streaming_outer_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """REAL watermarked stream-stream LEFT OUTER interval join: view-less
    clicks must still emit (null view columns), which Structured
    Streaming can only do once the watermark proves no match can
    arrive — the classic outer-join correctness trap. AvailableNow
    replay with typed flush sentinels (streaming/events.py
    run_streaming_interval_join_outer); rollup hash-matches the batch
    LEFT JOIN SQL."""
    from clinical_vector_search_spark.streaming.events import (
        run_streaming_interval_join_outer,
    )

    _events(spark, sf_dir)  # sets the nanosAsLong session conf
    return run_streaming_interval_join_outer(
        spark, sf_dir, max_delta_sec=3600
    )


def q_events_streaming_full_outer_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """FULL OUTER stream-stream interval join — completes the certified
    join matrix (inner/left/full): view-less clicks AND click-less
    orphan views both emit on watermark advance
    (streaming/events.py run_streaming_interval_join_full_outer).
    Hash-matches the batch FULL-join oracle (click rollup UNION
    orphan-view rows)."""
    from clinical_vector_search_spark.streaming.events import (
        run_streaming_interval_join_full_outer,
    )

    _events(spark, sf_dir)  # sets the nanosAsLong session conf
    return run_streaming_interval_join_full_outer(
        spark, sf_dir, max_delta_sec=3600
    )


def q_events_resample_gapfill(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-user hourly resample with dense-grid gap fill + forward fill
    (streaming/events.py resample_gapfill): the sequence+explode grid
    from group-granularity (min,max) aggregates, missing buckets as
    n_events=0 / v_sum NULL, v_ffill carrying the last non-null sum."""
    from clinical_vector_search_spark.streaming.events import (
        resample_gapfill,
    )

    return resample_gapfill(_events(spark, sf_dir), 3600)


def q_events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution (streaming/events.py
    attribution_linear): each purchase splits one credit unit across
    the user's view/click touches in the preceding 24h — user-key
    range join, per-conversion window 1/n, touch_type rollup."""
    from clinical_vector_search_spark.streaming.events import (
        attribution_linear,
    )

    return attribution_linear(
        _events(spark, sf_dir), ["view", "click"], "purchase", 86400
    )


def q_events_time_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted mean of value per user (streaming/events.py
    time_weighted_avg): each observation weighted by its holding
    duration (gap to the user's next event) — the irregular-time-series
    mean. One user-key window + one agg; integer-ns arithmetic until
    the final division; zero-span users excluded (undefined)."""
    from clinical_vector_search_spark.streaming.events import (
        time_weighted_avg,
    )

    return time_weighted_avg(_events(spark, sf_dir))


def q_events_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week multiplicative seasonal index per event type
    (streaming/events.py seasonal_index): phase mean / overall mean from
    ONE (type, dow)-granularity agg; group totals are a rollup of that
    aggregate (no second data pass) joined back by broadcast."""
    from clinical_vector_search_spark.streaming.events import seasonal_index

    return seasonal_index(_events(spark, sf_dir), period="dow")


def q_events_seasonal_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonally-adjusted daily anomalies (streaming/events.py
    seasonal_outliers): daily totals deflated by their dow index before
    the within-type z-score, so weekly periodicity is not flagged as
    anomaly. z rounded to 6dp before the > 2.5 compare on both engines;
    day-granularity shuffle only, stat frames broadcast."""
    from clinical_vector_search_spark.streaming.events import (
        seasonal_outliers,
    )

    r = seasonal_outliers(_events(spark, sf_dir), z_thresh=2.5)
    return r.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "day_total",
        "adjusted",
        "z",
    )


def q_events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-window EWMA per user (streaming/events.py ewma_bounded):
    weights (1-a)^age over the last 8 observations, normalized by each
    row's own finite weight sum — pandas ewm(adjust=True) truncated to a
    k-tail, the distributed-safe spelling of the sequential recursive
    EWMA (truncation error ≤ (1-a)^k of the mass). One user-key window,
    zero joins; the weighted fold is a higher-order expression."""
    from clinical_vector_search_spark.streaming.events import ewma_bounded

    r = ewma_bounded(_events(spark, sf_dir), alpha=0.25, k=8)
    return r.select(
        "user_id", "event_id", "ts_ns", F.round("value", 6).alias("value"),
        "ewma",
    )


def q_rel_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (§2.6) on this schema (no partsupp): part types
    whose revenue exceeds a FRACTION of total revenue — the
    HAVING-sum-greater-than-scalar-subquery pattern. The global total is
    a rollup OF the per-type aggregate (6 rows), never a second pass
    over lineitem, and rides a 1-row broadcast stat frame; share rounded
    to 6dp BEFORE the > 0.15 compare on both engines."""
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    p = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_type"
    )
    per = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_type")
        .agg(
            F.sum(
                F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
            ).alias("_rev")
        )
    )
    tot = per.agg(F.sum("_rev").alias("_tot"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "p_type",
            F.round("_rev", 2).alias("revenue"),
            F.round(F.col("_rev") / F.col("_tot"), 6).alias("share"),
        )
        .filter(F.col("share") > 0.15)
    )


def q_rel_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation Gini coefficient of customer revenue — the inequality
    companion of events_power_users' Pareto share. Customer revenue is
    one custkey agg (customers without orders enter at 0 via a left
    join); the rank-weighted identity
        G = 2·Σ r_i·x_i / (n·Σx) − (n+1)/n   (x ascending, r = 1..n)
    needs only a PER-NATION window (row_number ordered by revenue with
    custkey tie-break — any ordering of equal values yields the same G),
    so there is no SinglePartition global sort anywhere. Zero-revenue
    nations are excluded (G undefined)."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    rev = o.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("_rev")
    )
    cr = (
        c.join(rev, c.c_custkey == rev.o_custkey, "left")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            "n_name",
            "c_custkey",
            F.coalesce(F.col("_rev"), F.lit(0.0)).alias("x"),
        )
    )
    w = Window.partitionBy("n_name").orderBy(F.asc("x"), F.asc("c_custkey"))
    ranked = cr.select(
        "n_name", "x", F.row_number().over(w).cast("long").alias("r")
    )
    return (
        ranked.groupBy("n_name")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.round(F.sum("x"), 2).alias("total_rev"),
            F.round(
                2.0
                * F.sum(F.col("r") * F.col("x"))
                / (F.count("*") * F.sum("x"))
                - (F.count("*") + 1.0) / F.count("*"),
                6,
            ).alias("gini"),
        )
        .filter(F.col("total_rev") > 0)
    )


def q_text_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint summary per doc (functions/text.py
    winnowing_fingerprints — Schleimer et al. SIGMOD 2003, the MOSS
    plagiarism fingerprint): rightmost-min-per-window selection run as
    ONE window-min via the (hash·2^21 + inverted-pos) packed key, exact
    int64 on both engines. Summarized per doc (count, hash sum, min/max)
    so the compare covers every selected fingerprint without shipping
    raw fingerprint rows. r16: served by the Arrow twin
    winnowing_fingerprints_pd (bit-identical, parity pytest; same SQL
    oracle) — the expr path paid a doc-key exchange + two window sorts
    plus per-gram conv()/substring md5 machinery for a per-doc
    map-only computation."""
    from clinical_vector_search_spark.functions.text import (
        winnowing_fingerprints_pd,
    )

    fp = winnowing_fingerprints_pd(_docs(spark, sf_dir), k=3, w=4)
    return fp.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_fp"),
        F.sum("fp_hash").alias("fp_hash_sum"),
        F.min("fp_hash").alias("fp_hash_min"),
        F.sum("fp_pos").alias("fp_pos_sum"),
    )


def q_dedup_winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs by shared winnowing fingerprints: docs
    sharing ≥ 5 selected fingerprint HASHES (position-independent — the
    winnowing guarantee makes any shared run of ≥ w+k-1 words surface
    here). The join runs on fingerprint-hash postings at selected
    (≈ 2/(w+1)) density, ~60% fewer join rows than full-shingle
    postings; the support cut keeps only pairs with real overlap.
    r16: served by the Arrow twin winnowing_fingerprints_pd
    (bit-identical, parity pytest; same SQL oracle)."""
    from clinical_vector_search_spark.functions.text import (
        winnowing_fingerprints_pd,
    )

    fp = (
        winnowing_fingerprints_pd(_docs(spark, sf_dir), k=3, w=4)
        .select("doc_id", "fp_hash")
        .distinct()
    )
    a = fp.select(F.col("doc_id").alias("doc_a"), "fp_hash")
    b = fp.select(F.col("doc_id").alias("doc_b"), "fp_hash")
    return (
        a.join(b, "fp_hash")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= 5)
    )


def q_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the co-order part graph (operators/graph.py kcore):
    4 fixed peeling iterations (degree agg + two semi-joins each,
    localCheckpoint-pinned — the PageRank iterative discipline; the
    oracle unrolls the identical 4 peels). Output: surviving nodes with
    their in-core degree."""
    from clinical_vector_search_spark.operators.graph import kcore

    l = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = l.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = l.select("l_orderkey", F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
        .select("src", "dst")
    )
    return kcore(edges, k=3, n_iter=4).select(
        F.col("node").cast("long").alias("node"), "core_deg"
    )


def q_text_heaps_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth fit across (source × lang) corpus
    slices (functions/text.py heaps_fit): OLS of ln(V) on ln(N), one
    (tokens, distinct-terms) agg per slice — the scaling companion of
    zipf_fit's frequency-distribution read. One row out."""
    from clinical_vector_search_spark.functions.text import heaps_fit

    d = _docs(spark, sf_dir).withColumn(
        "slice_key",
        F.concat(
            F.coalesce(F.col("source"), F.lit("?")),
            F.lit("|"),
            F.coalesce(F.col("lang"), F.lit("?")),
        ),
    )
    return heaps_fit(d, group_col="slice_key")


def q_rag_query_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI-based query expansion feeding BM25, all in ONE plan: each
    query term is expanded with its top-2 PMI collocates (mined from the
    corpus itself — pseudo-thesaurus expansion) at half weight, and the
    expanded (query_id, term, qw) frame drives bm25_topk_set_df — no
    collect between mining and retrieval. PMI is rounded BEFORE the
    top-2 rank (tie → term asc); scores rounded before the top-10 cut.
    Scale shape: PMI's doc-key self-join is support-cut-bounded; the
    expansion table is vocabulary-sized and the query frame broadcast —
    retrieval stays the single-exchange BM25 plan."""
    from clinical_vector_search_spark.functions.text import pmi_cooccurrence
    from clinical_vector_search_spark.operators.bm25 import (
        bm25_index,
        bm25_topk_set_df,
    )

    docs = _docs(spark, sf_dir)
    pmi = pmi_cooccurrence(docs, min_count=10)
    qterms = spark.createDataFrame(
        [(t,) for t in BM25_TERMS], ["qterm"]
    )
    cand = (
        pmi.join(F.broadcast(qterms), pmi.term_a == F.col("qterm"))
        .select("qterm", F.col("term_b").alias("exp"), "pmi")
        .unionAll(
            pmi.join(F.broadcast(qterms), pmi.term_b == F.col("qterm"))
            .select("qterm", F.col("term_a").alias("exp"), "pmi")
        )
    )
    w = Window.partitionBy("qterm").orderBy(F.desc("pmi"), F.asc("exp"))
    expansions = (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select(
            F.col("qterm").alias("query_id"),
            F.col("exp").alias("term"),
            F.lit(0.5).alias("qw"),
        )
    )
    originals = qterms.select(
        F.col("qterm").alias("query_id"),
        F.col("qterm").alias("term"),
        F.lit(1.0).alias("qw"),
    )
    qdf = (
        originals.unionAll(expansions)
        .groupBy("query_id", "term")
        .agg(F.max("qw").alias("qw"))
    )
    res = bm25_topk_set_df(
        bm25_index(docs, materialize=True), qdf, topk=10, round_to=6
    )
    return res.select(
        "query_id", "doc_id", "bm25", F.col("rank").cast("long").alias("rank")
    )


def q_events_hll_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise distinct-overlap of user-days across event types via a
    DETERMINISTIC md5-derived HyperLogLog (operators/sketch.py
    hll_md5_registers/hll_overlap): |A∩B| ≈ est(A)+est(B)−est(A∪B),
    union = per-bucket register max. Unlike the built-in DataSketches
    binary (events_distinct_hll, rows-only by design), every register,
    estimate, and union here is bit-reproducible in ANY engine with md5
    + integer ops — so the WHOLE sketch algebra is oracle-checked, and
    the exact overlap rides along as the calibration column. Registers
    are ≤4096 rows/group: the pair algebra never touches raw events."""
    from clinical_vector_search_spark.operators.sketch import hll_overlap

    ev = _events(spark, sf_dir).select(
        "event_type",
        F.concat_ws(
            ":",
            F.col("user_id").cast("string"),
            F.date_format(F.to_date("ts"), "yyyy-MM-dd"),
        ).alias("user_day"),
    )
    return hll_overlap(ev, "event_type", "user_day")


def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed shingle-containment pairs (operators/dedup.py
    containment_pairs — Broder's containment, the superset-dup detector
    Jaccard misses): C(A,B) = |A∩B|/|A| ≥ 0.5 over 3-gram shingles.
    Same postings equi-join skeleton as ngram Jaccard; each undirected
    overlap yields up to two directed judgements."""
    from clinical_vector_search_spark.operators.dedup import (
        containment_pairs,
    )

    return containment_pairs(
        _docs(spark, sf_dir), shingle_size=SHINGLE_N, threshold=0.5
    )


def q_events_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point alarms over daily means per event type
    (streaming/events.py cusum_changepoints): the sequential
    S_t = max(0, S_{t-1} + y_t) recursion run distributively via its
    closed form S = cumsum − running-min (two window functions, one
    group-key shuffle at day granularity). Burn-in reference stats
    (first 28 days) broadcast back; h = 2σ — tight on purpose: the
    synthetic series is stationary, so only a tight threshold exercises
    the alarm path. Statistics and threshold rounded to 6dp before the
    > compare."""
    from clinical_vector_search_spark.streaming.events import (
        cusum_changepoints,
    )

    r = cusum_changepoints(_events(spark, sf_dir), h_sigma=2.0)
    return r.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "x",
        "s_up",
        "s_dn",
        "alarm_up",
        "alarm_dn",
    )


def q_rel_order_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority monthly-revenue regression (built-in regr_slope /
    regr_intercept / regr_r2 over a two-level agg): month index x =
    (year-1992)·12 + month, y = monthly revenue rounded to cents BEFORE
    the regression so both engines regress identical inputs. The first
    agg is the only fact-table shuffle; the regression runs over
    |priorities|×|months| rows."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    m = o.groupBy(
        "o_orderpriority",
        (
            (F.year("o_orderdate") - F.lit(1992)) * 12
            + F.month("o_orderdate")
        ).alias("m"),
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    return m.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_months"),
        F.round(F.regr_slope("rev", "m"), 3).alias("slope"),
        F.round(F.regr_intercept("rev", "m"), 2).alias("intercept"),
        F.round(F.regr_r2("rev", "m"), 6).alias("r2"),
    )


def q_text_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinctive terms by Dunning's signed G² log-likelihood
    ratio (functions/text.py distinctive_terms): document-frequency
    inside the slice vs the rest of the corpus under a shared-rate null,
    min_df support cut, rounded-before-rank top-5 per source."""
    from clinical_vector_search_spark.functions.text import (
        distinctive_terms,
    )

    return distinctive_terms(
        _docs(spark, sf_dir), group_col="source", topk=5, min_df=20
    )


TFIDF_QUERY_SET = [
    ("q1", ["spark", "table"]),
    ("q2", ["query", "scan", "merge"]),
    ("q3", ["window", "sort"]),
]


def q_retrieval_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse tf-idf cosine top-10 over posting lists
    (operators/sparse.py tfidf_index + tfidf_cosine_topk): the
    inverted-index twin of dense kNN — scoring touches only the terms
    the queries mention (term equi-join), never a dense per-doc vector.
    Rounded-before-rank scores (cross-engine cut stability)."""
    from clinical_vector_search_spark.operators.sparse import (
        tfidf_cosine_topk,
        tfidf_index,
    )

    from clinical_vector_search_spark.plan_cache import tracked_cache

    # the documented index lifecycle: built once, queried many — and
    # CacheManager's canonicalized-plan dedup makes repeated entry
    # invocations share one materialization. r15: the doc-norm and
    # (term, idf) side frames are part of that lifecycle (fixed per
    # index version), so they are cached alongside the postings and
    # handed to the scorer — scoring then scans the postings exactly
    # once per query batch instead of 3x (match, norms, idf lookup);
    # warm 2.26 s → 1.6 s at sf0.1, identical values by construction
    from clinical_vector_search_spark.operators.sparse import (
        tfidf_doc_norms,
    )

    idx = tracked_cache(tfidf_index(_docs(spark, sf_dir)))
    norms = tracked_cache(tfidf_doc_norms(idx).filter(F.col("norm") > 0))
    idf_tbl = tracked_cache(idx.select("term", "idf").distinct())
    rows = [
        (qid, t, 1.0) for qid, terms in TFIDF_QUERY_SET for t in terms
    ]
    qdf = spark.createDataFrame(
        rows, "query_id string, term string, qtf double"
    )
    return tfidf_cosine_topk(idx, qdf, 10, norms=norms, idf_tbl=idf_tbl)


def q_tfidf_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental TF-IDF index maintenance at the driver gate
    (operators/sparse.py tfidf_index_add / tfidf_index_delete /
    tfidf_read_index — the VSM twin of bm25_incremental_delete,
    r12 verdict task 7): the corpus arrives as 3 batches of ADDITIVE
    sufficient statistics (immutable tf postings + per-batch df deltas
    + exact-integer n_docs scalars; idf refolded at read time at
    vocabulary granularity — old postings never rescanned or rewritten,
    cost ∝ batch), then every doc with doc_id % 7 == 2 is deleted via
    delete-by-replay (negative df/n_docs deltas + broadcast tombstones,
    postings files untouched; physical erasure deferred to
    compact_tombstoned). Scoring the reconstructed view must equal a
    one-shot tfidf_index over the SURVIVORS bit-for-bit at 6dp —
    including vanished vocabulary (a term whose last doc died must
    leave the idf table) — so the oracle is the retrieval_tfidf SQL
    restricted to surviving docs. Lifecycle pytests (retry, re-delete
    fence, compaction, streaming ingest) in
    tests/test_tfidf_incremental.py."""
    import shutil
    import tempfile

    from clinical_vector_search_spark.operators.sparse import (
        tfidf_cosine_topk,
        tfidf_index_add,
        tfidf_index_delete,
        tfidf_read_index,
    )

    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    base = f"{tempfile.gettempdir()}/cvs_tfidf_incr_{tag}"
    shutil.rmtree(base, ignore_errors=True)
    docs = _docs(spark, sf_dir)
    for i in range(3):
        tfidf_index_add(spark, docs.filter(F.col("doc_id") % 3 == i), i, base)
    tfidf_index_delete(spark, docs.filter(F.col("doc_id") % 7 == 2), 0, base)
    # materialized ONCE via localCheckpoint, not tracked_cache: the
    # scoring plan reads the view 3x (term match, doc norms, query-idf
    # lookup), but this entry rmtree's and rebuilds `base` per
    # invocation — CacheManager dedups by canonicalized plan, so a
    # cached view from a previous invocation would alias the DELETED
    # files (retrieval_tfidf can cache because its input is the
    # immutable sf dir); the checkpoint is invocation-local
    idx = tfidf_read_index(spark, base).localCheckpoint()
    rows = [
        (qid, t, 1.0) for qid, terms in TFIDF_QUERY_SET for t in terms
    ]
    qdf = spark.createDataFrame(
        rows, "query_id string, term string, qtf double"
    )
    return tfidf_cosine_topk(idx, qdf, 10)


def q_rel_cust_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (§2.6): customers with no URGENT-priority orders,
    counted per segment."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.avg("c_acctbal"), 6).alias("avg_acctbal"),
        )
    )


def q_rel_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (§2.6): part⋈lineitem under an OR-of-ANDs
    predicate mixing both sides' columns. The scale property: Catalyst
    extracts the part-only disjunction (brand/size bands) and pushes it
    to the part scan, so the broadcast side is pre-filtered and the OR
    never forces a full-dimension read — plan-audited. Revenue per
    matching brand band."""
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    band = (
        (
            (F.col("p_brand") == "Brand#5")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 15)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & F.col("p_size").between(1, 20)
            & F.col("l_quantity").between(10, 25)
        )
        | (
            (F.col("p_brand") == "Brand#25")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(20, 35)
        )
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(band)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1.0 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


def q_rel_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (§2.6): customers above the average POSITIVE
    account balance (scalar-subquery threshold, computed once and
    broadcast as a 1-row stat frame) with no order since 2000-10-01
    (dormant — the anti join's probe side is date-pruned at the scan),
    grouped by nation. The threshold is rounded to 2 decimals BEFORE
    the > membership test on both engines — the repo's
    rounded-before-compare rule for float thresholds (cross-engine avg
    differs in the last ulp). Q22's literal never-ordered predicate is
    vacuous on this testdata (every customer has orders at sf≤0.01)."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.col("o_orderdate") >= F.lit("2000-10-01").cast("timestamp"))
        .select("o_custkey")
    )
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    thresh = c.filter(F.col("c_acctbal") > 0).agg(
        F.round(F.avg("c_acctbal"), 2).alias("avg_bal")
    )
    rich = c.crossJoin(F.broadcast(thresh)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return (
        idle.join(F.broadcast(n), idle.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


def q_rel_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (§2.6): lost revenue from small-quantity orders of
    one brand's parts — the classic correlated AVG subquery
    (l_quantity < 0.2 * avg(qty) for THAT part), decorrelated the way a
    100 TB plan must be: the brand filter is applied FIRST via a broadcast
    of the pre-filtered part dim, so the per-part average aggregates only
    the ~1/25 of lineitem that can ever qualify, never the full fact
    table. The per-part threshold frame (≤ brand-part-count rows) joins
    back by broadcast — zero shuffles of lineitem beyond the one
    brand-restricted agg. Threshold rounded to 6dp BEFORE the < compare
    on both engines (rounded-before-compare rule)."""
    p = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .filter(F.col("p_brand") == "Brand#5")
        .select("p_partkey")
    )
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    lp = l.join(F.broadcast(p), l.l_partkey == p.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    thr = lp.groupBy("l_partkey").agg(
        F.round(0.2 * F.avg("l_quantity"), 6).alias("qty_thr")
    )
    small = lp.join(F.broadcast(thr), "l_partkey").filter(
        F.col("l_quantity") < F.col("qty_thr")
    )
    return small.agg(
        F.count("*").cast("long").alias("n_lines"),
        F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
    )


def q_rel_blame_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (§2.6) reshaped to this schema (no commit/receipt
    dates): suppliers solely responsible for a returned order — orders
    with ≥2 distinct suppliers where EXACTLY ONE supplier had an
    'R'-returned line, credited to that supplier. Q21's correlated
    EXISTS (another supplier on the order) + NOT EXISTS (another supplier
    also late/returned) pair is decorrelated into ONE per-order
    aggregation (count distinct suppliers / distinct returned suppliers)
    instead of two self-joins of the fact table — the shape that survives
    100 TB. The blamed supplier rides the same agg as a conditional
    max (the only returned suppkey when n_ret_supp = 1), so lineitem is
    shuffled ONCE on orderkey; supplier and nation are broadcast."""
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    per_order = l.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_ret_supp"),
        F.max(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("blamed_suppkey"),
    )
    blamed = per_order.filter(
        (F.col("n_supp") >= 2) & (F.col("n_ret_supp") == 1)
    )
    return (
        blamed.join(
            F.broadcast(s), blamed.blamed_suppkey == s.s_suppkey
        )
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy("s_name", "n_name")
        .agg(F.count("*").cast("long").alias("numwait"))
        .filter(F.col("numwait") >= 1)
    )


def q_rel_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (§2.6): the supplier(s) with maximum revenue over
    one quarter — the scalar-subquery-on-an-aggregate pattern
    (rev = max(rev)). The quarter filter is pushed to the lineitem scan;
    per-supplier revenue is ONE map-side-combinable agg (≤ supplier-count
    rows); the max rides a 1-row broadcast stat frame and the tie-safe
    equality compares revenues ROUNDED to cents on both engines, so an
    ulp-level cross-engine sum difference cannot flip the argmax."""
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    rev = l.groupBy("l_suppkey").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1.0 - F.col("l_discount"))), 2
        ).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    top = rev.crossJoin(F.broadcast(mx)).filter(
        F.col("total_revenue") == F.col("max_revenue")
    )
    return top.join(F.broadcast(s), top.l_suppkey == s.s_suppkey).select(
        F.col("s_suppkey").cast("long").alias("s_suppkey"),
        "s_name",
        "total_revenue",
    )


def q_rel_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (§2.6): shipping volume between two nations by year
    — the 6-table snowflake (lineitem⋈orders⋈customer⋈nation ×
    supplier⋈nation) with a symmetric nation-pair predicate. Scale shape:
    lineitem⋈orders is the ONLY fact-fact shuffle (on orderkey); supplier,
    customer, and both nation arms are broadcast, and the nation filters
    are pushed INTO the broadcast sides so each dim arrives pre-filtered
    (customer/supplier rows of the two nations only) — the pair predicate
    then prunes at the broadcast probe, never a post-join filter over the
    full fact."""
    pair = ("NATION_1", "NATION_2")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").filter(
        F.col("n_name").isin(*pair)
    )
    c = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .join(
            F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    s = (
        spark.read.parquet(f"{sf_dir}/supplier.parquet")
        .join(
            F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
                ),
                2,
            ).alias("revenue"),
            F.count("*").cast("long").alias("n_lines"),
        )
    )


def q_rel_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining (operators/basket.py
    cooccurrence_lift): brand pairs co-ordered within the same order with
    support and lift — the Apriori first-two-passes as one declarative
    plan. Scale shape (r15): ONE basket-key exchange builds each order's
    sorted distinct item set; pairs expand via nested codegen explodes
    (fan-out ≤ basket size², never corpus²), supports and the basket
    count are map-side-combinable aggs joined back by broadcast. Lift
    rounded to 6dp."""
    from clinical_vector_search_spark.operators.basket import (
        cooccurrence_lift,
    )

    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    p = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_brand"
    )
    lb = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    return cooccurrence_lift(
        lb, "l_orderkey", "p_brand", min_pair_support=20
    ).select(
        "item_a", "item_b", "pair_n", "supp_a", "supp_b", "lift"
    )


def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting (operators/graph.py triangle_count) on the
    co-order part graph (edges: part pairs sharing ≥2 orders): per-node
    triangle participation via degree-ordered orientation — wedges are
    generated at the LOW-degree endpoint only (out-degree ≤ O(√m)), so a
    hub of degree d costs O(m) not O(d²), and each triangle closes by one
    equi-join probe. The oracle spells the same count as the naive
    id-ordered 3-way self-join — tractable at sf0.01, which is exactly
    why the oriented plan (not the naive one) is the shipped operator."""
    from clinical_vector_search_spark.operators.graph import triangle_count

    l = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = l.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = l.select("l_orderkey", F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
        .select("src", "dst")
    )
    return triangle_count(edges).select(
        F.col("node").cast("long").alias("node"), "n_triangles"
    )


def q_rel_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped 3-way join: revenue of undelivered BUILDING-segment
    orders, top 10. The customer dim is broadcast (no shuffle of the fact
    side on the customer key); orders⋈lineitem shuffles on orderkey with
    both filters pushed to the scans."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderdate") < F.lit("1997-06-30")
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_shipdate") > F.lit("1997-06-30")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("o_orderdate"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))),
                2,
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q_events_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming deduplication (availableNow replay,
    append-mode memory sink) — one row per distinct (user_id, event_type)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from clinical_vector_search_spark.streaming.events import run_streaming_dedup

    return run_streaming_dedup(spark, sf_dir)


def q_io_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink → ORC scan → aggregate: format-parity check that the same
    rows survive a round trip through Spark's second columnar format."""
    import tempfile

    from clinical_vector_search_spark.io.tables import read_orc, write_orc

    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    path = f"{tempfile.gettempdir()}/cvs_orc_docs_{tag}"
    write_orc(
        _docs(spark, sf_dir).select("doc_id", "lang", "source", "n_chars"), path
    )
    return (
        read_orc(spark, path)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.count(F.when(F.col("source") == "src1", 1)).alias("n_src1"),
        )
    )


def q_vec_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization of the embedding column (4× scan/shuffle
    volume cut for ANN at scale), validated via integer checkpoints + the
    original↔dequantized cosine."""
    from clinical_vector_search_spark.functions import vector as V

    v = _vecs(spark, sf_dir)
    s = V.quantize_scale("embedding")
    q = V.quantize_int8("embedding", scale_col=s)
    dq = V.dequantize(q, s)
    return v.select(
        "vec_id",
        F.round(s, 6).alias("scale"),
        F.element_at(q, 1).cast("long").alias("q_first"),
        F.aggregate(q, F.lit(0), lambda a, x: a + x).cast("long").alias("q_sum"),
        F.array_min(q).cast("long").alias("q_min"),
        F.array_max(q).cast("long").alias("q_max"),
        F.round(V.cosine("embedding", dq), 6).alias("cos_dequant"),
    )


def q_vec_mean_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Element-wise mean embedding per label (chunk→document pooling shape),
    validated via scalar checkpoints of the pooled vector."""
    from clinical_vector_search_spark.functions import vector as V

    pooled = V.mean_pool(_vecs(spark, sf_dir), key_col="label")
    mv = F.col("mean_vec")
    return pooled.select(
        F.col("label").cast("long").alias("label"),
        F.col("n_vecs").alias("n_vecs"),
        F.round(F.element_at(mv, 1), 6).alias("mean_first"),
        F.round(F.aggregate(mv, F.lit(0.0), lambda a, x: a + x), 6).alias(
            "mean_sum"
        ),
        F.round(V.l2_norm(mv), 6).alias("mean_norm"),
    )


def q_text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking — the pre-embedding stage of an
    LLM training/RAG pipeline (map-only fan-out, no shuffle)."""
    from clinical_vector_search_spark.functions.text import chunk_rows

    return chunk_rows(
        _docs(spark, sf_dir), size=CHUNK_SIZE, overlap=CHUNK_OVERLAP
    )


def q_text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-terms per document (corpus-level df via map-side-combined
    agg; N joined as a broadcast scalar, no driver action)."""
    from clinical_vector_search_spark.functions.text import tfidf_top_terms

    r = tfidf_top_terms(_docs(spark, sf_dir), topk=TFIDF_TOPK)
    return r.select(
        "doc_id",
        F.col("term_rank").cast("long").alias("term_rank"),
        "term",
        "tf",
        "df",
        "tfidf",
    )


def q_doc_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted reservoir sampling without replacement (A-Res, log-priority
    ln(u)/w — pipeline/documents.py weighted_hash_sample): global top-N
    docs weighted by n_chars. Priorities rounded to 9 dp before ranking so
    a 1-ulp ln() difference between Spark's and DuckDB's libm cannot flip
    the selected set."""
    from clinical_vector_search_spark.pipeline.documents import (
        weighted_hash_sample,
    )

    d = _docs(spark, sf_dir).select("doc_id", "n_chars")
    return weighted_hash_sample(
        d, WEIGHTED_SAMPLE_N, "n_chars", round_to=9
    )


def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization (functions/text.py normalize_text_pd, an
    Arrow-batched stdlib-unicodedata kernel). A decomposed probe suffix is
    appended to every doc so the kernel provably composes (e+U+0301 -> é)
    while leaving compatibility chars (fi-ligature, circled-1) alone; the
    oracle is DuckDB's utf8proc nfc_normalize. Emits md5 + codepoint count
    of the normalized text."""
    from clinical_vector_search_spark.functions.text import normalize_text_pd

    d = _docs(spark, sf_dir).select(
        "doc_id", F.concat("text", F.lit(NFC_PROBE)).alias("text")
    )
    r = normalize_text_pd(d, form="NFC", strip_accents=False, casefold=False)
    return r.select(
        "doc_id",
        F.md5("norm_text").alias("norm_md5"),
        F.length("norm_text").cast("long").alias("n_codepoints"),
    )


def q_doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy bounded first-fit sequence packing (functions/text.py
    pack_sequences). The scale path packs per-partition (pytest
    invariants); this oracle twin pins ONE doc_id-sorted partition so the
    DuckDB recursive-CTE packer can replay the identical fit order —
    per-pack membership is then exactly reproducible."""
    from clinical_vector_search_spark.functions.text import pack_sequences

    d = _docs(spark, sf_dir).coalesce(1).sortWithinPartitions("doc_id")
    r = pack_sequences(d, max_tokens=PACK_MAX_TOKENS)
    return r.select("pack_id", "doc_id", "n_tokens")


def q_events_decayed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-decayed per-user event counters (streaming/events.py
    decayed_counts): each event weighs 2^(-age/half_life) as of the max
    event time — one map-side-combined aggregation."""
    from clinical_vector_search_spark.streaming.events import decayed_counts

    r = decayed_counts(
        _events(spark, sf_dir), half_life_sec=DECAY_HALF_LIFE_SEC
    )
    return r.select(
        "user_id",
        F.round("decayed_count", 6).alias("decayed_count"),
        F.round("decayed_value_sum", 6).alias("decayed_value_sum"),
        "n_events",
    )


def q_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash Hamming-near pairs via block banding (operators/dedup.py
    simhash_candidate_pairs): 32-bit sketches split into 4 blocks,
    equi-join on any identical block (pigeonhole: total recall to Hamming
    distance 3), exact popcount filter."""
    from clinical_vector_search_spark.operators.dedup import (
        simhash,
        simhash_candidate_pairs,
    )

    sk = simhash(_docs(spark, sf_dir), bits=32)
    p = simhash_candidate_pairs(sk, bits=32, n_blocks=4)
    return p.select("a_id", "b_id", F.col("hamming").cast("long").alias("hamming"))


def q_io_compact_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction (io/tables.py compact_parquet): documents
    written as 16 deliberately-tiny files, compacted into size-targeted
    files (here 1), read back — content must be byte-identical to the
    source table and the file count must hit the target."""
    import os

    from clinical_vector_search_spark.io.tables import compact_parquet

    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    path = _scratch_dir("cvs_compact_docs", tag)
    (
        _docs(spark, sf_dir)
        .select("doc_id", "source", "n_chars")
        .repartition(16)
        .write.mode("overwrite")
        .parquet(path)
    )
    compact_parquet(spark, path, target_file_bytes=1 << 30)
    # the OBSERVED post-compaction file count — the oracle pins it to 1,
    # so a compaction that fails to merge shows up as a value mismatch
    n_parts = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    return (
        spark.read.parquet(path)
        .select("doc_id", "source", "n_chars")
        .withColumn("n_files_after", F.lit(n_parts).cast("long"))
    )


def q_io_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout key over (l_partkey, l_orderkey) with
    data-derived bounds — io/layout.py zorder_key, the clustering key
    behind zorder_write's multi-dimensional file pruning (envelope payoff
    asserted in tests/test_layout.py; here the oracle pins the exact
    integer bit-interleave both engines must agree on)."""
    from clinical_vector_search_spark.io.layout import zorder_key

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    b = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_orderkey"), F.max("l_orderkey"),
    ).first()
    key = zorder_key(
        [("l_partkey", b[0], b[1]), ("l_orderkey", b[2], b[3])], bits=8
    )
    return (
        li.filter(F.col("l_orderkey") < 300)
        .select("l_orderkey", "l_linenumber", "l_partkey", key.alias("zkey"))
    )


def q_doc_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture rebalancing (pipeline/documents.py mixture_sample): target
    domain proportions 50/30/20 over a 60-row budget; keep-rates derived
    from observed counts, applied as the deterministic md5-threshold
    filter. Untargeted sources drop."""
    from clinical_vector_search_spark.pipeline.documents import mixture_sample

    d = _docs(spark, sf_dir)
    s = mixture_sample(d, {"src0": 0.5, "src1": 0.3, "src2": 0.2}, 60)
    return s.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("n_chars").alias("sum_chars")
    )


def q_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document sentence-span dedup (operators/dedup.py span_dedup,
    the C4/RefinedWeb boilerplate-removal shape): each normalized span
    survives only at its first (doc_id, pos) occurrence; docs reassembled
    from surviving spans."""
    from clinical_vector_search_spark.operators.dedup import span_dedup

    return span_dedup(_docs(spark, sf_dir))


def q_dedup_repeated_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated 5-token-window scoring (operators/dedup.py
    repeated_window_fraction — the Lee et al. exact-substring duplication
    signal at window granularity): per-doc hot-window fraction."""
    from clinical_vector_search_spark.operators.dedup import (
        repeated_window_fraction,
    )

    return repeated_window_fraction(_docs(spark, sf_dir), 5, 2)


def q_io_dataset_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-invariant dataset content fingerprint (functions/hashing.py
    dataset_fingerprint): one (n_rows, content_hash) row over documents —
    map-side XOR of per-row md5-longs, the lineage/reproducibility
    identity check."""
    from clinical_vector_search_spark.functions.hashing import (
        dataset_fingerprint,
    )

    cols = ["doc_id", "source", "text", "n_chars"]
    return dataset_fingerprint(_docs(spark, sf_dir).select(*cols), cols)


INCR_CORPUS_MAX = 400  # doc_id < 400 plays the existing corpus


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup ingest filter (operators/dedup.py
    dedup_incremental): docs with id >= 400 play the incoming batch,
    probed as a left-semi band/bucket join against the persisted MinHash
    index of the id < 400 corpus — each batch shingles only itself."""
    from clinical_vector_search_spark.operators.dedup import (
        dedup_incremental,
        minhash_band_buckets,
        minhash_signatures,
    )

    docs = _docs(spark, sf_dir)
    corpus = docs.filter(F.col("doc_id") < INCR_CORPUS_MAX)
    new = docs.filter(F.col("doc_id") >= INCR_CORPUS_MAX)
    idx = minhash_band_buckets(
        minhash_signatures(corpus, MINHASH_HASHES, SHINGLE_N), 2
    )
    return dedup_incremental(
        new, idx, MINHASH_HASHES, 2, SHINGLE_N
    )


def q_dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental banded-MinHash near-dup PAIR maintenance
    (operators/dedup.py minhash_pairs_incremental): docs with
    id >= 400 play the incoming batch against the persisted MinHash
    band index of the id < 400 corpus — the batch's band keys are
    broadcast to semi-filter the corpus index (zero shuffle of
    untouched buckets, no old×old rescan), then new×new and new×old
    candidate pairs are emitted. The oracle is the full-corpus banded
    recompute restricted to pairs touching the batch."""
    from clinical_vector_search_spark.operators.dedup import (
        minhash_band_buckets,
        minhash_pairs_incremental,
        minhash_signatures,
    )

    docs = _docs(spark, sf_dir)
    corpus = docs.filter(F.col("doc_id") < INCR_CORPUS_MAX)
    new = docs.filter(F.col("doc_id") >= INCR_CORPUS_MAX)
    idx = minhash_band_buckets(
        minhash_signatures(corpus, MINHASH_HASHES, SHINGLE_N), 2
    )
    return minhash_pairs_incremental(
        new, idx, MINHASH_HASHES, 2, SHINGLE_N
    )


def q_dedup_groups_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental duplicate-GROUP maintenance (operators/dedup.py
    dedup_groups_incremental): the id < 400 corpus carries persisted
    min-id component labels over its banded-MinHash pair graph; the
    id >= 400 batch's incremental pairs fold in via touched-component
    star subgraphs (broadcast probes, cost ∝ touched components — no
    corpus-wide CC rerun). Emits labels for every component containing
    a batch doc; the oracle is the from-scratch transitive closure over
    the FULL band pair graph restricted to those components."""
    from clinical_vector_search_spark.operators.dedup import (
        dedup_groups,
        dedup_groups_incremental,
        minhash_band_buckets,
        minhash_candidate_pairs,
        minhash_pairs_incremental,
        minhash_signatures,
    )

    docs = _docs(spark, sf_dir)
    corpus = docs.filter(F.col("doc_id") < INCR_CORPUS_MAX)
    new = docs.filter(F.col("doc_id") >= INCR_CORPUS_MAX)
    old_labels = dedup_groups(
        corpus.select("doc_id"),
        minhash_candidate_pairs(corpus, MINHASH_HASHES, 2, SHINGLE_N),
    )
    idx = minhash_band_buckets(
        minhash_signatures(corpus, MINHASH_HASHES, SHINGLE_N), 2
    )
    new_pairs = minhash_pairs_incremental(
        new, idx, MINHASH_HASHES, 2, SHINGLE_N
    )
    return dedup_groups_incremental(
        old_labels, new_pairs, new.select("doc_id")
    )


def q_dedup_streaming_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming near-dup ingestion (operators/dedup.py
    streaming_neardup_ingest): the documents table replays as 4
    micro-batches (availableNow, maxFilesPerTrigger=1); each batch
    probes-then-appends the persisted band index via foreachBatch. The
    accumulated pair set is chunking-invariant (each pair lands once,
    when its later doc arrives), so the oracle is the ONE-SHOT full
    banded pair recompute."""
    import shutil
    import tempfile

    from clinical_vector_search_spark.operators.dedup import (
        read_neardup_output,
        streaming_neardup_ingest,
    )

    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    base = f"{tempfile.gettempdir()}/cvs_stream_neardup_{tag}"
    shutil.rmtree(base, ignore_errors=True)
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    docs.repartitionByRange(4, "doc_id").write.parquet(f"{base}/docs")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{base}/docs")
    )
    q = streaming_neardup_ingest(
        spark,
        stream,
        f"{base}/index",
        f"{base}/pairs",
        MINHASH_HASHES,
        2,
        SHINGLE_N,
        checkpoint_path=f"{base}/ckpt",
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("streaming near-dup replay did not terminate")
    return (
        read_neardup_output(spark, f"{base}/pairs")
        .select("a_id", "b_id")
        .distinct()
    )


FUNNEL_STEPS = ["view", "click", "purchase"]


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel conversion (streaming/events.py funnel): users
    performing view -> click -> purchase in strict timestamp order, via
    greedy earliest-completion levels — per-user min partials + user-
    granularity joins, no event lists."""
    from clinical_vector_search_spark.streaming.events import funnel

    return funnel(_events(spark, sf_dir), FUNNEL_STEPS)


def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention (streaming/events.py retention_cohorts): users
    grouped by first-activity day, re-activity measured at 1- and 2-day
    horizons — distinct user-days, map-side cohort minima, one
    user-granularity join."""
    from clinical_vector_search_spark.streaming.events import retention_cohorts

    return retention_cohorts(_events(spark, sf_dir), [1, 2])


def q_events_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equi-width histogram of events.value over [-5, 15) x 20 bins
    with explicit overflow bins (operators/sketch.py histogram): one
    map-side bucket expression + one <= n_bins+2-key groupBy."""
    from clinical_vector_search_spark.operators.sketch import histogram

    return histogram(_events(spark, sf_dir), "value", -5.0, 15.0, 20)


def q_events_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI drift between the 'view' and 'purchase' value distributions
    (operators/sketch.py psi_drift): shared histogram bins incl.
    overflow, eps-floored fractions, per-bin psi terms — the
    retrain-gate drift report, two map-side histograms + one tiny
    full-outer bin join."""
    from clinical_vector_search_spark.operators.sketch import psi_drift

    ev = _events(spark, sf_dir)
    return psi_drift(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "purchase"),
        "value",
        -5.0,
        15.0,
        20,
    )


def q_events_streaming_scd2_enrich(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Point-in-time-correct stream-static enrichment: each streamed
    event joins the SCD2 dimension version valid AT ITS OWN TIMESTAMP
    (streaming/events.py run_streaming_scd2_enrich) — the
    leakage-free temporal lookup, certified by an availableNow replay
    vs the batch SQL twin."""
    from clinical_vector_search_spark.streaming.events import (
        run_streaming_scd2_enrich,
    )

    _events(spark, sf_dir)  # sets the nanosAsLong session conf
    return run_streaming_scd2_enrich(spark, sf_dir)


def q_events_streaming_chained_agg(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TWO stateful operators in ONE streaming query (streaming/events.py
    run_streaming_chained_agg): watermarked 5-min tumbling counts whose
    finalized windows feed an hourly windowed re-aggregation — the
    streaming pre-aggregate→rollup cascade, certified by a REAL
    availableNow replay (double sentinel advance so the watermark flush
    propagates through both operators) vs the batch SQL twin."""
    from clinical_vector_search_spark.streaming.events import (
        run_streaming_chained_agg,
    )

    _events(spark, sf_dir)  # sets the nanosAsLong session conf
    return run_streaming_chained_agg(spark, sf_dir)


def q_text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-self-trained bigram LM scoring (functions/text.py
    bigram_lm_score — the count-based CCNet-style perplexity filter):
    per-doc mean bigram log-probability + perplexity, statistics trained
    on the same corpus in the same plan."""
    from clinical_vector_search_spark.functions.text import bigram_lm_score

    return bigram_lm_score(_docs(spark, sf_dir))


def q_events_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 versioned user-state history (operators/temporal.py
    scd2_merge) built from scratch over events of users < 50: per-user
    event_type transitions with (valid_from, valid_to) ranges,
    consecutive duplicate states collapsed."""
    from clinical_vector_search_spark.operators.temporal import scd2_merge

    ev = _events(spark, sf_dir).filter(F.col("user_id") < 50)
    empty = spark.createDataFrame(
        [],
        "user_id long, event_type string, valid_from long, valid_to long",
    )
    return scd2_merge(
        empty, ev.select("user_id", "event_type", "ts_ns"),
        "user_id", ["event_type"],
    )


def q_ids_dense_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense global row ids == row_number() OVER (ORDER BY n_chars,
    doc_id), computed WITHOUT a single-task global sort
    (functions/ids.py dense_row_ids: range exchange + per-partition
    numbering + count offsets; plan asserted SinglePartition-free in
    tests/test_ids.py)."""
    from clinical_vector_search_spark.functions.ids import dense_row_ids

    docs = _docs(spark, sf_dir).select("doc_id", "n_chars")
    return dense_row_ids(docs, ["n_chars", "doc_id"], n_partitions=16)


def q_events_sessionize_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionize with strategy="auto" (streaming/events.py sessionize →
    choose_sessionize_strategy): the histogram probe must pick the PLAIN
    single-window plan on the uniform testdata, so the oracle is the
    plain-path SQL with the skew-shaped 1-based session_num — a wrong
    dispatch (skew path, 1-based vs 0-based drift) fails the hash."""
    from clinical_vector_search_spark.streaming.events import sessionize

    s = sessionize(_events(spark, sf_dir), SESSION_GAP_SEC, strategy="auto")
    return s.select(
        "user_id",
        F.col("session_num").cast("long").alias("session_num"),
        "n_events",
        F.expr("session_start_ns div 1000").alias("session_start_us"),
        F.expr("session_end_ns div 1000").alias("session_end_us"),
        F.round("sum_value", 6).alias("sum_value"),
    )


def q_events_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 MERGE path (operators/temporal.py scd2_merge with a NON-empty
    current table): history is seeded from the first half of the event
    stream (ts below the (min+max)/2 cut), then the second half is merged
    — closed versions pass through untouched, the open version
    re-sequences with the new batch. Because the cut strictly separates
    each user's updates in time, two-step merge ≡ one-shot build, so the
    oracle is the same single-pass SQL as events_scd2 — exercising the
    closed-passthrough and open-version paths against it."""
    from clinical_vector_search_spark.operators.temporal import scd2_merge

    ev = (
        _events(spark, sf_dir)
        .filter(F.col("user_id") < 50)
        .select("user_id", "event_type", "ts_ns")
    )
    lo, hi = ev.agg(F.min("ts_ns"), F.max("ts_ns")).first()
    cut = (lo + hi) // 2
    empty = spark.createDataFrame(
        [],
        "user_id long, event_type string, valid_from long, valid_to long",
    )
    current = scd2_merge(
        empty, ev.filter(F.col("ts_ns") < cut), "user_id", ["event_type"]
    )
    return scd2_merge(
        current, ev.filter(F.col("ts_ns") >= cut), "user_id", ["event_type"]
    )


def q_events_scd2_asof_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct feature join — the temporal composition
    users build from these parts (VERDICT r7 task 9): an event stream
    joined AS-OF against the SCD2 dimension history maintained by
    scd2_merge, so every event sees the dimension version that was live
    AT ITS OWN timestamp (no leakage from future versions — the
    train-serving-skew bug this shape exists to prevent).

    History: the same two-step merge as events_scd2_merge (seed below
    the (min+max)/2 ts cut, merge the rest — closed-passthrough + open
    re-sequence both exercised). Composition identity checked by the
    oracle: a backward as-of on valid_from over the contiguous non-zero-
    width version history ≡ the interval-containment join
    (valid_from <= ts < valid_to) — tests/test_temporal.py pins the same
    identity engine-internally. Zero-width versions (two updates at one
    ts — valid_to == valid_from) are droppable from BOTH spellings
    without changing any match. One user-key shuffle for the history
    windows + the asof union-window — no row-by-row probing."""
    from clinical_vector_search_spark.operators.temporal import (
        asof_join,
        scd2_merge,
    )

    ev = _events(spark, sf_dir).filter(F.col("user_id") < 50)
    upd = ev.select("user_id", "event_type", "ts_ns")
    lo, hi = upd.agg(F.min("ts_ns"), F.max("ts_ns")).first()
    cut = (lo + hi) // 2
    empty = spark.createDataFrame(
        [],
        "user_id long, event_type string, valid_from long, valid_to long",
    )
    current = scd2_merge(
        empty, upd.filter(F.col("ts_ns") < cut), "user_id", ["event_type"]
    )
    hist = scd2_merge(
        current, upd.filter(F.col("ts_ns") >= cut), "user_id", ["event_type"]
    )
    live = hist.filter(
        F.col("valid_to").isNull()
        | (F.col("valid_to") > F.col("valid_from"))
    )
    probes = ev.select("event_id", "user_id", "ts_ns")
    out = asof_join(
        probes,
        live.select(
            "user_id",
            F.col("valid_from").alias("ts_ns"),
            F.col("event_type").alias("state"),
        ),
        on="user_id",
        right_cols=("state",),
        prefix="dim_",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts_ns",
        F.col("dim_state"),
        F.col("dim_ts").alias("dim_since"),
    )


def q_events_scd2_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental point-in-time feature maintenance (operators/temporal.py
    scd2_apply_changes) — the composition users hit right after
    events_scd2_asof_features: a change feed lands, the SCD2 dimension is
    re-merged ONLY for touched keys (broadcast anti/semi passthrough for
    the rest), and the as-of feature frame is re-derived ONLY for those
    keys, unioned with the prior frame's untouched rows. The oracle is
    the ONE-SHOT full recompute (same SQL as events_scd2_asof_features):
    incremental maintenance must be value-identical to it. Batch = the
    last third of the feed, so the touched set is a strict subset and
    both the passthrough and re-derivation branches do real work."""
    from clinical_vector_search_spark.operators.temporal import (
        asof_join,
        scd2_apply_changes,
        scd2_merge,
    )

    ev = _events(spark, sf_dir).filter(F.col("user_id") < 50)
    upd = ev.select("user_id", "event_type", "ts_ns")
    lo, hi = upd.agg(F.min("ts_ns"), F.max("ts_ns")).first()
    cut = lo + (hi - lo) * 2 // 3
    empty = spark.createDataFrame(
        [],
        "user_id long, event_type string, valid_from long, valid_to long",
    )
    hist0 = scd2_merge(
        empty, upd.filter(F.col("ts_ns") < cut), "user_id", ["event_type"]
    )
    changes = upd.filter(F.col("ts_ns") >= cut)
    hist = scd2_apply_changes(hist0, changes, "user_id", ["event_type"])

    def feats(h, probes):
        live = h.filter(
            F.col("valid_to").isNull()
            | (F.col("valid_to") > F.col("valid_from"))
        )
        out = asof_join(
            probes,
            live.select(
                "user_id",
                F.col("valid_from").alias("ts_ns"),
                F.col("event_type").alias("state"),
            ),
            on="user_id",
            right_cols=("state",),
            prefix="dim_",
        )
        return out.select(
            "event_id",
            "user_id",
            "ts_ns",
            F.col("dim_state"),
            F.col("dim_ts").alias("dim_since"),
        )

    probes = ev.select("event_id", "user_id", "ts_ns")
    # prior feature frame (as it stood before the batch) + delta rule:
    # untouched keys keep their old rows, touched keys re-derive
    old_feat = feats(hist0, probes)
    touched = changes.select("user_id").distinct()
    kept = old_feat.join(F.broadcast(touched), "user_id", "left_anti")
    fresh = feats(
        hist.join(F.broadcast(touched), "user_id", "left_semi"),
        probes.join(F.broadcast(touched), "user_id", "left_semi"),
    )
    return kept.unionByName(fresh.select(*kept.columns))


def q_doc_quality_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed logistic-regression training (operators/logreg.py):
    a language classifier (label lang=='en') over the pipeline's own
    text-statistics features (token count, punct ratio, stopword
    ratio), trained by full-batch GD where each iteration is ONE
    map-side-combinable d+1-column gradient aggregate — model fitting
    in the repo's iterative-agg shape (BPE, PageRank). Returns the
    trained weights as (term, weight) rows; the oracle UNROLLS the
    same five standardized-GD iterations in SQL, so the training loop
    itself is value-hash checked; the pytest checks each weight's sign
    against the data's own target-vs-rest feature direction (on this
    synthetic corpus 'non-English' docs carry slightly MORE English
    stopwords, so that weight is legitimately negative). Features:
    token count, mean token
    length (chars/token — language-discriminative), stopword ratio;
    punct_ratio is identically 0 on this synthetic corpus and
    logreg_train rejects zero-variance features by contract."""
    from clinical_vector_search_spark.functions import text as TXT
    from clinical_vector_search_spark.operators.logreg import logreg_train

    docs = _docs(spark, sf_dir)
    ntok = TXT.token_count("text").cast("double")
    feats = docs.select(
        (F.col("lang").eqNullSafe(F.lit("en"))).alias("is_en"),
        ntok.alias("n_tokens"),
        (
            F.col("n_chars").cast("double")
            / F.greatest(ntok, F.lit(1.0))
        ).alias("mean_tok_len"),
        TXT.stopword_ratio(TXT.tokenize("text")).alias("stopword_ratio"),
    )
    w = logreg_train(
        feats,
        ["n_tokens", "mean_tok_len", "stopword_ratio"],
        F.col("is_en"),
        lr=1.0,
        n_iter=5,
    )
    return spark.createDataFrame(w, "term string, weight double")


def q_doc_quality_logreg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frozen-weights scoring pass for the trained classifier
    (operators/logreg.py logreg_eval): one distributed aggregate over
    the training frame producing (n_rows, accuracy, log_loss) —
    prediction thresholds on z > 0 (exact; no sigmoid evaluated at the
    decision boundary). The oracle unrolls training AND evaluation, so
    the full train→score loop value-hashes."""
    from clinical_vector_search_spark.functions import text as TXT
    from clinical_vector_search_spark.operators.logreg import (
        logreg_eval,
        logreg_train,
    )

    docs = _docs(spark, sf_dir)
    ntok = TXT.token_count("text").cast("double")
    feats = docs.select(
        (F.col("lang").eqNullSafe(F.lit("en"))).alias("is_en"),
        ntok.alias("n_tokens"),
        (
            F.col("n_chars").cast("double")
            / F.greatest(ntok, F.lit(1.0))
        ).alias("mean_tok_len"),
        TXT.stopword_ratio(TXT.tokenize("text")).alias("stopword_ratio"),
    )
    cols = ["n_tokens", "mean_tok_len", "stopword_ratio"]
    w = logreg_train(feats, cols, F.col("is_en"), lr=1.0, n_iter=5)
    return logreg_eval(feats, cols, F.col("is_en"), w)


def q_doc_quality_logreg_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Reliability table for the trained classifier
    (operators/logreg.py logreg_calibration): predicted probabilities
    decile-binned with per-bin (n, mean p, actual rate, brier) — the
    check that scores can be USED as probabilities. One bin-granularity
    aggregate; p rounded before binning so an exp()-ulp can't flip a
    bin across engines. Oracle extends the unrolled-GD SQL with the
    identical rounded-freeze scoring and bin arithmetic."""
    from clinical_vector_search_spark.functions import text as TXT
    from clinical_vector_search_spark.operators.logreg import (
        logreg_calibration,
        logreg_train,
    )

    docs = _docs(spark, sf_dir)
    ntok = TXT.token_count("text").cast("double")
    feats = docs.select(
        (F.col("lang").eqNullSafe(F.lit("en"))).alias("is_en"),
        ntok.alias("n_tokens"),
        (
            F.col("n_chars").cast("double")
            / F.greatest(ntok, F.lit(1.0))
        ).alias("mean_tok_len"),
        TXT.stopword_ratio(TXT.tokenize("text")).alias("stopword_ratio"),
    )
    cols = ["n_tokens", "mean_tok_len", "stopword_ratio"]
    w = logreg_train(feats, cols, F.col("is_en"), lr=1.0, n_iter=5)
    return logreg_calibration(feats, cols, F.col("is_en"), w, n_bins=10)


def q_doc_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance log-weights (operators/importance.py, Xie et al.
    NeurIPS 2023): every doc scored by Σ log(p_target[b]/q_corpus[b])
    over md5-hashed token buckets, target = the English subset — the
    cheap domain-similarity weighting that feeds importance RESAMPLING
    (composes with doc_weighted_sample for the draw). One tokenization
    collapsing straight to a checkpointed (doc, bucket, n) frame;
    bucket totals and per-doc n-weighted sums both derive from it, the
    K-row log-ratio table broadcasts back. Fully deterministic (md5
    buckets, add-one smoothing) so the weights value-hash against
    SQL."""
    from clinical_vector_search_spark.operators.importance import (
        dsir_logweights,
    )

    return dsir_logweights(
        _docs(spark, sf_dir), F.col("lang") == F.lit("en"), 1024
    )


def q_doc_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end importance RESAMPLING — the actual DSIR selection
    step: per-doc log importance weights (operators/importance.py)
    exponentiated into A-Res sampling weights (clamped to ±50 before
    exp so extreme ratios can't overflow/underflow the priority) and
    drawn without replacement by weighted_hash_sample — high
    target-likelihood docs oversampled in proportion. Output is the
    SELECTED docs' (doc_id, n_toks, logw): logw is bit-stable (rounded
    inside dsir_logweights), and the log-priority ranks rounded at 9
    (the ln() ulp-guard the sampler already carries)."""
    from clinical_vector_search_spark.operators.importance import (
        dsir_logweights,
    )
    from clinical_vector_search_spark.pipeline.documents import (
        weighted_hash_sample,
    )

    w = dsir_logweights(
        _docs(spark, sf_dir), F.col("lang") == F.lit("en"), 1024
    )
    iw = w.withColumn(
        "_w",
        F.exp(F.least(F.greatest(F.col("logw"), F.lit(-50.0)), F.lit(50.0))),
    )
    return weighted_hash_sample(
        iw, DSIR_SAMPLE_N, "_w", round_to=9
    ).select("doc_id", "n_toks", "logw")


def q_doc_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-corpus URL dedup (functions/text.py canonicalize_url): the
    same resource crawled as http/https, with/without www, with
    per-click tracking params (utm_*, ref, fbclid, ...), in any param
    order, with fragments, must land in ONE group before content ever
    downloads — the cheapest dedup a crawl pipeline runs. Synthetic
    URLs derive deterministically from (source, doc_id) with mixed
    case, default port, a tracking pair, and a fragment, so every
    normalization rule is load-bearing; doc_ids collide on
    (source, doc_id%500, doc_id%7) after canonicalization. Pure
    expression chain (no UDF), groups value-hash checked; dup groups
    only (n_docs > 1), min-id survivor."""
    from clinical_vector_search_spark.functions.text import (
        canonicalize_url,
    )

    docs = _docs(spark, sf_dir).select("doc_id", "source")
    url = F.concat(
        F.lit("HTTPS://WWW."),
        F.col("source"),
        F.lit(".Example.COM:443/Docs/"),
        (F.col("doc_id") % 500).cast("string"),
        F.lit("/?utm_source=feed&ref="),
        F.col("doc_id").cast("string"),
        F.lit("&q="),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("#sec"),
        (F.col("doc_id") % 3).cast("string"),
    )
    c = docs.select(
        "doc_id", canonicalize_url(url).alias("canonical_url")
    )
    return (
        c.groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keep_id"),
            F.max("doc_id").alias("max_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def q_doc_filter_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-document AUDIT TRAIL of the prep pipeline: every doc with
    its keep/drop decision and the FIRST failing rule (lang → quality →
    exact-dup → contaminated), instead of just the survivor set — the
    artifact a data-governance review actually reads ("why was this doc
    dropped?"). Rules are provably the pipeline's own: both entries
    compose from the ONE rule builder in pipeline/documents.py
    (prep_scored/prep_passing/prep_dup_losers/prep_bench_grams/
    prep_contaminated_ids/prep_decision), so threshold or fragment
    drift between pipeline and audit is structurally impossible. One
    extra doc-granularity join per signal, all flags in one lazy
    plan."""
    from clinical_vector_search_spark.pipeline.documents import (
        prep_bench_grams,
        prep_contaminated_ids,
        prep_decision,
        prep_dup_losers,
        prep_passing,
        prep_scored,
    )

    scored = prep_scored(_docs(spark, sf_dir))
    dup_loser = prep_dup_losers(prep_passing(scored))
    contaminated = prep_contaminated_ids(
        scored, prep_bench_grams(scored, DECON_BENCH, DECON_N), DECON_N,
        probe_partitions=spark.sparkContext.defaultParallelism,
    ).withColumn("is_contam", F.lit(True))
    return (
        scored.join(dup_loser, "doc_id", "left")
        .join(contaminated, "doc_id", "left")
        .select("doc_id", "quality", prep_decision().alias("decision"))
    )


def q_dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What CDC chunking is FOR: cross-document chunk-hash dedup. A
    chunk appearing in ≥ 2 docs is shared content; per doc report
    (n_chunks, n_shared_chunks, shared_fraction). Chunk hashes are
    8-byte keys — the dedup shuffle never moves chunk text (same
    contract as span dedup)."""
    # r15: the Arrow twin (bit-identical, parity pytest) — the expr
    # path's interpreted HOF window hashing was ~7x slower
    from clinical_vector_search_spark.functions.text import (
        cdc_chunk_rows_pd,
    )

    ch = cdc_chunk_rows_pd(_docs(spark, sf_dir), w=4, divisor=8).select(
        "doc_id", "chunk_hash"
    )
    hot = (
        ch.groupBy("chunk_hash")
        .agg(F.count_distinct("doc_id").alias("_nd"))
        .filter(F.col("_nd") >= 2)
        .select("chunk_hash")
    )
    flagged = ch.join(F.broadcast(hot), "chunk_hash").select(
        "doc_id", "chunk_hash"
    )
    per_doc = ch.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_chunks"))
    shared = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shared_chunks")
    )
    return per_doc.join(shared, "doc_id", "left").select(
        "doc_id",
        "n_chunks",
        F.coalesce("n_shared_chunks", F.lit(0)).alias("n_shared_chunks"),
        F.round(
            F.coalesce("n_shared_chunks", F.lit(0)) / F.col("n_chunks"), 6
        ).alias("shared_fraction"),
    )


def q_text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-eval composition: confusion counts of the lang-ID
    heuristic (functions/text.py lang_id) against the metadata label —
    the per-(label, prediction) matrix every model-quality dashboard
    starts from. One groupBy over label granularity."""
    from clinical_vector_search_spark.functions.text import lang_id, tokenize

    d = _docs(spark, sf_dir).select(
        "lang", lang_id(tokenize("text")).alias("lang_pred")
    )
    return d.groupBy("lang", "lang_pred").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


def q_rel_numeric_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric column profiling over lineitem: min/max/stddev of quantity
    and the Pearson correlations (qty↔price, price↔discount) — the
    column-statistics pass that precedes model-feature selection; one
    map-side-combined aggregate, single row."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.agg(
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.round(F.stddev_pop("l_quantity"), 6).alias("std_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "corr_qty_price"
        ),
        F.round(F.corr("l_extendedprice", "l_discount"), 6).alias(
            "corr_price_disc"
        ),
    )


def q_knn_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FAISS-style range search (operators/knn.py range_search): every
    doc with cosine ≥ 0.25 per query — the radius twin of top-k,
    broadcast query batch, filter inside the scan stage."""
    from clinical_vector_search_spark.functions import vector as V
    from clinical_vector_search_spark.operators.knn import range_search

    v = _vecs(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"),
        V.l2_normalize("embedding").alias("embedding"),
    )
    q = v.filter(F.col("doc_id") < KNN_NQ).select(
        F.col("doc_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    r = range_search(q, v, 0.25)
    return r.select(
        "query_id", "doc_id", F.round("score", 6).alias("score")
    )


def q_events_weighted_avg_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCALAR + GROUPED_AGG pandas_udf surface (functions/udaf.py):
    per-type weighted mean of softclipped values, weight = |value|.
    The GROUPED_AGG runs one vectorized reduction per group (bounded
    groups here); the oracle is the map-side-combinable expression twin
    sum(v·w)/sum(w) — both spellings equal (tested)."""
    from clinical_vector_search_spark.functions.udaf import (
        softclip,
        weighted_mean,
    )

    ev = _events(spark, sf_dir).select(
        "event_type",
        softclip(F.col("value")).alias("v"),
        F.abs(F.col("value")).alias("w"),
    )
    # Spark disallows mixing a GROUPED_AGG pandas UDF with built-in
    # aggregates in one agg — counts come from a second group-granularity
    # agg joined back (both sides are n_types rows)
    wm = ev.groupBy("event_type").agg(
        F.round(weighted_mean(F.col("v"), F.col("w")), 6).alias("wmean")
    )
    counts = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return wm.join(counts, "event_type")


def q_io_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python Data Source (Spark 4 DataSource API,
    io/pysource.py): a partition-parallel deterministic corpus
    generator registered with spark.dataSource.register and read via
    spark.read.format("synthetic_docs"). Every row is a pure md5
    function of its index, so even custom SOURCE plumbing gets a full
    value-hash oracle."""
    from clinical_vector_search_spark.io.pysource import register

    register(spark)
    return (
        spark.read.format("synthetic_docs")
        .option("rows", 500)
        .option("partitions", 8)
        .load()
    )


def q_rel_sql_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pure-SQL surface: tables registered as temp views, the query
    written as ANSI SQL through spark.sql() — same Catalyst plan as the
    DataFrame API (the engine's two front-ends are one optimizer). A
    supplier-nation rollup with a HAVING filter."""
    spark.read.parquet(f"{sf_dir}/supplier.parquet").createOrReplaceTempView(
        "v_supplier"
    )
    spark.read.parquet(f"{sf_dir}/nation.parquet").createOrReplaceTempView(
        "v_nation"
    )
    return spark.sql(
        """
        SELECT n.n_name,
               count(*) AS n_suppliers,
               round(sum(s.s_acctbal), 2) AS total_acctbal,
               round(avg(s.s_acctbal), 4) AS avg_acctbal
        FROM v_supplier s JOIN v_nation n ON s.s_nationkey = n.n_nationkey
        GROUP BY n.n_name
        HAVING count(*) >= 1
        """
    )


def q_multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan (multimodal/binary_ops.py
    frame_sample_plan): shuffle-free sequence+explode fan-out to
    (media_id, frame_ts_ms) sample points every 250ms over a synthetic
    duration derived from doc length — the stage that precedes per-frame
    decode."""
    from clinical_vector_search_spark.multimodal.binary_ops import (
        frame_sample_plan,
    )

    media = _docs(spark, sf_dir).select(
        F.col("doc_id").alias("media_id"),
        (F.col("n_chars") % 2000 + 1).cast("long").alias("duration_ms"),
    )
    return frame_sample_plan(media, every_ms=250)


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal resize plumbing (multimodal/binary_ops.py
    resize_images): the mapInPandas decode→resize→re-encode stage over
    opaque binary content. The fixture bytes are UTF-8 text — never a
    decodable image — so the passthrough branch is taken whether or not
    pillow is importable, and the oracle is exact md5 passthrough with
    target dims stamped."""
    from clinical_vector_search_spark.multimodal.binary_ops import (
        resize_images,
    )

    media = _docs(spark, sf_dir).select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
    )
    out = resize_images(media, 64, 48)
    return out.select(
        "media_id", F.md5("content").alias("content_md5"), "width", "height"
    )


def q_rel_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10-shaped returned-item revenue: customers ranked by
    revenue lost to returns in a date window. lineitem⋈orders shuffles
    on orderkey with both filters pushed; customer and nation dims
    broadcast; one revenue groupBy at customer granularity; top 20 by
    (revenue desc, custkey)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_returnflag") == "R"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_mktsegment")
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
                ),
                2,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def q_rel_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution candidate pairs (operators/dedup.py
    blocked_fuzzy_pairs): customer names within the same 16-char-prefix
    block at Levenshtein distance ≤ 1 — JVM-side edit distance, one
    block-key shuffle, never all-pairs."""
    from clinical_vector_search_spark.operators.dedup import (
        blocked_fuzzy_pairs,
    )

    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("doc_id"), "c_name"
    )
    return blocked_fuzzy_pairs(
        c, "c_name", F.substring("c_name", 1, 16), max_distance=1
    )


def q_rel_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-shaped large-volume-order query: orders whose lineitems
    sum past 250 units, with customer attribution. The HAVING set is a
    small aggregate frame — BROADCAST back against lineitem (no second
    shuffle of the fact table) — and the customer dim broadcasts too, so
    the only event-volume shuffle is the quantity groupBy."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c.select("c_custkey", "c_name")),
              o.o_custkey == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias(
                "o_orderdate"
            ),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("total_qty", 2).alias("total_qty"),
        )
    )


def q_io_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution roundtrip: write a v1 slice (doc_id, source),
    append a v2 slice with an ADDED column (n_chars), read the directory
    with mergeSchema — v1 rows surface the new column as NULL. The
    lakehouse append-with-wider-schema pattern; at 100 TB the same read
    works because parquet footers carry per-file schemas and Spark
    reconciles by name."""
    import tempfile

    docs = _docs(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="cvs_schema_evo_")
    docs.filter(F.col("doc_id") < 100).select("doc_id", "source").write.mode(
        "overwrite"
    ).parquet(f"{tmp}/d")
    docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 200)).select(
        "doc_id", "source", "n_chars"
    ).write.mode("append").parquet(f"{tmp}/d")
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(f"{tmp}/d")
        .select("doc_id", "source", "n_chars")
    )


def q_text_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum/quality deciles by self-trained LM perplexity — global
    quantile bucketing WITHOUT a single-task sort: bigram_lm_score →
    dense_row_ids (range-partitioned global rank, functions/ids.py) →
    bucket = ((rank-1)·10) div N map-side → per-bucket rollup. The NTILE
    pattern re-expressed so no Window ever sees SinglePartition; docs
    with < 2 tokens (NULL ppl) are excluded up front. N and the range
    boundaries are the only driver-side values (bounded)."""
    from clinical_vector_search_spark.functions.ids import dense_row_ids
    from clinical_vector_search_spark.functions.text import bigram_lm_score

    scored = (
        bigram_lm_score(_docs(spark, sf_dir))
        .filter(F.col("ppl").isNotNull())
        .select("doc_id", "ppl")
    )
    ranked = dense_row_ids(scored, ["ppl", "doc_id"], n_partitions=16)
    n_total = ranked.count()  # bounded: one long; the rank frame is
    # checkpointed by dense_row_ids, so this does not recompute scoring
    return (
        ranked.withColumn(
            "bucket",
            (F.expr(f"(row_id - 1) * 10 div {n_total}") + 1).cast("int"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("ppl"), 6).alias("avg_ppl"),
        )
    )


def q_events_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join (operators/temporal.py asof_join_nearest):
    every 'click' gets the CLOSEST same-user 'view' on either side,
    ties to the backward match (pandas merge_asof semantics), equal
    right timestamps broken by event_id (greatest wins)."""
    from clinical_vector_search_spark.operators.temporal import (
        asof_join_nearest,
    )

    ev = _events(spark, sf_dir).withColumn("ts_us", F.expr("ts_ns div 1000"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts_us"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts_us", "value"
    )
    out = asof_join_nearest(
        clicks, views, on="user_id", left_ts="ts_us", right_ts="ts_us",
        right_cols=("event_id", "value"), right_tiebreak="event_id",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts_us",
        F.col("asof_ts").alias("view_ts_us"),
        F.col("asof_event_id").alias("view_event_id"),
        F.round("asof_value", 6).alias("view_value"),
    )


def q_text_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (functions/text.py cdc_chunk_rows):
    rolling-hash cut points make chunk identity survive token shifts —
    the chunk-dedup/caching primitive fixed windows can't provide.
    r15: served by the Arrow twin cdc_chunk_rows_pd (bit-identical,
    parity pytest; same SQL oracle)."""
    from clinical_vector_search_spark.functions.text import (
        cdc_chunk_rows_pd,
    )

    return cdc_chunk_rows_pd(_docs(spark, sf_dir), w=4, divisor=8)


def q_events_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operator composition: top-3 busiest users per 1-hour tumbling
    window — per-window user counts (one groupBy) fed through the
    skew-safe topk_per_group partial strategy. The per-window heavy-
    hitter dashboard query."""
    from clinical_vector_search_spark.operators.skew import topk_per_group

    ev = _events(spark, sf_dir)
    counts = (
        ev.groupBy(
            F.expr("ts_ns div 3600000000000").alias("window_hour"),
            "user_id",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return topk_per_group(
        counts,
        ["window_hour"],
        [("n_events", False), ("user_id", True)],
        3,
    )


def q_doc_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment
    (pipeline/documents.py split_assign): salted-md5 bucket cut at
    cumulative thresholds — stable under repartitioning/re-runs, unlike
    randomSplit; disjoint and exhaustive by construction."""
    from clinical_vector_search_spark.pipeline.documents import split_assign

    return split_assign(
        _docs(spark, sf_dir),
        [("train", 0.8), ("val", 0.1), ("test", 0.1)],
    ).select("doc_id", "split")


def q_events_user_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-leakage-safe train/val/test split: events assigned by the
    salted md5 bucket of their USER, not their row — every event of a
    user lands in exactly one split BY CONSTRUCTION (the assignment is
    a pure function of user_id), which is the property row-level
    randomSplit violates: a user straddling train and test leaks
    behavioral signal across the boundary, the canonical evaluation bug
    in user-modeling pipelines. Same split_assign expression as
    doc_split_assign (pipeline/documents.py:226) with id_col=user_id;
    the per-split rollup shows event AND user proportions (events skew
    from 80/10/10 exactly when heavy users concentrate — the visible
    cost of group-safety the summary exists to show). Zero-leakage
    pinned in tests/test_pipeline.py."""
    from clinical_vector_search_spark.pipeline.documents import split_assign

    s = split_assign(
        _events(spark, sf_dir),
        [("train", 0.8), ("val", 0.1), ("test", 0.1)],
        id_col="user_id",
        salt="usersplit",
    )
    return s.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


def q_events_time_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Walk-forward temporal split with a 1-day embargo
    (streaming/events.py time_embargo_split): train before the 80%
    time cut, a discarded embargo day absorbing trailing-window
    feature leakage, test after — the purged walk-forward evaluation
    split. Cut is exact integer-ns arithmetic (no float quantile), so
    assignment is bit-identical across engines; per-split rollup of
    events, users, and time bounds. Complements events_user_split
    (temporal-leakage vs group-leakage safety; the user-overlap
    contrast is pytest-pinned)."""
    from clinical_vector_search_spark.streaming.events import (
        time_embargo_split,
    )

    s = time_embargo_split(_events(spark, sf_dir))
    return s.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.min("ts_ns").alias("min_ts"),
        F.max("ts_ns").alias("max_ts"),
    )


def q_rel_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK→PK referential audit over the TPC-H graph (operators/audit.py
    referential_audit): orphan + null-fk counts per relationship, each a
    single-column scan with a broadcast anti join."""
    from clinical_vector_search_spark.operators.audit import (
        referential_audit,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    s_ = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    return referential_audit(
        [
            ("orders.custkey->customer", o, "o_custkey", c, "c_custkey"),
            ("lineitem.orderkey->orders", li, "l_orderkey", o, "o_orderkey"),
            ("customer.nationkey->nation", c, "c_nationkey", n, "n_nationkey"),
            ("supplier.nationkey->nation", s_, "s_nationkey", n, "n_nationkey"),
        ]
    )


def q_events_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL distinct users per day (operators/sketch.py
    hll_partials + hll_rollup, DataSketches binary — rows-only by design:
    the sketch encoding is engine-specific so no SQL oracle exists;
    anchored by the oracle-checked exact twin events_distinct_users and
    the accuracy/merge-consistency contracts in tests/test_extensions.py)."""
    from clinical_vector_search_spark.operators.sketch import (
        hll_partials,
        hll_rollup,
    )

    ev = _events(spark, sf_dir).select(
        F.expr("ts_ns div 86400000000000").alias("day"), "user_id"
    )
    return hll_rollup(hll_partials(ev, ["day"], "user_id"), ["day"])


def q_events_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score anomaly counts (operators/sketch.py
    zscore_outliers with the round_dp cross-engine boundary): event
    volume scanned once, group stats broadcast back."""
    from clinical_vector_search_spark.operators.sketch import zscore_outliers

    flagged = zscore_outliers(
        _events(spark, sf_dir).select("event_type", "value"),
        "value",
        ["event_type"],
        z=2.5,
        round_dp=6,
    )
    return flagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("is_outlier").cast("long")).alias("n_outliers"),
        F.round(
            F.sum(F.col("is_outlier").cast("long")) / F.count(F.lit(1)), 6
        ).alias("outlier_rate"),
    )


def q_doc_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END LLM data-prep in ONE lazy plan — the composition a
    pretraining pipeline actually runs, every stage an operator with its
    own oracle-green entry: clean text → language filter (metadata en) →
    heuristic quality filter (quality_score ≥ 0.6) → exact dedup
    (min doc_id per md5 of cleaned text) → benchmark decontamination
    (5-gram overlap vs the doc_id < 20 held-out set, broadcast) → BPE
    token budget. Returns the surviving (doc_id, n_tokens, quality).

    Scale: clean/filter/score are map-side expressions; dedup is one
    md5-key shuffle; decontamination broadcasts only benchmark grams;
    no stage collects. The composed plan is what Catalyst optimizes
    jointly — filters push below the dedup shuffle. Every rule fragment
    comes from the shared builder in pipeline/documents.py, the same
    one q_doc_filter_audit reads — pipeline and audit cannot drift."""
    from clinical_vector_search_spark.functions import text as TXT
    from clinical_vector_search_spark.pipeline.documents import (
        prep_bench_grams,
        prep_contaminated_ids,
        prep_dedup_keep,
        prep_passing,
        prep_scored,
    )

    scored = prep_scored(_docs(spark, sf_dir))
    deduped = prep_dedup_keep(prep_passing(scored))
    # probe_partitions: the deduped frame is narrower than the session
    # at bench sfs (one advisory-sized partition post-AQE) while the
    # shingle probe's cost is CPU fan-out, not bytes — respread it to
    # the session's parallelism (scale-adaptive, never a constant)
    contaminated = prep_contaminated_ids(
        deduped, prep_bench_grams(scored, DECON_BENCH, DECON_N), DECON_N,
        probe_partitions=spark.sparkContext.defaultParallelism,
    )
    return deduped.join(contaminated, "doc_id", "left_anti").select(
        "doc_id",
        TXT.bpe_token_count("ctext").alias("n_tokens"),
        "quality",
    )


def q_doc_topk_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quality quota (operators/skew.py topk_per_group,
    strategy="partial"): the 5 longest docs per source via the
    zero-shuffle Arrow-batch prune + global window — bit-identical to
    the plain window strategy, but a hot domain never funnels one task."""
    from clinical_vector_search_spark.operators.skew import topk_per_group

    docs = _docs(spark, sf_dir).select("source", "doc_id", "n_chars")
    return topk_per_group(
        docs, ["source"], [("n_chars", False), ("doc_id", True)], 5
    )


def q_doc_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination (operators/dedup.py
    decontaminate_bloom; functions/hashing.py bloom_build/bloom_probe):
    the benchmark shingle set compressed to a 2^16-bit 4-hash bitmap,
    probed map-side by the corpus. Deterministic md5 positions mean even
    the false-positive set hash-matches the SQL oracle."""
    from clinical_vector_search_spark.operators.dedup import (
        decontaminate_bloom,
    )

    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") < DECON_BENCH).select("text")
    return decontaminate_bloom(
        docs, bench, n=DECON_N, m=BLOOM_M, k=BLOOM_K
    )


def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (operators/dedup.py semantic_dedup):
    argmax-cosine cluster assignment over the md5 centroid matrix, then
    within-cluster near-dup prune keeping the smallest id per pair.
    Survivors (vec_id, cluster)."""
    from clinical_vector_search_spark.operators.dedup import semantic_dedup

    return semantic_dedup(
        _vecs(spark, sf_dir), dim=64, threshold=0.35, n_clusters=8
    )


def q_dedup_semantic_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pair stage of SemDeDup (operators/dedup.py
    semantic_dedup_pairs): within-cluster cosine ≥ 0.35 pairs only —
    the cluster id bucketing the quadratic comparison."""
    from clinical_vector_search_spark.operators.dedup import (
        semantic_dedup_pairs,
    )

    r = semantic_dedup_pairs(
        _vecs(spark, sf_dir), dim=64, threshold=0.35, n_clusters=8
    )
    return r.select(
        "a_id", "b_id", "cluster", F.round("cosine", 6).alias("cosine")
    )


def q_dedup_semantic_pd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup survivors via the full BLAS path (accel='pd':
    semantic_clusters_pd mapInPandas X@C^T assignment +
    semantic_dedup_pairs_pd per-cluster matmuls with canonical
    rescore) — bit-identical to the expression path by contract, so it
    shares dedup_semantic's oracle SQL. The scale-probe-measured 4.8x
    win at 640 clusters (README '10x scale probe')."""
    from clinical_vector_search_spark.operators.dedup import semantic_dedup

    return semantic_dedup(
        _vecs(spark, sf_dir), dim=64, threshold=0.35, n_clusters=8,
        accel="pd",
    )


def q_text_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-level PMI co-occurrence over frequent terms
    (functions/text.py pmi_cooccurrence): the collocation-mining
    primitive; vocabulary min-count cut bounds the per-doc pair
    explosion, doc_id-key self-join, no cartesian."""
    from clinical_vector_search_spark.functions.text import (
        pmi_cooccurrence,
    )

    return pmi_cooccurrence(_docs(spark, sf_dir), min_count=10)


def q_events_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session path mining (streaming/events.py session_paths):
    top event-type sequences per inactivity-gap session — funnel
    DISCOVERY (funnel() checks a given sequence; this surfaces which
    exist). Deterministic via (ts_ns, event_id) struct sort."""
    from clinical_vector_search_spark.streaming.events import (
        session_paths,
    )

    return session_paths(
        _events(spark, sf_dir), gap_sec=1800, max_len=10, min_sessions=2
    )


def q_dedup_semantic_pairs_salted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The hot-cluster guard's salted block self-join, driver-checked:
    max_cluster_rows=32 forces every sf0.01 cluster through
    _semantic_pairs_salted (operators/dedup.py) — per-task pair count
    bounded at ~32², output EXACTLY the plain path's pairs (the block
    decomposition covers each unordered pair once), so it shares
    dedup_semantic_pairs' oracle."""
    from clinical_vector_search_spark.operators.dedup import (
        semantic_dedup_pairs,
    )

    r = semantic_dedup_pairs(
        _vecs(spark, sf_dir), dim=64, threshold=0.35, n_clusters=8,
        max_cluster_rows=32,
    )
    return r.select(
        "a_id", "b_id", "cluster", F.round("cosine", 6).alias("cosine")
    )


def q_dedup_semantic_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Maintained SemDeDup index — the incremental-pairs lifecycle
    (operators/dedup.py ingest_semantic_batch, r15 — the fifth index on
    the shared maintenance protocol; reference ancestor: the full
    re-embed-and-recluster the reference pays every run,
    src/pipeline/pipeline.py:90-136): the corpus arrives as two
    idempotent batch-id-overwrite ingests, each assigning map-side
    against the FROZEN md5 centroids and probing ONLY its own touched
    clusters against the persisted assignments (broadcast semi-probe —
    no old×old rescan, cost ∝ batch). The accumulated pair set is
    INVARIANT to the chunking — each pair is emitted exactly once, in
    the batch of whichever member arrives later — so the oracle is the
    ONE-SHOT semantic_dedup_pairs SQL over the whole corpus, unchanged:
    the strongest statement the maintenance story can make. Retry
    idempotency, tombstone gating, and the reindex drift recovery are
    pinned in tests/test_semantic_index.py."""
    import shutil
    import tempfile

    from clinical_vector_search_spark.operators.dedup import (
        ingest_semantic_batch,
    )

    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    base = f"{tempfile.gettempdir()}/cvs_sem_incr_{tag}"
    shutil.rmtree(base, ignore_errors=True)
    v = _vecs(spark, sf_dir)
    for i, batch in enumerate(
        (v.filter(F.col("vec_id") % 2 == 0), v.filter(F.col("vec_id") % 2 == 1))
    ):
        ingest_semantic_batch(
            spark, batch, i, f"{base}/assign", f"{base}/pairs", 64,
            threshold=0.35, n_clusters=8,
        )
    acc = spark.read.option("recursiveFileLookup", "true").parquet(
        f"{base}/pairs"
    )
    return acc.select(
        "a_id", "b_id", "cluster", F.round("cosine", 6).alias("cosine")
    )


def q_dedup_semantic_reindex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leased retrain-and-reassign of the maintained semantic index
    (operators/dedup.py reindex_semantic — the drift-recovery stage,
    the reindex_ivfpq pattern): two frozen-geometry ingests at 8
    clusters, ids with vec_id % 16 == 5 tombstoned, then ONE reindex
    under the two-lease discipline derives the surviving membership
    FROM the index, retrains at 16 clusters, reassigns map-side, fences
    the old-geometry batch names, swaps with the centroids stamped as
    _TRAINED.json atomically inside the new directory, and clears the
    tombstones last. n_iter=0 makes the retrained centroids the
    deterministic L2-normalized md5 matrix — SQL-expressible, so the
    whole lifecycle has a full value-hash oracle (the
    knn_ivfpq_reindex pattern); the trained-loop recall-restoration
    story is pinned in tests/test_semantic_index.py."""
    import shutil
    import tempfile

    from clinical_vector_search_spark.operators.dedup import (
        reindex_semantic,
        semantic_index_add,
        semantic_index_delete,
        semantic_read_index,
    )

    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    base = f"{tempfile.gettempdir()}/cvs_sem_reidx_{tag}"
    shutil.rmtree(base, ignore_errors=True)
    v = _vecs(spark, sf_dir)
    for i, batch in enumerate(
        (v.filter(F.col("vec_id") % 2 == 0), v.filter(F.col("vec_id") % 2 == 1))
    ):
        semantic_index_add(
            spark, batch, i, f"{base}/assign", 64, n_clusters=8
        )
    semantic_index_delete(
        spark, v.filter(F.col("vec_id") % 16 == 5), 0, f"{base}/dead"
    )
    reindex_semantic(
        spark, f"{base}/assign", v, 64, n_clusters=16, n_iter=0,
        tombstone_path=f"{base}/dead",
    )
    return semantic_read_index(spark, f"{base}/assign").select(
        "vec_id", "cluster"
    )


def q_dedup_semantic_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair-recall recovery after a semantic reindex (operators/dedup.py
    backfill_semantic_pairs, r15): a reindex improves candidate
    generation only for FUTURE ingests — this job emits the pairs the
    STALE geometry missed for the existing corpus. Lifecycle: two
    ingests at the frozen 8-cluster md5 geometry accumulate their
    incremental pairs, ONE leased retrain-and-reassign moves the index
    to 16 normalized-md5 clusters (n_iter=0 — deterministic), then the
    backfill emits the within-cluster pairs the NEW clustering admits
    anti-joined on (a_id, b_id) against everything accumulated. The
    accumulated table afterwards is old-geometry pairs ∪ (new-geometry
    pairs \\ old) — every row still an exact cosine-≥-threshold pair —
    so the oracle is the union of the two one-shot pair SQLs with the
    second anti-joined to the first. Cost: one Σ|c|² pass per reindex
    cadence, never per ingest."""
    import shutil
    import tempfile

    from clinical_vector_search_spark.operators.dedup import (
        backfill_semantic_pairs,
        ingest_semantic_batch,
        reindex_semantic,
    )

    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    base = f"{tempfile.gettempdir()}/cvs_sem_bfill_{tag}"
    shutil.rmtree(base, ignore_errors=True)
    v = _vecs(spark, sf_dir)
    for i, batch in enumerate(
        (v.filter(F.col("vec_id") % 2 == 0), v.filter(F.col("vec_id") % 2 == 1))
    ):
        ingest_semantic_batch(
            spark, batch, i, f"{base}/assign", f"{base}/pairs", 64,
            threshold=0.35, n_clusters=8,
        )
    reindex_semantic(spark, f"{base}/assign", v, 64, n_clusters=16, n_iter=0)
    backfill_semantic_pairs(
        spark, f"{base}/assign", f"{base}/pairs", threshold=0.35
    )
    acc = spark.read.option("recursiveFileLookup", "true").parquet(
        f"{base}/pairs"
    )
    return acc.select(
        "a_id", "b_id", "cluster", F.round("cosine", 6).alias("cosine")
    )


def q_vec_binary_sign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary (1-bit sign) quantization of the 64-d embedding into two
    32-bit words (functions/vector.py sign_pack): a 32× scan/shuffle cut
    for the Hamming candidate stage of knn_hamming_rerank. Integer
    checkpoints: both packed words + total popcount — exact BIGINT math
    in both engines (32-bit words never touch the 64-bit sign bit)."""
    from clinical_vector_search_spark.functions import vector as V

    v = _vecs(spark, sf_dir)
    code = V.sign_pack("embedding", 64)
    return v.select(
        "vec_id",
        F.element_at(code, 1).alias("word0"),
        F.element_at(code, 2).alias("word1"),
        F.aggregate(
            F.transform(code, lambda x: F.bit_count(x).cast("long")),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("n_bits_set"),
    )


def q_doc_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled (alpha=0.5, spelled sqrt for IEEE-exact
    cross-engine parity) domain mixture weights over documents.source
    (pipeline/documents.py domain_temperature_weights): one corpus-sized
    agg, #domains-row normalizing window. The derived mix_weight feeds
    mixture_sample's targets; effective_epochs > 1 flags upsampled
    domains under a one-epoch token budget."""
    from clinical_vector_search_spark.pipeline.documents import (
        domain_temperature_weights,
    )

    d = _docs(spark, sf_dir)
    r = domain_temperature_weights(d, alpha=0.5)
    return r.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round("mix_weight", 6).alias("mix_weight"),
        F.round("effective_epochs", 6).alias("effective_epochs"),
    )


def q_knn_hamming_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage binary ANN (operators/knn.py hamming_rerank): Hamming
    top-60 over packed sign codes — codes-only scan, broadcast query
    codes, corpus never shuffles — then exact cosine rerank at candidate
    granularity. Deterministic (integer Hamming, doc-id ties) so the
    DuckDB oracle replays both stages exactly. Recall contract vs
    knn_exact is floored in tests (sign codes keep direction only)."""
    from clinical_vector_search_spark.functions import vector as V
    from clinical_vector_search_spark.operators.knn import hamming_rerank

    v = _vecs(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"),
        V.l2_normalize("embedding").alias("embedding"),
    )
    q = v.filter(F.col("doc_id") < KNN_NQ).select(
        F.col("doc_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    r = hamming_rerank(q, v, k=KNN_K, dim=64, n_candidates=60)
    return r.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        "hamming",
        F.round("score", 6).alias("score"),
    )


def q_events_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival over user lifetimes in elapsed hours
    (operators/stats.py kaplan_meier): exact integer-ns floor-div
    lifetimes, right-censored at a 72-hour horizon before the corpus
    max timestamp, S(t) as exp(window-cumsum of ln(1 − d/n)) — the
    sequential product run as two window passes at distinct-lifetime
    granularity. The only fact-table shuffle is the per-user agg."""
    from clinical_vector_search_spark.operators.stats import kaplan_meier

    return kaplan_meier(_events(spark, sf_dir))


def q_events_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the daily event-count series at lags
    1..10 (operators/stats.py acf_daily): the fact table reduces to day
    granularity once; lag alignment is a broadcast self-join of the
    tiny day series, so the ACF costs O(days × lags) whatever the
    corpus size."""
    from clinical_vector_search_spark.operators.stats import acf_daily

    return acf_daily(_events(spark, sf_dir), max_lag=10)


def q_events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test + Wilson 95% intervals over an md5-nibble
    variant split (operators/stats.py ab_test_proportions): conversion
    = user emitted >= 1 purchase event. All statistics are closed
    forms of four exact counts; floats appear only after the counts
    are final (z NULL when pooled variance is 0)."""
    from clinical_vector_search_spark.operators.stats import (
        ab_test_proportions,
    )

    return ab_test_proportions(_events(spark, sf_dir))


def q_rel_ols_normal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS via normal equations on EXACT integer moments
    (operators/stats.py ols_normal): o_totalprice (cents) ~ month
    index + high-priority flag. One map-side-combinable agg emits nine
    BIGINT sums of products — bit-identical across engines because
    integer addition is associative — then Cramer's rule solves the
    3×3 system; only the final divisions are floating point."""
    from clinical_vector_search_spark.operators.stats import ols_normal

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return ols_normal(
        o,
        F.round(F.col("o_totalprice") * 100, 0),
        (F.year("o_orderdate") - F.lit(1992)) * 12 + F.month("o_orderdate"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        ).otherwise(0),
    )


def q_rel_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit audit of order totals
    (operators/stats.py benford_digits): observed digit shares vs
    log10(1 + 1/d) with per-digit chi-square contributions — the
    fabricated-data / corrupted-feed screen, one map-side digit
    extraction + a 9-group agg. (TPC-H prices are uniform-ish, so the
    chi-square contributions are large — that mismatch IS the audit
    signal the entry checks.)"""
    from clinical_vector_search_spark.operators.stats import benford_digits

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return benford_digits(o, "o_totalprice")


def q_doc_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information-value of document length vs the
    English label over n_chars deciles (operators/stats.py woe_iv):
    the classic supervised feature-screening table. The ntile runs
    over the total order (n_chars, doc_id) so both engines bin ties
    identically; label is null-safe (NULL lang → 0)."""
    from clinical_vector_search_spark.operators.stats import woe_iv

    return woe_iv(
        _docs(spark, sf_dir),
        "n_chars",
        F.when(F.col("lang") == "en", 1).otherwise(0),
        "doc_id",
        n_bins=10,
    )


def q_rel_priority_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (§2.6): order-priority counts for 1997 orders that
    have at least one RETURNED lineitem (EXISTS → LEFT SEMI join; the
    testdata has no commit/receipt dates, so l_returnflag='R' plays the
    late-lineitem predicate). Scale shape: the semi join shuffles only
    orderkeys — lineitem is pre-filtered map-side and projected to the
    join key before the exchange, and the count agg is 5 groups."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.year("o_orderdate") == 1997
    )
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


def q_rel_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (§2.6): profit by supplier nation × order year,
    profit = revenue − p_retailprice·quantity (retailprice stands in
    for ps_supplycost; no partsupp in the testdata). Scale shape: part
    is filtered to ECONOMY then BROADCAST, supplier⋈nation broadcasts,
    so the only fact-volume exchange is the lineitem⋈orders equi-join
    and the final (nation, year) agg is map-side combinable."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    p = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey", "p_retailprice")
    )
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    sn = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", "n_name"
    )
    # exact integer moments (ols_normal convention): prices are 2dp and
    # quantity integral, so profit in 1e-4 dollars is a BIGINT — the sum
    # is bit-identical across engines regardless of summation order,
    # unlike a double sum whose last ulp can flip a round-at-2 boundary
    ep_c = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    d_h = F.round(F.col("l_discount") * 100, 0).cast("long")
    rp_c = F.round(F.col("p_retailprice") * 100, 0).cast("long")
    qty = F.round(F.col("l_quantity"), 0).cast("long")
    profit_1e4 = ep_c * (F.lit(100) - d_h) - rp_c * qty * F.lit(100)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(sn), li.l_suppkey == sn.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("n_name", "o_year")
        .agg(
            F.round(F.sum(profit_1e4) / F.lit(10000.0), 2).alias("profit")
        )
    )


def q_rel_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (§2.6): lines shipped >60 days after the order
    date, split into high-priority (1-URGENT/2-HIGH) vs low-priority
    counts per linestatus (linestatus plays l_shipmode — absent in the
    testdata). Scale shape: one equi-join on orderkey with the lag
    predicate evaluated post-join, then conditional-sum aggregation to
    a handful of groups — the canonical CASE-count pivot."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(
            F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")) > 60
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def q_rel_cust_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (§2.6): distribution of orders-per-customer,
    keeping zero-order customers via LEFT OUTER join with an extra
    join-side predicate (priority ≠ 5-LOW stands in for the o_comment
    NOT LIKE filter). Scale shape: two shuffles — custkey for the
    per-customer count (skew-safe: customer keys are near-uniform),
    then the tiny c_count histogram agg; count(o_orderkey) keeps the
    NULL-extension rows at zero."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select("c_custkey")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


def q_rel_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (§2.6): PROMO-part revenue share per order month
    in 1997. Scale shape: part broadcasts, the year filter lands on the
    orders scan (plan-audited PushedFilters), and the share is a single
    conditional-sum / total-sum ratio per month — no second pass over
    the fact table."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.year("o_orderdate") == 1997
    )
    p = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_type"
    )
    rev = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(o.select("o_orderkey", "o_orderdate"), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.month("o_orderdate").alias("o_month"))
        .agg(
            F.round(F.sum(promo), 2).alias("promo_revenue"),
            F.round(F.sum(promo) * 100.0 / F.sum(rev), 4).alias(
                "promo_share_pct"
            ),
        )
    )


def q_rel_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (§2.6): distinct suppliers able to ship per
    (brand, size) slice, excluding one brand and an exclusion list of
    suppliers (negative acctbal plays the 'complaints' subquery);
    lineitem is the part↔supplier bridge (no partsupp table). Scale
    shape: the exclusion list is a dimension-sized broadcast ANTI join;
    the bridge is projected to three columns before the distinct agg,
    which Spark executes as two-level partial aggregation."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_suppkey"
    )
    p = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .filter(
            (F.col("p_brand") != "Brand#5")
            & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    bad = (
        spark.read.parquet(f"{sf_dir}/supplier.parquet")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q_rel_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (§2.6): suppliers whose recent (year ≥ 1999)
    shipped quantity of PROMO parts exceeds half their all-time shipped
    quantity of those parts — the nested-aggregate IN-subquery pattern,
    rewritten as one conditional-sum pass + a HAVING-style filter.
    Scale shape: ONE scan of the bridge computes both the recent and
    total sums (no self-join on lineitem); quantities are
    integer-valued doubles so the 2·recent > total comparison is exact.
    The qualifying supplier set is dimension-sized and joins broadcast."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    recent = F.when(F.year("l_shipdate") >= 1999, F.col("l_quantity")).otherwise(
        F.lit(0.0)
    )
    shipped = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(
            F.sum(recent).alias("recent_qty"),
            F.sum("l_quantity").alias("total_qty"),
        )
        .filter(F.col("recent_qty") * 2 > F.col("total_qty"))
    )
    return (
        s.join(F.broadcast(shipped), s.s_suppkey == shipped.l_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "s_name",
            "n_name",
            F.round("recent_qty", 1).alias("recent_qty"),
            F.round("total_qty", 1).alias("total_qty"),
        )
    )


def q_rel_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (§2.6): for each size-10 STANDARD part, the
    EUROPEAN supplier with the minimum observed unit price (extended
    price / quantity over lineitem — no partsupp cost column), i.e.
    the correlated-MIN subquery, expressed as a window rank with a
    deterministic (unit_cost, s_suppkey) tie-break. Scale shape: part
    and the supplier⋈nation⋈region chain both broadcast; the window
    partitions by partkey AFTER a (part, supplier)-granularity agg, so
    the ranked frame is candidate-sized, not fact-sized. The raw double
    division is identical bit-for-bit in both engines, so ordering by
    it is cross-engine deterministic; only the output is rounded."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .filter((F.col("p_size") == 10) & (F.col("p_type") == "STANDARD"))
        .select("p_partkey", "p_name")
    )
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet").filter(
        F.col("r_name") == "EUROPE"
    )
    eu_sup = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal")
    )
    cand = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(eu_sup), li.l_suppkey == eu_sup.s_suppkey)
        .groupBy("p_partkey", "s_suppkey", "s_name", "s_acctbal")
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
                "unit_cost"
            )
        )
    )
    w = Window.partitionBy("p_partkey").orderBy("unit_cost", "s_suppkey")
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "p_partkey",
            "s_name",
            F.round("s_acctbal", 2).alias("s_acctbal"),
            F.round("unit_cost", 2).alias("min_unit_cost"),
        )
    )


def q_rel_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (§2.6): NATION_2's share of ASIA-market PROMO-part
    revenue per order year — the two-level conditional-share query.
    Scale shape: every dimension chain (customer-side nation⋈region,
    part, supplier-side nation) broadcasts; the lineitem⋈orders
    equi-join is the only fact shuffle, and the share is a
    conditional-sum ratio inside one agg (no per-year second pass)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    p = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    asia_cust = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(
            F.broadcast(r.filter(F.col("r_name") == "ASIA")),
            n.n_regionkey == r.r_regionkey,
        )
        .select("c_custkey")
    )
    sup_nation = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("supp_nation")
    )
    rev = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    target = F.when(F.col("supp_nation") == "NATION_2", rev).otherwise(
        F.lit(0.0)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o.select("o_orderkey", "o_custkey", "o_orderdate"),
              li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(asia_cust), o.o_custkey == asia_cust.c_custkey,
              "left_semi")
        .join(F.broadcast(sup_nation), li.l_suppkey == sup_nation.s_suppkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(F.sum(rev), 2).alias("market_revenue"),
            F.round(F.sum(target) / F.sum(rev), 4).alias("nation2_share"),
        )
    )


def q_events_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test (operators/stats.py mann_whitney_u):
    do purchase event values stochastically dominate view values? The
    nonparametric complement of events_ab_test for continuous metrics.
    Values bin to 2dp first (round-before-compare on the rank key, and
    the distinct-value frame stays bounded); average tie ranks from ONE
    cumulative window at distinct-value granularity, so U is an exact
    half-integer in both engines; only z is float."""
    from clinical_vector_search_spark.operators.stats import mann_whitney_u

    e = _events(spark, sf_dir).filter(
        F.col("event_type").isin("purchase", "view")
    )
    return mann_whitney_u(
        e, "value", (F.col("event_type") == "purchase").cast("int")
    )


def q_events_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test of event_type × day-of-week
    (operators/stats.py chi_square_independence): is traffic mix stable
    across the week? ONE (type, dow) agg over the fact table; row/col/
    grand totals and dof are window sums at CELL granularity (35 rows),
    never a second fact pass. Cells are exact integer counts; expected/
    contributions rounded 6dp."""
    from clinical_vector_search_spark.operators.stats import (
        chi_square_independence,
    )

    e = _events(spark, sf_dir)
    return chi_square_independence(
        e, F.col("event_type"), F.dayofweek("ts").cast("int")
    )


def q_graph_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS hop distances from the smallest node of the co-order part
    graph, 4 hops (operators/graph.py bfs_levels): per hop ONE
    frontier⋈edges join + min-dist dedup, settled nodes never
    re-expanded, localCheckpoint-pinned (the kcore/PageRank iterative
    discipline — the oracle unrolls the identical 4 expansions with
    MATERIALIZED per-level frontiers, not a path-enumerating recursive
    CTE). Integer distances — exact in any engine."""
    from clinical_vector_search_spark.operators.graph import bfs_levels

    l = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = l.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = l.select("l_orderkey", F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
        .select("src", "dst")
    )
    # pa < pb on every edge, so the globally smallest node in the graph
    # always appears on the src side — min(src) IS the min node
    source = edges.agg(F.min("src").alias("node"))
    return bfs_levels(edges, source, max_hops=4).select(
        F.col("node").cast("long").alias("node"),
        F.col("dist").cast("int").alias("dist"),
    )


def q_events_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry preference strengths over event types
    (operators/stats.py bradley_terry) — the reward-model fit from
    pairwise preference data. Comparisons: within each (user, day), type
    A beats type B when A's total value is larger, decided on EXACT
    integer cents (a double-sum ulp can't flip a winner); the self-join
    fan-out is bounded by 5² per user-day. The MM fit then runs 3 fixed
    rounds at PAIR granularity (25 rows), per-round strengths rounded to
    12dp so the trajectory is engine-reproducible — the oracle unrolls
    the identical 3 updates."""
    from clinical_vector_search_spark.operators.stats import bradley_terry

    e = _events(spark, sf_dir)
    per = e.groupBy(
        F.to_date("ts").alias("day"), "user_id", "event_type"
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents")
    )
    a = per.select("day", "user_id", F.col("event_type").alias("ta"),
                   F.col("cents").alias("ca"))
    b = per.select("day", "user_id", F.col("event_type").alias("tb"),
                   F.col("cents").alias("cb"))
    comp = (
        a.join(b, ["day", "user_id"])
        .filter((F.col("ta") != F.col("tb")) & (F.col("ca") > F.col("cb")))
        .groupBy(F.col("ta").alias("winner"), F.col("tb").alias("loser"))
        .agg(F.count("*").alias("n"))
    )
    return bradley_terry(comp, n_iter=3)


def q_doc_quality_logreg_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC of the trained quality classifier (operators/logreg.py
    logreg_auc): the threshold-free companion of the eval/calibration
    passes, via the rank-sum identity AUC = (R1 − n1(n1+1)/2)/(n1·n2)
    with average tie ranks — never materializing the ROC curve. Scores
    round to 6dp before ranking (round-before-compare on the rank key);
    the oracle unrolls training AND the rank-sum, so the full
    train→score→rank loop value-hashes."""
    from clinical_vector_search_spark.functions import text as TXT
    from clinical_vector_search_spark.operators.logreg import (
        logreg_auc,
        logreg_train,
    )

    docs = _docs(spark, sf_dir)
    ntok = TXT.token_count("text").cast("double")
    feats = docs.select(
        (F.col("lang").eqNullSafe(F.lit("en"))).alias("is_en"),
        ntok.alias("n_tokens"),
        (
            F.col("n_chars").cast("double")
            / F.greatest(ntok, F.lit(1.0))
        ).alias("mean_tok_len"),
        TXT.stopword_ratio(TXT.tokenize("text")).alias("stopword_ratio"),
    )
    cols = ["n_tokens", "mean_tok_len", "stopword_ratio"]
    w = logreg_train(feats, cols, F.col("is_en"), lr=1.0, n_iter=5)
    return logreg_auc(feats, cols, F.col("is_en"), w)


def q_text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease / Flesch-Kincaid grade per document
    (functions/text.py readability): the published quality formula over
    three exact integer counts (whitespace words, terminal-punctuation
    sentence runs, vowel-group syllable runs) — pure map-side regexp
    expressions, zero joins/shuffles; scores rounded 4dp (two divisions
    of exact integers + literals)."""
    from clinical_vector_search_spark.functions.text import readability

    docs = _docs(spark, sf_dir)
    r = readability(F.col("text"))
    return docs.select(
        "doc_id",
        r["n_words"].alias("n_words"),
        r["n_sents"].alias("n_sents"),
        r["n_syll"].alias("n_syll"),
        F.round(r["flesch_ease"], 4).alias("flesch_ease"),
        F.round(r["fk_grade"], 4).alias("fk_grade"),
    )


def q_text_textrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank
    over the word-adjacency graph — bigram edges from the raw token
    stream (expression-level slice/zip, no position self-join), content
    words only (len ≥ 3, non-stopword), support-cut ≥ 3 so the graph is
    vocabulary-sized; then the SAME 5-iteration dangling-mass PageRank
    as dedup_pagerank (operators/graph.py textrank_keywords) and a
    rounded-before-rank top-30. The oracle reuses the identical
    iteration unroll."""
    from clinical_vector_search_spark.operators.graph import (
        textrank_keywords,
    )

    return textrank_keywords(
        _docs(spark, sf_dir),
        min_support=3,
        top_k=30,
        n_iter=PAGERANK_ITER,
        damping=PAGERANK_DAMP,
    )


def q_rel_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood ER candidates over customer names
    (operators/dedup.py sorted_neighborhood_pairs): sort by name within
    id-band partitions, compare each record with the next 2 via window
    leads — expression-level, ONE shuffle, no self-join; Levenshtein
    JVM-side. The blocking complement of rel_name_match (prefix blocks);
    boundary pairs are the documented multi-pass recall contract."""
    from clinical_vector_search_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )

    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("doc_id"), "c_name"
    )
    return sorted_neighborhood_pairs(
        c,
        "c_name",
        F.substring("c_name", 10, 4),
        window_size=3,
        max_distance=2,
    )


def q_events_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (§2.7 — the frame type ROWS can't express):
    per-user trailing-1-hour event count and value sum, frame bounds on
    the integer-ns order key so peers (equal timestamps) enter the frame
    identically in every engine. The sum accumulates EXACT integer cents
    (a double sum's order drift can't leak into the hash); one user-key
    shuffle, no joins."""
    e = _events(spark, sf_dir)
    hour_ns = 3_600_000_000_000
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ns")
        .rangeBetween(-hour_ns, 0)
    )
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return e.select(
        "event_id",
        "user_id",
        "ts_ns",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        (F.sum(cents).over(w) / F.lit(100.0)).alias("sum_1h"),
    )


def q_rel_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto-frontier preference query (operators/skyline.py
    skyline_2d, Börzsönyi ICDE'01): suppliers not dominated on
    (total revenue, account balance). The Spark path is TWO window
    maxima over ONE sort at supplier granularity — O(n log n), zero
    joins — while the oracle runs the textbook O(n²) NOT-EXISTS self
    join; both must emit the identical frontier. Revenue is summed as
    exact integer cents so the strict-greater RANGE frame is never an
    ulp lottery."""
    from clinical_vector_search_spark.operators.skyline import skyline_2d

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100, 0).cast("long")
        ).alias("rev_cents")
    )
    cand = s.join(
        F.broadcast(rev), s.s_suppkey == rev.l_suppkey
    ).select("s_suppkey", "s_name", "rev_cents", "s_acctbal")
    return skyline_2d(cand, "rev_cents", "s_acctbal").select(
        "s_suppkey",
        "s_name",
        (F.col("rev_cents") / F.lit(100.0)).alias("revenue"),
        F.round("s_acctbal", 2).alias("s_acctbal"),
    )


def q_rel_skyline_prefiltered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same skyline query with the distributed-skyline reduction ON
    (operators/skyline.py skyline_2d(local_prefilter=True), r9): a
    zero-shuffle per-partition local skyline runs ahead of the global
    window, and the result must be IDENTICAL — the oracle is the same
    O(n²) NOT-EXISTS SQL as rel_skyline, so the pre-filter's
    exactness gets value-hash evidence, not just the pytest superset
    property. The candidate frame is repartitioned so the local pass
    actually sees multiple partitions."""
    from clinical_vector_search_spark.operators.skyline import skyline_2d

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100, 0).cast("long")
        ).alias("rev_cents")
    )
    cand = s.join(
        F.broadcast(rev), s.s_suppkey == rev.l_suppkey
    ).select("s_suppkey", "s_name", "rev_cents", "s_acctbal")
    return skyline_2d(
        cand.repartition(8), "rev_cents", "s_acctbal", local_prefilter=True
    ).select(
        "s_suppkey",
        "s_name",
        (F.col("rev_cents") / F.lit(100.0)).alias("revenue"),
        F.round("s_acctbal", 2).alias("s_acctbal"),
    )


def q_events_cumulative_uniques(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """New-user growth curve: per first-seen day, new users and the
    running cumulative unique-user count — the growth metric every
    ops dashboard opens with, and the window-COUNT-DISTINCT pattern
    (not supported natively as a window) done right: distinct is
    resolved ONCE at user granularity (min first day per user), so the
    running sum is a plain window cumsum at day granularity, exact
    integers. One user-key shuffle total; the DAU/WAU entry's
    cumulative complement."""
    e = _events(spark, sf_dir)
    daily = (
        e.groupBy("user_id")
        .agg(
            F.min(F.expr("ts_ns div 86400000000000")).alias("day")
        )
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("new_users"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).alias("cum_users"),
    )


def q_events_churn_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn-label generation — the supervised-dataset builder every
    retention model starts from: features from the window BEFORE a
    cutoff (7 days before corpus max), label = no activity after it.
    The cutoff is a 1-row broadcast stat frame (never a driver
    constant), features are exact integer counts / floor-div days in
    ONE user-key aggregation pass, and the cohort excludes users with
    no pre-cut history (no features to learn from). Leakage-safe by
    construction: every feature reads strictly pre-cut events."""
    e = _events(spark, sf_dir)
    week_ns = 7 * 86_400 * 10**9
    cut = e.agg((F.max("ts_ns") - F.lit(week_ns)).alias("cut_ns"))
    before = F.col("ts_ns") < F.col("cut_ns")
    per_user = (
        e.crossJoin(F.broadcast(cut))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(before, 1).otherwise(0)).alias("n_before"),
            F.sum(
                F.when(
                    before & (F.col("event_type") == "purchase"), 1
                ).otherwise(0)
            ).alias("n_purchases_before"),
            F.countDistinct(
                F.when(before, F.expr("ts_ns div 86400000000000"))
            ).alias("days_active_before"),
            F.max(F.when(before, F.col("ts_ns"))).alias("last_before"),
            F.max(F.when(~before, 1).otherwise(0)).alias("active_after"),
            F.max("cut_ns").alias("cut_ns"),
        )
    )
    return per_user.filter(F.col("n_before") > 0).select(
        "user_id",
        "n_before",
        "n_purchases_before",
        "days_active_before",
        F.expr("(cut_ns - last_before) div 86400000000000").alias(
            "recency_days"
        ),
        (F.lit(1) - F.col("active_after")).cast("int").alias("churned"),
    )


def q_events_session_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomalous-session detection by Markov log-likelihood: sessions
    whose event-type transition sequence is least probable under the
    corpus-wide first-order transition model — the sequence-level
    composition of events_sessionize and events_markov_transitions.
    Transitions never cross a session boundary (lead guarded by the
    session id); the 5×5 probability table broadcasts; per-session
    score = mean ln p over its transitions, rounded before the
    bottom-20 rank with a total (score, user, session) tie-break."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    gap_ns = SESSION_GAP_SEC * 1_000_000_000
    st = e.select(
        "user_id",
        "event_id",
        "ts_ns",
        "event_type",
        F.sum(
            F.when(
                F.col("ts_ns") - F.lag("ts_ns").over(w) > gap_ns, 1
            ).otherwise(0)
        )
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_seq"),
    )
    trans = st.select(
        "user_id",
        "session_seq",
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
        F.lead("session_seq").over(w).alias("to_seq"),
    ).filter(
        F.col("to_type").isNotNull()
        & (F.col("to_seq") == F.col("session_seq"))
    )
    counts = trans.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = Window.partitionBy("from_type").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    probs = counts.select(
        "from_type",
        "to_type",
        (F.col("n").cast("double") / F.sum("n").over(tot)).alias("p"),
    )
    scored = (
        trans.join(F.broadcast(probs), ["from_type", "to_type"])
        .groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_trans"),
            F.round(F.avg(F.log("p")), 6).alias("avg_logp"),
        )
    )
    wr = Window.orderBy("avg_logp", "user_id", "session_seq")
    return (
        scored.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= 20)
        .select(
            "user_id",
            F.col("session_seq").cast("long").alias("session_seq"),
            "n_trans",
            "avg_logp",
            F.col("rn").cast("int").alias("rn"),
        )
    )


def q_rel_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI MERGE INTO emulation (operators/temporal.py merge_upsert):
    one deterministic changelog (updates %7, deletes %11, inserts %13
    with offset keys) merged into customer in ONE full-outer join +
    CASE routing — matched rows update, delete-flagged rows drop
    (source-only deletes are no-ops, as SQL MERGE requires), source-only
    rows insert, target-only rows pass through. The upsert surface OSS
    Spark ships only with a lakehouse format, here as plain relational
    algebra; the oracle spells the same MERGE as LEFT JOIN + anti-insert
    branches."""
    from clinical_vector_search_spark.operators.temporal import (
        merge_upsert,
    )

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    k = F.col("c_custkey")
    upd = c.filter((k % 7 == 0) & (k % 11 != 0)).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        (F.col("c_acctbal") + 10.0).alias("c_acctbal"),
        "c_mktsegment",
        F.lit(False).alias("is_del"),
    )
    dele = c.filter(k % 11 == 0).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_acctbal",
        "c_mktsegment",
        F.lit(True).alias("is_del"),
    )
    ins = c.filter(k % 13 == 0).select(
        (k + 10_000_000).alias("c_custkey"),
        F.concat(F.lit("NEW#"), k.cast("string")).alias("c_name"),
        "c_nationkey",
        F.lit(0.0).alias("c_acctbal"),
        F.lit("NEW").alias("c_mktsegment"),
        F.lit(False).alias("is_del"),
    )
    src = upd.unionByName(dele).unionByName(ins)
    merged = merge_upsert(
        c, src, ["c_custkey"], delete_condition=F.col("is_del")
    )
    return merged.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.round("c_acctbal", 2).alias("c_acctbal"),
        "c_mktsegment",
    )


def q_io_python_streamsource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING Python Data Source (Spark 4 SimpleDataSourceStreamReader,
    io/pysource.py SyntheticDocsStreamReader): the md5-deterministic
    corpus delivered as row-cursor micro-batches (200+200+100), run as a
    REAL streaming query into a memory sink until the bounded source
    idles. Offsets are pure row indices, so replay (and checkpoint
    recovery via readBetweenOffsets) regenerates bit-identical rows —
    even streaming-source plumbing gets a full value-hash oracle. The
    result must equal the BATCH reader's 500 rows exactly: same
    generator, exactly-once across batch boundaries."""
    from clinical_vector_search_spark.io.pysource import register

    register(spark)
    name = "synth_stream_entry"
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    q = (
        spark.readStream.format("synthetic_docs")
        .option("rows", 500)
        .option("batch_rows", 200)
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # materialize BEFORE returning: the memory sink's table lives only
    # while the session does, but the checker collects immediately
    return spark.table(name).select("doc_id", "text")


def q_graph_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-propagation communities over the co-order part graph
    (operators/graph.py label_propagation): 3 synchronous rounds, each
    ONE neighbor-label equi-join + (node, label) count + window argmax
    with the smallest-label tie-break that makes classic LPA
    deterministic (and the oracle an exact 3-round unroll). Communities
    are denser than the connected components of dedup_groups — bridge
    edges don't merge clusters."""
    from clinical_vector_search_spark.operators.graph import (
        label_propagation,
    )

    l = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = l.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = l.select("l_orderkey", F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
        .select("src", "dst")
    )
    return label_propagation(edges, n_iter=3).select(
        F.col("node").cast("long").alias("node"),
        F.col("label").cast("long").alias("label"),
    )


def q_text_trigram_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram-indexed substring search (operators/sparse.py
    trigram_postings + trigram_search, the pg_trgm pattern): find docs
    containing 'merge batch' by intersecting the pattern's 9 trigram
    posting lists (lossless pruning — a containing doc necessarily has
    every trigram), then exact-verifying ONLY the candidates. The
    IN-list lands on the postings scan; the corpus-wide contains() scan
    this replaces never runs."""
    from clinical_vector_search_spark.operators.sparse import (
        trigram_postings,
        trigram_search,
    )

    docs = _docs(spark, sf_dir)
    postings = trigram_postings(docs)
    return trigram_search(postings, docs, "merge batch").select(
        "doc_id", "n_chars"
    )


def q_retrieval_trigram_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintained trigram index lifecycle (operators/sparse.py
    trigram_index_add/delete/read — the FOURTH index on the shared
    maintenance protocol, r14; written as one kit against the
    parameterized contract suite): the corpus arrives as two idempotent
    batch-id-overwrite ingests of per-doc trigram postings (cost ∝
    batch — the simplest protocol member: no corpus-global statistics
    at all), ids with doc_id % 10 == 3 are tombstoned (ids only — no
    delete-by-replay needed), and the 'merge batch' substring search
    runs over the READ-BACK postings (broadcast tombstone anti-join):
    lossless trigram-intersection pruning, exact contains() verify on
    candidates only. Oracle = the text_trigram_search SQL restricted
    to the survivors."""
    import shutil
    import tempfile

    from clinical_vector_search_spark.operators.sparse import (
        trigram_index_add,
        trigram_index_delete,
        trigram_read_index,
        trigram_search,
    )

    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    base = f"{tempfile.gettempdir()}/cvs_trigram_idx_{tag}"
    shutil.rmtree(base, ignore_errors=True)
    docs = _docs(spark, sf_dir)
    trigram_index_add(spark, docs.filter(F.col("doc_id") % 2 == 0), 0, base)
    trigram_index_add(spark, docs.filter(F.col("doc_id") % 2 == 1), 1, base)
    trigram_index_delete(
        spark, docs.filter(F.col("doc_id") % 10 == 3).select("doc_id"),
        0, base,
    )
    postings = trigram_read_index(spark, base)
    survivors = docs.filter(F.col("doc_id") % 10 != 3)
    return trigram_search(postings, survivors, "merge batch").select(
        "doc_id", "n_chars"
    )


def q_events_forecast_backtest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Walk-forward backtest of the two standard forecasting baselines
    (the yardsticks any real model must beat): naive (yesterday's
    count) and seasonal-naive (same weekday last week) over the daily
    event-count series. Strictly causal by construction — predictions
    are window lags, so no future value can leak into its own forecast;
    scored only where the lag exists. One day-granularity frame after
    one fact agg; errors on exact integer counts, only the final
    MAE/MAPE divisions are float (6dp)."""
    e = _events(spark, sf_dir)
    daily = e.groupBy(
        F.expr("ts_ns div 86400000000000").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    w = Window.orderBy("day")
    lagged = daily.select(
        "day",
        "y",
        F.lag("y", 1).over(w).alias("naive"),
        F.lag("y", 7).over(w).alias("snaive"),
    )

    def scores(pred, name):
        ok = F.col(pred).isNotNull()
        err = F.abs(F.col("y") - F.col(pred))
        return lagged.filter(ok).agg(
            F.lit(name).alias("method"),
            F.count(F.lit(1)).alias("n_days"),
            F.round(F.avg(err), 6).alias("mae"),
            F.round(
                F.avg(err / F.greatest(F.col("y"), F.lit(1))), 6
            ).alias("mape"),
        )

    return scores("naive", "naive").unionByName(
        scores("snaive", "seasonal_naive")
    )


def q_rel_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution — the multi-pass composition the ER
    literature prescribes and the repo's parts were built for: candidate
    pairs from BOTH blocking strategies (prefix blocks via
    blocked_fuzzy_pairs, sort-order neighbors via
    sorted_neighborhood_pairs — each misses pairs the other catches),
    unioned and closed into entity ids by connected components
    (dedup_groups min-label propagation; entity_id = min custkey in the
    component). The oracle re-derives both pair sets and runs the
    closure as a recursive CTE."""
    from clinical_vector_search_spark.operators.dedup import (
        blocked_fuzzy_pairs,
        dedup_groups,
        sorted_neighborhood_pairs,
    )

    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("doc_id"), "c_name"
    )
    p1 = blocked_fuzzy_pairs(
        c, "c_name", F.substring("c_name", 1, 16), max_distance=1
    ).select("a_id", "b_id")
    p2 = sorted_neighborhood_pairs(
        c,
        "c_name",
        F.substring("c_name", 10, 4),
        window_size=3,
        max_distance=2,
    ).select("a_id", "b_id")
    pairs = p1.unionByName(p2).distinct()
    return dedup_groups(c.select("doc_id"), pairs, "doc_id").select(
        F.col("doc_id").alias("c_custkey"),
        F.col("group_id").alias("entity_id"),
    )


def q_events_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (operators/stats.py cuped_adjustment,
    Deng 2013): per-variant experiment means adjusted by the pre-period
    covariate, θ = cov/var from ONE pass of exact BIGINT moments (the
    ols_normal convention), var(y*) by the closed form var(y) −
    cov²/var(x) — no second pass. The experimentation-platform
    companion of events_ab_test: same md5 variant split, dollars
    restored only in the rounded outputs."""
    from clinical_vector_search_spark.operators.stats import (
        cuped_adjustment,
    )

    return cuped_adjustment(_events(spark, sf_dir))


def q_graph_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank (operators/graph.py personalized_pagerank,
    Haveliwala 2002): relevance field around the 10 smallest nodes of
    the co-order part graph — the graph-native related-items primitive.
    Teleport AND dangling mass flow back to the seeds, keeping the
    field localized; weights normalize through a broadcast stat frame;
    the oracle unrolls the identical 5 iterations. Rounded-before-rank
    top-50."""
    from clinical_vector_search_spark.operators.graph import (
        personalized_pagerank,
    )

    l = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = l.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = l.select("l_orderkey", F.col("l_partkey").alias("pb"))
    und = (
        a.join(b, "l_orderkey")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy(F.col("pa").alias("u"), F.col("pb").alias("v"))
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )
    edges = und.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        und.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    nodes = edges.select(F.col("src").alias("node")).distinct()
    seeds = (
        nodes.orderBy("node").limit(10).select("node", F.lit(1.0).alias("weight"))
    )
    pr = personalized_pagerank(
        nodes, edges, seeds, n_iter=PAGERANK_ITER, damping=PAGERANK_DAMP
    )
    w = Window.orderBy(F.desc("rank"), "node")
    return (
        pr.select(
            F.col("node").cast("long").alias("node"),
            F.round("rank", 9).alias("rank"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 50)
        .select("node", "rank", F.col("rn").cast("int").alias("rn"))
    )


def q_events_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences — the 2×2 causal baseline: per-user
    value (exact cents) in pre/post periods split at the corpus
    midpoint, md5 variant groups (the events_ab_test / events_cuped
    split), DiD = (B_post − B_pre) − (A_post − A_pre) on per-user-period
    means. One user-period aggregation, then a 4-cell closed form;
    floats only in the final mean divisions (6dp). The CUPED entry's
    causal companion — same decomposition, different estimand."""
    e = _events(spark, sf_dir)
    mid = e.agg(
        # integer floor-div (cuped_adjustment's cast-direction note)
        F.expr("(min(ts_ns) + max(ts_ns)) div 2").alias("mid_ns")
    )
    cents = F.round(F.col("value") * 100, 0).cast("long")
    per = (
        e.crossJoin(F.broadcast(mid))
        .groupBy(
            "user_id",
            (F.col("ts_ns") >= F.col("mid_ns")).cast("int").alias("post"),
        )
        .agg(F.sum(cents).alias("y_cents"))
    )
    cell = per.select(
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 1),
                16,
                10,
            ).cast("int")
            % 2
        ).alias("variant"),
        "post",
        "y_cents",
    ).groupBy("variant", "post").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("y_cents").alias("sy"),
    )
    mean = F.col("sy") / F.col("n_users") / 100.0
    w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )

    def pick(v, p):
        return F.max(
            F.when((F.col("variant") == v) & (F.col("post") == p), mean)
        ).over(w)

    return cell.select(
        "variant",
        "post",
        "n_users",
        F.round(mean, 6).alias("mean_value"),
        F.round(
            (pick(1, 1) - pick(1, 0)) - (pick(0, 1) - pick(0, 0)), 6
        ).alias("did_estimate"),
    )


def q_events_log_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test (operators/stats.py log_rank_test, Mantel 1966):
    do the two md5-split cohorts' survival curves differ? Same exact
    integer-ns lifetime/censoring contract as events_kaplan_meier;
    O−E and the hypergeometric variance accumulate over risk sets that
    are window sums of integers at distinct-lifetime granularity —
    the survival family's hypothesis test."""
    from clinical_vector_search_spark.operators.stats import log_rank_test

    return log_rank_test(_events(spark, sf_dir))


def q_rel_incremental_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental JOIN-view maintenance (operators/audit.py
    incremental_join_update, the Blakeley delta rule): the stored
    customer⋈orders view absorbs a customer batch (custkey %5 == 0) and
    an orders batch (orderkey %7 == 0) through three delta joins whose
    batch sides BROADCAST — maintenance cost ∝ batch, never |L|·|R|.
    The oracle is the full recompute over the complete tables: hash
    equality proves the three delta terms partition the new pairs
    exactly. The join-side complement of rel_incremental_agg."""
    from clinical_vector_search_spark.operators.audit import (
        incremental_join_update,
    )

    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    c0 = c.filter(F.col("c_custkey") % 5 != 0)
    dc = c.filter(F.col("c_custkey") % 5 == 0)
    o0 = o.filter(F.col("o_orderkey") % 7 != 0)
    do = o.filter(F.col("o_orderkey") % 7 == 0)
    # the pre-existing materialized view (in a real system: stored);
    # localCheckpoint stands in for the storage boundary so the delta
    # joins' plan never re-derives it
    view0 = (
        c0.join(o0, c0.c_custkey == o0.o_custkey)
        .select("c_custkey", "c_mktsegment", "o_orderkey", "o_totalprice")
        .localCheckpoint()
    )
    upd = incremental_join_update(
        view0, c0, o0, dc, do, "c_custkey", "o_custkey"
    )
    return upd.select(
        "c_custkey",
        "c_mktsegment",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )


def q_doc_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman optimal allocation for stratified sampling (Neyman 1934):
    sample strata ∝ N_h·σ_h, which minimizes the estimator variance at
    fixed budget — the design table the stratified sampler
    (doc_stratified_sample) should be fed instead of proportional
    shares when strata differ in spread. Per-source strata over
    n_chars: one pass of EXACT BIGINT moments (Σx, Σx²) per stratum,
    σ_h from the closed form, shares normalized by a window total at
    stratum granularity; floats only after the integer moments are
    final (6dp). Emits the design, not a sample — allocation is
    deterministic, integer rounding of final counts is the caller's
    largest-remainder step."""
    docs = _docs(spark, sf_dir)
    by_s = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_h"),
        F.sum("n_chars").alias("sx"),
        F.sum(F.col("n_chars") * F.col("n_chars")).alias("sxx"),
    )
    n = F.col("n_h").cast("double")
    mean = F.col("sx") / n
    var = F.col("sxx") / n - mean * mean
    sigma = F.sqrt(F.greatest(var, F.lit(0.0)))
    w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return by_s.select(
        "source",
        "n_h",
        F.round(mean, 6).alias("mean_chars"),
        F.round(sigma, 6).alias("sigma_chars"),
        F.round((n * sigma) / F.sum(n * sigma).over(w), 6).alias(
            "neyman_share"
        ),
        F.round(n / F.sum(n).over(w), 6).alias("proportional_share"),
    )


def q_text_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation (operators/stats.py spearman_corr)
    between document length and whitespace token count — the tie-exact
    average-rank spelling (min-rank + (ties−1)/2, both engine-identical
    windows), Pearson only on the bit-identical ranks. The monotone-
    robust complement of the Pearson F.corr used across the rel_*
    profiles."""
    from clinical_vector_search_spark.functions import text as TXT
    from clinical_vector_search_spark.operators.stats import spearman_corr

    docs = _docs(spark, sf_dir)
    return spearman_corr(
        docs, F.col("n_chars"), TXT.token_count("text").cast("long")
    )


def q_events_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov (operators/stats.py ks_two_sample):
    purchase vs view value distributions — the shape-drift test
    completing events_mann_whitney's location test. CDFs are cumulative
    INTEGER counts over 2dp bins, so D is an exact integer ratio; one
    value-granularity agg, then window cumsums."""
    from clinical_vector_search_spark.operators.stats import ks_two_sample

    e = _events(spark, sf_dir).filter(
        F.col("event_type").isin("purchase", "view")
    )
    return ks_two_sample(
        e, "value", (F.col("event_type") == "purchase").cast("int")
    )


def q_events_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V effect size for the event_type × day-of-week
    association — the [0,1]-normalized companion of events_chi_square's
    raw statistic (a huge-N chi-square is always 'significant'; V says
    whether the association MATTERS): V = √(χ²/(N·min(r−1,c−1))). One
    summary row derived from the same single (type, dow) aggregation."""
    from clinical_vector_search_spark.operators.stats import (
        chi_square_independence,
    )

    e = _events(spark, sf_dir)
    cells = chi_square_independence(
        e, F.col("event_type"), F.dayofweek("ts").cast("int")
    )
    agg = cells.agg(
        F.sum("observed").alias("n"),
        F.max("chi2_total").alias("chi2"),
        F.max("dof").alias("dof"),
        F.countDistinct("a").alias("r"),
        F.countDistinct("b").alias("c"),
    )
    denom = F.col("n").cast("double") * F.least(
        F.col("r") - 1, F.col("c") - 1
    ).cast("double")
    return agg.select(
        "n",
        "chi2",
        "dof",
        F.round(
            F.when(denom > 0, F.sqrt(F.col("chi2") / denom)), 6
        ).alias("cramers_v"),
    )


def q_events_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F-test of value across the five event types — the
    k-group extension of the two-sample family (MW/KS compare two).
    Sums of squares decompose from per-group EXACT integer-cent moments
    (n, Σy, Σy² as BIGINT — the ols_normal convention): SSB = Σ n_g·
    (ȳ_g − ȳ)², SSW = Σ(Σy²_g − n_g·ȳ_g²), F = (SSB/(k−1))/(SSW/(N−k)).
    One fact aggregation, then a k-row closed form; floats only after
    the integer moments are final (6dp)."""
    e = _events(spark, sf_dir)
    cents = F.round(F.col("value") * 100, 0).cast("long")
    g = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum(cents).alias("sy"),
        F.sum(cents * cents).alias("syy"),
    )
    w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    tot_n = F.sum("n_g").over(w).cast("double")
    tot_sy = F.sum("sy").over(w).cast("double")
    k = F.count(F.lit(1)).over(w).cast("double")
    mean_g = F.col("sy").cast("double") / F.col("n_g")
    grand = tot_sy / tot_n
    ssb_term = F.col("n_g").cast("double") * (mean_g - grand) * (
        mean_g - grand
    )
    ssw_term = F.col("syy").cast("double") - F.col("n_g") * mean_g * mean_g
    x = g.select(
        "event_type",
        "n_g",
        F.round(mean_g / 100.0, 6).alias("mean_value"),
        F.sum(ssb_term).over(w).alias("_ssb"),
        F.sum(ssw_term).over(w).alias("_ssw"),
        tot_n.alias("_n"),
        k.alias("_k"),
    )
    f_stat = (F.col("_ssb") / (F.col("_k") - 1.0)) / (
        F.col("_ssw") / (F.col("_n") - F.col("_k"))
    )
    return x.select(
        "event_type",
        "n_g",
        "mean_value",
        F.round(
            F.when(
                (F.col("_k") > 1)
                & (F.col("_n") > F.col("_k"))
                & (F.col("_ssw") > 0),
                f_stat,
            ),
            6,
        ).alias("f_stat"),
    )


def q_events_welch_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test, purchase vs view values — the
    parametric member of the two-sample ladder (MW ranks, KS shapes,
    Welch means under heteroscedasticity, the default over Student's
    pooled t). Everything derives from six exact integer-cent moments
    (n, Σy, Σy² per group, BIGINT): sample variances, t, and the
    Welch-Satterthwaite df — one fact aggregation, one output row,
    floats only after the moments are final (6dp)."""
    e = _events(spark, sf_dir).filter(
        F.col("event_type").isin("purchase", "view")
    )
    cents = F.round(F.col("value") * 100, 0).cast("long")
    is_p = F.col("event_type") == "purchase"
    g = e.agg(
        F.sum(F.when(is_p, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(is_p, cents).otherwise(0)).alias("s1"),
        F.sum(F.when(is_p, cents * cents).otherwise(0)).alias("q1"),
        F.sum(F.when(is_p, 0).otherwise(1)).alias("n2"),
        F.sum(F.when(is_p, F.lit(0).cast("long")).otherwise(cents)).alias(
            "s2"
        ),
        F.sum(
            F.when(is_p, F.lit(0).cast("long")).otherwise(cents * cents)
        ).alias("q2"),
    )
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    m1 = F.col("s1") / n1
    m2 = F.col("s2") / n2
    # sample (n-1) variances from exact moments
    v1 = (F.col("q1") - n1 * m1 * m1) / (n1 - 1.0)
    v2 = (F.col("q2") - n2 * m2 * m2) / (n2 - 1.0)
    se2 = v1 / n1 + v2 / n2
    t = (m1 - m2) / F.sqrt(se2)
    df = (se2 * se2) / (
        (v1 / n1) * (v1 / n1) / (n1 - 1.0)
        + (v2 / n2) * (v2 / n2) / (n2 - 1.0)
    )
    ok = (F.col("n1") > 1) & (F.col("n2") > 1) & (se2 > 0)
    return g.select(
        "n1",
        "n2",
        F.round(m1 / 100.0, 6).alias("mean_1"),
        F.round(m2 / 100.0, 6).alias("mean_2"),
        F.round(F.when(ok, t), 6).alias("t_stat"),
        F.round(F.when(ok, df), 6).alias("welch_df"),
    )


def q_doc_quality_logreg_fairness(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Group-fairness audit of the trained classifier (operators/
    logreg.py logreg_scores): per SOURCE group — positive-prediction
    rate (z > 0, the exact threshold), TPR, FPR, and the disparate-
    impact ratio vs the best group's rate (the four-fifths-rule
    metric). The governance pass every deployed classifier needs next
    to eval/calibration/AUC; groups with no positives/negatives emit
    NULL rates (ANSI-safe), one group-granularity agg after the scoring
    expressions."""
    from clinical_vector_search_spark.functions import text as TXT
    from clinical_vector_search_spark.operators.logreg import (
        logreg_scores,
        logreg_train,
    )

    docs = _docs(spark, sf_dir)
    ntok = TXT.token_count("text").cast("double")
    feats = docs.select(
        "source",
        (F.col("lang").eqNullSafe(F.lit("en"))).alias("is_en"),
        ntok.alias("n_tokens"),
        (
            F.col("n_chars").cast("double")
            / F.greatest(ntok, F.lit(1.0))
        ).alias("mean_tok_len"),
        TXT.stopword_ratio(TXT.tokenize("text")).alias("stopword_ratio"),
    )
    cols = ["n_tokens", "mean_tok_len", "stopword_ratio"]
    w = logreg_train(feats, cols, F.col("is_en"), lr=1.0, n_iter=5)
    scored = logreg_scores(
        feats, cols, F.col("is_en"), w, extra_cols=["source"]
    )
    pred = (F.col("z") > 0).cast("long")
    y = F.col("y")
    per = scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(pred).alias("n_pos_pred"),
        F.sum(pred * y).alias("tp"),
        F.sum(pred * (1.0 - y)).alias("fp"),
        F.sum(y).alias("n_pos"),
        F.sum(1.0 - y).alias("n_neg"),
    )
    rate = F.col("n_pos_pred").cast("double") / F.col("n")
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return per.select(
        "source",
        "n",
        F.round(rate, 6).alias("pos_pred_rate"),
        F.round(
            F.when(F.col("n_pos") > 0, F.col("tp") / F.col("n_pos")), 6
        ).alias("tpr"),
        F.round(
            F.when(F.col("n_neg") > 0, F.col("fp") / F.col("n_neg")), 6
        ).alias("fpr"),
        # all-zero rates (a model that predicts no positives anywhere)
        # have no reference group — NULL, not a 0/0
        F.round(
            F.when(F.max(rate).over(wt) > 0, rate / F.max(rate).over(wt)),
            6,
        ).alias("disparate_impact"),
    )


def q_events_trend_mk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test + Theil-Sen slope over daily
    counts (operators/stats.py mann_kendall_trend): S is an exact
    integer sign sum, variance tie-corrected closed form, slope the
    median of pairwise slopes — the fact table collapses to day
    granularity FIRST so the O(days²) pair join is over the tiny
    series. The robust complement of rel_order_trend's least-squares
    fit."""
    from clinical_vector_search_spark.operators.stats import (
        mann_kendall_trend,
    )

    return mann_kendall_trend(_events(spark, sf_dir))


def q_events_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's τ-b between the daily event count and daily revenue
    (exact cents) — concordance as EXACT integer pair counts with the
    tie-corrected denominator √((n₀−t_x)(n₀−t_y)); the ordinal third of
    the correlation trio (Pearson F.corr, Spearman ranks, Kendall
    pairs). Day-granularity collapse FIRST (the mann_kendall/acf
    discipline), so the O(days²) pair join is over the tiny series and
    every count is engine-exact; only the final ratio is float (6dp)."""
    e = _events(spark, sf_dir)
    daily = e.groupBy(
        F.expr("ts_ns div 86400000000000").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("x"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("y"),
    )
    a = daily.select(
        F.col("day").alias("di"), F.col("x").alias("xi"), F.col("y").alias("yi")
    )
    b = daily.select(
        F.col("day").alias("dj"), F.col("x").alias("xj"), F.col("y").alias("yj")
    )
    p = a.join(b, F.col("di") < F.col("dj"))
    sx = F.signum((F.col("xj") - F.col("xi")).cast("double")).cast("long")
    sy = F.signum((F.col("yj") - F.col("yi")).cast("double")).cast("long")
    agg = p.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum(sx * sy).alias("s"),
        F.sum(F.when(sx == 0, 1).otherwise(0)).alias("tx"),
        F.sum(F.when(sy == 0, 1).otherwise(0)).alias("ty"),
    )
    denom = F.sqrt(
        (F.col("n0") - F.col("tx")).cast("double")
        * (F.col("n0") - F.col("ty")).cast("double")
    )
    return agg.select(
        "n0",
        "s",
        "tx",
        "ty",
        F.round(
            F.when(denom > 0, F.col("s").cast("double") / denom), 6
        ).alias("tau_b"),
    )


def q_doc_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit (Sweeney 2002 / Machanavajjhala
    2007) over the (lang, source) quasi-identifier: group sizes, the
    distinct-sensitive-value count (n_chars decile standing in for the
    sensitive attribute), and the k<5 / l<2 violation flags — the
    privacy screen a release pipeline runs before publishing, and the
    re-identification complement of text_redact_pii (PII removal
    doesn't help if the quasi-identifier itself isolates a row). ONE
    aggregation at equivalence-class granularity; every statistic an
    exact integer."""
    docs = _docs(spark, sf_dir)
    # integer floor-div (the cast-direction convention)
    sens = F.expr("least((n_chars * 10) div 4000, 9)")
    return (
        docs.groupBy(
            F.coalesce(F.col("lang"), F.lit("?")).alias("lang"),
            F.coalesce(F.col("source"), F.lit("?")).alias("source"),
        )
        .agg(
            F.count(F.lit(1)).alias("class_size"),
            F.countDistinct(sens).alias("l_distinct"),
        )
        .select(
            "lang",
            "source",
            "class_size",
            "l_distinct",
            (F.col("class_size") < 5).cast("int").alias("k_violation"),
            (F.col("l_distinct") < 2).cast("int").alias("l_violation"),
        )
    )


def q_events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: for users whose first purchase
    follows a view, the view→purchase latency in EXACT integer
    milliseconds, summarized as the n/p25/p50/p75/p90 row every funnel
    dashboard shows next to the conversion rate (events_funnel counts
    WHO converts; this measures HOW LONG it takes). One user-key agg
    (min view ts, min later purchase ts), then exact percentiles at
    converting-user granularity — the events_quantiles convention, with
    the percentile_approx swap documented there for 10⁹-user shapes."""
    e = _events(spark, sf_dir)
    per = e.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "view", F.col("ts_ns"))
        ).alias("first_view"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts_ns"))
        ).alias("first_purchase"),
    )
    conv = per.filter(
        F.col("first_view").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") > F.col("first_view"))
    ).select(
        F.expr(
            "(first_purchase - first_view) div 1000000"
        ).alias("latency_ms")
    )
    return conv.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.percentile("latency_ms", F.lit(0.25)).alias("p25_ms"),
        F.percentile("latency_ms", F.lit(0.5)).alias("p50_ms"),
        F.percentile("latency_ms", F.lit(0.75)).alias("p75_ms"),
        F.percentile("latency_ms", F.lit(0.9)).alias("p90_ms"),
    )


def q_events_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic customer-value grid: per user,
    Recency (days since last event, exact integer floor-div), Frequency
    (event count), Monetary (exact cents); each scored 1–5 by ntile
    over the TOTAL order (metric, user_id) so both engines bin ties
    identically (the woe_iv convention; R ntile ascends on recency so
    score 1 = most recent — documented, the grid is what matters).
    Output: per RFM segment code, user count and mean monetary. One
    user-key agg, three bounded windows at user granularity, one
    segment-granularity rollup."""
    e = _events(spark, sf_dir)
    cents = F.round(F.col("value") * 100, 0).cast("long")
    mx = e.agg(F.max("ts_ns").alias("mx_ns"))
    per = (
        e.crossJoin(F.broadcast(mx))
        .groupBy("user_id")
        .agg(
            F.expr(
                "(max(mx_ns) - max(ts_ns)) div 86400000000000"
            ).alias("recency_d"),
            F.count(F.lit(1)).alias("freq"),
            F.sum(cents).alias("monetary_c"),
        )
    )
    scored = per.select(
        "user_id",
        "monetary_c",
        F.ntile(5)
        .over(Window.orderBy("recency_d", "user_id"))
        .alias("r_score"),
        F.ntile(5)
        .over(Window.orderBy("freq", "user_id"))
        .alias("f_score"),
        F.ntile(5)
        .over(Window.orderBy("monetary_c", "user_id"))
        .alias("m_score"),
    )
    return (
        scored.groupBy(
            (
                F.col("r_score") * 100
                + F.col("f_score") * 10
                + F.col("m_score")
            ).alias("rfm_segment")
        )
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(
                F.avg(F.col("monetary_c").cast("double")) / 100.0, 6
            ).alias("mean_monetary"),
        )
    )


def q_events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves — cumulative revenue per user by signup cohort
    and user age: the growth-accounting complement of events_retention
    (retention counts WHO returns; LTV accumulates what they're WORTH).
    Cohort = first-seen week, age = whole weeks since (both exact
    integer floor-div on epoch-ns); revenue in exact cents; the curve
    is an integer window cumsum over age WITHIN each cohort, divided by
    the cohort's size only in the rounded output. One user agg + one
    (cohort, age) agg + a cohort-partitioned window."""
    e = _events(spark, sf_dir)
    week = 7 * 86_400_000_000_000
    first = e.groupBy("user_id").agg(
        F.expr(f"min(ts_ns) div {week}").alias("cohort_w")
    )
    cents = F.round(F.col("value") * 100, 0).cast("long")
    rev = (
        e.join(first, "user_id")
        .groupBy(
            "cohort_w",
            F.expr(f"(ts_ns div {week})").alias("abs_w"),
        )
        .agg(F.sum(cents).alias("rev_c"))
        .select(
            "cohort_w",
            (F.col("abs_w") - F.col("cohort_w")).alias("age_w"),
            "rev_c",
        )
    )
    size = first.groupBy("cohort_w").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    w = Window.partitionBy("cohort_w").orderBy("age_w").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        rev.join(F.broadcast(size), "cohort_w")
        .select(
            "cohort_w",
            "age_w",
            "n_users",
            F.sum("rev_c").over(w).alias("cum_rev_c"),
        )
        .select(
            "cohort_w",
            "age_w",
            "n_users",
            F.round(
                F.col("cum_rev_c").cast("double")
                / F.col("n_users")
                / 100.0,
                6,
            ).alias("ltv_per_user"),
        )
    )


def q_events_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands over the daily count series: 7-day trailing mean
    ± 2σ with the rolling moments kept as EXACT integer window sums
    (Σy, Σy² over a ROWS frame — the band doubles then derive from
    identical integers through the identical expression in both
    engines, so even the outside-band comparison can't drift); the
    rolling complement of the global z-score outliers
    (events_zscore_outliers) and the volatility reading OHLC doesn't
    give. Requires a full 7-day window (warm-up rows emit NULL bands)."""
    e = _events(spark, sf_dir)
    daily = e.groupBy(
        F.expr("ts_ns div 86400000000000").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    w = Window.orderBy("day").rowsBetween(-6, 0)
    n_w = F.count(F.lit(1)).over(w)
    s = F.sum("y").over(w)
    q = F.sum(F.col("y") * F.col("y")).over(w)
    mean = s.cast("double") / n_w
    sigma = F.sqrt(q.cast("double") / n_w - mean * mean)
    upper = mean + 2.0 * sigma
    lower = mean - 2.0 * sigma
    full = n_w == 7
    return daily.select(
        "day",
        "y",
        F.round(F.when(full, mean), 6).alias("ma7"),
        F.round(F.when(full, upper), 6).alias("upper"),
        F.round(F.when(full, lower), 6).alias("lower"),
        F.when(
            full,
            (
                (F.col("y").cast("double") > upper)
                | (F.col("y").cast("double") < lower)
            ).cast("int"),
        ).alias("outside"),
    )


def q_doc_quality_logreg_gains(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Decile gains/lift table for the trained classifier — the
    targeting artifact next to AUC (AUC summarizes ranking quality; the
    gains table says what acting on the top decile CAPTURES): docs
    ranked by frozen-weight score (6dp-rounded z, doc_id tie-break —
    the total-order ntile convention), per decile the positive count,
    capture share of all positives, cumulative capture, and lift vs the
    base rate. Every count exact; shares rounded 6."""
    from clinical_vector_search_spark.functions import text as TXT
    from clinical_vector_search_spark.operators.logreg import (
        logreg_scores,
        logreg_train,
    )

    docs = _docs(spark, sf_dir)
    ntok = TXT.token_count("text").cast("double")
    feats = docs.select(
        "doc_id",
        (F.col("lang").eqNullSafe(F.lit("en"))).alias("is_en"),
        ntok.alias("n_tokens"),
        (
            F.col("n_chars").cast("double")
            / F.greatest(ntok, F.lit(1.0))
        ).alias("mean_tok_len"),
        TXT.stopword_ratio(TXT.tokenize("text")).alias("stopword_ratio"),
    )
    cols = ["n_tokens", "mean_tok_len", "stopword_ratio"]
    w = logreg_train(feats, cols, F.col("is_en"), lr=1.0, n_iter=5)
    scored = logreg_scores(
        feats, cols, F.col("is_en"), w, extra_cols=["doc_id"]
    ).select("doc_id", "y", F.round("z", 6).alias("z"))
    ranked = scored.withColumn(
        "decile",
        F.ntile(10).over(Window.orderBy(F.desc("z"), F.asc("doc_id"))),
    )
    per = ranked.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").cast("long").alias("n_pos"),
    )
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wc = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot_pos = F.sum("n_pos").over(wt).cast("double")
    tot_n = F.sum("n").over(wt).cast("double")
    base = tot_pos / tot_n
    return per.select(
        "decile",
        "n",
        "n_pos",
        F.round(
            F.when(tot_pos > 0, F.col("n_pos") / tot_pos), 6
        ).alias("capture"),
        F.round(
            F.when(tot_pos > 0, F.sum("n_pos").over(wc) / tot_pos), 6
        ).alias("cum_capture"),
        F.round(
            F.when(base > 0, (F.col("n_pos") / F.col("n")) / base), 6
        ).alias("lift"),
    )


def q_events_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized robust statistics: event values clipped at the exact
    p5/p95 (integer-cent percentiles, the events_quantiles parity
    convention), reporting raw vs winsorized mean/std side by side —
    the outlier-robust preprocessing every metric pipeline applies
    before averaging heavy-tailed values, with the variance shrink
    made visible. Two passes by necessity (the clip bounds ARE
    order statistics); both are single aggregations, the bounds ride
    a broadcast stat frame, and all moments accumulate in exact
    integer cents."""
    e = _events(spark, sf_dir).where(F.col("value").isNotNull())
    cents = F.round(F.col("value") * 100, 0).cast("long")
    vals = e.select(cents.alias("c"))
    bounds = vals.agg(
        F.percentile("c", F.lit(0.05)).alias("lo"),
        F.percentile("c", F.lit(0.95)).alias("hi"),
    )
    clipped = vals.crossJoin(F.broadcast(bounds)).select(
        "c",
        F.least(
            F.greatest(F.col("c").cast("double"), F.col("lo")),
            F.col("hi"),
        ).alias("w"),
    )
    return clipped.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(F.col("c").cast("double")) / 100.0, 6).alias(
            "mean_raw"
        ),
        F.round(F.stddev_pop(F.col("c").cast("double")) / 100.0, 6).alias(
            "std_raw"
        ),
        F.round(F.avg("w") / 100.0, 6).alias("mean_winsorized"),
        F.round(F.stddev_pop("w") / 100.0, 6).alias("std_winsorized"),
    )


def q_doc_balanced_downsample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Balanced class downsampling — the classifier-prep step that
    equalizes class sizes by keeping exactly min-class-count rows per
    class, selected by md5 rank (the repo's deterministic sampling
    convention: same corpus → same sample in any engine, no RNG).
    Classes are lang (NULL folded to '?'); the minority size rides a
    broadcast stat frame, the per-class rank is a window over
    (md5, doc_id) — one class-key shuffle. Output: the kept
    (doc_id, lang) rows plus the per-class rank for audit."""
    docs = _docs(spark, sf_dir).select(
        "doc_id", F.coalesce(F.col("lang"), F.lit("?")).alias("lang")
    )
    min_n = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")
    ).agg(F.min("n").alias("min_n"))
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.concat(F.lit("bal:"), F.col("doc_id").cast("string"))),
        "doc_id",
    )
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .crossJoin(F.broadcast(min_n))
        .filter(F.col("rk") <= F.col("min_n"))
        .select("doc_id", "lang", F.col("rk").cast("int").alias("rk"))
    )


def q_rel_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lower weighted median — the quantity-weighted median unit price
    per returnflag: smallest price whose cumulative weight reaches half
    the total (the definition that needs NO interpolation, so every
    comparison is exact integer cents vs exact integer quantity sums;
    a plain median treats a 1-unit and a 50-unit line the same). One
    (flag, price) aggregation, then cumulative-weight windows at
    distinct-price granularity and a min over qualifying prices."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    qty = F.round(F.col("l_quantity"), 0).cast("long")
    by_p = li.groupBy(
        F.col("l_returnflag").alias("flag"), cents.alias("price_c")
    ).agg(F.sum(qty).alias("w"))
    win = Window.partitionBy("flag").orderBy("price_c").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wt = Window.partitionBy("flag").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = by_p.select(
        "flag",
        "price_c",
        F.sum("w").over(win).alias("cw"),
        F.sum("w").over(wt).alias("tw"),
    )
    return (
        cum.filter(F.col("cw") * 2 >= F.col("tw"))
        .groupBy("flag")
        .agg(
            (F.min("price_c") / F.lit(100.0)).alias("weighted_median"),
            F.max("tw").alias("total_weight"),
        )
    )


def q_rel_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification of parts by revenue — the inventory
    classic (A = parts covering the first 80% of revenue, B = next
    15%, C = tail): revenue in EXACT integer cents, parts ranked by
    (revenue desc, partkey), class boundaries compared as
    cum·100 ≤ total·80 — integer cross-multiplication, no float share
    ever computed, so the class assignment cannot drift. Output per
    class: part count, revenue share (rounded 6), the concentration
    read rel_gini/revenue_concentration give as indices, here as the
    operational grouping."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cents = F.round(
        F.col("l_extendedprice") * (1.0 - F.col("l_discount")) * 100, 0
    ).cast("long")
    per_part = li.groupBy("l_partkey").agg(F.sum(cents).alias("rev_c"))
    w = Window.orderBy(F.desc("rev_c"), "l_partkey").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = per_part.select(
        "rev_c",
        F.sum("rev_c").over(w).alias("cum_c"),
        F.sum("rev_c").over(wt).alias("tot_c"),
    ).select(
        "rev_c",
        "tot_c",
        F.when(
            F.col("cum_c") * 100 <= F.col("tot_c") * 80, "A"
        )
        .when(F.col("cum_c") * 100 <= F.col("tot_c") * 95, "B")
        .otherwise("C")
        .alias("abc"),
    )
    return ranked.groupBy("abc").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(
            F.sum("rev_c").cast("double") / F.max("tot_c"), 6
        ).alias("revenue_share"),
    )


def q_events_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate — the share of single-event sessions per
    session-start day, the engagement KPI the sessionize family feeds:
    same gaps-and-islands session derivation as events_sessionize
    (integer-ns gap compare), sessions collapsed to (start day, n_events)
    then one day-granularity conditional-count agg; rate = exact integer
    counts divided once, rounded 6."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    gap_ns = SESSION_GAP_SEC * 1_000_000_000
    st = e.select(
        "user_id",
        "ts_ns",
        F.sum(
            F.when(
                F.col("ts_ns") - F.lag("ts_ns").over(w) > gap_ns, 1
            ).otherwise(0)
        )
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_seq"),
    )
    sess = st.groupBy("user_id", "session_seq").agg(
        F.expr("min(ts_ns) div 86400000000000").alias("day"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return sess.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0)).alias(
            "n_bounces"
        ),
        F.round(
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
            .cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("bounce_rate"),
    )


def q_events_activation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1/D7 activation — per signup (first-seen) day: the share of new
    users who return on day+1 and within days 1..7, the growth KPI pair
    next to the retention matrix (events_retention is period×cohort;
    activation is the two headline columns product teams actually
    watch). Exact integer epoch-days; per-user flags from ONE (user,
    day) distinct frame joined back to the first day — counts exact,
    one division each, rounded 6."""
    e = _events(spark, sf_dir)
    ud = e.select(
        "user_id", F.expr("ts_ns div 86400000000000").alias("day")
    ).distinct()
    first = ud.groupBy("user_id").agg(F.min("day").alias("d0"))
    flags = (
        ud.join(first, "user_id")
        .groupBy("user_id", "d0")
        .agg(
            F.max(
                F.when(F.col("day") == F.col("d0") + 1, 1).otherwise(0)
            ).alias("d1"),
            F.max(
                F.when(
                    (F.col("day") > F.col("d0"))
                    & (F.col("day") <= F.col("d0") + 7),
                    1,
                ).otherwise(0)
            ).alias("d7"),
        )
    )
    return flags.groupBy(F.col("d0").alias("cohort_day")).agg(
        F.count(F.lit(1)).alias("n_new_users"),
        F.sum("d1").alias("n_d1"),
        F.sum("d7").alias("n_d7"),
        F.round(F.sum("d1").cast("double") / F.count(F.lit(1)), 6).alias(
            "d1_rate"
        ),
        F.round(F.sum("d7").cast("double") / F.count(F.lit(1)), 6).alias(
            "d7_rate"
        ),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # The driver checks only the FIRST ~50 entries, so ordering is a
    # freshness rotation (established r5; re-rotated each round — the
    # r14 VERDICT's task 2 names this r15 order):
    #   1. the THREE entries NEW in r15 (the maintained SemDeDup index:
    #      incremental pair lifecycle, leased retrain-and-reassign, and
    #      the post-reindex pairs backfill) lead;
    #   2. knn_ivfpq_reindex + knn_ivfpq_serve re-enter the window
    #      because r15 CHANGED their contract (residual=True flip, new
    #      oracles, shared fixture) — a changed entry must re-earn its
    #      driver hash regardless of freshness;
    #   3. the 35 remaining last-green-r9 entries (rows-only excluded)
    #      — this RETIRES the r9 tier: after r15 no hash entry's last
    #      driver row predates r10;
    #   4. the 10 stalest last-green-r10 entries fill the window to 50
    #      (the 8 rows-only entries stay ordered OUTSIDE the window,
    #      per the r9 VERDICT's task 7, so every driver row carries
    #      hash evidence);
    #   5. then the remaining blocks stalest-first (r10 remainder, r11,
    #      r12, r13, and the r14 window demoted last). Every entry
    #      below the window was green in its last driver round
    #      (r10-r14) AND in the r14 judge's full 293-entry sweep.
    return {
        # -- r15 window 1-3: NEW in r15 (maintained SemDeDup index) --
        "dedup_semantic_incremental": q_dedup_semantic_incremental,
        "dedup_semantic_reindex": q_dedup_semantic_reindex,
        "dedup_semantic_backfill": q_dedup_semantic_backfill,
        # -- r15 window 4-5: oracle+impl CHANGED in r15 (residual flip of the reindex/serve lifecycle) — re-verify under the new contract --
        "knn_ivfpq_reindex": q_knn_ivfpq_reindex,
        "knn_ivfpq_serve": q_knn_ivfpq_serve,
        # -- r15 window 6-40: the remaining last-green-r9 block (non-rows-only) — retires the r9 tier --
        "text_cms_heavyhitters": q_text_cms_heavyhitters,
        "rel_cube": q_rel_cube,
        "rel_window_ranks": q_rel_window_ranks,
        "rel_local_supplier_volume": q_rel_local_supplier_volume,
        "rel_profile": q_rel_profile,
        "rel_semi_join": q_rel_semi_join,
        "rel_cust_no_orders": q_rel_cust_no_orders,
        "io_partitioned_roundtrip": q_io_partitioned_roundtrip,
        "rel_priority_waiting": q_rel_priority_waiting,
        "rel_nation_profit": q_rel_nation_profit,
        "rel_late_shipments": q_rel_late_shipments,
        "rel_cust_distribution": q_rel_cust_distribution,
        "rel_promo_revenue": q_rel_promo_revenue,
        "rel_supplier_counts": q_rel_supplier_counts,
        "rel_excess_suppliers": q_rel_excess_suppliers,
        "rel_min_cost_supplier": q_rel_min_cost_supplier,
        "rel_market_share": q_rel_market_share,
        "events_mann_whitney": q_events_mann_whitney,
        "events_chi_square": q_events_chi_square,
        "graph_bfs": q_graph_bfs,
        "events_bradley_terry": q_events_bradley_terry,
        "doc_quality_logreg_auc": q_doc_quality_logreg_auc,
        "text_readability": q_text_readability,
        "text_textrank": q_text_textrank,
        "rel_sorted_neighborhood": q_rel_sorted_neighborhood,
        "events_range_window": q_events_range_window,
        "rel_skyline": q_rel_skyline,
        "events_cumulative_uniques": q_events_cumulative_uniques,
        "events_churn_labels": q_events_churn_labels,
        "events_session_anomaly": q_events_session_anomaly,
        "rel_merge_upsert": q_rel_merge_upsert,
        "io_python_streamsource": q_io_python_streamsource,
        "graph_communities": q_graph_communities,
        "text_trigram_search": q_text_trigram_search,
        "events_forecast_backtest": q_events_forecast_backtest,
        # -- r15 window 41-50: stalest last-green-r10 entries --
        "events_scd2_incremental": q_events_scd2_incremental,
        "rel_skyline_prefiltered": q_rel_skyline_prefiltered,
        "rel_entity_resolution": q_rel_entity_resolution,
        "events_cuped": q_events_cuped,
        "graph_ppr": q_graph_ppr,
        "events_did": q_events_did,
        "events_log_rank": q_events_log_rank,
        "rel_incremental_join": q_rel_incremental_join,
        "doc_neyman_allocation": q_doc_neyman_allocation,
        "text_spearman": q_text_spearman,
        # -- below the window: the 8 rows-only entries stay ordered OUTSIDE it (anchored by oracle-hashed twins/pytests — tools/check_correctness.py ROWS_ONLY_TWINS) --
        "events_distinct_hll": q_events_distinct_hll,
        "rag_hybrid_mmr": q_rag_hybrid_mmr,
        "knn_ivf": q_knn_ivf,
        "evaluation_table": q_evaluation_table,
        "text_bpe_encode": q_text_bpe_encode,
        "text_bpe_train": q_text_bpe_train,
        "knn_ivfpq": q_knn_ivfpq,
        "vec_pca": q_vec_pca,
        # -- last-green-r10 remainder, stalest-first --
        "events_ks_test": q_events_ks_test,
        "events_cramers_v": q_events_cramers_v,
        "events_anova": q_events_anova,
        "events_welch_t": q_events_welch_t,
        "doc_quality_logreg_fairness": q_doc_quality_logreg_fairness,
        "events_trend_mk": q_events_trend_mk,
        "events_kendall_tau": q_events_kendall_tau,
        "doc_k_anonymity": q_doc_k_anonymity,
        "events_time_to_convert": q_events_time_to_convert,
        "events_rfm": q_events_rfm,
        "events_cohort_ltv": q_events_cohort_ltv,
        "events_bollinger": q_events_bollinger,
        "doc_quality_logreg_gains": q_doc_quality_logreg_gains,
        "events_winsorized": q_events_winsorized,
        "doc_balanced_downsample": q_doc_balanced_downsample,
        "rel_weighted_median": q_rel_weighted_median,
        "rel_abc_analysis": q_rel_abc_analysis,
        "events_bounce_rate": q_events_bounce_rate,
        "events_activation": q_events_activation,
        "dedup_minhash_incremental": q_dedup_minhash_incremental,
        "dedup_groups_incremental": q_dedup_groups_incremental,
        "dedup_streaming_neardup": q_dedup_streaming_neardup,
        "rel_shipping_priority": q_rel_shipping_priority,
        "multimodal_features": q_multimodal_features,
        "evaluation_metrics": q_evaluation_metrics,
        "dedup_groups": q_dedup_groups,
        "salted_join": q_salted_join,
        "text_chunk_windows": q_text_chunk_windows,
        "text_tfidf_topterms": q_text_tfidf_topterms,
        "vec_quantize_int8": q_vec_quantize_int8,
        "vec_mean_pool": q_vec_mean_pool,
        "io_orc_roundtrip": q_io_orc_roundtrip,
        "rel_pricing_summary": q_rel_pricing_summary,
        "rel_nation_rollup": q_rel_nation_rollup,
        "rel_window_running": q_rel_window_running,
        "rel_rollup": q_rel_rollup,
        "rel_pivot": q_rel_pivot,
        "knn_exact": q_knn_exact,
        "knn_window": q_knn_window,
        "bm25_okapi": q_bm25_okapi,
        # -- last-green-r11 remainder, stalest-first --
        "knn_ivfpq_index_add": q_knn_ivfpq_index_add,
        "bm25_incremental": q_bm25_incremental,
        "bm25_incremental_delete": q_bm25_incremental_delete,
        "knn_ivfpq_index_search": q_knn_ivfpq_index_search,
        "embed_hash_features": q_embed_hash_features,
        "metrics_eval": q_metrics_eval,
        "set_overlap": q_set_overlap,
        "vec_norm_checkpoints": q_vec_norm_checkpoints,
        "vec_dot_cosine": q_vec_dot_cosine,
        "vec_dp_noise": q_vec_dp_noise,
        "vec_weighted_concat": q_vec_weighted_concat,
        "vec_random_projection": q_vec_random_projection,
        "doc_hash_sample": q_doc_hash_sample,
        "doc_clean_snippet": q_doc_clean_snippet,
        "doc_specialty_concat": q_doc_specialty_concat,
        "doc_attr_sentence": q_doc_attr_sentence,
        "doc_lang_stats": q_doc_lang_stats,
        "doc_exact_dedup": q_doc_exact_dedup,
        "text_stats": q_text_stats,
        "text_quality": q_text_quality,
        "text_fingerprint": q_text_fingerprint,
        "text_lang_id": q_text_lang_id,
        "text_redact_pii": q_text_redact_pii,
        "text_bpe_tokens": q_text_bpe_tokens,
        "doc_weighted_sample": q_doc_weighted_sample,
        "text_normalize": q_text_normalize,
        "doc_pack_sequences": q_doc_pack_sequences,
        "events_decayed": q_events_decayed,
        "dedup_simhash_pairs": q_dedup_simhash_pairs,
        "io_compact_roundtrip": q_io_compact_roundtrip,
        "dedup_groups_star": q_dedup_groups_star,
        "io_zorder_key": q_io_zorder_key,
        "ids_dense_rows": q_ids_dense_rows,
        "dedup_incremental": q_dedup_incremental,
        "doc_mixture_sample": q_doc_mixture_sample,
        "dedup_spans": q_dedup_spans,
        "events_funnel": q_events_funnel,
        "events_retention": q_events_retention,
        "events_scd2": q_events_scd2,
        "events_histogram": q_events_histogram,
        "text_bigram_lm": q_text_bigram_lm,
        "dedup_repeated_windows": q_dedup_repeated_windows,
        "io_dataset_fingerprint": q_io_dataset_fingerprint,
        "dedup_semantic": q_dedup_semantic,
        "dedup_semantic_pairs": q_dedup_semantic_pairs,
        "events_sessionize_auto": q_events_sessionize_auto,
        "events_scd2_merge": q_events_scd2_merge,
        "doc_decontaminate_bloom": q_doc_decontaminate_bloom,
        "doc_topk_per_source": q_doc_topk_per_source,
        "doc_prep_pipeline": q_doc_prep_pipeline,
        # -- last-green-r12 remainder, stalest-first --
        "knn_ivfpq_index_refine": q_knn_ivfpq_index_refine,
        "events_zscore_outliers": q_events_zscore_outliers,
        "doc_split_assign": q_doc_split_assign,
        "rel_integrity_audit": q_rel_integrity_audit,
        "events_window_topk": q_events_window_topk,
        "text_cdc_chunks": q_text_cdc_chunks,
        "events_asof_nearest": q_events_asof_nearest,
        "text_ppl_buckets": q_text_ppl_buckets,
        "rel_big_spenders": q_rel_big_spenders,
        "io_schema_evolution": q_io_schema_evolution,
        "rel_name_match": q_rel_name_match,
        "rel_returned_items": q_rel_returned_items,
        "multimodal_resize": q_multimodal_resize,
        "multimodal_framesample": q_multimodal_framesample,
        "rel_sql_interface": q_rel_sql_interface,
        "io_python_datasource": q_io_python_datasource,
        "events_weighted_avg_udaf": q_events_weighted_avg_udaf,
        "knn_range_search": q_knn_range_search,
        "text_lang_confusion": q_text_lang_confusion,
        "rel_numeric_profile": q_rel_numeric_profile,
        "dedup_cdc_chunks": q_dedup_cdc_chunks,
        "doc_filter_audit": q_doc_filter_audit,
        "knn_ivf_fullprobe": q_knn_ivf_fullprobe,
        "knn_lsh": q_knn_lsh,
        "fhe_pipeline": q_fhe_pipeline,
        "dedup_minhash_sigs": q_dedup_minhash_sigs,
        "dedup_simhash": q_dedup_simhash,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_embedding_neardup": q_dedup_embedding_neardup,
        "mmr_lambda1": q_mmr_lambda1,
        "rag_union_candidates": q_rag_union_candidates,
        "doc_pipeline": q_doc_pipeline,
        "events_asof_join": q_events_asof_join,
        "events_streaming_outer_join": q_events_streaming_outer_join,
        "events_streaming_full_outer_join": q_events_streaming_full_outer_join,
        "dedup_semantic_pd": q_dedup_semantic_pd,
        "events_resample_gapfill": q_events_resample_gapfill,
        "events_attribution": q_events_attribution,
        "retrieval_tfidf": q_retrieval_tfidf,
        "dedup_semantic_pairs_salted": q_dedup_semantic_pairs_salted,
        "text_pmi_pairs": q_text_pmi_pairs,
        "events_session_paths": q_events_session_paths,
        "events_psi_drift": q_events_psi_drift,
        "events_streaming_scd2_enrich": q_events_streaming_scd2_enrich,
        "dedup_jaccard_prefix": q_dedup_jaccard_prefix,
        "events_time_weighted": q_events_time_weighted,
        "rel_order_trend": q_rel_order_trend,
        "text_distinctive_terms": q_text_distinctive_terms,
        "io_shard_manifest": q_io_shard_manifest,
        "rel_bloom_join": q_rel_bloom_join,
        # -- last-green-r13 remainder, stalest-first --
        "tfidf_incremental": q_tfidf_incremental,
        "dedup_soft_weights": q_dedup_soft_weights,
        "text_zipf_fit": q_text_zipf_fit,
        "events_ohlc": q_events_ohlc,
        "knn_pq_refine": q_knn_pq_refine,
        "events_streaming_chained_agg": q_events_streaming_chained_agg,
        "io_python_datasink": q_io_python_datasink,
        "io_snapshot_diff": q_io_snapshot_diff,
        "multimodal_phash": q_multimodal_phash,
        "rel_window_distribution": q_rel_window_distribution,
        "rel_grouping_sets": q_rel_grouping_sets,
        "rel_unpivot": q_rel_unpivot,
        "dedup_pagerank": q_dedup_pagerank,
        "text_bpe_pair_counts": q_text_bpe_pair_counts,
        "events_variant_extract": q_events_variant_extract,
        "events_bootstrap_ci": q_events_bootstrap_ci,
        "rel_incremental_agg": q_rel_incremental_agg,
        "events_mad_outliers": q_events_mad_outliers,
        "events_json_deadletter": q_events_json_deadletter,
        "knn_matryoshka": q_knn_matryoshka,
        "retrieval_hard_negatives": q_retrieval_hard_negatives,
        "evaluation_kappa": q_evaluation_kappa,
        "events_value_runs": q_events_value_runs,
        "dedup_minhash_estimate": q_dedup_minhash_estimate,
        "text_token_dropout": q_text_token_dropout,
        "events_session_stats": q_events_session_stats,
        "doc_ngram_novelty": q_doc_ngram_novelty,
        "events_dau_wau": q_events_dau_wau,
        "events_markov_transitions": q_events_markov_transitions,
        "events_power_users": q_events_power_users,
        "io_wap_publish": q_io_wap_publish,
        "events_tumbling": q_events_tumbling,
        "events_sliding": q_events_sliding,
        "events_kaplan_meier": q_events_kaplan_meier,
        "events_acf": q_events_acf,
        "events_ab_test": q_events_ab_test,
        "rel_ols_normal": q_rel_ols_normal,
        "rel_benford": q_rel_benford,
        "doc_woe_iv": q_doc_woe_iv,
        "vec_binary_sign": q_vec_binary_sign,
        "knn_hamming_rerank": q_knn_hamming_rerank,
        "doc_domain_mixture": q_doc_domain_mixture,
        "rel_disjunctive_join": q_rel_disjunctive_join,
        "rel_idle_customers": q_rel_idle_customers,
        "rel_small_qty_revenue": q_rel_small_qty_revenue,
        "rel_blame_suppliers": q_rel_blame_suppliers,
        "rel_top_supplier": q_rel_top_supplier,
        "rel_volume_shipping": q_rel_volume_shipping,
        "rel_basket_pairs": q_rel_basket_pairs,
        "graph_triangles": q_graph_triangles,
        # -- last-green-r14 remainder, stalest-first --
        "dedup_soft_sample": q_dedup_soft_sample,
        "retrieval_trigram_incremental": q_retrieval_trigram_incremental,
        "events_seasonal_index": q_events_seasonal_index,
        "events_seasonal_outliers": q_events_seasonal_outliers,
        "events_ewma": q_events_ewma,
        "events_cusum": q_events_cusum,
        "rel_revenue_concentration": q_rel_revenue_concentration,
        "rel_gini": q_rel_gini,
        "text_winnowing": q_text_winnowing,
        "dedup_winnowing_pairs": q_dedup_winnowing_pairs,
        "dedup_containment": q_dedup_containment,
        "events_hll_overlap": q_events_hll_overlap,
        "rag_query_expansion": q_rag_query_expansion,
        "text_heaps_fit": q_text_heaps_fit,
        "graph_kcore": q_graph_kcore,
        "events_scd2_asof_features": q_events_scd2_asof_features,
        "doc_url_dedup": q_doc_url_dedup,
        "events_user_split": q_events_user_split,
        "doc_dsir_weights": q_doc_dsir_weights,
        "doc_quality_logreg": q_doc_quality_logreg,
        "doc_dsir_resample": q_doc_dsir_resample,
        "doc_quality_logreg_eval": q_doc_quality_logreg_eval,
        "doc_quality_logreg_calibration": q_doc_quality_logreg_calibration,
        "events_time_split": q_events_time_split,
        "events_sessionize": q_events_sessionize,
        "events_quantiles": q_events_quantiles,
        "events_distinct_users": q_events_distinct_users,
        "events_range_join": q_events_range_join,
        "events_json_extract": q_events_json_extract,
        "events_streaming_tumbling": q_events_streaming_tumbling,
        "events_streaming_join": q_events_streaming_join,
        "events_streaming_dedup": q_events_streaming_dedup,
        "salted_agg": q_salted_agg,
        "knn_ivfpq_fullprobe": q_knn_ivfpq_fullprobe,
        "rag_mmr_rounded": q_rag_mmr_rounded,
        "rag_rrf": q_rag_rrf,
        "events_streaming_sessionize": q_events_streaming_sessionize,
        "events_streaming_enrich": q_events_streaming_enrich,
        "events_streaming_user_totals": q_events_streaming_user_totals,
        "events_sessionize_skew": q_events_sessionize_skew,
        "events_asof_forward": q_events_asof_forward,
        "knn_pq_adc": q_knn_pq_adc,
        "vec_pq_codes": q_vec_pq_codes,
        "knn_exact_l2": q_knn_exact_l2,
        "doc_stratified_sample": q_doc_stratified_sample,
        "doc_decontaminate": q_doc_decontaminate,
        "dedup_survivors": q_dedup_survivors,
        "text_repetition": q_text_repetition,
    }

# ---------------------------------------------------------------------------
# DuckDB oracle SQL
# ---------------------------------------------------------------------------

# shared CTE fragments
_TOKS = (
    "SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),"
    " t -> t <> '') AS tokens FROM documents"
)
_MD5L = "('0x' || substr(md5({x}), 1, 15))::BIGINT"
_NORMALIZE = (
    "list_transform({v}, x -> x / (sqrt(list_dot_product({v}, {v})) + 1e-9))"
)
_COS = (
    "list_dot_product({a}, {b}) / ((sqrt(list_dot_product({a}, {a})) + 1e-9)"
    " * (sqrt(list_dot_product({b}, {b})) + 1e-9))"
)
_SHINGLES = f"""
    SELECT doc_id, unnest(
        CASE WHEN len(tokens) >= {SHINGLE_N}
             THEN list_distinct([array_to_string(tokens[i:i+{SHINGLE_N - 1}], ' ')
                                 FOR i IN range(1, len(tokens) - {SHINGLE_N - 2})])
             ELSE []::VARCHAR[] END) AS shingle
    FROM toks
"""

_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in _STOPWORDS) + "]"


def _lang_markers_sql(lang: str) -> str:
    from clinical_vector_search_spark.functions.text import LANG_MARKERS

    return "[" + ", ".join(f"'{w}'" for w in LANG_MARKERS[lang]) + "]"


def _sign_word_sql(w: int, vec: str = "v", word_bits: int = 32) -> str:
    """DuckDB twin of functions/vector.py sign_pack for one word: the MSB-
    first fold acc*2+bit unrolled as a sum of power-of-two CASE terms —
    exact BIGINT math, identical to Spark's long fold for 32-bit words."""
    terms = " + ".join(
        f"CASE WHEN {vec}[{w * word_bits + j + 1}] > 0"
        f" THEN {1 << (word_bits - 1 - j)} ELSE 0 END"
        for j in range(word_bits)
    )
    return f"({terms})::BIGINT"


def oracle_sql() -> dict[str, str]:
    s: dict[str, str] = {}

    s["vec_binary_sign"] = f"""
        WITH d AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        p AS (SELECT vec_id,
                     {_sign_word_sql(0)} AS word0,
                     {_sign_word_sql(1)} AS word1
              FROM d)
        SELECT vec_id, word0, word1,
               (bit_count(word0) + bit_count(word1))::BIGINT AS n_bits_set
        FROM p
    """

    s["rel_disjunctive_join"] = """
        SELECT p_brand, count(*) AS n_lines,
               round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#5' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 15)
           OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 20
               AND l_quantity BETWEEN 10 AND 25)
           OR (p_brand = 'Brand#25' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 20 AND 35)
        GROUP BY p_brand
    """

    s["rel_idle_customers"] = """
        WITH t AS (SELECT round(avg(c_acctbal), 2) AS avg_bal
                   FROM customer WHERE c_acctbal > 0)
        SELECT n_name, count(*) AS n_customers,
               round(sum(c_acctbal), 2) AS total_bal
        FROM customer, t
        JOIN nation ON c_nationkey = n_nationkey
        WHERE c_acctbal > t.avg_bal
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '2000-10-01')
        GROUP BY n_name
    """

    s["rel_small_qty_revenue"] = """
        WITH lp AS (
            SELECT l_partkey, l_quantity, l_extendedprice
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand = 'Brand#5'
        ),
        t AS (
            SELECT l_partkey, round(0.2 * avg(l_quantity), 6) AS qty_thr
            FROM lp GROUP BY l_partkey
        )
        SELECT count(*)::BIGINT AS n_lines,
               round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lp JOIN t USING (l_partkey)
        WHERE l_quantity < qty_thr
    """

    s["rel_blame_suppliers"] = """
        WITH per_order AS (
            SELECT l_orderkey,
                   count(DISTINCT l_suppkey) AS n_supp,
                   count(DISTINCT CASE WHEN l_returnflag = 'R'
                                       THEN l_suppkey END) AS n_ret_supp,
                   max(CASE WHEN l_returnflag = 'R'
                            THEN l_suppkey END) AS blamed_suppkey
            FROM lineitem GROUP BY l_orderkey
        )
        SELECT s_name, n_name, count(*)::BIGINT AS numwait
        FROM per_order
        JOIN supplier ON blamed_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_supp >= 2 AND n_ret_supp = 1
        GROUP BY s_name, n_name
        HAVING count(*) >= 1
    """

    s["rel_top_supplier"] = """
        WITH rev AS (
            SELECT l_suppkey,
                   round(sum(l_extendedprice * (1.0 - l_discount)), 2)
                       AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey::BIGINT AS s_suppkey, s_name, total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """

    s["rel_volume_shipping"] = """
        SELECT sn.n_name AS supp_nation,
               cn.n_name AS cust_nation,
               year(l_shipdate)::BIGINT AS l_year,
               round(sum(l_extendedprice * (1.0 - l_discount)), 2)
                   AS revenue,
               count(*)::BIGINT AS n_lines
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        WHERE sn.n_name IN ('NATION_1', 'NATION_2')
          AND cn.n_name IN ('NATION_1', 'NATION_2')
          AND sn.n_name <> cn.n_name
        GROUP BY 1, 2, 3
    """

    s["rel_basket_pairs"] = """
        WITH ob AS (
            SELECT DISTINCT l_orderkey AS basket, p_brand AS item
            FROM lineitem JOIN part ON l_partkey = p_partkey
        ),
        supp AS (SELECT item, count(*)::BIGINT AS supp
                 FROM ob GROUP BY item),
        nb AS (SELECT count(DISTINCT basket)::BIGINT AS n_baskets FROM ob),
        pairs AS (
            SELECT a.item AS item_a, b.item AS item_b,
                   count(*)::BIGINT AS pair_n
            FROM ob a JOIN ob b
              ON a.basket = b.basket AND a.item < b.item
            GROUP BY 1, 2
            HAVING count(*) >= 20
        )
        SELECT item_a, item_b, pair_n,
               sa.supp AS supp_a, sb.supp AS supp_b,
               round(pair_n * n_baskets
                     / (sa.supp * sb.supp)::DOUBLE, 6) AS lift
        FROM pairs
        JOIN supp sa ON sa.item = item_a
        JOIN supp sb ON sb.item = item_b
        CROSS JOIN nb
    """

    s["graph_triangles"] = """
        WITH ob AS (
            SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        ),
        e AS (
            SELECT a.p AS u, b.p AS v
            FROM ob a JOIN ob b ON a.o = b.o AND a.p < b.p
            GROUP BY 1, 2
            HAVING count(*) >= 2
        ),
        tri AS (
            SELECT e1.u AS a, e1.v AS b, e2.v AS c
            FROM e e1
            JOIN e e2 ON e2.u = e1.u AND e1.v < e2.v
            JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
        ),
        corners AS (
            SELECT a AS node FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri
        )
        SELECT node::BIGINT AS node, count(*)::BIGINT AS n_triangles
        FROM corners GROUP BY node
    """

    s["doc_domain_mixture"] = r"""
        WITH per AS (
            SELECT source, count(*) AS n_docs,
                   sum(len(list_filter(
                       regexp_split_to_array(lower(trim(text)), '\s+'),
                       t -> t <> '')))::BIGINT AS n_tokens
            FROM documents GROUP BY source
        ),
        w AS (SELECT source, n_docs, n_tokens,
                     sqrt(n_tokens::DOUBLE) AS w_raw
              FROM per)
        SELECT source, n_docs, n_tokens,
               round(w_raw / sum(w_raw) OVER (), 6) AS mix_weight,
               round((w_raw / sum(w_raw) OVER ())
                     * (sum(n_tokens) OVER ())::DOUBLE / n_tokens, 6)
                   AS effective_epochs
        FROM w
    """

    _norm_v = _NORMALIZE.format(v="v")
    s["knn_hamming_rerank"] = f"""
        WITH d AS (SELECT vec_id AS doc_id, embedding::DOUBLE[] AS v
                   FROM embeddings),
        n AS (SELECT doc_id, {_norm_v} AS nv FROM d),
        c AS (SELECT doc_id,
                     {_sign_word_sql(0)} AS c0,
                     {_sign_word_sql(1)} AS c1
              FROM d),
        q AS (SELECT doc_id AS query_id, c0 AS q0, c1 AS q1 FROM c
              WHERE doc_id < {KNN_NQ}),
        h AS (SELECT query_id, c.doc_id,
                     (bit_count(xor(c0, q0)) + bit_count(xor(c1, q1)))::BIGINT
                         AS hamming
              FROM c CROSS JOIN q),
        cand AS (SELECT query_id, doc_id, hamming,
                        row_number() OVER (PARTITION BY query_id
                                           ORDER BY hamming, doc_id) AS crank
                 FROM h),
        resc AS (SELECT cand.query_id, cand.doc_id, cand.hamming,
                        list_dot_product(qn.nv, dn.nv) AS score
                 FROM cand
                 JOIN n dn ON dn.doc_id = cand.doc_id
                 JOIN n qn ON qn.doc_id = cand.query_id
                 WHERE cand.crank <= 60),
        r AS (SELECT query_id, doc_id, hamming, score,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY score DESC, doc_id) AS rank
              FROM resc)
        SELECT query_id, rank, doc_id, hamming, round(score, 6) AS score
        FROM r WHERE rank <= {KNN_K}
    """

    s["rel_pricing_summary"] = """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
               round(avg(l_quantity), 6) AS avg_qty,
               count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """

    s["rel_nation_rollup"] = """
        SELECT n_name, count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total_price,
               round(avg(o_totalprice), 4) AS avg_price
        FROM orders JOIN customer ON o_custkey = c_custkey
                    JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """

    s["doc_clean_snippet"] = r"""
        SELECT doc_id,
               substr(replace(trim(regexp_replace(text, '\s+', ' ', 'g')),
                              chr(10), ' '), 1, 100) AS snip
        FROM documents
    """

    s["doc_specialty_concat"] = """
        SELECT doc_id,
               substr(CASE WHEN lang IS NOT NULL
                           THEN lang || ', ' || text ELSE text END, 1, 80) AS aug
        FROM documents
    """

    s["doc_attr_sentence"] = """
        SELECT doc_id, concat_ws(' ', lang, source) AS attr_text FROM documents
    """

    s["doc_lang_stats"] = """
        SELECT lang, count(*) AS n_docs, round(avg(n_chars), 6) AS avg_chars
        FROM documents WHERE text IS NOT NULL GROUP BY lang
    """

    s["doc_exact_dedup"] = """
        SELECT min(doc_id) AS doc_id, md5(text) AS text_hash,
               count(*) AS dup_count
        FROM documents GROUP BY md5(text)
    """

    s["text_stats"] = rf"""
        WITH toks AS ({_TOKS})
        SELECT d.doc_id,
               len(t.tokens)::BIGINT AS n_tokens,
               round(length(regexp_replace(lower(d.text), '[a-z0-9 ]', '', 'g'))::DOUBLE
                     / greatest(length(d.text), 1), 6) AS punct_ratio,
               round(len(list_filter(t.tokens,
                         x -> list_contains({_STOP_SQL}, x)))::DOUBLE
                     / greatest(len(t.tokens), 1), 6) AS stopword_ratio
        FROM documents d JOIN toks t ON d.doc_id = t.doc_id
    """

    s["text_quality"] = rf"""
        WITH toks AS ({_TOKS}),
        m AS (
            SELECT d.doc_id,
                   len(t.tokens)::DOUBLE AS n,
                   length(regexp_replace(lower(d.text), '[a-z0-9 ]', '', 'g'))::DOUBLE
                       / greatest(length(d.text), 1) AS punct,
                   len(list_filter(t.tokens, x -> list_contains({_STOP_SQL}, x)))::DOUBLE
                       / greatest(len(t.tokens), 1) AS stop
            FROM documents d JOIN toks t ON d.doc_id = t.doc_id)
        SELECT doc_id,
               round(0.4 * least(n / 100.0, 1.0)
                     + 0.3 * (1.0 - punct)
                     + 0.3 * (CASE WHEN stop >= 0.1 AND stop <= 0.5
                                   THEN 1.0 ELSE 0.5 END), 6) AS quality
        FROM m
    """

    s["text_fingerprint"] = f"""
        SELECT doc_id, {_MD5L.format(x="text")} AS fp FROM documents
    """

    hit = (
        "len(list_filter(tokens, x -> list_contains({m}, x)))::BIGINT"
    )
    _h = {
        lang: hit.format(m=_lang_markers_sql(lang))
        for lang in ("de", "en", "es", "fr", "zh")
    }
    s["text_lang_id"] = f"""
        WITH toks AS ({_TOKS}),
        h AS (SELECT doc_id,
                     {_h["en"]} AS hits_en, {_h["es"]} AS hits_es,
                     {_h["de"]} AS hits_de, {_h["fr"]} AS hits_fr,
                     {_h["zh"]} AS hits_zh
              FROM toks)
        SELECT doc_id, hits_en, hits_es, hits_de, hits_fr,
               CASE WHEN greatest(hits_de, hits_en, hits_es, hits_fr, hits_zh) = 0
                        THEN 'und'
                    WHEN hits_de = greatest(hits_de, hits_en, hits_es, hits_fr, hits_zh) THEN 'de'
                    WHEN hits_en = greatest(hits_de, hits_en, hits_es, hits_fr, hits_zh) THEN 'en'
                    WHEN hits_es = greatest(hits_de, hits_en, hits_es, hits_fr, hits_zh) THEN 'es'
                    WHEN hits_fr = greatest(hits_de, hits_en, hits_es, hits_fr, hits_zh) THEN 'fr'
                    ELSE 'zh' END AS lang_pred
        FROM h
    """

    s["vec_norm_checkpoints"] = f"""
        WITH d AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        n AS (SELECT vec_id, v, {_NORMALIZE.format(v="v")} AS nv FROM d)
        SELECT vec_id,
               round(sqrt(list_dot_product(v, v)), 6) AS norm_before,
               round(nv[1], 6) AS first_after,
               round(list_sum(nv), 6) AS sum_after
        FROM n
    """

    s["vec_dot_cosine"] = f"""
        WITH d AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        SELECT a.vec_id AS a_id,
               round(list_dot_product(a.v, b.v), 6) AS dot,
               round({_COS.format(a="a.v", b="b.v")}, 6) AS cosine
        FROM d a JOIN d b ON b.vec_id = a.vec_id + 1
    """

    _knn_sql = f"""
        WITH d AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        n AS (SELECT vec_id AS doc_id, {_NORMALIZE.format(v="v")} AS nv FROM d),
        q AS (SELECT doc_id AS query_id, nv AS qv FROM n WHERE doc_id < {KNN_NQ}),
        sc AS (SELECT query_id, doc_id, list_dot_product(qv, nv) AS score
               FROM q CROSS JOIN n),
        r AS (SELECT query_id, doc_id, score,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY score DESC, doc_id) AS rank
              FROM sc)
        SELECT query_id, rank, doc_id, round(score, 6) AS score
        FROM r WHERE rank <= {KNN_K}
    """
    s["rel_window_running"] = """
        SELECT o_custkey, o_orderkey,
               row_number() OVER w AS seq,
               round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                   AS running_total,
               round(lag(o_totalprice, 1) OVER w, 2) AS prev_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """

    s["text_redact_pii"] = r"""
        WITH r AS (
          SELECT doc_id,
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                       '[EMAIL]', 'g'),
                     '\b\d{3}-\d{2}-\d{4}\b', '[SSN]', 'g'),
                   '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '[PHONE]', 'g') AS red,
                 text
          FROM documents)
        SELECT doc_id, md5(red) AS redacted_md5, red <> text AS changed
        FROM r
    """

    s["rel_rollup"] = """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n, round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """

    s["rel_profile"] = """
        WITH s AS (
            SELECT 'o_orderkey' AS col_name, o_orderkey::VARCHAR AS val FROM orders
            UNION ALL
            SELECT 'o_custkey', o_custkey::VARCHAR FROM orders
            UNION ALL
            SELECT 'o_orderstatus', o_orderstatus::VARCHAR FROM orders
            UNION ALL
            SELECT 'o_totalprice', o_totalprice::VARCHAR FROM orders
            UNION ALL
            SELECT 'o_orderpriority', o_orderpriority::VARCHAR FROM orders
        )
        SELECT col_name, count(*) AS n_rows, count(val) AS n_notnull,
               count(DISTINCT val) AS n_distinct,
               min(val) AS min_val, max(val) AS max_val
        FROM s GROUP BY col_name
    """

    s["rel_semi_join"] = """
        SELECT c_mktsegment, count(*) AS n_customers
        FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders
                            WHERE o_orderpriority = '1-URGENT')
        GROUP BY c_mktsegment
    """

    s["rel_cube"] = """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n, round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """

    s["rel_window_ranks"] = """
        SELECT o_custkey, o_orderkey,
               rank() OVER w AS rnk,
               dense_rank() OVER w AS drnk,
               round(percent_rank() OVER w, 6) AS prnk,
               round(cume_dist() OVER w, 6) AS cdist,
               ntile(4) OVER w AS quartile,
               lead(o_orderkey, 1) OVER w AS next_orderkey
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """

    s["io_partitioned_roundtrip"] = """
        SELECT lang, source, count(*) AS n_docs,
               sum(n_chars)::BIGINT AS sum_chars
        FROM documents WHERE lang IN ('en', 'de')
        GROUP BY lang, source
    """

    s["rel_local_supplier_volume"] = """
        SELECT n_name,
               round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
               count(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
                     AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= '1996-01-01'
          AND o_orderdate < '1997-01-01'
        GROUP BY n_name
    """

    s["rel_pivot"] = """
        SELECT n_name,
               count(*) FILTER (o_orderstatus = 'O') AS n_open,
               count(*) FILTER (o_orderstatus = 'F') AS n_filled,
               count(*) FILTER (o_orderstatus = 'P') AS n_partial
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """

    s["events_quantiles"] = """
        SELECT event_type,
               round(quantile_cont(value, 0.5), 6) AS p50,
               round(quantile_cont(value, 0.9), 6) AS p90,
               round(quantile_cont(value, 0.99), 6) AS p99
        FROM events GROUP BY event_type
    """

    s["doc_hash_sample"] = f"""
        SELECT doc_id, n_chars FROM documents
        WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
              < {int(0.25 * (1 << 32))}
    """

    s["knn_exact"] = _knn_sql
    s["knn_window"] = _knn_sql
    s["knn_ivf_fullprobe"] = _knn_sql

    # matryoshka: identical kNN shape over the re-normalized 16-dim prefix
    s["knn_matryoshka"] = f"""
        WITH d AS (SELECT vec_id, (embedding::DOUBLE[])[1:16] AS v
                   FROM embeddings),
        n AS (SELECT vec_id AS doc_id, {_NORMALIZE.format(v="v")} AS nv FROM d),
        q AS (SELECT doc_id AS query_id, nv AS qv FROM n
              WHERE doc_id < {KNN_NQ}),
        sc AS (SELECT query_id, doc_id, list_dot_product(qv, nv) AS score
               FROM q CROSS JOIN n),
        r AS (SELECT query_id, doc_id, score,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY score DESC, doc_id) AS rank
              FROM sc)
        SELECT query_id, rank, doc_id, round(score, 6) AS score
        FROM r WHERE rank <= {KNN_K}
    """

    # hard negatives: over-fetched kNN minus self minus the >= 0.95
    # near-dup band, re-ranked
    s["retrieval_hard_negatives"] = f"""
        WITH d AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        n AS (SELECT vec_id AS doc_id, {_NORMALIZE.format(v="v")} AS nv FROM d),
        q AS (SELECT doc_id AS query_id, nv AS qv FROM n
              WHERE doc_id < {KNN_NQ}),
        sc AS (SELECT query_id, doc_id, list_dot_product(qv, nv) AS score
               FROM q CROSS JOIN n),
        r AS (SELECT query_id, doc_id, score,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY score DESC, doc_id) AS rank
              FROM sc),
        cand AS (SELECT * FROM r WHERE rank <= 25),
        kept AS (SELECT query_id, doc_id, score,
                        row_number() OVER (PARTITION BY query_id
                                           ORDER BY score DESC, doc_id)
                            AS neg_rank
                 FROM cand
                 WHERE doc_id <> query_id AND score < 0.95)
        SELECT query_id, neg_rank, doc_id, round(score, 6) AS score
        FROM kept WHERE neg_rank <= 5
    """

    # MMR λ=1 ≡ relevance order: exact-kNN ranking without the score col
    s["mmr_lambda1"] = f"""
        WITH d AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        n AS (SELECT vec_id AS doc_id, {_NORMALIZE.format(v="v")} AS nv FROM d),
        q AS (SELECT doc_id AS query_id, nv AS qv FROM n WHERE doc_id < {KNN_NQ}),
        sc AS (SELECT query_id, doc_id, list_dot_product(qv, nv) AS score
               FROM q CROSS JOIN n),
        r AS (SELECT query_id, doc_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY score DESC, doc_id) AS rank
              FROM sc)
        SELECT query_id, rank, doc_id FROM r WHERE rank <= {KNN_K}
    """

    # hybrid candidate union: kNN top-C ∪ BM25 top-C (query = own doc text)
    s["rag_union_candidates"] = f"""
        WITH d AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        n AS (SELECT vec_id AS doc_id, {_NORMALIZE.format(v="v")} AS nv FROM d),
        qv AS (SELECT doc_id AS query_id, nv AS qvec FROM n
               WHERE doc_id < {RAG_NQ}),
        vsc AS (SELECT query_id, doc_id, list_dot_product(qvec, nv) AS score
                FROM qv CROSS JOIN n),
        vr AS (SELECT query_id, doc_id,
                      row_number() OVER (PARTITION BY query_id
                                         ORDER BY score DESC, doc_id) AS rank
               FROM vsc),
        vc AS (SELECT query_id, doc_id FROM vr WHERE rank <= {RAG_CAND_K}),
        toks AS ({_TOKS}),
        dl AS (SELECT doc_id, len(tokens)::DOUBLE AS dl FROM toks),
        terms AS (SELECT doc_id, unnest(tokens) AS term FROM toks),
        tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf
               FROM terms GROUP BY doc_id, term),
        dfreq AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl),
        idf0 AS (SELECT term, ln((n_docs - df + 0.5) / (df + 0.5)) AS raw_idf
                 FROM dfreq CROSS JOIN stats),
        aidf AS (SELECT avg(raw_idf) AS avg_idf FROM idf0),
        idf AS (SELECT term, CASE WHEN raw_idf < 0 THEN 0.25 * avg_idf
                                  ELSE raw_idf END AS idf
                FROM idf0 CROSS JOIN aidf),
        q AS (SELECT doc_id AS query_id, unnest(tokens) AS term
              FROM toks WHERE doc_id < {RAG_NQ}),
        qw AS (SELECT query_id, term, count(*)::DOUBLE AS qw
               FROM q GROUP BY query_id, term),
        bsc AS (SELECT qw.query_id, tf.doc_id,
                       round(sum(qw.qw * idf.idf * tf.tf * 2.5
                                 / (tf.tf + 1.5 * (0.25 + 0.75 * dl.dl
                                                   / stats.avgdl))), 6) AS bm25
                FROM tf JOIN qw USING (term) JOIN idf USING (term)
                        JOIN dl USING (doc_id) CROSS JOIN stats
                GROUP BY qw.query_id, tf.doc_id),
        br AS (SELECT query_id, doc_id,
                      row_number() OVER (PARTITION BY query_id
                                         ORDER BY bm25 DESC, doc_id) AS rank
               FROM bsc),
        bc AS (SELECT query_id, doc_id FROM br WHERE rank <= {RAG_CAND_K})
        SELECT query_id, doc_id FROM vc
        UNION
        SELECT query_id, doc_id FROM bc
    """

    s["text_cms_heavyhitters"] = f"""
        WITH toks AS ({_TOKS}),
        t AS (SELECT unnest(tokens) AS term FROM toks),
        rows AS (SELECT unnest(range(0, {CMS_D})) AS row),
        h AS (SELECT row,
                     ('0x' || substr(md5('cms' || row || ':' || term), 1, 15))::BIGINT
                       % {CMS_W} AS col
              FROM t CROSS JOIN rows),
        sk AS (SELECT row, col, count(*) AS cnt FROM h GROUP BY 1, 2),
        vocab AS (SELECT term, count(*) AS true_count FROM t GROUP BY term),
        probe AS (SELECT term, row,
                         ('0x' || substr(md5('cms' || row || ':' || term), 1, 15))::BIGINT
                           % {CMS_W} AS col
                  FROM vocab CROSS JOIN rows),
        est AS (SELECT term, min(coalesce(cnt, 0)) AS est_count
                FROM probe LEFT JOIN sk USING (row, col) GROUP BY term)
        SELECT v.term, true_count, est_count
        FROM vocab v JOIN est USING (term)
    """

    s["doc_stratified_sample"] = f"""
        WITH b AS (SELECT *,
                ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT AS bucket
            FROM documents)
        SELECT source, count(*) AS n_docs, sum(n_chars)::BIGINT AS sum_chars
        FROM b
        WHERE bucket < CASE source
                       WHEN 'src0' THEN {int(1.0 * (1 << 32))}
                       WHEN 'src1' THEN {int(0.5 * (1 << 32))}
                       WHEN 'src2' THEN {int(0.1 * (1 << 32))}
                       ELSE {int(0.25 * (1 << 32))} END
        GROUP BY source
    """

    s["text_repetition"] = f"""
        WITH toks AS ({_TOKS}),
        base AS (SELECT doc_id, len(tokens) AS n_tokens,
                        len(list_distinct(tokens)) AS n_distinct, tokens
                 FROM toks),
        t1 AS (SELECT doc_id, unnest(tokens) AS g FROM toks),
        m1 AS (SELECT doc_id, max(c) AS mx1 FROM
                 (SELECT doc_id, g, count(*) AS c FROM t1 GROUP BY 1, 2)
               GROUP BY 1),
        g2 AS (SELECT doc_id,
                      unnest([tokens[i] || ' ' || tokens[i + 1]
                              FOR i IN range(1, len(tokens))]) AS g
               FROM toks WHERE len(tokens) >= 2),
        m2 AS (SELECT doc_id, max(c) AS mx2 FROM
                 (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2)
               GROUP BY 1),
        g3 AS (SELECT doc_id,
                      unnest([tokens[i] || ' ' || tokens[i + 1] || ' '
                              || tokens[i + 2]
                              FOR i IN range(1, len(tokens) - 1)]) AS g
               FROM toks WHERE len(tokens) >= 3),
        m3 AS (SELECT doc_id, max(c) AS mx3 FROM
                 (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2)
               GROUP BY 1)
        SELECT base.doc_id, n_tokens,
               round(CASE WHEN n_tokens > 0 THEN
                     (n_tokens - n_distinct) / n_tokens::DOUBLE ELSE 0 END, 6)
                   AS dup_token_frac,
               round(CASE WHEN n_tokens > 0 THEN
                     coalesce(mx1, 0) / n_tokens::DOUBLE ELSE 0 END, 6)
                   AS top_1gram_frac,
               round(CASE WHEN n_tokens - 1 > 0 THEN
                     coalesce(mx2, 0) / (n_tokens - 1)::DOUBLE ELSE 0 END, 6)
                   AS top_2gram_frac,
               round(CASE WHEN n_tokens - 2 > 0 THEN
                     coalesce(mx3, 0) / (n_tokens - 2)::DOUBLE ELSE 0 END, 6)
                   AS top_3gram_frac
        FROM base LEFT JOIN m1 USING (doc_id) LEFT JOIN m2 USING (doc_id)
                  LEFT JOIN m3 USING (doc_id)
    """

    # full greedy MMR over the hybrid candidates — recursive-CTE greedy:
    # each step picks argmax(0.5*rel - 0.5*max sim to chosen) with sims
    # rounded to 6 BEFORE the argmax (mirrors mmr_rerank_rows round_to=6)
    s["rag_mmr_rounded"] = f"""
        WITH RECURSIVE d AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        n AS (SELECT vec_id AS doc_id, {_NORMALIZE.format(v="v")} AS nv FROM d),
        qv AS (SELECT doc_id AS query_id, nv AS qvec FROM n
               WHERE doc_id < {RAG_NQ}),
        vsc AS (SELECT query_id, doc_id, list_dot_product(qvec, nv) AS score
                FROM qv CROSS JOIN n),
        vr AS (SELECT query_id, doc_id,
                      row_number() OVER (PARTITION BY query_id
                                         ORDER BY score DESC, doc_id) AS rank
               FROM vsc),
        vc AS (SELECT query_id, doc_id FROM vr WHERE rank <= {RAG_CAND_K}),
        toks AS ({_TOKS}),
        dl AS (SELECT doc_id, len(tokens)::DOUBLE AS dl FROM toks),
        terms AS (SELECT doc_id, unnest(tokens) AS term FROM toks),
        tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf
               FROM terms GROUP BY doc_id, term),
        dfreq AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl),
        idf0 AS (SELECT term, ln((n_docs - df + 0.5) / (df + 0.5)) AS raw_idf
                 FROM dfreq CROSS JOIN stats),
        aidf AS (SELECT avg(raw_idf) AS avg_idf FROM idf0),
        idf AS (SELECT term, CASE WHEN raw_idf < 0 THEN 0.25 * avg_idf
                                  ELSE raw_idf END AS idf
                FROM idf0 CROSS JOIN aidf),
        qt AS (SELECT doc_id AS query_id, unnest(tokens) AS term
               FROM toks WHERE doc_id < {RAG_NQ}),
        qw AS (SELECT query_id, term, count(*)::DOUBLE AS qw
               FROM qt GROUP BY query_id, term),
        bsc AS (SELECT qw.query_id, tf.doc_id,
                       round(sum(qw.qw * idf.idf * tf.tf * 2.5
                                 / (tf.tf + 1.5 * (0.25 + 0.75 * dl.dl
                                                   / stats.avgdl))), 6) AS bm25
                FROM tf JOIN qw USING (term) JOIN idf USING (term)
                        JOIN dl USING (doc_id) CROSS JOIN stats
                GROUP BY qw.query_id, tf.doc_id),
        br AS (SELECT query_id, doc_id,
                      row_number() OVER (PARTITION BY query_id
                                         ORDER BY bm25 DESC, doc_id) AS rank
               FROM bsc),
        bc AS (SELECT query_id, doc_id FROM br WHERE rank <= {RAG_CAND_K}),
        ids AS (SELECT query_id, doc_id FROM vc
                UNION SELECT query_id, doc_id FROM bc),
        cand AS (SELECT ids.query_id, ids.doc_id,
                        round(list_dot_product(n.nv, qv.qvec), 6) AS rel,
                        n.nv
                 FROM ids JOIN n USING (doc_id)
                          JOIN qv ON qv.query_id = ids.query_id),
        pair AS (SELECT a.query_id, a.doc_id AS a_id, b.doc_id AS b_id,
                        round(list_dot_product(a.nv, b.nv), 6) AS sim
                 FROM cand a JOIN cand b USING (query_id)),
        f AS (SELECT query_id, doc_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY rel DESC, doc_id) AS rn
              FROM cand),
        sel AS (
            SELECT query_id, 1 AS rank, doc_id, [doc_id] AS chosen
            FROM f WHERE rn = 1
            UNION ALL
            SELECT s.query_id, s.rank + 1, pick.doc_id,
                   list_append(s.chosen, pick.doc_id)
            FROM sel s, LATERAL (
               SELECT c.doc_id
               FROM cand c
               WHERE c.query_id = s.query_id
                 AND NOT list_contains(s.chosen, c.doc_id)
               ORDER BY 0.5 * c.rel
                        - 0.5 * (SELECT max(p.sim) FROM pair p
                                 WHERE p.query_id = s.query_id
                                   AND p.a_id = c.doc_id
                                   AND list_contains(s.chosen, p.b_id)) DESC,
                        c.doc_id
               LIMIT 1) pick
            WHERE s.rank < {KNN_K}
        )
        SELECT query_id, rank, doc_id FROM sel
    """

    # RRF: same vr/br rank CTEs as rag_union_candidates, fused by
    # 1/(60+rank); 1/(k0+r) is a single IEEE division → cross-engine exact
    s["rag_rrf"] = f"""
        WITH d AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        n AS (SELECT vec_id AS doc_id, {_NORMALIZE.format(v="v")} AS nv FROM d),
        qv AS (SELECT doc_id AS query_id, nv AS qvec FROM n
               WHERE doc_id < {RAG_NQ}),
        vsc AS (SELECT query_id, doc_id, list_dot_product(qvec, nv) AS score
                FROM qv CROSS JOIN n),
        vr AS (SELECT query_id, doc_id,
                      row_number() OVER (PARTITION BY query_id
                                         ORDER BY score DESC, doc_id) AS rank
               FROM vsc),
        vc AS (SELECT query_id, doc_id, rank FROM vr WHERE rank <= {RAG_CAND_K}),
        toks AS ({_TOKS}),
        dl AS (SELECT doc_id, len(tokens)::DOUBLE AS dl FROM toks),
        terms AS (SELECT doc_id, unnest(tokens) AS term FROM toks),
        tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf
               FROM terms GROUP BY doc_id, term),
        dfreq AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl),
        idf0 AS (SELECT term, ln((n_docs - df + 0.5) / (df + 0.5)) AS raw_idf
                 FROM dfreq CROSS JOIN stats),
        aidf AS (SELECT avg(raw_idf) AS avg_idf FROM idf0),
        idf AS (SELECT term, CASE WHEN raw_idf < 0 THEN 0.25 * avg_idf
                                  ELSE raw_idf END AS idf
                FROM idf0 CROSS JOIN aidf),
        q AS (SELECT doc_id AS query_id, unnest(tokens) AS term
              FROM toks WHERE doc_id < {RAG_NQ}),
        qw AS (SELECT query_id, term, count(*)::DOUBLE AS qw
               FROM q GROUP BY query_id, term),
        bsc AS (SELECT qw.query_id, tf.doc_id,
                       round(sum(qw.qw * idf.idf * tf.tf * 2.5
                                 / (tf.tf + 1.5 * (0.25 + 0.75 * dl.dl
                                                   / stats.avgdl))), 6) AS bm25
                FROM tf JOIN qw USING (term) JOIN idf USING (term)
                        JOIN dl USING (doc_id) CROSS JOIN stats
                GROUP BY qw.query_id, tf.doc_id),
        br AS (SELECT query_id, doc_id,
                      row_number() OVER (PARTITION BY query_id
                                         ORDER BY bm25 DESC, doc_id) AS rank
               FROM bsc),
        bc AS (SELECT query_id, doc_id, rank FROM br WHERE rank <= {RAG_CAND_K}),
        fused AS (SELECT coalesce(vc.query_id, bc.query_id) AS query_id,
                         coalesce(vc.doc_id, bc.doc_id) AS doc_id,
                         coalesce(1.0 / (60.0 + vc.rank), 0.0)
                         + coalesce(1.0 / (60.0 + bc.rank), 0.0) AS rrf
                  FROM vc FULL OUTER JOIN bc
                       ON vc.query_id = bc.query_id AND vc.doc_id = bc.doc_id),
        fr AS (SELECT query_id, doc_id, rrf,
                      row_number() OVER (PARTITION BY query_id
                                         ORDER BY rrf DESC, doc_id) AS rank
               FROM fused)
        SELECT query_id, rank, doc_id, round(rrf, 6) AS rrf
        FROM fr WHERE rank <= {KNN_K}
    """

    # PQ: symbolic LCG codebooks — value(sub,k,d) from one LCG step, so no
    # literal tables; encode = per-subspace L2 argmin (first-min ties ==
    # Spark array_position), ADC = table lookups summed in sub order
    _pq_cbv = (
        "((((22695477 * ((({sub}*16 + k)*8 + dd + 7777777) % 2147483648)) + 1)"
        " % 2147483648) / 2147483648.0 - 0.5)"
    )

    def _pq_dists(vexpr: str, sub: int) -> str:
        return (
            "[list_sum([ (" + vexpr + f"[{sub}*8 + dd + 1] - "
            + _pq_cbv.format(sub=sub)
            + ") ^ 2 FOR dd IN range(0, 8)]) FOR k IN range(0, 16)]"
        )

    _pq_codes = "[" + ", ".join(
        f"CAST(list_indexof({_pq_dists('v', sub)}, "
        f"list_min({_pq_dists('v', sub)})) - 1 AS INT)"
        for sub in range(PQ_M)
    ) + "]"
    _pq_qtab = "[" + ", ".join(_pq_dists("q.v", s) for s in range(PQ_M)) + "]"

    s["vec_pq_codes"] = f"""
        WITH d AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        c AS (SELECT vec_id, {_pq_codes} AS codes FROM d)
        SELECT vec_id, CAST(sub - 1 AS INT) AS sub, codes[sub] AS code
        FROM c, unnest(generate_series(1, {PQ_M})) AS t(sub)
    """

    s["knn_pq_adc"] = f"""
        WITH d AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        c AS (SELECT vec_id AS doc_id, {_pq_codes} AS codes FROM d),
        q AS (SELECT vec_id AS query_id, v FROM d WHERE vec_id < {KNN_NQ}),
        tabs AS (SELECT query_id, {_pq_qtab} AS tab FROM q),
        sc AS (SELECT query_id, doc_id,
                 list_sum([tab[sub + 1][codes[sub + 1] + 1]
                           FOR sub IN range(0, {PQ_M})]) AS adc
               FROM tabs CROSS JOIN c),
        r AS (SELECT query_id, doc_id, adc,
                row_number() OVER (PARTITION BY query_id
                                   ORDER BY adc, doc_id) AS rank FROM sc)
        SELECT query_id, rank, doc_id, round(adc, 6) AS adc_dist
        FROM r WHERE rank <= {KNN_K}
    """

    s["knn_ivfpq_fullprobe"] = s["knn_pq_adc"]

    # knn_pq_refine: ADC coarse cut (same fragments) then exact-L2
    # rescore of the candidates only; final rank by the exact distance
    # (same d-order fold as knn_exact_l2 so raw doubles bit-match).
    s["knn_pq_refine"] = f"""
        WITH d AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        c AS (SELECT vec_id AS doc_id, {_pq_codes} AS codes FROM d),
        q AS (SELECT vec_id AS query_id, v FROM d WHERE vec_id < {KNN_NQ}),
        tabs AS (SELECT query_id, {_pq_qtab} AS tab FROM q),
        sc AS (SELECT query_id, doc_id,
                 list_sum([tab[sub + 1][codes[sub + 1] + 1]
                           FOR sub IN range(0, {PQ_M})]) AS adc
               FROM tabs CROSS JOIN c),
        r AS (SELECT query_id, doc_id,
                row_number() OVER (PARTITION BY query_id
                                   ORDER BY adc, doc_id) AS rank FROM sc),
        cand AS (SELECT query_id, doc_id FROM r WHERE rank <= {PQ_REFINE_COARSE}),
        res AS (SELECT cand.query_id, cand.doc_id,
                  list_sum([ (qq.qv[i + 1] - dd.v[i + 1]) ^ 2
                             FOR i IN range(0, 64)]) AS l2
                FROM cand
                JOIN (SELECT vec_id AS doc_id, v FROM d) dd USING (doc_id)
                JOIN (SELECT vec_id AS query_id, v AS qv FROM d
                      WHERE vec_id < {KNN_NQ}) qq USING (query_id)),
        rr AS (SELECT query_id, doc_id, l2,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY l2, doc_id) AS rank FROM res)
        SELECT query_id, rank, doc_id, round(l2, 6) AS l2_dist
        FROM rr WHERE rank <= {KNN_K}
    """

    # L2 kNN: d-order summation of squared diffs matches the fold order
    s["knn_exact_l2"] = f"""
        WITH d AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        q AS (SELECT vec_id AS query_id, v AS qv FROM d WHERE vec_id < {KNN_NQ}),
        sc AS (SELECT query_id, vec_id AS doc_id,
                      list_sum([ (qv[i + 1] - v[i + 1]) ^ 2
                                 FOR i IN range(0, 64)]) AS l2
               FROM q CROSS JOIN d),
        r AS (SELECT query_id, doc_id, l2,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY l2, doc_id) AS rank
              FROM sc)
        SELECT query_id, rank, doc_id, round(l2, 6) AS l2_dist
        FROM r WHERE rank <= {KNN_K}
    """

    s["vec_dp_noise"] = f"""
        WITH d AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        n AS (SELECT vec_id, {_NORMALIZE.format(v="v")} AS nv FROM d),
        x AS (SELECT vec_id, nv,
                     [nv[i + 1] + (((1103515245 * ((vec_id * 64 + i) % 2147483648)
                                     + 12345) % 2147483648) / 2147483648.0 - 0.5)
                                  * {2.0 * DP_SIGMA}
                      FOR i IN range(0, 64)] AS noisy
              FROM n)
        SELECT vec_id, round({_COS.format(a="nv", b="noisy")}, 6) AS noise_cosine
        FROM x
    """

    s["vec_weighted_concat"] = f"""
        WITH d AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        n AS (SELECT vec_id, {_NORMALIZE.format(v="v")} AS nv FROM d),
        j AS (SELECT a.vec_id,
                     list_concat(list_transform(a.nv, x -> x * 0.7),
                                 list_transform(b.nv, x -> x * 0.3)) AS cat
              FROM n a JOIN n b ON b.vec_id = a.vec_id + 1),
        f AS (SELECT vec_id, {_NORMALIZE.format(v="cat")} AS fc FROM j)
        SELECT vec_id,
               round(fc[1], 6) AS first_elem,
               round(fc[65], 6) AS first_b_elem,
               round(list_sum(fc), 6) AS sum_all
        FROM f
    """

    proj_cols = ",\n               ".join(
        f"round(list_sum([v[i + 1] * (((22695477 * ((i * {PROJ_OUT} + {j})"
        f" % 2147483648) + 1) % 2147483648) / 2147483648.0 - 0.5)"
        f" FOR i IN range(0, 64)]), 6) AS p{j}"
        for j in range(PROJ_OUT)
    )
    s["vec_random_projection"] = f"""
        WITH d AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        SELECT vec_id,
               {proj_cols}
        FROM d
    """

    s["embed_hash_features"] = f"""
        WITH toks AS ({_TOKS}),
        t AS (SELECT doc_id, unnest(tokens) AS tok FROM toks),
        h AS (SELECT doc_id, {_MD5L.format(x="tok")} AS hv FROM t)
        SELECT doc_id, (hv % {EMBED_DIM})::BIGINT AS j,
               round(sum(((hv >> 6) % 2001) / 1000.0 - 1.0), 6) AS feature
        FROM h GROUP BY doc_id, hv % {EMBED_DIM}
    """

    terms_sql = ", ".join(f"('{t}', 1.0)" for t in BM25_TERMS)
    s["bm25_okapi"] = f"""
        WITH toks AS ({_TOKS}),
        dl AS (SELECT doc_id, len(tokens)::DOUBLE AS dl FROM toks),
        terms AS (SELECT doc_id, unnest(tokens) AS term FROM toks),
        tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf
               FROM terms GROUP BY doc_id, term),
        dfreq AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl),
        idf0 AS (SELECT term, ln((n_docs - df + 0.5) / (df + 0.5)) AS raw_idf
                 FROM dfreq CROSS JOIN stats),
        aidf AS (SELECT avg(raw_idf) AS avg_idf FROM idf0),
        idf AS (SELECT term, CASE WHEN raw_idf < 0 THEN 0.25 * avg_idf
                                  ELSE raw_idf END AS idf
                FROM idf0 CROSS JOIN aidf),
        q AS (SELECT * FROM (VALUES {terms_sql}) AS t(term, qw)),
        sc AS (SELECT tf.doc_id,
                      sum(q.qw * idf.idf * tf.tf * 2.5
                          / (tf.tf + 1.5 * (0.25 + 0.75 * dl.dl / stats.avgdl)))
                          AS bm25
               FROM tf JOIN q USING (term) JOIN idf USING (term)
                       JOIN dl USING (doc_id) CROSS JOIN stats
               GROUP BY tf.doc_id)
        SELECT d.doc_id, round(coalesce(sc.bm25, 0.0), 6) AS bm25
        FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
    """
    # incremental BM25 maintenance: folding the corpus in as batches of
    # additive sufficient statistics must reproduce the one-shot build's
    # scores bit-for-bit at 6dp — the oracle IS the one-shot SQL
    s["bm25_incremental"] = s["bm25_okapi"]

    # the DELETE half: ingest + delete-by-replay must equal a one-shot
    # build over the SURVIVORS — same SQL with every corpus-derived CTE
    # restricted to doc_id % 7 <> 2 (df, n_docs, avgdl, the epsilon
    # floor's vocabulary average: all recomputed over survivors only)
    s["bm25_incremental_delete"] = f"""
        WITH toks AS (SELECT * FROM ({_TOKS}) t WHERE doc_id % 7 <> 2),
        dl AS (SELECT doc_id, len(tokens)::DOUBLE AS dl FROM toks),
        terms AS (SELECT doc_id, unnest(tokens) AS term FROM toks),
        tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf
               FROM terms GROUP BY doc_id, term),
        dfreq AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl),
        idf0 AS (SELECT term, ln((n_docs - df + 0.5) / (df + 0.5)) AS raw_idf
                 FROM dfreq CROSS JOIN stats),
        aidf AS (SELECT avg(raw_idf) AS avg_idf FROM idf0),
        idf AS (SELECT term, CASE WHEN raw_idf < 0 THEN 0.25 * avg_idf
                                  ELSE raw_idf END AS idf
                FROM idf0 CROSS JOIN aidf),
        q AS (SELECT * FROM (VALUES {terms_sql}) AS t(term, qw)),
        sc AS (SELECT tf.doc_id,
                      sum(q.qw * idf.idf * tf.tf * 2.5
                          / (tf.tf + 1.5 * (0.25 + 0.75 * dl.dl / stats.avgdl)))
                          AS bm25
               FROM tf JOIN q USING (term) JOIN idf USING (term)
                       JOIN dl USING (doc_id) CROSS JOIN stats
               GROUP BY tf.doc_id)
        SELECT d.doc_id, round(coalesce(sc.bm25, 0.0), 6) AS bm25
        FROM (SELECT doc_id FROM documents WHERE doc_id % 7 <> 2) d
        LEFT JOIN sc ON d.doc_id = sc.doc_id
    """

    _ranks = """
        base AS (SELECT lang AS query_id, doc_id,
                        row_number() OVER (PARTITION BY lang
                                           ORDER BY n_chars DESC, doc_id) AS b_rank
                 FROM documents QUALIFY b_rank <= 10),
        oth AS (SELECT lang AS query_id, doc_id,
                       row_number() OVER (PARTITION BY lang
                                          ORDER BY doc_id) AS o_rank
                FROM documents QUALIFY o_rank <= 10)
    """
    s["metrics_eval"] = f"""
        WITH {_ranks},
        hits AS (SELECT o.query_id, o.o_rank, b.b_rank
                 FROM oth o LEFT JOIN base b
                   ON b.query_id = o.query_id AND b.doc_id = o.doc_id)
        SELECT query_id,
               round(count(b_rank) / 10.0, 6) AS recall,
               round(count(b_rank) / count(*)::DOUBLE, 6) AS precision,
               round(avg(CASE WHEN b_rank = o_rank THEN 1.0 ELSE 0.0 END), 6)
                   AS accuracy,
               round(coalesce(1.0 / min(CASE WHEN b_rank IS NOT NULL
                                             THEN o_rank END), 0.0), 6) AS mrr,
               round(sum(coalesce(b_rank, 0)::DOUBLE / log2(o_rank + 1.0))
                     / sum(1.0 / log2(o_rank + 1.0)), 6) AS ndcg
        FROM hits GROUP BY query_id
    """

    s["set_overlap"] = f"""
        WITH {_ranks},
        agg_b AS (SELECT query_id, count(*)::DOUBLE AS na FROM base GROUP BY query_id),
        inter AS (SELECT b.query_id, count(*)::DOUBLE AS ni
                  FROM base b JOIN oth o
                    ON b.query_id = o.query_id AND b.doc_id = o.doc_id
                  GROUP BY b.query_id)
        SELECT a.query_id, round(coalesce(i.ni, 0.0) / a.na, 6) AS overlap
        FROM agg_b a LEFT JOIN inter i ON a.query_id = i.query_id
    """

    s["events_tumbling"] = f"""
        SELECT (epoch_ns(ts) // {WINDOW_SEC * 1_000_000_000}) * {WINDOW_SEC}
                   AS window_start,
               event_type, count(*) AS n_events,
               round(sum(value), 6) AS sum_value,
               round(avg(value), 6) AS avg_value
        FROM events GROUP BY 1, 2
    """

    s["events_distinct_users"] = """
        SELECT event_type,
               count(DISTINCT user_id) AS n_users,
               count(*) AS n_events
        FROM events GROUP BY event_type
    """

    s["events_streaming_tumbling"] = f"""
        SELECT (epoch_ns(ts) // {WINDOW_SEC * 1_000_000_000}) * {WINDOW_SEC}
                   AS window_start,
               event_type, count(*) AS n_events,
               round(sum(value), 6) AS sum_value
        FROM events GROUP BY 1, 2
    """

    s["events_sliding"] = """
        WITH e AS (SELECT event_type, value,
                          epoch_ns(ts) // 60000000000 AS b FROM events),
        x AS (SELECT event_type, value,
                     unnest(range(greatest((b - 4) * 60, 0), b * 60 + 60, 60))
                         AS window_start
              FROM e)
        SELECT window_start, event_type, count(*) AS n_events,
               round(sum(value), 6) AS sum_value
        FROM x GROUP BY 1, 2
    """

    s["text_bpe_tokens"] = r"""
        SELECT doc_id,
               len(regexp_extract_all(text,
                   '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))::BIGINT AS n_bpe
        FROM documents
    """

    s["rel_shipping_priority"] = """
        SELECT l_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
               round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < '1997-06-30'
          AND l_shipdate > '1997-06-30'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
    """

    s["events_streaming_dedup"] = """
        SELECT DISTINCT user_id, event_type FROM events
    """

    s["io_orc_roundtrip"] = """
        SELECT lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS sum_chars,
               count(CASE WHEN source = 'src1' THEN 1 END) AS n_src1
        FROM documents GROUP BY lang
    """

    s["vec_quantize_int8"] = f"""
        WITH q AS (
            SELECT vec_id, embedding,
                   (list_max(list_transform(embedding, x -> abs(x::DOUBLE)))
                        + 1e-12) / 127.0 AS s
            FROM embeddings
        ),
        qq AS (
            SELECT vec_id, embedding, s,
                   list_transform(embedding,
                       x -> greatest(-127, least(127,
                                round(x::DOUBLE / s)::INT))) AS qv
            FROM q
        ),
        dq AS (
            -- ed: embedding cast per-element to DOUBLE; list_dot_product on
            -- mixed FLOAT[]/DOUBLE[] inputs otherwise degrades to float32
            SELECT vec_id, s, qv,
                   list_transform(embedding, x -> x::DOUBLE) AS ed,
                   list_transform(qv, c -> c * s) AS dv
            FROM qq
        )
        SELECT vec_id, round(s, 6) AS scale,
               qv[1]::BIGINT AS q_first,
               list_sum(qv)::BIGINT AS q_sum,
               list_min(qv)::BIGINT AS q_min,
               list_max(qv)::BIGINT AS q_max,
               round({_COS.format(a="ed", b="dv")}, 6) AS cos_dequant
        FROM dq
    """

    s["vec_mean_pool"] = """
        WITH ex AS (
            SELECT label,
                   unnest(list_transform(embedding, x -> x::DOUBLE)) AS x,
                   unnest(range(1, len(embedding) + 1)) AS pos
            FROM embeddings
        ),
        per AS (
            SELECT label, pos, avg(x) AS m, count(*) AS n
            FROM ex GROUP BY label, pos
        )
        SELECT label::BIGINT AS label,
               max(n) AS n_vecs,
               round(sum(CASE WHEN pos = 1 THEN m ELSE 0 END), 6) AS mean_first,
               round(sum(m), 6) AS mean_sum,
               round(sqrt(sum(m * m)), 6) AS mean_norm
        FROM per GROUP BY label
    """

    _chunk_step = CHUNK_SIZE - CHUNK_OVERLAP
    s["text_chunk_windows"] = f"""
        WITH toks AS ({_TOKS}),
        s AS (
            SELECT doc_id, tokens,
                   unnest(range(1, greatest(len(tokens) - {CHUNK_OVERLAP}, 1) + 1,
                                {_chunk_step})) AS start
            FROM toks
        )
        SELECT doc_id,
               (start - 1) // {_chunk_step} AS chunk_seq,
               array_to_string(tokens[start:start + {CHUNK_SIZE - 1}], ' ')
                   AS chunk_text,
               least({CHUNK_SIZE}, len(tokens) - start + 1) AS n_tokens
        FROM s
        WHERE least({CHUNK_SIZE}, len(tokens) - start + 1) > 0
    """

    s["text_tfidf_topterms"] = f"""
        WITH toks AS ({_TOKS}),
        t AS (SELECT doc_id, unnest(tokens) AS term FROM toks),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY doc_id, term),
        dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        n AS (SELECT count(*) AS _n FROM documents),
        scored AS (
            SELECT doc_id, term, tf, df,
                   round(tf * ln(_n / df), 6) AS tfidf
            FROM tf JOIN dfreq USING (term) CROSS JOIN n
        ),
        r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term ASC) AS term_rank
              FROM scored)
        SELECT doc_id, term_rank, term, tf, df, tfidf
        FROM r WHERE term_rank <= {TFIDF_TOPK}
    """

    s["salted_agg"] = """
        SELECT event_type, count(*) AS n_rows,
               round(sum(value), 2) AS sum_value
        FROM events GROUP BY event_type
    """

    s["events_sessionize"] = f"""
        WITH e AS (SELECT user_id, epoch_ns(ts) AS ts_ns, value FROM events),
        l AS (SELECT *, CASE WHEN ts_ns - lag(ts_ns) OVER
                                  (PARTITION BY user_id ORDER BY ts_ns)
                                  > {SESSION_GAP_SEC * 1_000_000_000}
                             THEN 1 ELSE 0 END AS new_session FROM e),
        st AS (SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_ns
                                                ROWS UNBOUNDED PRECEDING)
                             AS session_seq FROM l)
        SELECT user_id, session_seq::BIGINT AS session_seq,
               count(*) AS n_events,
               min(ts_ns) // 1000 AS session_start_us,
               max(ts_ns) // 1000 AS session_end_us,
               round(sum(value), 6) AS sum_value
        FROM st GROUP BY user_id, session_seq
    """

    s["events_session_stats"] = f"""
        WITH e AS (SELECT user_id, epoch_ns(ts) AS ts_ns, value FROM events),
        l AS (SELECT *, CASE WHEN ts_ns - lag(ts_ns) OVER
                                  (PARTITION BY user_id ORDER BY ts_ns)
                                  > {SESSION_GAP_SEC * 1_000_000_000}
                             THEN 1 ELSE 0 END AS new_session FROM e),
        st AS (SELECT *, sum(new_session) OVER (PARTITION BY user_id
                             ORDER BY ts_ns ROWS UNBOUNDED PRECEDING)
                             AS session_seq FROM l),
        sess AS (SELECT user_id, session_seq, count(*) AS n_events,
                        (max(ts_ns) // 1000 - min(ts_ns) // 1000)
                            / 1000000.0 AS dur
                 FROM st GROUP BY 1, 2)
        SELECT count(*) AS n_sessions,
               round(quantile_cont(dur, 0.5), 6) AS p50_dur_sec,
               round(quantile_cont(dur, 0.9), 6) AS p90_dur_sec,
               round(avg(n_events), 6) AS mean_events,
               round(avg(CASE WHEN n_events = 1 THEN 1.0 ELSE 0.0 END), 6)
                   AS bounce_rate
        FROM sess
    """

    s["events_streaming_user_totals"] = """
        SELECT user_id, count(*) AS n_events,
               round(sum(value), 6) AS sum_value
        FROM events GROUP BY user_id
    """

    s["events_streaming_enrich"] = """
        SELECT c_mktsegment, event_type,
               count(*) AS n_events,
               round(sum(value), 2) AS sum_value
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY c_mktsegment, event_type
    """

    # session_window close semantics: end = last event + gap, new session
    # opens at diff >= gap (vs the batch twin's strict >)
    s["events_streaming_sessionize"] = f"""
        WITH e AS (SELECT user_id, epoch_ns(ts) AS ts_ns, value FROM events),
        l AS (SELECT *, CASE WHEN ts_ns - lag(ts_ns) OVER
                                  (PARTITION BY user_id ORDER BY ts_ns)
                                  >= {SESSION_GAP_SEC * 1_000_000_000}
                             THEN 1 ELSE 0 END AS new_session FROM e),
        st AS (SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_ns
                                                ROWS UNBOUNDED PRECEDING)
                             AS session_seq FROM l)
        SELECT user_id,
               min(ts_ns) // 1000 AS session_start_us,
               max(ts_ns) // 1000 + {SESSION_GAP_SEC * 1_000_000} AS session_end_us,
               count(*) AS n_events,
               round(sum(value), 6) AS sum_value
        FROM st GROUP BY user_id, session_seq
    """

    # identical session semantics; ids are 1-based in the skew variant
    s["events_sessionize_skew"] = f"""
        WITH e AS (SELECT user_id, epoch_ns(ts) AS ts_ns, value FROM events),
        l AS (SELECT *, CASE WHEN ts_ns - lag(ts_ns) OVER
                                  (PARTITION BY user_id ORDER BY ts_ns)
                                  > {SESSION_GAP_SEC * 1_000_000_000}
                             THEN 1 ELSE 0 END AS new_session FROM e),
        st AS (SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_ns
                                                ROWS UNBOUNDED PRECEDING)
                             AS session_seq FROM l)
        SELECT user_id, session_seq::BIGINT + 1 AS session_num,
               count(*) AS n_events,
               min(ts_ns) // 1000 AS session_start_us,
               max(ts_ns) // 1000 AS session_end_us,
               round(sum(value), 6) AS sum_value
        FROM st GROUP BY user_id, session_seq
    """

    s["events_asof_forward"] = """
        WITH clicks AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS ts_us
                        FROM events WHERE event_type = 'click'),
        views AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS ts_us, value
                  FROM events WHERE event_type = 'view')
        SELECT c.event_id, c.user_id, c.ts_us,
               v.ts_us AS view_ts_us,
               v.event_id AS view_event_id,
               round(v.value, 6) AS view_value
        FROM clicks c LEFT JOIN LATERAL (
            SELECT * FROM views v
            WHERE v.user_id = c.user_id AND v.ts_us >= c.ts_us
            ORDER BY v.ts_us ASC, v.event_id DESC LIMIT 1
        ) v ON TRUE
    """

    s["events_asof_join"] = """
        WITH clicks AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS ts_us
                        FROM events WHERE event_type = 'click'),
        views AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS ts_us, value
                  FROM events WHERE event_type = 'view')
        SELECT c.event_id, c.user_id, c.ts_us,
               v.ts_us AS view_ts_us,
               v.event_id AS view_event_id,
               round(v.value, 6) AS view_value
        FROM clicks c LEFT JOIN LATERAL (
            SELECT * FROM views v
            WHERE v.user_id = c.user_id AND v.ts_us <= c.ts_us
            ORDER BY v.ts_us DESC, v.event_id DESC LIMIT 1
        ) v ON TRUE
    """

    s["events_range_join"] = """
        WITH e AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS ts_us,
                          event_type FROM events)
        SELECT err.event_id AS error_event_id,
               count(*) AS n_followups,
               min(b.ts_us - err.ts_us) AS min_delta_us
        FROM (SELECT * FROM e WHERE event_type = 'error') err
        JOIN e b ON b.user_id = err.user_id
                AND b.ts_us - err.ts_us > 0
                AND b.ts_us - err.ts_us <= 3600000000
        GROUP BY err.event_id
    """

    s["events_json_extract"] = """
        SELECT event_type,
               count(k) AS n_with_k,
               CAST(sum(k) AS BIGINT) AS sum_k,
               round(avg(k), 6) AS avg_k
        FROM (SELECT event_type,
                     CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
              FROM events)
        GROUP BY event_type
    """

    s["events_streaming_join"] = """
        WITH e AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS ts_us,
                          event_type, value FROM events),
        c AS (SELECT event_id AS click_id, user_id, ts_us AS click_us
              FROM e WHERE event_type = 'click'),
        v AS (SELECT user_id, ts_us AS view_us, value
              FROM e WHERE event_type = 'view')
        SELECT c.click_id,
               count(*) AS n_views,
               round(sum(v.value), 6) AS sum_view_value
        FROM c JOIN v ON v.user_id = c.user_id
                     AND v.view_us <= c.click_us
                     AND v.view_us >= c.click_us - 3600000000
        GROUP BY c.click_id
    """

    s["events_streaming_outer_join"] = """
        WITH e AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS ts_us,
                          event_type, value FROM events),
        c AS (SELECT event_id AS click_id, user_id, ts_us AS click_us
              FROM e WHERE event_type = 'click'),
        v AS (SELECT user_id, ts_us AS view_us, value
              FROM e WHERE event_type = 'view')
        SELECT c.click_id,
               count(v.view_us) AS n_views,
               round(sum(v.value), 6) AS sum_view_value
        FROM c LEFT JOIN v ON v.user_id = c.user_id
                          AND v.view_us <= c.click_us
                          AND v.view_us >= c.click_us - 3600000000
        GROUP BY c.click_id
    """

    s["events_streaming_full_outer_join"] = """
        WITH e AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS ts_us,
                          event_type, value FROM events),
        c AS (SELECT event_id AS click_id, user_id, ts_us AS click_us
              FROM e WHERE event_type = 'click'),
        v AS (SELECT event_id AS view_id, user_id, ts_us AS view_us, value
              FROM e WHERE event_type = 'view')
        SELECT 'click' AS side, c.click_id AS id,
               count(v.view_us) AS n_matched,
               round(sum(v.value), 6) AS sum_value
        FROM c LEFT JOIN v ON v.user_id = c.user_id
                          AND v.view_us <= c.click_us
                          AND v.view_us >= c.click_us - 3600000000
        GROUP BY c.click_id
        UNION ALL
        SELECT 'view_orphan', v.view_id, 0, round(v.value, 6)
        FROM v WHERE NOT EXISTS (
            SELECT 1 FROM c WHERE v.user_id = c.user_id
                              AND v.view_us <= c.click_us
                              AND v.view_us >= c.click_us - 3600000000)
    """

    s["events_resample_gapfill"] = """
        WITH e AS (SELECT user_id, epoch_ns(ts) AS ts_ns, value FROM events),
        b AS (SELECT user_id, ts_ns // 3600000000000 AS bucket,
                     count(*) AS n_events, round(sum(value),6) AS v_sum
              FROM e GROUP BY 1,2),
        r AS (SELECT user_id, min(bucket) mn, max(bucket) mx FROM b GROUP BY 1),
        g AS (SELECT user_id, unnest(range(mn, mx+1)) AS bucket FROM r)
        SELECT g.user_id, g.bucket*3600 AS bucket_start,
               coalesce(b.n_events,0) AS n_events, b.v_sum,
               last_value(b.v_sum IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS v_ffill
        FROM g LEFT JOIN b ON g.user_id=b.user_id AND g.bucket=b.bucket
    """

    s["events_attribution"] = """
        WITH e AS (SELECT event_id, user_id, epoch_ns(ts) AS ts_ns,
                          event_type FROM events),
        c AS (SELECT event_id conv_id, user_id, ts_ns c_ns FROM e
              WHERE event_type='purchase'),
        t AS (SELECT user_id, event_type touch_type, ts_ns t_ns FROM e
              WHERE event_type IN ('view','click')),
        p AS (SELECT t.touch_type, c.conv_id FROM t JOIN c
              ON t.user_id=c.user_id AND t.t_ns<=c.c_ns
                 AND t.t_ns > c.c_ns - 86400000000000),
        w AS (SELECT touch_type,
                     1.0/count(*) OVER (PARTITION BY conv_id) AS credit
              FROM p)
        SELECT touch_type, count(*) AS n_touches,
               round(sum(credit),6) AS credit
        FROM w GROUP BY 1
    """

    tfidf_q_sql = ", ".join(
        f"('{qid}', '{t}', 1.0)"
        for qid, terms in TFIDF_QUERY_SET
        for t in terms
    )
    s["retrieval_tfidf"] = f"""
        WITH toks AS ({_TOKS}),
        terms AS (SELECT doc_id, unnest(tokens) AS term FROM toks),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1,2),
        dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT count(*)::DOUBLE AS n_docs FROM toks),
        idf AS (SELECT term, ln((SELECT n_docs FROM n)/df) AS idf FROM dfreq),
        w AS (SELECT doc_id, tf.term, tf*idf AS w
              FROM tf JOIN idf USING(term)),
        nrm AS (SELECT doc_id, sqrt(sum(w*w)) AS nrm FROM w GROUP BY 1),
        q(query_id, term, qtf) AS (VALUES {tfidf_q_sql}),
        qw AS (SELECT query_id, q.term, qtf*idf AS qw
               FROM q JOIN idf USING(term)),
        qn AS (SELECT query_id, sqrt(sum(qw*qw)) AS qnrm
               FROM qw GROUP BY 1),
        s AS (SELECT query_id, doc_id, sum(w*qw) AS dot
              FROM w JOIN qw USING(term) GROUP BY 1,2),
        scored AS (SELECT s.query_id, s.doc_id,
                          round(dot/(nrm*qnrm), 6) AS score
                   FROM s JOIN nrm USING(doc_id) JOIN qn USING(query_id)
                   WHERE nrm > 0 AND qnrm > 0),
        ranked AS (SELECT *, row_number() OVER (
                     PARTITION BY query_id ORDER BY score DESC, doc_id
                   ) AS rnk FROM scored)
        SELECT query_id, rnk AS rank, doc_id, score
        FROM ranked WHERE rnk <= 10
    """

    # the retrieval_tfidf SQL verbatim, restricted to the docs surviving
    # the entry's delete batch (doc_id % 7 == 2 removed) — the
    # maintained index's reconstructed view must match a one-shot build
    # over survivors exactly, vanished vocabulary included
    s["tfidf_incremental"] = f"""
        WITH toks AS (SELECT * FROM ({_TOKS}) WHERE doc_id % 7 <> 2),
        terms AS (SELECT doc_id, unnest(tokens) AS term FROM toks),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1,2),
        dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT count(*)::DOUBLE AS n_docs FROM toks),
        idf AS (SELECT term, ln((SELECT n_docs FROM n)/df) AS idf FROM dfreq),
        w AS (SELECT doc_id, tf.term, tf*idf AS w
              FROM tf JOIN idf USING(term)),
        nrm AS (SELECT doc_id, sqrt(sum(w*w)) AS nrm FROM w GROUP BY 1),
        q(query_id, term, qtf) AS (VALUES {tfidf_q_sql}),
        qw AS (SELECT query_id, q.term, qtf*idf AS qw
               FROM q JOIN idf USING(term)),
        qn AS (SELECT query_id, sqrt(sum(qw*qw)) AS qnrm
               FROM qw GROUP BY 1),
        s AS (SELECT query_id, doc_id, sum(w*qw) AS dot
              FROM w JOIN qw USING(term) GROUP BY 1,2),
        scored AS (SELECT s.query_id, s.doc_id,
                          round(dot/(nrm*qnrm), 6) AS score
                   FROM s JOIN nrm USING(doc_id) JOIN qn USING(query_id)
                   WHERE nrm > 0 AND qnrm > 0),
        ranked AS (SELECT *, row_number() OVER (
                     PARTITION BY query_id ORDER BY score DESC, doc_id
                   ) AS rnk FROM scored)
        SELECT query_id, rnk AS rank, doc_id, score
        FROM ranked WHERE rnk <= 10
    """

    s["text_pmi_pairs"] = f"""
        WITH toks AS ({_TOKS}),
        dt0 AS (SELECT DISTINCT doc_id, unnest(tokens) AS term
                FROM (SELECT doc_id, tokens FROM toks)),
        vocab AS (SELECT term, count(*) AS n_term FROM dt0
                  GROUP BY 1 HAVING count(*) >= 10),
        dt AS (SELECT dt0.doc_id, dt0.term, vocab.n_term
               FROM dt0 JOIN vocab USING(term)),
        n AS (SELECT count(distinct doc_id)::DOUBLE AS n_docs
              FROM documents),
        p AS (SELECT a.term AS term_a, b.term AS term_b,
                     a.n_term AS n_a, b.n_term AS n_b, count(*) AS n_ab
              FROM dt a JOIN dt b ON a.doc_id=b.doc_id AND a.term < b.term
              GROUP BY 1,2,3,4 HAVING count(*) >= 10)
        SELECT term_a, term_b, n_ab,
               round(ln(n_ab * (SELECT n_docs FROM n) / (n_a * n_b)), 6)
                   AS pmi
        FROM p
    """

    s["events_session_paths"] = """
        WITH e AS (SELECT event_id, user_id, epoch_ns(ts) AS ts_ns,
                          event_type FROM events),
        x AS (SELECT *, CASE WHEN lag(ts_ns) OVER w IS NULL
                               OR ts_ns - lag(ts_ns) OVER w > 1800000000000
                             THEN 1 ELSE 0 END AS ns
              FROM e WINDOW w AS (PARTITION BY user_id
                                  ORDER BY ts_ns, event_id)),
        y AS (SELECT *, sum(ns) OVER (PARTITION BY user_id
                ORDER BY ts_ns, event_id ROWS UNBOUNDED PRECEDING) AS seq
              FROM x),
        z AS (SELECT *, row_number() OVER (PARTITION BY user_id, seq
                ORDER BY ts_ns, event_id) AS rn FROM y),
        p AS (SELECT user_id, seq,
                     string_agg(event_type, '>' ORDER BY ts_ns, event_id)
                         AS path
              FROM z WHERE rn <= 10 GROUP BY 1,2)
        SELECT path, count(*) AS n_sessions FROM p
        GROUP BY 1 HAVING count(*) >= 2
    """

    s["rel_cust_no_orders"] = """
        SELECT c_mktsegment,
               count(*) AS n_customers,
               round(avg(c_acctbal), 6) AS avg_acctbal
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '1-URGENT')
        GROUP BY c_mktsegment
    """

    from clinical_vector_search_spark.operators.dedup import (
        MINHASH_P,
        minhash_params,
    )

    params_values = ", ".join(
        f"({i}, {a}, {b})"
        for i, (a, b) in ((i, minhash_params(i)) for i in range(MINHASH_HASHES))
    )
    s["dedup_minhash_sigs"] = f"""
        WITH toks AS ({_TOKS}),
        sh AS ({_SHINGLES}),
        h AS (SELECT doc_id,
                     {_MD5L.format(x="shingle")} % {MINHASH_P} AS hv
              FROM sh),
        fam AS (SELECT * FROM (VALUES {params_values}) AS p(hash_idx, a, b))
        SELECT doc_id, hash_idx::INT AS hash_idx,
               min((a::BIGINT * hv + b) % {MINHASH_P}) AS sig
        FROM h CROSS JOIN fam GROUP BY doc_id, hash_idx
    """

    # estimator calibration: exact-pair Jaccard vs signature agreement,
    # reusing the sig family and the all-pairs derivation verbatim
    s["dedup_minhash_estimate"] = f"""
        WITH toks AS ({_TOKS}),
        sh AS ({_SHINGLES}),
        sizes AS (SELECT doc_id, count(*)::DOUBLE AS n_sh FROM sh
                  GROUP BY doc_id),
        common AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                          count(*)::DOUBLE AS common
                   FROM sh a JOIN sh b ON a.shingle = b.shingle
                                      AND a.doc_id < b.doc_id
                   GROUP BY a.doc_id, b.doc_id),
        p AS (SELECT a_id, b_id,
                     common / (sa.n_sh + sb.n_sh - common) AS j
              FROM common JOIN sizes sa ON sa.doc_id = a_id
                          JOIN sizes sb ON sb.doc_id = b_id
              WHERE common / (sa.n_sh + sb.n_sh - common)
                  >= {JACCARD_THR}),
        h AS (SELECT doc_id,
                     {_MD5L.format(x="shingle")} % {MINHASH_P} AS hv
              FROM sh),
        fam AS (SELECT * FROM (VALUES {params_values})
                    AS f(hash_idx, a, b)),
        sig AS (SELECT doc_id, hash_idx,
                       min((a::BIGINT * hv + b) % {MINHASH_P}) AS sig
                FROM h CROSS JOIN fam GROUP BY doc_id, hash_idx),
        m AS (SELECT p.a_id, p.b_id, p.j,
                     count(*) FILTER (WHERE sa.sig = sb.sig)
                         / {float(MINHASH_HASHES)!r} AS est
              FROM p JOIN sig sa ON sa.doc_id = p.a_id
                     JOIN sig sb ON sb.doc_id = p.b_id
                                AND sb.hash_idx = sa.hash_idx
              GROUP BY 1, 2, 3)
        SELECT a_id, b_id, round(j, 6) AS jaccard, round(est, 6) AS est,
               round(abs(est - j), 6) AS abs_err
        FROM m
    """

    # mixture rebalancing: thresholds derived in SQL from the same
    # observed counts and double arithmetic as the Spark side
    s["doc_mixture_sample"] = """
        WITH cnt AS (SELECT source, count(*) AS n
                     FROM documents GROUP BY source),
        w AS (SELECT * FROM (VALUES ('src0', CAST(0.5 AS DOUBLE)),
                                    ('src1', CAST(0.3 AS DOUBLE)),
                                    ('src2', CAST(0.2 AS DOUBLE)))
              AS t(source, frac)),
        thr AS (SELECT source,
                       CAST(floor(least(1.0, 60 * frac / n)
                                  * 4294967296.0) AS BIGINT) AS t
                FROM cnt JOIN w USING (source)),
        b AS (SELECT d.source, d.n_chars, t,
                     ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT
                         AS bucket
              FROM documents d JOIN thr USING (source))
        SELECT source, count(*) AS n_docs, sum(n_chars)::BIGINT AS sum_chars
        FROM b WHERE bucket < t GROUP BY source
    """

    # ordered funnel: greedy earliest-completion levels in SQL, strict >
    s["events_funnel"] = """
        WITH t1 AS (SELECT user_id, min(epoch_ns(ts)) AS t FROM events
                    WHERE event_type = 'view' GROUP BY user_id),
        t2 AS (SELECT e.user_id, min(epoch_ns(e.ts)) AS t
               FROM events e JOIN t1 ON e.user_id = t1.user_id
               WHERE e.event_type = 'click' AND epoch_ns(e.ts) > t1.t
               GROUP BY e.user_id),
        t3 AS (SELECT e.user_id, min(epoch_ns(e.ts)) AS t
               FROM events e JOIN t2 ON e.user_id = t2.user_id
               WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) > t2.t
               GROUP BY e.user_id),
        c AS (SELECT 1 AS step_idx, 'view' AS step,
                     (SELECT count(*) FROM t1)::BIGINT AS n_users
              UNION ALL
              SELECT 2, 'click', (SELECT count(*) FROM t2)::BIGINT
              UNION ALL
              SELECT 3, 'purchase', (SELECT count(*) FROM t3)::BIGINT)
        SELECT step_idx, step, n_users,
               CASE WHEN (SELECT count(*) FROM t1) > 0
                    THEN round(n_users::DOUBLE /
                               (SELECT count(*) FROM t1), 6)
                    ELSE 0.0 END AS conv_rate
        FROM c
    """

    # histogram: identical one-order double bucket arithmetic + overflow
    # bins; bin edges recomputed with the same rounding
    s["events_histogram"] = """
        WITH b AS (SELECT CASE WHEN value < -5.0 THEN -1
                               WHEN value >= 15.0 THEN 20
                               ELSE least(
                                   floor((value - (-5.0)) / 20.0 * 20.0),
                                   19)::BIGINT
                          END AS bin
                   FROM events WHERE value IS NOT NULL)
        SELECT bin, round(-5.0 + bin * 1.0, 6) AS bin_lo,
               round(-5.0 + (bin + 1) * 1.0, 6) AS bin_hi,
               count(*)::BIGINT AS n
        FROM b GROUP BY bin
    """

    s["events_psi_drift"] = """
        WITH base AS (SELECT value FROM events
                      WHERE event_type='view' AND value IS NOT NULL),
        cur AS (SELECT value FROM events
                WHERE event_type='purchase' AND value IS NOT NULL),
        hb AS (SELECT CASE WHEN value < -5.0 THEN -1
                           WHEN value >= 15.0 THEN 20
                           ELSE least(floor((value - (-5.0)) / 20.0 * 20.0),
                                      19)::BIGINT END AS bin,
                      count(*) AS n_base
               FROM base GROUP BY 1),
        hc AS (SELECT CASE WHEN value < -5.0 THEN -1
                           WHEN value >= 15.0 THEN 20
                           ELSE least(floor((value - (-5.0)) / 20.0 * 20.0),
                                      19)::BIGINT END AS bin,
                      count(*) AS n_cur
               FROM cur GROUP BY 1),
        t AS (SELECT (SELECT count(*) FROM base)::DOUBLE AS tb,
                     (SELECT count(*) FROM cur)::DOUBLE AS tc),
        j AS (SELECT coalesce(hb.bin, hc.bin) AS bin,
                     greatest(coalesce(n_base, 0) / (SELECT tb FROM t),
                              0.000001) AS p_base,
                     greatest(coalesce(n_cur, 0) / (SELECT tc FROM t),
                              0.000001) AS p_cur
              FROM hb FULL OUTER JOIN hc ON hb.bin = hc.bin)
        SELECT bin, round(p_base, 6) AS p_base, round(p_cur, 6) AS p_cur,
               round((p_cur - p_base) * ln(p_cur / p_base), 6) AS psi_term
        FROM j
    """

    # lang-ID confusion matrix: reuse the marker-hit CASE from text_lang_id
    s["text_lang_confusion"] = f"""
        WITH toks AS ({_TOKS}),
        h AS (SELECT t.doc_id, d.lang,
                     {_h["en"]} AS hits_en, {_h["es"]} AS hits_es,
                     {_h["de"]} AS hits_de, {_h["fr"]} AS hits_fr,
                     {_h["zh"]} AS hits_zh
              FROM toks t JOIN documents d ON t.doc_id = d.doc_id),
        p AS (SELECT lang,
               CASE WHEN greatest(hits_de, hits_en, hits_es, hits_fr, hits_zh) = 0
                        THEN 'und'
                    WHEN hits_de = greatest(hits_de, hits_en, hits_es, hits_fr, hits_zh) THEN 'de'
                    WHEN hits_en = greatest(hits_de, hits_en, hits_es, hits_fr, hits_zh) THEN 'en'
                    WHEN hits_es = greatest(hits_de, hits_en, hits_es, hits_fr, hits_zh) THEN 'es'
                    WHEN hits_fr = greatest(hits_de, hits_en, hits_es, hits_fr, hits_zh) THEN 'fr'
                    ELSE 'zh' END AS lang_pred
              FROM h)
        SELECT lang, lang_pred, count(*)::BIGINT AS n_docs
        FROM p GROUP BY lang, lang_pred
    """

    # numeric profile: same single-row stats
    s["rel_numeric_profile"] = """
        SELECT min(l_quantity) AS min_qty,
               max(l_quantity) AS max_qty,
               round(stddev_pop(l_quantity), 6) AS std_qty,
               round(corr(l_quantity, l_extendedprice), 6)
                 AS corr_qty_price,
               round(corr(l_extendedprice, l_discount), 6)
                 AS corr_price_disc
        FROM lineitem
    """

    # range search: all pairs over the radius, same normalize/dot
    s["knn_range_search"] = f"""
        WITH d AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        n AS (SELECT vec_id, {_NORMALIZE.format(v="v")} AS nv FROM d),
        q AS (SELECT vec_id AS query_id, nv AS qv FROM n
              WHERE vec_id < {KNN_NQ})
        SELECT q.query_id, n.vec_id AS doc_id,
               round(list_dot_product(qv, nv), 6) AS score
        FROM q CROSS JOIN n
        WHERE list_dot_product(qv, nv) >= 0.25
    """

    # pandas_udf surface: softclip = v/(1+|v|); weighted mean as the
    # combinable expression twin
    s["events_weighted_avg_udaf"] = """
        WITH e AS (SELECT event_type,
                          value / (1.0 + abs(value)) AS v,
                          abs(value) AS w
                   FROM events)
        SELECT event_type,
               round(sum(CASE WHEN v IS NOT NULL AND w IS NOT NULL
                              THEN v * w END)
                     / sum(CASE WHEN v IS NOT NULL AND w IS NOT NULL
                                THEN w END), 6) AS wmean,
               count(*)::BIGINT AS n_events
        FROM e GROUP BY event_type
    """

    # python datasource: same md5-derived token generation, row-exact
    s["io_python_datasource"] = f"""
        WITH idx AS (SELECT unnest(range(500)) AS i),
        tok AS (SELECT i, unnest(range(
                    5 + ({_MD5L.format(x="'len:' || i::VARCHAR")} % 6)
                )) AS j
                FROM idx)
        SELECT i::BIGINT AS doc_id,
               string_agg(
                   'w' || ({_MD5L.format(x="i::VARCHAR || ':' || j::VARCHAR")}
                           % 997),
                   ' ' ORDER BY j) AS text
        FROM tok GROUP BY i
    """

    s["events_cuped"] = """
        WITH e AS (SELECT user_id, epoch_ns(ts) AS ts_ns,
                          round(value * 100)::BIGINT AS cents
                   FROM events),
        m AS (SELECT (min(ts_ns) + max(ts_ns)) // 2 AS mid
              FROM e),
        pu AS (SELECT user_id,
                      sum(CASE WHEN ts_ns < mid THEN 1 ELSE 0
                          END)::BIGINT AS x,
                      sum(CASE WHEN ts_ns >= mid THEN cents ELSE 0
                          END)::BIGINT AS y
               FROM e, m GROUP BY user_id),
        av AS (SELECT CAST('0x' || substr(md5(user_id::VARCHAR), 1, 1)
                           AS INT) % 2 AS variant, x, y
               FROM pu),
        g AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
                     sum(y)::BIGINT AS sy, sum(x * y)::BIGINT AS sxy,
                     sum(x * x)::BIGINT AS sxx,
                     sum(y * y)::BIGINT AS syy
              FROM av),
        st AS (SELECT
                 CASE WHEN sxx / n::DOUBLE - (sx/n::DOUBLE)*(sx/n::DOUBLE)
                          > 0
                      THEN (sxy / n::DOUBLE - (sx/n::DOUBLE)*(sy/n::DOUBLE))
                           / (sxx / n::DOUBLE
                              - (sx/n::DOUBLE)*(sx/n::DOUBLE))
                      ELSE 0.0 END AS theta,
                 sx / n::DOUBLE AS gx,
                 syy / n::DOUBLE - (sy/n::DOUBLE)*(sy/n::DOUBLE) AS var_y,
                 sxy / n::DOUBLE - (sx/n::DOUBLE)*(sy/n::DOUBLE) AS cov,
                 sxx / n::DOUBLE - (sx/n::DOUBLE)*(sx/n::DOUBLE) AS var_x
               FROM g),
        pv AS (SELECT variant, count(*)::BIGINT AS n,
                      sum(x)::BIGINT AS sx_v, sum(y)::BIGINT AS sy_v
               FROM av GROUP BY variant)
        SELECT variant, n,
               round(sy_v / n::DOUBLE / 100.0, 6) AS mean_y,
               round((sy_v / n::DOUBLE
                      - theta * (sx_v / n::DOUBLE - gx)) / 100.0, 6)
                   AS mean_y_cuped,
               round(theta / 100.0, 6) AS theta,
               round(CASE WHEN var_y > 0
                          THEN (CASE WHEN var_x > 0
                                     THEN cov * cov / var_x
                                     ELSE 0.0 END) / var_y
                          ELSE 0.0 END, 6) AS var_reduction
        FROM pv, st
    """

    s["events_activation"] = """
        WITH ud AS (SELECT DISTINCT user_id,
                           epoch_ns(ts) // 86400000000000 AS day
                    FROM events),
        f AS (SELECT user_id, min(day) AS d0 FROM ud GROUP BY user_id),
        fl AS (SELECT ud.user_id, f.d0,
                      max(CASE WHEN ud.day = f.d0 + 1 THEN 1 ELSE 0
                          END) AS d1,
                      max(CASE WHEN ud.day > f.d0
                                AND ud.day <= f.d0 + 7 THEN 1 ELSE 0
                          END) AS d7
               FROM ud JOIN f USING (user_id)
               GROUP BY ud.user_id, f.d0)
        SELECT d0 AS cohort_day, count(*)::BIGINT AS n_new_users,
               sum(d1)::BIGINT AS n_d1, sum(d7)::BIGINT AS n_d7,
               round(sum(d1)::DOUBLE / count(*), 6) AS d1_rate,
               round(sum(d7)::DOUBLE / count(*), 6) AS d7_rate
        FROM fl GROUP BY d0
    """

    s["events_bounce_rate"] = f"""
        WITH e AS (SELECT user_id, event_id, epoch_ns(ts) AS ts_ns
                   FROM events),
        l AS (SELECT *, CASE WHEN ts_ns - lag(ts_ns) OVER w
                                  > {SESSION_GAP_SEC * 1_000_000_000}
                             THEN 1 ELSE 0 END AS new_session
              FROM e WINDOW w AS (PARTITION BY user_id
                                  ORDER BY ts_ns, event_id)),
        st AS (SELECT *, sum(new_session) OVER (PARTITION BY user_id
                             ORDER BY ts_ns, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_seq
               FROM l),
        sess AS (SELECT user_id, session_seq,
                        min(ts_ns) // 86400000000000 AS day,
                        count(*) AS n_events
                 FROM st GROUP BY 1, 2)
        SELECT day, count(*)::BIGINT AS n_sessions,
               sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)::BIGINT
                   AS n_bounces,
               round(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0
                         END)::DOUBLE / count(*), 6) AS bounce_rate
        FROM sess GROUP BY day
    """

    s["rel_abc_analysis"] = """
        WITH pp AS (
            SELECT l_partkey,
                   sum(round(l_extendedprice * (1.0 - l_discount)
                             * 100)::BIGINT)::BIGINT AS rev_c
            FROM lineitem GROUP BY 1),
        r AS (SELECT rev_c,
                     sum(rev_c) OVER (ORDER BY rev_c DESC, l_partkey
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW)::BIGINT AS cum_c,
                     sum(rev_c) OVER ()::BIGINT AS tot_c
              FROM pp),
        c AS (SELECT rev_c, tot_c,
                     CASE WHEN cum_c * 100 <= tot_c * 80 THEN 'A'
                          WHEN cum_c * 100 <= tot_c * 95 THEN 'B'
                          ELSE 'C' END AS abc
              FROM r)
        SELECT abc, count(*)::BIGINT AS n_parts,
               round(sum(rev_c)::DOUBLE / max(tot_c), 6)
                   AS revenue_share
        FROM c GROUP BY abc
    """

    s["rel_weighted_median"] = """
        WITH by_p AS (
            SELECT l_returnflag AS flag,
                   round(l_extendedprice * 100)::BIGINT AS price_c,
                   sum(round(l_quantity)::BIGINT)::BIGINT AS w
            FROM lineitem GROUP BY 1, 2),
        cum AS (
            SELECT flag, price_c,
                   sum(w) OVER (PARTITION BY flag ORDER BY price_c
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW)::BIGINT AS cw,
                   sum(w) OVER (PARTITION BY flag)::BIGINT AS tw
            FROM by_p)
        SELECT flag,
               min(price_c) / 100.0 AS weighted_median,
               max(tw) AS total_weight
        FROM cum WHERE cw * 2 >= tw
        GROUP BY flag
    """

    s["doc_balanced_downsample"] = """
        WITH d AS (SELECT doc_id, coalesce(lang, '?') AS lang
                   FROM documents),
        mn AS (SELECT min(n) AS min_n FROM
               (SELECT count(*) AS n FROM d GROUP BY lang) t),
        r AS (SELECT doc_id, lang,
                     row_number() OVER (PARTITION BY lang
                         ORDER BY md5('bal:' || doc_id::VARCHAR),
                                  doc_id) AS rk
              FROM d)
        SELECT doc_id, lang, rk::INT AS rk
        FROM r, mn WHERE rk <= min_n
    """

    s["events_winsorized"] = """
        WITH v AS (SELECT round(value * 100)::BIGINT AS c
                   FROM events WHERE value IS NOT NULL),
        b AS (SELECT quantile_cont(c, 0.05) AS lo,
                     quantile_cont(c, 0.95) AS hi
              FROM v),
        w AS (SELECT c, least(greatest(c::DOUBLE, lo), hi) AS wv
              FROM v, b)
        SELECT count(*)::BIGINT AS n,
               round(avg(c::DOUBLE) / 100.0, 6) AS mean_raw,
               round(stddev_pop(c::DOUBLE) / 100.0, 6) AS std_raw,
               round(avg(wv) / 100.0, 6) AS mean_winsorized,
               round(stddev_pop(wv) / 100.0, 6) AS std_winsorized
        FROM w
    """

    s["events_bollinger"] = """
        WITH daily AS (
            SELECT epoch_ns(ts) // 86400000000000 AS day,
                   count(*)::BIGINT AS y
            FROM events GROUP BY 1),
        r AS (SELECT day, y,
                     count(*) OVER w7::BIGINT AS n_w,
                     sum(y) OVER w7::BIGINT AS s,
                     sum(y * y) OVER w7::BIGINT AS q
              FROM daily
              WINDOW w7 AS (ORDER BY day ROWS BETWEEN 6 PRECEDING
                            AND CURRENT ROW)),
        b AS (SELECT day, y, n_w,
                     s::DOUBLE / n_w AS mean,
                     sqrt(q::DOUBLE / n_w
                          - (s::DOUBLE / n_w) * (s::DOUBLE / n_w))
                         AS sigma
              FROM r)
        SELECT day, y,
               round(CASE WHEN n_w = 7 THEN mean END, 6) AS ma7,
               round(CASE WHEN n_w = 7
                          THEN mean + 2.0 * sigma END, 6) AS upper,
               round(CASE WHEN n_w = 7
                          THEN mean - 2.0 * sigma END, 6) AS lower,
               CASE WHEN n_w = 7
                    THEN (y::DOUBLE > mean + 2.0 * sigma
                          OR y::DOUBLE < mean - 2.0 * sigma)::INT
               END AS outside
        FROM b
    """

    s["events_cohort_ltv"] = """
        WITH e AS (SELECT user_id, epoch_ns(ts) AS ts_ns,
                          round(value * 100)::BIGINT AS c
                   FROM events),
        fw AS (SELECT user_id,
                      min(ts_ns) // 604800000000000 AS cohort_w
               FROM e GROUP BY user_id),
        rev AS (SELECT cohort_w,
                       (ts_ns // 604800000000000) - cohort_w AS age_w,
                       sum(c)::BIGINT AS rev_c
                FROM e JOIN fw USING (user_id)
                GROUP BY 1, 2),
        sz AS (SELECT cohort_w, count(*)::BIGINT AS n_users
               FROM fw GROUP BY 1)
        SELECT cohort_w, age_w, n_users,
               round(sum(rev_c) OVER (PARTITION BY cohort_w
                         ORDER BY age_w
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW)::DOUBLE
                     / n_users / 100.0, 6) AS ltv_per_user
        FROM rev JOIN sz USING (cohort_w)
    """

    s["events_rfm"] = """
        WITH e AS (SELECT user_id, epoch_ns(ts) AS ts_ns,
                          round(value * 100)::BIGINT AS c
                   FROM events),
        mx AS (SELECT max(ts_ns) AS mx_ns FROM e),
        per AS (SELECT user_id,
                       (mx_ns - max(ts_ns)) // 86400000000000
                           AS recency_d,
                       count(*)::BIGINT AS freq,
                       sum(c)::BIGINT AS monetary_c
                FROM e, mx GROUP BY user_id, mx_ns),
        sc AS (SELECT user_id, monetary_c,
                      ntile(5) OVER (ORDER BY recency_d, user_id)
                          AS r_score,
                      ntile(5) OVER (ORDER BY freq, user_id) AS f_score,
                      ntile(5) OVER (ORDER BY monetary_c, user_id)
                          AS m_score
               FROM per)
        SELECT (r_score * 100 + f_score * 10 + m_score)::INT
                   AS rfm_segment,
               count(*)::BIGINT AS n_users,
               round(avg(monetary_c::DOUBLE) / 100.0, 6) AS mean_monetary
        FROM sc GROUP BY 1
    """

    s["events_time_to_convert"] = """
        WITH per AS (
            SELECT user_id,
                   min(CASE WHEN event_type = 'view'
                            THEN epoch_ns(ts) END) AS fv,
                   min(CASE WHEN event_type = 'purchase'
                            THEN epoch_ns(ts) END) AS fp
            FROM events GROUP BY user_id),
        conv AS (
            SELECT (fp - fv) // 1000000 AS latency_ms
            FROM per
            WHERE fv IS NOT NULL AND fp IS NOT NULL AND fp > fv)
        SELECT count(*)::BIGINT AS n_converted,
               quantile_cont(latency_ms, 0.25) AS p25_ms,
               quantile_cont(latency_ms, 0.5) AS p50_ms,
               quantile_cont(latency_ms, 0.75) AS p75_ms,
               quantile_cont(latency_ms, 0.9) AS p90_ms
        FROM conv
    """

    s["doc_k_anonymity"] = """
        SELECT coalesce(lang, '?') AS lang,
               coalesce(source, '?') AS source,
               count(*)::BIGINT AS class_size,
               count(DISTINCT least(n_chars * 10 // 4000,
                                    9))::BIGINT AS l_distinct,
               (count(*) < 5)::INT AS k_violation,
               (count(DISTINCT least(n_chars * 10 // 4000, 9)) < 2)::INT
                   AS l_violation
        FROM documents
        GROUP BY 1, 2
    """

    s["events_kendall_tau"] = """
        WITH daily AS (
            SELECT epoch_ns(ts) // 86400000000000 AS day,
                   count(*)::BIGINT AS x,
                   sum(round(value * 100)::BIGINT)::BIGINT AS y
            FROM events GROUP BY 1),
        p AS (SELECT sign((b.x - a.x)::DOUBLE)::BIGINT AS sx,
                     sign((b.y - a.y)::DOUBLE)::BIGINT AS sy
              FROM daily a JOIN daily b ON a.day < b.day),
        agg AS (SELECT count(*)::BIGINT AS n0,
                       sum(sx * sy)::BIGINT AS s,
                       sum(CASE WHEN sx = 0 THEN 1 ELSE 0
                           END)::BIGINT AS tx,
                       sum(CASE WHEN sy = 0 THEN 1 ELSE 0
                           END)::BIGINT AS ty
                FROM p)
        SELECT n0, s, tx, ty,
               round(CASE WHEN (n0 - tx) > 0 AND (n0 - ty) > 0
                          THEN s / sqrt((n0 - tx)::DOUBLE * (n0 - ty))
                     END, 6) AS tau_b
        FROM agg
    """

    s["events_trend_mk"] = """
        WITH daily AS (
            SELECT epoch_ns(ts) // 86400000000000 AS day,
                   count(*)::BIGINT AS y
            FROM events GROUP BY 1),
        p AS (SELECT a.y AS yi, b.y AS yj, a.day AS di, b.day AS dj
              FROM daily a JOIN daily b ON a.day < b.day),
        ps AS (SELECT sum(CASE WHEN yj > yi THEN 1
                               WHEN yj < yi THEN -1 ELSE 0
                          END)::BIGINT AS s_stat,
                      quantile_cont((yj - yi)::DOUBLE / (dj - di), 0.5)
                          AS theil_sen
               FROM p),
        nd AS (SELECT count(*)::BIGINT AS n_days FROM daily),
        ties AS (SELECT coalesce(sum(t * (t - 1) * (2 * t + 5)), 0)
                     AS tie_sum
                 FROM (SELECT count(*) AS t FROM daily GROUP BY y) g),
        v AS (SELECT (n_days::DOUBLE * (n_days - 1.0)
                      * (2.0 * n_days + 5.0) - tie_sum) / 18.0 AS var_s,
                     n_days, s_stat, theil_sen
              FROM ps, nd, ties)
        SELECT n_days, s_stat,
               round(CASE WHEN var_s > 0 AND s_stat <> 0
                          THEN (s_stat - sign(s_stat::DOUBLE))
                               / sqrt(var_s)
                          WHEN var_s > 0 THEN 0.0 END, 6) AS z_stat,
               round(theil_sen, 6) AS theil_sen_slope
        FROM v
    """

    s["events_welch_t"] = """
        WITH e AS (
            SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                   END AS p,
                   round(value * 100)::BIGINT AS c
            FROM events WHERE event_type IN ('purchase', 'view')),
        g AS (SELECT
                sum(p)::BIGINT AS n1,
                sum(CASE WHEN p = 1 THEN c ELSE 0 END)::BIGINT AS s1,
                sum(CASE WHEN p = 1 THEN c * c ELSE 0 END)::BIGINT AS q1,
                sum(1 - p)::BIGINT AS n2,
                sum(CASE WHEN p = 0 THEN c ELSE 0 END)::BIGINT AS s2,
                sum(CASE WHEN p = 0 THEN c * c ELSE 0 END)::BIGINT AS q2
              FROM e),
        x AS (SELECT n1, n2,
                     s1 / n1::DOUBLE AS m1, s2 / n2::DOUBLE AS m2,
                     (q1 - n1 * (s1/n1::DOUBLE)*(s1/n1::DOUBLE))
                         / (n1 - 1.0) AS v1,
                     (q2 - n2 * (s2/n2::DOUBLE)*(s2/n2::DOUBLE))
                         / (n2 - 1.0) AS v2
              FROM g),
        y AS (SELECT *, v1 / n1 + v2 / n2 AS se2 FROM x)
        SELECT n1, n2,
               round(m1 / 100.0, 6) AS mean_1,
               round(m2 / 100.0, 6) AS mean_2,
               round(CASE WHEN n1 > 1 AND n2 > 1 AND se2 > 0
                          THEN (m1 - m2) / sqrt(se2) END, 6) AS t_stat,
               round(CASE WHEN n1 > 1 AND n2 > 1 AND se2 > 0
                          THEN se2 * se2
                               / ((v1/n1)*(v1/n1)/(n1 - 1.0)
                                  + (v2/n2)*(v2/n2)/(n2 - 1.0))
                     END, 6) AS welch_df
        FROM y
    """

    s["events_anova"] = """
        WITH e AS (SELECT event_type,
                          round(value * 100)::BIGINT AS c
                   FROM events),
        g AS (SELECT event_type, count(*)::BIGINT AS n_g,
                     sum(c)::BIGINT AS sy, sum(c * c)::BIGINT AS syy
              FROM e GROUP BY event_type),
        t AS (SELECT sum(n_g)::DOUBLE AS n, sum(sy)::DOUBLE AS tsy,
                     count(*)::DOUBLE AS k
              FROM g),
        x AS (SELECT event_type, n_g,
                     sy / n_g::DOUBLE AS mean_g,
                     syy::DOUBLE - n_g * (sy/n_g::DOUBLE)*(sy/n_g::DOUBLE)
                         AS ssw_term,
                     n_g * (sy/n_g::DOUBLE - tsy/n)
                         * (sy/n_g::DOUBLE - tsy/n) AS ssb_term
              FROM g, t),
        s2 AS (SELECT sum(ssb_term) AS ssb, sum(ssw_term) AS ssw FROM x)
        SELECT event_type, n_g,
               round(mean_g / 100.0, 6) AS mean_value,
               round(CASE WHEN (SELECT k FROM t) > 1
                           AND (SELECT n FROM t) > (SELECT k FROM t)
                           AND (SELECT ssw FROM s2) > 0
                          THEN ((SELECT ssb FROM s2)
                                / ((SELECT k FROM t) - 1.0))
                               / ((SELECT ssw FROM s2)
                                  / ((SELECT n FROM t)
                                     - (SELECT k FROM t)))
                     END, 6) AS f_stat
        FROM x
    """

    # Cramér's V: same contingency derivation as events_chi_square; the
    # V computation consumes the ROUNDED chi2_total (as the Spark side
    # does, reading the cell frame's published column)
    s["events_cramers_v"] = """
        WITH cells AS (
            SELECT event_type AS a,
                   (dayofweek(ts::TIMESTAMP) + 1)::INT AS b,
                   count(*) AS observed
            FROM events GROUP BY 1, 2),
        rt AS (SELECT a, sum(observed) AS row_tot FROM cells GROUP BY a),
        ct AS (SELECT b, sum(observed) AS col_tot FROM cells GROUP BY b),
        tot AS (SELECT sum(observed) AS grand FROM cells),
        y AS (
            SELECT a, b, observed,
                   (observed - row_tot::DOUBLE * col_tot / grand)
                   * (observed - row_tot::DOUBLE * col_tot / grand)
                   / (row_tot::DOUBLE * col_tot / grand) AS contrib
            FROM cells JOIN rt USING(a) JOIN ct USING(b), tot),
        s2 AS (SELECT sum(observed)::BIGINT AS n,
                      round(sum(contrib), 6) AS chi2,
                      count(DISTINCT a) AS r,
                      count(DISTINCT b) AS c
               FROM y)
        SELECT n, chi2,
               ((r - 1) * (c - 1))::BIGINT AS dof,
               round(CASE WHEN n > 0 AND least(r - 1, c - 1) > 0
                          THEN sqrt(chi2 / (n::DOUBLE
                                            * least(r - 1, c - 1))) END,
                     6) AS cramers_v
        FROM s2
    """

    s["events_ks_test"] = """
        WITH b AS (
            SELECT round(value, 2) AS v,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g1
            FROM events
            WHERE event_type IN ('purchase', 'view') AND value IS NOT NULL),
        by_val AS (
            SELECT v, sum(g1)::BIGINT AS n1_v,
                   sum(1 - g1)::BIGINT AS n2_v
            FROM b GROUP BY v),
        cum AS (
            SELECT sum(n1_v) OVER wc::BIGINT AS c1,
                   sum(n2_v) OVER wc::BIGINT AS c2,
                   sum(n1_v) OVER ()::BIGINT AS n1,
                   sum(n2_v) OVER ()::BIGINT AS n2
            FROM by_val
            WINDOW wc AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW)),
        agg AS (
            SELECT max(n1) AS n1, max(n2) AS n2,
                   max(abs(c1::DOUBLE / n1 - c2::DOUBLE / n2)) AS d
            FROM cum)
        SELECT n1, n2, round(d, 6) AS d_stat,
               round(CASE WHEN n1 > 0 AND n2 > 0
                          THEN d * sqrt(n1::DOUBLE * n2 / (n1 + n2)) END,
                     6) AS lambda_stat
        FROM agg
    """

    s["text_spearman"] = f"""
        WITH toks AS ({_TOKS}),
        b AS (SELECT d.n_chars::BIGINT AS x,
                     len(t.tokens)::BIGINT AS y
              FROM documents d JOIN toks t ON d.doc_id = t.doc_id
              WHERE d.n_chars IS NOT NULL),
        r AS (SELECT
                rank() OVER (ORDER BY x)
                    + (count(*) OVER (PARTITION BY x) - 1) / 2.0 AS rx,
                rank() OVER (ORDER BY y)
                    + (count(*) OVER (PARTITION BY y) - 1) / 2.0 AS ry
              FROM b)
        SELECT count(*)::BIGINT AS n, round(corr(rx, ry), 6) AS rho
        FROM r
    """

    s["doc_neyman_allocation"] = """
        WITH by_s AS (
            SELECT source, count(*)::BIGINT AS n_h,
                   sum(n_chars)::BIGINT AS sx,
                   sum(n_chars * n_chars)::BIGINT AS sxx
            FROM documents GROUP BY source),
        x AS (SELECT source, n_h,
                     sx / n_h::DOUBLE AS mean_chars,
                     sqrt(greatest(sxx / n_h::DOUBLE
                                   - (sx/n_h::DOUBLE)*(sx/n_h::DOUBLE),
                                   0.0)) AS sigma
              FROM by_s)
        SELECT source, n_h,
               round(mean_chars, 6) AS mean_chars,
               round(sigma, 6) AS sigma_chars,
               round(n_h * sigma / sum(n_h * sigma) OVER (), 6)
                   AS neyman_share,
               round(n_h / sum(n_h::DOUBLE) OVER (), 6)
                   AS proportional_share
        FROM x
    """

    # incremental join view: the oracle is the FULL recompute — hash
    # equality proves the three delta terms partition the new pairs
    s["rel_incremental_join"] = """
        SELECT c_custkey, c_mktsegment, o_orderkey,
               round(o_totalprice, 2) AS o_totalprice
        FROM customer JOIN orders ON c_custkey = o_custkey
    """

    s["events_log_rank"] = """
        WITH pu AS (SELECT user_id,
                           (max(epoch_ns(ts)) - min(epoch_ns(ts)))
                               // 3600000000000 AS lifetime,
                           max(epoch_ns(ts)) AS last_ns
                    FROM events GROUP BY user_id),
        mx AS (SELECT max(epoch_ns(ts)) AS corpus_max_ns FROM events),
        fl AS (SELECT lifetime,
                      CASE WHEN corpus_max_ns - last_ns
                                < 72 * 3600000000000
                           THEN 0 ELSE 1 END AS death,
                      CAST('0x' || substr(md5(user_id::VARCHAR), 1, 1)
                           AS INT) % 2 AS variant
               FROM pu, mx),
        bt AS (SELECT lifetime AS t,
                      sum(CASE WHEN variant = 0 THEN death ELSE 0
                          END)::BIGINT AS d_a,
                      sum(death)::BIGINT AS d,
                      sum(CASE WHEN variant = 0 THEN 1 ELSE 0
                          END)::BIGINT AS end_a,
                      count(*)::BIGINT AS end_all
               FROM fl GROUP BY lifetime),
        risk AS (SELECT t, d_a, d,
                        sum(end_a) OVER wk::BIGINT AS n_a,
                        sum(end_all) OVER wk::BIGINT AS n
                 FROM bt
                 WINDOW wk AS (ORDER BY t ROWS BETWEEN CURRENT ROW
                               AND UNBOUNDED FOLLOWING)),
        f AS (SELECT * FROM risk WHERE d > 0),
        agg AS (SELECT sum(d_a)::BIGINT AS deaths_a,
                       sum(d - d_a)::BIGINT AS deaths_b,
                       sum(d_a - n_a::DOUBLE * d / n) AS o_minus_e,
                       sum(CASE WHEN n > 1
                                THEN d::DOUBLE * (n_a::DOUBLE / n)
                                     * (1.0 - n_a::DOUBLE / n)
                                     * (n - d) / (n - 1.0)
                                ELSE 0.0 END) AS variance
                FROM f)
        SELECT deaths_a, deaths_b,
               round(o_minus_e, 6) AS o_minus_e,
               round(variance, 6) AS variance,
               round(CASE WHEN variance > 0
                          THEN o_minus_e / sqrt(variance) END, 6)
                   AS z_stat
        FROM agg
    """

    s["events_did"] = """
        WITH e AS (SELECT user_id, epoch_ns(ts) AS ts_ns,
                          round(value * 100)::BIGINT AS cents
                   FROM events),
        m AS (SELECT (min(ts_ns) + max(ts_ns)) // 2 AS mid
              FROM e),
        per AS (SELECT user_id,
                       CASE WHEN ts_ns >= mid THEN 1 ELSE 0 END AS post,
                       sum(cents)::BIGINT AS y
                FROM e, m GROUP BY 1, 2),
        cell AS (SELECT CAST('0x' || substr(md5(user_id::VARCHAR), 1, 1)
                             AS INT) % 2 AS variant,
                        post, count(*)::BIGINT AS n_users,
                        sum(y)::BIGINT AS sy
                 FROM per GROUP BY 1, 2),
        mm AS (SELECT variant, post, n_users,
                      sy / n_users::DOUBLE / 100.0 AS mean_raw
               FROM cell),
        d AS (SELECT
                (max(CASE WHEN variant = 1 AND post = 1
                          THEN mean_raw END)
                 - max(CASE WHEN variant = 1 AND post = 0
                            THEN mean_raw END))
                - (max(CASE WHEN variant = 0 AND post = 1
                            THEN mean_raw END)
                   - max(CASE WHEN variant = 0 AND post = 0
                              THEN mean_raw END)) AS did
              FROM mm)
        SELECT variant, post, n_users,
               round(mean_raw, 6) AS mean_value,
               round((SELECT did FROM d), 6) AS did_estimate
        FROM mm
    """

    s["rel_entity_resolution"] = """
        WITH RECURSIVE p1 AS (
            SELECT a.c_custkey AS a_id, b.c_custkey AS b_id
            FROM customer a JOIN customer b
              ON substr(a.c_name, 1, 16) = substr(b.c_name, 1, 16)
             AND a.c_custkey < b.c_custkey
             AND levenshtein(a.c_name, b.c_name) <= 1),
        sn AS (
            SELECT c_custkey AS a_id, c_name AS a_key,
                   substr(c_name, 10, 4) AS p
            FROM customer),
        sl AS (
            SELECT a_id, a_key,
                   lead(a_id, 1) OVER w AS id1,
                   lead(a_key, 1) OVER w AS k1,
                   lead(a_id, 2) OVER w AS id2,
                   lead(a_key, 2) OVER w AS k2
            FROM sn WINDOW w AS (PARTITION BY p ORDER BY a_key, a_id)),
        p2 AS (
            SELECT a_id, id1 AS b_id FROM sl
            WHERE id1 IS NOT NULL AND levenshtein(a_key, k1) <= 2
            UNION ALL
            SELECT a_id, id2 FROM sl
            WHERE id2 IS NOT NULL AND levenshtein(a_key, k2) <= 2),
        pairs AS (SELECT DISTINCT a_id, b_id FROM
                  (SELECT a_id, b_id FROM p1
                   UNION ALL SELECT a_id, b_id FROM p2) u),
        e AS (SELECT a_id AS src, b_id AS dst FROM pairs
              UNION ALL SELECT b_id, a_id FROM pairs),
        reach AS (
            SELECT c_custkey AS src, c_custkey AS dst FROM customer
            UNION
            SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src
        )
        SELECT src AS c_custkey, min(dst) AS entity_id
        FROM reach GROUP BY src
    """

    s["events_forecast_backtest"] = """
        WITH daily AS (
            SELECT epoch_ns(ts) // 86400000000000 AS day,
                   count(*) AS y
            FROM events GROUP BY 1),
        lagged AS (
            SELECT day, y,
                   lag(y, 1) OVER (ORDER BY day) AS naive,
                   lag(y, 7) OVER (ORDER BY day) AS snaive
            FROM daily)
        SELECT 'naive' AS method, count(*)::BIGINT AS n_days,
               round(avg(abs(y - naive)), 6) AS mae,
               round(avg(abs(y - naive)
                         / greatest(y, 1)::DOUBLE), 6) AS mape
        FROM lagged WHERE naive IS NOT NULL
        UNION ALL
        SELECT 'seasonal_naive', count(*)::BIGINT,
               round(avg(abs(y - snaive)), 6),
               round(avg(abs(y - snaive) / greatest(y, 1)::DOUBLE), 6)
        FROM lagged WHERE snaive IS NOT NULL
    """

    # trigram search: the oracle mirrors the index route (postings
    # intersection then exact verify), pattern trigrams inlined as the
    # same literal list the Spark side pushes down
    _tg_pats = sorted(
        {"merge batch"[i:i + 3] for i in range(len("merge batch") - 2)}
    )
    _tg_list = "[" + ", ".join(f"'{g}'" for g in _tg_pats) + "]"
    s["text_trigram_search"] = f"""
        WITH tg AS (
            SELECT doc_id, unnest(list_distinct(
                [substr(lower(text), i, 3)
                 FOR i IN range(1, greatest(length(lower(text)) - 1, 1))]
            )) AS trigram
            FROM documents),
        cand AS (
            SELECT doc_id FROM tg
            WHERE list_contains({_tg_list}, trigram)
            GROUP BY doc_id
            HAVING count(DISTINCT trigram) = {len(_tg_pats)})
        SELECT d.doc_id, d.n_chars
        FROM documents d JOIN cand USING (doc_id)
        WHERE contains(lower(d.text), 'merge batch')
    """

    # maintained-trigram-index serving: the lifecycle (two ingests +
    # tombstoned deletes + read-back) must equal the one-shot trigram
    # route over the SURVIVORS — same postings-intersection SQL with
    # the deleted ids filtered at the source
    s["retrieval_trigram_incremental"] = f"""
        WITH d AS (SELECT * FROM documents WHERE doc_id % 10 <> 3),
        tg AS (
            SELECT doc_id, unnest(list_distinct(
                [substr(lower(text), i, 3)
                 FOR i IN range(1, greatest(length(lower(text)) - 1, 1))]
            )) AS trigram
            FROM d),
        cand AS (
            SELECT doc_id FROM tg
            WHERE list_contains({_tg_list}, trigram)
            GROUP BY doc_id
            HAVING count(DISTINCT trigram) = {len(_tg_pats)})
        SELECT d.doc_id, d.n_chars
        FROM d JOIN cand USING (doc_id)
        WHERE contains(lower(d.text), 'merge batch')
    """

    # streaming python datasource: identical generator to the batch
    # source — the oracle is the SAME md5 row synthesis; hash equality
    # across 3 micro-batch boundaries IS the exactly-once check
    s["io_python_streamsource"] = s["io_python_datasource"]

    # pure-SQL surface twin
    s["rel_sql_interface"] = """
        SELECT n.n_name, count(*)::BIGINT AS n_suppliers,
               round(sum(s.s_acctbal), 2) AS total_acctbal,
               round(avg(s.s_acctbal), 4) AS avg_acctbal
        FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        GROUP BY n.n_name
        HAVING count(*) >= 1
    """

    # frame sampling: generate_series every 250ms over the clamped span
    s["multimodal_framesample"] = """
        SELECT doc_id AS media_id, unnest(
            generate_series(0, greatest((n_chars % 2000 + 1) - 1, 0), 250)
        )::BIGINT AS frame_ts_ms
        FROM documents
    """

    # resize passthrough: md5 of the original bytes, stamped dims
    s["multimodal_resize"] = """
        SELECT doc_id AS media_id, md5(text) AS content_md5,
               64::INT AS width, 48::INT AS height
        FROM documents
    """

    # Q10 shape: returned-item revenue per customer, top 20
    s["rel_returned_items"] = """
        SELECT c.c_custkey, c.c_name, n.n_name, c.c_mktsegment,
               round(sum(l.l_extendedprice * (1.0 - l.l_discount)), 2)
                 AS revenue,
               count(*)::BIGINT AS n_items
        FROM lineitem l
          JOIN orders o ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= '1997-01-01'
          AND o.o_orderdate < '1998-01-01'
        GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_mktsegment
        ORDER BY revenue DESC, c.c_custkey
        LIMIT 20
    """

    # blocked fuzzy pairs: same prefix block + levenshtein threshold
    s["rel_name_match"] = """
        WITH b AS (SELECT c_custkey AS id, c_name,
                          substr(c_name, 1, 16) AS blk
                   FROM customer)
        SELECT a.id AS a_id, x.id AS b_id,
               a.c_name AS a_key, x.c_name AS b_key,
               levenshtein(a.c_name, x.c_name)::INT AS distance
        FROM b a JOIN b x ON a.blk = x.blk AND a.id < x.id
        WHERE levenshtein(a.c_name, x.c_name) <= 1
    """

    # Q18 shape: HAVING aggregate broadcast back, customer attribution
    s["rel_big_spenders"] = """
        WITH big AS (SELECT l_orderkey, sum(l_quantity) AS total_qty
                     FROM lineitem GROUP BY l_orderkey
                     HAVING sum(l_quantity) > 250)
        SELECT c.c_name, c.c_custkey, o.o_orderkey,
               o.o_orderdate::DATE::VARCHAR AS o_orderdate,
               round(o.o_totalprice, 2) AS o_totalprice,
               round(b.total_qty, 2) AS total_qty
        FROM orders o JOIN big b ON o.o_orderkey = b.l_orderkey
                      JOIN customer c ON o.o_custkey = c.c_custkey
    """

    # schema evolution: v1 slice lacks n_chars -> NULL after mergeSchema
    s["io_schema_evolution"] = """
        SELECT doc_id, source, NULL::BIGINT AS n_chars
        FROM documents WHERE doc_id < 100
        UNION ALL
        SELECT doc_id, source, n_chars
        FROM documents WHERE doc_id >= 100 AND doc_id < 200
    """

    # nearest as-of: closest view either side, |delta| ties -> backward,
    # equal-ts ties within a side -> greatest event_id
    s["events_asof_nearest"] = """
        WITH clicks AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS ts_us
                        FROM events WHERE event_type = 'click'),
        views AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS ts_us, value
                  FROM events WHERE event_type = 'view')
        SELECT c.event_id, c.user_id, c.ts_us,
               v.ts_us AS view_ts_us,
               v.event_id AS view_event_id,
               round(v.value, 6) AS view_value
        FROM clicks c LEFT JOIN LATERAL (
            SELECT * FROM views v
            WHERE v.user_id = c.user_id
            ORDER BY abs(v.ts_us - c.ts_us) ASC,
                     (v.ts_us > c.ts_us) ASC,
                     v.event_id DESC
            LIMIT 1
        ) v ON TRUE
    """

    # CDC chunking: same md5 window-hash cut set, boundary-pair slices
    _CDC_W, _CDC_D = 4, 8
    s["text_cdc_chunks"] = rf"""
        WITH toks AS ({_TOKS}),
        b AS (SELECT doc_id, tokens,
                     [0] || [c FOR c IN
                        [i + {_CDC_W} FOR i IN
                           range(0, greatest(len(tokens) - {_CDC_W} + 1, 0))
                         IF ('0x' || substr(md5(array_to_string(
                               tokens[i+1:i+{_CDC_W}], ' ')), 1, 15))::BIGINT
                              % {_CDC_D} = 0]
                      IF c <> len(tokens)] || [len(tokens)] AS bounds
              FROM toks WHERE len(tokens) > 0),
        ch AS (SELECT doc_id, tokens, bounds,
                      unnest(range(1, len(bounds))) AS j
               FROM b)
        SELECT doc_id, (j - 1)::INT AS chunk_seq,
               array_to_string(tokens[bounds[j]+1:bounds[j+1]], ' ')
                 AS chunk_text,
               ('0x' || substr(md5(array_to_string(
                   tokens[bounds[j]+1:bounds[j+1]], ' ')), 1, 15))::BIGINT
                 AS chunk_hash,
               (bounds[j+1] - bounds[j])::INT AS n_tokens
        FROM ch
    """

    # cross-doc CDC chunk dedup: wrap the chunk SQL, count shared hashes
    s["dedup_cdc_chunks"] = (
        "WITH ch AS (SELECT doc_id, chunk_hash FROM ("
        + s["text_cdc_chunks"]
        + """) q),
        hot AS (SELECT chunk_hash FROM ch
                GROUP BY chunk_hash HAVING count(DISTINCT doc_id) >= 2),
        per_doc AS (SELECT doc_id, count(*)::BIGINT AS n_chunks
                    FROM ch GROUP BY doc_id),
        sh AS (SELECT c.doc_id, count(*)::BIGINT AS n_shared
               FROM ch c JOIN hot USING (chunk_hash) GROUP BY c.doc_id)
        SELECT p.doc_id, p.n_chunks,
               coalesce(s.n_shared, 0)::BIGINT AS n_shared_chunks,
               round(coalesce(s.n_shared, 0)::DOUBLE / p.n_chunks, 6)
                 AS shared_fraction
        FROM per_doc p LEFT JOIN sh s ON p.doc_id = s.doc_id
    """
    )


    # window top-k composition: counts per (hour, user), rank per hour
    s["events_window_topk"] = """
        WITH c AS (SELECT epoch_ns(ts) // 3600000000000 AS window_hour,
                          user_id, count(*)::BIGINT AS n_events
                   FROM events GROUP BY 1, 2),
        r AS (SELECT *, row_number() OVER (PARTITION BY window_hour
                                           ORDER BY n_events DESC, user_id)
                          AS rank
              FROM c)
        SELECT window_hour, user_id, n_events, rank FROM r WHERE rank <= 3
    """

    # split assignment: identical salted-md5 bucket + truncated-int
    # cumulative thresholds (0.8*2^32 and 0.9*2^32 truncate like int())
    _t1 = int(0.8 * (1 << 32))
    _t2 = int((0.8 + 0.1) * (1 << 32))
    s["doc_split_assign"] = f"""
        SELECT doc_id,
               CASE WHEN ('0x' || substr(md5('split:' || doc_id::VARCHAR),
                                         1, 8))::BIGINT < {_t1} THEN 'train'
                    WHEN ('0x' || substr(md5('split:' || doc_id::VARCHAR),
                                         1, 8))::BIGINT < {_t2} THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    """

    # group-safe split: the SAME md5 CASE as doc_split_assign keyed on
    # user_id with salt 'usersplit', rolled up per split
    s["events_user_split"] = f"""
        WITH a AS (SELECT user_id,
               CASE WHEN ('0x' || substr(md5('usersplit:' || user_id::VARCHAR),
                                         1, 8))::BIGINT < {_t1} THEN 'train'
                    WHEN ('0x' || substr(md5('usersplit:' || user_id::VARCHAR),
                                         1, 8))::BIGINT < {_t2} THEN 'val'
                    ELSE 'test' END AS split
             FROM events)
        SELECT split, count(*) AS n_events,
               count(DISTINCT user_id) AS n_users
        FROM a GROUP BY 1
    """

    # purged walk-forward: integer-ns cut arithmetic mirrored exactly
    # ('//' == Spark's div on BIGINT)
    s["events_time_split"] = """
        WITH e AS (SELECT user_id, epoch_ns(ts) AS ts_ns FROM events),
        b AS (SELECT min(ts_ns) AS lo, max(ts_ns) AS hi FROM e),
        a AS (SELECT user_id, ts_ns,
                 lo + ((hi - lo) * 8) // 10 AS cut FROM e, b)
        SELECT CASE WHEN ts_ns < cut THEN 'train'
                    WHEN ts_ns < cut + 86400000000000 THEN 'embargo'
                    ELSE 'test' END AS split,
               count(*) AS n_events,
               count(DISTINCT user_id) AS n_users,
               min(ts_ns) AS min_ts, max(ts_ns) AS max_ts
        FROM a GROUP BY 1
    """

    # referential audit: per-relationship orphan/null counts, UNION ALL
    def _rel_audit_sql(name: str, fact: str, fk: str, dim: str, pk: str) -> str:
        return f"""
        SELECT '{name}' AS relationship,
               (SELECT count(*) FROM {fact})::BIGINT AS n_rows,
               (SELECT count(*) FROM {fact} WHERE {fk} IS NULL)::BIGINT
                 AS n_null_fk,
               (SELECT count(*) FROM {fact}
                WHERE {fk} IS NOT NULL
                  AND {fk} NOT IN (SELECT {pk} FROM {dim}))::BIGINT
                 AS n_orphans,
               round((SELECT count(*) FROM {fact}
                      WHERE {fk} IS NOT NULL
                        AND {fk} NOT IN (SELECT {pk} FROM {dim}))::DOUBLE
                     / (SELECT count(*) FROM {fact}), 6) AS orphan_rate
        """

    s["rel_integrity_audit"] = " UNION ALL ".join(
        [
            _rel_audit_sql("orders.custkey->customer", "orders",
                           "o_custkey", "customer", "c_custkey"),
            _rel_audit_sql("lineitem.orderkey->orders", "lineitem",
                           "l_orderkey", "orders", "o_orderkey"),
            _rel_audit_sql("customer.nationkey->nation", "customer",
                           "c_nationkey", "nation", "n_nationkey"),
            _rel_audit_sql("supplier.nationkey->nation", "supplier",
                           "s_nationkey", "nation", "n_nationkey"),
        ]
    )

    # z-score outliers: stats per type, rounded z-ratio boundary (the
    # round_dp contract — raw float boundaries differ across engines)
    s["events_zscore_outliers"] = """
        WITH st AS (SELECT event_type, avg(value) AS m,
                           stddev_pop(value) AS sd
                    FROM events GROUP BY event_type),
        f AS (SELECT e.event_type, e.value,
                     (e.value IS NOT NULL AND st.sd > 0
                      AND round(abs(e.value - st.m) / st.sd, 6) > 2.5)
                       AS is_outlier
              FROM events e JOIN st USING (event_type))
        SELECT event_type, count(*)::BIGINT AS n_events,
               sum(is_outlier::INT)::BIGINT AS n_outliers,
               round(sum(is_outlier::INT)::DOUBLE / count(*), 6)
                 AS outlier_rate
        FROM f GROUP BY event_type
    """

    # filter audit: same fragments as doc_prep_pipeline, but per-doc
    # first-failing-rule decisions instead of the survivor set
    s["doc_filter_audit"] = rf"""
        WITH c AS (SELECT doc_id, lang,
                          replace(trim(regexp_replace(text, '\s+', ' ', 'g')),
                                  chr(10), ' ') AS ctext
                   FROM documents),
        t AS (SELECT doc_id, lang, ctext,
                     list_filter(regexp_split_to_array(lower(trim(ctext)),
                                                       '\s+'),
                                 x -> x <> '') AS tokens
              FROM c),
        q AS (SELECT doc_id, lang, ctext, tokens,
                     round(0.4 * least(len(tokens)::DOUBLE / 100.0, 1.0)
                       + 0.3 * (1.0 -
                           length(regexp_replace(lower(ctext),
                                                 '[a-z0-9 ]', '', 'g'))::DOUBLE
                             / greatest(length(ctext), 1))
                       + 0.3 * (CASE WHEN
                             len(list_filter(tokens,
                                 x -> list_contains({_STOP_SQL}, x)))::DOUBLE
                               / greatest(len(tokens), 1) >= 0.1
                             AND
                             len(list_filter(tokens,
                                 x -> list_contains({_STOP_SQL}, x)))::DOUBLE
                               / greatest(len(tokens), 1) <= 0.5
                             THEN 1.0 ELSE 0.5 END), 6) AS quality
              FROM t),
        pass AS (SELECT * FROM q WHERE lang = 'en' AND quality >= 0.6),
        win AS (SELECT md5(ctext) AS h, min(doc_id) AS keep_id
                FROM pass GROUP BY md5(ctext)),
        dup AS (SELECT p.doc_id, p.doc_id <> w.keep_id AS is_dup
                FROM pass p JOIN win w ON md5(p.ctext) = w.h),
        bg AS (SELECT DISTINCT unnest(
                 CASE WHEN len(tokens) >= {DECON_N}
                      THEN list_distinct(
                        [array_to_string(tokens[i:i+{DECON_N - 1}], ' ')
                         FOR i IN range(1, len(tokens) - {DECON_N - 2})])
                      ELSE []::VARCHAR[] END) AS g
               FROM t WHERE doc_id < {DECON_BENCH}),
        dg AS (SELECT doc_id, unnest(
                 CASE WHEN len(tokens) >= {DECON_N}
                      THEN list_distinct(
                        [array_to_string(tokens[i:i+{DECON_N - 1}], ' ')
                         FOR i IN range(1, len(tokens) - {DECON_N - 2})])
                      ELSE []::VARCHAR[] END) AS g
               FROM t),
        bad AS (SELECT DISTINCT dg.doc_id FROM dg JOIN bg USING (g))
        SELECT q.doc_id, q.quality,
               CASE WHEN q.lang <> 'en' THEN 'lang'
                    WHEN q.quality < 0.6 THEN 'quality'
                    WHEN coalesce(d.is_dup, FALSE) THEN 'duplicate'
                    WHEN b.doc_id IS NOT NULL THEN 'contaminated'
                    ELSE 'keep' END AS decision
        FROM q LEFT JOIN dup d ON q.doc_id = d.doc_id
               LEFT JOIN bad b ON q.doc_id = b.doc_id
    """

    # composed prep pipeline: every stage is the same SQL fragment its
    # standalone entry uses (clean → lang/quality filter → md5 dedup →
    # 5-gram decontamination → BPE budget)
    s["doc_prep_pipeline"] = rf"""
        WITH c AS (SELECT doc_id, lang,
                          replace(trim(regexp_replace(text, '\s+', ' ', 'g')),
                                  chr(10), ' ') AS ctext
                   FROM documents),
        t AS (SELECT doc_id, lang, ctext,
                     list_filter(regexp_split_to_array(lower(trim(ctext)),
                                                       '\s+'),
                                 x -> x <> '') AS tokens
              FROM c),
        q AS (SELECT doc_id, ctext, tokens,
                     round(0.4 * least(len(tokens)::DOUBLE / 100.0, 1.0)
                       + 0.3 * (1.0 -
                           length(regexp_replace(lower(ctext),
                                                 '[a-z0-9 ]', '', 'g'))::DOUBLE
                             / greatest(length(ctext), 1))
                       + 0.3 * (CASE WHEN
                             len(list_filter(tokens,
                                 x -> list_contains({_STOP_SQL}, x)))::DOUBLE
                               / greatest(len(tokens), 1) >= 0.1
                             AND
                             len(list_filter(tokens,
                                 x -> list_contains({_STOP_SQL}, x)))::DOUBLE
                               / greatest(len(tokens), 1) <= 0.5
                             THEN 1.0 ELSE 0.5 END), 6) AS quality
              FROM t WHERE lang = 'en'),
        kept AS (SELECT * FROM q WHERE quality >= 0.6),
        dd AS (SELECT min(doc_id) AS doc_id, min(ctext) AS ctext,
                      min(quality) AS quality
               FROM kept GROUP BY md5(ctext)),
        ddt AS (SELECT doc_id, ctext, quality,
                       list_filter(regexp_split_to_array(lower(trim(ctext)),
                                                         '\s+'),
                                   x -> x <> '') AS tokens
                FROM dd),
        bt AS (SELECT doc_id,
                      list_filter(regexp_split_to_array(lower(trim(ctext)),
                                                        '\s+'),
                                  x -> x <> '') AS tokens
               FROM c WHERE doc_id < {DECON_BENCH}),
        bg AS (SELECT DISTINCT unnest(
                 CASE WHEN len(tokens) >= {DECON_N}
                      THEN list_distinct(
                        [array_to_string(tokens[i:i+{DECON_N - 1}], ' ')
                         FOR i IN range(1, len(tokens) - {DECON_N - 2})])
                      ELSE []::VARCHAR[] END) AS g
               FROM bt),
        dg AS (SELECT doc_id, unnest(
                 CASE WHEN len(tokens) >= {DECON_N}
                      THEN list_distinct(
                        [array_to_string(tokens[i:i+{DECON_N - 1}], ' ')
                         FOR i IN range(1, len(tokens) - {DECON_N - 2})])
                      ELSE []::VARCHAR[] END) AS g
               FROM ddt),
        bad AS (SELECT DISTINCT doc_id FROM dg JOIN bg USING (g))
        SELECT d.doc_id,
               len(regexp_extract_all(d.ctext,
                   '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))::BIGINT AS n_tokens,
               d.quality
        FROM dd d WHERE d.doc_id NOT IN (SELECT doc_id FROM bad)
    """

    # per-group top-k: strategy-independent result == plain window SQL
    s["doc_topk_per_source"] = """
        WITH r AS (SELECT source, doc_id, n_chars,
                          row_number() OVER (PARTITION BY source
                                             ORDER BY n_chars DESC, doc_id)
                            AS rank
                   FROM documents)
        SELECT source, doc_id, n_chars, rank FROM r WHERE rank <= 5
    """

    # Bloom decontamination: same md5 positions (salt j, ':' framing),
    # 32-bit words in BIGINTs (checked shifts stay in range), bit_or
    # build, all-bits-set probe — FPs are deterministic so the full
    # result hash-matches
    s["doc_decontaminate_bloom"] = f"""
        WITH toks AS ({_TOKS}),
        sh AS (SELECT doc_id, unnest(
                 CASE WHEN len(tokens) >= {DECON_N}
                      THEN list_distinct(
                        [array_to_string(tokens[i:i+{DECON_N - 1}], ' ')
                         FOR i IN range(1, len(tokens) - {DECON_N - 2})])
                      ELSE []::VARCHAR[] END) AS g
               FROM toks),
        bg AS (SELECT DISTINCT g FROM sh WHERE doc_id < {DECON_BENCH}),
        bpos AS (SELECT DISTINCT
                   {_MD5L.format(x="concat_ws(':', j::VARCHAR, g)")}
                     % {BLOOM_M} AS pos
                 FROM bg CROSS JOIN range({BLOOM_K}) t(j)),
        words AS (SELECT pos // 32 AS widx,
                         bit_or(1::BIGINT << (pos % 32)::INT) AS word
                  FROM bpos GROUP BY pos // 32),
        dpos AS (SELECT doc_id, g, j,
                   {_MD5L.format(x="concat_ws(':', j::VARCHAR, g)")}
                     % {BLOOM_M} AS pos
                 FROM sh CROSS JOIN range({BLOOM_K}) t(j)),
        gchk AS (SELECT doc_id, g,
                        bool_and((coalesce(w.word, 0)
                                  & (1::BIGINT << (pos % 32)::INT)) <> 0)
                          AS gin
                 FROM dpos LEFT JOIN words w ON dpos.pos // 32 = w.widx
                 GROUP BY doc_id, g),
        hits AS (SELECT doc_id, count(*) AS n_hits FROM gchk
                 WHERE gin GROUP BY doc_id)
        SELECT d.doc_id, coalesce(n_hits, 0)::BIGINT AS n_flagged_grams,
               coalesce(n_hits, 0) > 0 AS contaminated
        FROM documents d LEFT JOIN hits ON d.doc_id = hits.doc_id
    """

    # SemDeDup: literal md5 centroid matrix (same _centroid_matrix the
    # Spark side uses), QUANTIZED argmax assignment (quantize-before-
    # argmax, knn.ASSIGN_SCALE: floor(dot*1e12 + 0.5) is a pure IEEE
    # multiply-add-floor, bit-identical in every engine — decimal ROUND
    # is not, its midpoint rule differs per engine) with first-max
    # tie-break (ORDER BY quantized DESC, cid ASC ≡ array_position of
    # array_max over quantized dots), then within-cluster pairs and a
    # smallest-id-keeper anti join
    from clinical_vector_search_spark.operators.knn import _centroid_matrix

    _cents = _centroid_matrix(64, 8)
    _cents_sql = ", ".join(
        f"({c}, [{', '.join(repr(w) for w in row)}]::DOUBLE[])"
        for c, row in enumerate(_cents)
    )
    _semdedup_base = f"""
        WITH d AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        n AS (SELECT vec_id, {_NORMALIZE.format(v="v")} AS nv FROM d),
        cents AS (SELECT * FROM (VALUES {_cents_sql}) AS c(cid, w)),
        dots AS (SELECT vec_id, cid, list_dot_product(nv, w) AS dot
                 FROM n CROSS JOIN cents),
        asg AS (SELECT vec_id, cid::INT AS cluster FROM
                  (SELECT vec_id, cid,
                          row_number() OVER (PARTITION BY vec_id
                                             ORDER BY floor(dot * 1e12 + 0.5)
                                                        DESC,
                                                      cid) AS rn
                   FROM dots)
                WHERE rn = 1),
        an AS (SELECT n.vec_id, n.nv, asg.cluster
               FROM n JOIN asg ON n.vec_id = asg.vec_id),
        p AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.cluster,
                     list_dot_product(a.nv, b.nv) AS cosine
              FROM an a JOIN an b
                ON a.cluster = b.cluster AND a.vec_id < b.vec_id
              WHERE list_dot_product(a.nv, b.nv) >= 0.35)
    """
    # evaluation_kappa: same argmax-centroid assignment fragment, then
    # majority-label prediction + purity/kappa arithmetic on int ratios
    s["evaluation_kappa"] = f"""
        WITH d AS (SELECT vec_id, embedding::DOUBLE[] AS v, label
                   FROM embeddings),
        n AS (SELECT vec_id, {_NORMALIZE.format(v="v")} AS nv, label FROM d),
        cents AS (SELECT * FROM (VALUES {_cents_sql}) AS c(cid, w)),
        dots AS (SELECT vec_id, label, cid, list_dot_product(nv, w) AS dot
                 FROM n CROSS JOIN cents),
        asg AS (SELECT vec_id, label::BIGINT AS label, cid AS cluster FROM
                  (SELECT vec_id, label, cid,
                          row_number() OVER (PARTITION BY vec_id
                                             ORDER BY floor(dot * 1e12 + 0.5)
                                                        DESC,
                                                      cid) AS rn
                   FROM dots)
                WHERE rn = 1),
        maj AS (SELECT cluster, label AS pred FROM
                  (SELECT cluster, label, count(*) AS cnt,
                          row_number() OVER (PARTITION BY cluster
                                             ORDER BY count(*) DESC, label)
                              AS r
                   FROM asg GROUP BY 1, 2)
                WHERE r = 1),
        sc AS (SELECT asg.label, maj.pred FROM asg
               JOIN maj ON asg.cluster = maj.cluster),
        agg AS (SELECT count(*)::BIGINT AS n,
                       count(*) FILTER (WHERE label = pred)::BIGINT AS hits
                FROM sc),
        mg AS (SELECT coalesce(sum(n_l * n_p), 0)::BIGINT AS s FROM
                 (SELECT label, count(*) AS n_l FROM sc GROUP BY 1) a
                 JOIN (SELECT pred AS label, count(*) AS n_p FROM sc
                       GROUP BY 1) b USING (label)),
        nc AS (SELECT count(*)::BIGINT AS ncl FROM maj)
        SELECT n AS n_rows, ncl AS n_clusters_used,
               round(hits / n::DOUBLE, 6) AS purity,
               round((hits / n::DOUBLE - s / (n::DOUBLE * n::DOUBLE))
                     / (1 - s / (n::DOUBLE * n::DOUBLE)), 6) AS kappa
        FROM agg, mg, nc
    """

    s["dedup_semantic_pairs"] = (
        _semdedup_base
        + "SELECT a_id, b_id, cluster, round(cosine, 6) AS cosine FROM p"
    )
    s["dedup_semantic"] = (
        _semdedup_base
        + """
        SELECT asg.vec_id, asg.cluster FROM asg
        WHERE asg.vec_id NOT IN (SELECT b_id FROM p)
    """
    )
    # the BLAS path is bit-identical by contract — same oracle
    s["dedup_semantic_pd"] = s["dedup_semantic"]
    # the salted block self-join is exact — same pairs oracle
    s["dedup_semantic_pairs_salted"] = s["dedup_semantic_pairs"]
    # maintained semantic index (r15): the accumulated incremental pair
    # set is chunking-invariant, so the two-batch ingest lifecycle must
    # reproduce the ONE-SHOT pairs SQL exactly — the strongest oracle
    # the maintenance story admits
    s["dedup_semantic_incremental"] = s["dedup_semantic_pairs"]

    # semantic reindex at n_iter=0: the retrained centroids are the
    # deterministic L2-normalized md5 16-matrix (kmeans_centroids
    # init — same +1e-9 guard, embedded as literals computed with the
    # same numpy ops); membership = survivors of the tombstoned ids
    import numpy as _np_sem

    _c16 = _np_sem.array(_centroid_matrix(64, 16), dtype="float64")
    _c16 = _c16 / (_np_sem.linalg.norm(_c16, axis=1, keepdims=True) + 1e-9)
    _c16_sql = ", ".join(
        f"({c}, [{', '.join(repr(float(w)) for w in row)}]::DOUBLE[])"
        for c, row in enumerate(_c16)
    )
    s["dedup_semantic_reindex"] = f"""
        WITH d AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
                   WHERE vec_id % 16 <> 5),
        n AS (SELECT vec_id, {_NORMALIZE.format(v="v")} AS nv FROM d),
        cents AS (SELECT * FROM (VALUES {_c16_sql}) AS c(cid, w)),
        dots AS (SELECT vec_id, cid, list_dot_product(nv, w) AS dot
                 FROM n CROSS JOIN cents),
        asg AS (SELECT vec_id, cid::INT AS cluster FROM
                  (SELECT vec_id, cid,
                          row_number() OVER (PARTITION BY vec_id
                                             ORDER BY floor(dot * 1e12 + 0.5)
                                                        DESC,
                                                      cid) AS rn
                   FROM dots)
                WHERE rn = 1)
        SELECT vec_id, cluster FROM asg
    """

    # backfill after reindex (r15): the accumulated pairs table is
    # old-geometry pairs (8 raw-md5 clusters — the two ingests'
    # chunking-invariant accumulation) UNION the new-geometry pairs
    # (16 L2-normalized-md5 clusters, the n_iter=0 reindex) that are
    # NOT already present by (a_id, b_id); cosine is geometry-
    # independent (exact dot over nv), only the cluster column differs
    s["dedup_semantic_backfill"] = f"""
        WITH d AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        n AS (SELECT vec_id, {_NORMALIZE.format(v="v")} AS nv FROM d),
        c8 AS (SELECT * FROM (VALUES {_cents_sql}) AS c(cid, w)),
        dots8 AS (SELECT vec_id, cid, list_dot_product(nv, w) AS dot
                  FROM n CROSS JOIN c8),
        asg8 AS (SELECT vec_id, cid::INT AS cluster FROM
                   (SELECT vec_id, cid,
                           row_number() OVER (PARTITION BY vec_id
                                              ORDER BY floor(dot * 1e12 + 0.5)
                                                         DESC,
                                                       cid) AS rn
                    FROM dots8)
                 WHERE rn = 1),
        an8 AS (SELECT n.vec_id, n.nv, asg8.cluster
                FROM n JOIN asg8 ON n.vec_id = asg8.vec_id),
        p8 AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.cluster,
                      list_dot_product(a.nv, b.nv) AS cosine
               FROM an8 a JOIN an8 b
                 ON a.cluster = b.cluster AND a.vec_id < b.vec_id
               WHERE list_dot_product(a.nv, b.nv) >= 0.35),
        c16 AS (SELECT * FROM (VALUES {_c16_sql}) AS c(cid, w)),
        dots16 AS (SELECT vec_id, cid, list_dot_product(nv, w) AS dot
                   FROM n CROSS JOIN c16),
        asg16 AS (SELECT vec_id, cid::INT AS cluster FROM
                    (SELECT vec_id, cid,
                            row_number() OVER (PARTITION BY vec_id
                                               ORDER BY floor(dot * 1e12
                                                              + 0.5) DESC,
                                                        cid) AS rn
                     FROM dots16)
                  WHERE rn = 1),
        an16 AS (SELECT n.vec_id, n.nv, asg16.cluster
                 FROM n JOIN asg16 ON n.vec_id = asg16.vec_id),
        p16 AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.cluster,
                       list_dot_product(a.nv, b.nv) AS cosine
                FROM an16 a JOIN an16 b
                  ON a.cluster = b.cluster AND a.vec_id < b.vec_id
                WHERE list_dot_product(a.nv, b.nv) >= 0.35)
        SELECT a_id, b_id, cluster, round(cosine, 6) AS cosine FROM p8
        UNION ALL
        SELECT p16.a_id, p16.b_id, p16.cluster,
               round(p16.cosine, 6) AS cosine
        FROM p16 ANTI JOIN p8 USING (a_id, b_id)
    """

    # incremental IVF-PQ index add: the full-index rebuild RESTRICTED to
    # batch rows (assignment is per-row deterministic, so fold-in ==
    # rebuild on exactly those rows) — same md5 centroid matrix +
    # quantized-argmax fragment as SemDeDup, same LCG codebook argmin as
    # vec_pq_codes, but over the NORMALIZED vector (assignment and
    # encoding must see the same input, and normalization keeps the
    # ASSIGN_SCALE dots bounded)
    _pq_codes_nv = "[" + ", ".join(
        f"CAST(list_indexof({_pq_dists('nv', sub)}, "
        f"list_min({_pq_dists('nv', sub)})) - 1 AS INT)"
        for sub in range(PQ_M)
    ) + "]"
    s["knn_ivfpq_index_add"] = f"""
        WITH d AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
                   WHERE vec_id % 8 = 3),
        n AS (SELECT vec_id, {_NORMALIZE.format(v="v")} AS nv FROM d),
        cents AS (SELECT * FROM (VALUES {_cents_sql}) AS c(cid, w)),
        dots AS (SELECT vec_id, cid, list_dot_product(nv, w) AS dot
                 FROM n CROSS JOIN cents),
        asg AS (SELECT vec_id, cid::INT AS cluster FROM
                  (SELECT vec_id, cid,
                          row_number() OVER (PARTITION BY vec_id
                                             ORDER BY floor(dot * 1e12 + 0.5)
                                                        DESC,
                                                      cid) AS rn
                   FROM dots)
                WHERE rn = 1),
        c AS (SELECT vec_id, {_pq_codes_nv} AS codes FROM n)
        SELECT a.vec_id, a.cluster, CAST(sub - 1 AS INT) AS sub,
               codes[sub] AS code
        FROM asg a JOIN c USING (vec_id),
             unnest(generate_series(1, {PQ_M})) AS t(sub)
    """

    # reindex lifecycle: with n_iter=0 the retrained geometry is exactly
    # the kmeans_centroids INIT (the md5 centroid matrix, L2-normalized
    # with the +1e-9 guard — embedded as literals computed with the same
    # numpy ops) and the unchanged LCG codebooks (n_iter=0 never runs a
    # training pass, so residual books == LCG init), so the whole
    # RESIDUAL retrain-and-re-encode (membership from the index minus
    # tombstones, re-encode of the survivors against x − centroid) has
    # a full value-hash oracle: quantized-argmax assignment over the
    # NORMALIZED survivors (vec_id % 16 <> 5), then LCG codes over the
    # residual rv = nv − centroid[cluster] (exact fp64 elementwise
    # subtract in both engines)
    import numpy as _np

    _cn = _np.array(_cents, dtype="float64")
    _cn = _cn / (_np.linalg.norm(_cn, axis=1, keepdims=True) + 1e-9)
    _cents_norm_sql = ", ".join(
        f"({c}, [{', '.join(repr(float(w)) for w in row)}]::DOUBLE[])"
        for c, row in enumerate(_cn)
    )
    _pq_codes_rv = "[" + ", ".join(
        f"CAST(list_indexof({_pq_dists('rv', sub)}, "
        f"list_min({_pq_dists('rv', sub)})) - 1 AS INT)"
        for sub in range(PQ_M)
    ) + "]"
    _ivfpq_residual_base = f"""
        WITH d AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
                   WHERE vec_id % 16 <> 5),
        n AS (SELECT vec_id, {_NORMALIZE.format(v="v")} AS nv FROM d),
        cents AS (SELECT * FROM (VALUES {_cents_norm_sql}) AS c(cid, w)),
        dots AS (SELECT vec_id, cid, list_dot_product(nv, w) AS dot
                 FROM n CROSS JOIN cents),
        asg AS (SELECT vec_id, cid::INT AS cluster FROM
                  (SELECT vec_id, cid,
                          row_number() OVER (PARTITION BY vec_id
                                             ORDER BY floor(dot * 1e12 + 0.5)
                                                        DESC,
                                                      cid) AS rn
                   FROM dots)
                WHERE rn = 1),
        rr AS (SELECT a.vec_id, a.cluster,
                      [n.nv[i] - c.w[i] FOR i IN range(1, 65)] AS rv
               FROM asg a JOIN n USING (vec_id)
                          JOIN cents c ON a.cluster = c.cid),
        codes AS (SELECT vec_id, cluster, {_pq_codes_rv} AS codes FROM rr)
    """
    s["knn_ivfpq_reindex"] = (
        _ivfpq_residual_base
        + f"""
        SELECT vec_id, cluster, CAST(sub - 1 AS INT) AS sub,
               codes[sub] AS code
        FROM codes, unnest(generate_series(1, {PQ_M})) AS t(sub)
    """
    )

    # serving over the maintained index: fullprobe disables IVF pruning,
    # so the lifecycle composition (two ingests + tombstoned deletes +
    # read-back + ADC over the codes) must equal plain PQ ADC over the
    # NORMALIZED survivors — the knn_pq_adc fragments with v → nv and
    # the tombstoned ids (vec_id % 16 = 5) filtered from the doc side
    _pq_qtab_nv = "[" + ", ".join(
        _pq_dists("q.nv", s) for s in range(PQ_M)
    ) + "]"
    s["knn_ivfpq_index_search"] = f"""
        WITH d AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        n AS (SELECT vec_id, {_NORMALIZE.format(v="v")} AS nv FROM d),
        c AS (SELECT vec_id AS doc_id, {_pq_codes_nv} AS codes FROM n
              WHERE vec_id % 16 <> 5),
        q AS (SELECT vec_id AS query_id, nv FROM n WHERE vec_id < {KNN_NQ}),
        tabs AS (SELECT query_id, {_pq_qtab_nv} AS tab FROM q),
        sc AS (SELECT query_id, doc_id,
                 list_sum([tab[sub + 1][codes[sub + 1] + 1]
                           FOR sub IN range(0, {PQ_M})]) AS adc
               FROM tabs CROSS JOIN c),
        r AS (SELECT query_id, doc_id, adc,
                row_number() OVER (PARTITION BY query_id
                                   ORDER BY adc, doc_id) AS rank FROM sc)
        SELECT query_id, rank, doc_id, round(adc, 6) AS adc_dist
        FROM r WHERE rank <= {KNN_K}
    """

    # path-only serving over the RESIDUAL-reindexed index (r15): the
    # sidecar round-trip alone must select the residual ADC — distance
    # tables per (query, cell) over (q − centroid), scored against the
    # residual codes of the reindexed survivors; queries drawn from the
    # full id range (deleted ids may still query), fullprobe disables
    # IVF pruning
    _pq_qtab_rv = "[" + ", ".join(
        _pq_dists("rv", sub) for sub in range(PQ_M)
    ) + "]"
    s["knn_ivfpq_serve"] = (
        _ivfpq_residual_base
        + f""",
        nall AS (SELECT vec_id, {_NORMALIZE.format(v="embedding::DOUBLE[]")}
                        AS nv
                 FROM embeddings WHERE vec_id < {KNN_NQ}),
        rq AS (SELECT nall.vec_id AS query_id, c.cid,
                      [nall.nv[i] - c.w[i] FOR i IN range(1, 65)] AS rv
               FROM nall CROSS JOIN cents c),
        tabs AS (SELECT query_id, cid, {_pq_qtab_rv} AS tab FROM rq),
        sc AS (SELECT t.query_id, codes.vec_id AS doc_id,
                 list_sum([t.tab[sub + 1][codes.codes[sub + 1] + 1]
                           FOR sub IN range(0, {PQ_M})]) AS adc
               FROM tabs t JOIN codes ON t.cid = codes.cluster),
        r AS (SELECT query_id, doc_id, adc,
                row_number() OVER (PARTITION BY query_id
                                   ORDER BY adc, doc_id) AS rank FROM sc)
        SELECT query_id, rank, doc_id, round(adc, 6) AS adc_dist
        FROM r WHERE rank <= {KNN_K}
    """
    )

    # refine over the maintained index: the index_search ADC fragments
    # (normalized survivors, fullprobe) stop at rank <= k_coarse, then
    # ONLY those candidates are rescored with the exact L2 over the
    # NORMALIZED vectors (same i-order fold as knn_exact_l2 so the raw
    # doubles bit-match the Spark V.l2_sq fold)
    s["knn_ivfpq_index_refine"] = f"""
        WITH d AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        n AS (SELECT vec_id, {_NORMALIZE.format(v="v")} AS nv FROM d),
        c AS (SELECT vec_id AS doc_id, {_pq_codes_nv} AS codes FROM n
              WHERE vec_id % 16 <> 5),
        q AS (SELECT vec_id AS query_id, nv FROM n WHERE vec_id < {KNN_NQ}),
        tabs AS (SELECT query_id, {_pq_qtab_nv} AS tab FROM q),
        sc AS (SELECT query_id, doc_id,
                 list_sum([tab[sub + 1][codes[sub + 1] + 1]
                           FOR sub IN range(0, {PQ_M})]) AS adc
               FROM tabs CROSS JOIN c),
        r AS (SELECT query_id, doc_id,
                row_number() OVER (PARTITION BY query_id
                                   ORDER BY adc, doc_id) AS rank FROM sc),
        cand AS (SELECT query_id, doc_id FROM r
                 WHERE rank <= {PQ_REFINE_COARSE}),
        res AS (SELECT cand.query_id, cand.doc_id,
                  list_sum([ (qq.qnv[i + 1] - dd.nv[i + 1]) ^ 2
                             FOR i IN range(0, 64)]) AS l2
                FROM cand
                JOIN (SELECT vec_id AS doc_id, nv FROM n) dd USING (doc_id)
                JOIN (SELECT vec_id AS query_id, nv AS qnv FROM n
                      WHERE vec_id < {KNN_NQ}) qq USING (query_id)),
        rr AS (SELECT query_id, doc_id, l2,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY l2, doc_id) AS rank FROM res)
        SELECT query_id, rank, doc_id, round(l2, 6) AS l2_dist
        FROM rr WHERE rank <= {KNN_K}
    """

    # bigram LM: same md5-hashed gram keys, count tables, ln ratio
    s["text_bigram_lm"] = f"""
        WITH toks AS ({_TOKS}),
        bg AS (SELECT doc_id, unnest(
                 CASE WHEN len(tokens) >= 2
                      THEN [array_to_string(tokens[i:i+1], ' ')
                            FOR i IN range(1, len(tokens))]
                      ELSE []::VARCHAR[] END) AS gram
               FROM toks),
        g AS (SELECT doc_id, {_MD5L.format(x="gram")} AS g2,
                     {_MD5L.format(x="split_part(gram, ' ', 1)")} AS g1
              FROM bg),
        c2t AS (SELECT g2, count(*) AS c2 FROM g GROUP BY g2),
        c1t AS (SELECT g1, count(*) AS c1 FROM g GROUP BY g1),
        sc AS (SELECT doc_id, ln(c2::DOUBLE / c1) AS logp
               FROM g JOIN c2t USING (g2) JOIN c1t USING (g1)),
        agg AS (SELECT doc_id, count(*)::BIGINT AS n_bigrams,
                       round(avg(logp), 6) AS avg_logp
                FROM sc GROUP BY doc_id)
        SELECT d.doc_id, coalesce(n_bigrams, 0)::BIGINT AS n_bigrams,
               avg_logp, round(exp(-avg_logp), 6) AS ppl
        FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
    """

    # perplexity deciles: rank by (ppl, doc_id) == dense_row_ids order;
    # same truncated ((rank-1)*10) // N bucket arithmetic
    s["text_ppl_buckets"] = (
        "SELECT bucket, count(*)::BIGINT AS n_docs,"
        "       round(avg(ppl), 6) AS avg_ppl "
        "FROM (SELECT ppl,"
        "             (((row_number() OVER (ORDER BY ppl, doc_id) - 1) * 10)"
        "              // (count(*) OVER ()) + 1)::INT AS bucket"
        f"      FROM ({s['text_bigram_lm']}) b"
        "      WHERE ppl IS NOT NULL) t "
        "GROUP BY bucket"
    )


    # SCD2 from-scratch history: lag-dedup of consecutive states, lead
    # for validity ranges, (ts, state) ordering as the deterministic tie.
    # The dedup mirrors Spark's eqNullSafe on the tracked struct exactly:
    # rn = 1 marks the lag edge (a NULL from lag is otherwise ambiguous
    # with a genuinely-NULL previous state) and IS DISTINCT FROM is the
    # null-safe comparison, so a NULL tracked value collapses identically
    # in both engines.
    s["events_scd2"] = """
        WITH upd AS (SELECT user_id, event_type, epoch_ns(ts) AS ts
                     FROM events WHERE user_id < 50),
        seq AS (SELECT *, lag(event_type) OVER
                    (PARTITION BY user_id ORDER BY ts, event_type) AS prev,
                   row_number() OVER
                    (PARTITION BY user_id ORDER BY ts, event_type) AS rn
                FROM upd),
        chg AS (SELECT user_id, event_type, ts FROM seq
                WHERE rn = 1 OR prev IS DISTINCT FROM event_type)
        SELECT user_id, event_type, ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_type) AS valid_to
        FROM chg
    """

    # two-step merge over a strictly-time-separating cut ≡ one-shot build
    # (closed versions pass through; the open version re-sequences with
    # the second batch exactly where the one-shot lag/lead would put it)
    s["events_scd2_merge"] = s["events_scd2"]

    # logistic-regression training unrolled: the same five standardized
    # full-batch GD iterations the Spark loop runs, each a 1-row
    # gradient CTE + a 1-row weight CTE (the dedup_pagerank unroll
    # precedent applied to model fitting); z accumulates bias-first in
    # feature order to mirror the expression association exactly
    _lr_feats = ["a", "b", "c"]  # z0=n_tokens, z1=punct, z2=stop
    _lr_z = "(w0 + wa*z0 + wb*z1 + wc*z2)"
    _lr_iters = []
    prev_w = None
    for _it in range(1, 6):
        if prev_w is None:
            _sig = "1.0/(1.0 + exp(-(0.0)))"
            _g = (f"g{_it} AS (SELECT avg({_sig} - y) AS g0, "
                  + ", ".join(
                      f"avg(({_sig} - y) * z{j}) AS g{f}"
                      for j, f in enumerate(_lr_feats))
                  + " FROM f)")
            _w = (f"w{_it} AS (SELECT 0.0 - 1.0*g0 AS w0, "
                  + ", ".join(
                      f"0.0 - 1.0*g{f} AS w{f}" for f in _lr_feats)
                  + f" FROM g{_it})")
        else:
            _sig = f"1.0/(1.0 + exp(-{_lr_z}))"
            _g = (f"g{_it} AS (SELECT avg({_sig} - y) AS g0, "
                  + ", ".join(
                      f"avg(({_sig} - y) * z{j}) AS g{f}"
                      for j, f in enumerate(_lr_feats))
                  + f" FROM f, {prev_w})")
            _w = (f"w{_it} AS (SELECT w0 - 1.0*g0 AS w0, "
                  + ", ".join(
                      f"w{f} - 1.0*g{f} AS w{f}" for f in _lr_feats)
                  + f" FROM g{_it}, {prev_w})")
        _lr_iters.append(_g)
        _lr_iters.append(_w)
        prev_w = f"w{_it}"
    _lr_unrolled = ",\n        ".join(_lr_iters)
    s["doc_quality_logreg"] = f"""
        WITH toks AS ({_TOKS}),
        f0 AS (SELECT CASE WHEN d.lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
                 len(t.tokens)::DOUBLE AS x0,
                 d.n_chars::DOUBLE
                     / greatest(len(t.tokens)::DOUBLE, 1.0) AS x1,
                 len(list_filter(t.tokens,
                                 x -> list_contains({_STOP_SQL}, x)))::DOUBLE
                     / greatest(len(t.tokens), 1) AS x2
               FROM documents d JOIN toks t ON d.doc_id = t.doc_id),
        st AS (SELECT avg(x0) AS m0, stddev_pop(x0) AS s0,
                      avg(x1) AS m1, stddev_pop(x1) AS s1,
                      avg(x2) AS m2, stddev_pop(x2) AS s2 FROM f0),
        f AS (SELECT y, (x0 - m0)/s0 AS z0, (x1 - m1)/s1 AS z1,
                     (x2 - m2)/s2 AS z2 FROM f0, st),
        {_lr_unrolled}
        SELECT 'bias' AS term, round(w0, 6) AS weight FROM w5
        UNION ALL SELECT 'n_tokens', round(wa, 6) FROM w5
        UNION ALL SELECT 'mean_tok_len', round(wb, 6) FROM w5
        UNION ALL SELECT 'stopword_ratio', round(wc, 6) FROM w5
    """

    # eval rides the same unroll with the ROUNDED final weights (the
    # Spark side scores with logreg_train's rounded return, so both
    # engines freeze bit-identical weights); threshold on z > 0
    _lr_head = s["doc_quality_logreg"].split("SELECT 'bias'")[0].rstrip()
    s["doc_quality_logreg_eval"] = f"""{_lr_head},
        wr AS (
            SELECT round(w0, 6) AS w0, round(wa, 6) AS wa,
                   round(wb, 6) AS wb, round(wc, 6) AS wc FROM w5),
        scored AS (SELECT y,
                 (w0 + wa*z0 + wb*z1 + wc*z2) AS z,
                 1.0/(1.0 + exp(-(w0 + wa*z0 + wb*z1 + wc*z2))) AS p
               FROM f, wr)
        SELECT count(*) AS n_rows,
               round(avg(CASE WHEN (CASE WHEN z > 0 THEN 1.0 ELSE 0.0 END)
                              = y THEN 1.0 ELSE 0.0 END), 6) AS accuracy,
               round(avg(-(y * ln(p) + (1 - y) * ln(1 - p))), 6)
                   AS log_loss
        FROM scored
    """

    # calibration: same unroll + rounded-freeze; p rounded BEFORE the
    # decile binning (round-before-compare applied to the bin key)
    s["doc_quality_logreg_calibration"] = f"""{_lr_head},
        wr AS (
            SELECT round(w0, 6) AS w0, round(wa, 6) AS wa,
                   round(wb, 6) AS wb, round(wc, 6) AS wc FROM w5),
        scored AS (SELECT y,
                 round(1.0/(1.0 + exp(-(w0 + wa*z0 + wb*z1 + wc*z2))), 6)
                     AS p
               FROM f, wr),
        binned AS (SELECT y, p,
                 least(floor(p * 10)::BIGINT, 9) AS bin FROM scored)
        SELECT bin, count(*) AS n,
               round(avg(p), 6) AS mean_p,
               round(avg(y), 6) AS actual_rate,
               round(avg((p - y) * (p - y)), 6) AS brier
        FROM binned GROUP BY 1
    """

    # fairness: the same unroll with the SOURCE group threaded through
    # the feature CTEs (two targeted rewrites of the shared head — the
    # extra column is inert for the training moments)
    _lr_head_grp = _lr_head.replace(
        "f0 AS (SELECT CASE WHEN d.lang = 'en'",
        "f0 AS (SELECT d.source AS grp, CASE WHEN d.lang = 'en'",
    ).replace(
        "f AS (SELECT y,",
        "f AS (SELECT grp, y,",
    )
    s["doc_quality_logreg_fairness"] = f"""{_lr_head_grp},
        wr AS (
            SELECT round(w0, 6) AS w0, round(wa, 6) AS wa,
                   round(wb, 6) AS wb, round(wc, 6) AS wc FROM w5),
        scored AS (SELECT grp, y,
                 (w0 + wa*z0 + wb*z1 + wc*z2) AS z
               FROM f, wr),
        per AS (SELECT grp AS source,
                       count(*)::BIGINT AS n,
                       sum(CASE WHEN z > 0 THEN 1 ELSE 0
                           END)::BIGINT AS n_pos_pred,
                       sum(CASE WHEN z > 0 THEN y ELSE 0 END) AS tp,
                       sum(CASE WHEN z > 0 THEN 1 - y ELSE 0 END) AS fp,
                       sum(y) AS n_pos, sum(1 - y) AS n_neg
                FROM scored GROUP BY grp),
        mx AS (SELECT max(n_pos_pred / n::DOUBLE) AS best FROM per)
        SELECT source, n,
               round(n_pos_pred / n::DOUBLE, 6) AS pos_pred_rate,
               round(CASE WHEN n_pos > 0 THEN tp / n_pos END, 6) AS tpr,
               round(CASE WHEN n_neg > 0 THEN fp / n_neg END, 6) AS fpr,
               round(CASE WHEN (SELECT best FROM mx) > 0
                          THEN (n_pos_pred / n::DOUBLE)
                               / (SELECT best FROM mx) END,
                     6) AS disparate_impact
        FROM per
    """

    # gains table: the unroll with doc_id threaded through (the
    # fairness-oracle surgery pattern) for the total-order decile rank
    _lr_head_id = _lr_head.replace(
        "f0 AS (SELECT CASE WHEN d.lang = 'en'",
        "f0 AS (SELECT d.doc_id AS did, CASE WHEN d.lang = 'en'",
    ).replace(
        "f AS (SELECT y,",
        "f AS (SELECT did, y,",
    )
    s["doc_quality_logreg_gains"] = f"""{_lr_head_id},
        wr AS (
            SELECT round(w0, 6) AS w0, round(wa, 6) AS wa,
                   round(wb, 6) AS wb, round(wc, 6) AS wc FROM w5),
        scored AS (SELECT did, y,
                 round(w0 + wa*z0 + wb*z1 + wc*z2, 6) AS z
               FROM f, wr),
        rk AS (SELECT y, ntile(10) OVER (ORDER BY z DESC, did)
                   AS decile
               FROM scored),
        per AS (SELECT decile, count(*)::BIGINT AS n,
                       sum(y)::BIGINT AS n_pos
                FROM rk GROUP BY decile),
        t AS (SELECT sum(n_pos)::DOUBLE AS tp, sum(n)::DOUBLE AS tn
              FROM per)
        SELECT decile, n, n_pos,
               round(CASE WHEN tp > 0 THEN n_pos / tp END, 6) AS capture,
               round(CASE WHEN tp > 0
                          THEN sum(n_pos) OVER (ORDER BY decile
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) / tp
                     END, 6) AS cum_capture,
               round(CASE WHEN tp / tn > 0
                          THEN (n_pos / n::DOUBLE) / (tp / tn) END, 6)
                   AS lift
        FROM per, t
    """

    # AUC: same unroll + rounded-freeze; z rounded BEFORE the rank-sum
    # (round-before-compare on the rank key), average tie ranks from one
    # cumulative window at distinct-score granularity
    s["doc_quality_logreg_auc"] = f"""{_lr_head},
        wr AS (
            SELECT round(w0, 6) AS w0, round(wa, 6) AS wa,
                   round(wb, 6) AS wb, round(wc, 6) AS wc FROM w5),
        scored AS (SELECT y,
                 round(w0 + wa*z0 + wb*z1 + wc*z2, 6) AS score
               FROM f, wr),
        by_val AS (
            SELECT score, count(*) AS n_v,
                   sum(y)::BIGINT AS n1_v
            FROM scored GROUP BY score),
        ranked AS (
            SELECT *, coalesce(sum(n_v) OVER (
                ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING), 0) AS below
            FROM by_val),
        agg AS (
            SELECT sum(n1_v)::BIGINT AS n_pos,
                   sum(n_v - n1_v)::BIGINT AS n_neg,
                   sum(n1_v * (below + (n_v + 1.0) / 2.0)) AS r1
            FROM ranked)
        SELECT n_pos, n_neg,
               round(CASE WHEN n_pos > 0 AND n_neg > 0
                          THEN (r1 - n_pos * (n_pos + 1.0) / 2.0)
                               / (n_pos::DOUBLE * n_neg) END, 6) AS auc
        FROM agg
    """

    # DSIR: bucket counts → smoothed log-ratio table → per-doc sum;
    # '%' is pmod here because md5_long is non-negative by construction.
    # Shared as a CTE fragment: doc_dsir_weights returns it directly,
    # doc_dsir_resample composes it with the A-Res sampler.
    _DSIR_CTES = """toks AS (SELECT doc_id, lang = 'en' AS t,
                 unnest(list_filter(
                     regexp_split_to_array(lower(trim(text)), '\\s+'),
                     x -> x <> '')) AS tok
               FROM documents),
        bk AS (SELECT doc_id, t,
                 ('0x' || substr(md5('dsir:' || tok), 1, 15))::BIGINT
                     % 1024 AS b
               FROM toks),
        db AS (SELECT doc_id, t, b, count(*) AS n
               FROM bk GROUP BY 1, 2, 3),
        c AS (SELECT b, sum(n)::BIGINT AS cc,
                 sum(CASE WHEN t THEN n ELSE 0 END)::BIGINT AS tc
               FROM db GROUP BY 1),
        tot AS (SELECT sum(cc)::BIGINT AS nc, sum(tc)::BIGINT AS nt
                FROM c),
        r AS (SELECT b, ln((tc + 1) / (nt + 1024)::DOUBLE)
                      - ln((cc + 1) / (nc + 1024)::DOUBLE) AS lr
              FROM c, tot),
        dsir AS (SELECT doc_id, sum(n)::BIGINT AS n_toks,
                        round(sum(n::DOUBLE * lr), 6) AS logw
                 FROM db JOIN r USING (b) GROUP BY 1)"""
    s["doc_dsir_weights"] = f"""
        WITH {_DSIR_CTES}
        SELECT doc_id, n_toks, logw FROM dsir
    """

    # DSIR resampling: clamp the (already-rounded) log-weight, exp to an
    # A-Res weight, rank on the rounded log-priority — the same ln()
    # ulp-guard as doc_weighted_sample
    s["doc_dsir_resample"] = f"""
        WITH {_DSIR_CTES},
        iw AS (SELECT doc_id, n_toks, logw,
                 exp(least(greatest(logw, -50.0), 50.0)) AS w
               FROM dsir),
        pri AS (SELECT doc_id, n_toks, logw,
                 round(ln(({_MD5L.format(x="doc_id::VARCHAR")} + 1.0)
                          / {float((1 << 60) + 1)!r}) / w, 9) AS lp
               FROM iw)
        SELECT doc_id, n_toks, logw FROM pri
        ORDER BY lp DESC, doc_id ASC LIMIT {DSIR_SAMPLE_N}
    """

    # URL canonicalization mirrored step-for-step: fragment cut, scheme
    # cut, host lower/www/port strip, trailing-slash strip, tracking-
    # param filter (starts_with avoids LIKE's '_' wildcard trap), sort,
    # rejoin
    s["doc_url_dedup"] = """
        WITH raw AS (SELECT doc_id,
               'HTTPS://WWW.' || source || '.Example.COM:443/Docs/'
               || (doc_id % 500) || '/?utm_source=feed&ref=' || doc_id
               || '&q=' || (doc_id % 7) || '#sec' || (doc_id % 3) AS url
             FROM documents),
        s1 AS (SELECT doc_id,
                 regexp_replace(split_part(url, '#', 1),
                                '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS u
               FROM raw),
        parts AS (SELECT doc_id,
                 regexp_replace(regexp_replace(
                     lower(split_part(u, '/', 1)), '^www\\.', ''),
                     ':(80|443)$', '') AS host,
                 CASE WHEN position('/' IN u) > 0
                      THEN substr(u, position('/' IN u)) ELSE '' END AS rest
               FROM s1),
        pq AS (SELECT doc_id, host,
                 regexp_replace(split_part(rest, '?', 1), '/$', '') AS path,
                 CASE WHEN position('?' IN rest) > 0
                      THEN substr(rest, position('?' IN rest) + 1)
                      ELSE '' END AS query
               FROM parts),
        canon AS (SELECT doc_id, host || path ||
                 CASE WHEN q <> '' THEN '?' || q ELSE '' END
                     AS canonical_url
               FROM (SELECT doc_id, host, path,
                       array_to_string(list_sort(list_filter(
                           string_split(query, '&'),
                           p -> NOT (starts_with(p, 'utm_') OR
                                     regexp_matches(p,
                                       '^(ref|fbclid|gclid|mc_cid|mc_eid)='
                                     )))), '&') AS q
                     FROM pq))
        SELECT canonical_url, count(*) AS n_docs,
               min(doc_id) AS keep_id, max(doc_id) AS max_id
        FROM canon GROUP BY 1 HAVING count(*) > 1
    """

    # composition identity: backward as-of on valid_from over the
    # contiguous non-zero-width history ≡ interval containment
    # (valid_from <= ts < valid_to) — the oracle spells the containment
    # side, the Spark entry the as-of side
    s["events_scd2_asof_features"] = """
        WITH upd AS (SELECT user_id, event_type, epoch_ns(ts) AS ts
                     FROM events WHERE user_id < 50),
        seq AS (SELECT *, lag(event_type) OVER
                    (PARTITION BY user_id ORDER BY ts, event_type) AS prev,
                   row_number() OVER
                    (PARTITION BY user_id ORDER BY ts, event_type) AS rn
                FROM upd),
        chg AS (SELECT user_id, event_type, ts FROM seq
                WHERE rn = 1 OR prev IS DISTINCT FROM event_type),
        d AS (SELECT user_id, event_type AS state, ts AS valid_from,
                     lead(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_type) AS valid_to
              FROM chg),
        live AS (SELECT * FROM d
                 WHERE valid_to IS NULL OR valid_to > valid_from),
        e AS (SELECT event_id, user_id, epoch_ns(ts) AS ts_ns
              FROM events WHERE user_id < 50)
        SELECT e.event_id, e.user_id, e.ts_ns,
               l.state AS dim_state, l.valid_from AS dim_since
        FROM e JOIN live l
          ON e.user_id = l.user_id
         AND l.valid_from <= e.ts_ns
         AND (l.valid_to IS NULL OR e.ts_ns < l.valid_to)
    """

    # incremental SCD2 maintenance must equal the ONE-SHOT recompute —
    # the oracle IS the events_scd2_asof_features SQL verbatim
    s["events_scd2_incremental"] = s["events_scd2_asof_features"]

    # point-in-time join: reuse the SCD2 CTE as the dimension, join each
    # event to the version valid at its own ts, roll up
    s["events_streaming_scd2_enrich"] = """
        WITH upd AS (SELECT user_id, event_type, epoch_ns(ts) AS ts
                     FROM events WHERE user_id < 50
                       AND event_type IN ('signup', 'purchase')),
        seq AS (SELECT *, lag(event_type) OVER
                    (PARTITION BY user_id ORDER BY ts, event_type) AS prev,
                   row_number() OVER
                    (PARTITION BY user_id ORDER BY ts, event_type) AS rn
                FROM upd),
        chg AS (SELECT user_id, event_type, ts FROM seq
                WHERE rn = 1 OR prev IS DISTINCT FROM event_type),
        d AS (SELECT user_id, event_type AS state, ts AS valid_from,
                     lead(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_type) AS valid_to
              FROM chg),
        e AS (SELECT user_id, event_type, epoch_ns(ts) AS ts, value
              FROM events WHERE user_id < 50)
        SELECT d.state, e.event_type,
               count(*) AS n_events, round(sum(e.value), 2) AS sum_value
        FROM e JOIN d ON e.user_id = d.user_id
                     AND e.ts >= d.valid_from
                     AND (d.valid_to IS NULL OR e.ts < d.valid_to)
        GROUP BY 1, 2
    """

    # auto dispatch on uniform data must produce the PLAIN plan's result,
    # re-shaped to the skew-style 1-based session_num
    s["events_sessionize_auto"] = f"""
        WITH e AS (SELECT user_id, epoch_ns(ts) AS ts_ns, value FROM events),
        l AS (SELECT *, CASE WHEN ts_ns - lag(ts_ns) OVER
                                  (PARTITION BY user_id ORDER BY ts_ns)
                                  > {SESSION_GAP_SEC * 1_000_000_000}
                             THEN 1 ELSE 0 END AS new_session FROM e),
        st AS (SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_ns
                                                ROWS UNBOUNDED PRECEDING)
                             AS session_seq FROM l)
        SELECT user_id, (session_seq + 1)::BIGINT AS session_num,
               count(*) AS n_events,
               min(ts_ns) // 1000 AS session_start_us,
               max(ts_ns) // 1000 AS session_end_us,
               round(sum(value), 6) AS sum_value
        FROM st GROUP BY user_id, session_seq
    """

    # cohort retention: distinct user-days, first-day cohorts, 1/2-day
    # horizons (events span ~2.9 days per sf0.01; sf0.1 spans ~29)
    s["events_retention"] = """
        WITH days AS (SELECT DISTINCT user_id,
                             epoch_ns(ts) // 86400000000000 AS day
                      FROM events),
        firsts AS (SELECT user_id, min(day) AS cohort_day
                   FROM days GROUP BY user_id),
        sizes AS (SELECT cohort_day, count(*)::BIGINT AS n_users
                  FROM firsts GROUP BY cohort_day),
        offs AS (SELECT f.cohort_day, d.day - f.cohort_day AS horizon,
                        count(*)::BIGINT AS n_active
                 FROM days d JOIN firsts f ON d.user_id = f.user_id
                 WHERE d.day - f.cohort_day IN (1, 2)
                 GROUP BY f.cohort_day, d.day - f.cohort_day),
        dense AS (SELECT s.cohort_day, s.n_users, h.horizon
                  FROM sizes s CROSS JOIN (VALUES (1::BIGINT), (2::BIGINT))
                       AS h(horizon))
        SELECT d.cohort_day, d.n_users, d.horizon,
               coalesce(o.n_active, 0)::BIGINT AS n_active,
               round(coalesce(o.n_active, 0)::DOUBLE / d.n_users, 6) AS rate
        FROM dense d LEFT JOIN offs o
          ON d.cohort_day = o.cohort_day AND d.horizon = o.horizon
    """

    # dataset fingerprint: same injective len:tag+value framing and
    # 60-bit md5 XOR as functions/hashing.py dataset_fingerprint
    def _frame_sql(c: str) -> str:
        t = f"CASE WHEN {c} IS NULL THEN 'N' ELSE 'V' || {c}::VARCHAR END"
        return f"concat(length({t})::VARCHAR, ':', {t})"

    _fp_cols = ", ".join(
        _frame_sql(c) for c in ("doc_id", "source", "text", "n_chars")
    )
    s["io_dataset_fingerprint"] = f"""
        SELECT count(*)::BIGINT AS n_rows,
               bit_xor(('0x' || substr(md5(concat_ws('|', {_fp_cols})),
                   1, 15))::BIGINT) AS content_hash
        FROM documents
    """

    s["events_streaming_chained_agg"] = """
        WITH e AS (SELECT event_type, value, epoch_ns(ts) AS ts_ns
                   FROM events),
        i AS (SELECT (ts_ns // 300000000000) * 300 AS b_in, event_type,
                     count(*) AS n_ev, sum(value) AS s_v
              FROM e GROUP BY 1, 2)
        SELECT (b_in // 3600) * 3600 AS window_start, event_type,
               count(*) AS n_inner, sum(n_ev)::BIGINT AS n_events,
               max(n_ev) AS max_inner, round(sum(s_v), 6) AS sum_value
        FROM i GROUP BY 1, 2
    """

    s["events_ohlc"] = """
        WITH e AS (SELECT event_id, event_type, value, epoch_ns(ts) AS ts_ns
                   FROM events),
        k AS (SELECT *, (ts_ns // 3600000000000) * 3600 AS window_start,
                     lpad(ts_ns::VARCHAR, 19, '0') || ':' ||
                         lpad(event_id::VARCHAR, 19, '0') AS okey
              FROM e)
        SELECT window_start, event_type AS grp,
               min_by(value, okey) AS open,
               max(value) AS high, min(value) AS low,
               max_by(value, okey) AS close,
               count(*) AS n_events, round(sum(value), 6) AS volume
        FROM k GROUP BY 1, 2
    """

    s["text_zipf_fit"] = f"""
        WITH toks AS ({_TOKS}),
        t AS (SELECT unnest(tokens) AS term FROM toks),
        f AS (SELECT term, count(*) AS cnt FROM t
              GROUP BY 1 HAVING count(*) >= 5),
        r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, term)
                  AS rank FROM f)
        SELECT count(*) AS n_terms,
               round(regr_slope(ln(cnt::DOUBLE), ln(rank::DOUBLE)), 6)
                   AS slope,
               round(regr_intercept(ln(cnt::DOUBLE), ln(rank::DOUBLE)), 6)
                   AS intercept,
               round(regr_r2(ln(cnt::DOUBLE), ln(rank::DOUBLE)), 6) AS r2
        FROM r
    """

    # rel_bloom_join: the Bloom probe is a physical reduction, not a
    # semantic one — the oracle is the plain join.
    s["rel_bloom_join"] = """
        SELECT o_orderpriority, count(*) AS n_items,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_totalprice > 350000
        GROUP BY 1
    """

    s["io_wap_publish"] = """
        SELECT count(*) AS n_rows,
               count(*) FILTER (WHERE text IS NULL) AS n_null_text,
               sum(n_chars)::BIGINT AS sum_chars,
               min(doc_id) AS min_id, max(doc_id) AS max_id
        FROM documents
    """

    # rel_incremental_agg: the oracle is the from-scratch recompute of
    # the perturbed table — the delta identity must land on it exactly
    # (counts are exact ints; revenue rounds to cents far above the
    # subtraction's last-ulp drift).
    s["rel_incremental_agg"] = """
        WITH nw AS (
            SELECT o_orderpriority, o_totalprice FROM orders
            WHERE o_orderkey % 13 <> 0
            UNION ALL
            SELECT o_orderpriority, o_totalprice * 1.1 FROM orders
            WHERE o_orderkey % 17 = 0
        )
        SELECT o_orderpriority, count(*) AS n_rows,
               round(sum(o_totalprice), 2) AS revenue
        FROM nw GROUP BY 1
    """

    s["events_json_deadletter"] = """
        WITH m AS (SELECT event_type, event_id,
                          CASE WHEN event_id % 7 = 0
                               THEN 'corrupt:' || props ELSE props END
                              AS props
                   FROM events),
        c AS (SELECT event_type, props,
                     (props IS NOT NULL AND NOT json_valid(props)) AS bad
              FROM m)
        SELECT event_type, count(*) AS n_rows,
               sum(bad::INT)::BIGINT AS n_corrupt,
               sum(CASE WHEN NOT bad
                        THEN json_extract(props, '$.k')::INT END)::BIGINT
                   AS sum_k_valid
        FROM c GROUP BY 1
    """

    s["events_markov_transitions"] = """
        WITH e AS (SELECT user_id, event_id, event_type,
                          epoch_ns(ts) AS ts_ns FROM events),
        p AS (SELECT event_type AS from_type,
                     lead(event_type) OVER (PARTITION BY user_id
                                            ORDER BY ts_ns, event_id)
                         AS to_type
              FROM e),
        c AS (SELECT from_type, to_type, count(*) AS n FROM p
              WHERE to_type IS NOT NULL GROUP BY 1, 2),
        t AS (SELECT from_type, sum(n) AS tt FROM c GROUP BY 1)
        SELECT c.from_type, c.to_type, c.n,
               round(c.n / tt::DOUBLE, 6) AS p
        FROM c JOIN t USING (from_type)
    """

    s["events_power_users"] = """
        WITH pu AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1),
        s AS (SELECT round(quantile_cont(n, 0.99), 6) AS thr,
                     sum(n) AS total, count(*) AS users
              FROM pu)
        SELECT count(*) AS n_power_users,
               (SELECT users FROM s) AS n_users,
               round((SELECT thr FROM s), 6) AS p99_threshold,
               round(sum(n) / (SELECT total FROM s)::DOUBLE, 6)
                   AS event_share
        FROM pu WHERE n >= (SELECT thr FROM s)
    """

    s["events_dau_wau"] = """
        WITH ud AS (SELECT DISTINCT user_id,
                           epoch_ns(ts) // 86400000000000 AS day
                    FROM events),
        dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM ud
                GROUP BY 1),
        fan AS (SELECT user_id, day + o AS day
                FROM ud, unnest(range(0, 7)) AS t(o)),
        wau AS (SELECT f.day, count(DISTINCT f.user_id) AS wau
                FROM fan f JOIN dau USING (day) GROUP BY 1)
        SELECT day, dau, wau, round(dau / wau::DOUBLE, 6) AS stickiness
        FROM dau JOIN wau USING (day)
    """

    # integer decile arithmetic (n_new * 10 // n_sh) — no float ratio
    s["doc_ngram_novelty"] = f"""
        WITH toks AS ({_TOKS}),
        sh AS ({_SHINGLES}),
        first AS (SELECT shingle, min(doc_id) AS f FROM sh GROUP BY 1),
        pd AS (SELECT sh.doc_id, count(*) AS n_sh,
                      count(*) FILTER (WHERE f = sh.doc_id) AS n_new
               FROM sh JOIN first USING (shingle) GROUP BY 1),
        dec AS (SELECT doc_id,
                       least((n_new * 10) // n_sh, 9) AS decile
                FROM pd)
        SELECT d.source, dec.decile, count(*) AS n_docs
        FROM dec JOIN documents d USING (doc_id)
        GROUP BY 1, 2
    """

    s["text_token_dropout"] = f"""
        WITH toks AS ({_TOKS})
        SELECT doc_id, len(tokens)::BIGINT AS n_tokens,
               len(kept)::BIGINT AS n_kept,
               md5(array_to_string(kept, ' ')) AS kept_md5
        FROM (SELECT doc_id, tokens,
                     list_filter(tokens, (t, i) ->
                         {_MD5L.format(
                             x="doc_id::VARCHAR || ':' || i::VARCHAR"
                         )} % 10 <> 0) AS kept
              FROM toks)
    """

    s["events_value_runs"] = """
        WITH e AS (SELECT user_id, event_id, epoch_ns(ts) AS ts_ns,
                          value > 50 AS hot
                   FROM events),
        g AS (SELECT user_id, hot,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts_ns, event_id)
                     - row_number() OVER (PARTITION BY user_id, hot
                                          ORDER BY ts_ns, event_id) AS grp
              FROM e),
        runs AS (SELECT user_id, grp, count(*) AS run_len
                 FROM g WHERE hot GROUP BY 1, 2)
        SELECT user_id, count(*) AS n_runs, max(run_len) AS longest_run
        FROM runs GROUP BY 1 HAVING max(run_len) >= 5
    """

    s["events_mad_outliers"] = """
        WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS m
                     FROM events GROUP BY 1),
        j AS (SELECT e.event_type, e.value, med.m
              FROM events e JOIN med USING (event_type)),
        mad AS (SELECT event_type, quantile_cont(abs(value - m), 0.5) AS d
                FROM j GROUP BY 1),
        x AS (SELECT j.event_type, j.value, j.m, mad.d
              FROM j JOIN mad USING (event_type))
        SELECT event_type, count(*) AS n_rows,
               round(max(m), 6) AS med, round(max(d), 6) AS mad,
               sum(CASE WHEN (d > 0 AND
                              round(abs(value - m) / (1.4826 * d), 6) > 3.0)
                          OR (d = 0 AND abs(value - m) > 0)
                        THEN 1 ELSE 0 END)::BIGINT AS n_outliers
        FROM x GROUP BY 1
    """

    from clinical_vector_search_spark.operators.sketch import POISSON1_CUM

    _pois_w = "CASE " + " ".join(
        f"WHEN u < {c!r} THEN {k}" for k, c in enumerate(POISSON1_CUM)
    ) + " ELSE 5 END"
    s["events_bootstrap_ci"] = f"""
        WITH f AS (SELECT event_type, event_id, value, unnest(range(0, 50))
                       AS b
                   FROM events),
        u AS (SELECT event_type, b, value,
                     ('0x' || substr(md5(b::VARCHAR || ':' ||
                          event_id::VARCHAR), 1, 15))::BIGINT
                         / {float(1 << 60)!r} AS u
              FROM f),
        w AS (SELECT event_type, b, value, {_pois_w} AS w FROM u),
        rep AS (SELECT event_type, b,
                       round(sum(w * value) / sum(w), 6) AS rm
                FROM w GROUP BY 1, 2 HAVING sum(w) > 0),
        ci AS (SELECT event_type,
                      round(quantile_cont(rm, 0.05), 6) AS ci_lo,
                      round(quantile_cont(rm, 0.95), 6) AS ci_hi
               FROM rep GROUP BY 1),
        base AS (SELECT event_type, count(*) AS n_rows,
                        round(avg(value), 6) AS mean
                 FROM events GROUP BY 1)
        SELECT base.event_type, n_rows, mean, ci_lo, ci_hi
        FROM base JOIN ci USING (event_type)
    """

    s["events_variant_extract"] = """
        WITH v AS (SELECT event_type,
                          json_extract(props, '$.k')::INT AS k
                   FROM events)
        SELECT event_type, count(*) AS n_events, count(k) AS n_with_k,
               sum(k)::BIGINT AS sum_k, min(k) AS min_k, max(k) AS max_k
        FROM v GROUP BY 1
    """

    s["text_bpe_pair_counts"] = f"""
        WITH toks AS ({_TOKS}),
        w AS (SELECT unnest(tokens) AS word FROM toks),
        wc AS (SELECT word, count(*) AS n FROM w GROUP BY 1),
        sym AS (SELECT n,
                  list_concat([substr(word, i, 1)
                               FOR i IN range(1, length(word) + 1)],
                              ['▁']) AS s
                FROM wc),
        pp AS (SELECT n, unnest([{{'l': s[i], 'r': s[i + 1]}}
                                 FOR i IN range(1, len(s))]) AS pr
               FROM sym)
        SELECT pr.l AS lsym, pr.r AS rsym, sum(n)::BIGINT AS pair_count
        FROM pp GROUP BY 1, 2
    """

    # dedup_pagerank: unroll the SAME 5 iterations the Spark operator
    # runs; float literals use Python repr so (1-d)/N matches Spark's
    # arithmetic bit-for-bit before the round-9.
    _pr_base = f"1.0 - {PAGERANK_DAMP!r}"
    _pr_stages = ""
    _prev = "r0"
    for _k in range(PAGERANK_ITER):
        _pr_stages += f"""
        c{_k} AS (SELECT e.dst AS node, sum({_prev}.rank / deg._deg) AS c
                 FROM pr_edges e JOIN {_prev} ON e.src = {_prev}.node
                              JOIN deg ON deg.node = e.src
                 GROUP BY 1),
        d{_k} AS (SELECT coalesce(sum(rank), 0) AS m FROM {_prev}
                 WHERE node NOT IN (SELECT node FROM deg)),
        r{_k + 1} AS (SELECT an.node,
                     ({_pr_base}) / (SELECT n_n FROM nn)
                     + {PAGERANK_DAMP!r} * (coalesce(c{_k}.c, 0)
                         + (SELECT m FROM d{_k}) / (SELECT n_n FROM nn))
                         AS rank
                   FROM allnodes an LEFT JOIN c{_k} USING (node)),"""
        _prev = f"r{_k + 1}"
    s["dedup_pagerank"] = f"""
        WITH toks AS ({_TOKS}),
        sh AS ({_SHINGLES}),
        sizes AS (SELECT doc_id, count(*)::DOUBLE AS n_sh FROM sh
                  GROUP BY doc_id),
        common AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                          count(*)::DOUBLE AS common
                   FROM sh a JOIN sh b ON a.shingle = b.shingle
                                      AND a.doc_id < b.doc_id
                   GROUP BY a.doc_id, b.doc_id),
        p AS (SELECT a_id, b_id
              FROM common JOIN sizes sa ON sa.doc_id = a_id
                          JOIN sizes sb ON sb.doc_id = b_id
              WHERE common / (sa.n_sh + sb.n_sh - common)
                  >= {JACCARD_THR}),
        pr_edges AS (SELECT a_id AS src, b_id AS dst FROM p
                     UNION ALL SELECT b_id, a_id FROM p),
        allnodes AS (SELECT doc_id AS node FROM documents),
        nn AS (SELECT count(*)::DOUBLE AS n_n FROM allnodes),
        deg AS (SELECT src AS node, count(*)::DOUBLE AS _deg
                FROM pr_edges GROUP BY 1),
        r0 AS (SELECT node, 1.0 / (SELECT n_n FROM nn) AS rank
               FROM allnodes),{_pr_stages}
        fin AS (SELECT node, rank FROM {_prev})
        SELECT node AS doc_id, round(rank, 9) AS rank FROM fin
    """

    s["rel_window_distribution"] = """
        WITH r AS (SELECT c_mktsegment, c_custkey, c_acctbal,
                round(percent_rank() OVER w, 6) AS pct_rank,
                round(cume_dist() OVER w, 6) AS cume,
                ntile(4) OVER w AS quartile,
                row_number() OVER (PARTITION BY c_mktsegment
                                   ORDER BY c_acctbal DESC, c_custkey) AS rn
            FROM customer
            WINDOW w AS (PARTITION BY c_mktsegment
                         ORDER BY c_acctbal, c_custkey))
        SELECT c_mktsegment, c_custkey, c_acctbal, pct_rank, cume, quartile
        FROM r WHERE rn <= 5
    """

    s["rel_grouping_sets"] = """
        SELECT o_orderpriority, o_orderstatus,
               grouping(o_orderpriority, o_orderstatus) AS gid,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                (o_orderpriority), ())
    """

    s["rel_unpivot"] = """
        WITH wide AS (
            SELECT n_name,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS sum_disc
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            GROUP BY 1)
        SELECT n_name, measure, value FROM wide
        UNPIVOT (value FOR measure IN (sum_qty, sum_base, sum_disc))
    """

    # multimodal_phash: fake pixels p_i = (md5_byte[i%16]*31+i) % 256,
    # bit set iff 64*p_i > sum(p) (integer-exact), halves rebuilt with
    # shifts <= 31 only (DuckDB overflow-checks 1<<63).
    s["multimodal_phash"] = """
        WITH m AS (SELECT doc_id AS media_id, md5(text) AS h FROM documents),
        p AS (SELECT media_id,
                [((('0x' || substr(h, (i % 16) * 2 + 1, 2))::BIGINT * 31 + i)
                  % 256) FOR i IN range(0, 64)] AS px
              FROM m),
        s AS (SELECT media_id, px, list_sum(px) AS sm FROM p)
        SELECT media_id,
               list_sum([CASE WHEN 64 * px[i + 1] > sm
                              THEN (1::BIGINT << (i - 32)) ELSE 0 END
                         FOR i IN range(32, 64)])::BIGINT AS phash_hi,
               list_sum([CASE WHEN 64 * px[i + 1] > sm
                              THEN (1::BIGINT << i) ELSE 0 END
                         FOR i IN range(0, 32)])::BIGINT AS phash_lo
        FROM s
    """

    s["io_snapshot_diff"] = """
        WITH base AS (SELECT doc_id, lang, n_chars FROM documents),
        nw AS (
            SELECT doc_id, lang,
                   CASE WHEN doc_id % 7 = 0 THEN n_chars + 1
                        ELSE n_chars END AS n_chars
            FROM base WHERE doc_id % 13 <> 0
            UNION ALL
            SELECT doc_id + 1000000, lang, n_chars FROM base
            WHERE doc_id % 17 = 0
        ),
        d AS (SELECT coalesce(n.doc_id, b.doc_id) AS doc_id,
                     CASE WHEN b.doc_id IS NULL THEN 'added'
                          WHEN n.doc_id IS NULL THEN 'removed'
                          WHEN b.lang IS DISTINCT FROM n.lang
                            OR b.n_chars IS DISTINCT FROM n.n_chars
                              THEN 'changed'
                     END AS change_type
              FROM base b FULL OUTER JOIN nw n ON b.doc_id = n.doc_id)
        SELECT doc_id, change_type FROM d WHERE change_type IS NOT NULL
    """

    s["io_python_datasink"] = """
        SELECT lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS sum_chars
        FROM documents GROUP BY 1
    """

    # io_shard_manifest: the roundtrip wrote shard = md5(doc_id) pmod 16
    # and an XOR-of-row-hashes manifest; the oracle re-derives both from
    # the SOURCE table — matching proves the published artifact carries
    # exactly the source rows, correctly assigned.
    s["io_shard_manifest"] = f"""
        WITH s AS (SELECT doc_id, source, text, n_chars,
                          ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT
                              % 16 AS shard
                   FROM documents)
        SELECT shard, count(*) AS n_rows,
               bit_xor(('0x' || substr(md5(concat_ws('|', {_fp_cols})),
                   1, 15))::BIGINT) AS content_hash,
               min(doc_id) AS min_key, max(doc_id) AS max_key
        FROM s GROUP BY 1
    """

    # span-level dedup: first-occurrence winners via row_number (the
    # oracle can afford the window; Spark side uses the skew-safe
    # groupBy-min), reassembly via ordered string_agg
    s["dedup_spans"] = r"""
        WITH u0 AS (SELECT doc_id,
                unnest(regexp_split_to_array(text, '\.\s+')) AS unit,
                unnest(range(1, len(regexp_split_to_array(text, '\.\s+')) + 1))
                    AS pos
            FROM documents),
        f AS (SELECT doc_id, pos, unit, lower(trim(unit)) AS k
              FROM u0 WHERE trim(unit) <> ''),
        kept AS (SELECT doc_id, pos, unit FROM
                 (SELECT f.*, row_number()
                         OVER (PARTITION BY k ORDER BY doc_id, pos) AS rn
                  FROM f)
                 WHERE rn = 1),
        rb AS (SELECT doc_id, count(*) AS n_kept,
                      string_agg(unit, '. ' ORDER BY pos) AS text_dedup
               FROM kept GROUP BY doc_id)
        SELECT d.doc_id, coalesce(rb.n_kept, 0) AS n_kept,
               coalesce(rb.text_dedup, '') AS text_dedup
        FROM documents d LEFT JOIN rb ON d.doc_id = rb.doc_id
    """

    # repeated-window scoring: 5-token windows (non-distinct), hotness by
    # distinct-doc count, same md5-long gram key as the Spark side
    s["dedup_repeated_windows"] = f"""
        WITH toks AS ({_TOKS}),
        w AS (SELECT doc_id, unnest(
                CASE WHEN len(tokens) >= 5
                     THEN [array_to_string(tokens[i:i+4], ' ')
                           FOR i IN range(1, len(tokens) - 3)]
                     ELSE []::VARCHAR[] END) AS gram
              FROM toks),
        g AS (SELECT doc_id, {_MD5L.format(x="gram")} AS g FROM w),
        hot AS (SELECT g FROM g GROUP BY g
                HAVING count(DISTINCT doc_id) >= 2),
        st AS (SELECT t.doc_id, count(*) AS n_windows,
                      sum(CASE WHEN h.g IS NOT NULL THEN 1 ELSE 0 END)
                          AS n_repeated
               FROM g t LEFT JOIN hot h ON t.g = h.g
               GROUP BY t.doc_id)
        SELECT d.doc_id,
               coalesce(n_windows, 0)::BIGINT AS n_windows,
               coalesce(n_repeated, 0)::BIGINT AS n_repeated,
               CASE WHEN coalesce(n_windows, 0) > 0
                    THEN round(coalesce(n_repeated, 0)::DOUBLE / n_windows, 6)
                    ELSE 0.0 END AS frac_repeated
        FROM documents d LEFT JOIN st ON d.doc_id = st.doc_id
    """

    # incremental ingest filter: same signature family, banded with
    # string_agg ordered by hash_idx (== Spark's array_sort-by-hash_idx
    # band key); corpus = doc_id < INCR_CORPUS_MAX, batch = the rest
    s["dedup_incremental"] = f"""
        WITH toks AS ({_TOKS}),
        sh AS ({_SHINGLES}),
        h AS (SELECT doc_id,
                     {_MD5L.format(x="shingle")} % {MINHASH_P} AS hv
              FROM sh),
        fam AS (SELECT * FROM (VALUES {params_values}) AS p(hash_idx, a, b)),
        sigs AS (SELECT doc_id, hash_idx,
                        min((a::BIGINT * hv + b) % {MINHASH_P}) AS sig
                 FROM h CROSS JOIN fam GROUP BY doc_id, hash_idx),
        bands AS (SELECT doc_id, hash_idx // 2 AS band,
                         string_agg(sig::VARCHAR, '-' ORDER BY hash_idx) AS bk
                  FROM sigs GROUP BY doc_id, hash_idx // 2),
        corp AS (SELECT DISTINCT band, bk FROM bands
                 WHERE doc_id < {INCR_CORPUS_MAX}),
        hits AS (SELECT DISTINCT b.doc_id FROM bands b
                 JOIN corp USING (band, bk)
                 WHERE b.doc_id >= {INCR_CORPUS_MAX})
        SELECT d.doc_id, (h.doc_id IS NOT NULL) AS corpus_dup
        FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
        WHERE d.doc_id >= {INCR_CORPUS_MAX}
    """

    # incremental PAIR maintenance: oracle = the full-corpus banded
    # recompute (identical signature family and band keys) restricted
    # to pairs with >= 1 batch member — exactly the pairs the
    # broadcast-probe incremental path must emit
    s["dedup_minhash_incremental"] = f"""
        WITH toks AS ({_TOKS}),
        sh AS ({_SHINGLES}),
        h AS (SELECT doc_id,
                     {_MD5L.format(x="shingle")} % {MINHASH_P} AS hv
              FROM sh),
        fam AS (SELECT * FROM (VALUES {params_values}) AS p(hash_idx, a, b)),
        sigs AS (SELECT doc_id, hash_idx,
                        min((a::BIGINT * hv + b) % {MINHASH_P}) AS sig
                 FROM h CROSS JOIN fam GROUP BY doc_id, hash_idx),
        bands AS (SELECT doc_id, hash_idx // 2 AS band,
                         string_agg(sig::VARCHAR, '-' ORDER BY hash_idx) AS bk
                  FROM sigs GROUP BY doc_id, hash_idx // 2)
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id
        WHERE a.doc_id >= {INCR_CORPUS_MAX} OR b.doc_id >= {INCR_CORPUS_MAX}
    """

    # streaming near-dup ingestion: chunking-invariant accumulation —
    # oracle = the ONE-SHOT banded pair recompute over all docs
    s["dedup_streaming_neardup"] = f"""
        WITH toks AS ({_TOKS}),
        sh AS ({_SHINGLES}),
        h AS (SELECT doc_id,
                     {_MD5L.format(x="shingle")} % {MINHASH_P} AS hv
              FROM sh),
        fam AS (SELECT * FROM (VALUES {params_values}) AS p(hash_idx, a, b)),
        sigs AS (SELECT doc_id, hash_idx,
                        min((a::BIGINT * hv + b) % {MINHASH_P}) AS sig
                 FROM h CROSS JOIN fam GROUP BY doc_id, hash_idx),
        bands AS (SELECT doc_id, hash_idx // 2 AS band,
                         string_agg(sig::VARCHAR, '-' ORDER BY hash_idx) AS bk
                  FROM sigs GROUP BY doc_id, hash_idx // 2)
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id
    """

    # incremental GROUP maintenance: oracle = from-scratch transitive
    # closure over the FULL band pair graph (same recursive-CTE min-
    # label closure as dedup_groups), restricted to components that
    # contain a batch (id >= INCR_CORPUS_MAX) doc
    s["dedup_groups_incremental"] = f"""
        WITH RECURSIVE toks AS ({_TOKS}),
        sh AS ({_SHINGLES}),
        h AS (SELECT doc_id,
                     {_MD5L.format(x="shingle")} % {MINHASH_P} AS hv
              FROM sh),
        fam AS (SELECT * FROM (VALUES {params_values}) AS p(hash_idx, a, b)),
        sigs AS (SELECT doc_id, hash_idx,
                        min((a::BIGINT * hv + b) % {MINHASH_P}) AS sig
                 FROM h CROSS JOIN fam GROUP BY doc_id, hash_idx),
        bands AS (SELECT doc_id, hash_idx // 2 AS band,
                         string_agg(sig::VARCHAR, '-' ORDER BY hash_idx) AS bk
                  FROM sigs GROUP BY doc_id, hash_idx // 2),
        p AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
              FROM bands a JOIN bands b
                ON a.band = b.band AND a.bk = b.bk
               AND a.doc_id < b.doc_id),
        e AS (SELECT a_id AS src, b_id AS dst FROM p
              UNION ALL SELECT b_id, a_id FROM p),
        reach AS (
            SELECT doc_id AS src, doc_id AS dst FROM documents
            UNION
            SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src
        ),
        lbl AS (SELECT src AS doc_id, min(dst) AS group_id
                FROM reach GROUP BY src),
        touched AS (SELECT DISTINCT group_id FROM lbl
                    WHERE doc_id >= {INCR_CORPUS_MAX})
        SELECT doc_id, group_id FROM lbl
        WHERE group_id IN (SELECT group_id FROM touched)
    """

    s["dedup_simhash"] = f"""
        WITH toks AS ({_TOKS}),
        t AS (SELECT doc_id, unnest(tokens) AS tok FROM toks),
        h AS (SELECT doc_id, {_MD5L.format(x="tok")} AS hv FROM t),
        bits AS (SELECT unnest(range(0, 16)) AS j),
        sb AS (SELECT doc_id, j,
                      sum(CASE WHEN (hv >> j::INT) & 1 = 1 THEN 1 ELSE -1 END)
                          AS bsum
               FROM h CROSS JOIN bits GROUP BY doc_id, j)
        SELECT doc_id,
               sum(CASE WHEN bsum > 0 THEN (1::BIGINT << j::INT)
                        ELSE 0 END)::BIGINT AS simhash
        FROM sb GROUP BY doc_id
    """

    s["dedup_ngram_jaccard"] = f"""
        WITH toks AS ({_TOKS}),
        sh AS ({_SHINGLES}),
        sizes AS (SELECT doc_id, count(*)::DOUBLE AS n_sh FROM sh GROUP BY doc_id),
        common AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                          count(*)::DOUBLE AS common
                   FROM sh a JOIN sh b ON a.shingle = b.shingle
                                      AND a.doc_id < b.doc_id
                   GROUP BY a.doc_id, b.doc_id)
        SELECT a_id, b_id,
               round(common / (sa.n_sh + sb.n_sh - common), 6) AS jaccard
        FROM common JOIN sizes sa ON sa.doc_id = a_id
                    JOIN sizes sb ON sb.doc_id = b_id
        WHERE common / (sa.n_sh + sb.n_sh - common) >= {JACCARD_THR}
    """

    # dedup_soft_weights: commonness = mean corpus document frequency
    # of the doc's distinct shingles (gdf counts DOCS because _SHINGLES
    # is distinct per doc); weight = 1/commonness. Exact-integer sums
    # under the double division, so both engines compute the identical
    # double before the 6dp round.
    s["dedup_soft_weights"] = f"""
        WITH toks AS ({_TOKS}),
        sh AS ({_SHINGLES}),
        gdf AS (SELECT shingle, count(*) AS gdf FROM sh GROUP BY 1)
        SELECT doc_id,
               count(*) AS n_shingles,
               round(avg(gdf), 6) AS commonness,
               round(1.0 / avg(gdf), 6) AS weight
        FROM sh JOIN gdf USING(shingle)
        GROUP BY doc_id
    """

    # dedup_soft_sample: the soft weights (1/mean-shingle-df, weight-1
    # default for shingle-less docs) composed into the A-Res weighted
    # draw — the doc_weighted_sample log-priority fragment with the
    # weight column swapped in (weights are strictly positive, so the
    # -infinity guard is unreachable and omitted)
    s["dedup_soft_sample"] = f"""
        WITH toks AS ({_TOKS}),
        sh AS ({_SHINGLES}),
        gdf AS (SELECT shingle, count(*) AS gdf FROM sh GROUP BY 1),
        w AS (SELECT doc_id, round(1.0 / avg(gdf), 6) AS weight
              FROM sh JOIN gdf USING(shingle) GROUP BY doc_id),
        aw AS (SELECT d.doc_id, coalesce(w.weight, 1.0) AS weight
               FROM documents d LEFT JOIN w USING (doc_id)),
        pri AS (SELECT doc_id, weight,
                       round(ln(({_MD5L.format(x="doc_id::VARCHAR")} + 1.0)
                                / {float((1 << 60) + 1)!r})
                             / weight, 9) AS lp
                FROM aw)
        SELECT doc_id, weight FROM pri
        ORDER BY lp DESC, doc_id ASC LIMIT {WEIGHTED_SAMPLE_N}
    """

    # dedup_jaccard_prefix: the prefix-filtered Spark plan is an exact
    # algorithm, so the oracle is the SAME all-pairs formulation at its
    # threshold (0.5) — the filter is a physical optimization, not a
    # semantic one.
    s["dedup_jaccard_prefix"] = f"""
        WITH toks AS ({_TOKS}),
        sh AS ({_SHINGLES}),
        sizes AS (SELECT doc_id, count(*)::DOUBLE AS n_sh FROM sh GROUP BY doc_id),
        common AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                          count(*)::DOUBLE AS common
                   FROM sh a JOIN sh b ON a.shingle = b.shingle
                                      AND a.doc_id < b.doc_id
                   GROUP BY a.doc_id, b.doc_id)
        SELECT a_id, b_id,
               round(common / (sa.n_sh + sb.n_sh - common), 6) AS jaccard
        FROM common JOIN sizes sa ON sa.doc_id = a_id
                    JOIN sizes sb ON sb.doc_id = b_id
        WHERE common / (sa.n_sh + sb.n_sh - common) >= 0.5
    """

    s["events_time_weighted"] = """
        WITH e AS (SELECT event_id, user_id, epoch_ns(ts) AS ts_ns, value
                   FROM events),
        g AS (SELECT user_id, value,
                     lead(ts_ns) OVER (PARTITION BY user_id
                                       ORDER BY ts_ns, event_id)
                      - ts_ns AS gap
              FROM e)
        SELECT user_id, count(*) AS n_events, sum(gap)::BIGINT AS span_ns,
               round(sum(value * gap::DOUBLE) / sum(gap)::DOUBLE, 6) AS twa
        FROM g GROUP BY 1 HAVING sum(gap) > 0
    """

    # DuckDB dayofweek is 0-based Sunday; Spark's is 1-based — the +1
    # below aligns them
    s["events_seasonal_index"] = """
        WITH per AS (
            SELECT event_type, (dayofweek(ts) + 1)::BIGINT AS phase,
                   count(value)::BIGINT AS n_events, sum(value) AS s
            FROM events GROUP BY 1, 2
        ),
        tot AS (SELECT event_type, sum(n_events) AS tn, sum(s) AS tsum
                FROM per GROUP BY 1)
        SELECT event_type, phase, n_events,
               round(s / n_events, 6) AS phase_mean,
               round((s / n_events) / (tsum / tn), 6) AS seasonal_index
        FROM per JOIN tot USING (event_type)
    """

    s["events_seasonal_outliers"] = """
        WITH daily AS (
            SELECT event_type, ts::DATE AS day, sum(value) AS day_total
            FROM events GROUP BY 1, 2
        ),
        pd AS (
            SELECT event_type, (dayofweek(day) + 1) AS phase,
                   count(*) AS n, sum(day_total) AS s
            FROM daily GROUP BY 1, 2
        ),
        tot AS (SELECT event_type, sum(n) AS tn, sum(s) AS tsum
                FROM pd GROUP BY 1),
        idx AS (
            SELECT event_type, phase, (s / n) / (tsum / tn) AS i
            FROM pd JOIN tot USING (event_type)
        ),
        adj AS (
            SELECT d.event_type, d.day, d.day_total,
                   d.day_total / i.i AS a
            FROM daily d
            JOIN idx i ON d.event_type = i.event_type
                      AND (dayofweek(d.day) + 1) = i.phase
        ),
        st AS (SELECT event_type, avg(a) AS m, stddev_pop(a) AS sd
               FROM adj GROUP BY 1)
        SELECT adj.event_type, strftime(adj.day, '%Y-%m-%d') AS day,
               round(adj.day_total, 6) AS day_total,
               round(adj.a, 6) AS adjusted,
               round(abs(adj.a - m) / sd, 6) AS z
        FROM adj JOIN st USING (event_type)
        WHERE sd > 0 AND round(abs(adj.a - m) / sd, 6) > 2.5
    """

    s["events_ewma"] = """
        WITH e AS (SELECT user_id, event_id, epoch_ns(ts) AS ts_ns, value
                   FROM events WHERE value IS NOT NULL),
        t AS (
            SELECT user_id, event_id, ts_ns, value,
                   list(value) OVER (
                       PARTITION BY user_id ORDER BY ts_ns, event_id
                       ROWS BETWEEN 7 PRECEDING AND CURRENT ROW
                   ) AS tail
            FROM e
        )
        SELECT user_id, event_id, ts_ns, round(value, 6) AS value,
               round(
                   list_sum(list_transform(
                       tail, (x, i) -> x * pow(0.75, len(tail) - i)))
                   / list_sum(list_transform(
                       tail, (x, i) -> pow(0.75, len(tail) - i))), 6
               ) AS ewma
        FROM t
    """

    s["rel_revenue_concentration"] = """
        WITH per AS (
            SELECT p_type,
                   sum(l_extendedprice * (1.0 - l_discount)) AS rev
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY 1
        ),
        tot AS (SELECT sum(rev) AS t FROM per)
        SELECT p_type, round(rev, 2) AS revenue,
               round(rev / t, 6) AS share
        FROM per CROSS JOIN tot
        WHERE round(rev / t, 6) > 0.15
    """

    s["rel_gini"] = """
        WITH rev AS (
            SELECT o_custkey, round(sum(o_totalprice), 2) AS r
            FROM orders GROUP BY 1
        ),
        cr AS (
            SELECT n_name, c_custkey, coalesce(rev.r, 0.0) AS x
            FROM customer
            LEFT JOIN rev ON c_custkey = o_custkey
            JOIN nation ON c_nationkey = n_nationkey
        ),
        ranked AS (
            SELECT n_name, x,
                   row_number() OVER (
                       PARTITION BY n_name ORDER BY x, c_custkey
                   )::BIGINT AS rk
            FROM cr
        )
        SELECT n_name, count(*)::BIGINT AS n_customers,
               round(sum(x), 2) AS total_rev,
               round(2.0 * sum(rk * x) / (count(*) * sum(x))
                     - (count(*) + 1.0) / count(*), 6) AS gini
        FROM ranked GROUP BY 1
        HAVING round(sum(x), 2) > 0
    """

    _WINNOW_SEL = f"""
        toks AS ({_TOKS}),
        flat AS (
            SELECT doc_id, unnest(tokens) AS tok,
                   unnest(range(len(tokens))) AS pos
            FROM toks
        ),
        g AS (
            SELECT doc_id, pos, tok,
                   lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t1,
                   lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS t2
            FROM flat
        ),
        keyed AS (
            SELECT doc_id, pos,
                   ({_MD5L.format(x="tok || ' ' || t1 || ' ' || t2")}
                    % 2147483648) * 2097152
                   + (2097151 - pos) AS key
            FROM g WHERE t2 IS NOT NULL AND pos < 2097152
        ),
        win AS (
            SELECT doc_id, pos,
                   min(key) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING
                   ) AS wmin,
                   count(*) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING
                   ) AS cnt,
                   count(*) OVER (PARTITION BY doc_id) AS n
            FROM keyed
        ),
        sel AS (
            SELECT DISTINCT doc_id,
                   (2097151 - (wmin & 2097151))::BIGINT AS fp_pos,
                   (wmin >> 21)::BIGINT AS fp_hash
            FROM win WHERE cnt = 4 OR (pos = 0 AND n < 4)
        )
    """

    s["text_winnowing"] = f"""
        WITH {_WINNOW_SEL}
        SELECT doc_id, count(*)::BIGINT AS n_fp,
               sum(fp_hash)::BIGINT AS fp_hash_sum,
               min(fp_hash)::BIGINT AS fp_hash_min,
               sum(fp_pos)::BIGINT AS fp_pos_sum
        FROM sel GROUP BY doc_id
    """

    s["dedup_winnowing_pairs"] = f"""
        WITH {_WINNOW_SEL},
        fp AS (SELECT DISTINCT doc_id, fp_hash FROM sel)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               count(*)::BIGINT AS n_shared
        FROM fp a JOIN fp b
          ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
        GROUP BY 1, 2
        HAVING count(*) >= 5
    """

    # k-core: unroll the SAME 4 fixed peeling iterations the Spark side
    # runs (kcore n_iter=4, k=3) — iteration parity is the contract
    _kcore_iters = []
    prev = "e0"
    for i in range(1, 5):
        _kcore_iters.append(
            f"""d{i} AS MATERIALIZED (
                SELECT node, count(*) AS deg FROM (
                    SELECT u AS node FROM {prev}
                    UNION ALL SELECT v FROM {prev}
                ) t GROUP BY node
            ),
            k{i} AS MATERIALIZED (SELECT node FROM d{i} WHERE deg >= 3),
            e{i} AS MATERIALIZED (
                SELECT u, v FROM {prev}
                WHERE u IN (SELECT node FROM k{i})
                  AND v IN (SELECT node FROM k{i})
            )"""
        )
        prev = f"e{i}"
    s["graph_kcore"] = f"""
        WITH ob AS (
            SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        ),
        e0 AS MATERIALIZED (
            SELECT a.p AS u, b.p AS v
            FROM ob a JOIN ob b ON a.o = b.o AND a.p < b.p
            GROUP BY 1, 2
            HAVING count(*) >= 2
        ),
        {", ".join(_kcore_iters)}
        SELECT node::BIGINT AS node, count(*)::BIGINT AS core_deg FROM (
            SELECT u AS node FROM e4 UNION ALL SELECT v FROM e4
        ) t GROUP BY node
    """

    s["text_heaps_fit"] = r"""
        WITH per AS (
            SELECT coalesce(source, '?') || '|' || coalesce(lang, '?')
                       AS slice_key,
                   count(*) AS n_tokens,
                   count(DISTINCT term) AS n_vocab
            FROM (
                SELECT source, lang, unnest(list_filter(
                    regexp_split_to_array(lower(trim(text)), '\s+'),
                    t -> t <> '')) AS term
                FROM documents
            ) t
            GROUP BY 1 HAVING count(*) >= 1
        )
        SELECT count(*)::BIGINT AS n_slices,
               round(regr_slope(ln(n_vocab::DOUBLE),
                                ln(n_tokens::DOUBLE)), 6) AS beta,
               round(exp(regr_intercept(ln(n_vocab::DOUBLE),
                                        ln(n_tokens::DOUBLE))), 6) AS k,
               round(regr_r2(ln(n_vocab::DOUBLE),
                             ln(n_tokens::DOUBLE)), 6) AS r2
        FROM per HAVING count(*) >= 3
    """

    s["rag_query_expansion"] = f"""
        WITH toks AS ({_TOKS}),
        dt0 AS (SELECT DISTINCT doc_id, unnest(tokens) AS term
                FROM (SELECT doc_id, tokens FROM toks)),
        vocab AS (SELECT term, count(*) AS n_term FROM dt0
                  GROUP BY 1 HAVING count(*) >= 10),
        dt AS (SELECT dt0.doc_id, dt0.term, vocab.n_term
               FROM dt0 JOIN vocab USING(term)),
        nn AS (SELECT count(distinct doc_id)::DOUBLE AS n_docs
               FROM documents),
        p AS (SELECT a.term AS term_a, b.term AS term_b,
                     a.n_term AS n_a, b.n_term AS n_b, count(*) AS n_ab
              FROM dt a JOIN dt b ON a.doc_id=b.doc_id AND a.term < b.term
              GROUP BY 1,2,3,4 HAVING count(*) >= 10),
        pmi AS (SELECT term_a, term_b,
                       round(ln(n_ab * (SELECT n_docs FROM nn)
                                / (n_a * n_b)), 6) AS pmi
                FROM p),
        qt AS (SELECT * FROM (VALUES ('spark'), ('table'), ('query'))
               AS t(qterm)),
        cand AS (
            SELECT qterm, term_b AS exp, pmi
            FROM pmi JOIN qt ON term_a = qterm
            UNION ALL
            SELECT qterm, term_a, pmi
            FROM pmi JOIN qt ON term_b = qterm
        ),
        expn AS (
            SELECT qterm AS query_id, exp AS term, 0.5 AS qw
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY qterm ORDER BY pmi DESC, exp) AS rn
                  FROM cand) t
            WHERE rn <= 2
        ),
        q AS (
            SELECT query_id, term, max(qw) AS qw FROM (
                SELECT qterm AS query_id, qterm AS term, 1.0 AS qw FROM qt
                UNION ALL SELECT * FROM expn
            ) t GROUP BY 1, 2
        ),
        dl AS (SELECT doc_id, len(tokens)::DOUBLE AS dl FROM toks),
        terms AS (SELECT doc_id, unnest(tokens) AS term FROM toks),
        tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf
               FROM terms GROUP BY 1, 2),
        dfreq AS (SELECT term, count(*)::DOUBLE AS df FROM tf
                  GROUP BY term),
        stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl
                  FROM dl),
        idf0 AS (SELECT term, ln((n_docs - df + 0.5) / (df + 0.5))
                     AS raw_idf
                 FROM dfreq CROSS JOIN stats),
        aidf AS (SELECT avg(raw_idf) AS avg_idf FROM idf0),
        idf AS (SELECT term, CASE WHEN raw_idf < 0 THEN 0.25 * avg_idf
                                  ELSE raw_idf END AS idf
                FROM idf0 CROSS JOIN aidf),
        sc AS (SELECT q.query_id, tf.doc_id,
                      round(sum(q.qw * idf.idf * tf.tf * 2.5
                                / (tf.tf + 1.5 * (0.25
                                   + 0.75 * dl.dl / stats.avgdl))), 6)
                          AS bm25
               FROM tf JOIN q USING (term) JOIN idf USING (term)
                       JOIN dl USING (doc_id) CROSS JOIN stats
               GROUP BY 1, 2)
        SELECT query_id, doc_id, bm25, rn::BIGINT AS rank FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY bm25 DESC, doc_id) AS rn
            FROM sc) t
        WHERE rn <= 10
    """

    # deterministic HLL twin: identical md5 register math in SQL.
    # DuckDB bin() strips leading zeros exactly like Spark conv(.,10,2),
    # so bit-length == string length on both engines.
    _HLL_EST = """
        SELECT {keys}, round(
            CASE WHEN e_raw <= 2.5 * 4096.0 AND (4096 - v) > 0
                 THEN 4096.0 * ln(4096.0 / (4096 - v))
                 ELSE e_raw END, 4) AS {out}
        FROM (
            SELECT {keys}, v,
                   ((0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0 * 4096.0)
                   / (sp + (4096 - v)) AS e_raw
            FROM (SELECT {keys}, count(*) AS v,
                         sum(pow(2.0, -m)) AS sp
                  FROM {regs} GROUP BY {keys}) t
        ) t2
    """

    s["events_hll_overlap"] = f"""
        WITH e AS (
            SELECT event_type AS grp,
                   user_id::VARCHAR || ':' || strftime(ts::DATE, '%Y-%m-%d')
                       AS v
            FROM events
        ),
        h AS (SELECT grp, {_MD5L.format(x="v")} AS hv FROM e),
        regs AS (
            SELECT grp, hv % 4096 AS bucket,
                   max(CASE WHEN (hv // 4096) = 0 THEN 49
                            ELSE 48 - length(bin(hv // 4096)) + 1
                       END)::BIGINT AS m
            FROM h GROUP BY 1, 2
        ),
        est AS ({_HLL_EST.format(keys="grp", out="est_g", regs="regs")}),
        pairs AS (
            SELECT a.grp AS grp_a, b.grp AS grp_b
            FROM (SELECT DISTINCT grp FROM regs) a
            JOIN (SELECT DISTINCT grp FROM regs) b ON a.grp < b.grp
        ),
        uregs AS (
            SELECT grp_a, grp_b, bucket, max(m) AS m
            FROM (
                SELECT p.grp_a, p.grp_b, r.bucket, r.m
                FROM pairs p JOIN regs r ON r.grp = p.grp_a
                UNION ALL
                SELECT p.grp_a, p.grp_b, r.bucket, r.m
                FROM pairs p JOIN regs r ON r.grp = p.grp_b
            ) t GROUP BY 1, 2, 3
        ),
        estu AS ({_HLL_EST.format(
            keys="grp_a, grp_b", out="est_union", regs="uregs")}),
        dv AS (SELECT DISTINCT grp, v FROM e),
        sizes AS (SELECT grp, count(*)::BIGINT AS n FROM dv GROUP BY 1),
        exact AS (
            SELECT a.grp AS grp_a, b.grp AS grp_b,
                   count(*)::BIGINT AS exact_overlap
            FROM dv a JOIN dv b ON a.v = b.v AND a.grp < b.grp
            GROUP BY 1, 2
        )
        SELECT u.grp_a, u.grp_b,
               sa.n AS exact_a, sb.n AS exact_b,
               coalesce(x.exact_overlap, 0)::BIGINT AS exact_overlap,
               round(ea.est_g + eb.est_g - u.est_union, 4) AS est_overlap,
               round(abs(ea.est_g + eb.est_g - u.est_union
                         - coalesce(x.exact_overlap, 0)), 4) AS abs_err
        FROM estu u
        JOIN est ea ON ea.grp = u.grp_a
        JOIN est eb ON eb.grp = u.grp_b
        LEFT JOIN exact x ON x.grp_a = u.grp_a AND x.grp_b = u.grp_b
        JOIN sizes sa ON sa.grp = u.grp_a
        JOIN sizes sb ON sb.grp = u.grp_b
    """

    s["dedup_containment"] = f"""
        WITH toks AS ({_TOKS}),
        sh AS ({_SHINGLES}),
        sizes AS (SELECT doc_id AS doc, count(*) AS n_sh
                  FROM sh GROUP BY 1),
        common AS (
            SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS common
            FROM sh a JOIN sh b
              ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        sized AS (
            SELECT a_id, b_id, sa.n_sh AS na, sb.n_sh AS nb, common
            FROM common
            JOIN sizes sa ON sa.doc = a_id
            JOIN sizes sb ON sb.doc = b_id
        ),
        directed AS (
            SELECT a_id AS small_id, b_id AS big_id,
                   na AS n_small, nb AS n_big, common,
                   round(common / na::DOUBLE, 6) AS containment
            FROM sized
            UNION ALL
            SELECT b_id, a_id, nb, na, common,
                   round(common / nb::DOUBLE, 6)
            FROM sized
        )
        SELECT small_id, big_id, n_small::BIGINT AS n_small,
               n_big::BIGINT AS n_big, common::BIGINT AS common,
               containment
        FROM directed WHERE containment >= 0.5
    """

    s["events_cusum"] = """
        WITH daily AS (
            SELECT event_type AS grp, ts::DATE AS day, avg(value) AS x
            FROM events GROUP BY 1, 2
        ),
        d0 AS (SELECT grp, min(day) AS day0 FROM daily GROUP BY 1),
        burn AS (
            SELECT d.grp, avg(x) AS mu, stddev_pop(x) AS sd
            FROM daily d JOIN d0 USING (grp)
            WHERE d.day < day0 + INTERVAL 28 DAY
            GROUP BY 1 HAVING stddev_pop(x) > 0
        ),
        cum AS (
            SELECT d.grp, d.day, d.x, b.sd,
                   sum(d.x - (b.mu + 0.5 * b.sd)) OVER (
                       PARTITION BY d.grp ORDER BY d.day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS u,
                   sum((b.mu - 0.5 * b.sd) - d.x) OVER (
                       PARTITION BY d.grp ORDER BY d.day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS dn
            FROM daily d JOIN burn b USING (grp)
        ),
        scored AS (
            SELECT grp, day, round(x, 6) AS x,
                   round(u - min(u) OVER (
                       PARTITION BY grp ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ), 6) AS s_up,
                   round(dn - min(dn) OVER (
                       PARTITION BY grp ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ), 6) AS s_dn,
                   round(2.0 * sd, 6) AS thr
            FROM cum
        )
        SELECT grp AS event_type, strftime(day, '%Y-%m-%d') AS day, x,
               s_up, s_dn,
               s_up > thr AS alarm_up, s_dn > thr AS alarm_dn
        FROM scored
        WHERE s_up > thr OR s_dn > thr
    """

    s["rel_order_trend"] = """
        WITH m AS (SELECT o_orderpriority,
                          (year(o_orderdate) - 1992) * 12
                              + month(o_orderdate) AS m,
                          round(sum(o_totalprice), 2) AS rev
                   FROM orders GROUP BY 1, 2)
        SELECT o_orderpriority, count(*) AS n_months,
               round(regr_slope(rev, m), 3) AS slope,
               round(regr_intercept(rev, m), 2) AS intercept,
               round(regr_r2(rev, m), 6) AS r2
        FROM m GROUP BY 1
    """

    s["text_distinctive_terms"] = f"""
        WITH toks AS ({_TOKS}),
        dt AS (SELECT DISTINCT t.doc_id, d.source AS grp,
                               unnest(t.tokens) AS term
               FROM toks t JOIN documents d USING (doc_id)),
        vocab AS (SELECT term, count(*) AS n_t FROM dt
                  GROUP BY 1 HAVING count(*) >= 20),
        aa AS (SELECT grp, dt.term, count(*) AS a, max(n_t) AS n_t
               FROM dt JOIN vocab USING (term) GROUP BY 1, 2),
        ns AS (SELECT source AS grp, count(*) AS n1 FROM documents
               GROUP BY 1),
        c AS (SELECT grp, term, a::DOUBLE AS a, (n_t - a)::DOUBLE AS b,
                     n1::DOUBLE AS n1,
                     (SELECT count(*)::DOUBLE FROM documents) - n1 AS n2
              FROM aa JOIN ns USING (grp)),
        g AS (SELECT grp, term, a::BIGINT AS n_in, b::BIGINT AS n_out,
                     round((CASE WHEN a / n1 >= b / n2 THEN 1 ELSE -1 END)
                           * 2 * (
                       CASE WHEN a > 0
                            THEN a * ln(a / (n1 * (a + b) / (n1 + n2)))
                            ELSE 0 END
                     + CASE WHEN b > 0
                            THEN b * ln(b / (n2 * (a + b) / (n1 + n2)))
                            ELSE 0 END), 6) AS g2
              FROM c),
        r AS (SELECT *, row_number() OVER (
                  PARTITION BY grp ORDER BY g2 DESC, term) AS term_rank
              FROM g)
        SELECT grp AS source, term_rank, term, n_in, n_out, g2
        FROM r WHERE term_rank <= 5
    """

    # dedup_groups: same Jaccard pair derivation as dedup_ngram_jaccard,
    # then connected components as a recursive-CTE transitive closure —
    # group_id = min reachable node; singletons seed themselves.
    s["dedup_groups"] = f"""
        WITH RECURSIVE toks AS ({_TOKS}),
        sh AS ({_SHINGLES}),
        sizes AS (SELECT doc_id, count(*)::DOUBLE AS n_sh FROM sh GROUP BY doc_id),
        common AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                          count(*)::DOUBLE AS common
                   FROM sh a JOIN sh b ON a.shingle = b.shingle
                                      AND a.doc_id < b.doc_id
                   GROUP BY a.doc_id, b.doc_id),
        p AS (SELECT a_id, b_id
              FROM common JOIN sizes sa ON sa.doc_id = a_id
                          JOIN sizes sb ON sb.doc_id = b_id
              WHERE common / (sa.n_sh + sb.n_sh - common) >= {JACCARD_THR}),
        e AS (SELECT a_id AS src, b_id AS dst FROM p
              UNION ALL SELECT b_id, a_id FROM p),
        reach AS (
            SELECT doc_id AS src, doc_id AS dst FROM documents
            UNION
            SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src
        )
        SELECT src AS doc_id, min(dst) AS group_id
        FROM reach GROUP BY src
    """
    # the star variant computes the identical closure by a different
    # distributed algorithm — same oracle
    s["dedup_groups_star"] = s["dedup_groups"]

    s["doc_decontaminate"] = f"""
        WITH toks AS ({_TOKS}),
        sh AS (SELECT doc_id, unnest(
                 CASE WHEN len(tokens) >= {DECON_N}
                      THEN list_distinct(
                        [array_to_string(tokens[i:i+{DECON_N - 1}], ' ')
                         FOR i IN range(1, len(tokens) - {DECON_N - 2})])
                      ELSE []::VARCHAR[] END) AS g
               FROM toks),
        bg AS (SELECT DISTINCT g FROM sh WHERE doc_id < {DECON_BENCH}),
        hits AS (SELECT s.doc_id, count(*) AS n_hits
                 FROM sh s JOIN bg USING (g) GROUP BY s.doc_id)
        SELECT d.doc_id,
               coalesce(n_hits, 0) AS n_contaminated_grams,
               coalesce(n_hits, 0) > 0 AS contaminated
        FROM documents d LEFT JOIN hits ON d.doc_id = hits.doc_id
    """

    # survivors: the dedup_groups closure + keep-longest (ties min id)
    s["dedup_survivors"] = f"""
        WITH RECURSIVE toks AS ({_TOKS}),
        sh AS ({_SHINGLES}),
        sizes AS (SELECT doc_id, count(*)::DOUBLE AS n_sh FROM sh GROUP BY doc_id),
        common AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                          count(*)::DOUBLE AS common
                   FROM sh a JOIN sh b ON a.shingle = b.shingle
                                      AND a.doc_id < b.doc_id
                   GROUP BY a.doc_id, b.doc_id),
        p AS (SELECT a_id, b_id
              FROM common JOIN sizes sa ON sa.doc_id = a_id
                          JOIN sizes sb ON sb.doc_id = b_id
              WHERE common / (sa.n_sh + sb.n_sh - common) >= {JACCARD_THR}),
        e AS (SELECT a_id AS src, b_id AS dst FROM p
              UNION ALL SELECT b_id, a_id FROM p),
        reach AS (
            SELECT doc_id AS src, doc_id AS dst FROM documents
            UNION
            SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src
        ),
        g AS (SELECT src AS doc_id, min(dst) AS group_id
              FROM reach GROUP BY src),
        ranked AS (SELECT g.doc_id, g.group_id,
                          row_number() OVER (PARTITION BY g.group_id
                                             ORDER BY length(d.text) DESC,
                                                      g.doc_id) AS rn
                   FROM g JOIN documents d ON d.doc_id = g.doc_id)
        SELECT doc_id, group_id, rn = 1 AS keep FROM ranked
    """

    s["salted_join"] = """
        SELECT c_mktsegment,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """

    s["dedup_embedding_neardup"] = f"""
        WITH d AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        SELECT a.vec_id AS a_id, b.vec_id AS b_id,
               round({_COS.format(a="a.v", b="b.v")}, 6) AS cosine
        FROM d a CROSS JOIN d b
        WHERE a.vec_id < b.vec_id
          AND {_COS.format(a="a.v", b="b.v")} >= {NEARDUP_THR}
    """

    s["doc_pipeline"] = r"""
        WITH c AS (SELECT doc_id, trim(regexp_replace(text, '\s+', ' ', 'g')) AS t,
                          lang
                   FROM documents WHERE text IS NOT NULL),
        r AS (SELECT doc_id, t, lang,
                     row_number() OVER (PARTITION BY md5(t) ORDER BY doc_id) AS rn
              FROM c)
        SELECT doc_id, md5(t) AS text_hash, lang FROM r WHERE rn = 1
    """

    fhe_proj = (
        f"[list_sum([v[i + 1] * (((22695477 * ((i * 16 + j) % 2147483648) + 1)"
        f" % 2147483648) / 2147483648.0 - 0.5) FOR i IN range(0, 64)])"
        f" FOR j IN range(0, 16)]"
    )
    s["fhe_pipeline"] = f"""
        WITH sub AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
                     ORDER BY vec_id LIMIT 300),
        p AS (SELECT vec_id, {fhe_proj} AS pv FROM sub),
        n AS (SELECT vec_id AS doc_id, {_NORMALIZE.format(v="pv")} AS nv FROM p),
        q AS (SELECT doc_id AS query_id, nv AS qv FROM n WHERE doc_id < 5),
        sc AS (SELECT query_id, doc_id, list_dot_product(qv, nv) AS score
               FROM q CROSS JOIN n),
        r AS (SELECT query_id, doc_id, score,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY score DESC, doc_id) AS rank
              FROM sc)
        SELECT query_id, rank, doc_id, round(score, 6) AS score
        FROM r WHERE rank <= 5
    """

    # evaluation_metrics oracle: the FULL dp + fhe mode pipelines in SQL
    # (composed from the individually-proven fragments: hash embed, LCG
    # noise, weighted concat, normalize, windowed kNN), then A1-A5 per
    # query against the exact-kNN baseline. k = n_queries = 5.
    _lcg_u = (
        "(((1103515245 * (({idx}) % 2147483648) + 12345) % 2147483648)"
        " / 2147483648.0)"
    )

    def _metrics_cols(suffix: str) -> str:
        return f"""
               round(count(b_rank) / 5.0, 6) AS recall_{suffix},
               round(count(b_rank) / count(*)::DOUBLE, 6) AS precision_{suffix},
               round(avg(CASE WHEN b_rank = o_rank THEN 1.0 ELSE 0.0 END), 6)
                   AS agreement_{suffix},
               round(coalesce(1.0 / min(CASE WHEN b_rank IS NOT NULL
                                             THEN o_rank END), 0.0), 6)
                   AS mrr_{suffix},
               round(sum(coalesce(b_rank, 0)::DOUBLE / log2(o_rank + 1.0))
                     / sum(1.0 / log2(o_rank + 1.0)), 6) AS ndcg_{suffix}"""

    s["evaluation_metrics"] = f"""
        WITH d AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        n AS (SELECT vec_id AS doc_id, {_NORMALIZE.format(v="v")} AS nv FROM d),
        -- baseline: exact kNN top-5 of the first 5 normalized vectors
        bq AS (SELECT doc_id AS query_id, nv AS qv FROM n WHERE doc_id < 5),
        bsc AS (SELECT query_id, doc_id, list_dot_product(qv, nv) AS score
                FROM bq CROSS JOIN n),
        base AS (SELECT query_id, doc_id,
                        row_number() OVER (PARTITION BY query_id
                                           ORDER BY score DESC, doc_id) AS b_rank
                 FROM bsc QUALIFY b_rank <= 5),
        -- DP mode: attr sentence -> hash embed (dim 64) -> normalize ->
        -- LCG noise -> 0.7/0.3 concat with re-normalized text vec ->
        -- normalize -> kNN with zero-padded queries
        atoks AS (SELECT doc_id,
                         list_filter(regexp_split_to_array(
                             lower(trim(concat_ws(' ', lang, source))), '\\s+'),
                             t -> t <> '') AS tokens
                  FROM documents),
        ah AS (SELECT doc_id, {_MD5L.format(x="tok")} AS hv
               FROM (SELECT doc_id, unnest(tokens) AS tok FROM atoks)),
        af AS (SELECT doc_id, (hv % 64)::BIGINT AS j,
                      sum(((hv >> 6) % 2001) / 1000.0 - 1.0) AS f
               FROM ah GROUP BY doc_id, hv % 64),
        dims AS (SELECT unnest(range(0, 64)) AS j),
        agrid AS (SELECT doc_id, j, coalesce(af.f, 0.0) AS f
                  FROM (SELECT doc_id FROM documents) docs
                  CROSS JOIN dims LEFT JOIN af USING (doc_id, j)),
        av AS (SELECT doc_id, list(f ORDER BY j) AS fv FROM agrid GROUP BY doc_id),
        an AS (SELECT doc_id, {_NORMALIZE.format(v="fv")} AS anv FROM av),
        an2 AS (SELECT doc_id, {_NORMALIZE.format(v="anv")} AS a2 FROM an),
        ny AS (SELECT doc_id,
                      [a2[i + 1] + ({_lcg_u.format(idx="doc_id * 64 + i")} - 0.5)
                                   * {2.0 * DP_SIGMA}
                       FOR i IN range(0, 64)] AS noisy
               FROM an2),
        tn AS (SELECT doc_id, {_NORMALIZE.format(v="nv")} AS tnv FROM n),
        dp0 AS (SELECT tn.doc_id,
                       list_concat(list_transform(tnv, x -> x * 0.7),
                                   list_transform({_NORMALIZE.format(v="noisy")},
                                                  x -> x * 0.3)) AS cat
                FROM tn JOIN ny USING (doc_id)),
        dpv AS (SELECT doc_id, {_NORMALIZE.format(v="cat")} AS dv FROM dp0),
        q0 AS (SELECT doc_id AS query_id, {_NORMALIZE.format(v="nv")} AS qn
               FROM n WHERE doc_id < 5),
        qcat AS (SELECT query_id,
                        list_concat(list_transform(qn, x -> x * 0.7),
                                    [0.0 FOR i IN range(0, 64)]) AS cat
                 FROM q0),
        dq AS (SELECT query_id, {_NORMALIZE.format(v="cat")} AS dqv FROM qcat),
        dsc AS (SELECT query_id, doc_id, list_dot_product(dqv, dv) AS score
                FROM dq CROSS JOIN dpv),
        dpr AS (SELECT query_id, doc_id,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY score DESC, doc_id) AS o_rank
                FROM dsc QUALIFY o_rank <= 5),
        -- FHE mode: 300-row subset -> 64->16 LCG projection -> normalize
        -- -> exact top-5 (fhe_pipeline oracle shape)
        sub AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
                ORDER BY vec_id LIMIT 300),
        fp AS (SELECT vec_id, {fhe_proj} AS pv FROM sub),
        fn AS (SELECT vec_id AS doc_id, {_NORMALIZE.format(v="pv")} AS fnv FROM fp),
        fq AS (SELECT doc_id AS query_id, fnv AS fqv FROM fn WHERE doc_id < 5),
        fsc AS (SELECT query_id, doc_id, list_dot_product(fqv, fnv) AS score
                FROM fq CROSS JOIN fn),
        fr AS (SELECT query_id, doc_id,
                      row_number() OVER (PARTITION BY query_id
                                         ORDER BY score DESC, doc_id) AS o_rank
               FROM fsc QUALIFY o_rank <= 5),
        -- A1-A5 per query for each mode vs baseline
        dph AS (SELECT o.query_id, o.o_rank, b.b_rank
                FROM dpr o LEFT JOIN base b
                  ON b.query_id = o.query_id AND b.doc_id = o.doc_id),
        dpm AS (SELECT query_id, {_metrics_cols("dp")}
                FROM dph GROUP BY query_id),
        feh AS (SELECT o.query_id, o.o_rank, b.b_rank
                FROM fr o LEFT JOIN base b
                  ON b.query_id = o.query_id AND b.doc_id = o.doc_id),
        fem AS (SELECT query_id, {_metrics_cols("fhe")}
                FROM feh GROUP BY query_id)
        SELECT * FROM dpm JOIN fem USING (query_id)
    """

    # knn_lsh oracle: same deterministic hyperplane family as
    # functions.vector.hyperplane_sign_bucket (salt 7777777), buckets over
    # NORMALIZED vectors, join-per-bucket, windowed top-k
    plane_w = (
        "(((22695477 * ((p * 64 + i + 7777777) % 2147483648) + 1)"
        " % 2147483648) / 2147483648.0 - 0.5)"
    )
    plane_dot = f"list_sum([nv[i + 1] * {plane_w} FOR i IN range(0, 64)])"
    bucket = (
        f"list_sum([CASE WHEN {plane_dot} >= 0"
        f" THEN (2 ** p)::BIGINT ELSE 0 END FOR p IN range(0, 4)])"
    )
    s["knn_lsh"] = f"""
        WITH d AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        n AS (SELECT vec_id AS doc_id, {_NORMALIZE.format(v="v")} AS nv FROM d),
        b AS (SELECT doc_id, nv, {bucket} AS bucket FROM n),
        q AS (SELECT doc_id AS query_id, nv AS qv, bucket FROM b
              WHERE doc_id < {KNN_NQ}),
        sc AS (SELECT q.query_id, b.doc_id,
                      list_dot_product(q.qv, b.nv) AS score
               FROM b JOIN q USING (bucket)),
        r AS (SELECT query_id, doc_id, score,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY score DESC, doc_id) AS rank
              FROM sc)
        SELECT query_id, rank, doc_id, round(score, 6) AS score
        FROM r WHERE rank <= {KNN_K}
    """

    # multimodal_features: the deterministic fake feature is
    # ((md5_byte[i] * 31 + i) % 256) / 255.0 (binary_ops._fake_feature),
    # reproducible in DuckDB from the hex digest. content bytes are the
    # UTF-8 encoding of text, so md5(text) == md5(content).
    feat_cols = ", ".join(
        f"round(((('0x' || substr(content_md5, {2 * i + 1}, 2))::BIGINT * 31"
        f" + {i}) % 256) / 255.0, 6) AS f{i}"
        for i in range(4)
    )
    s["multimodal_features"] = f"""
        WITH m AS (SELECT doc_id AS media_id,
                          octet_length(encode(text))::BIGINT AS n_bytes,
                          md5(text) AS content_md5
                   FROM documents)
        SELECT media_id, n_bytes, content_md5, {feat_cols} FROM m
    """

    # doc_weighted_sample: A-Res log-priority ln(u)/w with the identical
    # 60-bit md5 uniform; both sides round the priority to 9 dp before the
    # (desc priority, asc doc_id) top-N cut.
    s["doc_weighted_sample"] = f"""
        WITH pri AS (
            SELECT doc_id, n_chars,
                   CASE WHEN n_chars > 0 THEN
                       round(ln(({_MD5L.format(x="doc_id::VARCHAR")} + 1.0)
                                / {float((1 << 60) + 1)!r})
                             / n_chars::DOUBLE, 9)
                   ELSE '-infinity'::DOUBLE END AS lp
            FROM documents)
        SELECT doc_id, n_chars FROM pri
        ORDER BY lp DESC, doc_id ASC LIMIT {WEIGHTED_SAMPLE_N}
    """

    # text_normalize: utf8proc NFC == stdlib-unicodedata NFC (normalization
    # is stability-guaranteed across Unicode versions); the probe suffix is
    # embedded verbatim (decomposed) in both engines' plans.
    s["text_normalize"] = f"""
        WITH n AS (SELECT doc_id,
                          nfc_normalize(text || '{NFC_PROBE}') AS nt
                   FROM documents)
        SELECT doc_id, md5(nt) AS norm_md5, length(nt)::BIGINT AS n_codepoints
        FROM n
    """

    # doc_pack_sequences: replay of the bounded first-fit packer as a
    # recursive CTE — state = (row index, open-pack list, next pack id);
    # each step places the next doc_id-ordered doc into the FIRST open pack
    # it fits (list_position over the fit mask — returns 0, NOT NULL, when
    # nothing fits), else retires the oldest pack when the set is full and
    # opens a new one. Mirrors functions/text.py pack_sequences over one
    # sorted partition.
    fit_j = (
        f"list_position(list_transform(s.open,"
        f" o -> o.used + t.ntok <= {PACK_MAX_TOKENS}), true)"
    )
    s["doc_pack_sequences"] = f"""
        WITH RECURSIVE toks AS ({_TOKS}),
        nt0 AS (SELECT doc_id,
                       coalesce(len(tokens), 0)::BIGINT AS ntok
                FROM toks),
        nt AS (SELECT doc_id, ntok,
                      row_number() OVER (ORDER BY doc_id) AS rn
               FROM nt0),
        st AS (
            SELECT 0::BIGINT AS rn,
                   []::STRUCT(pk BIGINT, used BIGINT)[] AS open,
                   0::BIGINT AS next_id,
                   NULL::BIGINT AS doc_id,
                   NULL::BIGINT AS pack_id,
                   NULL::BIGINT AS n_tokens
            UNION ALL
            SELECT t.rn,
                   CASE WHEN {fit_j} = 0 THEN
                       list_append(
                           CASE WHEN len(s.open) >= {PACK_MAX_OPEN}
                                THEN s.open[2:] ELSE s.open END,
                           {{'pk': s.next_id, 'used': t.ntok}})
                   ELSE
                       [CASE WHEN i = {fit_j}
                             THEN {{'pk': s.open[i].pk,
                                    'used': s.open[i].used + t.ntok}}
                             ELSE s.open[i] END
                        FOR i IN range(1, len(s.open) + 1)]
                   END AS open,
                   CASE WHEN {fit_j} = 0
                        THEN s.next_id + 1 ELSE s.next_id END AS next_id,
                   t.doc_id,
                   CASE WHEN {fit_j} = 0 THEN s.next_id
                        ELSE s.open[{fit_j}].pk END AS pack_id,
                   t.ntok AS n_tokens
            FROM st s JOIN nt t ON t.rn = s.rn + 1)
        SELECT pack_id, doc_id, n_tokens FROM st WHERE rn > 0
    """

    # events_decayed: closed-form decayed counters — same 2^(-age/hl)
    # per-event weight, round-6 absorbs cross-engine sum reassociation.
    decay_w = (
        f"pow(2.0, -((mx - ts_ns)::DOUBLE"
        f" / {float(DECAY_HALF_LIFE_SEC * 1_000_000_000)!r}))"
    )
    s["events_decayed"] = f"""
        WITH e AS (SELECT user_id, epoch_ns(ts) AS ts_ns, value FROM events),
        m AS (SELECT max(ts_ns) AS mx FROM e)
        SELECT user_id,
               round(sum({decay_w}), 6) AS decayed_count,
               round(sum({decay_w} * value), 6) AS decayed_value_sum,
               count(*) AS n_events
        FROM e CROSS JOIN m GROUP BY user_id
    """

    # dedup_simhash_pairs: 32-bit simhash (same md5-bit majority as
    # dedup_simhash), 4 Hamming blocks of 8 bits, equi-join on any shared
    # block, exact popcount filter at distance <= n_blocks - 1 = 3.
    s["dedup_simhash_pairs"] = f"""
        WITH toks AS ({_TOKS}),
        t AS (SELECT doc_id, unnest(tokens) AS tok FROM toks),
        h AS (SELECT doc_id, {_MD5L.format(x="tok")} AS hv FROM t),
        bits AS (SELECT unnest(range(0, 32)) AS j),
        sb AS (SELECT doc_id, j,
                      sum(CASE WHEN (hv >> j::INT) & 1 = 1 THEN 1 ELSE -1 END)
                          AS bsum
               FROM h CROSS JOIN bits GROUP BY doc_id, j),
        sim AS (SELECT doc_id,
                       sum(CASE WHEN bsum > 0 THEN (1::BIGINT << j::INT)
                                ELSE 0 END)::BIGINT AS simhash
                FROM sb GROUP BY doc_id),
        blk AS (SELECT doc_id, simhash, b,
                       (simhash >> (b::INT * 8)) & 255 AS key
                FROM sim, (SELECT unnest(range(0, 4)) AS b)),
        pairs AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
                                  a.simhash AS sa, b.simhash AS sb
                  FROM blk a JOIN blk b
                    ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id)
        SELECT a_id, b_id, bit_count(xor(sa, sb))::BIGINT AS hamming
        FROM pairs WHERE bit_count(xor(sa, sb)) <= 3
    """

    # io_compact_roundtrip: content invariance + the pinned file count
    # (1 << 30 target always compacts the tiny test table to one file).
    s["io_compact_roundtrip"] = """
        SELECT doc_id, source, n_chars, 1::BIGINT AS n_files_after
        FROM documents
    """

    # z-order key: the SQL twin is generated from the SAME spec as the
    # Spark expression (io/layout.py), bounds via a one-row bounds CTE
    from clinical_vector_search_spark.io.layout import zorder_key_sql

    _zsql = zorder_key_sql(
        [("l_partkey", "b.lo_p", "b.hi_p"), ("l_orderkey", "b.lo_o", "b.hi_o")],
        bits=8,
    )
    s["io_zorder_key"] = f"""
        WITH b AS (SELECT min(l_partkey) AS lo_p, max(l_partkey) AS hi_p,
                          min(l_orderkey) AS lo_o, max(l_orderkey) AS hi_o
                   FROM lineitem)
        SELECT l_orderkey, l_linenumber, l_partkey, {_zsql} AS zkey
        FROM lineitem, b WHERE l_orderkey < 300
    """

    s["ids_dense_rows"] = """
        SELECT doc_id, n_chars,
               row_number() OVER (ORDER BY n_chars, doc_id) AS row_id
        FROM documents
    """

    # Kaplan-Meier: the sequential survival product as exp(cumsum(ln)),
    # mirrored window-for-window; counts cast to BIGINT (DuckDB sum is
    # HUGEINT), survival rounded 6dp on both sides.
    s["events_kaplan_meier"] = """
        WITH pu AS (SELECT user_id,
                           (max(epoch_ns(ts)) - min(epoch_ns(ts)))
                               // 3600000000000 AS lifetime,
                           max(epoch_ns(ts)) AS last_ns
                    FROM events GROUP BY user_id),
        mx AS (SELECT max(epoch_ns(ts)) AS corpus_max_ns FROM events),
        fl AS (SELECT lifetime,
                      CASE WHEN corpus_max_ns - last_ns
                                < 72 * 3600000000000
                           THEN 0 ELSE 1 END AS death
               FROM pu, mx),
        bt AS (SELECT lifetime AS t,
                      sum(death)::BIGINT AS deaths,
                      sum(1 - death)::BIGINT AS censored,
                      count(*)::BIGINT AS ending
               FROM fl GROUP BY lifetime),
        ar AS (SELECT *,
                      sum(ending) OVER (ORDER BY t
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
                      )::BIGINT AS n_at_risk
               FROM bt)
        SELECT t, n_at_risk, deaths, censored,
               round(exp(sum(ln(1 - deaths::DOUBLE / n_at_risk))
                         OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW)), 6) AS survival
        FROM ar
    """

    # ACF: day series from one agg, lag alignment via a range() frame
    s["events_acf"] = """
        WITH daily AS (SELECT CAST(ts AS DATE) AS day, count(*) AS y
                       FROM events GROUP BY 1),
        base AS (SELECT date_diff('day', (SELECT min(day) FROM daily),
                                  day) AS idx, y
                 FROM daily),
        lags AS (SELECT unnest(range(1, 11))::INT AS lag)
        SELECT lag, count(*)::BIGINT AS n_pairs,
               round(corr(a.y, b.y), 6) AS acf
        FROM lags, base a JOIN base b ON a.idx = b.idx + lag
        GROUP BY lag
    """

    # two-proportion z-test: same md5-nibble split, closed forms of the
    # four counts; z NULL when the pooled variance is 0
    s["events_ab_test"] = """
        WITH pu AS (SELECT user_id,
                           max(CASE WHEN event_type = 'purchase'
                                    THEN 1 ELSE 0 END) AS converted
                    FROM events GROUP BY user_id),
        av AS (SELECT CAST('0x' || substr(md5(user_id::VARCHAR), 1, 1)
                           AS INT) % 2 AS variant, converted
               FROM pu),
        c AS (SELECT
                sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
                sum(CASE WHEN variant = 0 THEN converted ELSE 0
                    END)::BIGINT AS conv_a,
                sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b,
                sum(CASE WHEN variant = 1 THEN converted ELSE 0
                    END)::BIGINT AS conv_b
              FROM av)
        SELECT n_a, conv_a, round(conv_a / n_a::DOUBLE, 6) AS rate_a,
               n_b, conv_b, round(conv_b / n_b::DOUBLE, 6) AS rate_b,
               round((conv_a + conv_b) / (n_a + n_b)::DOUBLE, 6)
                   AS pooled_rate,
               round(CASE WHEN se > 0 THEN (p_a - p_b) / se END, 6)
                   AS z_stat,
               round((p_a + zc*zc/(2*n_a)
                      - zc*sqrt(p_a*(1-p_a)/n_a + zc*zc/(4*n_a*n_a)))
                     / (1 + zc*zc/n_a), 6) AS wilson_a_lo,
               round((p_a + zc*zc/(2*n_a)
                      + zc*sqrt(p_a*(1-p_a)/n_a + zc*zc/(4*n_a*n_a)))
                     / (1 + zc*zc/n_a), 6) AS wilson_a_hi,
               round((p_b + zc*zc/(2*n_b)
                      - zc*sqrt(p_b*(1-p_b)/n_b + zc*zc/(4*n_b*n_b)))
                     / (1 + zc*zc/n_b), 6) AS wilson_b_lo,
               round((p_b + zc*zc/(2*n_b)
                      + zc*sqrt(p_b*(1-p_b)/n_b + zc*zc/(4*n_b*n_b)))
                     / (1 + zc*zc/n_b), 6) AS wilson_b_hi
        FROM (SELECT *,
                     conv_a / n_a::DOUBLE AS p_a,
                     conv_b / n_b::DOUBLE AS p_b,
                     sqrt(((conv_a + conv_b) / (n_a + n_b)::DOUBLE)
                          * (1 - (conv_a + conv_b) / (n_a + n_b)::DOUBLE)
                          * (1.0/n_a + 1.0/n_b)) AS se,
                     1.959963984540054 AS zc
              FROM c)
    """

    # OLS normal equations: the nine BIGINT moments are exact in both
    # engines, so the Cramer solve sees identical inputs
    s["rel_ols_normal"] = """
        WITH q AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS y,
                          CAST((year(o_orderdate) - 1992) * 12
                               + month(o_orderdate) AS BIGINT) AS x1,
                          CASE WHEN o_orderpriority
                                    IN ('1-URGENT', '2-HIGH')
                               THEN 1::BIGINT ELSE 0::BIGINT END AS x2
                   FROM orders),
        m AS (SELECT count(*)::BIGINT AS n,
                     sum(x1)::BIGINT AS s1, sum(x2)::BIGINT AS s2,
                     sum(x1*x1)::BIGINT AS s11, sum(x1*x2)::BIGINT AS s12,
                     sum(x2*x2)::BIGINT AS s22, sum(y)::BIGINT AS sy,
                     sum(x1*y)::BIGINT AS s1y, sum(x2*y)::BIGINT AS s2y
              FROM q),
        d AS (SELECT n,
                     n::DOUBLE AS dn, s1::DOUBLE AS d1, s2::DOUBLE AS d2,
                     s11::DOUBLE AS d11, s12::DOUBLE AS d12,
                     s22::DOUBLE AS d22, sy::DOUBLE AS dy,
                     s1y::DOUBLE AS d1y, s2y::DOUBLE AS d2y
              FROM m)
        SELECT n,
               round((dy*(d11*d22 - d12*d12) - d1*(d1y*d22 - d12*d2y)
                      + d2*(d1y*d12 - d11*d2y))
                     / (dn*(d11*d22 - d12*d12) - d1*(d1*d22 - d12*d2)
                        + d2*(d1*d12 - d11*d2)), 6) AS beta0,
               round((dn*(d1y*d22 - d12*d2y) - dy*(d1*d22 - d12*d2)
                      + d2*(d1*d2y - d1y*d2))
                     / (dn*(d11*d22 - d12*d12) - d1*(d1*d22 - d12*d2)
                        + d2*(d1*d12 - d11*d2)), 6) AS beta1,
               round((dn*(d11*d2y - d1y*d12) - d1*(d1*d2y - d1y*d2)
                      + dy*(d1*d12 - d11*d2))
                     / (dn*(d11*d22 - d12*d12) - d1*(d1*d22 - d12*d2)
                        + d2*(d1*d12 - d11*d2)), 6) AS beta2
        FROM d
    """

    # Benford: same decimal(18,2)-string digit extraction
    s["rel_benford"] = """
        WITH pd AS (SELECT CAST(substr(CAST(CAST(o_totalprice
                                    AS DECIMAL(18,2)) AS VARCHAR), 1, 1)
                         AS INT) AS digit,
                           count(*)::BIGINT AS n
                    FROM orders WHERE o_totalprice >= 1
                    GROUP BY 1),
        t AS (SELECT sum(n)::DOUBLE AS tot FROM pd)
        SELECT digit, n,
               round(n / tot, 6) AS obs_share,
               round(log10(1 + 1.0/digit), 6) AS benford_share,
               round(tot * (n/tot - log10(1 + 1.0/digit))
                         * (n/tot - log10(1 + 1.0/digit))
                     / log10(1 + 1.0/digit), 6) AS chi2_contrib
        FROM pd, t
    """

    # WOE/IV: ntile over the identical (n_chars, doc_id) total order;
    # +0.5 Laplace on shares
    s["doc_woe_iv"] = """
        WITH b AS (SELECT ntile(10) OVER (ORDER BY n_chars, doc_id) AS bin,
                          CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS good
                   FROM documents),
        pb AS (SELECT bin, count(*)::BIGINT AS n,
                      sum(good)::BIGINT AS goods,
                      sum(1 - good)::BIGINT AS bads
               FROM b GROUP BY bin),
        t AS (SELECT sum(goods)::DOUBLE AS g, sum(bads)::DOUBLE AS bd
              FROM pb)
        SELECT bin, n, goods, bads,
               round(ln(((goods + 0.5)/(g + 0.5))
                        / ((bads + 0.5)/(bd + 0.5))), 6) AS woe,
               round(((goods + 0.5)/(g + 0.5) - (bads + 0.5)/(bd + 0.5))
                     * ln(((goods + 0.5)/(g + 0.5))
                          / ((bads + 0.5)/(bd + 0.5))), 6) AS iv_contrib
        FROM pb, t
    """

    s["rel_priority_waiting"] = """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders
        WHERE year(o_orderdate) = 1997
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority
    """

    s["rel_nation_profit"] = """
        SELECT n_name, year(o_orderdate) AS o_year,
               round(sum(round(l_extendedprice * 100)::BIGINT
                         * (100 - round(l_discount * 100)::BIGINT)
                         - round(p_retailprice * 100)::BIGINT
                           * round(l_quantity)::BIGINT * 100)
                     / 10000.0, 2) AS profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        GROUP BY n_name, o_year
    """

    s["rel_late_shipments"] = """
        SELECT l_linestatus,
               sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
               sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END)::BIGINT AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE date_diff('day', o_orderdate::DATE, l_shipdate::DATE) > 60
        GROUP BY l_linestatus
    """

    s["rel_cust_distribution"] = """
        WITH per_cust AS (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer
            LEFT JOIN orders ON c_custkey = o_custkey
                            AND o_orderpriority <> '5-LOW'
            GROUP BY c_custkey)
        SELECT c_count, count(*) AS custdist
        FROM per_cust GROUP BY c_count
    """

    s["rel_promo_revenue"] = """
        SELECT month(o_orderdate) AS o_month,
               round(sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1.0 - l_discount)
                              ELSE 0.0 END), 2) AS promo_revenue,
               round(sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1.0 - l_discount)
                              ELSE 0.0 END) * 100.0
                     / sum(l_extendedprice * (1.0 - l_discount)), 4)
                   AS promo_share_pct
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey AND year(o_orderdate) = 1997
        JOIN part ON l_partkey = p_partkey
        GROUP BY o_month
    """

    s["rel_supplier_counts"] = """
        SELECT p_brand, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#5'
          AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0)
        GROUP BY p_brand, p_size
    """

    s["rel_excess_suppliers"] = """
        WITH shipped AS (
            SELECT l_suppkey,
                   sum(CASE WHEN year(l_shipdate) >= 1999
                            THEN l_quantity ELSE 0.0 END) AS recent_qty,
                   sum(l_quantity) AS total_qty
            FROM lineitem
            JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
            GROUP BY l_suppkey)
        SELECT s_name, n_name,
               round(recent_qty, 1) AS recent_qty,
               round(total_qty, 1) AS total_qty
        FROM supplier
        JOIN shipped ON s_suppkey = l_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE recent_qty * 2 > total_qty
    """

    s["rel_min_cost_supplier"] = """
        WITH cand AS (
            SELECT p_partkey, s_suppkey, s_name, s_acctbal,
                   min(l_extendedprice / l_quantity) AS unit_cost
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
                     AND p_size = 10 AND p_type = 'STANDARD'
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
            GROUP BY p_partkey, s_suppkey, s_name, s_acctbal),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY p_partkey
                                         ORDER BY unit_cost, s_suppkey) AS rk
            FROM cand)
        SELECT p_partkey, s_name,
               round(s_acctbal, 2) AS s_acctbal,
               round(unit_cost, 2) AS min_unit_cost
        FROM ranked WHERE rk = 1
    """

    s["rel_market_share"] = """
        SELECT year(o_orderdate) AS o_year,
               round(sum(l_extendedprice * (1.0 - l_discount)), 2)
                   AS market_revenue,
               round(sum(CASE WHEN sn.n_name = 'NATION_2'
                              THEN l_extendedprice * (1.0 - l_discount)
                              ELSE 0.0 END)
                     / sum(l_extendedprice * (1.0 - l_discount)), 4)
                   AS nation2_share
        FROM lineitem
        JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE o_custkey IN (
            SELECT c_custkey FROM customer
            JOIN nation cn ON c_nationkey = cn.n_nationkey
            JOIN region ON cn.n_regionkey = r_regionkey
            WHERE r_name = 'ASIA')
        GROUP BY o_year
    """

    s["events_mann_whitney"] = """
        WITH b AS (
            SELECT round(value, 2) AS v,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g1
            FROM events
            WHERE event_type IN ('purchase', 'view') AND value IS NOT NULL),
        by_val AS (
            SELECT v, count(*) AS n_v, sum(g1) AS n1_v FROM b GROUP BY v),
        ranked AS (
            SELECT *, coalesce(sum(n_v) OVER (
                ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0) AS below
            FROM by_val),
        agg AS (
            SELECT sum(n1_v)::BIGINT AS n1,
                   sum(n_v - n1_v)::BIGINT AS n2,
                   sum(n1_v * (below + (n_v + 1.0) / 2.0)) AS r1,
                   sum(n_v::DOUBLE * n_v * n_v - n_v) AS tie_term
            FROM ranked),
        u AS (
            SELECT n1, n2,
                   r1 - n1 * (n1 + 1.0) / 2.0 AS u1,
                   n1::DOUBLE * n2 AS n1n2,
                   n1 + n2 AS nt,
                   tie_term
            FROM agg),
        z AS (
            SELECT *,
                   sqrt(n1n2 / 12.0 * ((nt + 1.0)
                        - tie_term / (nt::DOUBLE * (nt - 1.0)))) AS sigma
            FROM u)
        SELECT n1, n2,
               round(u1, 1) AS u1,
               round(n1n2 - u1, 1) AS u2,
               round(CASE WHEN sigma > 0
                          THEN (u1 - n1n2 / 2.0) / sigma END, 6) AS z_stat
        FROM z
    """

    s["events_chi_square"] = """
        WITH cells AS (
            SELECT event_type AS a,
                   (dayofweek(ts::TIMESTAMP) + 1)::INT AS b,
                   count(*) AS observed
            FROM events GROUP BY 1, 2),
        tot AS (SELECT count(DISTINCT a) AS n_rows,
                       count(DISTINCT b) AS n_cols,
                       sum(observed) AS grand
                FROM cells),
        rt AS (SELECT a, sum(observed) AS row_tot FROM cells GROUP BY a),
        ct AS (SELECT b, sum(observed) AS col_tot FROM cells GROUP BY b),
        y AS (
            SELECT a, b, observed::BIGINT AS observed,
                   row_tot::DOUBLE * col_tot / grand AS expected,
                   (observed - row_tot::DOUBLE * col_tot / grand)
                   * (observed - row_tot::DOUBLE * col_tot / grand)
                   / (row_tot::DOUBLE * col_tot / grand) AS contrib
            FROM cells JOIN rt USING(a) JOIN ct USING(b), tot)
        SELECT a, b, observed,
               round(expected, 6) AS expected,
               round(contrib, 6) AS chi2_contrib,
               round((SELECT sum(contrib) FROM y), 6) AS chi2_total,
               (SELECT (n_rows - 1) * (n_cols - 1)
                FROM tot)::BIGINT AS dof
        FROM y
    """

    # unrolled 5-iteration PERSONALIZED pagerank: teleport and dangling
    # mass flow to the seed weights w_v instead of 1/N
    _ppr_base = f"1.0 - {PAGERANK_DAMP!r}"
    _ppr_stages = ""
    _ppr_prev = "pr0"
    for _k in range(PAGERANK_ITER):
        _ppr_stages += f"""
        pc{_k} AS (SELECT e.dst AS node, sum({_ppr_prev}.rank / deg._deg)
                       AS c
                  FROM pr_edges e
                  JOIN {_ppr_prev} ON e.src = {_ppr_prev}.node
                  JOIN deg ON deg.node = e.src
                  GROUP BY 1),
        pd{_k} AS (SELECT coalesce(sum(rank), 0) AS m FROM {_ppr_prev}
                  WHERE node NOT IN (SELECT node FROM deg)),
        pr{_k + 1} AS (SELECT wt.node,
                      ({_ppr_base}) * wt.w
                      + {PAGERANK_DAMP!r} * (coalesce(pc{_k}.c, 0)
                          + (SELECT m FROM pd{_k}) * wt.w) AS rank
                    FROM wt LEFT JOIN pc{_k} USING (node)),"""
        _ppr_prev = f"pr{_k + 1}"
    s["graph_ppr"] = f"""
        WITH ob AS (
            SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        ),
        e0 AS MATERIALIZED (
            SELECT a.p AS u, b.p AS v
            FROM ob a JOIN ob b ON a.o = b.o AND a.p < b.p
            GROUP BY 1, 2
            HAVING count(*) >= 2
        ),
        pr_edges AS MATERIALIZED (
            SELECT u AS src, v AS dst FROM e0
            UNION ALL SELECT v, u FROM e0
        ),
        allnodes AS MATERIALIZED (
            SELECT DISTINCT src AS node FROM pr_edges
        ),
        seeds AS (SELECT node FROM allnodes ORDER BY node LIMIT 10),
        wt AS MATERIALIZED (
            SELECT an.node,
                   CASE WHEN s.node IS NOT NULL
                        THEN 1.0 / (SELECT count(*) FROM seeds)
                        ELSE 0.0 END AS w
            FROM allnodes an LEFT JOIN seeds s ON an.node = s.node
        ),
        deg AS MATERIALIZED (
            SELECT src AS node, count(*)::DOUBLE AS _deg
            FROM pr_edges GROUP BY 1
        ),
        pr0 AS (SELECT node, w AS rank FROM wt),{_ppr_stages}
        fin AS (SELECT node, round(rank, 9) AS rank FROM {_ppr_prev}),
        rk AS (SELECT node, rank, row_number() OVER (
                   ORDER BY rank DESC, node) AS rn
               FROM fin)
        SELECT node::BIGINT AS node, rank, rn::INT AS rn
        FROM rk WHERE rn <= 50
    """

    # unrolled 3-round label propagation mirroring label_propagation's
    # loop: neighbor-label join + (node,label) count + smallest-label
    # argmax per round
    _lpa_rounds = []
    _lpa_prev = "l0"
    for _r in (1, 2, 3):
        _lpa_rounds.append(
            f"""c{_r} AS MATERIALIZED (
                SELECT s.a AS node, l.label AS nbr_label,
                       count(*) AS n
                FROM sym s JOIN {_lpa_prev} l ON s.b = l.node
                GROUP BY 1, 2),
            l{_r} AS MATERIALIZED (
                SELECT node, nbr_label AS label FROM (
                    SELECT *, row_number() OVER (
                        PARTITION BY node
                        ORDER BY n DESC, nbr_label) AS rk
                    FROM c{_r}) t
                WHERE rk = 1)"""
        )
        _lpa_prev = f"l{_r}"
    s["graph_communities"] = f"""
        WITH ob AS (
            SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        ),
        e0 AS MATERIALIZED (
            SELECT a.p AS u, b.p AS v
            FROM ob a JOIN ob b ON a.o = b.o AND a.p < b.p
            GROUP BY 1, 2
            HAVING count(*) >= 2
        ),
        sym AS MATERIALIZED (
            SELECT u AS a, v AS b FROM e0
            UNION ALL SELECT v, u FROM e0
        ),
        l0 AS MATERIALIZED (
            SELECT DISTINCT a AS node, a AS label FROM sym
        ),
        {", ".join(_lpa_rounds)}
        SELECT node::BIGINT AS node, label::BIGINT AS label
        FROM {_lpa_prev}
    """

    # unrolled 4-hop BFS mirroring bfs_levels' loop exactly: per-level
    # MATERIALIZED frontier (first-reached nodes only) — a recursive CTE
    # would enumerate PATHS, exponential on a dense co-order graph
    _bfs_levels_sql = []
    _prev_d = "d0"
    _prev_f = "d0"
    for _hop in (1, 2, 3, 4):
        _bfs_levels_sql.append(
            f"""f{_hop} AS MATERIALIZED (
                SELECT DISTINCT sym.b AS node, {_hop} AS dist
                FROM {_prev_f} JOIN sym ON {_prev_f}.node = sym.a
                WHERE sym.b NOT IN (SELECT node FROM {_prev_d})),
            d{_hop} AS MATERIALIZED (
                SELECT node, dist FROM {_prev_d}
                UNION ALL SELECT node, dist FROM f{_hop})"""
        )
        _prev_d = f"d{_hop}"
        _prev_f = f"f{_hop}"
    s["graph_bfs"] = f"""
        WITH ob AS (
            SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        ),
        e0 AS MATERIALIZED (
            SELECT a.p AS u, b.p AS v
            FROM ob a JOIN ob b ON a.o = b.o AND a.p < b.p
            GROUP BY 1, 2
            HAVING count(*) >= 2
        ),
        sym AS MATERIALIZED (
            SELECT u AS a, v AS b FROM e0
            UNION ALL SELECT v, u FROM e0
        ),
        d0 AS MATERIALIZED (
            SELECT min(u) AS node, 0 AS dist FROM e0
        ),
        {", ".join(_bfs_levels_sql)}
        SELECT node::BIGINT AS node, dist::INT AS dist FROM d4
    """

    # unrolled 3-round Bradley-Terry MM fit mirroring bradley_terry's
    # loop: p_i <- W_i / SUM_j n_ij/(p_i+p_j), mean-normalized and
    # rounded to 12dp each round (the iteration-granularity
    # round-before-compare that pins the trajectory across engines)
    _bt_iters = []
    _prev_p = "p0"
    for _it in (1, 2, 3):
        _bt_iters.append(
            f"""d{_it} AS (
                SELECT i AS item,
                       sum(n_ij / (pi.p + pj.p)) AS d
                FROM mir
                JOIN {_prev_p} pi ON mir.i = pi.item
                JOIN {_prev_p} pj ON mir.j = pj.item
                GROUP BY i),
            r{_it} AS (
                SELECT w.item,
                       CASE WHEN d IS NOT NULL AND w.wins > 0
                            THEN w.wins / d ELSE 1e-9 END AS p_raw
                FROM wins w LEFT JOIN d{_it} USING(item)),
            p{_it} AS (
                SELECT item,
                       round(p_raw / (SELECT avg(p_raw) FROM r{_it}),
                             12) AS p
                FROM r{_it})"""
        )
        _prev_p = f"p{_it}"
    s["events_bradley_terry"] = f"""
        WITH per AS (
            SELECT ts::DATE AS day, user_id, event_type,
                   sum(round(value * 100)::BIGINT) AS cents
            FROM events GROUP BY 1, 2, 3),
        comp AS (
            SELECT a.event_type AS wi, b.event_type AS li,
                   count(*)::DOUBLE AS n_wl
            FROM per a
            JOIN per b ON a.day = b.day AND a.user_id = b.user_id
                      AND a.event_type <> b.event_type
                      AND a.cents > b.cents
            GROUP BY 1, 2),
        items AS (
            SELECT DISTINCT item FROM (
                SELECT wi AS item FROM comp
                UNION ALL SELECT li FROM comp) t),
        wins AS (
            SELECT item,
                   coalesce((SELECT sum(n_wl) FROM comp
                             WHERE wi = item), 0.0) AS wins
            FROM items),
        und AS (
            SELECT least(wi, li) AS u, greatest(wi, li) AS v,
                   sum(n_wl) AS n_ij
            FROM comp GROUP BY 1, 2),
        mir AS (
            SELECT u AS i, v AS j, n_ij FROM und
            UNION ALL SELECT v, u, n_ij FROM und),
        p0 AS (SELECT item, 1.0 AS p FROM items),
        {", ".join(_bt_iters)}
        SELECT p3.item, wins::BIGINT AS wins, round(p, 6) AS strength
        FROM p3 JOIN wins USING(item)
    """

    s["text_readability"] = """
        SELECT doc_id,
               len(list_filter(regexp_split_to_array(lower(trim(text)),
                                                     '\\s+'),
                               t -> t <> ''))::BIGINT AS n_words,
               greatest(len(regexp_extract_all(text, '[.!?]+')),
                        1)::BIGINT AS n_sents,
               len(regexp_extract_all(lower(text),
                                      '[aeiouy]+'))::BIGINT AS n_syll,
               round(206.835
                     - 1.015 * (greatest(n_words, 1)::DOUBLE / n_sents)
                     - 84.6 * (n_syll::DOUBLE / greatest(n_words, 1)),
                     4) AS flesch_ease,
               round(0.39 * (greatest(n_words, 1)::DOUBLE / n_sents)
                     + 11.8 * (n_syll::DOUBLE / greatest(n_words, 1))
                     - 15.59, 4) AS fk_grade
        FROM documents
    """

    # TextRank: bigram adjacency from the raw token stream, content-word
    # + support cuts, then the SAME PageRank unroll as dedup_pagerank
    # (CTE names match _pr_stages' references), rounded-before-rank top-30
    s["text_textrank"] = f"""
        WITH toks AS ({_TOKS}),
        bg AS (SELECT unnest(
                 CASE WHEN len(tokens) >= 2
                      THEN [array_to_string(tokens[i:i+1], ' ')
                            FOR i IN range(1, len(tokens))]
                      ELSE []::VARCHAR[] END) AS gram
               FROM toks),
        ab AS (SELECT split_part(gram, ' ', 1) AS a,
                      split_part(gram, ' ', 2) AS b
               FROM bg),
        cw AS (SELECT a, b FROM ab
               WHERE length(a) >= 3 AND length(b) >= 3
                 AND NOT list_contains({_STOP_SQL}, a)
                 AND NOT list_contains({_STOP_SQL}, b)
                 AND a <> b),
        und AS (SELECT least(a, b) AS u, greatest(a, b) AS v
                FROM cw GROUP BY 1, 2 HAVING count(*) >= 3),
        pr_edges AS (SELECT u AS src, v AS dst FROM und
                     UNION ALL SELECT v, u FROM und),
        allnodes AS (SELECT DISTINCT src AS node FROM pr_edges),
        nn AS (SELECT count(*)::DOUBLE AS n_n FROM allnodes),
        deg AS (SELECT src AS node, count(*)::DOUBLE AS _deg
                FROM pr_edges GROUP BY 1),
        r0 AS (SELECT node, 1.0 / (SELECT n_n FROM nn) AS rank
               FROM allnodes),{_pr_stages}
        fin AS (SELECT node, round(rank, 9) AS rank FROM {_prev}),
        rk AS (SELECT node, rank,
                      row_number() OVER (ORDER BY rank DESC, node) AS rn
               FROM fin)
        SELECT node AS term, rank, rn::INT AS rn FROM rk WHERE rn <= 30
    """

    s["rel_merge_upsert"] = """
        WITH src AS (
            SELECT c_custkey, c_name, c_nationkey,
                   c_acctbal + 10.0 AS c_acctbal, c_mktsegment,
                   FALSE AS is_del
            FROM customer
            WHERE c_custkey % 7 = 0 AND c_custkey % 11 <> 0
            UNION ALL
            SELECT c_custkey, c_name, c_nationkey, c_acctbal,
                   c_mktsegment, TRUE
            FROM customer WHERE c_custkey % 11 = 0
            UNION ALL
            SELECT c_custkey + 10000000,
                   'NEW#' || c_custkey::VARCHAR, c_nationkey, 0.0,
                   'NEW', FALSE
            FROM customer WHERE c_custkey % 13 = 0),
        kept AS (
            SELECT t.c_custkey,
                   CASE WHEN s.c_custkey IS NOT NULL
                        THEN s.c_name ELSE t.c_name END AS c_name,
                   CASE WHEN s.c_custkey IS NOT NULL
                        THEN s.c_nationkey
                        ELSE t.c_nationkey END AS c_nationkey,
                   CASE WHEN s.c_custkey IS NOT NULL
                        THEN s.c_acctbal ELSE t.c_acctbal END AS c_acctbal,
                   CASE WHEN s.c_custkey IS NOT NULL
                        THEN s.c_mktsegment
                        ELSE t.c_mktsegment END AS c_mktsegment
            FROM customer t LEFT JOIN src s
              ON t.c_custkey = s.c_custkey
            WHERE coalesce(s.is_del, FALSE) = FALSE),
        ins AS (
            SELECT s.c_custkey, s.c_name, s.c_nationkey, s.c_acctbal,
                   s.c_mktsegment
            FROM src s LEFT JOIN customer t
              ON s.c_custkey = t.c_custkey
            WHERE t.c_custkey IS NULL AND NOT s.is_del)
        SELECT c_custkey, c_name, c_nationkey,
               round(c_acctbal, 2) AS c_acctbal, c_mktsegment
        FROM (SELECT * FROM kept UNION ALL SELECT * FROM ins) z
    """

    s["events_churn_labels"] = """
        WITH e AS (SELECT user_id, event_type, epoch_ns(ts) AS ts_ns
                   FROM events),
        c AS (SELECT max(ts_ns) - 604800000000000 AS cut FROM e),
        pu AS (
            SELECT user_id,
                   sum(CASE WHEN ts_ns < cut THEN 1 ELSE 0 END)::BIGINT
                       AS n_before,
                   sum(CASE WHEN ts_ns < cut AND event_type = 'purchase'
                            THEN 1 ELSE 0 END)::BIGINT
                       AS n_purchases_before,
                   count(DISTINCT CASE WHEN ts_ns < cut
                                       THEN ts_ns // 86400000000000
                                  END)::BIGINT AS days_active_before,
                   max(CASE WHEN ts_ns < cut THEN ts_ns END)
                       AS last_before,
                   max(CASE WHEN ts_ns >= cut THEN 1 ELSE 0 END)
                       AS active_after,
                   max(cut) AS cut2
            FROM e, c GROUP BY user_id)
        SELECT user_id, n_before, n_purchases_before, days_active_before,
               ((cut2 - last_before) // 86400000000000)::BIGINT
                   AS recency_days,
               (1 - active_after)::INT AS churned
        FROM pu WHERE n_before > 0
    """

    s["events_session_anomaly"] = f"""
        WITH e AS (SELECT user_id, event_id, event_type,
                          epoch_ns(ts) AS ts_ns FROM events),
        l AS (SELECT *, CASE WHEN ts_ns - lag(ts_ns) OVER w
                                  > {SESSION_GAP_SEC * 1_000_000_000}
                             THEN 1 ELSE 0 END AS new_session
              FROM e WINDOW w AS (PARTITION BY user_id
                                  ORDER BY ts_ns, event_id)),
        st AS (SELECT *, sum(new_session) OVER (PARTITION BY user_id
                             ORDER BY ts_ns, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_seq
               FROM l),
        tr AS (SELECT user_id, session_seq,
                      event_type AS from_type,
                      lead(event_type) OVER w2 AS to_type,
                      lead(session_seq) OVER w2 AS to_seq
               FROM st WINDOW w2 AS (PARTITION BY user_id
                                     ORDER BY ts_ns, event_id)),
        tg AS (SELECT * FROM tr
               WHERE to_type IS NOT NULL AND to_seq = session_seq),
        cnt AS (SELECT from_type, to_type, count(*) AS n FROM tg
                GROUP BY 1, 2),
        tt AS (SELECT from_type, sum(n) AS tot FROM cnt GROUP BY 1),
        pr AS (SELECT cnt.from_type, cnt.to_type,
                      cnt.n / tot::DOUBLE AS p
               FROM cnt JOIN tt USING (from_type)),
        sc AS (SELECT user_id, session_seq,
                      count(*)::BIGINT AS n_trans,
                      round(avg(ln(p)), 6) AS avg_logp
               FROM tg JOIN pr USING (from_type, to_type)
               GROUP BY 1, 2),
        rk AS (SELECT *, row_number() OVER (
                   ORDER BY avg_logp, user_id, session_seq) AS rn
               FROM sc)
        SELECT user_id, session_seq::BIGINT AS session_seq, n_trans,
               avg_logp, rn::INT AS rn
        FROM rk WHERE rn <= 20
    """

    s["events_cumulative_uniques"] = """
        WITH fd AS (
            SELECT user_id,
                   min(epoch_ns(ts) // 86400000000000) AS day
            FROM events GROUP BY user_id),
        daily AS (
            SELECT day, count(*) AS new_users FROM fd GROUP BY day)
        SELECT day, new_users,
               sum(new_users) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW)::BIGINT AS cum_users
        FROM daily
    """

    s["rel_skyline"] = """
        WITH rev AS (
            SELECT l_suppkey,
                   sum(round(l_extendedprice * 100)::BIGINT) AS rev_cents
            FROM lineitem GROUP BY 1),
        cand AS (
            SELECT s_suppkey, s_name, rev_cents, s_acctbal
            FROM supplier JOIN rev ON s_suppkey = l_suppkey)
        SELECT s_suppkey, s_name,
               rev_cents / 100.0 AS revenue,
               round(s_acctbal, 2) AS s_acctbal
        FROM cand q
        WHERE NOT EXISTS (
            SELECT 1 FROM cand p
            WHERE p.rev_cents >= q.rev_cents
              AND p.s_acctbal >= q.s_acctbal
              AND (p.rev_cents > q.rev_cents
                   OR p.s_acctbal > q.s_acctbal))
    """
    # the pre-filtered path must be value-identical — same oracle
    s["rel_skyline_prefiltered"] = s["rel_skyline"]

    s["events_range_window"] = """
        SELECT event_id, user_id, epoch_ns(ts) AS ts_ns,
               count(*) OVER w AS n_1h,
               sum(round(value * 100)::BIGINT) OVER w / 100.0 AS sum_1h
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts)
                     RANGE BETWEEN 3600000000000 PRECEDING
                               AND CURRENT ROW)
    """

    s["rel_sorted_neighborhood"] = """
        WITH b AS (
            SELECT c_custkey AS a_id, c_name AS a_key,
                   substr(c_name, 10, 4) AS p
            FROM customer),
        l AS (
            SELECT a_id, a_key,
                   lead(a_id, 1) OVER w AS id1,
                   lead(a_key, 1) OVER w AS k1,
                   lead(a_id, 2) OVER w AS id2,
                   lead(a_key, 2) OVER w AS k2
            FROM b WINDOW w AS (PARTITION BY p ORDER BY a_key, a_id)),
        u AS (
            SELECT a_id, a_key, id1 AS b_id, k1 AS b_key, 1 AS off
            FROM l WHERE id1 IS NOT NULL
            UNION ALL
            SELECT a_id, a_key, id2, k2, 2 FROM l WHERE id2 IS NOT NULL)
        SELECT a_id, b_id, a_key, b_key, off::INT AS offset,
               levenshtein(a_key, b_key)::INT AS distance
        FROM u WHERE levenshtein(a_key, b_key) <= 2
    """

    # evaluation_table, rag_hybrid_mmr: intentionally omitted — wall-clock
    # latency / sequential greedy loop are not SQL-expressible; the driver
    # records rows-only checks and the pytest suite covers their semantics.
    return s
