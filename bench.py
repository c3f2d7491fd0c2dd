"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Per BASELINE.md, the contract is batch throughput for the full query SET
(the reference's sub-ms FAISS per-query latencies are below Spark's
scheduling floor): each entry is an end-to-end batch pipeline materialized
with a noop write so every operator actually executes.
"""

from __future__ import annotations

import json
import os
import sys
import time


def materialize(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def proc_stat() -> tuple[int, int] | None:
    """(busy, total) jiffies across all host CPUs from /proc/stat —
    busy includes the steal field, so co-tenant VMs show up even when
    no foreign process is visible in this guest."""
    try:
        with open("/proc/stat") as f:
            vals = [int(x) for x in f.readline().split()[1:]]
        idle = vals[3] + vals[4]  # idle + iowait
        return sum(vals) - idle, sum(vals)
    except Exception:  # noqa: BLE001 — non-Linux host
        return None


def tree_cpu_ticks() -> int | None:
    """CPU jiffies (utime+stime, plus reaped children's cutime/cstime)
    of THIS process and every live descendant — the bench's own burn,
    JVM and Python workers included. Subtracted from the host's busy
    jiffies this isolates FOREIGN load, which a 1-min loadavg cannot:
    loadavg is a ~60 s EMA that (a) counts our own 32 executor threads
    (measured up to ~11 on a quiet host mid-run) and (b) lags a short
    co-tenant burst (BENCH_r11 published cdc_chunks ~10x inflated while
    its loadavg sample read 5.6 under a false noisy_host)."""
    try:
        info: dict[int, tuple[int, int]] = {}
        for p in os.listdir("/proc"):
            if not p.isdigit():
                continue
            try:
                with open(f"/proc/{p}/stat") as f:
                    st = f.read()
                rest = st[st.rindex(")") + 2:].split()
                info[int(p)] = (
                    int(rest[1]),
                    int(rest[11]) + int(rest[12])
                    + int(rest[13]) + int(rest[14]),
                )
            except (OSError, ValueError, IndexError):
                continue  # process exited between listing and read
        kids: dict[int, list[int]] = {}
        for pid, (ppid, _) in info.items():
            kids.setdefault(ppid, []).append(pid)
        total, stack = 0, [os.getpid()]
        while stack:
            pid = stack.pop()
            if pid in info:
                total += info[pid][1]
                stack.extend(kids.get(pid, []))
        return total
    except Exception:  # noqa: BLE001 — non-Linux host
        return None


def foreign_cpus(
    stat0, stat1, tree0, tree1, n_cpus: int
) -> float | None:
    """Average number of host CPUs burned by code that is NOT this
    bench's process tree over the window (stat0,tree0)→(stat1,tree1).
    None when /proc was unreadable on either side."""
    if None in (stat0, stat1, tree0, tree1):
        return None
    total = stat1[1] - stat0[1]
    if total <= 0:
        return None
    foreign = max(0, (stat1[0] - stat0[0]) - (tree1 - tree0))
    return round(foreign * n_cpus / total, 2)


REGRESSION_LIMIT = 1.5
REGRESSION_MIN_DELTA_SEC = 0.3
REGRESSION_MIN_HISTORY = 2


def artifact_history(
    cur_sf: float, here: str | None = None
) -> dict[str, list[float]]:
    """Warm per-family times from the last 3 committed ``BENCH_r*.json``
    artifacts AT THE SAME sf — the baseline of the cross-artifact
    regression channel (third noise channel, r14). Accepts both the
    driver-wrapped shape (headline under ``"parsed"``) and a raw
    headline; unreadable artifacts and mismatched-sf rounds are
    skipped, errored families (<= 0) excluded."""
    import glob as _glob
    import re as _re

    here = here or os.path.dirname(os.path.abspath(__file__))
    arts = []
    for p in _glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = _re.search(r"BENCH_r(\d+)\.json$", p)
        if m:
            arts.append((int(m.group(1)), p))
    hist: dict[str, list[float]] = {}
    for _, p in sorted(arts)[-3:]:
        try:
            with open(p) as fh:
                art = json.load(fh) or {}
        except Exception:  # noqa: BLE001 — unreadable artifact
            continue
        if "queries" not in art and isinstance(art.get("parsed"), dict):
            art = art["parsed"]
        if art.get("sf") != cur_sf:
            continue  # warm times only compare at the same scale
        for k, v in (art.get("queries") or {}).items():
            if isinstance(v, (int, float)) and v > 0:
                hist.setdefault(k, []).append(float(v))
    return hist


def regression_median(
    hist: dict[str, list[float]], name: str,
    min_history: int = REGRESSION_MIN_HISTORY,
) -> float | None:
    """The family's comparison baseline: the median of its committed
    warm times (robust to ONE noisy committed round — exactly the r11
    cdc_chunks case, [13.371, 1.706, 2.251] → 2.251). None with fewer
    than ``min_history`` samples (new families never trip)."""
    h = hist.get(name)
    if not h or len(h) < min_history:
        return None
    return sorted(h)[len(h) // 2]


def loadavg() -> list[float] | None:
    """1/5/15-minute host load — the sentinel that lets a reader tell a
    code regression from a loaded shared host (BENCH_r06 was uniformly
    1.2-3x inflated by driver-host contention and the artifact alone
    couldn't show it; see README 'Reading a noisy round')."""
    try:
        with open("/proc/loadavg") as f:
            return [float(x) for x in f.read().split()[:3]]
    except Exception:  # noqa: BLE001 — non-Linux host
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    # Read the sentinel BEFORE the SparkSession exists: from here on
    # loadavg mostly measures our own executors; the pre-session value
    # is foreign load. >25% of cores already busy → the artifact would
    # be a noisy-host artifact (BENCH_r07/r08 both were), so RETRY
    # first: sleep-and-resample, bounded, until the 1-min load decays
    # under the threshold or the budget runs out (VERDICT r8 task 7 —
    # the committed artifact should usually be the clean one). Only
    # after retry exhaustion does the run proceed flagged noisy.
    n_cpus = os.cpu_count() or int(cpus)
    load_start = loadavg()

    def _noisy(lv: list[float] | None) -> bool:
        return bool(lv) and lv[0] > 0.25 * n_cpus

    noisy_retries = 0
    while _noisy(load_start) and noisy_retries < 4:
        time.sleep(45)
        noisy_retries += 1
        load_start = loadavg()
    noisy_host = _noisy(load_start)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("cvs-spark-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "24g")
        .config("spark.sql.adaptive.enabled", "true")
        # let AQE size CACHED plan output by observed bytes instead of
        # freezing spark.sql.shuffle.partitions into the cache (r15,
        # guide §2.2: partitions derived from data, not a constant —
        # off by default only for plan-stability reasons). Scale-
        # neutral: at any size AQE targets the advisory partition size;
        # locally it stops every cached-index scan paying 32 tasks for
        # a few MB. Measured: tfidf cache build 9.5 s → 5.5 s cold.
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from clinical_vector_search_spark.operators.bm25 import (
        bm25_index,
        bm25_topk_set,
    )
    from clinical_vector_search_spark.operators.dedup import (
        minhash_candidate_pairs,
        simhash_pd,
    )
    from clinical_vector_search_spark.pipeline.embedding import hash_embed_pd
    from clinical_vector_search_spark.pipeline.modes import (
        baseline_mode,
        dp_mode,
        rag_mode,
    )
    from clinical_vector_search_spark.streaming.events import (
        read_events,
        sessionize,
        tumbling_agg,
    )

    # NOTE on input splits: the sf0.1 documents table is ONE parquet
    # split. Fanning it out helps only COMPUTE-bound stages (the embed
    # bench repartitions for itself); for the tokenize→groupBy pipelines
    # (bm25/minhash/prep) a measured repartition(32) made things 1.4-2.4×
    # SLOWER — 32 partial maps each carrying the full term vocabulary
    # multiply the map-side-combine output ~32×. Keeping the natural
    # split count is both faster here and the honest default (Spark
    # sizes splits so a partition's combine map stays effective).
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # Session warmup outside the timed region: JVM/codegen/Python-worker
    # spin-up, parquet footer reads, AND JIT (C2) compilation of the
    # interpreted higher-order-function eval paths are fixed per-session
    # costs, not query costs. The HOF expressions (zip_with/aggregate/
    # transform) are CodegenFallback — their interpreted eval needs tens of
    # thousands of invocations before HotSpot compiles it, so a 2-row
    # warmup leaves a measured ~10s first-query penalty. Exercise each
    # expression family over ~40k rows so the timed queries run hot
    # (at 100 TB a long-lived executor JVM is always hot).
    docs.count()
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    import pandas as _pd

    from pyspark.sql import Window as _W

    from clinical_vector_search_spark.functions import vector as V
    from clinical_vector_search_spark.pipeline.embedding import hash_embed as _he

    spark.createDataFrame(_pd.DataFrame({"x": [1.0]})).mapInPandas(
        lambda it: it, "x double"
    ).count()

    def _noop(df):
        df.write.format("noop").mode("overwrite").save()

    _warm = spark.range(40000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("tok"), (F.col("id") % 997).cast("string"),
                 F.lit(" word "), (F.col("id") % 31).cast("string")).alias("text"),
        F.transform(
            F.sequence(F.lit(0), F.lit(15)),
            lambda i: ((F.col("id") % 7) + i).cast("double"),
        ).alias("v"),
    )
    _wn = _warm.select("doc_id", V.l2_normalize("v").alias("v"))
    _noop(_wn.select(
        V.dot("v", "v").alias("s"),
        V.add_noise("v", "doc_id", 0.1, 16).alias("n"),
        V.random_projection("v", 16, 4).alias("p"),
    ))
    _w = _W.partitionBy(F.col("doc_id") % 100).orderBy(F.desc("doc_id"))
    _noop(_warm.select(F.row_number().over(_w).alias("r")).filter(F.col("r") <= 5))
    _he(_warm, 8).count()  # tokenize/explode/groupBy/map_from_entries family

    def bench_baseline():
        return baseline_mode(spark, sf_dir, k=10, n_queries=10)

    def bench_dp():
        return dp_mode(spark, sf_dir, k=10, n_queries=10)

    def bench_rag():
        return rag_mode(spark, sf_dir, k=10, n_queries=5,
                        candidate_k=40, bm25_topk=40)

    def bench_bm25_queryset():
        # index built ONCE, whole query set scored in ONE plan (the
        # reference rebuilds per query — pipeline.py:171-172)
        idx = bm25_index(docs, materialize=True)
        qset = [
            (i, terms)
            for i, terms in enumerate(
                (
                    ["spark", "table"], ["query", "scan"], ["join", "merge"],
                    ["window", "agg"], ["stream", "batch"], ["key", "value"],
                    ["sort", "filter"], ["row", "column"], ["fast", "slow"],
                    ["data", "part"],
                )
            )
        ]
        return bm25_topk_set(idx, qset, 10)

    def bench_embed_corpus():
        # mapInPandas embedder — the model-per-executor shape a real encoder
        # runs (reference embedding.py:31-41); parity-tested against the
        # expression/oracle twin in tests/test_embedding.py.
        # repartition: embedding is COMPUTE-bound (no combine stage to
        # bloat), so fanning the single test split across cores is pure
        # win — the shape a real encoder runs.
        return hash_embed_pd(docs.repartition(int(cpus)), 64)

    def bench_minhash_dedup():
        return minhash_candidate_pairs(docs, num_hashes=8, rows_per_band=2)

    def bench_simhash():
        # zero-shuffle mapInPandas popcount — parity-tested against the
        # expression/oracle twin in tests/test_dedup.py
        return simhash_pd(docs, bits=32)

    def bench_tumbling():
        return tumbling_agg(read_events(spark, sf_dir), 300)

    def bench_sessionize():
        return sessionize(read_events(spark, sf_dir), 1800)

    def bench_pq_adc():
        # PQ encode (numpy twin) + ADC top-10 — the compressed-index ANN
        # path; codes are the only corpus-sized input at query time
        from clinical_vector_search_spark.functions import vector as V
        from clinical_vector_search_spark.operators.pq import (
            knn_pq_adc_pd,
            pq_codebooks_lcg,
            pq_encode_pd,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", V.l2_normalize("embedding").alias("embedding")
        )
        books = pq_codebooks_lcg(64, 8, 16)
        queries = emb.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        codes = pq_encode_pd(emb, books).withColumnRenamed("vec_id", "doc_id")
        return knn_pq_adc_pd(queries, codes, books, 10)

    def bench_sessionize_skew():
        from clinical_vector_search_spark.streaming.events import (
            sessionize_skew,
        )

        return sessionize_skew(read_events(spark, sf_dir), 1800, 7200)

    def bench_funnel():
        # ordered-funnel conversion over 1M events: greedy earliest-
        # completion levels (streaming/events.py funnel)
        from clinical_vector_search_spark.streaming.events import funnel

        return funnel(read_events(spark, sf_dir),
                      ["view", "click", "purchase"])

    def bench_retention():
        # cohort retention: the (user, day)-distinct shuffle shape
        # (streaming/events.py retention_cohorts) — tracked here so the
        # distinct's cost has a number before anyone scales it
        from clinical_vector_search_spark.streaming.events import (
            retention_cohorts,
        )

        return retention_cohorts(read_events(spark, sf_dir), [1, 2, 7])

    def bench_span_dedup():
        # C4-style cross-doc sentence-span dedup: posexplode + skew-safe
        # groupBy-min winners + reassembly (operators/dedup.py span_dedup)
        from clinical_vector_search_spark.operators.dedup import span_dedup

        return span_dedup(docs)

    def bench_semantic_dedup():
        # SemDeDup shape at 64 clusters: cluster-bucketed within-cluster
        # cosine prune over the 5k sf0.1 embeddings — the quadratic stage
        # bounded by cluster size, never all-pairs
        from clinical_vector_search_spark.operators.dedup import (
            semantic_dedup,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        # default accel='auto' (r13): 64 clusters x dim 64 sits above
        # the dispatch boundary, so this family now rides the BLAS lane
        # — re-measured r13 warm at this exact shape: pd [4.0, 3.8,
        # 3.1] s vs expr [5.5, 5.7, 12.2] s (the earlier '5.4s pd vs
        # 2.8s expr' note predated the salted-guard/pair-path work and
        # no longer reproduces). Both lanes bit-identical (parity test);
        # the expr lane's number stays visible in scale_probe's pinned
        # semdedup_*_expr rows.
        return semantic_dedup(emb, dim=64, threshold=0.35, n_clusters=64)

    def bench_cdc_chunks():
        # content-defined chunking: compute-bound interpreted-HOF md5
        # windows, map-only — fan the single test split across cores
        # (measured 15s -> 1.0s warm; no combine stage to bloat)
        from clinical_vector_search_spark.functions.text import (
            cdc_chunk_rows_pd,
        )

        return cdc_chunk_rows_pd(docs.repartition(int(cpus)), w=4, divisor=8)

    def bench_prep_pipeline():
        # the composed LLM data-prep plan: clean -> lang/quality filter ->
        # md5 dedup -> 5-gram decontamination -> BPE budget in one job
        # (__spark_entry__.q_doc_prep_pipeline)
        import __spark_entry__ as E

        return E.q_doc_prep_pipeline(spark, sf_dir)

    def bench_gapfill():
        # dense-grid resample: ~1M generated grid rows at sf0.1 (1.5k
        # users x ~700 hourly buckets) + ffill window — tracks the
        # sequence-explode + group-window shape
        from clinical_vector_search_spark.streaming.events import (
            resample_gapfill,
        )

        return resample_gapfill(read_events(spark, sf_dir), 3600)

    def bench_session_paths():
        # full user-key shuffle + per-session ordered collect + path
        # rollup (streaming/events.py session_paths)
        from clinical_vector_search_spark.streaming.events import (
            session_paths,
        )

        return session_paths(read_events(spark, sf_dir), 1800, 10, 2)

    def bench_tfidf_queryset():
        # sparse tf-idf cosine retrieval: posting-list equi-join scoring
        # (operators/sparse.py) — index built once, 3-query set in one plan
        import __spark_entry__ as E

        return E.q_retrieval_tfidf(spark, sf_dir)

    def bench_dsir():
        # DSIR curation weighting (r8): two corpus tokenization aggs +
        # a K-row broadcast — the new importance-weighting surface
        import __spark_entry__ as E

        return E.q_doc_dsir_weights(spark, sf_dir)

    def bench_winnowing():
        # winnowing fingerprint digest (r8): posexplode + two window
        # passes over one doc-key exchange — the MOSS selection rule
        import __spark_entry__ as E

        return E.q_text_winnowing(spark, sf_dir)

    def bench_basket():
        # market-basket lift (r8): distinct-bounded basket self-join +
        # broadcast support joins
        import __spark_entry__ as E

        return E.q_rel_basket_pairs(spark, sf_dir)

    def bench_cusum():
        # CUSUM change points (r8): day-granularity agg + windowed
        # closed-form recursion
        import __spark_entry__ as E

        return E.q_events_cusum(spark, sf_dir)

    _incr_state: dict = {}

    def _ensure_incr_state():
        from clinical_vector_search_spark.operators.dedup import (
            dedup_groups,
            minhash_band_buckets,
            minhash_candidate_pairs,
            minhash_signatures,
        )

        if _incr_state:
            return
        d = docs.select("doc_id", "text")
        corpus = d.filter(F.col("doc_id") < 400)
        _incr_state["batch"] = d.filter(
            F.col("doc_id") >= 400
        ).localCheckpoint()
        _incr_state["idx"] = minhash_band_buckets(
            minhash_signatures(corpus, 4, 3), 2
        ).localCheckpoint()
        _incr_state["labels"] = dedup_groups(
            corpus.select("doc_id"),
            minhash_candidate_pairs(corpus, 4, 2, 3),
        )  # dedup_groups output is already localCheckpoint-ed

    def bench_incremental_dedup():
        # incremental near-dup maintenance (r10): batch band keys
        # broadcast-probe the persisted corpus index, new pairs fold
        # into persisted component labels over touched-component stars
        # only — the daily-ingest path whose cost must track the batch.
        # The persisted inputs (corpus band index + component labels)
        # are prebuilt ONCE, outside the warm sweeps — production
        # amortizes them across every ingest; the timed work is
        # probe + pair emission + label fold-in.
        from clinical_vector_search_spark.operators.dedup import (
            dedup_groups_incremental,
            minhash_pairs_incremental,
        )

        _ensure_incr_state()
        new_pairs = minhash_pairs_incremental(
            _incr_state["batch"], _incr_state["idx"], 4, 2, 3
        )
        return dedup_groups_incremental(
            _incr_state["labels"],
            new_pairs,
            _incr_state["batch"].select("doc_id"),
        )

    _ann_state: dict = {}

    def _ensure_ann_state():
        import tempfile

        from clinical_vector_search_spark.functions import vector as V
        from clinical_vector_search_spark.operators.pq import (
            ivfpq_index_add,
            ivfpq_index_delete,
            pq_codebooks_lcg,
        )

        if _ann_state:
            return
        v = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", V.l2_normalize("embedding").alias("embedding")
        )
        _ann_state["books"] = pq_codebooks_lcg(64, 8, 16)
        _ann_state["idx"] = tempfile.mkdtemp(prefix="cvs_bench_ivfpq_")
        _ann_state["batch"] = v.filter(
            F.col("vec_id") % 8 == 3
        ).localCheckpoint()
        _ann_state["queries"] = v.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        ).localCheckpoint()
        _ann_state["corpus"] = v  # lazy — the refine rescore's cold store
        # tombstones for the refine_serving family — its plan must
        # include the broadcast anti-join the production serve pays
        _ann_state["dead"] = tempfile.mkdtemp(prefix="cvs_bench_tomb_")
        ivfpq_index_delete(
            spark, v.filter(F.col("vec_id") % 16 == 5), 0,
            _ann_state["dead"],
        )
        ivfpq_index_add(
            spark, v.filter(F.col("vec_id") % 8 != 3), 0,
            _ann_state["idx"], 64, _ann_state["books"], n_centroids=16,
        )

    def bench_incremental_ann():
        # incremental ANN index maintenance + serving (r11): fold a daily
        # batch into a PERSISTED IVF-PQ codes table (map-side expression
        # encode, idempotent batch-id overwrite — pq.ivfpq_index_add) and
        # answer a query set by ADC over the READ-BACK codes
        # (pq.knn_ivfpq_codes) — the raw corpus is never re-encoded at
        # query time, unlike pq_adc above which re-encodes every run.
        # The base index is built ONCE outside the sweeps (production
        # amortizes it across every ingest); timed work = batch fold-in
        # write + codes-scan serving query.
        from clinical_vector_search_spark.operators.pq import (
            ivfpq_index_add,
            knn_ivfpq_codes,
            read_ivfpq_index,
        )

        _ensure_ann_state()
        # encoder="pd": the Arrow+NumPy throughput twin — the expression
        # twin spends ~2 s/rep compiling its ~1k-term codegen tree,
        # which at bench batch sizes measures plan compilation, not
        # maintenance (0.26 s vs 2.1 s warm on this batch; bit-identical
        # output, parity in tests/test_pq.py)
        ivfpq_index_add(
            spark, _ann_state["batch"], 1, _ann_state["idx"], 64,
            _ann_state["books"], n_centroids=16, encoder="pd",
        )
        return knn_ivfpq_codes(
            _ann_state["queries"],
            read_ivfpq_index(spark, _ann_state["idx"]),
            10, 64, _ann_state["books"], n_centroids=16,
            doc_id="vec_id", n_probe=4,
        )

    def bench_refine_serving():
        # r12: the full IndexRefineFlat serving shape over the MAINTAINED
        # index — ADC coarse cut over the read-back codes table WITH the
        # broadcast tombstone anti-join the production serve pays, then
        # exact L2 rescore of only the top-50 candidates per query via a
        # doc-id equi-join (pq.knn_refine_codes). Contrast with
        # incremental_ann above, which stops at the ADC ranking: this
        # family adds the tombstone filter and the candidate-granularity
        # raw-vector fetch needed for exact final distances.
        from clinical_vector_search_spark.operators.pq import (
            knn_refine_codes,
            read_ivfpq_index,
        )

        _ensure_ann_state()
        return knn_refine_codes(
            _ann_state["queries"],
            read_ivfpq_index(
                spark, _ann_state["idx"],
                tombstone_path=_ann_state["dead"],
            ),
            _ann_state["corpus"],
            10, 64, _ann_state["books"], n_centroids=16,
            k_coarse=50, doc_id="vec_id", n_probe=4,
        )

    _bm25_state: dict = {}

    def _ensure_bm25_state():
        import tempfile

        from clinical_vector_search_spark.operators.bm25 import (
            bm25_index_add,
        )

        if _bm25_state:
            return
        d = docs.select("doc_id", "text")
        _bm25_state["dir"] = tempfile.mkdtemp(prefix="cvs_bench_bm25_")
        _bm25_state["batch"] = d.filter(
            F.col("doc_id") % 10 == 7
        ).localCheckpoint()
        bm25_index_add(
            spark, d.filter(F.col("doc_id") % 10 != 7), 0,
            _bm25_state["dir"],
        )

    def bench_incremental_bm25():
        # incremental BM25 maintenance + serving (r11): fold one new doc
        # batch into the persisted additive-stats index (cost ∝ batch —
        # bm25.bm25_index_add never rescans old postings) and score the
        # same 10-query set as bm25_queryset10 over the RECONSTRUCTED
        # view (global idf/avgdl refolded at vocabulary granularity) —
        # the contrast family, which re-tokenizes and rebuilds the whole
        # index from the corpus every run.
        from clinical_vector_search_spark.operators.bm25 import (
            bm25_index_add,
            bm25_read_index,
            bm25_topk_set,
        )

        _ensure_bm25_state()
        bm25_index_add(spark, _bm25_state["batch"], 1, _bm25_state["dir"])
        qset = [
            (i, terms)
            for i, terms in enumerate(
                (
                    ["spark", "table"], ["query", "scan"], ["join", "merge"],
                    ["window", "agg"], ["stream", "batch"], ["key", "value"],
                    ["sort", "filter"], ["row", "column"], ["fast", "slow"],
                    ["data", "part"],
                )
            )
        ]
        return bm25_topk_set(
            bm25_read_index(spark, _bm25_state["dir"]), qset, 10
        )

    _sem_state: dict = {}

    def _ensure_sem_state():
        from clinical_vector_search_spark.operators.dedup import (
            _assignment_frame,
        )

        if _sem_state:
            return
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        _sem_state["batch"] = emb.filter(
            F.col("vec_id") % 10 == 7
        ).localCheckpoint()
        _sem_state["idx"] = _assignment_frame(
            emb.filter(F.col("vec_id") % 10 != 7), 64, 64
        ).localCheckpoint()

    def bench_incremental_semantic():
        # incremental SemDeDup maintenance (r15): a daily batch assigns
        # map-side against the FROZEN centroids and probes ONLY its
        # touched clusters of the PERSISTED assignment index for new
        # near-dup pairs (broadcast semi + broadcast batch probe, no
        # old×old rescan — dedup.semantic_pairs_incremental);
        # semantic_dedup above is the rebuild-every-run contrast family
        # (whole-corpus cluster assignment + Σ|c|² prune each time).
        # The persisted assignment index is prebuilt ONCE outside the
        # warm sweeps — production amortizes it across every ingest.
        from clinical_vector_search_spark.operators.dedup import (
            semantic_pairs_incremental,
        )

        _ensure_sem_state()
        return semantic_pairs_incremental(
            _sem_state["batch"], _sem_state["idx"], 64,
            threshold=0.35, n_clusters=64,
        )

    def bench_pricing():
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        return (
            li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum("l_quantity").alias("sum_qty"),
                 F.sum("l_extendedprice").alias("sum_base"),
                 F.avg("l_discount").alias("avg_disc"),
                 F.count("*").alias("n"))
        )

    benches = {
        "baseline_knn": bench_baseline,
        "dp_pipeline": bench_dp,
        "rag_hybrid_mmr": bench_rag,
        "bm25_queryset10": bench_bm25_queryset,
        "embed_corpus": bench_embed_corpus,
        "minhash_dedup": bench_minhash_dedup,
        "simhash": bench_simhash,
        "events_tumbling": bench_tumbling,
        "events_sessionize": bench_sessionize,
        "events_sessionize_skew": bench_sessionize_skew,
        "pq_adc": bench_pq_adc,
        "events_funnel": bench_funnel,
        "events_retention": bench_retention,
        "span_dedup": bench_span_dedup,
        "semantic_dedup": bench_semantic_dedup,
        "cdc_chunks": bench_cdc_chunks,
        "prep_pipeline": bench_prep_pipeline,
        "tfidf_queryset3": bench_tfidf_queryset,
        "events_gapfill": bench_gapfill,
        "events_session_paths": bench_session_paths,
        "rel_pricing_summary": bench_pricing,
        "dsir_weights": bench_dsir,
        "winnowing_fp": bench_winnowing,
        "basket_pairs": bench_basket,
        "events_cusum": bench_cusum,
        "incremental_dedup": bench_incremental_dedup,
        "incremental_ann": bench_incremental_ann,
        "refine_serving": bench_refine_serving,
        "incremental_bm25": bench_incremental_bm25,
        "incremental_semantic": bench_incremental_semantic,
    }

    # Throwaway end-to-end run of the flagship query before ANY timing
    # starts (VERDICT r3 task 4): the synthetic 40k-row warmup above leaves
    # the real sf-dir scan paths, Python workers for mapInPandas over the
    # actual schemas, and broadcast machinery cold — r3 measured 2.9 s cold
    # vs 1.1 s warm for the identical baseline_knn plan.
    # (This also builds+caches the baseline plan, so baseline_knn's
    # "cold" first-sweep number below is really a warm re-execution —
    # every OTHER query's first sweep is a true cold plan build.)
    try:
        materialize(bench_baseline())
    except Exception as ex:  # noqa: BLE001
        print(f"warmup baseline failed: {ex}", file=sys.stderr)

    # Persisted-state prebuild for the incremental families, OUTSIDE the
    # timed region (r16 MEASUREMENT-BUG FIX, disclosed in
    # OPTIMIZATION_r16.md): each incremental family's docstring has
    # always said its persisted inputs (corpus band index + labels,
    # IVF-PQ codes table, BM25 additive stats, SemDeDup assignments)
    # are "prebuilt ONCE, outside the warm sweeps — production
    # amortizes them across every ingest", but the build actually ran
    # inside the FIRST TIMED REP, so "queries_cold" mixed amortized
    # index CONSTRUCTION into the maintenance families' cold numbers
    # (r16 start: 4.1 s of incremental_dedup's 6.3 s cold was the
    # corpus index+labels build). The warm numbers never included the
    # builds and are unaffected. Old cold numbers: incremental_dedup
    # 6.27, incremental_ann 4.62, incremental_bm25 4.60,
    # incremental_semantic 1.81, refine_serving (shares _ann_state)
    # at r16 start on this host.
    for _ensure in (
        _ensure_incr_state,
        _ensure_ann_state,
        _ensure_bm25_state,
        _ensure_sem_state,
    ):
        try:
            _ensure()
        except Exception as ex:  # noqa: BLE001
            print(f"state prebuild failed: {ex}", file=sys.stderr)

    # best-of-3 in ISOLATION ORDER: all reps of one family run back to
    # back before the next family starts (VERDICT r8 task 4). The old
    # interleaved round-robin let every other family's shuffle garbage,
    # page-cache churn, and executor-thread contention bleed into each
    # rep — measured ~2x inflation on the heavy families at 25 families
    # (prep_pipeline 5.7s interleaved vs 2.8s isolated; tfidf 4.4 vs
    # 2.2; semantic_dedup 5.7 vs 3.0 — README "Interleave contention").
    # Per-family System.gc() + the min-of-reps keeps each number at its
    # isolated steady state; the host-noise-window risk that motivated
    # interleaving is now handled upstream by the noisy-host retry (the
    # sentinel records per-family load so a residual window is visible).
    # Cold vs warm: the prepared-plan cache (pipeline/modes.py) makes the
    # MODE queries plan-build-free on reps 2-3, while non-mode queries
    # rebuild their plan every rep — so the per-query min mixes two
    # regimes. Both numbers are recorded: "queries_cold" = the FIRST
    # rep (plan build + execute, the one-shot-job number) and
    # "queries" = the min across reps (steady-state re-execution, the
    # serving-layer and 100TB-relevant number the total reports).
    times: dict[str, float] = {}
    cold: dict[str, float] = {}
    load_sweeps: dict[str, list[float] | None] = {}
    # fixed 3 reps: the old "4th sweep when noisy" only helped under the
    # interleaved order, where the extra sweep re-sampled each family at
    # a temporally DISTANT point that could fall outside a contention
    # window; with back-to-back reps a 4th sample lands inside the same
    # window and adds runtime for nothing — noise is now handled
    # upstream by the pre-session retry
    n_sweeps = 3
    # Per-family noise handling (VERDICT r11 task 1): the pre-session
    # retry above only certifies the START of the run — BENCH_r11
    # published cdc_chunks ~10x inflated by a MID-RUN co-tenant burst
    # under noisy_host:false. Each family now measures the foreign CPU
    # burned during its own reps (host busy jiffies minus our process
    # tree's — see tree_cpu_ticks for why loadavg can't do this); a
    # family whose window exceeded FOREIGN_LIMIT of foreign load is
    # re-run once after a bounded sleep, and if the re-run is noisy too
    # (or errored) the family lands in the headline's noisy_families
    # list so a reader can discount exactly those numbers instead of
    # trusting or discarding the whole artifact.
    # Calibration (r12, this host): a truly idle window measures <= 0.5
    # foreign CPUs (background daemons); the co-tenant burst that
    # inflated cdc_chunks 1.4 s -> 8.6 s (min of 3 reps!) averaged only
    # 2.41 foreign CPUs over the family window — the latency-sensitive
    # Python-round-trip families degrade far below 0.25*cores of
    # foreign load, so the limit is set just above idle noise, not at
    # a "CPUs are contended" level. max() keeps it meaningful on small
    # hosts.
    FOREIGN_LIMIT = max(1.5, 0.05 * n_cpus)
    noisy_families: list[str] = []
    foreign_per_family: dict[str, list] = {}

    # Second noise channel (VERDICT r12 task 3): the foreign-CPU sentinel
    # is blind to NON-CPU noise — page-cache/IO state and Python-worker
    # spawn storms inflated cdc_chunks 1.7 s -> 5.2 s between two clean
    # runs with ~0 foreign CPUs recorded on both sides. The STEADY-STATE
    # reps of a family (reps 2..n — the FIRST rep legitimately differs:
    # it carries the plan build, and for mode queries the prepared-plan
    # cache makes that a systematic 2-5x cold/warm gap, not noise)
    # re-execute an identical warm plan back to back, so their spread IS
    # a noise meter regardless of what caused it: a family whose
    # steady-rep max/min ratio exceeds SPREAD_LIMIT gets the same retry,
    # and if the re-run spreads too the family lands in noisy_families.
    # The absolute-delta guard keeps sub-second families from tripping
    # on scheduler jitter (0.05 s vs 0.12 s is a 2.4x ratio and zero
    # information). The cold channel stays single-sample by construction
    # — noise hitting ONLY rep 1 is covered by the foreign-CPU meter,
    # whose window spans all reps.
    SPREAD_LIMIT = 2.0
    SPREAD_MIN_DELTA_SEC = 0.3

    # Third noise channel (VERDICT r13 task 3): STEADY co-tenant load
    # defeats both meters above by construction — load that is constant
    # across all reps produces no rep spread, and cheap families can
    # sit under FOREIGN_LIMIT while still inflated (the r13 artifact
    # published cdc_chunks 2.251 s / rel_pricing_summary 0.577 s with
    # noisy_families:[]; the judge's quiet-host rerun measured
    # 1.448/0.305 s). Cross-ARTIFACT regression: each family's warm
    # best is compared to the MEDIAN of its warm times in the last 3
    # committed BENCH_r*.json artifacts at the SAME sf — over
    # REGRESSION_LIMIT× the median (with an absolute-delta guard for
    # sub-second jitter) triggers the same one-retry-then-flag path as
    # the other channels. This doubles as the perf-regression tripwire:
    # a REAL engine slowdown flags in the round it lands, and KEEPS
    # flagging in later rounds (the median only moves once the slower
    # number is committed 2+ times) — which is also how a reader tells
    # a regression from a one-off noisy host (host noise clears by the
    # next artifact). New families have no history and never trip.
    _hist = artifact_history(sf)
    regression_flags: dict[str, dict] = {}

    def _regression_noisy(name: str, warm: float) -> bool:
        med = regression_median(_hist, name)
        if med is None:
            return False
        over = (
            warm > REGRESSION_LIMIT * med
            and warm - med > REGRESSION_MIN_DELTA_SEC
        )
        if over:
            regression_flags[name] = {
                "median_last3": round(med, 3),
                "measured_warm": warm,
            }
        return over

    def _spread_noisy(reps: list) -> bool:
        steady = reps[1:]
        if len(steady) < 2:
            return False
        lo, hi = min(steady), max(steady)
        return lo > 0 and hi / lo > SPREAD_LIMIT and hi - lo > SPREAD_MIN_DELTA_SEC

    reps_per_family: dict[str, list] = {}

    def _attempt(fn):
        reps: list = []
        s0, tr0 = proc_stat(), tree_cpu_ticks()
        for _rep in range(n_sweeps):
            t0 = time.time()
            materialize(fn())
            reps.append(round(time.time() - t0, 3))
        s1, tr1 = proc_stat(), tree_cpu_ticks()
        return reps, foreign_cpus(s0, s1, tr0, tr1, n_cpus)

    for name, fn in benches.items():
        # JVM GC between query families: leftover garbage from the
        # previous family's shuffles otherwise triggers collections
        # mid-measurement (observed ±2x noise on sub-second queries)
        spark._jvm.System.gc()
        load_sweeps[name] = loadavg()
        try:
            reps, foreign = _attempt(fn)
            best, first = min(reps), reps[0]
            cold[name] = first
            reps_per_family[name] = [reps]
            foreign_per_family[name] = [foreign]
            foreign_noisy = foreign is not None and foreign > FOREIGN_LIMIT
            regression_noisy = _regression_noisy(name, best)
            if foreign_noisy or _spread_noisy(reps) or regression_noisy:
                if foreign_noisy:
                    why = f"{foreign} foreign CPUs (limit {FOREIGN_LIMIT})"
                elif _spread_noisy(reps):
                    why = f"rep spread {reps} > {SPREAD_LIMIT}x"
                else:
                    why = (
                        f"warm {best}s > {REGRESSION_LIMIT}x the last-3-"
                        f"artifact median {regression_flags[name]['median_last3']}s"
                    )
                print(
                    f"bench {name}: {why} — re-running once",
                    file=sys.stderr,
                )
                time.sleep(20)
                spark._jvm.System.gc()
                try:
                    reps2, foreign2 = _attempt(fn)
                except Exception as ex:  # noqa: BLE001
                    # a failed RE-RUN must not discard the measured (if
                    # noisy) first attempt — keep it, flag the family
                    print(f"bench {name} re-run failed: {ex}", file=sys.stderr)
                    noisy_families.append(name)
                else:
                    best = min(best, min(reps2))
                    reps_per_family[name].append(reps2)
                    foreign_per_family[name].append(foreign2)
                    # a None foreign2 (meter unavailable, non-Linux) is
                    # conservative-noisy ONLY for a foreign-triggered
                    # retry (recovery can't be confirmed on the channel
                    # that fired); a spread-triggered retry is judged by
                    # the spread alone, same as the first attempt was
                    foreign2_noisy = (
                        foreign2 > FOREIGN_LIMIT
                        if foreign2 is not None
                        else foreign_noisy
                    )
                    if (
                        foreign2_noisy
                        or _spread_noisy(reps2)
                        or _regression_noisy(name, best)
                    ):
                        noisy_families.append(name)
                    else:
                        # the retry judged the family clean: drop any
                        # stale channel-3 flag from attempt 1 —
                        # publishing a regression flag for a family the
                        # channel itself cleared would read as a real
                        # regression in a clean round
                        regression_flags.pop(name, None)
                    if name not in noisy_families and foreign_noisy:
                        # cold channel (r12 advice): the re-run's first
                        # rep executes with a warm JVM/page cache/
                        # persisted _*_state, so min(first, first2)
                        # could UNDER-report cold. Substitute it ONLY
                        # when the FOREIGN channel flagged attempt 1 —
                        # that is the one channel whose window covers
                        # rep 1; a spread-only trigger says nothing
                        # about rep 1 (spread excludes it), so the
                        # original, uncontaminated cold number stands.
                        # Both attempts' full rep lists stay in the
                        # sidecar (reps_per_family) so any substitution
                        # is visible.
                        cold[name] = reps2[0]
            times[name] = best
        except Exception as ex:  # noqa: BLE001
            print(f"bench {name} failed: {ex}", file=sys.stderr)
            times[name] = -1.0
            cold.setdefault(name, -1.0)

    # ANN recall sidecar (VERDICT r6 task 7): the approximate operators
    # have recall pytest contracts at sf0.001 but the benched sf had no
    # tracked number — a silent recall collapse would pass every timing
    # gate. recall@10 vs exact kNN, same parameters as the queries()
    # entries (IVF additionally benched with TRAINED centroids — the
    # configuration the scale story recommends — with a 0.5 floor).
    ann_recall: dict[str, float] = {}
    # EVERY tracked key has a floor (VERDICT r8 task 5): the untrained
    # configs are deterministic (md5 centroids / LCG codebooks + fixed
    # testdata), so their recall is a fixed number per sf — floors sit
    # just under the sf0.1 measurement and exist to catch silent
    # collapse, not to certify quality. Measured after the r9 md5
    # centroid fix: knn_ivf untrained 0.56 (up from ~0.3 — the affine
    # LCG centroids made poor cells), knn_lsh 0.30, knn_ivfpq untrained
    # 0.12 (unchanged: bounded by the deliberately weak LCG codebooks
    # kept bit-reproducible for the value-hash oracle, m=8/ksub=16 —
    # the scale path's number is knn_ivfpq_trained).
    floors = {
        "knn_ivf_trained": 0.5,
        "knn_ivfpq_trained": 0.3,
        "knn_pq_refine_trained": 0.5,
        "knn_ivf": 0.4,
        "knn_lsh": 0.15,
        "knn_ivfpq": 0.08,
    }
    # r10 (VERDICT r9 task 5): the md5-centroid fix lifted the two IVF
    # keys at the benched sf0.1 (r9 measured knn_ivf 0.56 in both the
    # driver artifact and the judge rerun; knn_ivf_trained 0.66) —
    # floors raised to just-under-measured so a regression back toward
    # the LCG-era geometry fails the bench instead of merely reading
    # low. sf-gated because recall is a fixed number PER SF (smaller
    # corpora measure lower: 0.52/0.55 at sf0.01) — sanity passes at
    # small sf keep the collapse-detection floors above.
    if sf >= 0.1:
        floors["knn_ivf"] = 0.5
        floors["knn_ivf_trained"] = 0.6
        # knn_ivfpq_trained measured 0.56 at sf0.1 for three consecutive
        # deterministic rounds (r8/r9/r10) — same just-under-measured
        # discipline as the IVF keys (VERDICT r10 task 6)
        floors["knn_ivfpq_trained"] = 0.5
    ann_ok = True
    try:
        from clinical_vector_search_spark.operators.knn import (
            kmeans_centroids,
            knn,
            knn_ivf,
            knn_lsh,
        )
        from clinical_vector_search_spark.operators.pq import (
            knn_ivfpq,
            pq_codebooks_lcg,
        )

        v = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            F.col("vec_id").alias("doc_id"),
            V.l2_normalize("embedding").alias("embedding"),
        )
        qr = v.filter(F.col("doc_id") < 10).select(
            F.col("doc_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )

        def topsets(df) -> dict:
            out: dict = {}
            for r in df.collect():
                out.setdefault(r["query_id"], set()).add(r["doc_id"])
            return out

        exact = topsets(knn(qr, v, 10, strategy="window"))

        def recall(df) -> float:
            got = topsets(df)
            return round(
                sum(
                    len(got.get(q, set()) & e) / len(e)
                    for q, e in exact.items()
                ) / len(exact),
                4,
            )

        trained = kmeans_centroids(v, 64, n_centroids=16)
        ann_recall["knn_ivf_trained"] = recall(
            knn_ivf(qr, v, 10, dim=64, n_centroids=16, n_probe=4,
                    centroids=trained)
        )
        ann_recall["knn_ivf"] = recall(
            knn_ivf(qr, v, 10, dim=64, n_centroids=16, n_probe=4)
        )
        ann_recall["knn_lsh"] = recall(knn_lsh(qr, v, 10, dim=64, n_planes=4))
        # knn_ivfpq tracks the ENTRY configuration (LCG books, m=8,
        # ksub=16) — deliberately weak quantizers kept bit-reproducible
        # for the value-hash oracle; its recall (~0.12) is the price of
        # hashability, not the operator ceiling (floor 0.08, collapse
        # detection only — see the floors dict).
        books = pq_codebooks_lcg(64, 8, 16)
        ann_recall["knn_ivfpq"] = recall(
            knn_ivfpq(qr, v, 10, 64, books, n_centroids=8, n_probe=4)
        )
        from clinical_vector_search_spark.operators.pq import (
            pq_codebooks_trained,
        )

        # recommended scale configuration after the r8 tuning sweep
        # (m × ksub × probe × residual grid at sf0.1): m=16/ksub=256
        # lifted trained ADC recall 0.18 → 0.54 — essentially the
        # 8-centroid/probe-4 coarse-pruning ceiling (plain trained IVF:
        # 0.56). m=8/ksub=256 gave 0.27; probe 4→6 changed nothing at
        # m=16; residual=True LOWERED it (books are raw-trained — see
        # knn_ivfpq docstring). OPQ-lite was also measured (r8): a full
        # PCA rotation before PQ (0.710 → 0.704 recall@10 at sf0.1,
        # m=16/ksub=256) and PCA + round-robin eigen-dim balancing
        # (→ 0.721). Noise-level deltas both ways — this testdata's
        # embeddings are near-isotropic, so a rotation has no variance
        # imbalance to fix; not wired as a path. On real anisotropic
        # model embeddings the same composition (pca_fit(k=dim) →
        # pca_transform → pq_codebooks_trained) is the OPQ recipe.
        tbooks = pq_codebooks_trained(v, 64, 16, 256, n_iter=5)
        coarse8 = kmeans_centroids(v, 64, n_centroids=8)
        ann_recall["knn_ivfpq_trained"] = recall(
            knn_ivfpq(qr, v, 10, 64, tbooks, n_centroids=8, n_probe=4,
                      centroids=coarse8)
        )
        # two-stage refine at its recommended config (tuned trained
        # codebooks, k_coarse=200, Arrow twins): the exact rescore is
        # bounded by CANDIDATE recall, so codebook quality and coarse
        # width both matter — r7's m=8/ksub=16 books managed 0.61; the
        # tuned books reach 1.0 (accel="pd": the ksub=256 expression
        # encoder would be 16k interpreted terms per row, 33 s vs ~1 s)
        from clinical_vector_search_spark.operators.pq import knn_pq_refine

        ann_recall["knn_pq_refine_trained"] = recall(
            knn_pq_refine(qr, v, tbooks, 10, k_coarse=200, accel="pd")
        )
        # floors: a silent recall collapse in any trained path must
        # fail the bench, not just read low in the sidecar
        for name, floor in floors.items():
            if ann_recall[name] < floor:
                ann_ok = False
                print(
                    f"ANN RECALL FLOOR VIOLATED: {name} "
                    f"{ann_recall[name]} < {floor}",
                    file=sys.stderr,
                )
    except Exception as ex:  # noqa: BLE001
        print(f"ann recall sidecar failed: {ex}", file=sys.stderr)
        ann_ok = False

    total = round(sum(t for t in times.values() if t >= 0), 3)
    total_cold = round(sum(t for t in cold.values() if t >= 0), 3)
    # The driver captures only the LAST ~2000 chars of stdout; r9's
    # one-line JSON grew past that (loadavg_per_family rode along) and
    # BENCH_r09.json lost its warm numbers (parsed: null).  VERDICT r9
    # task 2: keep the headline line compact (<1900 chars — value,
    # warm queries, noisy_host, ann_recall) and move the diagnostics
    # (cold per-family, per-family loadavg, floors) to the sidecar
    # BENCH_DETAIL.json + stderr.
    detail = {
        "metric": "e2e_batch_pipeline",
        "value": total,
        "unit": "sec",
        "queries": times,
        "queries_cold": cold,
        "value_cold": total_cold,
        "sf": sf,
        "host_load": {
            "cpus": n_cpus,
            "loadavg_start": load_start,
            "loadavg_per_family": load_sweeps,
            "foreign_cpus_per_family": foreign_per_family,
            "foreign_cpu_limit": FOREIGN_LIMIT,
            "reps_per_family": reps_per_family,
            "rep_spread_limit": SPREAD_LIMIT,
            "rep_spread_min_delta_sec": SPREAD_MIN_DELTA_SEC,
            "regression_flags": regression_flags,
            "regression_limit": REGRESSION_LIMIT,
            "regression_min_delta_sec": REGRESSION_MIN_DELTA_SEC,
            "regression_history_families": len(_hist),
            "loadavg_end": loadavg(),
            "noisy_host": noisy_host,
            "noisy_families": noisy_families,
            "noisy_retries": noisy_retries,
            "n_sweeps": n_sweeps,
            "timing_order": "per-family isolated best-of-n",
        },
        "ann_recall": ann_recall,
        "ann_recall_floor": floors,
        "ann_recall_ok": ann_ok,
    }
    try:
        detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "BENCH_DETAIL.json")
        with open(detail_path, "w") as fh:
            json.dump(detail, fh, indent=1, sort_keys=True)
        print(f"full diagnostics -> {detail_path}", file=sys.stderr)
    except OSError as ex:
        print(f"BENCH_DETAIL.json write failed: {ex}", file=sys.stderr)
    headline = {
        "metric": "e2e_batch_pipeline",
        "value": total,
        "unit": "sec",
        "queries": times,
        "value_cold": total_cold,
        "sf": sf,
        "noisy_host": noisy_host,
        "noisy_families": noisy_families,
        "ann_recall": ann_recall,
        "ann_recall_ok": ann_ok,
    }
    line = json.dumps(headline, separators=(",", ":"))
    if len(line) > 1900:  # never regress the tail-capture budget again
        print(f"headline {len(line)} chars > 1900; trimming", file=sys.stderr)
        headline.pop("ann_recall", None)
        line = json.dumps(headline, separators=(",", ":"))
    if len(line) > 1900:
        headline["queries"] = {
            k: v for k, v in sorted(times.items(), key=lambda kv: -kv[1])[:20]
        }
        line = json.dumps(headline, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
