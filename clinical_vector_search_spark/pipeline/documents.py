"""Document load / clean / dedup pipeline (SURVEY.md §2.2, §3.1 steps 3).

Reproduces the reference's only true Spark stage (src/pipeline/pipeline.py:
26-67): CSV scan with multiLine+escape → header lower-casing → strict
column check → project/rename → cast → clean_text → null-drop → specialty
concat → text dedup. Difference by design: the reference crosses to pandas
at pipeline.py:56 and continues single-node; here the whole pipeline stays
a distributed DataFrame plan with stable explicit doc ids (row_number over
a deterministic order) instead of pandas positional ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clinical_vector_search_spark.functions import hashing as H
from clinical_vector_search_spark.functions import text as TXT

# canonical column mapping (reference pipeline.py:36-46)
MTSAMPLES_COLUMNS = {
    "name": "name",
    "gender": "gender",
    "age": "age",
    "city": "city",
    "medical_specialty": "medical_specialty",
    "transcription": "text",
}


def read_csv(spark: SparkSession, path: str) -> DataFrame:
    """S1: header CSV with quoted multi-line fields (pipeline.py:26-29)."""
    return spark.read.csv(path, header=True, multiLine=True, escape='"')


def normalize_headers(df: DataFrame) -> DataFrame:
    """P7 (pipeline.py:33)."""
    return df.toDF(*[c.lower() for c in df.columns])


def require_columns(df: DataFrame, required: list[str]) -> DataFrame:
    """Strict schema check — fail fast like evaluation.py:97-114."""
    missing = [c for c in required if c not in df.columns]
    if missing:
        raise ValueError(
            f"missing required columns: {missing}; have {df.columns}"
        )
    return df


def clean_documents(
    df: DataFrame,
    text_col: str = "text",
    specialty_col: str | None = None,
    id_col: str | None = None,
) -> DataFrame:
    """P2–P6: cast, clean, null-drop, optional specialty concat, dedup.

    If ``id_col`` is None a stable ``doc_id`` is minted as md5_long(text) —
    a deterministic content-derived id (60-bit hash; collisions are
    vanishingly unlikely and collide only equal-hash texts, which dedup
    merges anyway). No global window: an unpartitioned
    ``row_number() over (order by ...)`` funnels the whole corpus through
    ONE partition — the canonical scale-killer at 100 TB.

    Dedup partitions its window by md5(text) (16-byte shuffle key), never
    by the full document body.
    """
    out = df.withColumn(text_col, F.col(text_col).cast("string"))
    out = out.withColumn(text_col, TXT.clean_text(F.col(text_col)))
    out = out.na.drop(subset=[text_col])
    if specialty_col is not None:
        out = out.withColumn(
            text_col, TXT.specialty_concat(specialty_col, text_col)
        )
    if id_col is None:
        out = out.withColumn("doc_id", H.md5_long(F.col(text_col)))
        id_col = "doc_id"
    # dedup keeping min id — deterministic survivor, hash-keyed shuffle
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    out = (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return out


def _hash_bucket(id_col: str) -> F.Column:
    """Uniform bucket in [0, 2³²) from the first 8 hex digits of md5(id) —
    the shared sampling key; the DuckDB oracles replicate this expression
    bit-for-bit, so every sampler must use THIS helper, never a copy."""
    return F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("long")


def hash_sample(
    df: DataFrame, rate: float, id_col: str = "doc_id"
) -> DataFrame:
    """P8 at scale: deterministic Bernoulli sample — keep a row iff the
    first 8 hex digits of md5(id) fall below rate·2³².

    Unlike the reference's seeded pandas sample (pipeline_mode.py:129-130)
    or an ORDER BY id LIMIT n (a global sort), this is a pure map-side
    filter: no shuffle, no driver state, stable under repartitioning and
    re-runs, and the SAME rows are kept in any engine that has md5 —
    which is what makes it oracle-checkable and what makes sampled
    pipelines reproducible at 100 TB."""
    threshold = int(rate * (1 << 32))
    return df.filter(_hash_bucket(id_col) < F.lit(threshold))


def load_mtsamples(spark: SparkSession, path: str) -> DataFrame:
    """Full reference load path (pipeline.py:26-67) as one declarative plan."""
    df = normalize_headers(read_csv(spark, path))
    require_columns(df, list(MTSAMPLES_COLUMNS))
    df = df.select(
        *[F.col(src).alias(dst) for src, dst in MTSAMPLES_COLUMNS.items()]
    )
    return clean_documents(df, specialty_col="medical_specialty")


def stratified_hash_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the training-data mixing
    primitive (e.g. keep 100% of books, 10% of common-crawl): each stratum
    gets its own md5 threshold, so this is ``hash_sample`` with a
    per-stratum rate. Same properties: pure map-side filter, no shuffle,
    reproducible across engines/re-runs/repartitioning (unlike
    ``DataFrame.sampleBy``, whose seeded sample depends on partitioning).
    Strata absent from ``fractions`` keep ``default_rate``."""
    bucket = _hash_bucket(id_col)
    thr = F.lit(int(default_rate * (1 << 32)))
    for value, rate in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == value, F.lit(int(rate * (1 << 32)))
        ).otherwise(thr)
    return df.filter(bucket < thr)


def mixture_sample(
    df: DataFrame,
    targets: dict[str, float],
    total_n: int,
    strata_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rebalance a corpus to target domain proportions — the data-mixing
    step of a training pipeline ("books 50%, web 30%, code 20%"): the
    per-domain keep-rate ``min(1, total_n · target_d / n_d)`` is derived
    from the OBSERVED domain counts (one map-side-combined agg; #domains
    rows to the driver — bounded like the k-means partials), then applied
    as :func:`stratified_hash_sample`'s deterministic md5-threshold
    filter — map-side, shuffle-free on the data path, reproducible across
    engines/re-runs/partitionings.

    Domains absent from ``targets`` are dropped (rate 0). Scarce domains
    cap at keeping 100% — the availability limit (no upsampling; callers
    wanting replication handle that separately). Expected output size is
    ``≈ total_n`` when every domain has enough rows.
    """
    counts = {
        r[strata_col]: r["n"]
        for r in df.groupBy(strata_col).agg(F.count("*").alias("n")).collect()
    }
    fractions = {}
    for dom, frac in targets.items():
        n_d = counts.get(dom, 0)
        if n_d:
            fractions[dom] = min(1.0, total_n * frac / n_d)
    return stratified_hash_sample(
        df, fractions, strata_col, id_col, default_rate=0.0
    )


def weighted_hash_sample(
    df: DataFrame,
    n: int,
    weight_col: str,
    id_col: str = "doc_id",
    round_to: int | None = None,
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirtakis A-Res):
    each row gets priority u^(1/w) with u a deterministic md5-uniform of
    its id, and the global top-``n`` priorities win — rows are selected
    with probability proportional to ``weight_col`` (the quality-weighted
    corpus selection step: sample harder from high-quality sources).

    Ranks on the LOG-priority ln(u)/w, which orders identically to
    u^(1/w) for positive weights but never underflows: pow(u, 1/w)
    flushes to exactly 0.0 for small weights (w ≲ 0.01), which would let
    tiny-but-positive weights tie with excluded zero-weight rows.
    ln(u)/w stays finite down to w ≈ 2.3e-307. Non-positive weights get
    -infinity, so they never win while any positive-weight row remains.

    Deterministic (same rows on every run/engine/partitioning, like
    hash_sample), one pass + a top-n (Spark's sort-limit is a distributed
    TakeOrdered — no full global sort materializes). ``round_to`` rounds
    the log-priority before ranking — the cross-engine determinism knob
    for the DuckDB oracle (a 1-ulp ln() difference between libm builds
    cannot flip the selected set once both sides round)."""
    from clinical_vector_search_spark.functions import hashing as H

    # u in (0, 1): 60-bit md5 fraction, offset so u is never exactly 0
    u = (H.md5_long(F.col(id_col).cast("string")) + F.lit(1.0)) / F.lit(
        float((1 << 60) + 1)
    )
    w = F.col(weight_col).cast("double")
    logpri = F.when(w > 0, F.log(u) / w).otherwise(F.lit(float("-inf")))
    if round_to is not None:
        logpri = F.round(logpri, round_to)
    return (
        df.withColumn("_pri", logpri)
        .orderBy(F.desc("_pri"), F.asc(id_col))
        .limit(n)
        .drop("_pri")
    )


def split_assign(
    df: DataFrame,
    splits: list[tuple[str, float]],
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: append a ``split`` column
    by cutting the salted md5 bucket of the id at cumulative-fraction
    thresholds. ``splits`` = [(name, fraction), ...], fractions summing
    to ~1 (the last split absorbs rounding).

    Why not ``randomSplit``: its assignment depends on partitioning,
    sampling seed plumbing, and re-runs — a doc can hop splits between
    jobs, which leaks eval data into training. This is a pure map-side
    expression on md5(salt:id): stable under repartitioning, cluster
    size, engine (oracle-checkable), and time; changing ``salt`` draws a
    fresh independent split. Disjoint and exhaustive by construction.
    """
    fracs = [f for _, f in splits]
    if min(fracs) < 0 or abs(sum(fracs) - 1.0) > 1e-6:
        raise ValueError("split fractions must be >= 0 and sum to 1")
    bucket = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    acc = 0.0
    expr = None
    for name, frac in splits[:-1]:
        acc += frac
        cond = bucket < F.lit(int(acc * (1 << 32)))
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    last = F.lit(splits[-1][0])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", out)


# ---------------------------------------------------------------------------
# Prep-pipeline rule set (shared by the pipeline and its audit trail)
# ---------------------------------------------------------------------------
# The survivor pipeline (q_doc_prep_pipeline) and the per-doc audit
# trail (q_doc_filter_audit) MUST agree on every rule fragment — a
# governance review reading "why was this doc dropped?" against a
# pipeline applying subtly different thresholds would be worse than no
# audit. One builder defines the fragments; both entries compose from
# it, so drift is structurally impossible.

PREP_LANG = "en"
PREP_MIN_QUALITY = 0.6
# the first-failing-rule order the audit reports; the pipeline applies
# the same rules as successive filters in this order
PREP_RULE_ORDER = ("lang", "quality", "duplicate", "contaminated")


def prep_scored(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, ctext, quality): the cleaned+scored base both the
    pipeline and the audit start from. quality is rounded to 6dp HERE so
    the filter threshold and the audited value are the same number."""
    return docs.select(
        "doc_id", "lang", TXT.clean_text("text").alias("ctext")
    ).withColumn("quality", F.round(TXT.quality_score("ctext"), 6))


def prep_rule_lang() -> F.Column:
    return F.col("lang") == PREP_LANG


def prep_rule_quality() -> F.Column:
    return F.col("quality") >= PREP_MIN_QUALITY


def prep_passing(scored: DataFrame) -> DataFrame:
    """Docs surviving the row-local rules (lang, quality) — the
    population the dedup stage runs over."""
    return scored.filter(prep_rule_lang() & prep_rule_quality())


def prep_dedup_keep(passing: DataFrame) -> DataFrame:
    """Pipeline-shape exact dedup: ONE md5-key shuffle keeping the
    min-doc_id row per group (ctext identical within a group, so
    min-aggregation == winner-row selection)."""
    return passing.groupBy(F.md5("ctext").alias("_h")).agg(
        F.min("doc_id").alias("doc_id"),
        F.min("ctext").alias("ctext"),
        F.min("quality").alias("quality"),
    )


def prep_dup_losers(passing: DataFrame) -> DataFrame:
    """Audit-shape exact dedup: (doc_id, is_dup) for every passing doc —
    same md5 key and min-doc_id winner rule as prep_dedup_keep."""
    winners = passing.groupBy(F.md5("ctext").alias("_h")).agg(
        F.min("doc_id").alias("_keep_id")
    )
    return (
        passing.select("doc_id", F.md5("ctext").alias("_h"))
        .join(winners, "_h")
        .select(
            "doc_id", (F.col("doc_id") != F.col("_keep_id")).alias("is_dup")
        )
    )


def prep_bench_grams(
    scored: DataFrame, bench_max_id: int, ngram: int
) -> DataFrame:
    """Distinct benchmark shingles (the held-out set is doc_id <
    bench_max_id), over CLEANED text — the one definition of what
    'contaminating n-gram' means."""
    return (
        scored.filter(F.col("doc_id") < bench_max_id)
        .select(
            F.explode(TXT.shingles(TXT.tokenize("ctext"), ngram)).alias("g")
        )
        .distinct()
    )


def prep_contaminated_ids(
    frame: DataFrame, bench_grams: DataFrame, ngram: int,
    probe_partitions: int | None = None,
) -> DataFrame:
    """doc_ids of frame rows sharing >= 1 n-gram with the benchmark
    (broadcast the gram set). ``frame`` differs by caller on purpose:
    the pipeline decontaminates the DEDUPED survivors (cheaper), the
    audit flags every scored doc (labels must exist for all).

    ``probe_partitions`` re-spreads ``frame`` before the shingle
    generator: the probe's cost is dominated by the explode fan-out
    (~tokens per doc), which AQE's bytes-based partition coalescing
    cannot see — a post-dedup frame whose BYTES fit one advisory
    partition still carries the whole corpus's shingling CPU, so the
    probe runs single-threaded (r15 measured the composed prep
    pipeline 3.27 s → 1.33 s at sf0.1 from this one respread). Pass
    the session's parallelism when the input frame is narrower than
    the cluster (small-sf benches, daily-batch serving); leave None
    when the frame is already corpus-wide — the respread would be a
    pointless extra shuffle of the text payload."""
    if probe_partitions:
        frame = frame.repartition(probe_partitions, "doc_id")
    grams = frame.select(
        "doc_id",
        F.explode(TXT.shingles(TXT.tokenize("ctext"), ngram)).alias("g"),
    )
    return (
        grams.join(F.broadcast(bench_grams), "g").select("doc_id").distinct()
    )


def prep_decision() -> F.Column:
    """The audit's first-failing-rule column, in PREP_RULE_ORDER, over
    the flag columns (lang, quality, is_dup, is_contam)."""
    return (
        F.when(~prep_rule_lang(), F.lit("lang"))
        .when(~prep_rule_quality(), F.lit("quality"))
        .when(F.coalesce("is_dup", F.lit(False)), F.lit("duplicate"))
        .when(F.coalesce("is_contam", F.lit(False)), F.lit("contaminated"))
        .otherwise(F.lit("keep"))
    )


def domain_temperature_weights(
    df: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-scaled domain mixture weights (the mT5/UNIMAX
    multilingual-sampling rule): ``p_d ∝ n_tokens_d ^ alpha``, flattening
    the natural distribution toward uniform as alpha → 0 so low-resource
    domains are not drowned at training time. The derived weights are the
    principled input to :func:`mixture_sample`'s targets.

    Output per domain: ``n_docs``, ``n_tokens`` (BM25 whitespace
    tokenizer — one corpus pass, map-side combined), raw ``mix_weight``
    ``p_d``, and ``effective_epochs`` — how many times the domain's own
    tokens are (re)seen under a one-total-epoch token budget
    (``p_d · T / n_tokens_d``; > 1 means upsampling/repetition).

    Scale shape: ONE corpus-sized aggregation; the normalizing window
    then runs over #domains post-agg rows (bounded like the k-means
    partials), never the corpus. ``alpha=0.5`` is spelled ``sqrt`` —
    IEEE-754 correctly rounded in every engine, so the oracle is
    bit-identical; other alphas use ``pow`` (cross-engine last-ulp
    caveat documented here rather than hidden).
    """
    per = df.groupBy(domain_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(TXT.tokenize(text_col))).alias("n_tokens"),
    )
    nt = F.col("n_tokens").cast("double")
    w_raw = F.sqrt(nt) if alpha == 0.5 else F.pow(nt, F.lit(float(alpha)))
    per = per.withColumn("w_raw", w_raw)
    tot = Window.partitionBy()
    p = F.col("w_raw") / F.sum("w_raw").over(tot)
    total_tokens = F.sum("n_tokens").over(tot).cast("double")
    return per.select(
        F.col(domain_col),
        "n_docs",
        "n_tokens",
        p.alias("mix_weight"),
        (p * total_tokens / F.col("n_tokens")).alias("effective_epochs"),
    )
