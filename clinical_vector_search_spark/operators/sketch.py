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


def histogram(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int,
) -> DataFrame:
    """Exact equi-width histogram of a numeric column — the profiling
    primitive behind distribution dashboards and outlier triage at scale:
    one map-side bucket expression + one groupBy over ≤ ``n_bins`` + 2
    keys (no sort, no sampling, unlike approx quantiles).

    Bins: bin i covers [lo + i·w, lo + (i+1)·w) with w = (hi-lo)/n_bins;
    values below ``lo`` land in bin -1, values ≥ ``hi`` in bin
    ``n_bins`` (explicit overflow bins instead of silent clamping, so a
    bad bound choice is visible in the result). NULLs drop. The bucket
    arithmetic is written in one fixed double-op order so the SQL oracle
    computes bit-identical bins; the in-range branch is clamped to
    ``n_bins - 1`` because for x within one ulp of ``hi`` the double
    division can round (x-lo)/(hi-lo) up to exactly 1.0 — without the
    clamp such an in-range value would land in the overflow bin,
    violating the bin-``n_bins`` ⇔ x ≥ hi contract. Returns
    (bin, bin_lo, bin_hi, n) for non-empty bins.
    """
    if n_bins <= 0 or not hi > lo:
        raise ValueError("need n_bins > 0 and hi > lo")
    x = F.col(value_col).cast("double")
    raw = F.floor((x - F.lit(float(lo))) / F.lit(float(hi - lo)) * F.lit(float(n_bins)))
    b = (
        F.when(x < F.lit(float(lo)), F.lit(-1).cast("long"))
        .when(x >= F.lit(float(hi)), F.lit(n_bins).cast("long"))
        .otherwise(F.least(raw, F.lit(n_bins - 1)).cast("long"))
    )
    w = (hi - lo) / n_bins
    return (
        df.filter(x.isNotNull())
        .groupBy(b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin",
            F.round(F.lit(lo) + F.col("bin") * F.lit(w), 6).alias("bin_lo"),
            F.round(F.lit(lo) + (F.col("bin") + 1) * F.lit(w), 6).alias("bin_hi"),
            "n",
        )
    )


def zscore_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    z: float = 3.0,
    round_dp: int | None = None,
) -> DataFrame:
    """Per-group z-score outlier flagging — the metric-anomaly triage
    primitive: a row is an outlier when |value − group mean| exceeds
    ``z`` group population standard deviations. Appends (_mean, _std,
    is_outlier); NULL values are never outliers, and a constant group
    (std = 0) flags nothing.

    Scale shape: one map-side-combined aggregate to a GROUP-granularity
    stats frame (avg + stddev_pop are single-pass associative partials),
    broadcast back over the events — so the event volume is scanned
    once, shuffled never. This is the two-pass-free analogue of the
    classic "compute stats, re-join" pattern; the stats side is bounded
    by group cardinality, which a grouping worth alerting on always is.

    ``round_dp``: when set, the decision boundary becomes
    round(|v − mean| / std, dp) > z. Different engines accumulate
    avg/stddev in different orders, so a raw float boundary can flip for
    a value within ulps of it — rounding the z-ratio first makes the
    flag cross-engine stable (the oracle-checked contract).
    """
    gcols = list(group_cols)
    stats = df.groupBy(*gcols).agg(
        F.avg(value_col).alias("_mean"),
        F.stddev_pop(value_col).alias("_std"),
    )
    # Null-safe equi-join (<=>): groupBy keeps the NULL group, and a
    # plain `on=group_cols` join would silently DROP those rows (NULL
    # keys never equality-match) — breaking the row-preserving
    # contract. <=> is still a hash-joinable equi-key, so the
    # broadcast-hash shape is unchanged.
    stats = stats.select(
        *[F.col(c).alias(f"_g_{c}") for c in gcols], "_mean", "_std"
    )
    join_cond = F.lit(True)
    for c in gcols:
        join_cond = join_cond & F.col(c).eqNullSafe(F.col(f"_g_{c}"))
    v = F.col(value_col)
    if round_dp is None:
        cond = F.abs(v - F.col("_mean")) > F.lit(float(z)) * F.col("_std")
    else:
        cond = (
            F.round(F.abs(v - F.col("_mean")) / F.col("_std"), round_dp)
            > F.lit(float(z))
        )
    return (
        df.join(F.broadcast(stats), join_cond)
        .drop(*[f"_g_{c}" for c in gcols])
        .withColumn(
            "is_outlier", v.isNotNull() & (F.col("_std") > 0) & cond
        )
    )


def hll_partials(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Per-group HyperLogLog sketch partials (Spark's built-in Apache
    DataSketches ``hll_sketch_agg``): (group..., hll binary). The point
    over exact ``count_distinct`` at 100 TB is MERGEABILITY — partials
    from daily jobs re-aggregate to weekly/monthly uniques via
    :func:`hll_rollup` without touching raw events again, and each
    sketch is ~2^lg_k bytes regardless of cardinality (lg_k=12 ⇒ ±~1.6%
    standard error).

    Engine-specific binary (no DuckDB value oracle by design); the
    accuracy and merge-consistency contracts are pinned by pytest
    instead: estimate within tolerance of exact, and
    union-of-partials == sketch-of-union."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col).cast("string"), F.lit(lg_k)).alias(
            "hll"
        )
    )


def hll_rollup(
    partials: DataFrame,
    rollup_cols: list[str],
    hll_col: str = "hll",
    estimate_col: str = "n_distinct_est",
) -> DataFrame:
    """Re-aggregate sketch partials to a coarser grouping and estimate:
    union the binaries per rollup key (``hll_union_agg`` — associative
    and commutative, so partial aggregation combines map-side like any
    counter) and read the estimate. Raw data is never re-scanned; this
    is the sketch-algebra step a lambda-architecture uniques dashboard
    runs every hour."""
    grouped = (
        partials.groupBy(*rollup_cols).agg(
            F.hll_union_agg(F.col(hll_col)).alias("_u")
        )
        if rollup_cols
        else partials.agg(F.hll_union_agg(F.col(hll_col)).alias("_u"))
    )
    return grouped.select(
        *rollup_cols, F.hll_sketch_estimate("_u").alias(estimate_col)
    )


def psi_drift(
    base: DataFrame,
    current: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric
    column — the drift gate a training-data pipeline runs before
    retraining: psi = Σ (p_cur − p_base)·ln(p_cur / p_base) over shared
    histogram bins (the :func:`histogram` binning, including the
    explicit overflow bins, so out-of-range drift is VISIBLE as mass in
    bins -1/n_bins rather than silently clamped). Empty-bin fractions
    are floored at ``eps`` — the standard PSI smoothing; it keeps the
    ln finite and makes appear/disappear drift large-but-bounded.

    Returns one row per bin (bin, p_base, p_cur, psi_term rounded 6dp)
    plus the conventional read: psi < 0.1 stable, 0.1–0.25 moderate,
    > 0.25 drifted — the caller sums psi_term (kept per-bin so the
    report shows WHERE the drift lives).

    Scale shape: two independent map-side histogram aggregates (each ≤
    n_bins+2 rows), one tiny full-outer join on bin — the raw tables
    are scanned once each and never joined row-to-row."""
    hb = histogram(base, value_col, lo, hi, n_bins).select(
        "bin", F.col("n").alias("n_base")
    )
    hc = histogram(current, value_col, lo, hi, n_bins).select(
        "bin", F.col("n").alias("n_cur")
    )
    tb = base.filter(F.col(value_col).isNotNull()).count()
    tc = current.filter(F.col(value_col).isNotNull()).count()
    if tb == 0 or tc == 0:
        raise ValueError("both snapshots need non-null rows for PSI")
    joined = hb.join(hc, "bin", "full_outer")
    p_base = F.greatest(
        F.coalesce("n_base", F.lit(0)) / F.lit(float(tb)), F.lit(eps)
    )
    p_cur = F.greatest(
        F.coalesce("n_cur", F.lit(0)) / F.lit(float(tc)), F.lit(eps)
    )
    return joined.select(
        "bin",
        F.round(p_base, 6).alias("p_base"),
        F.round(p_cur, 6).alias("p_cur"),
        F.round((p_cur - p_base) * F.log(p_cur / p_base), 6).alias(
            "psi_term"
        ),
    )


# Poisson(1) inverse-CDF thresholds (cumulative pmf), capped at 5 — the
# cap truncates < 0.4% of the mass and keeps the ladder finite. Shared
# verbatim (Python float repr) with the SQL oracle so both engines draw
# IDENTICAL weights from the same md5 uniforms.
POISSON1_CUM = (
    0.36787944117144233,  # P(X<=0)
    0.7357588823428847,
    0.9196986029286055,
    0.9810118431238462,
    0.9963401531726563,
)


def poisson_bootstrap_ci(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    n_replicas: int = 50,
    id_col: str = "event_id",
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Bootstrap confidence interval for the per-group mean in ONE pass —
    the Poisson bootstrap: resampling-with-replacement's per-row count
    for a replica is Binomial(n, 1/n) ≈ Poisson(1), which needs no
    global coordination, so each row independently draws its weight for
    every replica from a seeded hash (md5(replica:id) → uniform →
    inverse CDF). That is what makes the bootstrap distributable: the
    classic resample loop reads the data B times; this reads it once
    and fans out B weights map-side.

    Deterministic end to end (hash uniforms, shared threshold ladder,
    replica means rounded to 6 before the percentile — the house
    rounded-before-rank rule), so the full CI is oracle-checkable.

    Output: (group_cols..., n_rows, mean, ci_lo, ci_hi) with the CI =
    [lo, hi] percentiles (linear interpolation) of the replica means.
    """
    u = H.md5_long(
        F.concat_ws(
            ":", F.col("_b").cast("string"), F.col(id_col).cast("string")
        )
    ) / F.lit(float(1 << 60))
    w = F.lit(5)
    for k in range(len(POISSON1_CUM) - 1, -1, -1):
        w = F.when(u < F.lit(POISSON1_CUM[k]), F.lit(k)).otherwise(w)
    fanned = df.select(
        *group_cols,
        F.col(id_col),
        F.col(value_col).alias("_v"),
        F.explode(
            F.sequence(F.lit(0), F.lit(int(n_replicas) - 1))
        ).alias("_b"),
    ).select(*group_cols, "_b", "_v", w.alias("_w"))
    # all-zero-weight replicas (probability 0.37^n — impossible for any
    # real group, reachable in toy tests) are excluded rather than
    # divided: engines disagree on 0/0 (null vs nan)
    rep = (
        fanned.groupBy(*group_cols, "_b")
        .agg(
            F.sum(F.col("_w") * F.col("_v")).alias("_s"),
            F.sum("_w").alias("_sw"),
        )
        .filter(F.col("_sw") > 0)
        .select(
            *group_cols,
            F.round(F.col("_s") / F.col("_sw"), 6).alias("_rm"),
        )
    )
    cis = rep.groupBy(*group_cols).agg(
        F.round(
            F.expr(f"percentile(_rm, {lo!r})"), 6
        ).alias("ci_lo"),
        F.round(
            F.expr(f"percentile(_rm, {hi!r})"), 6
        ).alias("ci_hi"),
    )
    base = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.avg(value_col), 6).alias("mean"),
    )
    return base.join(cis, group_cols).select(
        *group_cols, "n_rows", "mean", "ci_lo", "ci_hi"
    )


def mad_outliers(
    events: DataFrame,
    value_col: str = "value",
    group_cols: list[str] | None = None,
    k: float = 3.0,
) -> DataFrame:
    """Robust outlier flagging by median absolute deviation — the
    median/MAD twin of :func:`zscore_outliers` for the case z-scores
    silently fail: mean and stddev are themselves dragged by the
    outliers they are supposed to expose (one 10⁶× spike inflates σ
    until nothing else flags), while the median breaks down only past
    50% contamination.

    Flags rows with |v − median| > k · 1.4826 · MAD (1.4826 scales MAD
    to σ under normality, so ``k`` reads like a z-threshold). Two
    group-granularity aggregations (median, then MAD of residuals) and
    one join back — the exact-percentile form mirrored by the oracle;
    at 100 TB swap ``percentile`` for ``percentile_approx`` the same
    way events_quantiles twins do. Zero-MAD groups (≥50% identical
    values) flag only exact deviants (any |v−med| > 0).

    Output: per-group (group_cols..., n_rows, med, mad, n_outliers).
    """
    group_cols = group_cols or ["event_type"]
    med = events.groupBy(*group_cols).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("_med")
    )
    with_med = events.join(med, group_cols)
    mad = with_med.groupBy(*group_cols).agg(
        F.expr(f"percentile(abs({value_col} - _med), 0.5)").alias("_mad")
    )
    joined = with_med.join(mad, group_cols)
    dev = F.abs(F.col(value_col) - F.col("_med"))
    # rounded-before-compare boundary (same contract as zscore_outliers'
    # round_dp): the exact medians may differ by an interpolation ulp
    # across engines, and a raw float compare could flip a row sitting
    # on the threshold
    is_out = F.when(
        F.col("_mad") > 0,
        F.round(dev / (F.lit(1.4826) * F.col("_mad")), 6) > F.lit(float(k)),
    ).otherwise(dev > 0)
    return (
        joined.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.first("_med"), 6).alias("med"),
            F.round(F.first("_mad"), 6).alias("mad"),
            F.sum(is_out.cast("long")).alias("n_outliers"),
        )
    )


# --- deterministic (md5-derived) HyperLogLog -------------------------------
# The built-in hll_sketch_agg above is the production path but its binary
# is engine-specific (rows-only checkable). This variant derives buckets
# and leading-zero ranks from md5 arithmetic, so registers, estimates, and
# set-algebra (union via per-bucket max) are bit-identical in any engine
# with md5 + integer ops — the cross-engine-auditable sketch.

HLL_P = 12  # 2^12 = 4096 registers; md5_long leaves 48 rank bits


def hll_md5_registers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Per-group deterministic HLL registers: (group..., bucket, m) with
    m = max over values of rho(value), rho = leading-zero count + 1 of
    the 48-bit hash window. bucket = low 12 bits of md5_long; the rank
    window is the remaining 48 bits, its bit-length read off the binary
    string (integer-exact, no float log2). Registers are mergeable by
    per-bucket max — the HLL union identity.

    Scale shape: one (group, bucket)-granularity agg — ≤ 4096 rows per
    group regardless of cardinality, map-side combinable.
    """
    from clinical_vector_search_spark.functions.hashing import md5_long

    m = 1 << HLL_P
    h = md5_long(F.col(value_col).cast("string"))
    bucket = (h % m).cast("long")
    w = F.shiftright(h, HLL_P)  # 48 usable bits
    # bit length via binary-string length: floor(log2(w)) + 1, exact
    rho = F.when(w == 0, F.lit(48 + 1)).otherwise(
        F.lit(48) - F.length(F.conv(w, 10, 2)) + 1
    )
    return (
        df.select(*group_cols, bucket.alias("bucket"), rho.alias("_rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("_rho").cast("long").alias("m"))
    )


def hll_md5_estimate(
    registers: DataFrame,
    group_cols: list[str],
) -> DataFrame:
    """Cardinality estimate from deterministic registers (Flajolet et al.
    2007, with the small-range linear-counting correction): per group,
        S = Σ_j 2^-M_j  (absent buckets count as 2^0 = 1),
        E = α_m·m²/S;  if E ≤ 2.5m and zeros Z > 0: E = m·ln(m/Z).
    Estimates rounded to 4 decimals (double transcendentals are the only
    cross-engine risk; round-before-compare).
    """
    m = 1 << HLL_P
    alpha = 0.7213 / (1.0 + 1.079 / m)
    per = registers.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("_v"),
        F.sum(F.pow(F.lit(2.0), -F.col("m"))).alias("_s_present"),
    )
    s = F.col("_s_present") + (F.lit(m) - F.col("_v"))
    e_raw = F.lit(alpha * m * m) / s
    zeros = F.lit(m) - F.col("_v")
    e = F.when(
        (e_raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(e_raw)
    return per.select(
        *group_cols, F.round(e, 4).alias("n_distinct_est")
    )


def hll_overlap(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Pairwise distinct-overlap estimates via sketch algebra:
    |A∩B| ≈ est(A) + est(B) − est(A∪B), where the union sketch is the
    per-bucket MAX of the two register sets (exact HLL union — sketches
    never touch raw data again). Returns the calibration table against
    the exact overlap so the estimator's error is measurable:
    (grp_a, grp_b, exact_a, exact_b, exact_overlap, est_overlap,
    abs_err).

    Scale shape: registers are ≤ 4096 rows per group, so the pair join
    runs at |groups|²·4096 granularity — independent of corpus size; the
    exact side (for calibration only) is one (value, grp) dedup plus a
    value-key self-join.
    """
    regs = hll_md5_registers(df, [group_col], value_col).withColumnRenamed(
        group_col, "grp"
    )
    est = hll_md5_estimate(regs, ["grp"])
    ra = regs.select(
        F.col("grp").alias("grp_a"), "bucket", F.col("m").alias("ma")
    )
    rb = regs.select(
        F.col("grp").alias("grp_b"), "bucket", F.col("m").alias("mb")
    )
    pairs = (
        regs.select("grp").distinct().alias("ga")
        .crossJoin(regs.select("grp").distinct().alias("gb"))
        .select(
            F.col("ga.grp").alias("grp_a"), F.col("gb.grp").alias("grp_b")
        )
        .filter(F.col("grp_a") < F.col("grp_b"))
    )
    # a per-pair full-outer register join is awkward relationally;
    # union-all then per-bucket max is the clean mergeable spelling
    u = (
        pairs.join(ra, "grp_a")
        .select("grp_a", "grp_b", "bucket", F.col("ma").alias("m"))
        .unionAll(
            pairs.join(rb, "grp_b").select(
                "grp_a", "grp_b", "bucket", F.col("mb").alias("m")
            )
        )
        .groupBy("grp_a", "grp_b", "bucket")
        .agg(F.max("m").alias("m"))
    )
    est_u = hll_md5_estimate(u, ["grp_a", "grp_b"]).withColumnRenamed(
        "n_distinct_est", "est_union"
    )
    ea = est.select(
        F.col("grp").alias("grp_a"), F.col("n_distinct_est").alias("est_a")
    )
    eb = est.select(
        F.col("grp").alias("grp_b"), F.col("n_distinct_est").alias("est_b")
    )
    # exact overlap for calibration
    dv = df.select(
        F.col(group_col).alias("grp"), F.col(value_col).alias("v")
    ).distinct()
    xa = dv.select(F.col("grp").alias("grp_a"), "v")
    xb = dv.select(F.col("grp").alias("grp_b"), "v")
    exact = (
        xa.join(xb, "v")
        .filter(F.col("grp_a") < F.col("grp_b"))
        .groupBy("grp_a", "grp_b")
        .agg(F.count("*").cast("long").alias("exact_overlap"))
    )
    ex_sizes = dv.groupBy("grp").agg(F.count("*").cast("long").alias("n"))
    exa = ex_sizes.select(
        F.col("grp").alias("grp_a"), F.col("n").alias("exact_a")
    )
    exb = ex_sizes.select(
        F.col("grp").alias("grp_b"), F.col("n").alias("exact_b")
    )
    return (
        est_u.join(F.broadcast(ea), "grp_a")
        .join(F.broadcast(eb), "grp_b")
        .join(F.broadcast(exact), ["grp_a", "grp_b"], "left")
        .join(F.broadcast(exa), "grp_a")
        .join(F.broadcast(exb), "grp_b")
        .select(
            "grp_a",
            "grp_b",
            "exact_a",
            "exact_b",
            F.coalesce(F.col("exact_overlap"), F.lit(0)).alias(
                "exact_overlap"
            ),
            F.round(
                F.col("est_a") + F.col("est_b") - F.col("est_union"), 4
            ).alias("est_overlap"),
            F.round(
                F.abs(
                    F.col("est_a")
                    + F.col("est_b")
                    - F.col("est_union")
                    - F.coalesce(F.col("exact_overlap"), F.lit(0))
                ),
                4,
            ).alias("abs_err"),
        )
    )
