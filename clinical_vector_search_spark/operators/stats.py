"""Classical statistics over event/fact tables, each expressed as ONE
aggregation pass over the big table plus window math at summary
granularity — the shapes that survive a 1000-executor 100 TB run:

- ``kaplan_meier``: survival curve over user lifetimes (right-censored).
  One user-key shuffle, then all KM math at distinct-lifetime
  granularity (≤ observation-span-in-days rows).
- ``acf_daily``: autocorrelation of the daily count series at lags
  1..k. The fact table is reduced to day granularity first; the lag
  self-join touches only the tiny day series.
- ``ab_test_proportions``: two-proportion z-test with Wilson intervals
  over an md5-hash variant split — per-user agg, then one row.
- ``ols_normal``: multiple linear regression by normal equations with
  EXACT integer moments. The single agg pass emits BIGINT sums of
  products, bit-identical across engines (no float summation-order
  drift); the 3×3 Cramer solve happens on those exact moments.
- ``benford_digits``: first-significant-digit distribution vs Benford's
  law with per-digit chi-square contributions — a data-quality audit.
- ``woe_iv``: weight-of-evidence / information-value of a numeric
  feature vs a binary label over ntile bins (total-ordered so both
  engines bin identically).

Extends the reference's evaluation surface (reference
src/pipeline/evaluation.py computes batch metrics driver-side); here
every statistic is a distributed aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kaplan_meier(
    events: DataFrame,
    user_col: str = "user_id",
    ts_ns_col: str = "ts_ns",
    unit_ns: int = 3_600_000_000_000,
    censor_horizon_units: int = 72,
) -> DataFrame:
    """Kaplan-Meier survival estimate over user lifetimes.

    Lifetime = elapsed whole units (default: hours) between a user's
    first and last event, computed by EXACT integer floor-division on
    epoch-ns longs — not calendar boundary-crossing counts, whose
    semantics differ across engines. A user whose last event falls
    within ``censor_horizon_units`` of the corpus max timestamp is
    right-censored (still alive at observation end), else a death. For
    each distinct lifetime t (ascending): n_at_risk = users with
    lifetime >= t, deaths/censored at t, and
    S(t) = prod_{t' <= t} (1 - d/n) computed as exp(sum(ln(...))) so it
    is a window cumsum, not a sequential loop. Survival rounded to 6dp
    (repo rounding convention for ln/exp cross-engine drift).

    Scale shape: one user-key shuffle for the per-user agg; everything
    after runs at distinct-lifetime granularity (bounded by the
    observation span in units, thousands of rows at most).
    """
    span = F.max(ts_ns_col) - F.min(ts_ns_col)
    # exact floor-div: (d - d % u) / u — the quotient is an exact
    # integer of two exactly-representable doubles, so the correctly-
    # rounded IEEE division cannot drift
    per_user = events.groupBy(user_col).agg(
        ((span - F.pmod(span, F.lit(unit_ns))) / F.lit(unit_ns))
        .cast("long")
        .alias("lifetime"),
        F.max(ts_ns_col).alias("last_ns"),
    )
    max_ts = events.select(F.max(ts_ns_col).alias("corpus_max_ns"))
    flagged = per_user.crossJoin(F.broadcast(max_ts)).select(
        "lifetime",
        F.when(
            F.col("corpus_max_ns") - F.col("last_ns")
            < F.lit(censor_horizon_units * unit_ns),
            F.lit(0),
        )
        .otherwise(F.lit(1))
        .alias("death"),
    )
    by_t = flagged.groupBy(F.col("lifetime").alias("t")).agg(
        F.sum("death").alias("deaths"),
        F.sum(F.lit(1) - F.col("death")).alias("censored"),
        F.count(F.lit(1)).alias("ending"),
    )
    w = Window.orderBy("t")
    # at risk at t = everyone whose lifetime >= t
    #            = total - (all who ended strictly before t)
    at_risk = by_t.withColumn(
        "n_at_risk",
        F.sum("ending").over(
            w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        ),
    )
    surv = at_risk.withColumn(
        "survival",
        F.round(
            F.exp(
                F.sum(
                    F.log(
                        F.lit(1.0)
                        - F.col("deaths").cast("double")
                        / F.col("n_at_risk").cast("double")
                    )
                ).over(w.rowsBetween(Window.unboundedPreceding, 0))
            ),
            6,
        ),
    )
    return surv.select(
        "t", "n_at_risk", "deaths", "censored", "survival"
    )


def acf_daily(
    events: DataFrame,
    max_lag: int = 10,
    ts_col: str = "ts",
) -> DataFrame:
    """Autocorrelation of the daily event-count series at lags
    1..max_lag: r_k = Pearson corr(y_t, y_{t-k}) over the overlapping
    support. The fact table collapses to one row per day (the only big
    shuffle); the lag alignment is a self-join of that tiny series
    against a k-row lag frame, so cost is O(days × max_lag) regardless
    of fact-table size. corr rounded to 6dp.
    """
    spark = events.sparkSession
    daily = events.groupBy(F.to_date(ts_col).alias("day")).agg(
        F.count(F.lit(1)).alias("y")
    )
    base = daily.select(
        F.datediff(
            "day",
            F.min("day").over(
                Window.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        ).alias("idx"),
        "y",
    )
    lags = spark.range(1, max_lag + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = base.alias("a")
    b = base.alias("b")
    pairs = F.broadcast(lags).join(
        a, on=F.lit(True), how="inner"
    ).join(
        b,
        on=F.col("a.idx") == F.col("b.idx") + F.col("lag"),
        how="inner",
    )
    return (
        pairs.groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.corr(F.col("a.y"), F.col("b.y")), 6).alias("acf"),
        )
        .orderBy("lag")
    )


def ab_test_proportions(
    events: DataFrame,
    user_col: str = "user_id",
    success_type: str = "purchase",
    type_col: str = "event_type",
) -> DataFrame:
    """Two-proportion z-test over an md5-hash variant split (the repo's
    deterministic sampling convention, pipeline/documents.py
    hash_sample): variant = first md5 hex nibble of the user id, odd →
    B. Success = user emitted >= 1 ``success_type`` event. Emits ONE
    row: per-variant n / conversions / rate, the pooled rate, the
    z statistic, and Wilson 95% bounds per variant — every statistic a
    closed form of the four counts, rounded to 6dp.

    Scale shape: per-user agg (one user-key shuffle), then a 2-row →
    1-row agg. No floats until the counts are final.
    """
    per_user = events.groupBy(user_col).agg(
        F.max(
            F.when(F.col(type_col) == success_type, 1).otherwise(0)
        ).alias("converted")
    )
    assigned = per_user.select(
        (
            F.conv(
                F.substring(F.md5(F.col(user_col).cast("string")), 1, 1),
                16,
                10,
            ).cast("int")
            % 2
        ).alias("variant"),
        "converted",
    )
    counts = assigned.groupBy().agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(
            F.when(F.col("variant") == 0, F.col("converted")).otherwise(0)
        ).alias("conv_a"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(
            F.when(F.col("variant") == 1, F.col("converted")).otherwise(0)
        ).alias("conv_b"),
    )
    p_a = F.col("conv_a") / F.col("n_a")
    p_b = F.col("conv_b") / F.col("n_b")
    pool = (F.col("conv_a") + F.col("conv_b")) / (
        F.col("n_a") + F.col("n_b")
    )
    se = F.sqrt(
        pool * (F.lit(1.0) - pool) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    )

    def wilson(p, n, hi: bool):
        z = F.lit(1.959963984540054)  # Phi^{-1}(0.975)
        center = p + z * z / (2 * n)
        margin = z * F.sqrt(p * (F.lit(1.0) - p) / n + z * z / (4 * n * n))
        denom = F.lit(1.0) + z * z / n
        return (center + margin if hi else center - margin) / denom

    return counts.select(
        "n_a",
        "conv_a",
        F.round(p_a, 6).alias("rate_a"),
        "n_b",
        "conv_b",
        F.round(p_b, 6).alias("rate_b"),
        F.round(pool, 6).alias("pooled_rate"),
        # se = 0 (all-convert or none-convert corpora) has no defined
        # z; emit NULL rather than ANSI-div-by-zero
        F.round(
            F.when(se > 0, (p_a - p_b) / se), 6
        ).alias("z_stat"),
        F.round(
            wilson(p_a, F.col("n_a").cast("double"), False), 6
        ).alias("wilson_a_lo"),
        F.round(
            wilson(p_a, F.col("n_a").cast("double"), True), 6
        ).alias("wilson_a_hi"),
        F.round(
            wilson(p_b, F.col("n_b").cast("double"), False), 6
        ).alias("wilson_b_lo"),
        F.round(
            wilson(p_b, F.col("n_b").cast("double"), True), 6
        ).alias("wilson_b_hi"),
    )


def ols_normal(
    df: DataFrame,
    y_col,
    x1_col,
    x2_col,
) -> DataFrame:
    """OLS with intercept for y ~ x1 + x2 via normal equations on EXACT
    integer moments. ``y_col``/``x1_col``/``x2_col`` are integer-valued
    Columns (cents, day indices, 0/1 flags — caller quantizes). The one
    agg pass emits the 9 BIGINT sums of products; because integer
    addition is associative, the moments are bit-identical across
    engines and partitionings — no float summation-order drift. The
    3×3 symmetric system is then solved by Cramer's rule on those exact
    moments; only the final divisions are floating point (rounded 6dp).

    Scale shape: ONE map-side-combinable aggregation over the fact
    table; p² scalars cross the wire. At corpus scales where a moment
    could exceed int64 (~9.2e18), widen to decimal(38,0) — the
    exactness argument is unchanged.
    """
    y = y_col.cast("long")
    x1 = x1_col.cast("long")
    x2 = x2_col.cast("long")
    m = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x1).alias("s1"),
        F.sum(x2).alias("s2"),
        F.sum(x1 * x1).alias("s11"),
        F.sum(x1 * x2).alias("s12"),
        F.sum(x2 * x2).alias("s22"),
        F.sum(y).alias("sy"),
        F.sum(x1 * y).alias("s1y"),
        F.sum(x2 * y).alias("s2y"),
    )
    n = F.col("n").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    s11 = F.col("s11").cast("double")
    s12 = F.col("s12").cast("double")
    s22 = F.col("s22").cast("double")
    sy = F.col("sy").cast("double")
    s1y = F.col("s1y").cast("double")
    s2y = F.col("s2y").cast("double")
    # A = [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]], b = [sy,s1y,s2y]
    det = (
        n * (s11 * s22 - s12 * s12)
        - s1 * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s12 - s11 * s2)
    )
    det0 = (
        sy * (s11 * s22 - s12 * s12)
        - s1 * (s1y * s22 - s12 * s2y)
        + s2 * (s1y * s12 - s11 * s2y)
    )
    det1 = (
        n * (s1y * s22 - s12 * s2y)
        - sy * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s2y - s1y * s2)
    )
    det2 = (
        n * (s11 * s2y - s1y * s12)
        - s1 * (s1 * s2y - s1y * s2)
        + sy * (s1 * s12 - s11 * s2)
    )
    return m.select(
        "n",
        F.round(det0 / det, 6).alias("beta0"),
        F.round(det1 / det, 6).alias("beta1"),
        F.round(det2 / det, 6).alias("beta2"),
    )


def benford_digits(
    df: DataFrame,
    amount_col: str,
) -> DataFrame:
    """First-significant-digit distribution of a positive amount column
    vs Benford's law p(d) = log10(1 + 1/d), with per-digit chi-square
    contributions n·(obs − exp)²/exp — the classic fabricated-data /
    corrupted-feed audit. One map-side digit extraction + one 9-group
    agg; expected shares are literals. Rounded to 6dp.
    """
    digit = F.substring(
        F.col(amount_col).cast("decimal(18,2)").cast("string"), 1, 1
    ).cast("int")
    per_digit = (
        df.where(F.col(amount_col) >= 1)
        .groupBy(digit.alias("digit"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    obs = F.col("n").cast("double") / F.sum("n").over(total)
    exp_share = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    chi2 = (
        F.sum("n").over(total)
        * (obs - exp_share)
        * (obs - exp_share)
        / exp_share
    )
    return per_digit.select(
        "digit",
        "n",
        F.round(obs, 6).alias("obs_share"),
        F.round(exp_share, 6).alias("benford_share"),
        F.round(chi2, 6).alias("chi2_contrib"),
    ).orderBy("digit")


def woe_iv(
    df: DataFrame,
    feature_col: str,
    label_col,
    id_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Weight-of-evidence / information-value of a numeric feature vs a
    binary label over ntile bins. The ntile runs over the TOTAL order
    (feature, id) so both engines produce identical bins even with tied
    feature values (the repo's determinism convention for rank-family
    windows). WOE_i = ln((good_i/G)/(bad_i/B)); IV contribution
    (good_i/G − bad_i/B)·WOE_i. Laplace +0.5 on both counts guards
    empty cells. Rounded to 6dp.

    Scale shape: one global sort for the ntile (at 100 TB, swap for
    fixed quantile boundaries from approx_percentile — same downstream
    algebra); then an n_bins-row agg.
    """
    w = Window.orderBy(F.col(feature_col), F.col(id_col))
    binned = df.select(
        F.ntile(n_bins).over(w).alias("bin"),
        label_col.cast("int").alias("good"),
    )
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("good").alias("goods"),
        F.sum(F.lit(1) - F.col("good")).alias("bads"),
    )
    total = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    g_share = (F.col("goods") + F.lit(0.5)) / (
        F.sum("goods").over(total) + F.lit(0.5)
    )
    b_share = (F.col("bads") + F.lit(0.5)) / (
        F.sum("bads").over(total) + F.lit(0.5)
    )
    woe = F.log(g_share / b_share)
    return per_bin.select(
        "bin",
        "n",
        "goods",
        "bads",
        F.round(woe, 6).alias("woe"),
        F.round((g_share - b_share) * woe, 6).alias("iv_contrib"),
    ).orderBy("bin")
