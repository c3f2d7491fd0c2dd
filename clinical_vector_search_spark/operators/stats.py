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
- ``mann_whitney_u`` / ``ks_two_sample`` / ``chi_square_independence``
  / ``spearman_corr`` / ``mann_kendall_trend``: the nonparametric
  family — rank sums, CDF gaps, contingency, rank correlation and
  monotone trend, each with exact integer counts/ranks before any
  float.
- ``cuped_adjustment`` / ``log_rank_test`` / ``bradley_terry``: the
  experimentation-and-preference family — variance reduction, survival
  comparison, and MM preference strengths, all moment- or
  iteration-exact.

(The ANOVA F and Welch t closed forms live in their entries — pure
conditional-moment aggregations.) Extends the reference's evaluation
surface (reference src/pipeline/evaluation.py computes batch metrics
driver-side); here every statistic is a distributed aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _gk_bucket(value_col: str, bounds_col, first_bin: int) -> "F.Column":
    """Bucket id of ``value_col`` against a broadcast percentile_approx
    boundary array: ``first_bin`` + the count of boundaries strictly
    below the value — an O(n_bins) map-side fold. THE single spelling
    shared by the ``woe_iv(approx=True)`` and ``spearman_corr(bins=K)``
    fact-scale paths (a boundary-tie or accuracy fix must land in both
    at once)."""
    return F.aggregate(
        bounds_col,
        F.lit(first_bin),
        lambda acc, b: acc + F.when(F.col(value_col) > b, 1).otherwise(0),
    )


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
    # Spelled as entire-frame total minus the O(n) growing prefix sum:
    # a (currentRow, unboundedFollowing) "shrinking" frame re-scans the
    # frame per row in Spark (UnboundedFollowingWindowFunctionFrame —
    # O(n²) in the one ordered task; measured quadratic in
    # operators/skyline.py before the same rewrite). Exact BIGINT
    # arithmetic either way — identical results.
    at_risk = by_t.withColumn(
        "n_at_risk",
        F.sum("ending").over(
            w.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        - F.coalesce(
            F.sum("ending").over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
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
    approx: bool = False,
) -> DataFrame:
    """Weight-of-evidence / information-value of a numeric feature vs a
    binary label over ntile bins. The ntile runs over the TOTAL order
    (feature, id) so both engines produce identical bins even with tied
    feature values (the repo's determinism convention for rank-family
    windows). WOE_i = ln((good_i/G)/(bad_i/B)); IV contribution
    (good_i/G − bad_i/B)·WOE_i. Laplace +0.5 on both counts guards
    empty cells. Rounded to 6dp.

    Scale shape: one global sort for the ntile; at fact scale pass
    ``approx=True`` — fixed GK-sketch quantile boundaries from
    ``percentile_approx`` (one 1-row aggregate, boundaries broadcast,
    bin id an O(n_bins) map-side fold — no global sort), same
    downstream algebra; then an n_bins-row agg. Approx bins are
    equi-depth up to sketch error and boundary-tie allocation (ntile
    splits tied values across bins by id; fixed boundaries keep a tied
    value in one bin), so WOE/IV differ only by those edge rows —
    asserted close on the events table in tests/test_stats.py.
    """
    if approx:
        qs = [i / n_bins for i in range(1, n_bins)]
        bcol = "_bounds"  # collision-proof internal name
        while bcol in df.columns:
            bcol += "_"
        bounds = df.agg(
            F.percentile_approx(feature_col, qs).alias(bcol)
        )
        binned = df.crossJoin(F.broadcast(bounds)).select(
            _gk_bucket(feature_col, bcol, 1).alias("bin"),
            label_col.cast("int").alias("good"),
        )
    else:
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


def mann_whitney_u(
    df: DataFrame,
    value_col: str,
    group_flag,
    precision: int = 2,
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test between two samples: does
    ``value_col`` stochastically dominate in group A (``group_flag`` = 1)
    vs group B (= 0)? The nonparametric complement of
    ``ab_test_proportions`` for continuous metrics.

    Values are binned to ``precision`` decimals FIRST (round-before-
    compare on the rank key — equal doubles group identically in any
    engine, and the distinct-value frame stays bounded at
    10^precision · range rows rather than one row per observation).
    Average ranks for ties come from one cumulative-count window at
    distinct-value granularity: avg_rank(v) = (# strictly below) +
    (n_v + 1)/2 — an integer plus an exact .5 step, so R1, U1 and U2
    are EXACT halves whatever the summation order. The normal
    approximation uses the tie-corrected variance
    n1·n2/12 · ((N+1) − Σ(t³−t)/(N(N−1))); no continuity correction
    (documented so the oracle matches closed-form).

    Scale shape: one value-granularity agg (the only big shuffle), then
    window math over distinct bins — the kaplan_meier discipline.
    Emits ONE row: n1, n2, u1, u2, z_stat (6dp).
    """
    v = F.round(F.col(value_col).cast("double"), precision)
    by_val = (
        df.select(v.alias("v"), group_flag.cast("long").alias("g1"))
        .where(F.col("v").isNotNull())
        .groupBy("v")
        .agg(
            F.count(F.lit(1)).alias("n_v"),
            F.sum("g1").alias("n1_v"),
        )
    )
    w = Window.orderBy("v")
    ranked = by_val.withColumn(
        "below",
        F.coalesce(
            F.sum("n_v").over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).withColumn(
        "avg_rank",
        F.col("below").cast("double")
        + (F.col("n_v").cast("double") + 1.0) / 2.0,
    )
    agg = ranked.agg(
        F.sum("n1_v").alias("n1"),
        F.sum(F.col("n_v") - F.col("n1_v")).alias("n2"),
        F.sum(F.col("n1_v") * F.col("avg_rank")).alias("r1"),
        F.sum(
            F.col("n_v").cast("double") * F.col("n_v") * F.col("n_v")
            - F.col("n_v")
        ).alias("tie_term"),
    )
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    n_tot = n1 + n2
    u1 = F.col("r1") - n1 * (n1 + 1.0) / 2.0
    u2 = n1 * n2 - u1
    sigma = F.sqrt(
        n1 * n2 / 12.0
        * ((n_tot + 1.0) - F.col("tie_term") / (n_tot * (n_tot - 1.0)))
    )
    return agg.select(
        "n1",
        "n2",
        F.round(u1, 1).alias("u1"),
        F.round(u2, 1).alias("u2"),
        F.round(
            F.when(sigma > 0, (u1 - n1 * n2 / 2.0) / sigma), 6
        ).alias("z_stat"),
    )


def chi_square_independence(
    df: DataFrame,
    col_a,
    col_b,
) -> DataFrame:
    """Chi-square test of independence between two categoricals: the
    r×c contingency table with expected counts row_total·col_total/N
    and per-cell contributions (obs − exp)²/exp, plus the table-level
    chi2 total and degrees of freedom repeated on every row (so one
    hash-checked frame carries both the cells and the verdict).

    Scale shape: ONE (a, b) aggregation over the fact table (the only
    big shuffle — cells are integer counts, exact in any engine); the
    row/column/grand totals and df are window sums AT CELL GRANULARITY
    (r·c rows), never a second pass. Floats appear only in the final
    expected/contribution arithmetic, rounded to 6dp.
    """
    cells = df.groupBy(
        col_a.alias("a") if not isinstance(col_a, str) else F.col(col_a).alias("a"),
        col_b.alias("b") if not isinstance(col_b, str) else F.col(col_b).alias("b"),
    ).agg(F.count(F.lit(1)).alias("observed"))
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_row = Window.partitionBy("a").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_col = Window.partitionBy("b").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    with_tot = cells.select(
        "a",
        "b",
        "observed",
        F.sum("observed").over(w_row).alias("row_tot"),
        F.sum("observed").over(w_col).alias("col_tot"),
        F.sum("observed").over(w_all).alias("grand"),
        F.count(F.lit(1)).over(w_all).alias("n_cells"),
        F.size(F.collect_set("a").over(w_all)).alias("n_rows"),
        F.size(F.collect_set("b").over(w_all)).alias("n_cols"),
    )
    expected = (
        F.col("row_tot").cast("double")
        * F.col("col_tot")
        / F.col("grand")
    )
    contrib = (
        (F.col("observed") - expected) * (F.col("observed") - expected)
        / expected
    )
    return with_tot.select(
        "a",
        "b",
        "observed",
        F.round(expected, 6).alias("expected"),
        F.round(contrib, 6).alias("chi2_contrib"),
        F.round(F.sum(contrib).over(w_all), 6).alias("chi2_total"),
        ((F.col("n_rows") - 1) * (F.col("n_cols") - 1))
        .cast("long")
        .alias("dof"),
    )


def bradley_terry(
    comparisons: DataFrame,
    n_iter: int = 3,
    winner_col: str = "winner",
    loser_col: str = "loser",
    n_col: str = "n",
    iter_round: int = 12,
) -> DataFrame:
    """Bradley-Terry preference-strength fit over aggregated pairwise
    comparisons — the model behind reward-model / preference-data
    curation (which response, labeler, or variant is stronger given
    only win/loss counts). Input: one row per ordered (winner, loser)
    pair with its count; output: one strength per item.

    Uses the classic MM update (Hunter 2004), ``n_iter`` fixed rounds:

        p_i ← W_i / Σ_{j≠i} n_ij / (p_i + p_j)

    then normalized to mean 1 each round. Every round runs at PAIR
    granularity (items², already aggregated — trivially small next to
    the fact table that produced the comparisons), joined back at item
    granularity; fixed iterations + rounding each round's strengths to
    ``iter_round`` dp keep the trajectory bit-reproducible across
    engines (the PageRank/kcore oracle-unrolling discipline — ulp drift
    in a float sum would otherwise compound through later rounds).

    Scale shape: callers aggregate raw preferences to (winner, loser, n)
    first (one pair-key shuffle over the fact table); the fit itself
    never touches fact-table volume.
    """
    pairs = comparisons.select(
        F.col(winner_col).alias("wi"),
        F.col(loser_col).alias("li"),
        F.col(n_col).cast("double").alias("n_wl"),
    )
    items = (
        pairs.select(F.col("wi").alias("item"))
        .unionAll(pairs.select(F.col("li").alias("item")))
        .distinct()
    )
    wins = (
        items.join(
            pairs.groupBy(F.col("wi").alias("item")).agg(
                F.sum("n_wl").alias("w")
            ),
            "item",
            "left",
        ).select("item", F.coalesce("w", F.lit(0.0)).alias("wins"))
    ).localCheckpoint()
    # undirected pair totals n_ij (both orders summed), kept once per
    # unordered pair then mirrored — each MM denominator term needs the
    # TOTAL games between i and j
    und = (
        pairs.select(
            F.least("wi", "li").alias("u"),
            F.greatest("wi", "li").alias("v"),
            "n_wl",
        )
        .groupBy("u", "v")
        .agg(F.sum("n_wl").alias("n_ij"))
    )
    mirrored = und.select(
        F.col("u").alias("i"), F.col("v").alias("j"), "n_ij"
    ).unionAll(
        und.select(F.col("v").alias("i"), F.col("u").alias("j"), "n_ij")
    ).localCheckpoint()
    p = items.select("item", F.lit(1.0).alias("p")).localCheckpoint()
    for _ in range(n_iter):
        pj = p.select(F.col("item").alias("j"), F.col("p").alias("p_j"))
        pi = p.select(F.col("item").alias("i"), F.col("p").alias("p_i"))
        denom = (
            mirrored.join(pi, "i")
            .join(pj, "j")
            .groupBy(F.col("i").alias("item"))
            .agg(
                F.sum(
                    F.col("n_ij") / (F.col("p_i") + F.col("p_j"))
                ).alias("d")
            )
        )
        raw = wins.join(denom, "item", "left").select(
            "item",
            F.when(
                F.col("d").isNotNull() & (F.col("wins") > 0),
                F.col("wins") / F.col("d"),
            )
            .otherwise(F.lit(1e-9))
            .alias("p_raw"),
        )
        mean = raw.agg(F.avg("p_raw").alias("m"))
        p = (
            raw.crossJoin(F.broadcast(mean))
            .select(
                "item",
                F.round(F.col("p_raw") / F.col("m"), iter_round).alias("p"),
            )
            .localCheckpoint()
        )
    return p.join(wins, "item").select(
        "item",
        F.col("wins").cast("long").alias("wins"),
        F.round("p", 6).alias("strength"),
    )


def cuped_adjustment(
    events: DataFrame,
    user_col: str = "user_id",
    ts_ns_col: str = "ts_ns",
    value_col: str = "value",
) -> DataFrame:
    """CUPED variance reduction (Deng et al., WSDM 2013) — the standard
    experimentation-platform technique: adjust each unit's experiment
    metric with its PRE-period covariate, y* = y − θ(x − x̄), θ =
    cov(x,y)/var(x), cutting metric variance by the squared correlation
    without biasing the treatment contrast.

    Deterministic distributed spelling: the corpus midpoint splits
    pre/post periods (integer-ns arithmetic from a broadcast stat
    frame); per user, x = pre-period event count and y = post-period
    value in EXACT integer cents; θ and every variance come from one
    pass of BIGINT moment sums (Sx, Sy, Sxy, Sxx, Syy — the ols_normal
    convention: integer addition is associative, so the moments are
    bit-identical across engines and partitionings). var(y*) needs no
    second pass: var(y*) = var(y) − cov²/var(x) exactly. Variants are
    the md5-nibble split shared with ab_test_proportions.

    Output: one row per variant — n, mean_y, mean_y_cuped (the
    treatment-effect-preserving adjusted mean, using pooled θ and the
    GLOBAL x̄) — plus the pooled θ and variance-reduction share repeated
    on both rows (6dp).

    Scale note: moments can reach n·max(x)·max(y_cents); BIGINT holds
    ~9.2e18 — beyond ~1e9 heavy users switch the moment sums to DOUBLE
    (documented trade: last-ulp drift for headroom).
    """
    per_user = (
        events.crossJoin(
            F.broadcast(
                events.agg(
                    # integer floor-div, NOT /2-then-cast: Spark casts
                    # double->long by truncation but DuckDB CAST rounds
                    # to nearest, so an odd min+max would disagree by 1ns
                    F.expr(
                        f"(min({ts_ns_col}) + max({ts_ns_col})) div 2"
                    ).alias("mid_ns")
                )
            )
        )
        .groupBy(user_col)
        .agg(
            F.sum(
                F.when(F.col(ts_ns_col) < F.col("mid_ns"), 1).otherwise(0)
            ).alias("x"),
            F.sum(
                F.when(
                    F.col(ts_ns_col) >= F.col("mid_ns"),
                    F.round(F.col(value_col) * 100, 0).cast("long"),
                ).otherwise(0)
            ).alias("y_cents"),
        )
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
        "x",
        "y_cents",
    )
    # global exact moments (pooled theta; global x-bar keeps the
    # adjustment mean-preserving across variants)
    g = assigned.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y_cents").alias("sy"),
        F.sum(F.col("x") * F.col("y_cents")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y_cents") * F.col("y_cents")).alias("syy"),
    )
    per_variant = assigned.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_v"),
        F.sum("x").alias("sx_v"),
        F.sum("y_cents").alias("sy_v"),
    )
    n = F.col("n").cast("double")
    mean_x = F.col("sx") / n
    mean_y = F.col("sy") / n
    var_x = F.col("sxx") / n - mean_x * mean_x
    var_y = F.col("syy") / n - mean_y * mean_y
    cov = F.col("sxy") / n - mean_x * mean_y
    theta = F.when(var_x > 0, cov / var_x).otherwise(F.lit(0.0))
    var_adj = var_y - F.when(var_x > 0, cov * cov / var_x).otherwise(
        F.lit(0.0)
    )
    stats = g.select(
        theta.alias("_theta"),
        mean_x.alias("_gx"),
        F.when(var_y > 0, (var_y - var_adj) / var_y)
        .otherwise(F.lit(0.0))
        .alias("_red"),
    )
    nv = F.col("n_v").cast("double")
    return (
        per_variant.crossJoin(F.broadcast(stats))
        .select(
            "variant",
            F.col("n_v").alias("n"),
            F.round(F.col("sy_v") / nv / 100.0, 6).alias("mean_y"),
            F.round(
                (
                    F.col("sy_v") / nv
                    - F.col("_theta") * (F.col("sx_v") / nv - F.col("_gx"))
                )
                / 100.0,
                6,
            ).alias("mean_y_cuped"),
            F.round(F.col("_theta") / 100.0, 6).alias("theta"),
            F.round(F.col("_red"), 6).alias("var_reduction"),
        )
    )


def log_rank_test(
    events: DataFrame,
    user_col: str = "user_id",
    ts_ns_col: str = "ts_ns",
    unit_ns: int = 3_600_000_000_000,
    censor_horizon_units: int = 72,
) -> DataFrame:
    """Log-rank test (Mantel 1966): do two cohorts' survival curves
    differ? The hypothesis-test companion of :func:`kaplan_meier` —
    same exact integer-ns lifetimes and censoring contract, cohorts
    from the md5-nibble split shared with ``ab_test_proportions``.

    At each distinct lifetime t with d(t) total deaths:
    O−E accumulates d_A(t) − n_A(t)·d(t)/n(t), and the variance
    accumulates d·(n_A/n)·(1−n_A/n)·(n−d)/(n−1) (hypergeometric);
    z = (O−E)/√V. All risk-set counts are window sums of integers at
    distinct-lifetime granularity (the KM discipline — one user-key
    shuffle, then math on at most observation-span rows); floats only
    in E, V and the final z (6dp).
    """
    span = F.max(ts_ns_col) - F.min(ts_ns_col)
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
        (
            F.conv(
                F.substring(F.md5(F.col(user_col).cast("string")), 1, 1),
                16,
                10,
            ).cast("int")
            % 2
        ).alias("variant"),
    )
    a = F.col("variant") == 0
    by_t = flagged.groupBy(F.col("lifetime").alias("t")).agg(
        F.sum(F.when(a, F.col("death")).otherwise(0)).alias("d_a"),
        F.sum("death").alias("d"),
        F.sum(F.when(a, 1).otherwise(0)).alias("end_a"),
        F.count(F.lit(1)).alias("end_all"),
    )
    # suffix sums via entire-frame total minus the O(n) growing prefix —
    # not a (currentRow, unboundedFollowing) shrinking frame, which
    # re-scans per row (O(n²) single-task; see kaplan_meier above)
    w_all = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)

    def _suffix_sum(c: str):
        return F.sum(c).over(w_all) - F.coalesce(
            F.sum(c).over(w_prev), F.lit(0)
        )

    risk = by_t.select(
        "t",
        "d_a",
        "d",
        _suffix_sum("end_a").alias("n_a"),
        _suffix_sum("end_all").alias("n"),
    ).filter(F.col("d") > 0)
    n = F.col("n").cast("double")
    n_a = F.col("n_a").cast("double")
    d = F.col("d").cast("double")
    e_a = n_a * d / n
    v = F.when(
        F.col("n") > 1,
        d * (n_a / n) * (1.0 - n_a / n) * (n - d) / (n - 1.0),
    ).otherwise(F.lit(0.0))
    agg = risk.agg(
        F.sum("d_a").alias("deaths_a"),
        F.sum(F.col("d") - F.col("d_a")).alias("deaths_b"),
        F.sum(F.col("d_a") - e_a).alias("o_minus_e"),
        F.sum(v).alias("variance"),
    )
    return agg.select(
        "deaths_a",
        "deaths_b",
        F.round("o_minus_e", 6).alias("o_minus_e"),
        F.round("variance", 6).alias("variance"),
        F.round(
            F.when(
                F.col("variance") > 0,
                F.col("o_minus_e") / F.sqrt(F.col("variance")),
            ),
            6,
        ).alias("z_stat"),
    )


def spearman_corr(
    df: DataFrame,
    x_col,
    y_col,
    precision: int = 6,
    bins: int | None = None,
) -> DataFrame:
    """Spearman rank correlation: Pearson correlation of AVERAGE ranks
    (the tie-correct definition — the rank-based complement of
    ``F.corr``'s Pearson, robust to monotone transforms and outliers).

    Average rank spelled as min-rank + (ties−1)/2, both window
    functions: ``rank() OVER (ORDER BY v)`` is engine-identical and the
    tie count is a partition count — exact integers plus an exact .5
    step, so the ranks are bit-identical in any engine; only the final
    correlation is float (``precision`` dp).

    Scale shape (r10): ranks at DISTINCT-VALUE granularity — per-value
    counts, an O(n) growing prefix sum over the distinct frame, and a
    join back — instead of ``rank() OVER (ORDER BY v)`` on raw rows,
    which sorts the whole fact table in ONE task. avg_rank(v) =
    prefix_count(v) + (ties+1)/2, bit-identical to min-rank +
    (ties−1)/2 (exact integers plus an exact .5 step); only the final
    correlation is float (``precision`` dp).

    PRECONDITION (``bins=None``, the exact path): the distinct frame is
    still ONE ordered task, so per-column distinct cardinality must fit
    a single task's sort — fine up to ~millions of distinct values
    (the binned escape hatch is exercised against the exact path in
    tests/test_stats.py). For fact-scale NEAR-UNIQUE
    doubles pass ``bins=K``: each column is first quantized to its own
    K GK-sketch percentile buckets (``percentile_approx`` — one 1-row
    aggregate per column, boundaries broadcast as a literal-sized
    array, bin id an O(K) map-side fold), bounding the distinct frame
    at K while the downstream average-rank + Pearson machinery is
    UNCHANGED. Binned rho is an approximation (within-bin ties); with
    equi-depth buckets the binned rank is a monotone coarsening of the
    exact rank, so rho_binned → rho as K grows (error ~1/K; asserted
    within 0.05 of exact at K=64 on the events table).
    Emits one row: (n, rho).
    """
    x = x_col if not isinstance(x_col, str) else F.col(x_col)
    y = y_col if not isinstance(y_col, str) else F.col(y_col)
    base = df.select(x.alias("_x"), y.alias("_y")).where(
        F.col("_x").isNotNull() & F.col("_y").isNotNull()
    )
    if bins is not None:
        qs = [i / bins for i in range(1, bins)]
        # BOTH columns' boundaries in one 1-row agg (one job, not two)
        bounds = base.agg(
            F.percentile_approx("_x", qs).alias("_bx"),
            F.percentile_approx("_y", qs).alias("_by"),
        )

        # materialized ONCE: the O(bins) fold would otherwise re-run per
        # downstream consumer (two rank_map subtrees + the join-back all
        # root at this frame — the re-derived-per-consumer trap the r10
        # incremental-dedup fix measured at 6x)
        base = (
            base.crossJoin(F.broadcast(bounds))
            .select(
                _gk_bucket("_x", F.col("_bx"), 0).alias("_x"),
                _gk_bucket("_y", F.col("_by"), 0).alias("_y"),
            )
            .localCheckpoint()
        )

    def rank_map(c: str, out: str) -> DataFrame:
        by_val = base.groupBy(c).agg(F.count(F.lit(1)).alias("_n_v"))
        w = Window.orderBy(c)
        return by_val.select(
            c,
            (
                F.coalesce(
                    F.sum("_n_v").over(
                        w.rowsBetween(Window.unboundedPreceding, -1)
                    ),
                    F.lit(0),
                ).cast("double")
                + (F.col("_n_v").cast("double") + 1.0) / 2.0
            ).alias(out),
        )

    ranked = base.join(rank_map("_x", "_rx"), "_x").join(
        rank_map("_y", "_ry"), "_y"
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.corr("_rx", "_ry"), precision).alias("rho"),
    )


def ks_two_sample(
    df: DataFrame,
    value_col: str,
    group_flag,
    precision: int = 2,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov: D = sup|F₁(v) − F₂(v)| between
    the empirical CDFs of two groups — the distribution-shape drift
    test completing the family (``mann_whitney_u`` detects location
    shift; KS sees ANY difference). Values bin to ``precision``
    decimals first (rank-key round-before-compare, bounded distinct
    frame — the MW discipline); each group's CDF is a cumulative
    integer count over distinct bins, so D is an EXACT ratio of
    integers and the engines can't disagree before the final division.
    The asymptotic statistic λ = D·√(n₁n₂/(n₁+n₂)) is emitted for
    p-value lookup (the Kolmogorov tail sum is caller-side — it is a
    scalar series, not a data operation). One value-granularity agg,
    then window cumsums. Emits (n1, n2, d_stat, lambda_stat).
    """
    v = F.round(F.col(value_col).cast("double"), precision)
    by_val = (
        df.select(v.alias("v"), group_flag.cast("long").alias("g1"))
        .where(F.col("v").isNotNull())
        .groupBy("v")
        .agg(
            F.sum("g1").alias("n1_v"),
            F.sum(F.lit(1) - F.col("g1")).alias("n2_v"),
        )
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = by_val.select(
        F.sum("n1_v").over(w).alias("c1"),
        F.sum("n2_v").over(w).alias("c2"),
        F.sum("n1_v").over(wt).alias("n1"),
        F.sum("n2_v").over(wt).alias("n2"),
    )
    gap = F.abs(
        F.col("c1").cast("double") / F.col("n1")
        - F.col("c2").cast("double") / F.col("n2")
    )
    agg = cum.agg(
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
        F.max(gap).alias("d"),
    )
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    return agg.select(
        "n1",
        "n2",
        F.round(F.col("d"), 6).alias("d_stat"),
        F.round(
            F.when(
                (n1 > 0) & (n2 > 0),
                F.col("d") * F.sqrt(n1 * n2 / (n1 + n2)),
            ),
            6,
        ).alias("lambda_stat"),
    )


def mann_kendall_trend(
    events: DataFrame,
    ts_ns_col: str = "ts_ns",
) -> DataFrame:
    """Mann-Kendall trend test + Theil-Sen slope over the daily count
    series — the nonparametric is-this-metric-drifting pair (monotone
    trend without assuming linearity; the robust complement of
    ``rel_order_trend``'s least-squares regr_ family).

    S = Σ_{i<j} sign(y_j − y_i) is an EXACT integer; its variance uses
    the tie-corrected closed form n(n−1)(2n+5)/18 − Σt(t−1)(2t+5)/18;
    z applies the ±1 continuity correction. The Theil-Sen slope is the
    median of all pairwise slopes (exact integer differences divided —
    identical doubles in any engine; the median interpolation follows
    the events_quantiles percentile parity). The fact table collapses
    to day granularity FIRST, so the O(days²) pair join is over the
    tiny series — the acf_daily discipline. Emits one row:
    (n_days, s_stat, z_stat, theil_sen_slope).
    """
    daily = events.groupBy(
        F.expr(f"{ts_ns_col} div 86400000000000").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    a = daily.select(F.col("day").alias("di"), F.col("y").alias("yi"))
    b = daily.select(F.col("day").alias("dj"), F.col("y").alias("yj"))
    pairs = a.join(b, F.col("di") < F.col("dj"))
    sgn = F.signum((F.col("yj") - F.col("yi")).cast("double")).cast("long")
    slope = (F.col("yj") - F.col("yi")).cast("double") / (
        F.col("dj") - F.col("di")
    ).cast("double")
    ps = pairs.agg(
        F.sum(sgn).alias("s_stat"),
        F.percentile(slope, F.lit(0.5)).alias("theil_sen"),
    )
    nd = daily.agg(F.count(F.lit(1)).alias("n_days"))
    ties = (
        daily.groupBy("y")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.sum(
                F.col("t")
                * (F.col("t") - 1)
                * (2 * F.col("t") + 5)
            ).alias("tie_sum")
        )
    )
    j = ps.crossJoin(F.broadcast(nd)).crossJoin(F.broadcast(ties))
    n = F.col("n_days").cast("double")
    var_s = (
        n * (n - 1.0) * (2.0 * n + 5.0)
        - F.col("tie_sum").cast("double")
    ) / 18.0
    s = F.col("s_stat").cast("double")
    z = F.when(
        (var_s > 0) & (F.col("s_stat") != 0),
        (s - F.signum(s)) / F.sqrt(var_s),
    ).otherwise(F.when(var_s > 0, F.lit(0.0)))
    return j.select(
        "n_days",
        "s_stat",
        F.round(z, 6).alias("z_stat"),
        F.round("theil_sen", 6).alias("theil_sen_slope"),
    )
