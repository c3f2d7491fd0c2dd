"""operators/stats.py: Kaplan-Meier, ACF, A/B z-test, OLS normal
equations, Benford digits, WOE/IV — each checked against an
independent NumPy / closed-form reference on hand-built frames."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from clinical_vector_search_spark.operators.stats import (
    bradley_terry,
    chi_square_independence,
    mann_whitney_u,
    ab_test_proportions,
    acf_daily,
    benford_digits,
    kaplan_meier,
    ols_normal,
    woe_iv,
)

HOUR = 3_600_000_000_000


def test_kaplan_meier_matches_hand_computation(spark):
    # users with lifetimes (hours): 2 dies, 2 dies, 5 dies, 5 censored,
    # 8 censored. Censor horizon 1h: last event at corpus max → censored.
    rows = []
    cmax = 1_000 * HOUR

    def user(uid, start, end):
        rows.append((uid, start))
        rows.append((uid, end))

    user("u1", 0, 2 * HOUR)
    user("u2", 10 * HOUR, 12 * HOUR)
    user("u3", 0, 5 * HOUR)
    user("u4", cmax - 5 * HOUR, cmax)       # lifetime 5, censored
    user("u5", cmax - 8 * HOUR, cmax)       # lifetime 8, censored
    df = spark.createDataFrame(rows, "user_id string, ts_ns long")
    out = {
        r["t"]: r
        for r in kaplan_meier(
            df, censor_horizon_units=1
        ).collect()
    }
    # t=2: n=5, d=2 → S=0.6 ; t=5: n=3, d=1, c=1 → S=0.6*(2/3)=0.4
    # t=8: n=1, d=0, c=1 → S stays 0.4
    assert out[2]["n_at_risk"] == 5 and out[2]["deaths"] == 2
    assert out[2]["survival"] == pytest.approx(0.6)
    assert out[5]["n_at_risk"] == 3 and out[5]["deaths"] == 1
    assert out[5]["censored"] == 1
    assert out[5]["survival"] == pytest.approx(0.4)
    assert out[8]["n_at_risk"] == 1 and out[8]["deaths"] == 0
    assert out[8]["survival"] == pytest.approx(0.4)


def test_kaplan_meier_survival_monotone_on_testdata(spark, sf_dir):
    from clinical_vector_search_spark.streaming.events import read_events

    km = kaplan_meier(read_events(spark, sf_dir)).collect()
    surv = [r["survival"] for r in sorted(km, key=lambda r: r["t"])]
    assert all(a >= b for a, b in zip(surv, surv[1:]))
    assert all(0.0 <= s <= 1.0 for s in surv)


def test_acf_matches_numpy(spark):
    rng = np.random.default_rng(11)
    days = 40
    # one event per (day, i) — counts y = 1 + poisson
    counts = 1 + rng.poisson(5.0, days)
    rows = []
    for d in range(days):
        for i in range(counts[d]):
            rows.append((f"e{d}_{i}", d * 86_400_000_000_000 + i, "u"))
    df = spark.createDataFrame(rows, "event_id string, ts_ns long, user_id string")
    ev = df.withColumn("ts", F.timestamp_micros((F.col("ts_ns") / 1000).cast("long")))
    out = {r["lag"]: r["acf"] for r in acf_daily(ev, max_lag=4).collect()}
    y = counts.astype("float64")
    for k in range(1, 5):
        ref = np.corrcoef(y[k:], y[:-k])[0, 1]
        assert out[k] == pytest.approx(ref, abs=1e-6)


def test_ab_test_closed_form(spark, sf_dir):
    from clinical_vector_search_spark.streaming.events import read_events

    ev = read_events(spark, sf_dir)
    row = ab_test_proportions(ev).collect()[0]
    n_a, conv_a, n_b, conv_b = (
        row["n_a"], row["conv_a"], row["n_b"], row["conv_b"],
    )
    assert n_a + n_b == ev.select("user_id").distinct().count()
    p_a, p_b = conv_a / n_a, conv_b / n_b
    pool = (conv_a + conv_b) / (n_a + n_b)
    se = math.sqrt(pool * (1 - pool) * (1 / n_a + 1 / n_b))
    if se > 0:
        assert row["z_stat"] == pytest.approx((p_a - p_b) / se, abs=1e-6)
    else:
        assert row["z_stat"] is None
    # Wilson interval brackets the point estimate
    assert row["wilson_a_lo"] <= round(p_a, 6) <= row["wilson_a_hi"]
    assert row["wilson_b_lo"] <= round(p_b, 6) <= row["wilson_b_hi"]


def test_ols_normal_matches_numpy_lstsq(spark):
    rng = np.random.default_rng(3)
    n = 400
    x1 = rng.integers(0, 50, n)
    x2 = rng.integers(0, 2, n)
    y = (1000 + 13 * x1 - 250 * x2 + rng.integers(-40, 41, n)).astype(
        "int64"
    )
    df = spark.createDataFrame(
        [(int(a), int(b), int(c)) for a, b, c in zip(x1, x2, y)],
        "x1 long, x2 long, y long",
    )
    out = ols_normal(
        df, F.col("y"), F.col("x1"), F.col("x2")
    ).collect()[0]
    X = np.column_stack([np.ones(n), x1, x2])
    beta = np.linalg.lstsq(X, y.astype("float64"), rcond=None)[0]
    assert out["beta0"] == pytest.approx(beta[0], abs=1e-4)
    assert out["beta1"] == pytest.approx(beta[1], abs=1e-4)
    assert out["beta2"] == pytest.approx(beta[2], abs=1e-4)


def test_benford_shares_and_chi2(spark):
    amounts = [float(x) for x in [1.5, 12, 19.99, 25, 31, 111, 950, 88, 14, 0.5]]
    df = spark.createDataFrame([(a,) for a in amounts], "amt double")
    rows = benford_digits(df, "amt").collect()
    # 0.5 excluded (< 1); 9 amounts remain
    total = sum(r["n"] for r in rows)
    assert total == 9
    by_digit = {r["digit"]: r for r in rows}
    # 1.5, 12, 19.99, 111, 14 start with digit 1
    assert by_digit[1]["n"] == 5
    assert by_digit[2]["n"] == 1 and by_digit[9]["n"] == 1
    for r in rows:
        assert r["obs_share"] == pytest.approx(r["n"] / total, abs=1e-6)
        exp = math.log10(1 + 1 / r["digit"])
        assert r["benford_share"] == pytest.approx(exp, abs=1e-6)
        chi = total * (r["n"] / total - exp) ** 2 / exp
        assert r["chi2_contrib"] == pytest.approx(chi, abs=1e-5)


def test_woe_iv_reference(spark):
    # 2 bins of 4: bin1 3 goods/1 bad, bin2 1 good/3 bads
    rows = [
        ("a", 1, 1), ("b", 2, 1), ("c", 3, 1), ("d", 4, 0),
        ("e", 5, 0), ("f", 6, 0), ("g", 7, 0), ("h", 8, 1),
    ]
    df = spark.createDataFrame(rows, "id string, feat int, label int")
    out = {
        r["bin"]: r
        for r in woe_iv(df, "feat", F.col("label"), "id", n_bins=2).collect()
    }
    G, B = 4, 4
    for b, goods, bads in [(1, 3, 1), (2, 1, 3)]:
        gs = (goods + 0.5) / (G + 0.5)
        bs = (bads + 0.5) / (B + 0.5)
        assert out[b]["goods"] == goods and out[b]["bads"] == bads
        assert out[b]["woe"] == pytest.approx(math.log(gs / bs), abs=1e-6)
        assert out[b]["iv_contrib"] == pytest.approx(
            (gs - bs) * math.log(gs / bs), abs=1e-6
        )


def test_woe_iv_approx_bins_match_ntile(spark):
    """approx=True swaps the global ntile sort for broadcast GK-sketch
    boundaries (the fact-scale path): on distinct feature values the
    equi-depth boundaries reproduce ntile's bins, so per-bin counts and
    the total IV must match the exact path; bin ids stay 1..n_bins."""
    rows = [
        (str(i), float(i) + (i * 37 % 13) / 100.0, int(i * 7 % 10 < 4))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "id string, feat double, label int")
    exact = {
        r["bin"]: r
        for r in woe_iv(df, "feat", F.col("label"), "id", n_bins=8).collect()
    }
    got = {
        r["bin"]: r
        for r in woe_iv(
            df, "feat", F.col("label"), "id", n_bins=8, approx=True
        ).collect()
    }
    assert set(got) == set(exact) == set(range(1, 9))
    iv_exact = sum(r["iv_contrib"] for r in exact.values())
    iv_got = sum(r["iv_contrib"] for r in got.values())
    assert abs(iv_got - iv_exact) < 0.02
    # bins stay equi-depth up to sketch error
    assert all(abs(r["n"] - 50) <= 2 for r in got.values())


def test_mann_whitney_matches_numpy_reference(spark):
    a = [1.0, 2.0, 3.0, 3.0, 5.0]
    b = [2.0, 3.0, 4.0, 6.0]
    rows = [(v, 1) for v in a] + [(v, 0) for v in b]
    df = spark.createDataFrame(rows, "value double, g int")
    out = mann_whitney_u(df, "value", F.col("g")).collect()[0]

    # independent reference: average ranks with ties, tie-corrected z
    allv = np.array(a + b)
    order = np.argsort(allv, kind="stable")
    ranks = np.empty(len(allv))
    sorted_v = allv[order]
    i = 0
    while i < len(sorted_v):
        j = i
        while j < len(sorted_v) and sorted_v[j] == sorted_v[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0
        i = j
    n1, n2 = len(a), len(b)
    r1 = ranks[: n1].sum()
    u1 = r1 - n1 * (n1 + 1) / 2.0
    n_tot = n1 + n2
    _, counts = np.unique(allv, return_counts=True)
    tie = float((counts.astype(float) ** 3 - counts).sum())
    sigma = math.sqrt(
        n1 * n2 / 12.0 * ((n_tot + 1) - tie / (n_tot * (n_tot - 1)))
    )
    assert out["n1"] == n1 and out["n2"] == n2
    assert out["u1"] == pytest.approx(u1, abs=1e-9)
    assert out["u2"] == pytest.approx(n1 * n2 - u1, abs=1e-9)
    assert out["z_stat"] == pytest.approx(
        (u1 - n1 * n2 / 2.0) / sigma, abs=1e-5
    )


def test_mann_whitney_all_one_group_null_z(spark):
    df = spark.createDataFrame([(1.0, 1), (2.0, 1)], "value double, g int")
    out = mann_whitney_u(df, "value", F.col("g")).collect()[0]
    assert out["n2"] == 0 and out["z_stat"] is None


def test_chi_square_2x2_closed_form(spark):
    # obs [[10,20],[30,40]]: chi2 = N(ad-bc)^2 / (r1 r2 c1 c2)
    rows = (
        [("x", "p")] * 10 + [("x", "q")] * 20
        + [("y", "p")] * 30 + [("y", "q")] * 40
    )
    df = spark.createDataFrame(rows, "a string, b string")
    out = chi_square_independence(df, F.col("a"), F.col("b")).collect()
    assert len(out) == 4
    n = 100.0
    expected_chi2 = n * (10 * 40 - 20 * 30) ** 2 / (30 * 70 * 40 * 60)
    cells = {(r["a"], r["b"]): r for r in out}
    assert cells[("x", "p")]["observed"] == 10
    assert cells[("x", "p")]["expected"] == pytest.approx(
        30 * 40 / n, abs=1e-6
    )
    for r in out:
        assert r["dof"] == 1
        assert r["chi2_total"] == pytest.approx(expected_chi2, abs=1e-5)


def test_bradley_terry_two_items_fixed_point(spark):
    # a beats b 3x, b beats a 1x: MM fixed point at mean-1 norm is
    # p_a=1.5, p_b=0.5 (reached after one round, stable thereafter)
    comp = spark.createDataFrame(
        [("a", "b", 3), ("b", "a", 1)], "winner string, loser string, n int"
    )
    out = {r["item"]: r for r in bradley_terry(comp, n_iter=3).collect()}
    assert out["a"]["wins"] == 3 and out["b"]["wins"] == 1
    assert out["a"]["strength"] == pytest.approx(1.5, abs=1e-6)
    assert out["b"]["strength"] == pytest.approx(0.5, abs=1e-6)


def test_bradley_terry_matches_sequential_mm(spark):
    comps = [
        ("a", "b", 3.0), ("b", "a", 1.0), ("b", "c", 2.0),
        ("c", "b", 2.0), ("a", "c", 1.0), ("c", "a", 1.0),
    ]
    comp = spark.createDataFrame(
        comps, "winner string, loser string, n double"
    )
    out = {
        r["item"]: r["strength"]
        for r in bradley_terry(comp, n_iter=3).collect()
    }

    # sequential reference replicating the op (incl. per-round 12dp round)
    items = ["a", "b", "c"]
    wins = {i: sum(n for w, _, n in comps if w == i) for i in items}
    n_ij = {}
    for w, l, n in comps:
        k = tuple(sorted((w, l)))
        n_ij[k] = n_ij.get(k, 0.0) + n
    p = {i: 1.0 for i in items}
    for _ in range(3):
        raw = {}
        for i in items:
            d = sum(
                n / (p[i] + p[j])
                for (x, y), n in n_ij.items()
                for j in ((y,) if x == i else (x,) if y == i else ())
            )
            raw[i] = wins[i] / d if d > 0 and wins[i] > 0 else 1e-9
        m = sum(raw.values()) / len(items)
        p = {i: round(raw[i] / m, 12) for i in items}
    for i in items:
        assert out[i] == pytest.approx(round(p[i], 6), abs=1e-6)


def test_logreg_auc_rank_sum_identity(spark):
    # AUC is invariant under the monotone standardization, so a single
    # feature scored with weight 1 gives the raw feature's AUC.
    # pos scores [3, 2], neg [1, 2] -> avg ranks 1, 2.5, 2.5, 4:
    # R1 = 6.5, U1 = 3.5, AUC = 3.5/4 = 0.875
    from clinical_vector_search_spark.operators.logreg import logreg_auc

    df = spark.createDataFrame(
        [(3.0, 1), (2.0, 1), (1.0, 0), (2.0, 0)], "s double, y int"
    )
    out = logreg_auc(
        df, ["s"], F.col("y"), [("bias", 0.0), ("s", 1.0)]
    ).collect()[0]
    assert out["n_pos"] == 2 and out["n_neg"] == 2
    assert out["auc"] == pytest.approx(0.875, abs=1e-9)
    # perfect separation -> AUC 1; degenerate single-class -> NULL
    sep = spark.createDataFrame(
        [(5.0, 1), (4.0, 1), (1.0, 0)], "s double, y int"
    )
    assert logreg_auc(
        sep, ["s"], F.col("y"), [("bias", 0.0), ("s", 1.0)]
    ).collect()[0]["auc"] == pytest.approx(1.0)
    one = spark.createDataFrame([(1.0, 1), (2.0, 1)], "s double, y int")
    assert (
        logreg_auc(
            one, ["s"], F.col("y"), [("bias", 0.0), ("s", 1.0)]
        ).collect()[0]["auc"]
        is None
    )


def test_cuped_matches_numpy_closed_form(spark):
    import numpy as np

    from clinical_vector_search_spark.operators.stats import (
        cuped_adjustment,
    )

    # users with correlated pre-count (x) and post-value (y)
    SEC = 1_000_000_000
    rows = []
    for uid in range(40):
        n_pre = 1 + (uid % 5)
        for i in range(n_pre):
            rows.append((uid, (i + 1) * SEC, 0.0, "view"))
        # post value correlated with n_pre plus a uid wobble
        val = round(10.0 * n_pre + (uid % 3), 2)
        rows.append((uid, 10_000 * SEC, val, "purchase"))
    df = spark.createDataFrame(
        rows, "user_id long, ts_ns long, value double, event_type string"
    )
    out = {r.variant: r for r in cuped_adjustment(df).collect()}

    # reference: same md5 split, same moments
    import hashlib

    mid = (SEC + 10_000 * SEC) // 2
    per = {}
    for uid, ts, val, _ in rows:
        x, y = per.get(uid, (0, 0))
        if ts < mid:
            x += 1
        else:
            y += round(val * 100)
        per[uid] = (x, y)
    xs = np.array([v[0] for v in per.values()], dtype=float)
    ys = np.array([v[1] for v in per.values()], dtype=float)
    theta = ((xs * ys).mean() - xs.mean() * ys.mean()) / (
        (xs * xs).mean() - xs.mean() ** 2
    )
    gx = xs.mean()
    var = {
        0: [], 1: [],
    }
    for uid, (x, y) in per.items():
        v = int(hashlib.md5(str(uid).encode()).hexdigest()[0], 16) % 2
        var[v].append((x, y))
    for v in (0, 1):
        arr = np.array(var[v], dtype=float)
        mean_y = arr[:, 1].mean() / 100.0
        adj = (arr[:, 1].mean() - theta * (arr[:, 0].mean() - gx)) / 100.0
        assert out[v].n == len(var[v])
        assert out[v].mean_y == pytest.approx(mean_y, abs=1e-5)
        assert out[v].mean_y_cuped == pytest.approx(adj, abs=1e-5)
    # CUPED with a correlated covariate must reduce variance
    assert out[0].var_reduction > 0.3


def test_log_rank_identical_cohorts_zero_z(spark):
    # construct MIRRORED cohorts: for every variant-0 user pick a
    # variant-1 twin with identical lifetime/censoring -> O-E == 0
    import hashlib

    from clinical_vector_search_spark.operators.stats import log_rank_test

    def variant(uid):
        return int(hashlib.md5(str(uid).encode()).hexdigest()[0], 16) % 2

    zeros = [u for u in range(200) if variant(u) == 0][:5]
    ones = [u for u in range(200) if variant(u) == 1][:5]
    HOUR = 3_600_000_000_000
    rows = []
    for pair, (u0, u1) in enumerate(zip(zeros, ones)):
        life = (pair + 1) * 2 * HOUR
        for u in (u0, u1):
            rows.append((u, 0))
            rows.append((u, life))
    df = spark.createDataFrame(rows, "user_id long, ts_ns long")
    out = log_rank_test(df, censor_horizon_units=1).collect()[0]
    assert out["deaths_a"] == out["deaths_b"]
    assert out["o_minus_e"] == pytest.approx(0.0, abs=1e-9)
    assert out["z_stat"] is None or abs(out["z_stat"]) < 1e-6


def test_spearman_matches_scipy_free_reference(spark):
    from clinical_vector_search_spark.operators.stats import spearman_corr

    xs = [1.0, 2.0, 2.0, 4.0, 5.0, 9.0]
    ys = [10.0, 8.0, 8.0, 3.0, 2.0, 1.0]   # monotone decreasing w/ ties
    df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
    out = spearman_corr(df, "x", "y").collect()[0]

    def avg_ranks(v):
        order = sorted(range(len(v)), key=lambda i: v[i])
        ranks = [0.0] * len(v)
        i = 0
        while i < len(v):
            j = i
            while j < len(v) and v[order[j]] == v[order[i]]:
                j += 1
            for k in range(i, j):
                ranks[order[k]] = (i + 1 + j) / 2.0
            i = j
        return np.array(ranks)

    rx, ry = avg_ranks(xs), avg_ranks(ys)
    ref = np.corrcoef(rx, ry)[0, 1]
    assert out["n"] == 6
    assert out["rho"] == pytest.approx(ref, abs=1e-6)
    # perfect monotone (no ties) -> exactly 1
    mono = spark.createDataFrame(
        [(float(i), float(i * i)) for i in range(1, 8)], "x double, y double"
    )
    assert spearman_corr(mono, "x", "y").collect()[0]["rho"] == pytest.approx(
        1.0
    )


def test_spearman_binned_converges_to_exact(spark):
    """The fact-scale path: bins=K quantizes each column to its own
    GK-sketch equi-depth buckets (bounded distinct frame) before the
    UNCHANGED rank/Pearson machinery. The binned rank is a monotone
    coarsening of the exact rank, so rho_binned must approach exact as
    K grows, hit it exactly when K exceeds the distinct cardinality,
    and preserve rho = 1 on monotone data at ANY K."""
    from clinical_vector_search_spark.operators.stats import spearman_corr

    # near-unique doubles — the regime the exact path's single-task
    # distinct frame precondition is about
    n = 4000
    rows = [
        (float(i) + (i * 2654435761 % 97) / 1000.0,
         float(i * i % 2999) + (i * 40503 % 89) / 1000.0)
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "x double, y double").repartition(8)
    exact = spearman_corr(df, "x", "y").collect()[0]
    err64 = abs(
        spearman_corr(df, "x", "y", bins=64).collect()[0]["rho"]
        - exact["rho"]
    )
    err256 = abs(
        spearman_corr(df, "x", "y", bins=256).collect()[0]["rho"]
        - exact["rho"]
    )
    assert err64 < 0.05 and err256 < 0.02 and err256 <= err64 + 1e-9
    # n preserved (binning relabels, never drops)
    assert (
        spearman_corr(df, "x", "y", bins=64).collect()[0]["n"] == exact["n"]
    )
    # monotone data stays exactly 1 under any binning
    mono = spark.createDataFrame(
        [(float(i), float(i) * 3.0 + 1.0) for i in range(500)],
        "x double, y double",
    )
    assert spearman_corr(mono, "x", "y", bins=16).collect()[0][
        "rho"
    ] == pytest.approx(1.0)
    # K above the distinct cardinality reproduces the exact rho
    small = spark.createDataFrame(
        [(float(i % 7), float((i * 5) % 11)) for i in range(200)],
        "x double, y double",
    )
    assert spearman_corr(small, "x", "y", bins=64).collect()[0][
        "rho"
    ] == spearman_corr(small, "x", "y").collect()[0]["rho"]


def test_ks_two_sample_hand_computed(spark):
    from clinical_vector_search_spark.operators.stats import ks_two_sample

    # group1 = {1,2,3}, group2 = {3,4}: CDF gaps at v=1:1/3, v=2:2/3,
    # v=3: |1 - 1/2| = 1/2, v=4: 0  -> D = 2/3
    rows = [(1.0, 1), (2.0, 1), (3.0, 1), (3.0, 0), (4.0, 0)]
    df = spark.createDataFrame(rows, "value double, g int")
    out = ks_two_sample(df, "value", F.col("g")).collect()[0]
    assert out["n1"] == 3 and out["n2"] == 2
    assert out["d_stat"] == pytest.approx(2 / 3, abs=1e-6)
    lam = (2 / 3) * math.sqrt(3 * 2 / 5)
    assert out["lambda_stat"] == pytest.approx(lam, abs=1e-6)
    # identical samples -> D = 0
    same = spark.createDataFrame(
        [(1.0, 1), (2.0, 1), (1.0, 0), (2.0, 0)], "value double, g int"
    )
    assert ks_two_sample(same, "value", F.col("g")).collect()[0][
        "d_stat"
    ] == pytest.approx(0.0)


def test_anova_entry_matches_numpy_f(spark, sf_dir):
    import __spark_entry__ as E

    out = E.q_events_anova(spark, sf_dir).collect()
    f_vals = {r["f_stat"] for r in out}
    assert len(f_vals) == 1
    f_spark = f_vals.pop()

    # independent reference on the same data
    from clinical_vector_search_spark.streaming.events import read_events

    rows = read_events(spark, sf_dir).select("event_type", "value").collect()
    groups = {}
    for r in rows:
        groups.setdefault(r.event_type, []).append(round(r.value * 100))
    ys = [np.array(v, dtype=float) for v in groups.values()]
    grand = np.concatenate(ys).mean()
    k, n = len(ys), sum(len(y) for y in ys)
    ssb = sum(len(y) * (y.mean() - grand) ** 2 for y in ys)
    ssw = sum(((y - y.mean()) ** 2).sum() for y in ys)
    f_ref = (ssb / (k - 1)) / (ssw / (n - k))
    assert f_spark == pytest.approx(f_ref, rel=1e-5)


def test_mann_kendall_hand_computed(spark):
    from clinical_vector_search_spark.operators.stats import (
        mann_kendall_trend,
    )

    DAY = 86_400_000_000_000
    # daily counts [1, 2, 2, 4] over days 0..3:
    # S = sum of sign(yj-yi) over i<j = +1+1+1 +0+1 +1 = 5
    counts = [1, 2, 2, 4]
    rows = []
    eid = 0
    for d, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, d * DAY + eid))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts_ns long")
    out = mann_kendall_trend(df).collect()[0]
    assert out["n_days"] == 4 and out["s_stat"] == 5
    # var = [n(n-1)(2n+5) - sum t(t-1)(2t+5)]/18, tie group of 2 at y=2
    var_s = (4 * 3 * 13 - 2 * 1 * 9) / 18.0
    z = (5 - 1) / math.sqrt(var_s)
    assert out["z_stat"] == pytest.approx(z, abs=1e-6)
    # slopes: (2-1)/1,(2-1)/2,(4-1)/3, (2-2)/1,(4-2)/2, (4-2)/1
    slopes = sorted([1.0, 0.5, 1.0, 0.0, 1.0, 2.0])
    med = (slopes[2] + slopes[3]) / 2
    assert out["theil_sen_slope"] == pytest.approx(med, abs=1e-6)
