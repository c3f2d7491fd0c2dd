"""Distributed logistic-regression training as one aggregation per
iteration — model fitting in the same shape as the repo's other
iterative operators (BPE merge-training, PageRank): per-row expression
math, a d+1-column map-side-combinable gradient aggregate, a driver-side
scalar update, repeat.

Why this shape matters at 100 TB: full-batch gradient descent's ONLY
cluster-wide operation is `avg` over d+1 products — partials combine
associatively, nothing shuffles but the d+1 sums, and the model state
(d+1 doubles) rides into the next iteration's plan as literals. That is
the entire distributed-ML story for linear models; no MLlib, no
parameter server, and every step is deterministic expression arithmetic,
so the TRAINED WEIGHTS value-hash against an ANSI-SQL oracle that
unrolls the same iterations (the dedup_pagerank precedent).

Beyond-reference extension (the reference has no trainable surface);
the canonical use here is a cheap quality/language classifier over the
text-statistics features the pipeline already computes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def logreg_train(
    df: DataFrame,
    feature_cols: list[str],
    label: Column,
    lr: float = 1.0,
    n_iter: int = 5,
    round_to: int = 6,
) -> list[tuple[str, float]]:
    """Full-batch GD on standardized features; returns
    ``[("bias", w0), (feature, w) ...]`` with weights rounded.

    Features are z-scored with population stats computed ONCE (one extra
    aggregate; required — raw scales like n_chars vs ratios make a
    shared learning rate diverge). The per-iteration gradient is
    ``avg((sigmoid(z) − y) · x_j)`` with ``z`` accumulated bias-first in
    ``feature_cols`` order — the oracle mirrors the exact association
    order so cross-engine drift stays at summation-noise level (round 6
    absorbs it). Standardized-stats columns must have nonzero variance
    (a constant feature has no z-score; drop it upstream).
    """
    d = len(feature_cols)
    base = df.select(
        label.cast("double").alias("_y"),
        *[
            F.col(c).cast("double").alias(f"_x{j}")
            for j, c in enumerate(feature_cols)
        ],
    )
    stats = base.agg(
        *[F.avg(f"_x{j}").alias(f"m{j}") for j in range(d)],
        *[F.stddev_pop(f"_x{j}").alias(f"s{j}") for j in range(d)],
    ).first()
    dead = [c for j, c in enumerate(feature_cols) if stats[f"s{j}"] == 0]
    if dead:
        raise ValueError(
            f"zero-variance features (no z-score exists): {dead}"
        )
    feats = base.select(
        "_y",
        *[
            (
                (F.col(f"_x{j}") - F.lit(float(stats[f"m{j}"])))
                / F.lit(float(stats[f"s{j}"]))
            ).alias(f"_z{j}")
            for j in range(d)
        ],
    ).cache()

    w = [0.0] * (d + 1)  # bias first
    for _ in range(n_iter):
        z = F.lit(w[0])
        for j in range(d):
            z = z + F.lit(w[j + 1]) * F.col(f"_z{j}")
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        err = p - F.col("_y")
        g = feats.agg(
            F.avg(err).alias("g0"),
            *[
                F.avg(err * F.col(f"_z{j}")).alias(f"g{j + 1}")
                for j in range(d)
            ],
        ).first()
        w = [w[j] - lr * g[f"g{j}"] for j in range(d + 1)]
    feats.unpersist()
    names = ["bias"] + list(feature_cols)
    return [(n, round(x, round_to)) for n, x in zip(names, w)]


def logreg_eval(
    df: DataFrame,
    feature_cols: list[str],
    label: Column,
    weights: list[tuple[str, float]],
    round_to: int = 6,
) -> DataFrame:
    """One distributed pass with frozen weights: (n_rows, accuracy,
    log_loss). Prediction thresholds on ``z > 0`` (exact — no sigmoid
    at the decision boundary); the standardization stats are recomputed
    from ``df`` (train-set evaluation, the oracle-mirrorable choice)."""
    d = len(feature_cols)
    base = df.select(
        label.cast("double").alias("_y"),
        *[
            F.col(c).cast("double").alias(f"_x{j}")
            for j, c in enumerate(feature_cols)
        ],
    )
    stats = base.agg(
        *[F.avg(f"_x{j}").alias(f"m{j}") for j in range(d)],
        *[F.stddev_pop(f"_x{j}").alias(f"s{j}") for j in range(d)],
    ).first()
    w = [x for _, x in weights]
    z = F.lit(w[0])
    for j in range(d):
        z = z + F.lit(w[j + 1]) * (
            (F.col(f"_x{j}") - F.lit(float(stats[f"m{j}"])))
            / F.lit(float(stats[f"s{j}"]))
        )
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    y = F.col("_y")
    return base.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(
            F.avg(((z > 0).cast("double") == y).cast("double")), round_to
        ).alias("accuracy"),
        F.round(
            F.avg(-(y * F.log(p) + (1 - y) * F.log(1 - p))), round_to
        ).alias("log_loss"),
    )


def logreg_calibration(
    df: DataFrame,
    feature_cols: list[str],
    label: Column,
    weights: list[tuple[str, float]],
    n_bins: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Calibration table + Brier decomposition inputs for a trained
    model: predicted probabilities bucketed into ``n_bins`` equal-width
    bins, each reporting (n, mean predicted p, actual positive rate,
    brier contribution) — the reliability-diagram table every deployed
    classifier needs before its scores are used as probabilities (an
    uncalibrated 0.9 that hits 60% poisons any downstream thresholding).

    One distributed aggregate at bin granularity (≤ n_bins rows out);
    bin = least(floor(p·n_bins), n_bins−1) so p=1.0 joins the top bin.
    ``p`` is ROUNDED to ``round_to`` BEFORE binning (and before the
    mean/brier sums): a raw probability sitting an exp()-ulp either
    side of a bin edge would bin differently across engines — the
    round-before-compare rule applied to the bin key. Deterministic
    frozen-weights scoring (same z-ordering as :func:`logreg_eval`),
    so the whole table value-hashes."""
    d = len(feature_cols)
    base = df.select(
        label.cast("double").alias("_y"),
        *[
            F.col(c).cast("double").alias(f"_x{j}")
            for j, c in enumerate(feature_cols)
        ],
    )
    stats = base.agg(
        *[F.avg(f"_x{j}").alias(f"m{j}") for j in range(d)],
        *[F.stddev_pop(f"_x{j}").alias(f"s{j}") for j in range(d)],
    ).first()
    w = [x for _, x in weights]
    z = F.lit(w[0])
    for j in range(d):
        z = z + F.lit(w[j + 1]) * (
            (F.col(f"_x{j}") - F.lit(float(stats[f"m{j}"])))
            / F.lit(float(stats[f"s{j}"]))
        )
    p = F.round(
        F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), round_to
    )
    b = F.least(
        F.floor(p * n_bins).cast("long"), F.lit(n_bins - 1)
    )
    return (
        base.select(p.alias("_p"), "_y", b.alias("bin"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("_p"), round_to).alias("mean_p"),
            F.round(F.avg("_y"), round_to).alias("actual_rate"),
            F.round(
                F.avg((F.col("_p") - F.col("_y"))
                      * (F.col("_p") - F.col("_y"))),
                round_to,
            ).alias("brier"),
        )
    )


def logreg_auc(
    df: DataFrame,
    feature_cols: list[str],
    label: Column,
    weights: list[tuple[str, float]],
    round_to: int = 6,
) -> DataFrame:
    """ROC AUC of the frozen-weight scores via the rank-sum identity
    AUC = (R1 − n1(n1+1)/2) / (n1·n2) — the threshold-free metric the
    accuracy/log-loss pass (:func:`logreg_eval`) can't see, computed
    WITHOUT materializing the n-point ROC curve.

    Scores are ROUNDED to ``round_to`` before ranking (round-before-
    compare on the rank key — an exp()-ulp either side of a rank
    boundary would order differently across engines) and ties get
    average ranks from ONE cumulative window at distinct-score
    granularity — the ``mann_whitney_u`` discipline; AUC and U are the
    same statistic up to normalization. Emits one row:
    (n_pos, n_neg, auc).

    Scale shape: one score-granularity aggregation over the fact table,
    then window math over distinct rounded scores (≤ 2·10^round_to
    rows for sigmoid-bounded z)."""
    d = len(feature_cols)
    base = df.select(
        label.cast("double").alias("_y"),
        *[
            F.col(c).cast("double").alias(f"_x{j}")
            for j, c in enumerate(feature_cols)
        ],
    )
    stats = base.agg(
        *[F.avg(f"_x{j}").alias(f"m{j}") for j in range(d)],
        *[F.stddev_pop(f"_x{j}").alias(f"s{j}") for j in range(d)],
    ).first()
    w = [x for _, x in weights]
    z = F.lit(w[0])
    for j in range(d):
        z = z + F.lit(w[j + 1]) * (
            (F.col(f"_x{j}") - F.lit(float(stats[f"m{j}"])))
            / F.lit(float(stats[f"s{j}"]))
        )
    from pyspark.sql import Window

    by_val = (
        base.select(F.round(z, round_to).alias("score"), "_y")
        .groupBy("score")
        .agg(
            F.count(F.lit(1)).alias("n_v"),
            F.sum("_y").cast("long").alias("n1_v"),
        )
    )
    win = Window.orderBy("score")
    ranked = by_val.withColumn(
        "below",
        F.coalesce(
            F.sum("n_v").over(
                win.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    agg = ranked.agg(
        F.sum("n1_v").alias("n_pos"),
        F.sum(F.col("n_v") - F.col("n1_v")).alias("n_neg"),
        F.sum(
            F.col("n1_v")
            * (
                F.col("below").cast("double")
                + (F.col("n_v").cast("double") + 1.0) / 2.0
            )
        ).alias("r1"),
    )
    n1 = F.col("n_pos").cast("double")
    n2 = F.col("n_neg").cast("double")
    return agg.select(
        "n_pos",
        "n_neg",
        F.round(
            F.when(
                (n1 > 0) & (n2 > 0),
                (F.col("r1") - n1 * (n1 + 1.0) / 2.0) / (n1 * n2),
            ),
            round_to,
        ).alias("auc"),
    )


def logreg_scores(
    df: DataFrame,
    feature_cols: list[str],
    label: Column,
    weights: list[tuple[str, float]],
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Per-row frozen-weight scores: returns (extra_cols..., y, z) with
    the same standardization/z-ordering as :func:`logreg_eval` — the
    building block the aggregate passes (eval, calibration, AUC,
    fairness) share when they need row-level scores alongside other
    attributes. Deterministic: stats enter as literals, z is the same
    bias-first accumulation everywhere."""
    d = len(feature_cols)
    extra = list(extra_cols or [])
    base = df.select(
        *extra,
        label.cast("double").alias("_y"),
        *[
            F.col(c).cast("double").alias(f"_x{j}")
            for j, c in enumerate(feature_cols)
        ],
    )
    stats = base.agg(
        *[F.avg(f"_x{j}").alias(f"m{j}") for j in range(d)],
        *[F.stddev_pop(f"_x{j}").alias(f"s{j}") for j in range(d)],
    ).first()
    w = [x for _, x in weights]
    z = F.lit(w[0])
    for j in range(d):
        z = z + F.lit(w[j + 1]) * (
            (F.col(f"_x{j}") - F.lit(float(stats[f"m{j}"])))
            / F.lit(float(stats[f"s{j}"]))
        )
    return base.select(*extra, F.col("_y").alias("y"), z.alias("z"))
