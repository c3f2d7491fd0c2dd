"""Relational data-quality audits — the pre-flight checks a pipeline runs
before trusting joins at 100 TB (an orphaned foreign key silently drops
rows from every inner join downstream; count them FIRST).

No reference analog (the reference trusts its single CSV); extension in
the same spirit as the profiling operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def referential_audit(
    relationships: list[tuple[str, DataFrame, str, DataFrame, str]],
    broadcast_dims: bool = True,
) -> DataFrame:
    """Orphan-count audit over FK→PK relationships: for each
    (name, fact, fk_col, dim, pk_col) report (relationship, n_rows,
    n_orphans, orphan_rate). An orphan is a fact row with a NON-NULL fk
    that matches no dim pk (NULL fks are counted separately as
    n_null_fk — a null key is a modeling question, not a broken
    reference).

    Scale shape: each relationship is one scan of the fact side's fk
    COLUMN only (column pruning — the scan reads a single column) with a
    left-anti join against the dim's pk; ``broadcast_dims`` broadcasts
    the dim side (right for dimension tables; flip off for fact-to-fact
    references and let AQE pick). Counts are map-side-combined
    single-row aggs, unioned — k relationships, k bounded jobs in one
    plan, no cross-relationship shuffle.
    """
    outs = []
    for name, fact, fk, dim, pk in relationships:
        keys = fact.select(F.col(fk).alias("_fk"))
        pks = dim.select(F.col(pk).alias("_fk")).distinct()
        if broadcast_dims:
            pks = F.broadcast(pks)
        non_null = keys.filter(F.col("_fk").isNotNull())
        orphans = non_null.join(pks, "_fk", "left_anti")
        outs.append(
            keys.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("_fk").isNull().cast("long")).alias("n_null_fk"),
            )
            .crossJoin(
                orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
            )
            .select(
                F.lit(name).alias("relationship"),
                "n_rows",
                F.coalesce("n_null_fk", F.lit(0)).alias("n_null_fk"),
                "n_orphans",
                F.round(F.col("n_orphans") / F.col("n_rows"), 6).alias(
                    "orphan_rate"
                ),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Row-level diff between two dataset snapshots — the change-data-feed
    a pipeline derives when the source has none: every key classified as
    ``added`` (key only in new), ``removed`` (only in old), ``changed``
    (both, but any compare column differs) or dropped from the output if
    identical (the overwhelmingly common case, and the one that must not
    cost output rows at 100 TB).

    Comparison is null-safe per column (``eqNullSafe`` — NULL→value and
    value→NULL are changes, NULL→NULL is not). The plan is one full-outer
    join on the key — both sides shuffle once on the same key; with both
    snapshots bucketed/sorted by key (io.tables.write_bucketed) the
    exchange disappears entirely. Output:
    (key_cols..., change_type string).
    """
    o = old.select(
        *[F.col(c).alias(f"_o_{c}") for c in key_cols],
        *[F.col(c).alias(f"_ov_{c}") for c in compare_cols],
        F.lit(1).alias("_in_old"),
    )
    n = new.select(
        *[F.col(c).alias(f"_n_{c}") for c in key_cols],
        *[F.col(c).alias(f"_nv_{c}") for c in compare_cols],
        F.lit(1).alias("_in_new"),
    )
    cond = None
    for c in key_cols:
        eq = F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
        cond = eq if cond is None else cond & eq
    joined = o.join(n, cond, "full_outer")
    same = None
    for c in compare_cols:
        eq = F.col(f"_ov_{c}").eqNullSafe(F.col(f"_nv_{c}"))
        same = eq if same is None else same & eq
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(~same, F.lit("changed"))
    )  # identical rows: change is NULL -> filtered
    return (
        joined.select(
            *[
                F.coalesce(F.col(f"_n_{c}"), F.col(f"_o_{c}")).alias(c)
                for c in key_cols
            ],
            change.alias("change_type"),
        )
        .filter(F.col("change_type").isNotNull())
    )


def incremental_agg_update(
    base_agg: DataFrame,
    added: DataFrame,
    removed: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Maintain a grouped count/sum aggregate under a change feed
    WITHOUT touching the base data: new_agg = base_agg + Σ(added) −
    Σ(removed) per group. This is the recompute-avoidance identity that
    makes a 100 TB nightly rollup affordable when 0.1% of rows changed
    — the delta frames are change-feed-sized (e.g. from
    :func:`snapshot_diff` joined back to the rows), and the base
    aggregate is |groups| rows; the base TABLE is never scanned.

    Only works for self-maintainable aggregates (count/sum — and avg as
    sum/count downstream); min/max are NOT maintainable under removal
    (a removed max needs a rescan) and are deliberately absent. An
    updated row is modeled as removed(old) + added(new). Groups whose
    count reaches zero are dropped (matching a fresh recompute, which
    never emits empty groups).

    Output schema == ``base_agg``: (group_cols..., count_col, sum_cols...).
    """

    def delta(df: DataFrame, sign: int) -> DataFrame:
        return df.groupBy(*group_cols).agg(
            (F.lit(sign) * F.count(F.lit(1))).alias(count_col),
            *[
                (F.lit(sign) * F.sum(c)).alias(c)
                for c in sum_cols
            ],
        )

    combined = (
        base_agg.select(*group_cols, count_col, *sum_cols)
        .unionByName(delta(added, 1))
        .unionByName(delta(removed, -1))
    )
    return (
        combined.groupBy(*group_cols)
        .agg(
            F.sum(count_col).alias(count_col),
            *[F.sum(c).alias(c) for c in sum_cols],
        )
        .filter(F.col(count_col) > 0)
    )


def incremental_join_update(
    view0: DataFrame,
    left0: DataFrame,
    right0: DataFrame,
    delta_left: DataFrame,
    delta_right: DataFrame,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """Incremental view maintenance for an inner equi-join — the delta
    rule (Blakeley 1986; insert-only form):

        Δ(L ⋈ R) = ΔL ⋈ R₀  ∪  L₀ ⋈ ΔR  ∪  ΔL ⋈ ΔR

    so a materialized join view absorbs a batch of inserts WITHOUT
    re-joining the base tables: the three delta joins each have a
    batch-sized side (broadcast at any base-table scale — the whole
    point: maintenance cost ∝ |Δ|·matching-fanout, not |L|·|R|). The
    three terms partition the NEW pairs exactly (each new pair has an
    inserted row on the left, the right, or both — no overlap, no
    misses), so view₀ ∪ Δ equals the full recompute row-for-row; the
    entry's oracle IS that full recompute, making the equality the
    checked contract. The join-side complement of
    :func:`incremental_agg_update` (deletes compose the same way with
    anti-terms; this operator covers the append-only ingest path).
    """
    cond1 = delta_left[left_key] == right0[right_key]
    cond2 = left0[left_key] == delta_right[right_key]
    cond3 = delta_left[left_key] == delta_right[right_key]
    d1 = F.broadcast(delta_left).join(right0, cond1)
    d2 = left0.join(F.broadcast(delta_right), cond2)
    d3 = F.broadcast(delta_left).join(delta_right, cond3)
    cols = view0.columns
    return (
        view0.unionByName(d1.select(*cols))
        .unionByName(d2.select(*cols))
        .unionByName(d3.select(*cols))
    )
