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
