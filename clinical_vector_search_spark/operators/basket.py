"""Co-occurrence / association mining over (basket, item) pairs.

No reference analog — extension surface for corpus analytics: the same
operator mines parts-bought-together on TPC-H lineitem and
terms-co-occurring on documents (the PMI collocation miner in
``functions.text`` is the information-theoretic cousin; this one speaks
support / confidence / lift, the market-basket vocabulary).

Scale notes (the all-pairs trap and its bound): pairs are expanded from
each basket's SORTED DISTINCT item set (one basket-key groupBy +
collect_set, then two nested codegen explodes — r15; the former
basket-key self-equi-join paid two more corpus exchanges for the same
answer), so per-task work is bounded by the LARGEST BASKET squared,
never by corpus size — the set semantics also fix multiplicity (an item
counted once per basket). Item supports and the basket count are one
map-side-combinable aggregation each; the stat frames join back by
broadcast (item-vocabulary-sized). A support cut BEFORE the pair
expansion (``min_item_support``) prunes rare items the way frequent-
itemset miners (Apriori's first pass) do, so a 100 TB corpus with a
heavy-tailed vocabulary never expands its singleton tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cooccurrence_lift(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_item_support: int = 1,
    min_pair_support: int = 1,
) -> DataFrame:
    """Frequent item pairs with support, confidence-free lift.

    Returns one row per unordered item pair (item_a < item_b) with
      * ``pair_n``   — baskets containing both items;
      * ``supp_a`` / ``supp_b`` — baskets containing each item;
      * ``lift``     — pair_n * n_baskets / (supp_a * supp_b), rounded
        to 6 decimals (>1: co-occur more than independence predicts).

    ``min_item_support`` prunes rare items BEFORE pair generation (the
    Apriori monotonicity bound: a pair's support cannot exceed either
    item's); ``min_pair_support`` cuts the output.

    Plan shape (r15): ONE basket-key exchange builds the per-basket
    distinct item SET (groupBy + collect_set — map-side combined);
    supports, the basket count, and the pair expansion all derive from
    the set frame, so the corpus crosses the network once. The former
    spelling paid three corpus-scale exchanges — a (basket, item)
    distinct plus the basket-key self-join — for the same answer
    (measured 2.22 s → 1.73 s at sf0.1, bit-identical output). Pair
    expansion is two nested codegen'd explodes over the sorted set
    (posexplode + slice), so per-task work keeps the same
    largest-basket² bound and never leaves the task.
    """
    # pinned: supports, the basket count and the pair expansion all
    # consume this frame, and Spark does not reuse the exchange across
    # the three subtrees (verified in the executed plan) — unpinned,
    # the corpus scan + set aggregation would run three times. pin() =
    # recomputable persist, not localCheckpoint (r16: a lost executor
    # must not kill the job at scale)
    from clinical_vector_search_spark.plan_cache import pin

    # NULL items never form pairs or supports (collect_set skips NULL —
    # made explicit here, ADVICE r15): a basket of only-NULL items does
    # not count toward n_baskets, matching the set-based semantics
    sets = pin(
        df.filter(F.col(item_col).isNotNull())
        .groupBy(F.col(basket_col).alias("basket"))
        .agg(F.array_sort(F.collect_set(F.col(item_col))).alias("arr"))
    )
    supp = (
        sets.select(F.explode("arr").alias("item"))
        .groupBy("item")
        .agg(F.count("*").cast("long").alias("supp"))
    )
    if min_item_support > 1:
        supp = supp.filter(F.col("supp") >= min_item_support)
        # rebuild the sets over surviving items only (baskets whose
        # items all died drop out — same population rule as before)
        sets = pin(  # same multi-consumer pin as above
            sets.select("basket", F.explode("arr").alias("item"))
            .join(F.broadcast(supp.select("item")), "item")
            .groupBy("basket")
            .agg(F.array_sort(F.collect_set("item")).alias("arr"))
        )
    n_baskets = sets.agg(F.count("*").cast("long").alias("n_baskets"))
    # unordered pairs from the sorted set: element i pairs with every
    # later element (slice start is 1-based, hence i + 2) — item_a <
    # item_b by construction, one row per basket per pair
    e1 = sets.select("arr", F.posexplode("arr").alias("i", "item_a"))
    pairs = (
        e1.select(
            "item_a",
            F.explode(
                F.expr("slice(arr, i + 2, size(arr))")
            ).alias("item_b"),
        )
        .groupBy("item_a", "item_b")
        .agg(F.count("*").cast("long").alias("pair_n"))
        .filter(F.col("pair_n") >= min_pair_support)
    )
    sa = supp.select(
        F.col("item").alias("item_a"), F.col("supp").alias("supp_a")
    )
    sb = supp.select(
        F.col("item").alias("item_b"), F.col("supp").alias("supp_b")
    )
    return (
        pairs.join(F.broadcast(sa), "item_a")
        .join(F.broadcast(sb), "item_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "pair_n",
            "supp_a",
            "supp_b",
            F.round(
                F.col("pair_n")
                * F.col("n_baskets")
                / (F.col("supp_a") * F.col("supp_b")),
                6,
            ).alias("lift"),
        )
    )
