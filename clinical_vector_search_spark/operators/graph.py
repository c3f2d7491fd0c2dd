"""Iterative graph algorithms over edge-list DataFrames.

Companion of the connected-components labeler in ``operators.dedup``
(``dedup_groups``): the same iterate-join-aggregate shape, here for
PageRank-style mass propagation. No reference analog — extension for
duplicate-graph analytics (e.g. rank near-dup clusters by centrality to
pick canonical survivors).

Scale notes: every iteration is one edge-key equi-join plus one dst-key
aggregation — the classic Pregel step expressed relationally. Ranks and
degrees live at node granularity; iterations persist their frame and
unpersist the previous one so the lineage (and executor storage) stays
bounded. At 100 TB the edge list shuffles on src once per iteration;
pre-partitioning edges and ranks on the join key (bucketed tables) makes
the join exchange-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    n_iter: int = 5,
    damping: float = 0.85,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint: bool = True,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    r_{k+1}(v) = (1-d)/N + d·( Σ_{u→v} r_k(u)/outdeg(u) + dangling_k/N )

    where dangling_k is the total rank mass sitting on nodes with no
    out-edges (redistributed uniformly — without it the ranks leak mass
    and no longer sum to 1; the invariant Σr = 1 is the pytest anchor).
    Undirected similarity graphs pass each pair in both directions.

    Fixed ``n_iter`` (not convergence-tested) keeps the computation a
    deterministic, engine-reproducible expression — the SQL oracle
    unrolls the same iterations. N and the dangling mass enter the plan
    as 1-row broadcast frames, not driver constants, so each iteration is
    one lazy plan materialized by its localCheckpoint.

    Returns (node_col, rank DOUBLE) — unrounded; callers round.
    ``checkpoint=False`` skips the per-iteration localCheckpoint and
    returns the fully-composed lazy plan — ONLY for plan inspection /
    audits (a real run at any depth needs the truncation; see the
    module docstring).
    """
    if checkpoint:
        # Pin the edge list ONCE before the loop: ``edges`` is usually an
        # expensive DERIVED pipeline (dedup_pagerank feeds the full
        # n-gram-Jaccard prefix-filter join; textrank the corpus bigram
        # agg) and appears in every iteration's contrib join plus the
        # degree agg — unpinned it re-executes ~2x per iteration
        # (measured 26.5 s → 13.9 s on dedup_pagerank and 16.5 s → 5.8 s
        # on text_textrank at sf0.01, cold sessions). Same
        # reclaim story as the rank pins: the ContextCleaner drops the
        # checkpointed RDDs when the frames go out of scope.
        edges = edges.localCheckpoint()
    n_frame = nodes.agg(
        F.count(F.lit(1)).cast("double").alias("_n")
    )
    deg = edges.groupBy(F.col(src_col).alias(node_col)).agg(
        F.count(F.lit(1)).cast("double").alias("_deg")
    )
    if checkpoint:
        # node-sized; broadcast fresh each iteration otherwise re-aggs
        deg = deg.localCheckpoint()
    # localCheckpoint, not cache: (a) each iteration's plan stays one
    # step deep — n_iter chained join-aggs otherwise make plan
    # stringification itself a driver-heap risk (observed on the BPE
    # loop); (b) cache would hand the caller a frame whose handle
    # nobody owns for unpersist (the r6-ADVICE leak class) — a
    # checkpointed RDD is reclaimed by the ContextCleaner when the
    # frame goes out of scope.
    ranks = (
        nodes.select(node_col)
        .crossJoin(F.broadcast(n_frame))
        .select(node_col, (F.lit(1.0) / F.col("_n")).alias("rank"))
    )
    if checkpoint:
        ranks = ranks.localCheckpoint()
    for _ in range(n_iter):
        with_deg = ranks.join(F.broadcast(deg), node_col, "left")
        dangling = with_deg.filter(F.col("_deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dang")
        )
        contrib = (
            edges.join(
                with_deg.filter(F.col("_deg").isNotNull()).select(
                    F.col(node_col).alias(src_col),
                    (F.col("rank") / F.col("_deg")).alias("_share"),
                ),
                src_col,
            )
            .groupBy(F.col(dst_col).alias(node_col))
            .agg(F.sum("_share").alias("_c"))
        )
        ranks = (
            nodes.select(node_col)
            .join(contrib, node_col, "left")
            .crossJoin(F.broadcast(n_frame))
            .crossJoin(F.broadcast(dangling))
            .select(
                node_col,
                (
                    F.lit(1.0 - damping) / F.col("_n")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("_c"), F.lit(0.0))
                        + F.col("_dang") / F.col("_n")
                    )
                ).alias("rank"),
            )
        )
        if checkpoint:
            ranks = ranks.localCheckpoint()
    return ranks


def triangle_count(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-node triangle participation via degree-ordered orientation.

    Input: an undirected edge list (either or both directions, self-loops
    and duplicates tolerated — canonicalized internally). Output: one row
    per node appearing in ≥1 triangle with its triangle count
    (``n_triangles``); sum(n_triangles)/3 is the global triangle count.

    Scale notes — why this is not the naive 3-way self-join: edges are
    oriented from the (degree, id)-SMALLER endpoint to the larger, which
    bounds every node's out-degree by O(sqrt(m)) (a classic result:
    a node of degree d > sqrt(m) has < sqrt(m) higher-degree neighbors).
    Wedges are then one src-key self-join (per-task work ≤ out-degree²,
    i.e. ≤ m, never degree² of a hub), and each triangle is closed by
    exactly ONE (wedge ⋈ oriented-edge) equi-join probe — counted once,
    no /6 correction, no hub blow-up. Three shuffles total (degree agg,
    wedge join, closing join), all on edge keys.
    """
    und = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("u"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("deg_v"))
    # orient low-(deg, id) -> high-(deg, id); ids break degree ties so the
    # order is total and every edge gets exactly one direction
    lower_first = (F.col("deg_u") < F.col("deg_v")) | (
        (F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v"))
    )
    ori = (
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("a"),
            F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        )
    )
    e1 = ori.select(F.col("a"), F.col("b").alias("x"))
    e2 = ori.select(F.col("a"), F.col("b").alias("y"))
    wedges = e1.join(e2, "a").filter(F.col("x") < F.col("y"))
    closed = wedges.join(
        ori.select(F.col("a").alias("x"), F.col("b").alias("y")).unionAll(
            ori.select(F.col("b").alias("x"), F.col("a").alias("y"))
        ),
        ["x", "y"],
    )
    tri_nodes = (
        closed.select(F.col("a").alias("node"))
        .unionAll(closed.select(F.col("x").alias("node")))
        .unionAll(closed.select(F.col("y").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )
    return tri_nodes


def bfs_levels(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
) -> DataFrame:
    """Single/multi-source BFS hop distance over an undirected edge
    list, bounded at ``max_hops`` — the reachability primitive behind
    link-graph crawl-depth audits and near-dup cluster diameter checks.

    Fixed iteration count (the PageRank/kcore discipline): a SQL oracle
    unrolls the identical expansions with a recursive CTE capped at the
    same depth. Each hop is ONE frontier⋈edges equi-join + a min-dist
    aggregation, localCheckpoint-pinned so lineage stays flat. The
    frontier for hop i+1 is only the nodes FIRST reached at hop i
    (dist == i), so settled nodes are never re-expanded — per-hop work
    is O(edges incident to the frontier), the relational spelling of
    textbook BFS.

    Output: (node, dist) for every node within ``max_hops`` of any
    source (sources themselves at dist 0). Integer distances — exact in
    any engine.
    """
    sym = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    ).unionAll(
        edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
    ).localCheckpoint()  # pinned once — joined by EVERY hop (see pagerank)
    dist = sources.select(
        F.col(node_col).alias("node"), F.lit(0).alias("dist")
    ).localCheckpoint()
    frontier = dist
    for hop in range(1, max_hops + 1):
        reached = (
            frontier.join(sym, frontier.node == sym.a)
            .select(F.col("b").alias("node"), F.lit(hop).alias("dist"))
            .join(dist.select("node"), "node", "left_anti")
            .distinct()
            .localCheckpoint()
        )
        dist = dist.unionAll(reached).localCheckpoint()
        frontier = reached
    return dist


def kcore(
    edges: DataFrame,
    k: int = 3,
    n_iter: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """k-core peeling: repeatedly delete nodes of degree < k until the
    k-core remains (every surviving node has ≥ k neighbors INSIDE the
    core) — the dense-subgraph extractor behind spam-cluster mining and
    community seeds; the iterative cousin of ``triangle_count``'s static
    density read.

    Fixed ``n_iter`` peels (the PageRank/BPE iterative-agg discipline:
    a deterministic iteration count keeps the plan — and any SQL oracle
    that unrolls it — exactly reproducible; real peeling converges in a
    handful of rounds on power-law graphs because each round removes a
    degree-layer, and the remaining frame shrinks monotonically). Each
    iteration is ONE degree aggregation + TWO endpoint semi-joins on the
    surviving node set, localCheckpoint-pinned so lineage stays flat.

    Output: (node, core_deg) — the subgraph degree of each surviving
    node after the final peel (core_deg ≥ k iff converged; callers can
    assert min(core_deg) ≥ k as the convergence check).
    """
    cur = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("u"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        # pinned once: iteration 1 reads cur three times (degree agg +
        # two semi joins) — unpinned, the input pipeline runs three
        # times before the first end-of-iteration checkpoint exists
        .localCheckpoint()
    )
    for _ in range(n_iter):
        deg = (
            cur.select(F.col("u").alias("node"))
            .unionAll(cur.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= k).select("node")
        cur = (
            cur.join(
                keep.withColumnRenamed("node", "u"), "u", "left_semi"
            ).join(keep.withColumnRenamed("node", "v"), "v", "left_semi")
        ).localCheckpoint()
    return (
        cur.select(F.col("u").alias("node"))
        .unionAll(cur.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("core_deg"))
    )


def textrank_keywords(
    docs: DataFrame,
    text_col: str = "text",
    min_support: int = 3,
    top_k: int = 30,
    n_iter: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank
    over the word-adjacency graph. Bigram edges come from the raw token
    stream by expression-level slice/zip (no position self-join);
    content words only (len ≥ 3, non-stopword); undirected support cut
    at ``min_support`` bounds the graph to vocabulary size — so the
    iterations run at VOCABULARY granularity no matter the corpus size,
    and only the one bigram aggregation scales with tokens. Output:
    (term, rank, rn) for the rounded-before-rank top ``top_k``.

    Scale rule (probe-measured, README §scale-probe): ``min_support``
    must scale WITH the corpus — supports grow linearly in corpus size,
    so a fixed cut admits ever more of the bigram tail and the graph
    (hence the PageRank stages) grows with it; scaled proportionally,
    the graph is size-invariant and only the bigram agg tracks tokens.
    """
    from pyspark.sql import Window

    from clinical_vector_search_spark.functions import text as TXT

    toks = docs.select(TXT.tokenize(text_col).alias("t")).filter(
        F.size("t") >= 2
    )
    bi = toks.select(
        F.explode(
            F.arrays_zip(
                F.expr("slice(t, 1, size(t) - 1)"),
                F.expr("slice(t, 2, size(t) - 1)"),
            )
        ).alias("p")
    ).select(F.col("p.0").alias("a"), F.col("p.1").alias("b"))
    stop = F.array(*[F.lit(w) for w in TXT.STOPWORDS])
    content = (
        (F.length("a") >= 3)
        & (F.length("b") >= 3)
        & ~F.array_contains(stop, F.col("a"))
        & ~F.array_contains(stop, F.col("b"))
        & (F.col("a") != F.col("b"))
    )
    und = (
        bi.filter(content)
        .groupBy(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_support)
    )
    edges = und.select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    ).unionAll(und.select(F.col("v").alias("src"), F.col("u").alias("dst")))
    nodes = edges.select(F.col("src").alias("node")).distinct()
    pr = pagerank(nodes, edges, n_iter=n_iter, damping=damping)
    w = Window.orderBy(F.desc("rank"), "node")
    return (
        pr.select("node", F.round("rank", 9).alias("rank"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_k)
        .select(
            F.col("node").alias("term"),
            "rank",
            F.col("rn").cast("int").alias("rn"),
        )
    )


def label_propagation(
    edges: DataFrame,
    n_iter: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    2007): every node adopts the most frequent label among its
    neighbors each round, ties broken by the SMALLEST label — the total
    tie-break that makes the sweep deterministic and therefore
    SQL-oracle-unrollable (classic LPA breaks ties randomly; determinism
    is this repo's contract). Fixed ``n_iter`` rounds, localCheckpoint-
    pinned (the PageRank/kcore discipline). Communities are denser than
    connected components (``dedup_groups``) — a bridge edge doesn't
    merge two tightly-knit clusters.

    Scale shape per round: one neighbor-label equi-join (edge-key
    shuffle) + a (node, label) count aggregation + a window argmax at
    (node, label) granularity. Labels start as node ids; isolated nodes
    never appear (no edges → no rows), matching the SQL spelling.

    Output: (node, label) after the final round.
    """
    from pyspark.sql import Window

    sym = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    ).unionAll(
        edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
    ).distinct().localCheckpoint()
    labels = sym.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    ).localCheckpoint()
    for _ in range(n_iter):
        nbr = sym.join(
            labels.select(
                F.col("node").alias("b"), F.col("label").alias("nbr_label")
            ),
            "b",
        ).select(F.col("a").alias("node"), F.col("nbr_label"))
        cnt = nbr.groupBy("node", "nbr_label").agg(
            F.count(F.lit(1)).alias("n")
        )
        w = Window.partitionBy("node").orderBy(
            F.desc("n"), F.asc("nbr_label")
        )
        labels = (
            cnt.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("node", F.col("nbr_label").alias("label"))
            .localCheckpoint()
        )
    return labels


def personalized_pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    restart: DataFrame,
    n_iter: int = 5,
    damping: float = 0.85,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "weight",
) -> DataFrame:
    """Topic-sensitive / personalized PageRank (Haveliwala 2002): the
    random surfer teleports to the RESTART distribution instead of
    uniformly —

        r_{k+1}(v) = (1−d)·w_v + d·( Σ_{u→v} r_k(u)/outdeg(u)
                                     + dangling_k·w_v )

    which makes the ranks a relevance field around the seed set: the
    graph-native "related items" / graph-RAG primitive (``pagerank``
    with w = 1/N is the global-importance special case; kept separate
    so the uniform path stays bit-identical for its oracles).

    ``restart`` is (node, weight ≥ 0) with at least one POSITIVE weight
    — a zero/empty total has no distribution to normalize and yields
    NULL ranks (caller contract, same class as woe_iv's nonzero-variance
    requirement). Weights are normalized to sum 1 through a broadcast
    stat frame (never a driver constant). Nodes
    outside the seed set have w = 0 — mass reaches them only through
    edges, and dangling mass flows BACK to the seeds, exactly what
    keeps the field localized. Same fixed-iteration + localCheckpoint
    discipline as ``pagerank``; the oracle unrolls identically.
    """
    w_norm = restart.crossJoin(
        F.broadcast(restart.agg(F.sum(weight_col).alias("_tot")))
    ).select(
        node_col, (F.col(weight_col) / F.col("_tot")).alias("_w")
    )
    weights = nodes.select(node_col).join(w_norm, node_col, "left").select(
        node_col, F.coalesce("_w", F.lit(0.0)).alias("_w")
    ).localCheckpoint()
    # pin the (possibly expensive derived) edge list once — same
    # per-iteration re-execution trap as pagerank (see its comment)
    edges = edges.localCheckpoint()
    deg = edges.groupBy(F.col(src_col).alias(node_col)).agg(
        F.count(F.lit(1)).cast("double").alias("_deg")
    ).localCheckpoint()
    ranks = weights.select(node_col, F.col("_w").alias("rank"))
    ranks = ranks.localCheckpoint()
    for _ in range(n_iter):
        with_deg = ranks.join(F.broadcast(deg), node_col, "left")
        dangling = with_deg.filter(F.col("_deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dang")
        )
        contrib = (
            edges.join(
                with_deg.filter(F.col("_deg").isNotNull()).select(
                    F.col(node_col).alias(src_col),
                    (F.col("rank") / F.col("_deg")).alias("_share"),
                ),
                src_col,
            )
            .groupBy(F.col(dst_col).alias(node_col))
            .agg(F.sum("_share").alias("_c"))
        )
        ranks = (
            weights.join(contrib, node_col, "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                node_col,
                (
                    F.lit(1.0 - damping) * F.col("_w")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("_c"), F.lit(0.0))
                        + F.col("_dang") * F.col("_w")
                    )
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks
