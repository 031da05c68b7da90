"""Host-graph algorithms for crawl curation: PageRank as the canonical
quality prior over the link graph (CommonCrawl host ranks, spam-cluster
demotion, frontier prioritization).

Spark-first shape: each power iteration is two equi-joins keyed on the
host plus two 1-row aggregates (dangling mass, node count) broadcast
back — no driver-side graph, no collect; lineage is truncated per
iteration with localCheckpoint so the plan stays flat at any iteration
count. Connected components live in operators/dedup.cc_labels (the
propagate-then-jump min-label loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    *,
    iters: int = 10,
    damping: float = 0.85,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    weight_col: str | None = "n_links",
    round_to: int = 6,
    rows_per_partition: int = 500_000,
) -> DataFrame:
    """(host, pr): weighted PageRank with uniform teleport and dangling
    mass redistributed uniformly:

        pr'(v) = (1-d)/N + d * ( Σ_{u→v} pr(u)·w(u,v)/W_out(u) + D/N )

    where D is the total rank held by nodes without out-edges. The final
    ranks are rounded (default 6 decimals) so an external oracle that
    unrolls the same iterations agrees despite engine float-summation
    order. Self-loops count like any edge.

    Per-iteration cost (round-4 trim): the node count N is collected
    ONCE at setup (one long — model-sized by design) and folded in as a
    literal, and the dangling-host set is a static boolean carried on
    the rank table, so each iteration is exactly one contribution
    join+agg, one 1-row dangling aggregate (broadcast), and the
    localCheckpoint materialization — no per-iteration semi-join, no
    per-iteration N broadcast job. The iterative stages also run at a
    share-table-derived shuffle width (set/restore around the loop, same
    rationale as dedup.cc_labels): the host graph is orders of magnitude
    smaller than the corpus, and at 10^12 edges the cap leaves the
    caller's width in place."""
    src, dst = F.col(src_col), F.col(dst_col)
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    e = edges.select(src.alias("src"), dst.alias("dst"), w.alias("w"))
    nodes = (
        e.select(F.col("src").alias("host"))
        .union(e.select(F.col("dst").alias("host")))
        .distinct()
        .localCheckpoint()
    )
    n = float(nodes.count())  # 1 driver long: static across all iterations
    outw = e.groupBy(F.col("src").alias("host")).agg(F.sum("w").alias("__ow"))
    # share each edge carries of its source's rank (static — compute once)
    share = e.join(
        outw.withColumnRenamed("host", "src"), "src"
    ).select("src", "dst", (F.col("w") / F.col("__ow")).alias("__share"))
    share = share.localCheckpoint()

    spark = edges.sparkSession
    sp_key = "spark.sql.shuffle.partitions"
    old_sp = spark.conf.get(sp_key)
    n_part = max(1, min(int(old_sp), -(-share.count() // rows_per_partition)))
    spark.conf.set(sp_key, str(n_part))
    try:
        # dangling flag is static — derive it once (nodes minus sources) and
        # carry it ON the rank rows; never re-join inside the loop
        pr = (
            nodes.join(
                outw.select("host").withColumn("__has_out", F.lit(True)),
                "host",
                "left",
            )
            .select(
                "host",
                F.lit(1.0 / n).alias("pr"),
                F.col("__has_out").isNull().alias("__dang"),
            )
            .localCheckpoint()
        )
        for _ in range(iters):
            contrib = (
                share.join(pr.withColumnRenamed("host", "src"), "src")
                .groupBy(F.col("dst").alias("host"))
                .agg(F.sum(F.col("pr") * F.col("__share")).alias("__c"))
            )
            dangling = pr.where(F.col("__dang")).select(
                F.coalesce(F.sum("pr"), F.lit(0.0)).alias("__d")
            )
            pr = (
                pr.join(contrib, "host", "left")
                .crossJoin(F.broadcast(dangling))
                .select(
                    "host",
                    (
                        F.lit((1.0 - damping) / n)
                        + F.lit(damping)
                        * (
                            F.coalesce(F.col("__c"), F.lit(0.0))
                            + F.col("__d") / F.lit(n)
                        )
                    ).alias("pr"),
                    "__dang",
                )
                .localCheckpoint()
            )
    finally:
        spark.conf.set(sp_key, old_sp)
    return pr.select("host", F.round("pr", round_to).alias("pr"))


def triangle_count(
    edges: DataFrame,
    *,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
) -> DataFrame:
    """(host, n_triangles): per-node triangle counts over the UNDIRECTED
    simple graph induced by the edge list (direction, weights, self-loops
    and duplicate edges ignored). The classic webgraph density signal:
    link farms and spam clusters are triangle-dense, organic link
    neighborhoods are sparse.

    Scale shape (Suri & Vassilvitskii's degree-ordered orientation): each
    undirected edge is oriented from its lower-(degree, id) endpoint to
    the higher one, so every wedge is generated at its LOWEST-degree
    corner — the self-join fan-out per node is bounded by O(sqrt(m))
    even on power-law webgraphs where a naive neighbor self-join on a
    celebrity host explodes quadratically. Each triangle is then closed
    exactly once by an equi-join of the wedge's far pair against the
    canonical edge set — all joins are equi-joins (no cartesian), all
    aggregates map-side combinable, nothing collected to the driver.

    Nodes that touch an edge but close no triangle are kept with count 0
    (left join back to the node set), so the output is a total function
    over the graph's vertices."""
    a, b = F.col(src_col), F.col(dst_col)
    und = (
        edges.where(a != b)
        .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("v"))
        .union(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    ranked = (
        und.join(deg.select(F.col("v").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("d").alias("db")), "b")
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = ranked.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
    )
    # wedges at the low corner; far pair re-canonicalized for the closing
    # equi-join (the closing edge's own orientation is irrelevant)
    e1 = oriented.select(F.col("lo"), F.col("hi").alias("h1"))
    e2 = oriented.select(F.col("lo"), F.col("hi").alias("h2"))
    wedges = e1.join(e2, "lo").where(F.col("h1") < F.col("h2"))
    tri = wedges.join(
        und.select(F.col("a").alias("h1"), F.col("b").alias("h2")), ["h1", "h2"]
    )
    corners = (
        tri.select(F.col("lo").alias("host"))
        .union(tri.select(F.col("h1").alias("host")))
        .union(tri.select(F.col("h2").alias("host")))
        .groupBy("host")
        .agg(F.count("*").alias("n_triangles"))
    )
    nodes = deg.select(F.col("v").alias("host"))
    return nodes.join(corners, "host", "left").select(
        "host", F.coalesce(F.col("n_triangles"), F.lit(0)).alias("n_triangles")
    )


def hits(
    edges: DataFrame,
    *,
    iters: int = 8,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    weight_col: str | None = "n_links",
    round_to: int = 6,
    rows_per_partition: int = 500_000,
) -> DataFrame:
    """(host, hub, auth): Kleinberg's HITS (JACM 1999) over the link
    graph — the hub/authority complement to PageRank's single prior
    (mutually reinforcing: good hubs point at good authorities). Per
    iteration, in published order: auth'(v) = Σ_{u→v} hub(u)·w, then
    hub'(u) = Σ_{u→v} auth'(v)·w, each L2-normalized over ALL nodes.
    Final scores rounded (default 6 dp) so an oracle unrolling the same
    iterations agrees despite summation-order float drift.

    Scale shape (same discipline as pagerank above): each iteration is
    two equi-joins on the host key plus two 1-row norm aggregates
    broadcast back; scores live in ONE (host, hub, auth) table,
    localCheckpointed per iteration so the plan stays flat; the loop
    runs at an edge-derived shuffle width. No driver-side graph."""
    src, dst = F.col(src_col), F.col(dst_col)
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    e = edges.select(src.alias("src"), dst.alias("dst"), w.alias("w"))
    e = e.localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("host"))
        .union(e.select(F.col("dst").alias("host")))
        .distinct()
        .localCheckpoint()
    )
    spark = edges.sparkSession
    sp_key = "spark.sql.shuffle.partitions"
    old_sp = spark.conf.get(sp_key)
    n_part = max(1, min(int(old_sp), -(-e.count() // rows_per_partition)))
    spark.conf.set(sp_key, str(n_part))
    try:
        scores = nodes.select(
            "host", F.lit(1.0).alias("hub"), F.lit(1.0).alias("auth")
        ).localCheckpoint()
        for _ in range(iters):
            a_raw = (
                e.join(
                    scores.select(F.col("host").alias("src"), "hub"), "src"
                )
                .groupBy(F.col("dst").alias("host"))
                .agg(F.sum(F.col("hub") * F.col("w")).alias("__a"))
            )
            a_full = scores.join(a_raw, "host", "left").select(
                "host", "hub", F.coalesce("__a", F.lit(0.0)).alias("auth")
            )
            a_norm = a_full.select(
                F.sqrt(F.sum(F.col("auth") * F.col("auth"))).alias("__na")
            )
            a_full = (
                a_full.crossJoin(F.broadcast(a_norm))
                .select(
                    "host", "hub", (F.col("auth") / F.col("__na")).alias("auth")
                )
                .localCheckpoint()
            )
            h_raw = (
                e.join(
                    a_full.select(F.col("host").alias("dst"), "auth").withColumnRenamed(
                        "auth", "__dauth"
                    ),
                    "dst",
                )
                .groupBy(F.col("src").alias("host"))
                .agg(F.sum(F.col("__dauth") * F.col("w")).alias("__h"))
            )
            h_full = a_full.join(h_raw, "host", "left").select(
                "host", F.coalesce("__h", F.lit(0.0)).alias("hub"), "auth"
            )
            h_norm = h_full.select(
                F.sqrt(F.sum(F.col("hub") * F.col("hub"))).alias("__nh")
            )
            scores = (
                h_full.crossJoin(F.broadcast(h_norm))
                .select(
                    "host", (F.col("hub") / F.col("__nh")).alias("hub"), "auth"
                )
                .localCheckpoint()
            )
    finally:
        spark.conf.set(sp_key, old_sp)
    return scores.select(
        "host", F.round("hub", round_to).alias("hub"), F.round("auth", round_to).alias("auth")
    )


def label_propagation(
    edges: DataFrame,
    *,
    iters: int = 3,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    weight_col: str | None = "n_links",
    rows_per_partition: int = 500_000,
) -> DataFrame:
    """(host, community): synchronous label propagation (Raghavan,
    Albert & Kumara 2007) for community detection over the host graph —
    the spam-farm/link-ring detector that splits DENSE clusters where
    connected components merge everything reachable. Deterministic
    variant: every node starts as its own label; each round it adopts
    the label with the highest total edge weight among its neighbours
    (edges undirected), ties broken by the lexicographically smallest
    label; nodes with no neighbours keep their label. Fixed ``iters``
    rounds (synchronous LPA has no convergence guarantee — bipartite
    oscillation is real — so bounded rounds + deterministic ties make
    replays exact).

    Scale: per round, one equi-join of labels onto the undirected edge
    list, one (node, label) weight aggregate, and one per-node argmax
    window whose partition is the node's distinct-neighbour-label set
    (degree-bounded — the same key profile as any adjacency aggregate);
    localCheckpoint keeps the plan flat."""
    src, dst = F.col(src_col), F.col(dst_col)
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    directed = edges.select(src.alias("u"), dst.alias("v"), w.alias("w"))
    und = directed.union(
        directed.select(F.col("v").alias("u"), F.col("u").alias("v"), "w")
    )
    # parallel edges / both-direction duplicates fold into one weight
    und = und.groupBy("u", "v").agg(F.sum("w").alias("w")).localCheckpoint()
    nodes = und.select(F.col("u").alias("host")).distinct().localCheckpoint()

    spark = edges.sparkSession
    sp_key = "spark.sql.shuffle.partitions"
    old_sp = spark.conf.get(sp_key)
    n_part = max(1, min(int(old_sp), -(-und.count() // rows_per_partition)))
    spark.conf.set(sp_key, str(n_part))
    try:
        from pyspark.sql import Window

        labels = nodes.select("host", F.col("host").alias("community"))
        labels = labels.localCheckpoint()
        for _ in range(iters):
            votes = (
                und.join(
                    labels.select(F.col("host").alias("v"), "community"), "v"
                )
                .groupBy(F.col("u").alias("host"), "community")
                .agg(F.sum("w").alias("__wt"))
            )
            win = Window.partitionBy("host").orderBy(
                F.desc("__wt"), F.asc("community")
            )
            best = (
                votes.withColumn("__rk", F.row_number().over(win))
                .where(F.col("__rk") == 1)
                .select("host", F.col("community").alias("__new"))
            )
            labels = (
                labels.join(best, "host", "left")
                .select(
                    "host",
                    F.coalesce("__new", "community").alias("community"),
                )
                .localCheckpoint()
            )
    finally:
        spark.conf.set(sp_key, old_sp)
    return labels
