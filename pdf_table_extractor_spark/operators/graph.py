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
