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
) -> DataFrame:
    """(host, pr): weighted PageRank with uniform teleport and dangling
    mass redistributed uniformly:

        pr'(v) = (1-d)/N + d * ( Σ_{u→v} pr(u)·w(u,v)/W_out(u) + D/N )

    where D is the total rank held by nodes without out-edges. The final
    ranks are rounded (default 6 decimals) so an external oracle that
    unrolls the same iterations agrees despite engine float-summation
    order. Self-loops count like any edge."""
    src, dst = F.col(src_col), F.col(dst_col)
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    e = edges.select(src.alias("src"), dst.alias("dst"), w.alias("w"))
    nodes = (
        e.select(F.col("src").alias("host"))
        .union(e.select(F.col("dst").alias("host")))
        .distinct()
        .localCheckpoint()
    )
    n_row = nodes.select(F.count("*").cast("double").alias("__n"))
    outw = e.groupBy(F.col("src").alias("host")).agg(F.sum("w").alias("__ow"))
    # share each edge carries of its source's rank (static — compute once)
    share = e.join(
        outw.withColumnRenamed("host", "src"), "src"
    ).select("src", "dst", (F.col("w") / F.col("__ow")).alias("__share"))
    share = share.localCheckpoint()

    # dangling host SET is static — derive it once (nodes minus sources),
    # never re-aggregate the corpus-scale edge input inside the loop
    dang_nodes = nodes.join(outw.select("host"), "host", "left_anti").localCheckpoint()

    pr = nodes.crossJoin(F.broadcast(n_row)).select(
        "host", (F.lit(1.0) / F.col("__n")).alias("pr")
    )
    for _ in range(iters):
        contrib = (
            share.join(pr.withColumnRenamed("host", "src"), "src")
            .groupBy(F.col("dst").alias("host"))
            .agg(F.sum(F.col("pr") * F.col("__share")).alias("__c"))
        )
        dangling = (
            pr.join(dang_nodes, "host", "semi")
            .select(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("__d"))
        )
        pr = (
            nodes.join(contrib, "host", "left")
            .crossJoin(F.broadcast(dangling))
            .crossJoin(F.broadcast(n_row))
            .select(
                "host",
                (
                    F.lit(1.0 - damping) / F.col("__n")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("__c"), F.lit(0.0))
                        + F.col("__d") / F.col("__n")
                    )
                ).alias("pr"),
            )
            .localCheckpoint()
        )
    return pr.select("host", F.round("pr", round_to).alias("pr"))
