"""The extraction job DAG (SURVEY §3.4): pages → salted partitions →
per-profile builders → byte serializer → extracted table.

Shuffle budget: ONE explicit exchange per profile branch — the url
repartition. Hash-partitioning on the full url is the north rule's
"salt-partition on url-hash": Common-Crawl pages cluster by host, and
hashing the complete url (not the host) spreads each host's pages across
all partitions. Because every downstream key set contains `url`
(groupBy(url,page_no,y), Window.partitionBy(url), groupBy(url) for the
serializer), Catalyst's EnsureRequirements inserts no further exchange —
asserted in tests/test_plan.py. AQE skew-join/coalesce stays on as backstop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pdf_table_extractor_spark.operators.serialize import (
    serialize,
    serialize_with_empties,
)
from pdf_table_extractor_spark.ship import ensure_shipped
from pdf_table_extractor_spark.plans.profiles import PROFILES, Profile

# url shape: https://host000.example/<profile>/<doc_id>
PROFILE_FROM_URL = r"^[a-z]+://[^/]+/([A-Za-z0-9_-]+)/"


def profile_of(url: Column) -> Column:
    return F.regexp_extract(url, PROFILE_FROM_URL, 1)


def default_partitions(df: DataFrame) -> int:
    return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))


def salt_repartition(pages: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Explicit skew-breaking stage: hash-distribute whole documents by url.

    ALWAYS with an explicit partition count: a bare repartition(col) is
    AQE-coalescible, and since extraction is CPU-bound (regex + Arrow UDFs)
    the size-based coalescing heuristic would shrink a few-MB shuffle to 2-3
    partitions and idle the rest of the cluster (measured: flat 8→32-core
    scaling until this was pinned)."""
    return pages.repartition(num_partitions or default_partitions(pages), F.col("url"))


def extract(
    pages: DataFrame,
    profiles: dict[str, Profile] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → (url, profile, n_rows, csv).

    Documents whose url maps to no known profile (noise slice) pass through
    unextracted: profile='', n_rows=0, csv NULL.
    """
    profiles = profiles or PROFILES
    ensure_shipped(pages.sparkSession)
    pages = pages.withColumn("profile", profile_of(F.col("url")))

    outs: list[DataFrame] = []
    for name, prof in profiles.items():
        sub = pages.filter(F.col("profile") == name)
        if prof.salt_pages:
            # text-path branches: one explicit url-hash exchange up front;
            # every downstream key set contains url so no further shuffle.
            # UDF-first branches salt AFTER their parse UDF instead (Arrow
            # eval nodes drop outputPartitioning — see operators/lines.py).
            sub = salt_repartition(sub, num_partitions)
        recs = prof.build(sub)
        # all_urls routes zero-record docs into the output join-free
        # (n_rows=0; csv NULL, or header-only when the reference always
        # writes a file) — every input url surfaces exactly once.
        out = serialize(
            recs, name, prof.sink, all_urls=sub.select("url"), emit_empty=prof.emit_empty
        )
        outs.append(out)

    # unknown-profile passthrough (noise slice): never enters a branch
    known = F.lit(list(profiles.keys()))
    outs.append(
        pages.filter(~F.array_contains(known, F.col("profile"))).select(
            "url",
            F.lit("").alias("profile"),
            F.lit(0).alias("n_rows"),
            F.lit(None).cast("binary").alias("csv"),
        )
    )
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    return result
