"""The spark-submit entry point (north rule: ``spark-submit --py-files
engine.zip job.py``): checkpoint-resumable extraction over a pages table.

Work is split into url-hash buckets (``pmod(xxhash64(url), n_buckets)``) —
the unit of commit AND the skew-breaking salt: bucket membership hashes the
full url, so a hot host's pages scatter across all buckets. Each bucket is
extracted, written, and committed atomically with its lineage counters; a
crash loses at most the in-flight bucket, and a resumed run processes only
uncommitted buckets (plus a belt-and-suspenders anti-join against committed
urls inside a partially-recovered bucket).

Usage::

    spark-submit --py-files engine.zip job.py \
        --pages /path/pages_parquet --out /path/out [--buckets 64]
"""

from __future__ import annotations

import argparse
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_table_extractor_spark.operators.quarantine import parse_failures, validate_pages
from pdf_table_extractor_spark.plans.extract import extract, extract_spans
from pdf_table_extractor_spark.ship import ensure_shipped
from pdf_table_extractor_spark.sources.catalog import LocalCatalog


def bucket_of(url, n_buckets: int):
    return F.pmod(F.xxhash64(url), F.lit(n_buckets))


def stage_pages(spark: SparkSession, pages_path: str, out_root: str, n_buckets: int) -> str:
    """One-time bucket-partitioned staging of the input (idempotent).

    The bucket id is `pmod(xxhash64(url), n)` — not a physical column — so
    per-bucket filters on the raw input CANNOT be pushed down: every bucket
    action would re-scan and re-decode the WHOLE table (64 buckets at
    100 TB = 6.4 PB of reads). Staging pays ONE full read + ONE
    partitioned write up front; every bucket action afterwards reads only
    its `bucket=<b>/` partition via partition pruning (total I/O: 2× the
    input instead of n_buckets×). Spark's `_SUCCESS` marker is the commit:
    a crash mid-stage leaves no marker and the overwrite rerun is clean.
    An Iceberg deployment gets the same effect from hidden partitioning on
    ingest — this is the plain-parquet equivalent.

    Idempotence is keyed on an input FINGERPRINT, not just `_SUCCESS`: a
    marker file next to the staged copy records (pages_path, newest data-
    file mtime, file count, total bytes). If the input at pages_path is
    regenerated (the bench corpora routinely are), a rerun into the same
    out_root detects the mismatch and re-stages instead of silently
    extracting from stale staged data."""
    import json
    import os

    def _fingerprint() -> str:
        names = sorted(
            f for f in os.listdir(pages_path) if not f.startswith(("_", "."))
        ) if os.path.isdir(pages_path) else []
        stats = [os.stat(os.path.join(pages_path, f)) for f in names]
        return json.dumps({
            "pages_path": os.path.abspath(pages_path),
            "n_files": len(names),
            "total_bytes": sum(s.st_size for s in stats),
            "max_mtime_ns": max((s.st_mtime_ns for s in stats), default=0),
        }, sort_keys=True)

    staged = os.path.join(out_root, "staged_pages")
    marker = os.path.join(out_root, "staged_pages.fingerprint")
    fp = _fingerprint()
    fresh = os.path.exists(os.path.join(staged, "_SUCCESS"))
    if fresh:
        try:
            with open(marker) as fh:
                fresh = fh.read() == fp
        except OSError:
            fresh = False
    if not fresh:
        (
            spark.read.parquet(pages_path)
            .withColumn("bucket", bucket_of(F.col("url"), n_buckets))
            .write.partitionBy("bucket")
            .mode("overwrite")
            .parquet(staged)
        )
        with open(marker, "w") as fh:
            fh.write(fp)
    return staged


def run_job(
    spark: SparkSession,
    pages_path: str,
    out_root: str,
    n_buckets: int = 8,
    fail_after_bucket: int | None = None,
    concurrency: int = 1,
    stage_input: bool = True,
    emit_spans: bool = False,
) -> LocalCatalog:
    """Extract all uncommitted buckets; returns the catalog.

    ``stage_input`` (default) first writes a bucket-partitioned copy of the
    input so per-bucket reads partition-prune instead of re-scanning the
    whole table once per bucket — see `stage_pages`. Pass False to filter
    the raw input directly (only sensible for tiny inputs or n_buckets=1).

    ``concurrency`` > 1 processes buckets from driver threads (Spark actions
    are thread-safe; the scheduler interleaves their stages) — overlapping
    buckets hides each action's fixed stage-sequencing floor, which is the
    dominant cost when buckets are small. Commits stay per-bucket atomic.

    ``fail_after_bucket`` injects a crash after N bucket commits (tests)."""
    ensure_shipped(spark)
    catalog = LocalCatalog(out_root)
    if stage_input:
        pages = spark.read.parquet(stage_pages(spark, pages_path, out_root, n_buckets))
    else:
        pages = spark.read.parquet(pages_path).withColumn(
            "bucket", bucket_of(F.col("url"), n_buckets)
        )
    done = set(catalog.committed_buckets())
    committed_urls = catalog.committed_urls(spark)
    todo = [b for b in range(n_buckets) if b not in done]

    if concurrency > 1 and fail_after_bucket is None:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=concurrency) as pool:
            list(
                pool.map(
                    # use_cache=False: N concurrently-cached buckets thrash
                    # the storage pool (measured: 8×50k-doc cached buckets
                    # stalled an 8g heap); the extra scans are cheaper.
                    lambda b: _run_bucket(
                        spark, catalog, pages, committed_urls, b,
                        use_cache=False, emit_spans=emit_spans,
                    ),
                    todo,
                )
            )
        return catalog

    n_done_this_run = 0
    for b in todo:
        _run_bucket(spark, catalog, pages, committed_urls, b, emit_spans=emit_spans)
        n_done_this_run += 1
        if fail_after_bucket is not None and n_done_this_run >= fail_after_bucket:
            raise RuntimeError(f"injected failure after {n_done_this_run} buckets")
    return catalog


def _run_bucket(
    spark, catalog, pages, committed_urls, b,
    use_cache: bool = False, emit_spans: bool = False,
) -> None:
    t0 = time.perf_counter()
    sub = pages.filter(F.col("bucket") == b).drop("bucket")
    if committed_urls is not None:
        # idempotence even if commit state is partially recovered
        sub = sub.join(committed_urls, "url", "left_anti")
    # Poison-pill containment (operators/quarantine.py): structurally-bad
    # rows (null url / no payload / oversized) go to a per-bucket
    # quarantine table instead of an Arrow batch; parse-level poison inside
    # the UDFs degrades per-document and ticks the parse_failures
    # accumulator, snapshotted into this bucket's lineage below (approx
    # under task retries / concurrent buckets — the quarantine TABLE is
    # the exact record).
    sub, quarantined = validate_pages(sub)
    acc = parse_failures(spark.sparkContext)
    failures_before = acc.value if acc is not None else 0
    if use_cache:
        # round-1 relic: the old extract DAG fanned one scan into 16
        # branches, so caching the bucket was load-bearing. The single-pass
        # extract consumes `sub` exactly twice (text + html exchange
        # children) against a partition-pruned staged read, so the cache
        # now only trades one cheap read for storage-pool pressure — off
        # by default, kept as a knob for unstaged inputs.
        sub = sub.cache()
    out = extract(sub).cache()
    spans = extract_spans(sub) if emit_spans else None
    quarantined = quarantined.cache()
    n_quarantined = quarantined.count()
    stats = out.agg(
        F.count("*").alias("n_pages"),
        F.count("csv").alias("n_ok"),
        F.coalesce(F.sum("n_rows"), F.lit(0)).alias("n_rows_total"),
        F.coalesce(F.sum(F.length("csv")), F.lit(0)).alias("bytes_out"),
    ).first()
    catalog.commit_bucket(
        out,
        b,
        {
            **({"n_spans": spans.count()} if spans is not None else {}),
            "n_pages": stats.n_pages,
            "n_ok": stats.n_ok,
            "n_empty": stats.n_pages - stats.n_ok,
            "n_quarantined": n_quarantined,
            "n_parse_failed": (
                (acc.value - failures_before) if acc is not None else 0
            ),
            "n_rows_total": int(stats.n_rows_total),
            "bytes_out": int(stats.bytes_out),
            "wall_ms": int((time.perf_counter() - t0) * 1000),
        },
        spans_df=spans,
        quarantine_df=quarantined if n_quarantined else None,
    )
    quarantined.unpersist()
    out.unpersist()
    if use_cache:
        sub.unpersist()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--buckets", type=int, default=8)
    ap.add_argument("--concurrency", type=int, default=1)
    ap.add_argument("--spans", action="store_true", help="also commit table-span rows per bucket")
    args = ap.parse_args()
    from pdf_table_extractor_spark.session import build_spark

    spark = build_spark(app_name="extract-job")
    catalog = run_job(
        spark, args.pages, args.out, args.buckets,
        concurrency=args.concurrency, emit_spans=args.spans,
    )
    print(f"committed buckets: {catalog.committed_buckets()}")
    for row in catalog.lineage_rows():
        print(row)


if __name__ == "__main__":
    main()
