"""Checkpoint-resume semantics (SURVEY §5 item 4): crash after partial
commit → rerun → identical final table, no duplicates, lineage complete."""

from __future__ import annotations

import pytest

from pdf_table_extractor_spark import synth
from pdf_table_extractor_spark.job import run_job

N_DOCS = 60
N_BUCKETS = 4


@pytest.fixture()
def pages_path(spark, tmp_path):
    p = str(tmp_path / "pages")
    synth.synth_spark(spark, N_DOCS, parallelism=4).write.parquet(p)
    return p


def test_crash_and_resume(spark, tmp_path, pages_path):
    out = str(tmp_path / "out")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_job(spark, pages_path, out, n_buckets=N_BUCKETS, fail_after_bucket=2)

    from pdf_table_extractor_spark.sources.catalog import LocalCatalog

    cat = LocalCatalog(out)
    partial = cat.committed_buckets()
    assert len(partial) == 2  # crash kept exactly the committed buckets
    partial_urls = {r.url for r in cat.read_data(spark).select("url").collect()}

    cat2 = run_job(spark, pages_path, out, n_buckets=N_BUCKETS)
    assert cat2.committed_buckets() == list(range(N_BUCKETS))
    rows = cat2.read_data(spark).collect()
    urls = [r.url for r in rows]
    assert len(urls) == len(set(urls)) == N_DOCS  # every url exactly once
    assert partial_urls <= set(urls)  # first run's work survived, not redone

    lineage = cat2.lineage_rows()
    assert len(lineage) == N_BUCKETS
    assert sum(l["n_pages"] for l in lineage) == N_DOCS
    assert all(l["wall_ms"] >= 0 and l["attempt"] == 1 for l in lineage)


def test_rerun_is_noop(spark, tmp_path, pages_path):
    out = str(tmp_path / "out2")
    run_job(spark, pages_path, out, n_buckets=N_BUCKETS)
    from pdf_table_extractor_spark.sources.catalog import LocalCatalog

    before = {b: tuple(sorted(__import__("os").listdir(LocalCatalog(out).bucket_path(b))))
              for b in range(N_BUCKETS)}
    run_job(spark, pages_path, out, n_buckets=N_BUCKETS)  # resume: nothing to do
    after = {b: tuple(sorted(__import__("os").listdir(LocalCatalog(out).bucket_path(b))))
             for b in range(N_BUCKETS)}
    assert before == after  # data untouched byte-for-byte on disk listing


def test_staged_input_partition_prunes(spark, tmp_path, pages_path):
    """stage_pages writes a bucket-partitioned copy once; per-bucket reads
    must partition-prune (the raw pmod(xxhash64) filter can't push down —
    at 64 buckets that's a full table re-scan per bucket)."""
    import os

    from pdf_table_extractor_spark.job import stage_pages

    out = str(tmp_path / "out_staged")
    staged = stage_pages(spark, pages_path, out, N_BUCKETS)
    assert os.path.exists(os.path.join(staged, "_SUCCESS"))
    assert sorted(
        d for d in os.listdir(staged) if d.startswith("bucket=")
    ) == [f"bucket={b}" for b in range(N_BUCKETS)]
    from pyspark.sql import functions as F

    plan = (
        spark.read.parquet(staged)
        .filter(F.col("bucket") == 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "bucket" in plan.split("PartitionFilters")[1][:120]
    # idempotent: second call reuses the committed staging
    mtime = os.path.getmtime(os.path.join(staged, "_SUCCESS"))
    assert stage_pages(spark, pages_path, out, N_BUCKETS) == staged
    assert os.path.getmtime(os.path.join(staged, "_SUCCESS")) == mtime


def test_concurrent_buckets(spark, tmp_path, pages_path):
    """Driver-thread bucket concurrency: same output, all lineage present."""
    out = str(tmp_path / "out_conc")
    cat = run_job(spark, pages_path, out, n_buckets=N_BUCKETS, concurrency=4)
    urls = [r.url for r in cat.read_data(spark).select("url").collect()]
    assert len(urls) == len(set(urls)) == N_DOCS
    assert len(cat.lineage_rows()) == N_BUCKETS


def test_iceberg_catalog_gates_cleanly(spark):
    """No Iceberg jars in this sandbox: the Iceberg implementation must
    refuse with a clear message, never half-work."""
    from pdf_table_extractor_spark.sources.catalog import (
        IcebergCatalog,
        iceberg_available,
    )

    assert iceberg_available(spark) is False
    with pytest.raises(NotImplementedError, match="Iceberg catalog"):
        IcebergCatalog(spark, "ice.db.extracted", "ice.db.lineage")


def test_job_emits_table_spans(spark, tmp_path, pages_path):
    """North rule: 'writes extracted text plus table spans back' — the job
    commits span rows per bucket, atomically with the data (no manifest →
    both retried), and lineage carries the span counter."""
    out = str(tmp_path / "out_spans")
    cat = run_job(spark, pages_path, out, n_buckets=2, emit_spans=True)
    spans = cat.read_spans(spark)
    assert spans is not None
    rows = spans.collect()
    assert rows, "synthetic corpus contains stone/itau docs → spans expected"
    assert {r.mode for r in rows} == {"lattice", "stream"}
    assert all(r.x1 > r.x0 and r.bottom > r.top for r in rows)
    stone_urls = {r.url for r in rows if r.mode == "lattice"}
    assert all("/stone/" in u for u in stone_urls)
    lineage = cat.lineage_rows()
    assert sum(l["n_spans"] for l in lineage) == len(rows)
