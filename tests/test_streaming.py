"""Structured Streaming ingest: micro-batched extraction through the same
batch DAG, resumable via the streaming checkpoint."""

from __future__ import annotations

import glob

from pdf_table_extractor_spark import synth
from pdf_table_extractor_spark.streaming.ingest import (
    start_extract_stream,
    windowed_page_counts,
)

N_DOCS = 40


def test_stream_extracts_all_docs(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # several files so maxFilesPerTrigger yields multiple micro-batches
    synth.synth_spark(spark, N_DOCS, parallelism=8).write.parquet(pages_dir)
    assert len(glob.glob(pages_dir + "/part-*")) > 4

    q = start_extract_stream(spark, pages_dir, out_dir, ckpt, num_partitions=4)
    q.awaitTermination(300)

    out = spark.read.parquet(out_dir)
    urls = [r.url for r in out.select("url").collect()]
    assert len(urls) == len(set(urls)) == N_DOCS
    assert out.select("batch_id").distinct().count() >= 2  # really micro-batched

    # restart with no new files → no duplicate work, output unchanged
    q2 = start_extract_stream(spark, pages_dir, out_dir, ckpt, num_partitions=4)
    q2.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == N_DOCS


def test_windowed_counts_batch_parity(spark, tmp_path):
    pages = synth.synth_spark(spark, 30, parallelism=4)
    rows = windowed_page_counts(pages).collect()
    assert sum(r.n_pages for r in rows) == 30
    assert all(r.window_end > r.window_start for r in rows)
