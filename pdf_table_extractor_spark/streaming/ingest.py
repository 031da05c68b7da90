"""Structured Streaming ingest for the extraction pipeline.

The reference is strictly batch (SURVEY §2.9) and the north rule's
"streaming-shaped" requirement is checkpoint resume, which the batch job
covers (`job.py`). This module closes the remaining gap for continuously
arriving crawls: a file-source stream over the pages directory, running the
SAME batch `extract()` DAG per micro-batch via `foreachBatch`, committed
through the same bucket catalog — so batch and streaming share one code
path and one output contract (the kappa-architecture shape).

Late data: pages carry `warc_ts`; `windowed_page_counts` shows the
watermarked tumbling-window aggregation used for ingest monitoring (the
only event-time computation this pipeline needs — extraction itself is
per-document and order-free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_table_extractor_spark.operators.quarantine import validate_pages
from pdf_table_extractor_spark.plans.extract import extract
from pdf_table_extractor_spark.synth import PAGES_SCHEMA


def pages_stream(spark: SparkSession, pages_dir: str, max_files: int = 4) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(pages_dir)
    )


def start_extract_stream(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    num_partitions: int | None = None,
):
    """pages files → extract() per micro-batch → parquet batch partitions.

    Spark's streaming checkpoint (source offsets + batch WAL) provides
    exactly-once file-level progress. foreachBatch itself is only
    at-least-once — a crash between the sink write and the checkpoint
    commit REPLAYS the batch — so the sink must be idempotent ON
    batch_id: each batch overwrites its own ``batch_id=<n>/`` partition
    directory (a replay rewrites the same partition; a plain append would
    duplicate every row of the replayed batch). Readers get ``batch_id``
    back for free via partition discovery on ``out_dir``.

    Structurally-bad rows take the same quarantine split as the batch job
    (operators/quarantine.py) — a continuously arriving crawl is exactly
    where a poison file must not wedge the stream: without the split one
    malformed page fails its micro-batch, the restart replays the SAME
    committed offsets, and the stream loops on it forever. Quarantined
    rows land in ``<out_dir>_quarantine`` under the same batch-partition
    scheme.
    """
    stream = pages_stream(spark, pages_dir)
    return (
        stream.writeStream.foreachBatch(make_run_batch(out_dir, num_partitions))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def make_run_batch(out_dir: str, num_partitions: int | None = None):
    """The foreachBatch body, exposed for direct replay testing: calling
    it twice with the same batch_id must leave the sink unchanged."""

    def run_batch(batch_df: DataFrame, batch_id: int) -> None:
        ok, quarantined = validate_pages(batch_df)
        out = extract(ok, num_partitions=num_partitions)
        out.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")
        quarantined.write.mode("overwrite").parquet(
            out_dir.rstrip("/") + f"_quarantine/batch_id={batch_id}"
        )

    return run_batch


def windowed_page_counts(pages: DataFrame, window: str = "1 hour", late: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window ingest counters (works on batch or
    streaming DataFrames; on streams, state for windows older than the
    watermark is dropped, and late rows beyond it never enter the
    aggregation). Parquet timestamps arrive as TIMESTAMP_NTZ, which
    watermarks reject — normalize to session-zoned timestamp first."""
    return (
        pages.withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
        .withWatermark("warc_ts", late)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(F.count("*").alias("n_pages"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_pages",
        )
    )
