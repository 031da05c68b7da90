"""Continuously-maintained corpus unigram histogram + live drift monitor.

The batch operators are ``operators/terms.token_histogram`` (the state)
and ``terms.divergence_from_histograms`` (the probe); this module runs
the histogram per micro-batch via ``foreachBatch`` and folds each batch
into a VERSIONED parquet snapshot under the same commit discipline as
``streaming/merge.py`` / ``streaming/sketch.py``: batch ``n`` always
merges into ``v_<n>`` — never ``_LATEST`` — so a checkpoint replay
re-reads the same base and rewrites the byte-identical ``v_<n+1>``; the
pointer flips last. Like the CMS fold (and unlike merge_upsert), the
merge algebra is COUNT ADDITION — not idempotent — so the pinned base
version is the crash-safety argument, not a belt.

Why this exists at 100 TB: admitting a crawl into the training mix
should not require re-reading the accepted corpus — `token_histogram`
folds the stream into a vocabulary-sized table, and
``drift_vs_reference`` answers "has the incoming distribution moved"
(total JS bits + the specific tokens that moved) against any reference
histogram (yesterday's snapshot version, a golden corpus, another
source's histogram) without touching raw text again. Every version is a
time-travel distribution snapshot, so drift BETWEEN versions is the
same one probe.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from pdf_table_extractor_spark.operators.terms import (
    divergence_from_histograms,
    summarize_divergence,
    token_histogram,
)
from pdf_table_extractor_spark.streaming.merge import (
    _flip_pointer,
    current_version,
    read_version,
)


def init_histogram(spark: SparkSession, snapshot_root: str) -> str:
    """Seed ``v_0`` with the empty histogram (schema-fixing, like
    merge.init_snapshot)."""
    empty = spark.createDataFrame([], "token string, n long")
    os.makedirs(snapshot_root, exist_ok=True)
    empty.write.mode("overwrite").parquet(os.path.join(snapshot_root, "v_0"))
    _flip_pointer(snapshot_root, "v_0")
    return "v_0"


def apply_histogram_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    snapshot_root: str,
    *,
    text_col: str = "text",
) -> str:
    """One histogram commit: ``v_<batch_id>`` + this batch's unigram
    counts → ``v_<batch_id+1>`` by count addition. Exposed separately so
    tests can drive the replay path directly."""
    base = read_version(spark, snapshot_root, f"v_{batch_id}")
    delta = token_histogram(batch_df, text_col=text_col)
    merged = (
        base.unionByName(delta)
        .groupBy("token")
        .agg(F.sum("n").alias("n"))
    )
    new_version = f"v_{batch_id + 1}"
    merged.write.mode("overwrite").parquet(os.path.join(snapshot_root, new_version))
    _flip_pointer(snapshot_root, new_version)
    return new_version


def start_histogram_maintenance(
    stream: DataFrame,
    snapshot_root: str,
    checkpoint_dir: str,
    *,
    text_col: str = "text",
):
    """Wire a document stream into the per-batch histogram-fold loop.
    ``init_histogram`` must have seeded ``snapshot_root`` first."""

    def run_batch(batch_df: DataFrame, batch_id: int) -> None:
        apply_histogram_batch(
            batch_df.sparkSession,
            batch_df,
            batch_id,
            snapshot_root,
            text_col=text_col,
        )

    return (
        stream.writeStream.foreachBatch(run_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def drift_vs_reference(
    spark: SparkSession,
    snapshot_root: str,
    reference_hist: DataFrame,
    *,
    version: str | None = None,
    min_count: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """(per_token, summary) drift of a maintained histogram version
    against any reference (token, n) table — same math, byte-identical
    semantics to the batch ``corpus_divergence`` (the stream side is
    `a`, the reference is `b`). ``version=None`` follows the _LATEST
    pointer; pass ``"v_3"`` for time-travel drift."""
    snap = read_version(
        spark, snapshot_root, version or current_version(snapshot_root)
    )
    per = divergence_from_histograms(snap, reference_hist, min_count=min_count)
    return per, summarize_divergence(per)
