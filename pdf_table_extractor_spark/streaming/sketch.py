"""Continuously-maintained count-min frequency state from a stream.

The batch operator is ``operators/terms.cms_sketch``; this module runs it
per micro-batch via ``foreachBatch`` and folds each batch's sketch into a
VERSIONED parquet snapshot with the same commit discipline as
``streaming/merge.py`` (batch ``n`` always merges into ``v_<n>`` — never
``_LATEST`` — so a checkpoint replay re-reads the same base and rewrites
the byte-identical ``v_<n+1>``; the pointer flips last).

The merge algebra here is CELL ADDITION, which is NOT idempotent — a
double-apply would double-count — so the deterministic pinned base isn't
a belt here, it is the whole crash-safety argument: correctness rests on
"same base version + same batch ⇒ same output", exactly the property the
version-by-batch-id naming provides. (Contrast merge_upsert, whose
algebra is also idempotent on top.)

Why this exists at 100 TB: the sketch is the ONLY frequency state whose
size is config-bounded (depth·width cells) rather than key-bounded — a
streaming groupBy-key of hosts/tokens grows with the key universe, while
this folds an unbounded stream into kilobytes, stays exact under shard
merges (cells add), and any version is a time-travel frequency snapshot.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_table_extractor_spark.operators.terms import cms_sketch
from pdf_table_extractor_spark.streaming.merge import (
    _flip_pointer,
    read_version,
)


def init_sketch(spark: SparkSession, snapshot_root: str, *, depth: int, width: int) -> str:
    """Seed ``v_0`` with the empty sketch (schema-fixing, like
    merge.init_snapshot)."""
    empty = spark.createDataFrame(
        [], "sketch_row int, bucket long, cell_count long"
    )
    os.makedirs(snapshot_root, exist_ok=True)
    empty.write.mode("overwrite").parquet(os.path.join(snapshot_root, "v_0"))
    _flip_pointer(snapshot_root, "v_0")
    return "v_0"


def apply_sketch_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    snapshot_root: str,
    *,
    key_col: str,
    depth: int,
    width: int,
) -> str:
    """One sketch commit: ``v_<batch_id>`` + this batch's sketch →
    ``v_<batch_id+1>`` by cell addition. Exposed separately so tests can
    drive the replay path directly."""
    base = read_version(spark, snapshot_root, f"v_{batch_id}")
    delta = cms_sketch(batch_df, key_col=key_col, depth=depth, width=width)
    merged = (
        base.unionByName(delta)
        .groupBy("sketch_row", "bucket")
        .agg(F.sum("cell_count").alias("cell_count"))
    )
    new_version = f"v_{batch_id + 1}"
    merged.write.mode("overwrite").parquet(os.path.join(snapshot_root, new_version))
    _flip_pointer(snapshot_root, new_version)
    return new_version


def start_sketch_maintenance(
    stream: DataFrame,
    snapshot_root: str,
    checkpoint_dir: str,
    *,
    key_col: str,
    depth: int = 4,
    width: int = 256,
):
    """Wire a stream into the per-batch sketch-fold loop. ``init_sketch``
    must have seeded ``snapshot_root`` first."""

    def run_batch(batch_df: DataFrame, batch_id: int) -> None:
        apply_sketch_batch(
            batch_df.sparkSession,
            batch_df,
            batch_id,
            snapshot_root,
            key_col=key_col,
            depth=depth,
            width=width,
        )

    return (
        stream.writeStream.foreachBatch(run_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# Streaming HyperLogLog distinct state (register-max fold)
#
# Same versioned-commit discipline as the CMS fold above, but the merge
# algebra is PER-REGISTER MAX (operators/terms.hll_merge) — associative,
# commutative, AND idempotent. Where the CMS's cell addition leans
# entirely on "same pinned base + same batch ⇒ same output" to survive a
# checkpoint replay, the HLL fold is additionally self-healing: even an
# accidental double-apply of a batch onto an already-advanced base would
# leave the registers unchanged. Any version is a time-travel distinct
# snapshot; ≤2^p rows per slice of state for an unbounded key stream.
# ---------------------------------------------------------------------------


def init_hll(spark: SparkSession, snapshot_root: str) -> str:
    """Seed ``v_0`` with the empty register table."""
    empty = spark.createDataFrame([], "slice string, register int, max_rho int")
    os.makedirs(snapshot_root, exist_ok=True)
    empty.write.mode("overwrite").parquet(os.path.join(snapshot_root, "v_0"))
    _flip_pointer(snapshot_root, "v_0")
    return "v_0"


def apply_hll_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    snapshot_root: str,
    *,
    key_col: str,
    by: str | None = None,
    p: int = 8,
) -> str:
    """One register commit: ``v_<batch_id>`` ∪max this batch's registers →
    ``v_<batch_id+1>``."""
    from pdf_table_extractor_spark.operators.terms import hll_merge, hll_registers

    base = read_version(spark, snapshot_root, f"v_{batch_id}")
    delta = hll_registers(batch_df, key_expr=F.col(key_col), by=by, p=p)
    merged = hll_merge(base, delta)
    new_version = f"v_{batch_id + 1}"
    merged.write.mode("overwrite").parquet(os.path.join(snapshot_root, new_version))
    _flip_pointer(snapshot_root, new_version)
    return new_version


def start_hll_maintenance(
    stream: DataFrame,
    snapshot_root: str,
    checkpoint_dir: str,
    *,
    key_col: str,
    by: str | None = None,
    p: int = 8,
):
    """Wire a stream into the per-batch register-fold loop. ``init_hll``
    must have seeded ``snapshot_root`` first."""

    def run_batch(batch_df: DataFrame, batch_id: int) -> None:
        apply_hll_batch(
            batch_df.sparkSession,
            batch_df,
            batch_id,
            snapshot_root,
            key_col=key_col,
            by=by,
            p=p,
        )

    return (
        stream.writeStream.foreachBatch(run_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def hll_snapshot_estimate(
    spark: SparkSession, snapshot_root: str, version: str, *, p: int = 8
) -> DataFrame:
    """Distinct estimate from any committed register version — time-travel
    cardinality probes without re-reading the stream."""
    from pdf_table_extractor_spark.operators.terms import hll_estimate

    return hll_estimate(read_version(spark, snapshot_root, version), p=p)


# ---------------------------------------------------------------------------
# Streaming heavy-hitter candidates over the CMS fold
#
# The candidate table is the key-bounded companion the raw sketch cannot
# provide (cells keep counts, not identities): per batch, fold the CMS
# as above, then re-probe the UNION of previous candidates and this
# batch's distinct keys against the merged sketch, keeping keys whose
# estimate clears ``min_frac`` of the running stream total. CMS never
# under-counts, so the survivors are a SUPERSET of the true >=min_frac
# hitters (one-sided error, same guarantee as the batch operator);
# keys that fade below the moving threshold are pruned, so state stays
# ~O(1/min_frac) candidates regardless of the key universe. Determinism
# discipline is the file's usual: v_<n> + batch n => byte-identical
# v_<n+1>, never _LATEST.
# ---------------------------------------------------------------------------


def init_heavy(spark: SparkSession, snapshot_root: str, *, depth: int, width: int) -> str:
    """Seed v_0 for both the sketch cells and the (empty) candidates."""
    init_sketch(spark, os.path.join(snapshot_root, "cells"), depth=depth, width=width)
    empty = spark.createDataFrame([], "key string, est_count long")
    cand_root = os.path.join(snapshot_root, "cand")
    os.makedirs(cand_root, exist_ok=True)
    empty.write.mode("overwrite").parquet(os.path.join(cand_root, "v_0"))
    _flip_pointer(cand_root, "v_0")
    return "v_0"


def apply_heavy_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    snapshot_root: str,
    *,
    key_col: str,
    depth: int,
    width: int,
    min_frac: float,
) -> str:
    """One heavy-hitter commit: fold the batch's cells, then re-estimate
    previous candidates ∪ batch keys against the merged sketch and keep
    those at >= min_frac of the running total."""
    from pdf_table_extractor_spark.operators.terms import _cms_min_estimate

    cells_root = os.path.join(snapshot_root, "cells")
    cand_root = os.path.join(snapshot_root, "cand")
    new_version = apply_sketch_batch(
        spark, batch_df, batch_id, cells_root,
        key_col=key_col, depth=depth, width=width,
    )
    merged = read_version(spark, cells_root, new_version)
    prev = read_version(spark, cand_root, f"v_{batch_id}")
    cand_keys = (
        prev.select(F.col("key").alias(key_col))
        .unionByName(batch_df.select(F.col(key_col)))
        .distinct()
    )
    est = _cms_min_estimate(
        cand_keys, merged, key_col=key_col, depth=depth, width=width
    )
    total = merged.agg(
        (F.coalesce(F.sum("cell_count"), F.lit(0)) / depth).alias("__n")
    )
    kept = (
        est.crossJoin(F.broadcast(total))
        .where(F.col("est_count") >= F.lit(min_frac) * F.col("__n"))
        .select(F.col(key_col).alias("key"), F.col("est_count").cast("long").alias("est_count"))
    )
    kept.write.mode("overwrite").parquet(os.path.join(cand_root, new_version))
    _flip_pointer(cand_root, new_version)
    return new_version


def start_heavy_maintenance(
    stream: DataFrame,
    snapshot_root: str,
    checkpoint_dir: str,
    *,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    min_frac: float = 0.05,
):
    """Wire a stream into the per-batch heavy-hitter fold; ``init_heavy``
    must have seeded ``snapshot_root`` first."""

    def run_batch(batch_df: DataFrame, batch_id: int) -> None:
        apply_heavy_batch(
            batch_df.sparkSession,
            batch_df,
            batch_id,
            snapshot_root,
            key_col=key_col,
            depth=depth,
            width=width,
            min_frac=min_frac,
        )

    return (
        stream.writeStream.foreachBatch(run_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
