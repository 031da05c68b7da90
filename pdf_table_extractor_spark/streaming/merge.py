"""Continuously-maintained latest-state snapshot from a CDC change stream.

The batch operator is ``operators/urls.merge_upsert`` (MERGE INTO
semantics: last-writer-wins upsert + delete + stale-replay guard); this
module runs it per micro-batch via ``foreachBatch`` and commits each new
snapshot as a VERSIONED parquet directory — the plain-parquet shape of a
Delta/Iceberg commit log:

- ``<root>/v_<n>/`` — immutable full snapshot written by batch ``n-1``
  (Spark's ``_SUCCESS`` marker is the directory's own commit);
- ``<root>/_LATEST`` — a one-line pointer file, (over)written LAST.

Crash safety falls out of ordering + merge algebra, no locks:

- crash BEFORE the pointer flips → ``_LATEST`` still names the previous
  snapshot; the streaming checkpoint replays the batch, which rewrites
  the same ``v_<batch_id+1>`` directory (overwrite mode, deterministic
  name) and flips the pointer;
- crash AFTER the pointer flips but before the streaming checkpoint
  commits → the replayed batch is still DETERMINISTIC, because batch
  ``n`` always merges into ``v_<n>`` by construction (never into
  ``_LATEST`` — the pointer is reader-facing only): same base version +
  same changes ⇒ byte-identical ``v_<n+1>``, and no plan ever reads the
  directory it overwrites. Retention must therefore keep at least the
  previous version — the streaming checkpoint only ever replays the last
  uncommitted batch. (The merge algebra is ALSO idempotent — an
  equal-version upsert rewrites the identical payload under the ``>=``
  freshness guard, a replayed delete lands on an absent key — so even an
  out-of-band double-apply converges; the deterministic base makes that
  a belt, not the suspenders.)

Old versions are retained (time travel for free — ``read_version`` reads
any ``v_<n>``); production would vacuum by count/age, the same policy
knob as ``sources/maintenance.py``'s compaction.

Scale: each batch costs one ``merge_upsert`` plan — one small batch-side
shuffle when the snapshot is read back bucket-aligned
(``batch_partitions``; see the operator's docstring) — plus one full
snapshot rewrite. At 100 TB the rewrite dominates, which is exactly why
real deployments put Iceberg/Delta under this (merge-on-read deletes);
the seam is ``sources/catalog.py``. The ALGEBRA here — reduce, resolve,
version-guard — is unchanged by the format swap.

Reference parity: none (the reference is stateless per-file) —
beyond-reference streaming surface, sibling of streaming/ingest.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from pdf_table_extractor_spark.operators.urls import merge_upsert

_LATEST = "_LATEST"


def init_snapshot(df: DataFrame, snapshot_root: str) -> str:
    """Seed ``<root>/v_0`` from an initial state and point _LATEST at it."""
    path = os.path.join(snapshot_root, "v_0")
    df.write.mode("overwrite").parquet(path)
    _flip_pointer(snapshot_root, "v_0")
    return path


def current_version(snapshot_root: str) -> str:
    with open(os.path.join(snapshot_root, _LATEST), encoding="ascii") as fh:
        return fh.read().strip()


def read_snapshot(spark: SparkSession, snapshot_root: str) -> DataFrame:
    return read_version(spark, snapshot_root, current_version(snapshot_root))


def read_version(spark: SparkSession, snapshot_root: str, version: str) -> DataFrame:
    return spark.read.parquet(os.path.join(snapshot_root, version))


def _flip_pointer(snapshot_root: str, version: str) -> None:
    # write-then-rename: readers of _LATEST never observe a torn write
    tmp = os.path.join(snapshot_root, _LATEST + ".tmp")
    with open(tmp, "w", encoding="ascii") as fh:
        fh.write(version)
    os.replace(tmp, os.path.join(snapshot_root, _LATEST))


def apply_changes_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    snapshot_root: str,
    *,
    key_cols,
    version_col: str,
    delete_col: str | None = None,
    batch_partitions: int | None = None,
) -> str:
    """One MERGE commit: ``v_<batch_id>`` + this batch → ``v_<batch_id+1>``.

    The base is the batch-id-determined version, NOT ``_LATEST``: replays
    re-read the same base and rewrite the same output (module docstring),
    and the plan never reads the directory it overwrites. Exposed
    separately from the stream wiring so tests can drive the replay path
    directly."""
    target = read_version(spark, snapshot_root, f"v_{batch_id}")
    merged = merge_upsert(
        target,
        batch_df,
        key_cols=key_cols,
        version_col=version_col,
        delete_col=delete_col,
        batch_partitions=batch_partitions,
    )
    new_version = f"v_{batch_id + 1}"
    merged.write.mode("overwrite").parquet(os.path.join(snapshot_root, new_version))
    _flip_pointer(snapshot_root, new_version)
    return new_version


def start_snapshot_maintenance(
    changes_stream: DataFrame,
    snapshot_root: str,
    checkpoint_dir: str,
    *,
    key_cols,
    version_col: str,
    delete_col: str | None = None,
    batch_partitions: int | None = None,
):
    """Wire a change stream into the per-batch MERGE commit loop.

    ``init_snapshot`` must have seeded ``snapshot_root`` first (the seed
    fixes the target schema; an empty seed DataFrame is fine)."""

    def run_batch(batch_df: DataFrame, batch_id: int) -> None:
        apply_changes_batch(
            batch_df.sparkSession,
            batch_df,
            batch_id,
            snapshot_root,
            key_cols=key_cols,
            version_col=version_col,
            delete_col=delete_col,
            batch_partitions=batch_partitions,
        )

    return (
        changes_stream.writeStream.foreachBatch(run_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def vacuum(snapshot_root: str, keep_last: int = 2) -> list[str]:
    """Drop all but the newest ``keep_last`` snapshot versions (never the
    current one; ``keep_last >= 2`` retains the replay base the streaming
    checkpoint may still need — see the crash-safety notes above).
    Returns the removed version names. Driver-side directory bookkeeping
    only — cheap at any scale; the deletes are the filesystem's problem."""
    import shutil

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    versions = sorted(
        (d for d in os.listdir(snapshot_root) if d.startswith("v_")),
        key=lambda d: int(d.split("_", 1)[1]),
    )
    cur = current_version(snapshot_root)
    doomed = [v for v in versions[:-keep_last] if v != cur]
    for v in doomed:
        shutil.rmtree(os.path.join(snapshot_root, v))
    return doomed
