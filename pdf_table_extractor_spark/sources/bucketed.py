"""Bucketed tables: pay the partitioning ONCE at write time, join
shuffle-free forever after.

At 100 TB the dominant recurring cost of fact-to-fact equi-joins
(pages ⋈ link-graph, crawl batch ⋈ dedup index, lineitem ⋈ orders) is
re-shuffling the fat side on every job. Hash-bucketing both tables on
the join key at WRITE time (``hash(key) mod n_buckets`` → file) makes
every later equi-join on that key exchange-free: task *i* reads bucket
*i* of both sides, already co-located, so the join plan contains no
Exchange at all (``tests/test_plan.py`` asserts exactly that). The
repo's salt-exchange reuse (plans/extract.py) removes shuffles WITHIN
one job; bucketing removes them ACROSS jobs — the right tool when the
same key joins recur against a persisted table (the incremental-dedup
index in ``operators/dedup.py`` is the canonical consumer).

Spark only exploits bucket layout through table METADATA — the bucket
spec lives in the session catalog, not in parquet files — so this module
wraps ``DataFrameWriter.bucketBy(...).saveAsTable`` rather than plain
``.parquet()`` paths. Design choices:

- ``sortBy(key)`` by default: bucket files arrive sorted, so a
  SortMergeJoin reads them with at most a cheap local sort (one file per
  bucket per write task ⇒ often none) instead of a full per-task sort.
- ``path=`` makes the table EXTERNAL (data under the caller's directory,
  e.g. the job's checkpointed out_root) — dropping the catalog entry
  never deletes 100 TB of data.
- ``n_buckets`` sizes per-bucket bytes, exactly like
  ``job.py.stage_pages``'s url-hash buckets: target ≤ a few GB per
  bucket per table at full scale so a single task's merge join fits in
  executor memory. Both sides MUST use the same n_buckets (Spark joins
  bucketed tables shuffle-free only on matching bucket counts; a
  mismatch silently re-shuffles one side).
- At 10^12 rows the write itself is one extra shuffle — the same
  exchange the FIRST join would have paid anyway, so bucketing is free
  by the second consumer.

Iceberg parity: ``write_bucketed`` is the plain-parquet equivalent of an
Iceberg ``bucket(n, key)`` partition transform (sources/catalog.py's
Iceberg seam); migrating keeps the query shapes unchanged.

Reference parity: the reference (a per-file GUI tool, Conversor.py) has
no persisted-table layout at all — this is part of the beyond-reference
cluster story, like sources/warc.py and sources/jsonl.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    key: str,
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a parquet table hash-bucketed (and by default
    sorted) on ``key``. Overwrites any previous version of ``table``."""
    writer = (
        df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    )
    if sort:
        writer = writer.sortBy(key)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table THROUGH THE CATALOG — ``spark.read.parquet``
    on the same directory would lose the bucket spec and re-shuffle."""
    return spark.table(table)


def bucket_spec(spark: SparkSession, table: str) -> tuple[int, str] | None:
    """(n_buckets, bucket_columns) from the catalog, or None if the table
    is not bucketed."""
    rows = {r[0]: r[1] for r in spark.sql(f"DESCRIBE FORMATTED {table}").collect()}
    if "Num Buckets" not in rows:
        return None
    return int(rows["Num Buckets"]), rows.get("Bucket Columns", "")


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on,
    how: str = "inner",
) -> DataFrame:
    """Equi-join two co-bucketed tables. When both sides were written
    with the same ``key``/``n_buckets``, the physical plan is a
    SortMergeJoin with NO Exchange on either side (bucket outputs already
    satisfy the join's HashClusteredDistribution).

    Spark treats a bucket-count OR bucket-column mismatch — or a join key
    that isn't the bucket column — as a silent re-shuffle of one side:
    the whole write-time investment quietly evaporates. Enforce instead
    of trust: raise on any of the three. Column-expression ``on``
    conditions skip the join-key containment check (their attributes
    aren't inspectable by name) but still require matching specs."""
    ls, rs = bucket_spec(spark, left_table), bucket_spec(spark, right_table)
    if ls is None or rs is None or ls[0] != rs[0]:
        raise ValueError(
            f"bucketed_join: bucket counts differ or missing — "
            f"{left_table}={ls}, {right_table}={rs}; a mismatch would "
            "silently re-shuffle one side (rewrite with matching "
            "n_buckets, or use a plain join deliberately)"
        )
    def _cols(spec: str) -> list[str]:
        return [c.strip(" `") for c in spec.strip("[]").split(",") if c.strip()]

    lc, rc = _cols(ls[1]), _cols(rs[1])
    on_names = [on] if isinstance(on, str) else list(on)
    if all(isinstance(c, str) for c in on_names):
        if not (set(lc) <= set(on_names) and set(rc) <= set(on_names)):
            raise ValueError(
                f"bucketed_join: join key {on_names} does not cover the "
                f"bucket columns ({left_table}={lc}, {right_table}={rc}) — "
                "the bucket layout cannot satisfy this join's distribution "
                "and Spark would silently re-shuffle"
            )
    return read_bucketed(spark, left_table).join(
        read_bucketed(spark, right_table), on=on, how=how
    )
