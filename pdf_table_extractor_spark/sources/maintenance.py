"""Table maintenance: small-file compaction.

Every long-lived crawl/curation table accretes small files — streaming
micro-batches, per-bucket resumable commits (job.py), incremental-dedup
index appends — and at 10^12 docs the file COUNT becomes the bottleneck
before the bytes do: driver-side listing, per-file open cost, one Spark
task per tiny file. Compaction is the standing chore (Iceberg's
``rewrite_data_files``, Delta's ``OPTIMIZE``); this is the plain-parquet
equivalent, sized from the table's real bytes:

- file count = ``ceil(total_bytes / target_file_mb)`` from a driver-side
  FileSystem listing (metadata only — the data plane never collects);
- round-robin ``repartition(n)`` for even file sizes, or
  ``repartitionByRange(sort_by) + sortWithinPartitions`` to ALSO lay the
  data out for min/max row-group skipping on those columns (poor man's
  clustering — pair with ``sources/bucketed.py`` when the goal is
  join locality rather than scan pruning);
- write to a NEW directory and swap atomically at the path level —
  compacting in place would destroy the source on job failure.

Reference parity: none (per-file GUI tool) — beyond-reference cluster
surface, sibling of sources/bucketed.py.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def dir_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a table directory — driver-side
    FileSystem metadata listing, recursive, skipping _SUCCESS/_metadata."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    it = fs.listFiles(p, True)
    n, total = 0, 0
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue
        n += 1
        total += st.getLen()
    return n, total


def compact_parquet(
    spark: SparkSession,
    src: str,
    dest: str,
    *,
    target_file_mb: int = 512,
    sort_by: list[str] | None = None,
) -> dict:
    """Rewrite the parquet table at ``src`` into ``dest`` as
    ``ceil(bytes / target_file_mb)`` files (optionally range-clustered on
    ``sort_by`` for row-group min/max skipping). Returns a stats dict;
    never touches ``src``."""
    n_src, total = dir_stats(spark, src)
    n_out = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    df: DataFrame = spark.read.parquet(src)
    if sort_by:
        out = df.repartitionByRange(n_out, *sort_by).sortWithinPartitions(
            *sort_by
        )
    else:
        out = df.repartition(n_out)
    out.write.mode("error").parquet(dest)
    n_dst, dst_bytes = dir_stats(spark, dest)
    return {
        "src_files": n_src,
        "src_bytes": total,
        "dest_files": n_dst,
        "dest_bytes": dst_bytes,
        "target_files": n_out,
    }
