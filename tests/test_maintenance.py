"""Small-file compaction (sources/maintenance.py): file-count sizing,
row identity, and range clustering."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_table_extractor_spark.sources import maintenance


def test_compact_merges_small_files(spark, tmp_path):
    src, dest = str(tmp_path / "frag"), str(tmp_path / "compact")
    spark.range(10_000).selectExpr("id", "repeat('x', 100) AS pad").repartition(
        32
    ).write.parquet(src)
    stats = maintenance.compact_parquet(spark, src, dest, target_file_mb=512)
    assert stats["src_files"] == 32
    assert stats["dest_files"] == 1  # 10k tiny rows << 512 MB
    a = sorted(r["id"] for r in spark.read.parquet(dest).collect())
    assert a == list(range(10_000))


def test_compact_range_clustering_sorts_within_files(spark, tmp_path):
    src, dest = str(tmp_path / "frag2"), str(tmp_path / "sorted")
    spark.range(5_000).selectExpr("pmod(id * 2654435761, 5000) AS k", "id").repartition(
        16
    ).write.parquet(src)
    maintenance.compact_parquet(spark, src, dest, target_file_mb=512, sort_by=["k"])
    got = spark.read.parquet(dest)
    # partition-local sortedness: within every output file k is nondecreasing
    from pyspark.sql import Window

    w = Window.partitionBy(F.input_file_name()).orderBy(F.monotonically_increasing_id())
    lagged = got.withColumn("prev", F.lag("k").over(w))
    assert lagged.filter(F.col("prev") > F.col("k")).count() == 0
