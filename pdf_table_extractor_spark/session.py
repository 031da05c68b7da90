"""SparkSession factory with scale-appropriate defaults.

All entry points (tests, bench, driver contract, spark-submit job) build
sessions here so the config story is uniform: AQE on (runtime re-plan +
skew-join backstop), Arrow on (every UDF in this engine is pandas/Arrow
vectorized), shuffle partitions sized to the sandbox (32 cores) but
overridable for a real cluster via ``spark.conf`` or env.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_spark(
    app_name: str = "pdf-table-extractor-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession tuned for this engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32) in
    the sandbox; on a real cluster pass ``None`` via spark-submit and let the
    submitter own it.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: runtime coalescing + skew-join splitting — the backstop behind
        # our explicit url-hash salting (SURVEY §4 "skew" row).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow path for every pandas UDF; bounded batches keep per-task
        # memory flat regardless of doc sizes (replaces the reference's
        # "pages in blocks of 5" batching, conversor_itau.py:30-32).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # Parquet scan splits: extraction burns far more CPU per byte than a
        # typical scan (regex cascades + Arrow parse UDFs), so split small —
        # 8MB here keeps a few-hundred-MB sandbox corpus wide enough for 32
        # cores. At 100TB the same knob goes back up (128MB → ~800k tasks on
        # 1000 executors); it's sizing per-task CPU seconds, not bytes.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "8388608"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # Shuffle/spill/broadcast codec. Default lz4; zstd trades CPU
        # (abundant at high core counts) for bytes over the memory bus —
        # A/B-able via env on the scaling protocol (tools/bench_codec.py).
        .config(
            "spark.io.compression.codec",
            os.environ.get("SPARK_GRAFT_IO_CODEC", "lz4"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
