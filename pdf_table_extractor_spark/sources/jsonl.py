"""JSONL (newline-delimited JSON) source/sink — the lingua franca of LLM
training corpora (one document object per line; Dolma, RedPajama, c4,
The Pile all ship this way).

Scale design (100 TB of JSONL):
- Reading takes an EXPLICIT schema and hands it to Spark's native JSON
  datasource — with a schema there is no inference pre-pass (schema
  inference reads the whole corpus once before the real scan), lines
  parse JVM-side in whole-stage codegen, and column pruning pushes into
  the parser (Jackson skips unused fields). Uncompressed / bzip2 files
  split by HDFS block; gzip is stream-compressed and therefore ONE TASK
  PER FILE — crawl-scale gzip corpora must be sharded into ~100 MB-1 GB
  pieces upstream (they are: Common Crawl, Dolma, and The Pile all ship
  sharded .jsonl.gz) or re-compressed splittable.
- Malformed lines follow the datasource's PERMISSIVE default: they land
  as nulls plus the raw line in ``corrupt_col`` instead of failing the
  10^12-line job; count that column, don't crash on line 10^11.
- Writing renders each row with ``to_json`` (codegen) and hands Spark's
  text sink one string column — no Python in either direction.
  ``n_files`` is a round-robin repartition sizing the output pieces.

Reference parity: the reference repo has no bulk-corpus container at
all (single files via GUI dialog, /root/reference/Conversor.py); JSONL
joins WARC (sources/warc.py) as the cluster-native bulk path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_jsonl(
    df: DataFrame,
    path: str,
    *,
    n_files: int | None = None,
    compression: str | None = None,
) -> None:
    """Write ``df`` as JSONL: one ``to_json(struct(...))`` line per row,
    column order preserved. ``compression`` is any Hadoop text codec
    ('gzip', 'bzip2', 'lz4', ...); see the module note on splittability
    before choosing gzip for corpus-scale output."""
    out = df.select(F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("value"))
    if n_files is not None:
        out = out.repartition(n_files)
    writer = out.write.mode("overwrite")
    if compression is not None:
        writer = writer.option("compression", compression)
    writer.text(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    *,
    corrupt_col: str = "_corrupt_record",
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Read JSONL with an explicit schema (no inference pass). Under the
    default PERMISSIVE mode, malformed lines yield null columns with the
    raw line preserved in ``corrupt_col`` (append it to the schema to
    keep it); ``mode='FAILFAST'`` raises instead — for ingest gates.
    Spark gotcha: a query that references ONLY ``corrupt_col`` raises
    UNSUPPORTED_FEATURE — cache() the frame (or select data columns
    alongside) before counting corrupt lines."""
    return (
        spark.read.schema(schema)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )
