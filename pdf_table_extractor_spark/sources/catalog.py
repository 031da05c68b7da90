"""Checkpoint/lineage commit protocol (SURVEY §1.3 `checkpoint`/`lineage`).

Iceberg-shaped but sandbox-local: production targets an Iceberg catalog
(snapshot commits give atomic visibility + time travel); here the same API
runs on parquet directories committed by atomic manifest rename, so the
abstraction doesn't leak into the pipeline (SURVEY §7.3).

Layout under ``root``::

    data/bucket=<b>/*.parquet      committed output rows for bucket b
    spans/bucket=<b>/*.parquet     committed table-span rows (optional)
    lineage/bucket=<b>.json        per-bucket counters (lineage row)
    _manifests/bucket=<b>.json     commit marker — written LAST, atomically

A bucket is visible iff its manifest exists. Writers stage to
``data/_tmp-<b>`` and rename; a crash mid-bucket leaves no manifest, so the
bucket is retried on resume. Readers (`committed_buckets`, `read_data`)
only trust manifests.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession


class LocalCatalog:
    def __init__(self, root: str):
        self.root = root
        for d in ("data", "spans", "quarantine", "lineage", "_manifests"):
            os.makedirs(os.path.join(root, d), exist_ok=True)

    # -- commit state -------------------------------------------------------

    def committed_buckets(self) -> list[int]:
        out = []
        mdir = os.path.join(self.root, "_manifests")
        for f in os.listdir(mdir):
            if f.startswith("bucket=") and f.endswith(".json"):
                out.append(int(f[len("bucket="):-len(".json")]))
        return sorted(out)

    def bucket_path(self, bucket: int) -> str:
        return os.path.join(self.root, "data", f"bucket={bucket}")

    def spans_path(self, bucket: int) -> str:
        return os.path.join(self.root, "spans", f"bucket={bucket}")

    def quarantine_path(self, bucket: int) -> str:
        return os.path.join(self.root, "quarantine", f"bucket={bucket}")

    # -- write path ---------------------------------------------------------

    def _stage_rename(self, df: DataFrame, dirname: str, bucket: int, attempt: int) -> None:
        final = os.path.join(self.root, dirname, f"bucket={bucket}")
        tmp = os.path.join(self.root, dirname, f"_tmp-{bucket}-{attempt}")
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        df.write.mode("overwrite").parquet(tmp)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.replace(tmp, final)

    def commit_bucket(
        self,
        df: DataFrame,
        bucket: int,
        lineage: dict,
        attempt: int = 1,
        spans_df: DataFrame | None = None,
        quarantine_df: DataFrame | None = None,
    ) -> None:
        """Stage parquet (+ optional span / quarantine rows) → fsync
        lineage → atomic manifest rename. Side tables are staged BEFORE
        the manifest, so they are exactly as atomic as the data: no
        manifest → all retried."""
        self._stage_rename(df, "data", bucket, attempt)
        if spans_df is not None:
            self._stage_rename(spans_df, "spans", bucket, attempt)
        if quarantine_df is not None:
            self._stage_rename(quarantine_df, "quarantine", bucket, attempt)
        lineage = dict(lineage, bucket=bucket, attempt=attempt, committed_at=time.time())
        lpath = os.path.join(self.root, "lineage", f"bucket={bucket}.json")
        with open(lpath, "w") as f:
            json.dump(lineage, f)
        mtmp = os.path.join(self.root, "_manifests", f".bucket={bucket}.json.tmp")
        mfinal = os.path.join(self.root, "_manifests", f"bucket={bucket}.json")
        with open(mtmp, "w") as f:
            json.dump({"bucket": bucket, "rows": lineage.get("n_pages"), "attempt": attempt}, f)
        os.replace(mtmp, mfinal)  # the commit point

    # -- read path ----------------------------------------------------------

    def read_data(self, spark: SparkSession) -> DataFrame | None:
        paths = [self.bucket_path(b) for b in self.committed_buckets()]
        if not paths:
            return None
        return spark.read.parquet(*paths)

    def read_spans(self, spark: SparkSession) -> DataFrame | None:
        paths = [
            self.spans_path(b)
            for b in self.committed_buckets()
            if os.path.exists(self.spans_path(b))
        ]
        if not paths:
            return None
        return spark.read.parquet(*paths)

    def read_quarantine(self, spark: SparkSession) -> DataFrame | None:
        paths = [
            self.quarantine_path(b)
            for b in self.committed_buckets()
            if os.path.exists(self.quarantine_path(b))
        ]
        if not paths:
            return None
        return spark.read.parquet(*paths)

    def committed_urls(self, spark: SparkSession) -> DataFrame | None:
        df = self.read_data(spark)
        return df.select("url") if df is not None else None

    def lineage_rows(self) -> list[dict]:
        ldir = os.path.join(self.root, "lineage")
        rows = []
        for b in self.committed_buckets():
            p = os.path.join(ldir, f"bucket={b}.json")
            if os.path.exists(p):
                with open(p) as f:
                    rows.append(json.load(f))
        return rows


# Canonical lineage row (job.run_job's counter dict). V2 `append()`
# resolves by name and rejects missing columns, so commit_bucket writes
# lineage against THIS schema — absent counters (n_spans when no spans_df)
# land as NULL instead of producing a narrower, unappendable frame.
LINEAGE_SCHEMA = (
    "bucket int, attempt int, n_pages bigint, n_ok bigint, "
    "n_empty bigint, n_quarantined bigint, n_parse_failed bigint, "
    "n_spans bigint, n_rows_total bigint, bytes_out bigint, wall_ms bigint"
)
_LINEAGE_COLS = [c.split(" ")[0] for c in LINEAGE_SCHEMA.split(", ")]


class TableDDL:
    """One table's pinned deployment DDL (round-3 verdict ask #6): the
    column list is generated FROM the engine's own schema constants, so a
    drift between what `commit_bucket` writes and what the deployment DDL
    creates fails the dry-run test instead of the first production run.

    ``sql()`` renders the production Iceberg statement (hidden/identity
    partitioning + table properties); ``dry_sql()`` renders the same
    columns for a jar-less V2 catalog (JDBC dry-run: no USING / PARTITIONED
    BY / TBLPROPERTIES — those clauses are Iceberg-side metadata, the
    column contract is what the writer can break)."""

    def __init__(self, name: str, columns: str, partitioned_by: str | None,
                 properties: dict[str, str]):
        self.name = name
        self.columns = columns  # "col type, ..." — engine schema constants
        self.partitioned_by = partitioned_by
        self.properties = properties

    def sql(self, catalog: str = "ice") -> str:
        parts = [f"CREATE TABLE IF NOT EXISTS {catalog}.{self.name} "
                 f"({self.columns}) USING iceberg"]
        if self.partitioned_by:
            parts.append(f"PARTITIONED BY ({self.partitioned_by})")
        if self.properties:
            props = ", ".join(
                f"'{k}'='{v}'" for k, v in sorted(self.properties.items())
            )
            parts.append(f"TBLPROPERTIES ({props})")
        return " ".join(parts)

    def dry_sql(self, catalog: str) -> str:
        return f"CREATE TABLE {catalog}.{self.name} ({self.columns})"


def iceberg_ddl(n_url_buckets: int = 1024) -> dict[str, TableDDL]:
    """Deployment DDL for the full catalog layout, generated from the
    engine's schema constants (serialize.OUT_SCHEMA, tables.
    TABLE_SPANS_SCHEMA, quarantine.validate_pages, job.run_job's lineage
    dict) plus the Common-Crawl-style input table from the north rule.

    Partitioning: every output table identity-partitions on the commit
    ``bucket`` (overwritePartitions retry = replace one partition); the
    input table hidden-partitions on ``bucket(url)`` so the job's
    per-bucket reads prune at the manifest level. write.distribution-mode
    'none' on outputs — rows arrive already grouped by the job's salt
    repartition, a hash redistribution would re-shuffle every payload
    byte."""
    from pdf_table_extractor_spark.operators.serialize import OUT_SCHEMA
    from pdf_table_extractor_spark.operators.tables import TABLE_SPANS_SCHEMA

    out_props = {"write.distribution-mode": "none", "format-version": "2"}
    return {
        "pages": TableDDL(
            "pages",
            "url string, warc_ts timestamp, html binary, text string, "
            "lang string",
            f"bucket({n_url_buckets}, url)",
            {"format-version": "2"},
        ),
        "data": TableDDL("data", f"{OUT_SCHEMA}, bucket int", "bucket", out_props),
        "spans": TableDDL(
            "spans", f"{TABLE_SPANS_SCHEMA}, bucket int", "bucket", out_props
        ),
        "quarantine": TableDDL(
            "quarantine",
            "url string, warc_ts timestamp, reason string, bucket int",
            "bucket", out_props,
        ),
        "lineage": TableDDL("lineage", LINEAGE_SCHEMA, None, out_props),
    }


def iceberg_available(spark: SparkSession, catalog_name: str = "ice") -> bool:
    """True when an Iceberg catalog is configured on this session (jars +
    spark.sql.catalog.<name> settings). The sandbox ships no Iceberg jars
    (verified SURVEY §7.0), so tests exercise LocalCatalog; production
    config-switches to IcebergCatalog with the same API."""
    try:
        impl = spark.conf.get(f"spark.sql.catalog.{catalog_name}", None)
    except Exception:
        impl = None
    return bool(impl)


class IcebergCatalog:
    """Iceberg-backed implementation of the same commit/lineage API.

    Snapshot commits give the atomicity the manifest-rename provides
    locally; `bucket` is a column (and a hidden-partition candidate:
    `bucket(url, N)` in the table spec), lineage rows append to a side
    table, and resume reads the committed bucket set from the LINEAGE
    table — lineage appends LAST (the commit point, mirroring the local
    manifest), so a crash between data and lineage leaves the bucket
    uncommitted and it is retried.

    Retries: on an Iceberg table partitioned by ``bucket`` pass
    ``overwrite_bucket=True`` so a retried commit replaces the partial
    partition via ``overwritePartitions()`` (idempotent). The default
    ``append()`` matches catalogs without partitioned-overwrite support
    (e.g. the JDBC V2 catalog the dry-run test uses) and first-attempt
    production commits.

    API drift is caught in-sandbox by ``tests/test_iceberg_dryrun.py``:
    every call this class makes (catalog conf gate, ``writeTo().append()``,
    ``read.table``, catalog SQL) runs against Spark's built-in JDBC V2
    catalog on embedded Derby — a real ``spark.sql.catalog.*`` plugin, no
    Iceberg jars needed.
    """

    def __init__(self, spark: SparkSession, table: str, lineage_table: str,
                 catalog_name: str = "ice", spans_table: str | None = None,
                 quarantine_table: str | None = None,
                 overwrite_bucket: bool = False):
        if not iceberg_available(spark, catalog_name):
            raise NotImplementedError(
                f"no Iceberg catalog '{catalog_name}' configured on this session "
                "(expected spark.sql.catalog.* settings + iceberg-spark-runtime jars); "
                "use LocalCatalog in jar-less environments"
            )
        self.spark = spark
        self.table = table
        self.lineage_table = lineage_table
        self.spans_table = spans_table
        self.quarantine_table = quarantine_table
        self.overwrite_bucket = overwrite_bucket

    def _committed_buckets_df(self) -> DataFrame:
        """The resume read as a DataFrame (collected by committed_buckets;
        exposed so the dry-run test can pin its plan shape: a DISTINCT
        aggregate over a single-column V2 scan of the lineage table — the
        scan must prune to `bucket` only, never drag counter columns)."""
        return self.spark.sql(
            f"SELECT DISTINCT bucket FROM {self.lineage_table}"
        )

    def committed_buckets(self) -> list[int]:
        rows = self._committed_buckets_df().collect()
        return sorted(r.bucket for r in rows)

    def _write(self, df: DataFrame, table: str) -> None:
        w = df.writeTo(table)
        if self.overwrite_bucket:
            w.overwritePartitions()
        else:
            w.append()

    def commit_bucket(
        self,
        df: DataFrame,
        bucket: int,
        lineage: dict,
        attempt: int = 1,
        spans_df: DataFrame | None = None,
        quarantine_df: DataFrame | None = None,
    ) -> None:
        from pyspark.sql import functions as F

        if spans_df is not None and self.spans_table is None:
            raise ValueError("spans_df given but no spans_table configured")
        if quarantine_df is not None and self.quarantine_table is None:
            raise ValueError(
                "quarantine_df given but no quarantine_table configured"
            )
        # data (and side tables) land first, each a single atomic snapshot
        # commit; the lineage append is the commit point.
        self._write(df.withColumn("bucket", F.lit(bucket)), self.table)
        if spans_df is not None:
            self._write(
                spans_df.withColumn("bucket", F.lit(bucket)), self.spans_table
            )
        if quarantine_df is not None:
            self._write(
                quarantine_df.withColumn("bucket", F.lit(bucket)),
                self.quarantine_table,
            )
        lineage = dict(lineage, bucket=bucket, attempt=attempt)
        unknown = set(lineage) - set(_LINEAGE_COLS)
        if unknown:
            raise ValueError(f"lineage counters not in LINEAGE_SCHEMA: {unknown}")
        row = tuple(lineage.get(c) for c in _LINEAGE_COLS)
        self.spark.createDataFrame([row], LINEAGE_SCHEMA).writeTo(
            self.lineage_table
        ).append()

    def read_data(self, spark: SparkSession):
        return spark.read.table(self.table)

    def read_spans(self, spark: SparkSession):
        if self.spans_table is None:
            return None
        return spark.read.table(self.spans_table)

    def read_quarantine(self, spark: SparkSession):
        if self.quarantine_table is None:
            return None
        return spark.read.table(self.quarantine_table)

    def committed_urls(self, spark: SparkSession):
        return self.read_data(spark).select("url")

    def lineage_rows(self) -> list[dict]:
        return [r.asDict() for r in self.spark.read.table(self.lineage_table).collect()]
