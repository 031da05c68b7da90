"""Iceberg-seam dry run (round-3 asks #6 — plan + DDL pinning). The
IcebergCatalog code path is jar-gated in this sandbox, so API drift could
hide until a production deployment. This harness runs EVERY call the class
makes — the catalog conf gate, ``writeTo().append()``, ``writeTo().
overwritePartitions()`` (plan-pinned via the analyzer), ``spark.read.
table``, catalog SQL — against Spark's built-in JDBC V2 catalog on
embedded Derby: a real ``spark.sql.catalog.*`` plugin that ships with
pyspark, no Iceberg jars.

Schema lockstep: the dry tables are created FROM `iceberg_ddl()`'s
generated column lists (themselves generated from the engine's schema
constants), and `commit_bucket` writes engine-shaped rows into them — so
a drift between the deployment DDL and what the writer emits fails HERE,
not on the first jarred run. What Derby cannot exercise (snapshot
semantics, partitioned ``overwritePartitions``) stays covered by the
docstring contract plus the analyzer-level plan assertion below."""

from __future__ import annotations

import pytest

from pdf_table_extractor_spark.sources.catalog import (
    IcebergCatalog,
    iceberg_available,
    iceberg_ddl,
)

DDL = iceberg_ddl()


@pytest.fixture(scope="module")
def dry(spark, tmp_path_factory):
    """A child session with the JDBC V2 catalog 'dry' configured — conf set
    on newSession() so nothing leaks into the shared fixture. Tables are
    created from the generated deployment DDL (dry_sql strips the
    Iceberg-side USING/PARTITIONED BY/TBLPROPERTIES clauses; the column
    contract is what the writer can break)."""
    ns = spark.newSession()
    db = tmp_path_factory.mktemp("icedry") / "derbydb"
    ns.conf.set(
        "spark.sql.catalog.dry",
        "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog",
    )
    ns.conf.set("spark.sql.catalog.dry.url", f"jdbc:derby:{db};create=true")
    ns.conf.set("spark.sql.catalog.dry.driver", "org.apache.derby.jdbc.EmbeddedDriver")
    for t in ("data", "spans", "lineage", "quarantine"):
        ns.sql(DDL[t].dry_sql("dry"))
    return ns


def test_gate_refuses_without_catalog(spark):
    assert not iceberg_available(spark, "dry")
    with pytest.raises(NotImplementedError, match="no Iceberg catalog"):
        IcebergCatalog(spark, "dry.data", "dry.lineage", catalog_name="dry")


def test_ddl_strings_pinned():
    """The production statements a jarred deployment runs verbatim: output
    tables identity-partition on the commit bucket (retry = replace one
    partition), the input pages table hidden-partitions on bucket(url) so
    per-bucket reads prune at the manifest level, and distribution-mode
    'none' keeps Iceberg from re-shuffling rows the job already salted."""
    assert DDL["data"].sql() == (
        "CREATE TABLE IF NOT EXISTS ice.data (url string, profile string, "
        "n_rows int, csv binary, bucket int) USING iceberg "
        "PARTITIONED BY (bucket) "
        "TBLPROPERTIES ('format-version'='2', 'write.distribution-mode'='none')"
    )
    assert DDL["pages"].sql() == (
        "CREATE TABLE IF NOT EXISTS ice.pages (url string, warc_ts timestamp, "
        "html binary, text string, lang string) USING iceberg "
        "PARTITIONED BY (bucket(1024, url)) "
        "TBLPROPERTIES ('format-version'='2')"
    )
    assert DDL["spans"].sql().startswith(
        "CREATE TABLE IF NOT EXISTS ice.spans (url string, page_no int, "
        "mode string, x0 double, top double, x1 double, bottom double, "
        "n_rows int, n_cols int, bucket int) USING iceberg "
        "PARTITIONED BY (bucket)"
    )
    assert DDL["quarantine"].sql().startswith(
        "CREATE TABLE IF NOT EXISTS ice.quarantine (url string, "
        "warc_ts timestamp, reason string, bucket int) USING iceberg "
        "PARTITIONED BY (bucket)"
    )
    assert DDL["lineage"].sql() == (
        "CREATE TABLE IF NOT EXISTS ice.lineage (bucket int, attempt int, "
        "n_pages bigint, n_ok bigint, n_empty bigint, n_quarantined bigint, "
        "n_parse_failed bigint, n_spans bigint, n_rows_total bigint, "
        "bytes_out bigint, wall_ms bigint) USING iceberg "
        "TBLPROPERTIES ('format-version'='2', 'write.distribution-mode'='none')"
    )


def _data_df(ns, rows):
    return ns.createDataFrame(
        rows, "url string, profile string, n_rows int, csv binary"
    )


def test_commit_read_resume_roundtrip(dry):
    """Engine-shaped rows (serialize.OUT_SCHEMA / TABLE_SPANS_SCHEMA /
    LINEAGE_SCHEMA) through the full commit protocol against tables created
    from the deployment DDL — the schema-lockstep gate."""
    assert iceberg_available(dry, "dry")
    cat = IcebergCatalog(dry, "dry.data", "dry.lineage", catalog_name="dry",
                         spans_table="dry.spans",
                         quarantine_table="dry.quarantine")
    assert cat.committed_buckets() == []

    d0 = _data_df(dry, [("u0", "bradesco", 2, b"csv0"), ("u1", "itau", 0, None)])
    s0 = dry.createDataFrame(
        [("u0", 1, "lattice", 10.0, 20.0, 110.0, 220.0, 5, 3)],
        "url string, page_no int, mode string, x0 double, top double, "
        "x1 double, bottom double, n_rows int, n_cols int",
    )
    cat.commit_bucket(
        d0, bucket=0,
        lineage={"n_pages": 2, "n_ok": 1, "n_empty": 1, "n_spans": 1},
        spans_df=s0,
    )
    d1 = _data_df(dry, [("u2", "ofx", 1, b"csv2")])
    # no spans this bucket: n_spans must land as NULL, not narrow the frame
    cat.commit_bucket(d1, bucket=1, lineage={"n_pages": 1, "n_ok": 1})

    assert cat.committed_buckets() == [0, 1]
    data = {(r.url, r.profile, r.bucket) for r in cat.read_data(dry).collect()}
    assert data == {("u0", "bradesco", 0), ("u1", "itau", 0), ("u2", "ofx", 1)}
    assert {r.url for r in cat.committed_urls(dry).collect()} == {"u0", "u1", "u2"}
    spans = cat.read_spans(dry).collect()
    assert [(r.url, r.mode, r.n_cols, r.bucket) for r in spans] == [
        ("u0", "lattice", 3, 0)
    ]
    rows = {r["bucket"]: r for r in cat.lineage_rows()}
    assert (rows[0]["n_pages"], rows[0]["n_spans"], rows[0]["attempt"]) == (2, 1, 1)
    assert (rows[1]["n_pages"], rows[1]["n_spans"]) == (1, None)


def test_lineage_counter_outside_schema_is_an_error(dry):
    """A counter key the DDL doesn't carry must fail loudly at commit time
    (V2 append resolves by name — a silent drop would lose the metric)."""
    cat = IcebergCatalog(dry, "dry.data", "dry.lineage", catalog_name="dry")
    with pytest.raises(ValueError, match="LINEAGE_SCHEMA"):
        cat.commit_bucket(
            _data_df(dry, [("ux", "p", 0, None)]), bucket=7,
            lineage={"n_pages": 1, "made_up_counter": 3},
        )


def test_overwrite_bucket_builds_dynamic_overwrite_plan(dry):
    """Plan pin for the retry path: overwrite_bucket=True must reach the
    analyzer as OverwritePartitionsDynamic over the V2 relation (Derby
    tables don't support dynamic overwrite, so the analyzer rejects it —
    naming the exact plan node our writeTo().overwritePartitions() built;
    on a bucket-partitioned Iceberg table the same plan replaces just the
    retried partition)."""
    from pyspark.errors import AnalysisException

    cat = IcebergCatalog(dry, "dry.data", "dry.lineage", catalog_name="dry",
                         overwrite_bucket=True)
    with pytest.raises(AnalysisException) as ei:
        cat.commit_bucket(
            _data_df(dry, [("u8", "p", 1, b"x")]), bucket=8,
            lineage={"n_pages": 1},
        )
    msg = str(ei.value)
    assert "dynamic overwrite" in msg
    assert "OverwritePartitionsDynamic" in msg  # the analyzed plan node


def test_committed_buckets_plan_prunes_to_bucket_column(dry):
    """Resume-read plan shape: a DISTINCT aggregate over a V2 scan that
    reads ONLY the bucket column — at 10^12-doc scale the lineage table
    carries one row per bucket, but the scan must still not drag the
    counter columns."""
    cat = IcebergCatalog(dry, "dry.data", "dry.lineage", catalog_name="dry")
    plan = cat._committed_buckets_df()._jdf.queryExecution().optimizedPlan().toString()
    assert "RelationV2[bucket#" in plan, plan  # pruned scan: one column
    assert "n_pages" not in plan
    # either a residual Aggregate over the pruned scan, or (as on the JDBC
    # dry catalog) the DISTINCT pushed down INTO the scan, leaving the bare
    # one-column relation as the whole plan
    assert "Aggregate [bucket#" in plan or plan.strip() == plan.splitlines()[0]


def test_crash_window_leaves_bucket_uncommitted(dry):
    """Data lands but the process dies before the lineage append (the commit
    point): the bucket must NOT appear committed, so resume retries it."""
    cat = IcebergCatalog(dry, "dry.data", "dry.lineage", catalog_name="dry")
    before = cat.committed_buckets()
    from pyspark.sql import functions as F

    partial = _data_df(dry, [("u9", "p", 1, b"t9")])
    cat._write(partial.withColumn("bucket", F.lit(9)), cat.table)  # no lineage
    assert cat.committed_buckets() == before


def test_spans_without_table_is_an_error(dry):
    cat = IcebergCatalog(dry, "dry.data", "dry.lineage", catalog_name="dry")
    s = dry.createDataFrame([("u", 0.0)], "url string, y double")
    with pytest.raises(ValueError, match="spans_table"):
        cat.commit_bucket(s, bucket=5, lineage={"n_pages": 0}, spans_df=s)

def test_per_bucket_read_pushes_filter_into_v2_scan(dry):
    """Round-4 verdict ask: pin the RESUME-path read shape one level
    deeper. A retried/inspected bucket read filters on the partition
    column; that filter must reach the V2 scan as a pushed predicate
    with the projection pruned to the requested columns — on a
    bucket-partitioned Iceberg table this is manifest-level partition
    pruning, so reading one bucket never scans the other 1023."""
    cat = IcebergCatalog(dry, "dry.data", "dry.lineage", catalog_name="dry")
    df = cat.read_data(dry).where("bucket = 0").select("url")
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    executed = df._jdf.queryExecution().executedPlan().toString()
    # filter fully absorbed by the scan: nothing left above the relation
    assert optimized.strip().startswith("RelationV2[url#"), optimized
    assert "bucket = 0" in executed, executed
    assert "ReadSchema: struct<url:string>" in executed, executed


def test_lineage_schema_drift_fails_loudly(dry):
    """Round-4 verdict ask: pin the schema-evolution rejection path. If
    the deployed lineage table drifts from LINEAGE_SCHEMA (here: a table
    missing the newer counter columns), the by-name V2 append must fail
    with the column-arity analyzer error — never silently drop counters.
    This is the exact exception a jarred first run would surface."""
    from pyspark.errors import AnalysisException

    dry.sql(
        "CREATE TABLE IF NOT EXISTS dry.lineage_drift "
        "(bucket int, attempt int, n_pages bigint)"
    )
    cat = IcebergCatalog(dry, "dry.data", "dry.lineage_drift", catalog_name="dry")
    with pytest.raises(AnalysisException) as ei:
        cat.commit_bucket(
            _data_df(dry, [("ud", "p", 1, b"d")]), bucket=11,
            lineage={"n_pages": 1},
        )
    msg = str(ei.value)
    assert "TOO_MANY_DATA_COLUMNS" in msg, msg
    assert "lineage_drift" in msg, msg
