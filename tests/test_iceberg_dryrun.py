"""Iceberg-seam dry run (round-3 ask): the IcebergCatalog code path is
jar-gated in this sandbox, so API drift could hide until a production
deployment. This harness runs EVERY call the class makes — the catalog
conf gate, ``writeTo().append()``, ``spark.read.table``, catalog SQL —
against Spark's built-in JDBC V2 catalog on embedded Derby: a real
``spark.sql.catalog.*`` plugin that ships with pyspark, no Iceberg jars.
What it cannot exercise (snapshot semantics, ``overwritePartitions`` on a
bucket-partitioned table) stays covered by the docstring contract."""

from __future__ import annotations

import pytest

from pdf_table_extractor_spark.sources.catalog import IcebergCatalog, iceberg_available


@pytest.fixture(scope="module")
def dry(spark, tmp_path_factory):
    """A child session with the JDBC V2 catalog 'dry' configured — conf set
    on newSession() so nothing leaks into the shared fixture."""
    ns = spark.newSession()
    db = tmp_path_factory.mktemp("icedry") / "derbydb"
    ns.conf.set(
        "spark.sql.catalog.dry",
        "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog",
    )
    ns.conf.set("spark.sql.catalog.dry.url", f"jdbc:derby:{db};create=true")
    ns.conf.set("spark.sql.catalog.dry.driver", "org.apache.derby.jdbc.EmbeddedDriver")
    ns.sql("CREATE TABLE dry.out (url STRING, text STRING, bucket INT)")
    ns.sql("CREATE TABLE dry.spans (url STRING, y DOUBLE, bucket INT)")
    ns.sql("CREATE TABLE dry.lin (bucket INT, n_pages BIGINT, attempt INT)")
    return ns


def test_gate_refuses_without_catalog(spark):
    assert not iceberg_available(spark, "dry")
    with pytest.raises(NotImplementedError, match="no Iceberg catalog"):
        IcebergCatalog(spark, "dry.out", "dry.lin", catalog_name="dry")


def test_commit_read_resume_roundtrip(dry):
    assert iceberg_available(dry, "dry")
    cat = IcebergCatalog(dry, "dry.out", "dry.lin", catalog_name="dry",
                         spans_table="dry.spans")
    assert cat.committed_buckets() == []

    d0 = dry.createDataFrame([("u0", "t0"), ("u1", "t1")], "url string, text string")
    s0 = dry.createDataFrame([("u0", 1.5)], "url string, y double")
    cat.commit_bucket(d0, bucket=0, lineage={"n_pages": 2}, spans_df=s0)
    d1 = dry.createDataFrame([("u2", "t2")], "url string, text string")
    cat.commit_bucket(d1, bucket=1, lineage={"n_pages": 1})

    assert cat.committed_buckets() == [0, 1]
    data = {(r.url, r.bucket) for r in cat.read_data(dry).collect()}
    assert data == {("u0", 0), ("u1", 0), ("u2", 1)}
    assert {r.url for r in cat.committed_urls(dry).collect()} == {"u0", "u1", "u2"}
    spans = cat.read_spans(dry).collect()
    assert [(r.url, r.y, r.bucket) for r in spans] == [("u0", 1.5, 0)]
    rows = cat.lineage_rows()
    assert {(r["bucket"], r["n_pages"], r["attempt"]) for r in rows} == {
        (0, 2, 1), (1, 1, 1),
    }


def test_crash_window_leaves_bucket_uncommitted(dry):
    """Data lands but the process dies before the lineage append (the commit
    point): the bucket must NOT appear committed, so resume retries it."""
    cat = IcebergCatalog(dry, "dry.out", "dry.lin", catalog_name="dry")
    before = cat.committed_buckets()
    from pyspark.sql import functions as F

    partial = dry.createDataFrame([("u9", "t9")], "url string, text string")
    cat._write(partial.withColumn("bucket", F.lit(9)), cat.table)  # no lineage
    assert cat.committed_buckets() == before


def test_spans_without_table_is_an_error(dry):
    cat = IcebergCatalog(dry, "dry.out", "dry.lin", catalog_name="dry")
    s = dry.createDataFrame([("u", 0.0)], "url string, y double")
    with pytest.raises(ValueError, match="spans_table"):
        cat.commit_bucket(s, bucket=5, lineage={"n_pages": 0}, spans_df=s)
