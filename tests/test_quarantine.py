"""Poison-pill containment (operators/quarantine.py): structurally-bad
rows land in the quarantine table with reasons; parse-level poison inside
the Arrow UDFs degrades per-document (counted in lineage) instead of
failing the task; the job still commits every bucket."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from pdf_table_extractor_spark import synth
from pdf_table_extractor_spark.job import run_job
from pdf_table_extractor_spark.operators.quarantine import validate_pages

TS = dt.datetime(2026, 1, 2, 3, 4, 5)

# invalid UTF-8: markup.parse's decode raises before any line parses
BAD_BYTES = b"\xff\xfe\x00garbage"
# decodes fine, then the coordinate floats throw ValueError mid-document
BAD_COORDS = b"P 1\nW 1.0 2.0 3.0 4.0 ok\nW a b c d poison\n"


def test_validate_pages_split_reasons(spark):
    rows = [
        ("https://h.example/ok/1", TS, b"P 1\n", "text", "pt"),
        (None, TS, b"x", "t", "pt"),
        ("", TS, b"x", "t", "pt"),
        ("https://h.example/nopayload/1", TS, None, None, "pt"),
        ("https://h.example/bigtext/1", TS, None, "abcdefghij", "pt"),
        ("https://h.example/bightml/1", TS, b"0123456789abcdef", None, "pt"),
    ]
    df = spark.createDataFrame(rows, synth.PAGES_SCHEMA)
    ok, quar = validate_pages(df, max_text_bytes=8, max_html_bytes=12)
    assert [r["url"] for r in ok.collect()] == ["https://h.example/ok/1"]
    got = {r["url"]: r["reason"] for r in quar.collect()}
    assert got == {
        None: "null_url",
        "": "null_url",
        "https://h.example/nopayload/1": "no_payload",
        "https://h.example/bigtext/1": "text_too_large",
        "https://h.example/bightml/1": "html_too_large",
    }


GARBAGE = [
    "", " ", "\n\n\n", "R$ , , C D", "01/02/2026" * 5, "-.,;%$#@!",
    "SALDO 999.999.999.999.999.999.999,99 D", "\x00\x01\x02",
    "Data Lancamento Valor\n32/13/9999 x 1.2.3,4,5 Z",
    "päge ünicode ÿ ￿", "9" * 5000,
]


def test_garbage_text_all_profiles_completes(spark):
    """Adversarial TEXT (not just html) through every profile branch:
    the JVM-side expression trees must be poison-proof too — guard_doc
    can't see an ANSI cast throwing inside Catalyst, so the branches'
    try_cast / try_to_date / try_element_at discipline is the only
    containment there. One output row per input, job completes."""
    from pdf_table_extractor_spark.plans.extract import PROFILES, extract

    rows = []
    i = 0
    for prof in [*PROFILES, "unknownprofile"]:
        for g in GARBAGE:
            rows.append(
                (f"https://fz.example/{prof}/{i:06d}", TS,
                 b"P 1\nW 1 2 3 4 x\n", g, "pt"))
            rows.append(
                (f"https://fz.example/{prof}/{i + 1:06d}", TS,
                 g.encode("utf-8", "ignore"), g, "pt"))
            i += 2
    df = spark.createDataFrame(rows, synth.PAGES_SCHEMA)
    out = extract(df, num_partitions=8)
    assert out.count() == len(rows)  # nothing dropped, nothing thrown


@pytest.fixture()
def poisoned_pages_path(spark, tmp_path):
    good = synth.synth_spark(spark, 30, parallelism=4)
    poison = spark.createDataFrame(
        [
            # parse-level poison on the two html-parsing UDF families
            ("https://hostpo.example/stone/999999", TS, BAD_BYTES, None, "pt"),
            ("https://hostpo.example/banestes/999998", TS, BAD_COORDS, None, "pt"),
            # structural quarantine rows
            (None, TS, b"x", "t", "pt"),
            ("https://hostpo.example/noise/999997", TS, None, None, "pt"),
        ],
        synth.PAGES_SCHEMA,
    )
    p = str(tmp_path / "pages")
    good.unionByName(poison).write.parquet(p)
    return p


def test_poison_docs_degrade_not_fail(spark, tmp_path, poisoned_pages_path):
    out = str(tmp_path / "out")
    cat = run_job(spark, poisoned_pages_path, out, n_buckets=2)

    data = cat.read_data(spark)
    # every bucket committed; both poison urls present, degraded to empty
    assert sorted(cat.committed_buckets()) == [0, 1]
    po = {
        r["url"]: (r["n_rows"], r["csv"])
        for r in data.filter(F.col("url").startswith("https://hostpo.")).collect()
    }
    assert po["https://hostpo.example/stone/999999"][0] == 0
    assert po["https://hostpo.example/banestes/999998"][0] == 0
    # the 30 good docs extracted exactly as they would without poison
    assert data.filter(~F.col("url").startswith("https://hostpo.")).count() == 30
    assert data.filter(F.col("url").isNull()).count() == 0

    quar = cat.read_quarantine(spark)
    got = {r["url"]: r["reason"] for r in quar.collect()}
    assert got == {
        None: "null_url",
        "https://hostpo.example/noise/999997": "no_payload",
    }

    lineage = cat.lineage_rows()
    assert sum(r["n_quarantined"] for r in lineage) == 2
    assert sum(r["n_parse_failed"] for r in lineage) >= 2
