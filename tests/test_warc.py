"""WARC source/sink (sources/warc.py): record-true roundtrip.

Properties verified:
- byte-identical payload roundtrip, including the adversarial cases a
  marker-splitting parser gets wrong: payloads containing blank lines,
  a full fake 'WARC/1.0' record header, leading/trailing CRLFs, empty
  payloads, and multi-byte UTF-8 (Content-Length is octet count);
- multi-piece layout: n_files controls piece count and every record
  survives across pieces;
- the writer's record rendering stays JVM-side (no Python eval in the
  write plan).
"""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from pdf_table_extractor_spark.sources import warc

ROWS = [
    ("https://a.example/1", "plain text"),
    (
        "https://a.example/2",
        "embedded\r\n\r\nblank and WARC/1.0\r\nWARC-Type: fake\r\n"
        "Content-Length: 9999\r\n\r\nmarker payload",
    ),
    ("https://a.example/3", ""),
    ("https://a.example/4", "unicode: héllo wörld ✓ — ok"),
    ("https://a.example/5", "trailing crlf\r\n\r\n"),
    ("https://a.example/6", "x" * 5000),
]


def _roundtrip(spark, tmp_path, n_files):
    df = spark.createDataFrame(ROWS, "url string, text string").repartition(5)
    out = str(tmp_path / "w")
    shutil.rmtree(out, ignore_errors=True)
    warc.write_warc(df, out, n_files=n_files)
    return warc.read_warc(spark, out)


def test_warc_roundtrip_byte_identical(spark, tmp_path):
    r = _roundtrip(spark, tmp_path, n_files=2)
    got = {
        x["url"]: (x["content_length"], bytes(x["payload"]).decode())
        for x in r.collect()
    }
    assert got == {u: (len(t.encode()), t) for u, t in ROWS}


def test_warc_pieces_and_headers(spark, tmp_path):
    r = _roundtrip(spark, tmp_path, n_files=3)
    assert r.select("warc_file").distinct().count() == 3
    first = r.first()
    assert first["rec_type"] == "response"
    assert first["content_type"] == "text/plain"
    assert first["warc_date"] == "1970-01-01T00:00:00Z"


def test_warc_write_plan_is_jvm_side(spark):
    df = spark.createDataFrame(ROWS, "url string, text string")
    rec = warc.warc_record_expr(
        F.col("url"), F.col("text"), F.lit("1970-01-01T00:00:00Z")
    )
    plan = df.select(rec.alias("value"))._jdf.queryExecution().optimizedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan


def test_jsonl_roundtrip_unicode_and_corrupt_line(spark, tmp_path):
    from pdf_table_extractor_spark.sources import jsonl

    df = spark.createDataFrame(
        [
            (1, 'quotes " and \\ backslash', "en"),
            (2, "newline\nand tab\tinside", "pt"),
            (3, "unicode: ação águia 中文 🎉", "zh"),
        ],
        "doc_id long, text string, lang string",
    )
    out = str(tmp_path / "docs")
    jsonl.write_jsonl(df, out, n_files=2)
    back = jsonl.read_jsonl(spark, out, "doc_id long, text string, lang string")
    got = {r["doc_id"]: (r["text"], r["lang"]) for r in back.collect()}
    exp = {r["doc_id"]: (r["text"], r["lang"]) for r in df.collect()}
    assert got == exp

    # a malformed line lands in the corrupt column, not as a crash
    with open(f"{out}/extra.json", "w") as f:
        f.write('{"doc_id": 9, "text": "ok", "lang": "en"}\n')
        f.write("{not json at all\n")
    back2 = jsonl.read_jsonl(
        spark, out,
        "doc_id long, text string, lang string, _corrupt_record string",
    ).cache()  # Spark disallows queries touching ONLY the corrupt column
    bad = back2.filter(F.col("_corrupt_record").isNotNull())
    assert bad.count() == 1
    assert back2.filter(F.col("doc_id") == 9).count() == 1


def test_jsonl_gzip_compression(spark, tmp_path):
    import glob

    from pdf_table_extractor_spark.sources import jsonl

    df = spark.createDataFrame([(i, f"text {i}") for i in range(10)], "doc_id long, text string")
    out = str(tmp_path / "gz")
    jsonl.write_jsonl(df, out, n_files=1, compression="gzip")
    assert glob.glob(f"{out}/*.gz")
    back = jsonl.read_jsonl(spark, out, "doc_id long, text string")
    assert back.count() == 10
