"""URL canonicalization + CCNet line-dedup unit behavior (the cross-engine
value check lives in the q_url_canonicalize / q_line_dedup contracts)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_table_extractor_spark.operators import urls
from pdf_table_extractor_spark.operators.dedup import (
    chunk_frame,
    common_lines,
    drop_common_lines,
    line_frame,
    reassemble_lines,
)

CASES = [
    # (input, canonical)
    ("HTTP://WWW.Ex.COM:80/A/b/", "http://www.ex.com/A/b"),
    ("https://Ex.com:443/x?utm_source=a&id=1#frag", "https://ex.com/x?id=1"),
    ("https://ex.com/x?id=1&utm_campaign=z&y=2", "https://ex.com/x?id=1&y=2"),
    ("http://ex.com/?utm_medium=m", "http://ex.com/"),
    ("http://ex.com:8080/p", "http://ex.com:8080/p"),  # non-default port kept
    ("no-scheme/path/", "no-scheme/path/"),  # passthrough untouched
]


def test_canonicalize_rules(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    got = [r["c"] for r in df.select(urls.canonicalize_url(F.col("url")).alias("c")).collect()]
    assert got == [c for _, c in CASES]


def test_host_and_registered_domain(spark):
    rows = [
        ("https://user@WWW.News.Example.CO.UK:443/p", "www.news.example.co.uk", "example.co.uk"),
        ("http://a.b.example.com/x", "a.b.example.com", "example.com"),
        ("http://localhost/x", "localhost", "localhost"),
    ]
    df = spark.createDataFrame([(u,) for u, _, _ in rows], "url string")
    h = urls.host_of(F.col("url"))
    got = df.select(h.alias("h"), urls.registered_domain(h).alias("d")).collect()
    assert [(r["h"], r["d"]) for r in got] == [(h_, d_) for _, h_, d_ in rows]


def test_line_dedup_roundtrip(spark):
    docs = spark.createDataFrame(
        [
            (1, "unique alpha\ncookie banner\nmore alpha"),
            (2, "cookie banner\nunique beta"),
            (3, "unique gamma\ncookie banner"),
        ],
        "doc_id long, text string",
    )
    lines = line_frame(docs)
    common = common_lines(lines, min_docs=2)
    assert common.count() == 1  # only the banner repeats
    cleaned = reassemble_lines(drop_common_lines(lines, min_docs=2))
    out = {r["doc_id"]: r["text"] for r in cleaned.collect()}
    assert out == {
        1: "unique alpha\nmore alpha",
        2: "unique beta",
        3: "unique gamma",
    }


def test_chunk_frame_windows(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g")], "doc_id long, text string"
    )
    got = {
        r["line_no"]: r["line"] for r in chunk_frame(docs, n_words=3).collect()
    }
    assert got == {0: "a b c", 1: "d e f", 2: "g"}


def test_line_dedup_single_shuffle_topology(spark):
    """count + anti-join both key on md5(line): the aggregate's exchange
    partitioning must serve the join side without a third line-frame
    recomputation per branch (plan sanity, not an exact budget)."""
    docs = spark.createDataFrame(
        [(i, f"x {i}\nshared line") for i in range(10)], "doc_id long, text string"
    )
    plan = (
        drop_common_lines(line_frame(docs), min_docs=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_domain_stats_and_cap(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c", "http://www.ex.com/1"),
            (2, "d e", "http://blog.ex.com/2"),
            (3, "f", "http://other.co.uk/3"),
            (4, "g h", "http://www.ex.com/4"),
        ],
        "doc_id long, text string, url string",
    )
    stats = {
        r["domain"]: (r["n_docs"], r["n_tokens"])
        for r in urls.domain_stats(docs).collect()
    }
    assert stats == {"ex.com": (3, 7), "other.co.uk": (1, 1)}
    capped = sorted(
        r["doc_id"] for r in urls.domain_cap(docs, max_docs=2).collect()
    )
    assert capped == [1, 2, 3]  # doc 4 is ex.com's third
