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


def test_drop_duplicated_spans(spark):
    from pdf_table_extractor_spark.operators.dedup import drop_duplicated_spans

    shared = "one two three four five"
    docs = spark.createDataFrame(
        [
            (1, f"alpha {shared} beta"),
            (2, f"{shared} gamma delta"),
            (3, "totally unrelated text here"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in drop_duplicated_spans(docs, n=5, min_docs=2).collect()
    }
    assert out[1]["clean_text"] == "alpha beta"
    assert out[1]["n_dropped"] == 5
    assert out[2]["clean_text"] == "gamma delta"
    assert out[3]["clean_text"] == "totally unrelated text here"
    assert out[3]["n_dropped"] == 0


def test_drop_duplicated_spans_overlap_merge(spark):
    from pdf_table_extractor_spark.operators.dedup import drop_duplicated_spans

    # six shared tokens = two overlapping duplicated 5-grams -> one span
    shared = "a b c d e f"
    docs = spark.createDataFrame(
        [(1, f"x {shared} y"), (2, f"p {shared} q")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in drop_duplicated_spans(docs, n=5, min_docs=2).collect()
    }
    assert out[1]["clean_text"] == "x y"
    assert out[1]["n_dropped"] == 6


def test_cc_labels_and_fuzzy_keep(spark):
    from pdf_table_extractor_spark.operators.dedup import cc_labels, fuzzy_keep

    # components: {1,2,3,4} (chain), {7,9}; 5 isolated
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (7, 9)], "a long, b long"
    )
    labels = {r["id"]: r["label"] for r in cc_labels(pairs).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 7: 7, 9: 7}
    docs = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 5, 7, 9)], "doc_id long")
    keep = {r["doc_id"]: r["keep"] for r in fuzzy_keep(docs, pairs).collect()}
    assert keep == {1: True, 2: False, 3: False, 4: False, 5: True, 7: True, 9: False}


def test_drop_duplicated_spans_keep_first(spark):
    from pdf_table_extractor_spark.operators.dedup import drop_duplicated_spans

    shared = "one two three four five"
    docs = spark.createDataFrame(
        [(1, f"alpha {shared}"), (2, f"{shared} beta"), (3, f"{shared} gamma")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in drop_duplicated_spans(docs, n=5, min_docs=2, keep_first=True).collect()
    }
    # doc 1 (lowest id) keeps the passage; docs 2 and 3 lose it
    assert out[1]["clean_text"] == f"alpha {shared}" and out[1]["n_dropped"] == 0
    assert out[2]["clean_text"] == "beta" and out[2]["n_dropped"] == 5
    assert out[3]["clean_text"] == "gamma"


# ---------------------------------------------------------------------------
# robots.txt evaluation
# ---------------------------------------------------------------------------


def test_robots_longest_match_semantics(spark):
    from pdf_table_extractor_spark.operators import urls as U

    rules = spark.createDataFrame(
        [
            ("a.com", "disallow", "/"),
            ("a.com", "allow", "/public"),
            ("a.com", "disallow", "/public/private"),
            ("b.com", "allow", "/x"),
            ("b.com", "disallow", "/x"),  # equal length: allow must win
        ],
        "host string, directive string, path_prefix string",
    )
    frontier = spark.createDataFrame(
        [
            ("a.com", "/index.html"),        # caught by '/'
            ("a.com", "/public/doc"),        # allow /public beats /
            ("a.com", "/public/private/x"),  # longest disallow wins
            ("b.com", "/x/1"),               # tie -> allow
            ("c.com", "/anything"),          # no rules -> allowed
        ],
        "host string, path string",
    )
    got = {
        (r["host"], r["path"]): (r["allowed"], r["winner_prefix"])
        for r in U.robots_allowed(frontier, rules).collect()
    }
    assert got == {
        ("a.com", "/index.html"): (False, "/"),
        ("a.com", "/public/doc"): (True, "/public"),
        ("a.com", "/public/private/x"): (False, "/public/private"),
        ("b.com", "/x/1"): (True, "/x"),
        ("c.com", "/anything"): (True, None),
    }


def test_robots_plan_broadcasts_rules_single_shuffle(spark):
    from pdf_table_extractor_spark.operators import urls as U
    from pyspark.sql import functions as F

    frontier = spark.range(500).select(
        F.concat(F.lit("h"), (F.col("id") % 7).cast("string")).alias("host"),
        F.concat(F.lit("/p"), (F.col("id") % 11).cast("string")).alias("path"),
    )
    rules = spark.createDataFrame(
        [("h1", "disallow", "/p"), ("h2", "allow", "/p3")],
        "host string, directive string, path_prefix string",
    )
    out = U.robots_allowed(frontier, rules)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # the frontier shuffles exactly once (the winner aggregate)
    assert plan.count("Exchange") - plan.count("BroadcastExchange") <= 1

# ---------------------------------------------------------------------------
# corpus-wide keep-first paragraph dedup (CCNet §3.1)
# ---------------------------------------------------------------------------


def test_paragraph_dedup_keep_first_and_reconstruct(spark):
    from pdf_table_extractor_spark.operators.dedup import paragraph_dedup

    docs = spark.createDataFrame(
        [
            (1, "intro one\nshared banner\noutro one"),
            (2, "shared banner\nunique two"),
            (3, "shared banner"),
            (4, "   \n  "),  # whitespace-only: no non-empty paragraph
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in paragraph_dedup(docs).collect()}
    # doc 1 owns the first occurrence of every one of its paragraphs
    assert out[1]["clean_text"] == "intro one\nshared banner\noutro one"
    assert (out[1]["n_paras"], out[1]["n_dropped"]) == (3, 0)
    # doc 2 loses the banner but keeps its unique paragraph
    assert out[2]["clean_text"] == "unique two"
    assert (out[2]["n_paras"], out[2]["n_dropped"]) == (2, 1)
    # doc 3 is fully deduplicated away -> empty reconstruction, still counted
    assert out[3]["clean_text"] == ""
    assert (out[3]["n_paras"], out[3]["n_dropped"]) == (1, 1)
    # doc 4 had nothing to deduplicate -> absent
    assert 4 not in out


def test_paragraph_dedup_normalizes_hash_keeps_raw(spark):
    from pdf_table_extractor_spark.operators.dedup import paragraph_dedup

    # 'Shared  Banner' normalizes to the same key as 'shared banner' but the
    # surviving FIRST copy is emitted in its raw form.
    docs = spark.createDataFrame(
        [(1, "Shared  Banner\nkeep one"), (2, "shared banner\nkeep two")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in paragraph_dedup(docs).collect()}
    assert out[1]["clean_text"] == "Shared  Banner\nkeep one"
    assert out[2]["clean_text"] == "keep two"
    assert out[2]["n_dropped"] == 1


def test_paragraph_dedup_is_aggregate_join_no_corpus_window(spark):
    from pdf_table_extractor_spark.operators.dedup import paragraph_dedup

    docs = spark.createDataFrame(
        [(i, f"unique {i}\nshared banner") for i in range(20)],
        "doc_id long, text string",
    )
    plan = (
        paragraph_dedup(docs)._jdf.queryExecution().optimizedPlan().toString()
    )
    # first-occurrence election must be an aggregate, never a window
    assert "Window" not in plan
