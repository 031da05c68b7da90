"""Unit tests for Gopher-style repetition stats and latest-capture crawl
merge (the sf contracts cover the corpus; these cover the hand-checkable
edge semantics: duplicate lines, dominating n-grams, overlapping repeated
5-gram runs, capture ordering)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_table_extractor_spark.operators import textquality, urls


def test_repetition_stats_dup_lines(spark):
    docs = spark.createDataFrame(
        [
            (1, "hello world\nhello world\nunique line"),
            (2, "a b c\nd e f"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in textquality.repetition_stats(docs).collect()}
    # doc 1: 3 lines, one repeat -> 1/3; chars 11+11+11 all len-11 lines
    assert out[1]["dup_line_frac"] == round(1 / 3, 6)
    assert out[1]["dup_line_char_frac"] == round(11 / 33, 6)
    assert out[2]["dup_line_frac"] == 0.0


def test_repetition_stats_top_ngram(spark):
    # "x y" appears 3x in 6 tokens -> top2gram covers 6/6 capped at 1.0
    docs = spark.createDataFrame(
        [(1, "x y x y x y"), (2, "a b c d e f")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in textquality.repetition_stats(docs).collect()}
    assert out[1]["top2gram_frac"] == 1.0
    assert out[2]["top2gram_frac"] == round(2 / 6, 6)  # all 2-grams unique
    assert out[2]["top3gram_frac"] == round(3 / 6, 6)


def test_repetition_stats_dup5gram_coverage(spark):
    # 'a b c d e' repeats twice (10 covered tokens of 11)
    docs = spark.createDataFrame(
        [(1, "a b c d e a b c d e z"), (2, "p q r s t u v w x y")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in textquality.repetition_stats(docs).collect()}
    assert out[1]["dup5gram_frac"] == round(10 / 11, 6)
    assert out[2]["dup5gram_frac"] == 0.0
    assert out[1]["n_toks"] == 11


def test_latest_capture_keeps_newest(spark):
    df = spark.createDataFrame(
        [
            (1, "u1", 100, "old"),
            (2, "u1", 300, "new"),
            (3, "u1", 200, "mid"),
            (4, "u2", 50, "only"),
        ],
        "doc_id long, url string, warc_us long, text string",
    )
    out = {
        r["url"]: (r["doc_id"], r["text"])
        for r in urls.latest_capture(df).collect()
    }
    assert out == {"u1": (2, "new"), "u2": (4, "only")}


def test_latest_capture_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, "u", 100, "a"), (2, "u", 100, "b")],
        "doc_id long, url string, warc_us long, text string",
    )
    (row,) = urls.latest_capture(df).collect()
    assert row["doc_id"] == 2  # equal ts -> highest tiebreak id wins


def test_sentences_split_and_trim(spark):
    docs = spark.createDataFrame(
        [(1, "First one. Second?  Third thing! trailing"), (2, "no punct")],
        "doc_id long, text string",
    )
    out = [
        (r["doc_id"], r["sent_no"], r["sentence"])
        for r in textquality.sentences(docs).orderBy("doc_id", "sent_no").collect()
    ]
    assert out == [
        (1, 0, "First one."),
        (1, 1, "Second?"),
        (1, 2, "Third thing!"),
        (1, 3, "trailing"),
        (2, 0, "no punct"),
    ]


def test_nfc_normalize_composes(spark):
    from pdf_table_extractor_spark.functions import textops

    decomposed = "école"  # e + COMBINING ACUTE
    composed = "école"
    df = spark.createDataFrame([(1, decomposed)], "doc_id long, t string")
    (row,) = df.select(textops.nfc_normalize(df["t"]).alias("n")).collect()
    assert row["n"] == composed and len(row["n"]) == 5


def test_crawl_frontier_politeness_invariants(spark):
    """Every host lands on exactly one worker; slots are 1..k contiguous
    by descending priority (url tiebreak); the per-host cap truncates."""
    rows = [
        (f"http://h{i % 3}.com/p{i}", float(i % 5)) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "url string, priority double")
    out = urls.crawl_frontier(df, n_workers=4, max_per_host=7).collect()
    by_host = {}
    for r in out:
        by_host.setdefault(r["host"], []).append(r)
    assert set(by_host) == {"h0.com", "h1.com", "h2.com"}
    for host, rs in by_host.items():
        assert len({r["worker"] for r in rs}) == 1
        slots = sorted(r["slot"] for r in rs)
        assert slots == list(range(1, 8))  # capped at 7, contiguous
        # descending priority along slots
        rs = sorted(rs, key=lambda r: r["slot"])
        prios = [
            float(r["url"].rsplit("p", 1)[1]) % 5 for r in rs
        ]
        assert prios == sorted(prios, reverse=True) or all(
            a >= b for a, b in zip(prios, prios[1:])
        )


def test_crawl_frontier_rejects_bad_workers(spark):
    import pytest

    df = spark.createDataFrame([("http://a.com/x", 1.0)], "url string, priority double")
    with pytest.raises(ValueError):
        urls.crawl_frontier(df, n_workers=0)


def test_anchor_texts_aggregates_across_pages(spark):
    pages = spark.createDataFrame(
        [
            ("p1", '<a href="http://t.com/a">Fast Spark</a>'
                   '<a class="x" href="http://t.com/b">spark</a>'),
            ("p2", '<b>no links</b><a href="http://t.com/a">spark engine</a>'),
        ],
        "url string, html string",
    )
    got = {
        (r["dst"], r["term"]): (r["n_mentions"], r["n_pages"])
        for r in urls.anchor_texts(pages).collect()
    }
    assert got[("http://t.com/a", "spark")] == (2, 2)
    assert got[("http://t.com/a", "fast")] == (1, 1)
    assert got[("http://t.com/a", "engine")] == (1, 1)
    assert got[("http://t.com/b", "spark")] == (1, 1)
    assert len(got) == 4


def test_url_templates_folds_ids(spark):
    pages = spark.createDataFrame(
        [
            ("http://a.com/post/123",),
            ("http://a.com/post/456",),
            ("http://a.com/cache/deadbeef1234/x",),
            ("http://a.com/about",),
            ("http://b.com/post/1",),
        ],
        "url string",
    )
    got = {
        (r["host"], r["template"]): (r["n_urls"], r["example_url"])
        for r in urls.url_templates(pages).collect()
    }
    assert got[("a.com", "/post/{n}")] == (2, "http://a.com/post/123")
    assert got[("a.com", "/cache/{hex}/x")] == (1, "http://a.com/cache/deadbeef1234/x")
    assert got[("a.com", "/about")][0] == 1
    assert got[("b.com", "/post/{n}")][0] == 1


def test_parse_robots_group_resolution(spark):
    body_a = "\n".join([
        "Disallow: /before-any-group   # ignored per RFC",
        "# a comment line",
        "User-agent: *",
        "Disallow: /tmp",
        "Allow: /tmp/ok",
        "",
        "User-agent: spark-graft-bot",
        "User-agent: otherbot",
        "Disallow: /private",
        "Allow:",
    ])
    body_b = "User-agent: *\r\nDisallow: /all\r\n"
    body_c = "User-agent: googlebot\nDisallow: /g\n"
    df = spark.createDataFrame(
        [("a.com", body_a), ("b.com", body_b), ("c.com", body_c)],
        "host string, robots_txt string",
    )
    rules = urls.parse_robots(df, "Spark-Graft-Bot/1.0")
    got = {(r["host"], r["directive"], r["path_prefix"]) for r in rules.collect()}
    # a.com: the specific group (len 15) beats *; both its agents' rules
    assert got == {
        ("a.com", "disallow", "/private"),
        ("a.com", "allow", ""),
        ("b.com", "disallow", "/all"),
        # c.com: no matching group -> no rules -> evaluator default-allows
    }
    # composition: the parsed table drives robots_allowed directly
    frontier = spark.createDataFrame(
        [("a.com", "/private/x"), ("a.com", "/open"), ("b.com", "/all/y"),
         ("c.com", "/anything")],
        "host string, path string",
    )
    verdict = {
        (r["host"], r["path"]): r["allowed"]
        for r in urls.robots_allowed(frontier, rules).collect()
    }
    assert verdict == {
        ("a.com", "/private/x"): False,
        ("a.com", "/open"): True,     # '' allow matches everything
        ("b.com", "/all/y"): False,
        ("c.com", "/anything"): True,  # ruleless host default-allows
    }


def test_parse_sitemaps_kinds_and_lastmod(spark):
    xml = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc>http://a.com/1</loc><lastmod>2024-03-05</lastmod></url>"
        "<url><loc> http://a.com/2 </loc></url>"
        "<url><loc>http://a.com/3</loc><lastmod>garbage</lastmod></url>"
        "</urlset><sitemapindex>"
        "<sitemap><loc>http://a.com/more.xml</loc>"
        "<lastmod>2024-01-02T03:04:05Z</lastmod></sitemap>"
        "</sitemapindex>"
    )
    df = spark.createDataFrame([("a.com", xml)], "host string, sitemap_xml string")
    got = {
        (r["kind"], r["loc"]): (r["lastmod"], str(r["lastmod_date"]))
        for r in urls.parse_sitemaps(df).collect()
    }
    assert got[("url", "http://a.com/1")] == ("2024-03-05", "2024-03-05")
    assert got[("url", "http://a.com/2")] == ("", "None")  # trimmed loc, no lastmod
    assert got[("url", "http://a.com/3")][1] == "None"     # garbage -> NULL not throw
    assert got[("sitemap", "http://a.com/more.xml")] == (
        "2024-01-02T03:04:05Z", "2024-01-02",
    )


def test_recrawl_priority_tiers(spark):
    import datetime as dt

    seeds = spark.createDataFrame(
        [("u1", dt.date(2024, 6, 1)), ("u2", dt.date(2024, 1, 1)),
         ("u3", None), ("u4", dt.date(2024, 3, 1))],
        "url string, lastmod_date date",
    )
    caps = spark.createDataFrame(
        [("u1", dt.date(2024, 5, 1), dt.date(2024, 8, 1)),
         ("u2", dt.date(2024, 2, 1), dt.date(2024, 8, 1)),
         ("u3", dt.date(2024, 7, 1), dt.date(2024, 8, 1))],
        "url string, captured_date date, asof_date date",
    )
    got = {r["url"]: (r["tier"], r["days_stale"])
           for r in urls.recrawl_priority(caps, seeds).collect()}
    assert got["u1"] == (2, 31)    # publisher-stale by a month
    assert got["u2"] == (3, 182)   # lastmod older than capture -> age revisit
    assert got["u3"] == (3, 31)    # no lastmod -> age revisit
    assert got["u4"] == (1, 10000) # never captured -> discovery


def test_parse_robots_delays_group_and_max_rule(spark):
    body = (
        "# robots\n"
        "User-agent: *\n"
        "Crawl-delay: 10\n"
        "Disallow: /x\n"
        "User-agent: graftbot\n"
        "Crawl-delay: 2\n"
        "Crawl-delay: 4.5\n"   # max of the winning group wins
        "Allow: /\n"
    )
    noisy = "User-agent: *\nCrawl-delay: soon\n"    # invalid -> no row
    nodelay = "User-agent: *\nDisallow: /private\n"
    bodies = spark.createDataFrame(
        [("h1", body), ("h2", noisy), ("h3", nodelay)],
        "host string, robots_txt string",
    )
    got = {r["host"]: r["crawl_delay"]
           for r in urls.parse_robots_delays(bodies, "graftbot/2.0").collect()}
    assert got == {"h1": 4.5}
    # the * group still applies to an agent with no specific group
    got2 = {r["host"]: r["crawl_delay"]
            for r in urls.parse_robots_delays(bodies, "otherbot").collect()}
    assert got2 == {"h1": 10.0}
    # group boundaries survive interleaved allow/disallow lines: the *
    # group's delay must NOT leak into graftbot's (and vice versa)
    two = (
        "User-agent: alpha\nDisallow: /x\nUser-agent: beta\nCrawl-delay: 7\n"
    )
    bodies2 = spark.createDataFrame([("h9", two)], "host string, robots_txt string")
    assert urls.parse_robots_delays(bodies2, "alpha-bot").count() == 0
    got3 = {r["host"]: r["crawl_delay"]
            for r in urls.parse_robots_delays(bodies2, "beta-bot").collect()}
    assert got3 == {"h9": 7.0}


def test_crawl_frontier_delay_budget(spark):
    import pytest

    frontier = spark.createDataFrame(
        [(f"http://h{h}/p{i}", 10 - i) for h in (1, 2, 3, 4) for i in range(6)],
        "url string, priority int",
    )
    delays = spark.createDataFrame(
        [("h1", 10.0),   # floor(30/10) = 3 slots
         ("h2", 45.0),   # delay > cycle -> 0 slots this cycle
         ("h3", 0.0)],   # stated zero -> unconstrained
        "host string, crawl_delay double",
    )
    got = {}
    rows = urls.crawl_frontier(
        frontier, n_workers=2, max_per_host=5, delays=delays, cycle_seconds=30
    ).collect()
    for r in rows:
        got.setdefault(r["host"], []).append(r["slot"])
    assert sorted(got["h1"]) == [1, 2, 3]          # budget 3 < cap 5
    assert "h2" not in got                          # waits out the cycle
    assert sorted(got["h3"]) == [1, 2, 3, 4, 5]     # cap 5 only
    assert sorted(got["h4"]) == [1, 2, 3, 4, 5]     # no delay row -> cap only
    with pytest.raises(ValueError, match="together"):
        urls.crawl_frontier(frontier, n_workers=2, delays=delays)
    with pytest.raises(ValueError, match="positive"):
        urls.crawl_frontier(
            frontier, n_workers=2, delays=delays, cycle_seconds=0
        )
