"""Generic HTML table/metadata extraction: hand-checkable corpus plus
plan hygiene (no shuffle before the markdown groupBy, no UDF)."""

from __future__ import annotations

from pyspark.sql import Row

from pdf_table_extractor_spark.operators import htmltables

_HTML = """<html lang="pt-BR"><head>
<title> My &amp; Your <b>Page</b> </title>
<meta name="description" content="a &quot;test&quot; page">
<link rel="canonical" href="http://ex.com/c">
<meta property="og:title" content="OG title">
</head><body>
<table class="x"><tr><th>Name</th><th>Val|ue</th></tr>
<tr><td><b>alpha</b></td><td> 1 </td></tr>
<tr><td>beta &lt;3</td><td>2</td></tr></table>
<p>between</p>
<table><tr><td>solo</td></tr></table>
</body></html>"""


def test_html_tables_and_markdown(spark):
    df = spark.createDataFrame([Row(url="u", html=_HTML)])
    rows = htmltables.html_tables(df).collect()
    by = {(r["table_no"], r["row_no"]): r["cells"] for r in rows}
    assert by[(0, 0)] == ["Name", "Val|ue"]
    assert by[(0, 1)] == ["alpha", "1"]
    assert by[(0, 2)] == ["beta <3", "2"]
    assert by[(1, 0)] == ["solo"]
    md = {
        r["table_no"]: r["markdown"]
        for r in htmltables.table_markdown(htmltables.html_tables(df)).collect()
    }
    assert md[0] == (
        "| Name | Val\\|ue |\n| --- | --- |\n"
        "| alpha | 1 |\n| beta <3 | 2 |"
    )
    assert md[1] == "| solo |\n| --- |"


def test_html_meta(spark):
    df = spark.createDataFrame(
        [Row(url="u", html=_HTML), Row(url="v", html="<p>bare</p>")]
    )
    got = {r["url"]: r for r in htmltables.html_meta(df).collect()}
    u = got["u"]
    assert u["title"] == "My & Your Page"
    assert u["description"] == 'a "test" page'
    assert u["canonical"] == "http://ex.com/c"
    assert u["og_title"] == "OG title"
    assert u["lang_attr"] == "pt-BR"
    v = got["v"]
    assert (v["title"], v["canonical"], v["lang_attr"]) == ("", "", "")


def test_no_python_in_plan(spark):
    df = spark.createDataFrame([Row(url="u", html=_HTML)])
    plan = (
        htmltables.table_markdown(htmltables.html_tables(df))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan
    # extraction itself shuffles nothing; only the markdown pack groups
    assert plan.count("Exchange") <= 1


def test_html_blocks_headings_and_strip(spark):
    html = (
        "<html><head><style>p{color:red}</style>"
        "<script>var x = '<p>fake</p>';</script></head><body>"
        "<h1>Big Title</h1><p>First para &amp; more.</p>"
        "<div>Second <b>bold</b> block</div>"
        "<p></p>"  # empty block drops
        "<!-- <p>comment para</p> -->"
        "<li>item one</li></body></html>"
    )
    df = spark.createDataFrame([Row(url="u", html=html)])
    rows = htmltables.html_blocks(df).orderBy("block_idx").collect()
    got = [(r["block_idx"], r["block_text"], r["is_heading"]) for r in rows]
    assert got == [
        (0, "Big Title", True),
        (1, "First para & more.", False),
        (2, "Second bold block", False),
        (3, "item one", False),
    ]
