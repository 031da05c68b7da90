"""Generic HTML table and metadata extraction — the WEB counterpart of
the PDF-geometry table detectors (north star: the reference's per-bank
pdfplumber/camelot scans generalized to config-free extraction; this
module covers the HTML-native case where the grid is explicit markup,
so no geometry clustering is needed — `operators/tables.py` and
`operators/statemachines.py` own the positional cases).

Everything is scan-side regexp codegen over the raw html column: tables
explode to (url, table_no, row_no, cells) skinny rows with document
order carried by match index; metadata is a single projection. No UDF,
no shuffle (downstream aggregates inherit whatever key the caller
groups by). Regexes avoid lookarounds and use (?s)/non-greedy only —
identical semantics in Java regex and DuckDB's RE2, which the
contracts exploit.

Entity handling: the four predefined XML entities plus ``&#39;`` fold
via chained replaces (the long tail of named entities is data, not
code — production ships a broadcast map; the seam is `unescape_basic`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TABLE_RE = r"(?s)<table[^>]*>.*?</table>"
ROW_RE = r"(?s)<tr[^>]*>.*?</tr>"
CELL_RE = r"(?s)<t[dh][^>]*>(.*?)</t[dh]>"


def unescape_basic(col: Column) -> Column:
    """&amp; &lt; &gt; &quot; &#39; — amp LAST so '&amp;lt;' stays '&lt;'."""
    out = col
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&amp;", "&"),
    ):
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def _clean_cell(c: Column) -> Column:
    stripped = F.regexp_replace(c, r"<[^>]+>", "")
    squeezed = F.trim(F.regexp_replace(stripped, r"\s+", " "))
    return unescape_basic(squeezed)


def html_tables(
    pages: DataFrame,
    *,
    html_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """(url, table_no, row_no, cells, n_cells): every ``<table>`` in
    document order, one output row per ``<tr>``, cells tag-stripped /
    whitespace-squeezed / entity-unescaped in order (``<th>`` and
    ``<td>`` both count — header typing is the caller's concern, as in
    the reference's header-promotion step). Nested tables: the
    non-greedy table match closes at the FIRST ``</table>``, the
    documented limit of regex-grade extraction (real-world stats: the
    overwhelming majority of data tables are flat; a tree parser
    belongs in a Pandas-UDF seam if ever needed)."""
    tables = pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(
            F.regexp_extract_all(F.col(html_col), F.lit(TABLE_RE), F.lit(0))
        ).alias("table_no", "__t"),
    )
    rows = tables.select(
        "url",
        "table_no",
        F.posexplode(
            F.regexp_extract_all(F.col("__t"), F.lit(ROW_RE), F.lit(0))
        ).alias("row_no", "__r"),
    )
    cells = F.transform(
        F.regexp_extract_all(F.col("__r"), F.lit(CELL_RE), F.lit(1)),
        _clean_cell,
    )
    return rows.select(
        "url",
        "table_no",
        "row_no",
        cells.alias("cells"),
        F.size(cells).alias("n_cells"),
    )


def table_markdown(tables: DataFrame) -> DataFrame:
    """Render `html_tables` rows to one GitHub-markdown string per
    (url, table_no): first row is the header, then the separator, then
    body rows — the text-serializer shape LLM ingestion wants tables
    in. Pipes inside cells escape to ``\\|``. One groupBy on the url
    key the rows already carry."""
    line = F.concat(
        F.lit("| "),
        F.array_join(
            F.transform(
                F.col("cells"),
                lambda c: F.replace(c, F.lit("|"), F.lit("\\|")),
            ),
            " | ",
        ),
        F.lit(" |"),
    )
    packed = F.array_sort(
        F.collect_list(F.struct(F.col("row_no"), line.alias("line"), F.col("n_cells")))
    )
    return (
        tables.groupBy("url", "table_no")
        .agg(packed.alias("__p"))
        .select(
            "url",
            "table_no",
            F.concat(
                F.element_at("__p", 1)["line"],
                F.lit("\n|"),
                F.repeat(F.lit(" --- |"), F.element_at("__p", 1)["n_cells"]),
                F.when(
                    F.size("__p") > 1,
                    F.concat(
                        F.lit("\n"),
                        F.array_join(
                            F.transform(
                                F.slice(F.col("__p"), 2, F.greatest(F.size("__p") - 1, F.lit(1))),
                                lambda s: s["line"],
                            ),
                            "\n",
                        ),
                    ),
                ).otherwise(F.lit("")),
            ).alias("markdown"),
            F.size("__p").alias("n_rows"),
        )
    )


def html_meta(
    pages: DataFrame,
    *,
    html_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """(url, title, description, canonical, og_title, lang_attr): the
    head metadata every index/quality pipeline wants, first match wins,
    absent -> ''. Single scan-side projection, no shuffle."""
    h = F.col(html_col)

    def first(pattern: str) -> Column:
        return _clean_cell(F.regexp_extract(h, pattern, 1))

    return pages.select(
        F.col(url_col).alias("url"),
        first(r"(?s)<title[^>]*>(.*?)</title>").alias("title"),
        first(r'<meta\s[^>]*name="description"[^>]*content="([^"]*)"').alias(
            "description"
        ),
        first(r'<link\s[^>]*rel="canonical"[^>]*href="([^"]*)"').alias(
            "canonical"
        ),
        first(r'<meta\s[^>]*property="og:title"[^>]*content="([^"]*)"').alias(
            "og_title"
        ),
        first(r'<html[^>]*\slang="([^"]*)"').alias("lang_attr"),
    )


#: Block-opening tags that start a content block (headings tracked
#: separately so jusText's heading promotion gets real is_heading).
_HEADING_OPEN = r"(?i)<h[1-6][^>]*>"
_BLOCK_OPEN = r"(?i)<(?:p|div|li|td|th|blockquote|article|section|pre|tr|br\s*/?)[^>]*>"
_STRIP = (
    r"(?is)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>|<!--.*?-->"
)


def html_blocks(
    pages: DataFrame,
    *,
    html_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """Real-HTML DOM-block array: the ``(url, block_idx, block_text,
    is_heading)`` frame both boilerplate classifiers consume (north
    star: "Boilerpipe-style block scoring over a lightweight DOM-block
    array"), derived from raw markup. Script/style/comment subtrees
    drop wholesale; heading opens mark their block so jusText's
    heading-promotion pass runs on real signal; remaining tags strip
    per block, entities unescape, whitespace squeezes; empty blocks
    drop (classifier neighbours are the surviving blocks, as in
    boilerplate.page_blocks).

    Mechanics: block boundaries survive the split via \\x01-sentinel
    injection (H for headings, B otherwise) BEFORE tags strip — a
    backreference-free formulation identical in Java regex and RE2, so
    the oracle replays it verbatim. All scan-side codegen, one narrow
    posexplode, no shuffle."""
    h = F.regexp_replace(F.col(html_col), _STRIP, "")
    marked = F.regexp_replace(
        F.regexp_replace(h, _HEADING_OPEN, "\x01H"),
        _BLOCK_OPEN,
        "\x01B",
    )
    pieces = pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(F.split(marked, "\x01")).alias("piece_no", "__p"),
    ).where(F.col("piece_no") > 0)
    kind = F.substring(F.col("__p"), 1, 1)
    body = _clean_cell(F.substring(F.col("__p"), 2, 1 << 30))
    blocks = pieces.select(
        "url",
        F.col("piece_no"),
        (kind == "H").alias("is_heading"),
        body.alias("block_text"),
    ).where(F.col("block_text") != "")
    from pyspark.sql import Window

    w = Window.partitionBy("url").orderBy("piece_no")
    return blocks.select(
        "url",
        (F.row_number().over(w) - 1).alias("block_idx"),
        "block_text",
        "is_heading",
    )
