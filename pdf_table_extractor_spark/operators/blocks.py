"""parse_blocks — the D3 producer (SURVEY §2.10 UDF #1).

Turns the binary ``html`` markup into the lightweight DOM-block array
``array<struct<page_no,kind,text,x0,x1,top,bottom>>``. This is the engine's
replacement for pdfplumber's ``extract_words`` / camelot's low-level word
boxes (conversor_banestes.py:40, conversor_itau.py:99-108) — an Arrow-
vectorized scalar pandas UDF, one row per document, iterator form so any
parser init is amortized per batch.

The binary column should be dropped immediately after this projection so
column pruning keeps `html` out of every downstream exchange.

MARKUP GRAMMAR NOTE: the W/P/R line format ("W x0 x1 top bottom text",
"P n", "R x0 x1 top bottom") is parsed by THREE deliberately-inlined hot
loops in this module — `_parse_to_tuples` (array<struct>, rulings
included), `word_rows` (flat per-word), `word_pages` (packed per-page)
— plus the readable reference parser in `markup.py`. Inlining is a
measured ~2-3× python-stage win, but any grammar change MUST touch all
four; `tests/test_functions.py::test_word_pages_parity_and_poison_rollback`
pins word_rows==word_pages, and the goldens catch the rest.
"""

from __future__ import annotations

import functools
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

from pdf_table_extractor_spark.operators.quarantine import guard_doc, parse_failures

BLOCK_SCHEMA = (
    "array<struct<page_no:int,kind:string,text:string,"
    "x0:double,x1:double,top:double,bottom:double>>"
)


def _parse_to_tuples(raw: bytes) -> list[tuple]:
    """Markup → block tuples directly (same grammar as markup.parse, which
    stays the readable reference parser): skipping the Word/Ruling
    dataclass round-trip roughly halves per-doc Python time in this UDF —
    the single hottest Python loop in the layout branches."""
    word_rows: list[tuple] = []
    ruling_rows: list[tuple] = []
    page_no = 0
    for line in raw.decode("utf-8").splitlines():
        if not line:
            continue
        kind = line[0]
        if kind == "W" and line[1] == " ":
            x0, x1, top, bottom, text = line[2:].split(" ", 4)
            word_rows.append(
                (page_no, "word", text, float(x0), float(x1), float(top), float(bottom))
            )
        elif kind == "P":  # PAGE
            page_no = int(line.split(" ", 2)[1])
        elif kind == "R" and line[1] == " ":
            x0, x1, top, bottom = line[2:].split(" ")
            ruling_rows.append(
                (page_no, "ruling", None, float(x0), float(x1), float(top), float(bottom))
            )
    return word_rows + ruling_rows


@functools.cache
def _parse_blocks_udf():
    # Deferred: pandas_udf with a DDL return type needs an active session,
    # so the UDF is created on first use, not at import.
    parse = guard_doc(_parse_to_tuples)  # undecodable/garbled doc → None

    @pandas_udf(BLOCK_SCHEMA)
    def _udf(html_iter: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for html_col in html_iter:
            out = [
                None if raw is None else parse(bytes(raw))
                for raw in html_col
            ]
            yield pd.Series(out, dtype=object)

    return _udf


def parse_blocks(col: Column | str) -> Column:
    return _parse_blocks_udf()(col)


WORD_ROWS_SCHEMA = (
    "url string, page_no int, text string, x0 double, top double"
)


def word_rows(pages):
    """pages(url, html, ...) → one flat row per positioned WORD
    (url, page_no, text, x0, top) via mapInPandas.

    The flat-columnar producer for the layout path: building eight primitive
    Arrow arrays is ~3× cheaper than the array<struct> route
    (object-dtype Series of per-doc tuple lists + a downstream explode) —
    measured on the banestes branch. `parse_blocks` stays as the
    array-valued variant for callers that need whole-doc block arrays
    (rulings included)."""
    import pandas as pd  # noqa: F811 — executor-side import

    acc = parse_failures()  # captured driver-side into the closure

    def gen(batches):
        for b in batches:
            urls: list = []
            pnos: list = []
            texts: list = []
            x0s: list = []
            tops: list = []
            for url, raw in zip(b["url"], b["html"]):
                if raw is None:
                    continue
                n0 = len(urls)
                try:
                    page_no = 0
                    for line in bytes(raw).decode("utf-8").splitlines():
                        if not line:
                            continue
                        k = line[0]
                        if k == "W" and line[1] == " ":
                            x0, _x1, top, _bottom, text = line[2:].split(" ", 4)
                            urls.append(url)
                            pnos.append(page_no)
                            texts.append(text)
                            x0s.append(float(x0))
                            tops.append(float(top))
                        elif k == "P":
                            page_no = int(line.split(" ", 2)[1])
                except (MemoryError, KeyboardInterrupt, SystemExit):
                    raise
                except Exception:
                    # poison doc: roll back its partial rows, count, move on
                    del urls[n0:], pnos[n0:], texts[n0:], x0s[n0:], tops[n0:]
                    if acc is not None:
                        acc.add(1)
            yield pd.DataFrame(
                {"url": urls, "page_no": pnos, "text": texts, "x0": x0s, "top": tops}
            )

    return pages.select("url", "html").mapInPandas(gen, schema=WORD_ROWS_SCHEMA)


WORD_PAGES_SCHEMA = (
    "url string, page_no int, x0s array<double>, tops array<double>, "
    "texts array<string>"
)


def word_pages(pages):
    """pages(url, html, ...) → one row per (url, page) with parallel word
    arrays (x0s, tops, texts) via mapInPandas.

    The byte-diet shape for the post-UDF exchange (round-4 verdict stretch
    ask): the layout branch must re-partition AFTER its Python stage
    (ArrowEvalPython drops outputPartitioning), and with `word_rows` that
    exchange pays the url string and the per-row shuffle overhead once per
    WORD. Packing a page's words into parallel primitive arrays pays them
    once per PAGE (~83 words/page in the bench corpus) while keeping
    every downstream operation in Catalyst — the consumer explodes
    arrays_zip AFTER the exchange, on the same partitions (Generate
    preserves partitioning). Measured vs word_rows at 100k docs:
    exchange 18.1→13.5 MB and 869k→10.5k records, stage thread-time
    ~43s→~12s (BENCH/ab_word_pages.json) — the per-record UnsafeRow
    overhead and repeated url strings were the cost, not payload bytes.
    Poison docs roll back whole documents, as in word_rows."""
    import pandas as pd  # noqa: F811 — executor-side import

    acc = parse_failures()

    def gen(batches):
        for b in batches:
            urls: list = []
            pnos: list = []
            x0ss: list = []
            topss: list = []
            textss: list = []
            for url, raw in zip(b["url"], b["html"]):
                if raw is None:
                    continue
                n0 = len(urls)
                try:
                    page_no = 0
                    x0s: list = []
                    tops: list = []
                    texts: list = []

                    def flush(nxt: int) -> None:
                        nonlocal x0s, tops, texts, page_no
                        if texts:
                            urls.append(url)
                            pnos.append(page_no)
                            x0ss.append(x0s)
                            topss.append(tops)
                            textss.append(texts)
                            x0s, tops, texts = [], [], []
                        page_no = nxt

                    for line in bytes(raw).decode("utf-8").splitlines():
                        if not line:
                            continue
                        k = line[0]
                        if k == "W" and line[1] == " ":
                            x0, _x1, top, _bottom, text = line[2:].split(" ", 4)
                            texts.append(text)
                            x0s.append(float(x0))
                            tops.append(float(top))
                        elif k == "P":
                            flush(int(line.split(" ", 2)[1]))
                    flush(0)
                except (MemoryError, KeyboardInterrupt, SystemExit):
                    raise
                except Exception:
                    del urls[n0:], pnos[n0:], x0ss[n0:], topss[n0:], textss[n0:]
                    if acc is not None:
                        acc.add(1)
            # explicit dtypes: a batch with no surviving rows would let
            # pandas infer float64 for the list columns, which Arrow
            # cannot convert to list<double> (caught by the parity test's
            # all-poison partition)
            yield pd.DataFrame(
                {
                    "url": pd.Series(urls, dtype=object),
                    "page_no": pd.Series(pnos, dtype="int64"),
                    "x0s": pd.Series(x0ss, dtype=object),
                    "tops": pd.Series(topss, dtype=object),
                    "texts": pd.Series(textss, dtype=object),
                }
            )

    return pages.select("url", "html").mapInPandas(gen, schema=WORD_PAGES_SCHEMA)
