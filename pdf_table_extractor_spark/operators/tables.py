"""detect_tables — stream-mode table extraction (SURVEY §2.10 UDF #3).

Reimplements the reference's camelot stream-mode usage
(conversor_itau.py:99-108: explicit ``table_areas`` + ``columns``
x-separators per page class) as word-to-column alignment over the markup
word boxes: filter words to the area, cluster rows on rounded y, bin each
word's x-center against the sorted separator array with
``np.searchsorted`` — the survey's "sorted interval merging" — and join a
cell's words x-sorted. Arrow-vectorized; one row per document.
"""

from __future__ import annotations

import functools
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import lit, pandas_udf

from pdf_table_extractor_spark.markup import parse as parse_markup
from pdf_table_extractor_spark.operators.quarantine import guard_doc, parse_failures

STREAM_SCHEMA = "array<struct<page_no:int,row_no:int,cells:array<string>>>"


def stream_rows_doc(html: bytes, config: dict) -> list[tuple[int, int, list[str]]]:
    """Extract stream-mode table rows for one document.

    ``config``: {"page_1": {"area": (x0, top0, x1, top1), "columns": [...]},
                 "page_2_end": {...}} — the itau geometry shape
    (Conversor.py:219) in markup coordinates.
    """
    words, _ = parse_markup(bytes(html))
    out: list[tuple[int, int, list[str]]] = []
    pages = sorted({w.page_no for w in words})
    for page in pages:
        cfg = config["page_1"] if page == 1 else config["page_2_end"]
        ax0, atop, ax1, abot = cfg["area"]
        seps = np.asarray(cfg["columns"], dtype=float)
        pw = [
            w
            for w in words
            if w.page_no == page
            and ax0 <= (w.x0 + w.x1) / 2 <= ax1
            and atop <= (w.top + w.bottom) / 2 <= abot
        ]
        if not pw:
            continue
        n_cols = len(seps) + 1
        rows: dict[float, list] = {}
        for w in pw:
            rows.setdefault(round(w.top, 0), []).append(w)
        for row_no, y in enumerate(sorted(rows)):
            cells: list[list] = [[] for _ in range(n_cols)]
            for w in rows[y]:
                ci = int(np.searchsorted(seps, (w.x0 + w.x1) / 2, side="right"))
                cells[ci].append(w)
            out.append(
                (
                    page,
                    row_no,
                    [
                        " ".join(w.text for w in sorted(c, key=lambda w: w.x0))
                        for c in cells
                    ],
                )
            )
    return out


@functools.cache
def _stream_udf(config_json: str):
    import json

    config = json.loads(config_json)
    for k in config:
        config[k] = {"area": tuple(config[k]["area"]), "columns": config[k]["columns"]}

    doc = guard_doc(stream_rows_doc)

    @pandas_udf(STREAM_SCHEMA)
    def _udf(htmls: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for col in htmls:
            yield pd.Series(
                [None if h is None else doc(h, config) for h in col],
                dtype=object,
            )

    return _udf


def stream_rows(col: Column | str, config: dict) -> Column:
    import json

    return _stream_udf(json.dumps(config, sort_keys=True))(col)


def _build_latin_fold() -> tuple[str, str]:
    """1→1 transliteration table for the Latin repertoire (Latin-1
    Supplement + Latin Extended-A/B head): NFKD-decompose, strip combining
    marks, keep single-ASCII-letter results — the same mapping `unidecode`
    applies to these ranges. Computed once at import so the hot path is a
    pure JVM translate()."""
    import unicodedata

    src, dst = [], []
    for cp in range(0x00A0, 0x0250):
        ch = chr(cp)
        base = "".join(
            c
            for c in unicodedata.normalize("NFKD", ch)
            if not unicodedata.combining(c)
        )
        if len(base) == 1 and base.isascii() and base.isalpha():
            src.append(ch)
            dst.append(base)
    # non-decomposing Latin letters unidecode still folds 1→1
    for s, d in zip("øØđĐħĦıłŁŧŦðÐ", "oOdDhHilLtTdD"):
        src.append(s)
        dst.append(d)
    return "".join(src), "".join(dst)


_FOLD_SRC, _FOLD_DST = _build_latin_fold()
# 1→many foldings translate() can't express (unidecode semantics)
_FOLD_MULTI = [("ß", "ss"), ("æ", "ae"), ("Æ", "AE"), ("œ", "oe"),
               ("Œ", "OE"), ("þ", "th"), ("Þ", "Th"), ("ĳ", "ij"), ("Ĳ", "IJ")]


def ascii_fold(col: Column) -> Column:
    """`unidecode`-equivalent fold for the full Latin repertoire
    (conversor_itau.py:133), entirely JVM-side: a few literal replaces for
    the 1→many cases, then one translate() for every accented Latin letter.
    Non-Latin scripts (CJK etc.) pass through unchanged — route those
    through functions.textops.transliterate (pandas UDF) instead."""
    from pyspark.sql import functions as F

    for s, d in _FOLD_MULTI:
        col = F.regexp_replace(col, s, d)
    return F.translate(col, _FOLD_SRC, _FOLD_DST)


TABLE_SPANS_SCHEMA = (
    "url string, page_no int, mode string, x0 double, top double, "
    "x1 double, bottom double, n_rows int, n_cols int"
)


def table_spans(pages, stream_config: dict | None = None):
    """pages(url, html, ...) → one row per detected tabular REGION — the
    north star's "table spans" payload written back next to the extracted
    text. Two detectors, mirroring the row extractors:

    - lattice: vertical-ruling groups define column borders and their
      horizontal companions the row borders (same clustering as
      statemachines._stone_doc); span = border bounding box.
    - stream: when a geometry config is supplied (camelot-style areas +
      column separators), the configured area clipped to the words it
      actually contains, with the observed y-cluster count as n_rows.

    Flat-columnar mapInPandas like blocks.word_rows — primitive Arrow
    arrays, no struct round-trips."""
    import pandas as pd

    from pdf_table_extractor_spark.markup import parse as parse_markup

    acc = parse_failures()  # captured driver-side into the closure

    def gen(batches):
        for b in batches:
            rows: list[tuple] = []
            for url, raw in zip(b["url"], b["html"]):
                if raw is None:
                    continue
                n0 = len(rows)
                try:
                    _span_doc(url, bytes(raw), stream_config, rows)
                except (MemoryError, KeyboardInterrupt, SystemExit):
                    raise
                except Exception:
                    del rows[n0:]
                    if acc is not None:
                        acc.add(1)
            yield pd.DataFrame(
                rows,
                columns=["url", "page_no", "mode", "x0", "top", "x1",
                         "bottom", "n_rows", "n_cols"],
            )

    return pages.select("url", "html").mapInPandas(gen, schema=TABLE_SPANS_SCHEMA)


def _span_doc(url, raw: bytes, stream_config, rows: list) -> None:
    """Append one document's lattice/stream span tuples to ``rows``."""
    words, rulings = parse_markup(raw)
    # lattice spans from ruling groups
    groups: dict[tuple, list[float]] = {}
    horiz: dict[int, list] = {}
    for r in rulings:
        if r.x0 == r.x1:
            groups.setdefault((r.page_no, r.top, r.bottom), []).append(r.x0)
        elif r.top == r.bottom:
            horiz.setdefault(r.page_no, []).append(r.top)
    for (page, top, bottom), xs in sorted(groups.items()):
        xs = sorted(set(xs))
        ys = sorted(
            {y for y in horiz.get(page, []) if top <= y <= bottom}
        )
        if len(xs) < 2 or len(ys) < 2:
            continue
        rows.append(
            (url, page, "lattice", xs[0], ys[0], xs[-1], ys[-1],
             len(ys) - 1, len(xs) - 1)
        )
    # stream spans from configured areas
    if stream_config is not None and words:
        for page in sorted({w.page_no for w in words}):
            cfg = (
                stream_config["page_1"]
                if page == 1
                else stream_config["page_2_end"]
            )
            ax0, atop, ax1, abot = cfg["area"]
            pw = [
                w for w in words
                if w.page_no == page
                and ax0 <= (w.x0 + w.x1) / 2 <= ax1
                and atop <= (w.top + w.bottom) / 2 <= abot
            ]
            if not pw:
                continue
            n_y = len({round(w.top, 0) for w in pw})
            rows.append(
                (url, page, "stream",
                 min(w.x0 for w in pw), min(w.top for w in pw),
                 max(w.x1 for w in pw), max(w.bottom for w in pw),
                 n_y, len(cfg["columns"]) + 1)
            )


# ---------------------------------------------------------------------------
# Automatic whitespace-gap column detection (north star: "whitespace/
# ruling-line clustering for tabular region detection ... word-to-column
# alignment logic as sorted interval merging"). The configured path above
# mirrors the reference's explicit `columns` separators
# (conversor_itau.py:99-108); this operator infers them — camelot
# stream-mode's automatic behavior — by merging the word x-intervals of a
# page into maximal bands and reading the inter-band gaps as separators.
#
# Pure Catalyst gaps-and-islands (no UDF): sort intervals by x0 within a
# page, track the running max of x1 ("reach"); a word whose x0 clears
# reach + tol starts a new band; the cumulative count of starts is the
# band ordinal, which IS the word's column index. Both the window and the
# downstream groupBys cluster on url-prefixed keys, so everything runs on
# the extraction pipeline's existing url-salt partitioning with no added
# exchange.
# ---------------------------------------------------------------------------


def assign_columns(
    words,
    *,
    tol: float = 2.0,
    part_cols: tuple[str, ...] = ("url", "page_no"),
):
    """words(url, page_no, x0, x1, ...) → same rows + ``col_no`` (0-based
    column ordinal by sorted-interval merging: overlapping-or-near word
    boxes share a band)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy(*part_cols).orderBy("x0", "x1")
    reach = F.max("x1").over(w.rowsBetween(Window.unboundedPreceding, -1))
    start = (reach.isNull() | (F.col("x0") > reach + F.lit(tol))).cast("int")
    out = words.withColumn("__band_start", start)
    return out.withColumn(
        "col_no",
        (F.sum("__band_start").over(w) - 1).cast("int"),
    ).drop("__band_start")


def column_bands(
    words,
    *,
    tol: float = 2.0,
    part_cols: tuple[str, ...] = ("url", "page_no"),
):
    """words → one row per detected column band:
    (part_cols..., col_no, band_x0, band_x1, n_words). The separators a
    configured `stream_rows` call would need are the midpoints of adjacent
    band gaps — this is the auto-detect complement of that operator."""
    from pyspark.sql import functions as F

    return (
        assign_columns(words, tol=tol, part_cols=part_cols)
        .groupBy(*part_cols, "col_no")
        .agg(
            F.min("x0").alias("band_x0"),
            F.max("x1").alias("band_x1"),
            F.count("*").alias("n_words"),
        )
    )


def auto_stream_rows(
    words,
    *,
    tol: float = 2.0,
    row_decimals: int = 0,
):
    """words(url, page_no, text, x0, x1, top) → stream-mode table rows
    (url, page_no, row_no, cells) with INFERRED columns: y-cluster rows on
    rounded top (the same clustering `stream_rows_doc` applies), bin each
    word by its merged-interval band, join a cell's words x-sorted.

    Cells are dense over the page's detected bands: a row missing words in
    some column carries '' there, mirroring camelot's rectangular output."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    cols = assign_columns(words, tol=tol).withColumn(
        "y_key", F.round(F.col("top"), row_decimals)
    )
    # per-page band count AND per-row ordinal off the same url partitioning
    wpage = Window.partitionBy("url", "page_no")
    cols = cols.withColumn("n_cols", F.max("col_no").over(wpage) + 1)
    cell = (
        cols.groupBy("url", "page_no", "n_cols", "y_key", "col_no")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("x0", "text"))),
                    lambda s: s["text"],
                ),
                " ",
            ).alias("cell")
        )
    )
    wrow = Window.partitionBy("url", "page_no").orderBy("y_key")
    rows = (
        cell.groupBy("url", "page_no", "n_cols", "y_key")
        .agg(
            F.array_sort(F.collect_list(F.struct("col_no", "cell"))).alias("found")
        )
        .withColumn("row_no", (F.dense_rank().over(wrow) - 1).cast("int"))
    )
    # densify: one entry per band ordinal, '' where the row has no words
    dense = F.transform(
        F.sequence(F.lit(0), F.col("n_cols") - 1),
        lambda i: F.coalesce(
            F.element_at(
                F.map_from_arrays(
                    F.transform(F.col("found"), lambda s: s["col_no"]),
                    F.transform(F.col("found"), lambda s: s["cell"]),
                ),
                i,
            ),
            F.lit(""),
        ),
    )
    return rows.select(
        "url", "page_no", "row_no", dense.alias("cells")
    )
