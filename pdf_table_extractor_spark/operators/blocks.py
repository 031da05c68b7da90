"""parse_blocks — the D3 producer (SURVEY §2.10 UDF #1).

Turns the binary ``html`` markup into the lightweight DOM-block array
``array<struct<page_no,kind,text,x0,x1,top,bottom>>``. This is the engine's
replacement for pdfplumber's ``extract_words`` / camelot's low-level word
boxes (conversor_banestes.py:40, conversor_itau.py:99-108) — an Arrow-
vectorized scalar pandas UDF, one row per document, iterator form so any
parser init is amortized per batch.

The binary column should be dropped immediately after this projection so
column pruning keeps `html` out of every downstream exchange.
"""

from __future__ import annotations

import functools
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

from pdf_table_extractor_spark.markup import parse as parse_markup

BLOCK_SCHEMA = (
    "array<struct<page_no:int,kind:string,text:string,"
    "x0:double,x1:double,top:double,bottom:double>>"
)


@functools.cache
def _parse_blocks_udf():
    # Deferred: pandas_udf with a DDL return type needs an active session,
    # so the UDF is created on first use, not at import.
    @pandas_udf(BLOCK_SCHEMA)
    def _udf(html_iter: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for html_col in html_iter:
            out = []
            for raw in html_col:
                if raw is None:
                    out.append(None)
                    continue
                words, rulings = parse_markup(bytes(raw))
                blocks = [
                    (w.page_no, "word", w.text, w.x0, w.x1, w.top, w.bottom)
                    for w in words
                ] + [
                    (r.page_no, "ruling", None, r.x0, r.x1, r.top, r.bottom)
                    for r in rulings
                ]
                out.append(blocks)
            yield pd.Series(out, dtype=object)

    return _udf


def parse_blocks(col: Column | str) -> Column:
    return _parse_blocks_udf()(col)
