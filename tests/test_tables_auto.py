"""Automatic whitespace-gap column detection (sorted interval merging).

The configured stream-mode path (`stream_rows_doc`) takes camelot-style
explicit column separators (conversor_itau.py:99-108); `assign_columns` /
`auto_stream_rows` must INFER the same table when the layout's inter-column
gaps are real. Hand-built fixtures keep expectations exact; the
cross-operator test feeds both paths the same words.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_table_extractor_spark.operators.tables import (
    assign_columns,
    auto_stream_rows,
    column_bands,
    stream_rows_doc,
)

WORDS_SCHEMA = "url string, page_no int, text string, x0 double, x1 double, top double"

# Three-column layout, two rows; the middle column's words overlap each
# other (merged into one band) while the gaps between columns exceed tol.
LAYOUT = [
    # row y=10
    ("d1", 1, "01/02", 20.0, 50.0, 10.0),
    ("d1", 1, "Pix", 100.0, 120.0, 10.0),
    ("d1", 1, "Enviado", 118.0, 160.0, 10.0),  # overlaps "Pix" band
    ("d1", 1, "10,00", 300.0, 330.0, 10.0),
    # row y=22
    ("d1", 1, "03/02", 22.0, 48.0, 22.0),
    ("d1", 1, "Tarifa", 104.0, 140.0, 22.0),
    ("d1", 1, "5,50", 305.0, 328.0, 22.0),
]


def test_band_merging_and_ordinals(spark):
    words = spark.createDataFrame(LAYOUT, WORDS_SCHEMA)
    bands = {
        r["col_no"]: r
        for r in column_bands(words, tol=4.0).where("url = 'd1'").collect()
    }
    assert len(bands) == 3
    assert (bands[0]["band_x0"], bands[0]["band_x1"]) == (20.0, 50.0)
    assert (bands[1]["band_x0"], bands[1]["band_x1"]) == (100.0, 160.0)
    assert (bands[2]["band_x0"], bands[2]["band_x1"]) == (300.0, 330.0)
    assert bands[1]["n_words"] == 3


def test_tol_splits_near_bands(spark):
    # same two words either merge or split depending on tol
    rows = [("d", 1, "a", 0.0, 10.0, 0.0), ("d", 1, "b", 13.0, 20.0, 0.0)]
    words = spark.createDataFrame(rows, WORDS_SCHEMA)
    assert column_bands(words, tol=4.0).count() == 1
    assert column_bands(words, tol=2.0).count() == 2


def test_auto_stream_rows_dense_cells(spark):
    words = spark.createDataFrame(
        LAYOUT + [("d1", 1, "saldo", 302.0, 340.0, 35.0)], WORDS_SCHEMA
    )
    out = {
        r["row_no"]: r["cells"]
        for r in auto_stream_rows(words, tol=4.0).collect()
    }
    assert out[0] == ["01/02", "Pix Enviado", "10,00"]
    assert out[1] == ["03/02", "Tarifa", "5,50"]
    # y=35 row has only the third column; others densified to ''
    assert out[2] == ["", "", "saldo"]


def test_auto_matches_configured_stream(spark):
    """Feeding the configured extractor the separators the auto path
    inferred must reproduce the auto path's cells exactly."""
    from pdf_table_extractor_spark.markup import Word, render

    words = [Word(1, x0, x1, top, top + 9.0, text) for (_, _, text, x0, x1, top) in LAYOUT]
    html = render([(1, 595, 842)], words, [])

    wdf = spark.createDataFrame(LAYOUT, WORDS_SCHEMA)
    bands = sorted(
        (r["band_x0"], r["band_x1"])
        for r in column_bands(wdf, tol=4.0).collect()
    )
    seps = [(a1 + b0) / 2 for (_, a1), (b0, _) in zip(bands, bands[1:])]
    cfg = {
        "page_1": {"area": (0, 0, 595, 842), "columns": seps},
        "page_2_end": {"area": (0, 0, 595, 842), "columns": seps},
    }
    configured = [cells for (_, _, cells) in stream_rows_doc(html, cfg)]
    auto = [
        r["cells"]
        for r in auto_stream_rows(wdf, tol=4.0).orderBy("row_no").collect()
    ]
    assert configured == auto


def test_assign_columns_no_extra_exchange(spark):
    """The window + groupBys must all ride one url-hash exchange (the
    extraction pipeline's salt): assert a single shuffle in the plan."""
    words = spark.createDataFrame(LAYOUT, WORDS_SCHEMA).repartition(4, F.col("url"))
    plan = (
        auto_stream_rows(words, tol=4.0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    n_exchanges = plan.count("Exchange") - 2 * plan.count("ReusedExchange")
    assert n_exchanges <= 1, plan
