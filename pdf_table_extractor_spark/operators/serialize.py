"""Deterministic byte serializer (SURVEY §2.10 UDF #4).

Renders each document's extracted record rows to the exact CSV bytes the
reference's pandas `to_csv` sink produces (sep/encoding/decimal/quoting per
profile — SURVEY §2.1 sink row). Runs as `applyInPandas` over url groups:
one Arrow batch per document group, pandas builds the byte string, Spark
never sees a per-row Python loop.

Byte-identity strategy: both this serializer and the golden oracle
(tests/oracle.py) express the sink as pandas `to_csv` with identical
kwargs, so the only way bytes can diverge is if the *records* diverge —
exactly what the golden test should detect.
"""

from __future__ import annotations

import io
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame

OUT_SCHEMA = "url string, profile string, n_rows int, csv binary"


import csv as _csv
from typing import Callable


@dataclass(frozen=True)
class Sink:
    """Per-profile CSV sink config (mirrors each converter's to_csv call)."""

    columns: list[str]  # output header names, in order
    source_cols: list[str]  # matching engine column names
    order_by: list[str]  # deterministic row order within a doc
    sep: str = ";"
    decimal: str = ","
    float_cols: list[str] = field(default_factory=list)  # render as float64
    utf8_sig: bool = True
    emit_empty: bool = False  # reference writes header-only file for 0 rows
    quoting: int = _csv.QUOTE_MINIMAL
    header: bool = True  # stone writes headerless CSV (conversor_stone.py:23)
    # Optional custom (sorted records pdf) -> render-ready output DataFrame,
    # for profiles with data-dependent column typing (caixa date fallback).
    prepare: Callable[[pd.DataFrame], pd.DataFrame] | None = None
    # Optional whole-file text rewrite before encoding (itau finalize_csv
    # ';;'→';', conversor_itau.py:169-178).
    postprocess: Callable[[str], str] | None = None


def render_csv(pdf: pd.DataFrame, sink: Sink) -> bytes:
    if sink.prepare is not None:
        out = sink.prepare(pdf)
    else:
        out = pd.DataFrame()
        for name, src in zip(sink.columns, sink.source_cols):
            col = pdf[src]
            if name in sink.float_cols or src in sink.float_cols:
                col = col.astype("float64")
            else:
                col = col.astype(object).where(col.notna(), None)
            out[name] = col
    buf = io.StringIO()
    out.to_csv(
        buf, index=False, sep=sink.sep, decimal=sink.decimal, quoting=sink.quoting,
        header=sink.header,
    )
    text = buf.getvalue()
    if sink.postprocess is not None:
        text = sink.postprocess(text)
    body = text.encode("utf-8")
    return (b"\xef\xbb\xbf" + body) if sink.utf8_sig else body


def serialize(records: DataFrame, profile: str, sink: Sink) -> DataFrame:
    """records(url, <order_by>, <source_cols>) → (url, profile, n_rows, csv).

    Documents with zero records don't appear (reference writes no file);
    pass the profile's full url set through `serialize_empty` when the
    reference emits header-only files instead.
    """

    def render(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sink.order_by, kind="mergesort")
        return pd.DataFrame(
            {
                "url": [key[0]],
                "profile": [profile],
                "n_rows": [len(pdf)],
                "csv": [render_csv(pdf, sink)],
            }
        )

    return records.groupBy("url").applyInPandas(render, schema=OUT_SCHEMA)


def serialize_with_empties(
    records: DataFrame, all_urls: DataFrame, profile: str, sink: Sink
) -> DataFrame:
    """Like `serialize`, but docs with no records still render a header-only
    CSV (conversor_inter.py always writes the file)."""
    extracted = serialize(records, profile, sink)
    empty_bytes = render_csv(pd.DataFrame(columns=sink.source_cols), sink)
    missing = (
        all_urls.join(extracted.select("url"), "url", "left_anti")
        .select("url")
        .withColumn("profile", _lit(profile))
        .withColumn("n_rows", _lit(0))
        .withColumn("csv", _lit(empty_bytes))
    )
    return extracted.unionByName(missing)


def _lit(v):
    from pyspark.sql import functions as F

    return F.lit(v)
