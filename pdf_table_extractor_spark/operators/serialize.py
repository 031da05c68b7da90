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
import re as _re
from typing import Callable


@dataclass(frozen=True)
class WorkbookSink:
    """Typed-cell workbook model (reference conversor_bradesco.py:167-228:
    xlwt `Workbook`/`write` with per-token number typing + fixed column
    widths; Conversor.py:181-190 openpyxl append). The binary .xls/.xlsx
    container is presentation (COVERAGE.md §2.1); the MODEL — sheet name,
    column widths, and each cell's (type, value) under the reference's
    typing rule — is data, rendered to deterministic bytes and
    byte-contracted like every other sink."""

    sheet: str
    col_widths: tuple[int, ...]
    typed_cols: tuple[str, ...]  # output columns typed by the xlwt rule


_XLWT_NUM = _re.compile(r"^-?[\d.,]+$")


def xlwt_cell(value) -> tuple[str, object]:
    """The reference's cell-typing rule (conversor_bradesco.py:199-208): a
    token matching ``^-?[\\d.,]+$`` has thousands dots stripped and the
    comma decimal swapped to '.'; the cleaned string becomes a float cell
    if it contains '.', else an int cell; unparseable or non-matching
    tokens stay text. Returns (tag, value) with tag in {'s','i','f'}."""
    if value is None:
        return ("s", "")
    s = str(value)
    if _XLWT_NUM.match(s):
        clean = s.replace(".", "").replace(",", ".")
        try:
            return ("f", float(clean)) if "." in clean else ("i", int(clean))
        except ValueError:
            return ("s", s)
    return ("s", s)


def xlwt_typed_cols(tok):
    """Catalyst twin of `xlwt_cell` for the data plane: given a raw token
    column, returns (tag, i_val, f_val) columns under the reference typing
    rule — JVM-side codegen, no python. `try_cast` mirrors python's
    ValueError fallback ('' / '.' / '1.2.3' → text). Known divergence:
    python ints are unbounded while BIGINT overflows to text at 2^63 —
    beyond any statement amount."""
    from pyspark.sql import functions as F

    clean = F.replace(F.replace(tok, F.lit("."), F.lit("")), F.lit(","), F.lit("."))
    is_num = tok.rlike(r"^-?[0-9.,]+$")
    has_dot = clean.contains(".")
    tag = (
        F.when(is_num & has_dot & clean.try_cast("double").isNotNull(), F.lit("f"))
        .when(is_num & ~has_dot & clean.try_cast("bigint").isNotNull(), F.lit("i"))
        .otherwise(F.lit("s"))
    )
    i_val = F.when(tag == "i", clean.try_cast("bigint"))
    f_val = F.when(tag == "f", F.round(clean.try_cast("double"), 6))
    return tag, i_val, f_val


_INT_SHAPE = _re.compile(r"^-?\d+$")
_FLOAT_SHAPE = _re.compile(r"^-?\d+\.\d+$")


def cell_tag(rendered: str) -> str:
    """Type tag for an already-typed, rendered cell value. The engine's
    record columns store each cell's FINAL string (``str(int(clean))`` /
    ``str(float(clean))`` / the raw text token — statemachines.py:212-221
    mirrors conversor_bradesco.py:199-208), so the xlwt cell type is
    recoverable from the shape: ``str(float)`` always carries a '.',
    ``str(int)`` never does, and text tokens never render as pure
    numerics (a regex-miss or ValueError token keeps its original form)."""
    if _INT_SHAPE.match(rendered):
        return "i"
    if _FLOAT_SHAPE.match(rendered):
        return "f"
    return "s"


def render_workbook_model(pdf: pd.DataFrame, sink: "Sink") -> bytes:
    """Deterministic byte encoding of the typed workbook: header lines for
    sheet/widths/columns, then one line per row with unit-separated
    ``tag:value`` cells. Values are the engine's rendered cell strings —
    both the engine UDF and the test oracle render python values the same
    way, so bytes are stable."""
    wb = sink.workbook
    lines = [
        f"sheet:{wb.sheet}",
        "widths:" + ",".join(str(w) for w in wb.col_widths),
        "cols:" + "\x1f".join(sink.columns),
    ]
    typed = set(wb.typed_cols)
    for _, row in pdf.iterrows():
        cells = []
        for name, src in zip(sink.columns, sink.source_cols):
            v = "" if row[src] is None else str(row[src])
            tag = cell_tag(v) if name in typed else "s"
            cells.append(f"{tag}:{v}")
        lines.append("row:" + "\x1f".join(cells))
    return ("\n".join(lines) + "\n").encode("utf-8")


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
    # Extra record columns a custom `prepare` reads beyond source_cols
    # (e.g. caixa's parsed-date + doc-flag columns).
    extra_cols: tuple[str, ...] = ()
    # Raw-text mode (webpage main-content profile): the document bytes are
    # source_cols[0]'s values rejoined with a blank line — boilerpipe's
    # plain-text render — instead of a CSV table. Zero records → b"".
    raw: bool = False
    # Typed workbook model for profiles whose reference sink is xlwt/openpyxl
    # (serialize_workbook renders it; None = CSV-only profile).
    workbook: WorkbookSink | None = None


def render_csv(pdf: pd.DataFrame, sink: Sink) -> bytes:
    if sink.raw:
        body = "\n\n".join(pdf[sink.source_cols[0]]).encode("utf-8")
        return (b"\xef\xbb\xbf" + body) if sink.utf8_sig else body
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


def sheet_name_for(url_or_path: str) -> str:
    """The reference workbook sinks' sheet naming rule (Conversor.py:186:
    `os.path.splitext(os.path.basename(p))[0][:31]` — Excel rejects sheet
    titles over 31 chars). Our XLS/XLSX convention renders logical rows as
    CSV bytes (COVERAGE.md §2.1), but the sheet identity each document
    would get in a workbook export is part of the contract — this is it."""
    base = url_or_path.rstrip("/").rsplit("/", 1)[-1]
    stem = base.rsplit(".", 1)[0] if "." in base else base
    return stem[:31]


def sheet_name_col(url):
    """Catalyst twin of `sheet_name_for` for the data plane."""
    from pyspark.sql import functions as F

    base = F.element_at(F.split(F.regexp_replace(url, "/+$", ""), "/"), -1)
    stem = F.regexp_replace(base, r"\.[^.]*$", "")
    return F.substring(stem, 1, 31)


def empty_doc_bytes(sink: Sink) -> bytes:
    """Static bytes for a zero-record document under this sink: header-only
    CSV, rendered once at plan-build time (deterministic — same pandas
    to_csv kwargs as the per-doc path). Used by the extract() sentinel for
    emit_empty profiles (conversor_inter.py always writes the file)."""
    fields = list(dict.fromkeys([*sink.order_by, *sink.source_cols, *sink.extra_cols]))
    return render_csv(pd.DataFrame(columns=fields), sink)


def serialize(
    records: DataFrame,
    profile: str,
    sink: Sink,
    all_urls: DataFrame | None = None,
    emit_empty: bool = False,
) -> DataFrame:
    """records(url, <order_by>, <source_cols>) → (url, profile, n_rows, csv).

    One groupBy(url) packs each document's records into a sorted struct
    array (order_by fields lead the struct so sort_array gives row order),
    then a scalar Arrow UDF renders whole BATCHES of documents — one Arrow
    round-trip per ~2048 docs instead of one per url (the applyInPandas
    version measured ~10× slower on 100k tiny groups).

    `all_urls` (join-free zero-record accounting): each url contributes one
    sentinel row (__real=0) unioned with the records, so documents that
    extracted nothing still yield an output row — n_rows=0 with a NULL csv,
    or a header-only csv when `emit_empty` (conversor_inter.py always
    writes the file). A join-based version double-executed every branch
    (the branch subplan appeared in both the union and the anti-join).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    fields = list(dict.fromkeys([*sink.order_by, *sink.source_cols, *sink.extra_cols]))
    tagged = records.select("url", *fields, F.lit(1).alias("__real"))
    if all_urls is not None:
        schema = {f.name: f.dataType for f in records.schema.fields}
        sentinel = all_urls.select(
            "url",
            *[F.lit(None).cast(schema[f]).alias(f) for f in fields],
            F.lit(0).alias("__real"),
        )
        # Round-robin barrier: union partitioning claims are unreliable in
        # Spark 4 (observed zip-mismatch crashes); RR is never elided and
        # forces the groupBy below to re-exchange cleanly on url.
        tagged = tagged.unionByName(sentinel).repartition(
            int(records.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        )
    packed = tagged.groupBy("url").agg(
        F.array_sort(F.collect_list(F.struct(*fields, "__real"))).alias("recs")
    )

    fast_path = sink.prepare is None and sink.postprocess is None and sink.header

    @pandas_udf("n_rows int, csv binary")
    def render_batch(recs_col: pd.Series) -> pd.DataFrame:
        if sink.raw:
            src = sink.source_cols[0]
            bom = b"\xef\xbb\xbf" if sink.utf8_sig else b""
            n_rows, csvs = [], []
            for recs in recs_col:
                texts = [r[src] for r in recs if r["__real"] == 1]
                n_rows.append(len(texts))
                if not texts and not emit_empty:
                    csvs.append(None)
                else:
                    csvs.append(bom + "\n\n".join(texts).encode("utf-8"))
            return pd.DataFrame({"n_rows": n_rows, "csv": csvs})
        if fast_path:
            out = _render_batchwide(recs_col, fields, sink, emit_empty)
            if out is not None:
                return out
        n_rows, csvs = [], []
        for recs in recs_col:
            rows = [dict(r) for r in recs if r["__real"] == 1]
            pdf = pd.DataFrame(rows, columns=fields + ["__real"])[fields]
            n_rows.append(len(pdf))
            if len(pdf) == 0 and not emit_empty:
                csvs.append(None)
            else:
                csvs.append(render_csv(pdf, sink))
        return pd.DataFrame({"n_rows": n_rows, "csv": csvs})

    out = packed.select(
        "url", F.lit(profile).alias("profile"), render_batch("recs").alias("r")
    )
    return out.select(
        "url", "profile", F.col("r.n_rows").alias("n_rows"), F.col("r.csv").alias("csv")
    )


def _render_batchwide(recs_col, fields, sink: Sink, emit_empty: bool):
    """Fast path for standard sinks: render the whole Arrow batch's records
    with ONE to_csv call (same columns/dtypes → byte-identical rows), then
    split the text back per document by row count. Returns None (caller
    falls back to per-doc rendering) if any rendered row spans multiple
    physical lines (embedded newline inside quotes — never in this corpus,
    guarded anyway)."""
    doc_rows: list[list] = []
    counts: list[int] = []
    for recs in recs_col:
        rows = [[r[f] for f in fields] for r in recs if r["__real"] == 1]
        doc_rows.extend(rows)
        counts.append(len(rows))
    big = pd.DataFrame(doc_rows, columns=fields)
    out = pd.DataFrame()
    for name, src in zip(sink.columns, sink.source_cols):
        col = big[src] if len(big) else pd.Series([], dtype=object)
        if name in sink.float_cols or src in sink.float_cols:
            col = col.astype("float64")
        else:
            col = col.astype(object).where(col.notna(), None)
        out[name] = col
    buf = io.StringIO()
    out.to_csv(buf, index=False, sep=sink.sep, decimal=sink.decimal,
               quoting=sink.quoting, header=False)
    body_lines = buf.getvalue().split("\n")
    if body_lines and body_lines[-1] == "":
        body_lines.pop()
    if len(body_lines) != len(doc_rows):
        return None  # embedded newlines — use the exact per-doc path
    hdr_buf = io.StringIO()
    pd.DataFrame(columns=sink.columns).to_csv(
        hdr_buf, index=False, sep=sink.sep, decimal=sink.decimal, quoting=sink.quoting
    )
    header = hdr_buf.getvalue()  # includes trailing newline
    bom = b"\xef\xbb\xbf" if sink.utf8_sig else b""
    n_rows, csvs = [], []
    pos = 0
    for c in counts:
        n_rows.append(c)
        if c == 0 and not emit_empty:
            csvs.append(None)
        else:
            body = "\n".join(body_lines[pos:pos + c])
            text = header + (body + "\n" if c else "")
            csvs.append(bom + text.encode("utf-8"))
        pos += c
    return pd.DataFrame({"n_rows": n_rows, "csv": csvs})


def serialize_workbook(records: DataFrame, profile: str, sink: Sink) -> DataFrame:
    """records(url, <order_by>, <source_cols>) → (url, profile, n_rows,
    xls_model binary): the typed-cell workbook model for profiles whose
    reference sink is a spreadsheet writer (``sink.workbook`` required).

    Same packed-struct + batched Arrow UDF shape as `serialize` — one
    groupBy(url) then whole-batch python rendering; zero-record documents
    get the header-only model (the reference workbook writer always emits
    the sheet with its header row)."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    if sink.workbook is None:
        raise ValueError(f"profile {profile!r} has no WorkbookSink configured")
    fields = list(dict.fromkeys([*sink.order_by, *sink.source_cols]))
    packed = records.groupBy("url").agg(
        F.array_sort(F.collect_list(F.struct(*fields))).alias("recs")
    )

    @pandas_udf("n_rows int, xls_model binary")
    def render_batch(recs_col: pd.Series) -> pd.DataFrame:
        n_rows, models = [], []
        for recs in recs_col:
            pdf = pd.DataFrame([dict(r) for r in recs], columns=fields)
            n_rows.append(len(pdf))
            models.append(render_workbook_model(pdf, sink))
        return pd.DataFrame({"n_rows": n_rows, "xls_model": models})

    out = packed.select(
        "url", F.lit(profile).alias("profile"), render_batch("recs").alias("r")
    )
    return out.select(
        "url", "profile",
        F.col("r.n_rows").alias("n_rows"), F.col("r.xls_model").alias("xls_model"),
    )


def serialize_with_empties(
    records: DataFrame, all_urls: DataFrame, profile: str, sink: Sink
) -> DataFrame:
    """Docs with no records render a header-only CSV (conversor_inter.py
    always writes the file)."""
    return serialize(records, profile, sink, all_urls=all_urls, emit_empty=True)
