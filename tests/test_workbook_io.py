"""Real .xlsx container (round-3 verdict ask #8): the byte-contracted
workbook model renders to an actual OOXML package — stdlib zip + XML, no
spreadsheet dependency — and the container is verified by ROUND-TRIP: an
independent reader reconstructs the exact model bytes from the .xlsx. An
openpyxl cross-check is importorskip-gated for environments that have it."""

from __future__ import annotations

import io
import zipfile

import pytest

from pdf_table_extractor_spark import synth
from pdf_table_extractor_spark.operators.serialize import serialize_workbook
from pdf_table_extractor_spark.operators.workbook_io import (
    ooxml_escape,
    ooxml_unescape,
    parse_model,
    xlsx_bytes,
    xlsx_col,
    xlsx_to_model,
)
from pdf_table_extractor_spark.plans.profiles import PROFILES

SAMPLE = (
    b"sheet:extrato_01\n"
    b"widths:4000,2000,6000\n"
    b"cols:Data\x1fDoc.\x1fValor\n"
    b"row:s:02/01/2024\x1fi:123\x1ff:-45.5\n"
    b"row:s:\x1fs:PIX  \x1ff:1234.56\n"
)


def test_roundtrip_sample():
    assert xlsx_to_model(xlsx_bytes(SAMPLE)) == SAMPLE


def test_deterministic_bytes():
    assert xlsx_bytes(SAMPLE) == xlsx_bytes(SAMPLE)


def test_container_is_a_valid_zip_package():
    z = zipfile.ZipFile(io.BytesIO(xlsx_bytes(SAMPLE)))
    assert z.testzip() is None
    names = set(z.namelist())
    assert {"[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
            "xl/_rels/workbook.xml.rels", "xl/worksheets/sheet1.xml"} <= names
    # determinism contract: pinned timestamps, stored entries
    for zi in z.infolist():
        assert zi.date_time == (1980, 1, 1, 0, 0, 0)
        assert zi.compress_type == zipfile.ZIP_STORED


def test_ooxml_control_char_escaping():
    """XML 1.0 cannot carry control chars: the OOXML _xHHHH_ convention
    must survive the round trip, including literal '_x001F_' text."""
    for s in ["a\x1fb", "tab\tok", "_x001F_", "_x005F_x0001_", "plain"]:
        assert ooxml_unescape(ooxml_escape(s)) == s
    model = (
        b"sheet:s\nwidths:100\ncols:C\n"
        b"row:s:ctrl\x01here\n"
        b"row:s:_x0041_ literal\n"
    )
    assert xlsx_to_model(xlsx_bytes(model)) == model


def test_header_only_model():
    model = b"sheet:empty_doc\nwidths:3000,3000\ncols:Data\x1fValor\n"
    out = xlsx_bytes(model)
    assert xlsx_to_model(out) == model
    m = parse_model(model)
    assert m["rows"] == [] and m["cols"] == ["Data", "Valor"]


def test_engine_models_roundtrip_through_container(spark):
    """Every bradesco document's engine-rendered model survives the
    model → .xlsx → model round trip byte-identically (the container adds
    zero information loss on real extraction output)."""
    corpus = synth.synth_pandas(60, profiles=["bradesco"], noise_frac=0.0)
    pages = spark.createDataFrame(corpus)
    prof = PROFILES["bradesco"]
    out = serialize_workbook(prof.build(pages), "bradesco", prof.sink)
    with_xlsx = out.withColumn("xlsx", xlsx_col(out.xls_model))
    rows = with_xlsx.collect()
    assert len(rows) == 60
    n_nonempty = 0
    for r in rows:
        model, xlsx = bytes(r.xls_model), bytes(r.xlsx)
        assert xlsx_to_model(xlsx) == model, f"{r.url}: container round trip"
        if r.n_rows > 0:
            n_nonempty += 1
    assert n_nonempty >= 10


def test_openpyxl_crosscheck():
    """Where openpyxl exists, the container must parse as a real workbook
    with the model's sheet name, typed values, and column widths (skipped
    in this sandbox — the dependency-free round trip above is the gate)."""
    openpyxl = pytest.importorskip("openpyxl")
    wb = openpyxl.load_workbook(io.BytesIO(xlsx_bytes(SAMPLE)))
    ws = wb["extrato_01"]
    assert [c.value for c in ws[1]] == ["Data", "Doc.", "Valor"]
    assert [c.value for c in ws[2]] == ["02/01/2024", 123, -45.5]
    assert ws.column_dimensions["A"].width == pytest.approx(4000 / 256)
