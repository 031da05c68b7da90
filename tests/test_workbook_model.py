"""Typed-cell workbook fidelity (round-3 ask, COVERAGE.md §2.1): the
reference's XLS sink is xlwt typed cells + column widths
(conversor_bradesco.py:167-228). The binary container is presentation; the
MODEL — sheet, widths, per-cell (type, value) — is data, rendered by
`serialize_workbook` and byte-contracted here against an independent
pure-python oracle."""

from __future__ import annotations

from pdf_table_extractor_spark import synth
from pdf_table_extractor_spark.operators.serialize import (
    cell_tag,
    serialize_workbook,
    xlwt_cell,
)
from pdf_table_extractor_spark.plans.profiles import PROFILES
from tests import oracle


def test_xlwt_cell_rule():
    """The reference typing rule (conversor_bradesco.py:199-208) on raw
    statement tokens."""
    assert xlwt_cell("1.234,56") == ("f", 1234.56)
    assert xlwt_cell("-45,50") == ("f", -45.5)
    assert xlwt_cell("123") == ("i", 123)
    assert xlwt_cell("007") == ("i", 7)
    assert xlwt_cell("PIX") == ("s", "PIX")
    assert xlwt_cell("12-3") == ("s", "12-3")  # '-' only leads
    assert xlwt_cell("-.") == ("s", "-.")  # regex hit, float() fails
    assert xlwt_cell(None) == ("s", "")


def test_cell_tag_shapes():
    """Tag recovery from the engine's pre-rendered cell strings."""
    assert cell_tag("123") == "i"
    assert cell_tag("-45.5") == "f"
    assert cell_tag("") == "s"
    assert cell_tag("1,2,3") == "s"
    assert cell_tag("02/01/2024") == "s"


def test_workbook_model_byte_identity(spark):
    corpus = synth.synth_pandas(120, profiles=["bradesco"], noise_frac=0.0)
    pages = spark.createDataFrame(corpus)
    prof = PROFILES["bradesco"]
    out = serialize_workbook(prof.build(pages), "bradesco", prof.sink)
    got = {r.url: r for r in out.collect()}
    n_checked = 0
    for _, doc in corpus.iterrows():
        golden = oracle.oracle_bradesco_workbook(doc["text"])
        r = got[doc["url"]]
        assert bytes(r.xls_model) == golden, (
            f"{doc['url']}: workbook model differs\n"
            f"--- engine ---\n{bytes(r.xls_model)[:400]!r}\n"
            f"--- golden ---\n{golden[:400]!r}"
        )
        if r.n_rows > 0:
            n_checked += 1
    assert n_checked >= 10


def test_workbook_model_has_typed_cells(spark):
    """At least one int and one float cell actually appear — the typing is
    exercised, not vacuously green."""
    corpus = synth.synth_pandas(60, profiles=["bradesco"], noise_frac=0.0)
    pages = spark.createDataFrame(corpus)
    prof = PROFILES["bradesco"]
    out = serialize_workbook(prof.build(pages), "bradesco", prof.sink).collect()
    blob = b"".join(bytes(r.xls_model) for r in out).decode("utf-8")
    assert "\x1ff:" in blob and "\x1fi:" in blob
    assert blob.startswith("sheet:Transacoes\nwidths:3000,12000,4000,4000,4000\n")
