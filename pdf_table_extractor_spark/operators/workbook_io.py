"""Real .xlsx container for the byte-contracted workbook model.

Round-3 verdict ask #8: render the typed-cell workbook MODEL (sheet name,
column widths, per-cell (type, value) — `serialize.render_workbook_model`)
into an actual spreadsheet container. The sandbox has neither xlwt nor
openpyxl, so instead of gating the feature on an absent dependency this
module writes the OOXML .xlsx package directly with stdlib `zipfile` +
hand-built XML — SpreadsheetML is a documented public format (ECMA-376)
and the subset a statement export needs (one sheet, column widths, inline
strings, numeric cells) is small. Reference parity: the container carries
exactly what conversor_bradesco.py:167-228 (xlwt Workbook/write/col.width)
and Conversor.py:181-190 (openpyxl append) put in theirs.

Determinism: ZIP_STORED entries with a pinned DOS timestamp — identical
model bytes produce identical .xlsx bytes on every run and host, so the
container inherits the model's byte-contract. A dependency-free reader
(`xlsx_to_model`) reverses the rendering for round-trip tests; an
openpyxl-based test in tests/test_workbook_io.py is importorskip-gated
for environments that have it.
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree as ET

import pandas as pd

# Pinned DOS timestamp (ZIP epoch) — byte-determinism across runs/hosts.
_ZIP_DT = (1980, 1, 1, 0, 0, 0)

_NS_MAIN = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_NS_CT = "http://schemas.openxmlformats.org/package/2006/content-types"
_NS_REL = "http://schemas.openxmlformats.org/package/2006/relationships"
_NS_RDOC = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    f'<Types xmlns="{_NS_CT}">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-'
    'package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
    'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/'
    'vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    "</Types>"
)

_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    f'<Relationships xmlns="{_NS_REL}">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)

_WORKBOOK_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    f'<Relationships xmlns="{_NS_REL}">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
    "</Relationships>"
)


def _xml_escape(s: str, attr: bool = False) -> str:
    s = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    if attr:
        s = s.replace('"', "&quot;")
    return s


# OOXML invalid-character escaping (ECMA-376 §22.4.2.4 / shared strings
# convention): XML 1.0 cannot carry most control characters, so they are
# written as _xHHHH_; a literal "_xHHHH_" in the data escapes its own
# underscore as _x005F_. Statement tokens never contain these, but the
# model's \x1f unit separator could leak into a pathological cell value.
_OOXML_ESC = re.compile(r"_(?=x[0-9A-Fa-f]{4}_)")
_OOXML_UNESC = re.compile(r"_x([0-9A-Fa-f]{4})_")
_XML_INVALID = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f]")


def ooxml_escape(s: str) -> str:
    s = _OOXML_ESC.sub("_x005F_", s)
    return _XML_INVALID.sub(lambda m: "_x%04X_" % ord(m.group()), s)


def ooxml_unescape(s: str) -> str:
    return _OOXML_UNESC.sub(lambda m: chr(int(m.group(1), 16)), s)


def _col_letter(i: int) -> str:
    """0-based column index → A1-style letters."""
    out = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        out = chr(ord("A") + r) + out
    return out


def parse_model(model: bytes) -> dict:
    """Decode `render_workbook_model` bytes → {sheet, widths, cols, rows};
    rows are lists of (tag, value) with tag in {'s','i','f'}."""
    lines = model.decode("utf-8").split("\n")
    if lines and lines[-1] == "":
        lines.pop()
    out = {"sheet": None, "widths": [], "cols": [], "rows": []}
    for line in lines:
        kind, _, body = line.partition(":")
        if kind == "sheet":
            out["sheet"] = body
        elif kind == "widths":
            out["widths"] = [int(w) for w in body.split(",") if w != ""]
        elif kind == "cols":
            out["cols"] = body.split("\x1f")
        elif kind == "row":
            cells = []
            for cell in body.split("\x1f"):
                tag, _, value = cell.partition(":")
                cells.append((tag, value))
            out["rows"].append(cells)
        else:  # pragma: no cover - model corruption
            raise ValueError(f"unknown model line kind {kind!r}")
    return out


def _cell_xml(ref: str, tag: str, value: str) -> str:
    if tag in ("i", "f"):
        return f'<c r="{ref}"><v>{value}</v></c>'
    if value == "":
        return f'<c r="{ref}" t="inlineStr"><is><t/></is></c>'
    text = _xml_escape(ooxml_escape(value))
    space = ' xml:space="preserve"' if value != value.strip() else ""
    return f'<c r="{ref}" t="inlineStr"><is><t{space}>{text}</t></is></c>'


def xlsx_bytes(model: bytes) -> bytes:
    """Byte-contracted workbook model → deterministic .xlsx bytes.

    Layout mirrors the reference writers: row 1 is the header (column
    names as text cells — xlwt sheets get their header written first,
    conversor_bradesco.py:196), data rows follow with the model's typed
    cells; xlwt 1/256-char column widths convert to OOXML char widths."""
    m = parse_model(model)
    parts = [f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
             f'<worksheet xmlns="{_NS_MAIN}">']
    if m["widths"]:
        cols = "".join(
            f'<col min="{i + 1}" max="{i + 1}" width="{w / 256:g}" customWidth="1"/>'
            for i, w in enumerate(m["widths"])
        )
        parts.append(f"<cols>{cols}</cols>")
    parts.append("<sheetData>")
    header = [("s", name) for name in m["cols"]]
    for r, cells in enumerate([header, *m["rows"]], start=1):
        row_xml = "".join(
            _cell_xml(f"{_col_letter(c)}{r}", tag, value)
            for c, (tag, value) in enumerate(cells)
        )
        parts.append(f'<row r="{r}">{row_xml}</row>')
    parts.append("</sheetData></worksheet>")
    sheet_xml = "".join(parts)

    name = _xml_escape(ooxml_escape(m["sheet"] or "Sheet1"), attr=True)
    workbook_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_NS_MAIN}" xmlns:r="{_NS_RDOC}">'
        f'<sheets><sheet name="{name}" sheetId="1" r:id="rId1"/></sheets>'
        "</workbook>"
    )

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
        for arcname, data in [
            ("[Content_Types].xml", _CONTENT_TYPES),
            ("_rels/.rels", _ROOT_RELS),
            ("xl/workbook.xml", workbook_xml),
            ("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS),
            ("xl/worksheets/sheet1.xml", sheet_xml),
        ]:
            zi = zipfile.ZipInfo(arcname, date_time=_ZIP_DT)
            zi.compress_type = zipfile.ZIP_STORED
            zi.external_attr = 0o600 << 16
            z.writestr(zi, data.encode("utf-8"))
    return buf.getvalue()


def xlsx_to_model(xlsx: bytes) -> bytes:
    """Dependency-free reverse rendering: .xlsx bytes → the workbook model
    bytes they were built from. Tag recovery is exact — text cells are
    inline strings, numeric cells carry their rendered value string whose
    shape ('.' or not) distinguishes 'f' from 'i' (serialize.cell_tag)."""
    z = zipfile.ZipFile(io.BytesIO(xlsx))
    wb = ET.fromstring(z.read("xl/workbook.xml"))
    sheet_el = wb.find(f"{{{_NS_MAIN}}}sheets/{{{_NS_MAIN}}}sheet")
    sheet = ooxml_unescape(sheet_el.get("name"))
    ws = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
    widths = [
        str(int(round(float(col.get("width")) * 256)))
        for col in ws.iter(f"{{{_NS_MAIN}}}col")
    ]
    rows = []
    for row in ws.iter(f"{{{_NS_MAIN}}}row"):
        cells = []
        for c in row.iter(f"{{{_NS_MAIN}}}c"):
            if c.get("t") == "inlineStr":
                t = c.find(f"{{{_NS_MAIN}}}is/{{{_NS_MAIN}}}t")
                value = ooxml_unescape(t.text or "") if t is not None else ""
                cells.append(("s", value))
            else:
                v = c.find(f"{{{_NS_MAIN}}}v").text or ""
                cells.append(("f" if "." in v else "i", v))
        rows.append(cells)
    header, data = rows[0], rows[1:]
    lines = [
        f"sheet:{sheet}",
        "widths:" + ",".join(widths),
        "cols:" + "\x1f".join(v for _, v in header),
    ]
    for cells in data:
        lines.append("row:" + "\x1f".join(f"{tag}:{v}" for tag, v in cells))
    return ("\n".join(lines) + "\n").encode("utf-8")


def xlsx_col(model_col):
    """Catalyst column: workbook-model binary → .xlsx container binary, as
    an Arrow-batched pandas UDF (pure-python zip packing is the only way to
    build the container; one batch renders ~2048 documents per round-trip,
    matching the serializer's batching shape). NULL models pass through."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _render(models: pd.Series) -> pd.Series:
        return models.map(lambda m: None if m is None else xlsx_bytes(bytes(m)))

    return _render(model_col)
