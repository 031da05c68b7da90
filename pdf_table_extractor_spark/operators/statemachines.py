"""Per-document state machines (SURVEY §2.10 UDF #2).

A few reference converters consume lines with variable-length lookahead
(join up to 2 following lines, then advance the cursor past everything
consumed — conversor_santander.py:50-73,93-131). That cursor movement makes
pure window translations brittle (SURVEY §7.3), so these run as Arrow-
vectorized pandas UDFs: one row = one document, the sequential loop runs
per doc inside the batch — no per-row Python at the Spark level.
"""

from __future__ import annotations

import functools
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

from pdf_table_extractor_spark.operators.quarantine import guard_doc

SANTANDER_SCHEMA = (
    "array<struct<data:string,lancamento:string,valor:double,documento:string>>"
)

# conversor_santander.py:32-33 — 21 debit keywords, lowercase substring match
SANTANDER_KEYWORDS = [
    "boleto", "outros bancos", "aplicacao", "pix enviado", "transferência enviada",
    "tarifa", "comercial", "tributo", "estadual", "esgoto", "telefone", "devolvido",
    "cancelado", "estorno", "distribuidora", "fornecedores", "darf", "celular",
]

_VALUE = re.compile(r"(\d{1,3}(?:\.\d{3})*,\d{2}-?)")
_DATE = re.compile(r"^(\d{2}/\d{2}(?:/\d{2,4})?)\b")
_HDR_SALDO = re.compile(r"^\s*SALDO (ANTERIOR|EM \d{2}/\d{2}/\d{4})")
_GLUE = re.compile(r"(\d{6,})(\d{1,3}(?:\.\d{3})*,\d{2}-?)")
# doc number immediately preceding the value literal (see _find_doc): the
# round-1 form re-built `re.search(r"(\d{6,})...sep..." + re.escape(raw))`
# per ROW — a fresh regex compile for every transaction.
_DOC_PRE = re.compile(r"(\d{6,})(?:\s+|\s*-\s*)?$")
_SALDO_EM = re.compile(r"^\s*SALDO EM \d{2}/\d{2}(?:/\d{2,4})?\s*$", re.IGNORECASE)


def _find_doc(joined: str, raw: str) -> str:
    """First occurrence of `raw` in `joined` directly preceded by a ≥6-digit
    run (optionally separated by spaces/hyphen) → that digit run.
    Equivalent to re.search(r"(\\d{6,})(?:\\s+|\\s*-\\s*)?" + re.escape(raw))
    without the per-row regex compile: the prefix-anchored search returns
    the same greedy digit run, and occurrences are scanned left-to-right
    like re.search's leftmost-match rule."""
    start = 0
    while True:
        p = joined.find(raw, start)
        if p < 0:
            return ""
        m = _DOC_PRE.search(joined, 0, p)
        if m and m.end() == p:
            return m.group(1)
        start = p + 1


def _santander_doc(text: str) -> list[tuple[str, str, float, str]]:
    """Sequential extraction for one document (conversor_santander.py:76-153
    semantics: gate on 'Movimentação', header-skip paths, ≤2-line lookahead
    join, glued doc/value split, keyword/trailing-hyphen signs, keep-first
    dedup, post-hoc SALDO row drops)."""
    lines = text.split("\n")
    raw_rows: list[tuple[str, str, str, str]] = []
    cur_date, started, idx = "", False, 0
    while idx < len(lines):
        base = lines[idx].strip()
        if "Movimentação" in base:
            started = True
            for skip_idx in range(idx + 1, min(idx + 4, len(lines))):
                if _HDR_SALDO.match(lines[skip_idx].strip().upper()):
                    idx = skip_idx + 1
                    break
                if _DATE.match(lines[skip_idx].strip()):
                    idx = skip_idx
                    break
            else:
                idx += 2
            continue
        if not started or ("EXTRATO CONSOLIDADO" in base and not _DATE.match(base)):
            idx += 1
            continue
        joined, used = lines[idx].strip().replace("\t", " "), 1
        for off in (1, 2):
            if idx + off >= len(lines):
                break
            extra = lines[idx + off].strip().replace("\t", " ")
            if _VALUE.search(joined) or _DATE.match(extra) or not extra:
                break
            joined += " " + extra
            used += 1
        joined = _GLUE.sub(r"\1 \2", joined)
        dm = _DATE.match(joined)
        if dm:
            cur_date = dm.group(1)
            joined = _DATE.sub("", joined, 1).strip()
        if cur_date:
            vm = _VALUE.search(joined)
            if vm:
                raw = vm.group(1)
                lanc = joined[: joined.rfind(raw)].strip()
                doc = _find_doc(joined, raw)
                if any(k in lanc.lower() for k in SANTANDER_KEYWORDS):
                    val = "-" + raw.replace("-", "").rstrip("-")
                else:
                    val = "-" + raw[:-1] if raw.endswith("-") else raw
                raw_rows.append((cur_date, lanc, val, doc))
        idx += used

    # DataFrame-stage cleanup (conversor_santander.py:137-153) folded in:
    out: list[tuple[str, str, float, str]] = []
    seen: set[tuple] = set()
    for data, lanc, val, doc in raw_rows:
        amount = float(val.replace(".", "").replace(",", "."))
        key = (data, lanc, amount, doc)
        if key in seen:
            continue
        seen.add(key)
        if "saldo anterior" in lanc.lower():
            continue
        if _SALDO_EM.match(lanc):
            continue
        out.append((data, lanc, amount, doc))
    return out


BRADESCO_SCHEMA = (
    "array<struct<data:string,historico:string,dcto:string,valor:string,saldo:string>>"
)

_BRAD_NUMS = r"(\d+)\s+(-?\d{1,3}(?:\.\d{3})*(?:,\d{2})?)\s+(-?\d{1,3}(?:\.\d{3})*(?:,\d{2})?)$"
_BRAD_NUMS_ANCH = re.compile("^" + _BRAD_NUMS)
_BRAD_NUMS_END = re.compile(_BRAD_NUMS)
_BRAD_STRIP_NUMS = re.compile(
    r"\s+\d+\s+[-+]?\d{1,3}(?:\.\d{3})*(?:,\d{2})?\s+[-+]?\d{1,3}(?:\.\d{3})*(?:,\d{2})?$"
)


def _bradesco_doc(text: str) -> list[tuple[str, str, str, str, str]]:
    """The reference's 7 read-modify-write file passes
    (conversor_bradesco.py:231-241) fused into one in-memory pipeline —
    each stage's list-in/list-out, no disk, same line semantics."""
    lines = [ln.strip() for ln in text.split("\n") if ln.strip()]
    lines = lines[5:] if len(lines) > 5 else []  # :33-40
    for i, ln in enumerate(lines):  # truncate at 'total' :41-47
        if "total" in ln.lower():
            lines = lines[:i]
            break
    marked, i = [], 0  # 3-line block marking :52-74
    while i < len(lines):
        if i + 2 < len(lines) and _BRAD_NUMS_ANCH.match(lines[i + 1]):
            marked += [f"*{lines[i]}", lines[i + 1], f"{lines[i + 2]}*"]
            i += 3
        else:
            marked.append(lines[i])
            i += 1
    out, i = [], 0  # marked-block concat :76-96
    while i < len(marked):
        if marked[i].startswith("*") and i + 2 < len(marked) and marked[i + 2].endswith("*"):
            out.append(f"*{marked[i][1:]} {marked[i + 2][:-1]} {marked[i + 1]}*")
            i += 3
        else:
            out.append(marked[i])
            i += 1
    lines, out, i = out, [], 0  # exception 1 :98-119
    while i < len(lines):
        cur = lines[i]
        if not cur.startswith("*") and i + 1 < len(lines) and not lines[i + 1].startswith("*"):
            m1 = _BRAD_NUMS_END.search(cur)
            if m1 and not _BRAD_NUMS_END.search(lines[i + 1]):
                out.append(f"{_BRAD_STRIP_NUMS.sub('', cur)} {lines[i + 1]} {m1.group(0)}")
                i += 2
                continue
        out.append(cur)
        i += 1
    lines, out, i = out, [], 0  # exception 2 :121-140
    while i < len(lines):
        cur = lines[i]
        if not cur.startswith("*") and i + 1 < len(lines) and not lines[i + 1].startswith("*"):
            if not _BRAD_NUMS_END.search(cur) and _BRAD_NUMS_END.search(lines[i + 1]):
                out.append(f"{cur} {lines[i + 1]}")
                i += 2
                continue
        out.append(cur)
        i += 1
    cleaned = [ln.strip("*").strip() for ln in out]  # propagate :142-164
    prop, cur_date = [], None
    for ln in cleaned:
        dm = re.match(r"^(\d{2}/\d{2}/\d{4})", ln)
        if dm:
            cur_date = dm.group(1)
            prop.append(ln)
        elif cur_date:
            prop.append(f"{cur_date} {ln}")
        else:
            prop.append(ln)
    rows = []  # txt_to_xls cell typing :167-221, cells pre-rendered to text
    last_date = None
    for ln in prop:
        cur, remaining = "", ln
        m = re.search(r"(\d{2}/\d{2}/\d{4})", ln)
        if m:
            cur = m.group(1)
            last_date = cur
            remaining = ln.replace(cur, "", 1).strip()
        elif last_date:
            cur = last_date
        parts = remaining.split()
        vals = []
        for p in parts[-3:]:
            if re.match(r"^-?[\d.,]+$", p):
                cv = p.replace(".", "").replace(",", ".")
                try:
                    vals.append(str(float(cv)) if "." in cv else str(int(cv)))
                except ValueError:
                    vals.append(p)
            else:
                vals.append(p)
        hist = " ".join(parts[:-3]) if len(parts) > 3 else ""
        rows.append(
            (cur, hist) + tuple(vals[c] if c < len(vals) else "" for c in range(3))
        )
    return rows


STONE_SCHEMA = "array<array<string>>"


def _stone_doc(html: bytes) -> list[list[str]]:
    """Lattice-mode table extraction (conversor_stone.py:4-23 semantics over
    our markup): vertical-ruling groups → column borders, horizontals → row
    borders, word-center binning via searchsorted; tables concatenated."""
    import numpy as np

    from pdf_table_extractor_spark.markup import parse as parse_markup

    words, rulings = parse_markup(bytes(html))
    groups: dict[tuple, list[float]] = {}
    for r in rulings:
        if r.x0 == r.x1:
            groups.setdefault((r.page_no, r.top, r.bottom), []).append(r.x0)
    tables = []
    for (page, top, bottom), xs_list in sorted(groups.items()):
        xs = np.array(sorted(set(xs_list)))
        ys = np.array(
            sorted(
                {
                    r.top
                    for r in rulings
                    if r.page_no == page and r.top == r.bottom and top <= r.top <= bottom
                }
            )
        )
        if len(xs) < 2 or len(ys) < 2:
            continue
        pw = [w for w in words if w.page_no == page]
        cx = np.array([(w.x0 + w.x1) / 2 for w in pw])
        cy = np.array([(w.top + w.bottom) / 2 for w in pw])
        col = np.searchsorted(xs, cx, side="right") - 1
        row = np.searchsorted(ys, cy, side="right") - 1
        n_rows, n_cols = len(ys) - 1, len(xs) - 1
        grid: list[list[list]] = [[[] for _ in range(n_cols)] for _ in range(n_rows)]
        for w, ci, ri in zip(pw, col, row):
            if 0 <= ci < n_cols and 0 <= ri < n_rows:
                grid[ri][ci].append(w)
        tables.append(
            (
                page,
                top,
                [
                    [" ".join(w.text for w in sorted(cell, key=lambda w: w.x0)) for cell in r_]
                    for r_ in grid
                ],
            )
        )
    tables.sort(key=lambda t: (t[0], t[1]))
    rows: list[list[str]] = []
    for _page, _top, grid in tables:
        rows.extend(grid)
    return rows


@functools.cache
def _bradesco_udf():
    doc = guard_doc(_bradesco_doc)  # poison doc → None records, not task death

    @pandas_udf(BRADESCO_SCHEMA)
    def _udf(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for col in texts:
            yield pd.Series(
                [None if t is None else doc(t) for t in col], dtype=object
            )

    return _udf


def bradesco_records(col: Column | str) -> Column:
    return _bradesco_udf()(col)


@functools.cache
def _stone_udf():
    doc = guard_doc(_stone_doc)

    @pandas_udf(STONE_SCHEMA)
    def _udf(htmls: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for col in htmls:
            yield pd.Series(
                [None if h is None else doc(h) for h in col], dtype=object
            )

    return _udf


def stone_rows(col: Column | str) -> Column:
    return _stone_udf()(col)


@functools.cache
def _santander_udf():
    doc = guard_doc(_santander_doc)

    @pandas_udf(SANTANDER_SCHEMA)
    def _udf(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for col in texts:
            yield pd.Series(
                [None if t is None else doc(t) for t in col], dtype=object
            )

    return _udf


def santander_records(col: Column | str) -> Column:
    return _santander_udf()(col)
