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
                docm = re.search(r"(\d{6,})(?:\s+|\s*-\s*)?" + re.escape(raw), joined)
                doc = docm.group(1) if docm else ""
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
        if re.match(r"^\s*SALDO EM \d{2}/\d{2}(?:/\d{2,4})?\s*$", lanc, re.IGNORECASE):
            continue
        out.append((data, lanc, amount, doc))
    return out


@functools.cache
def _santander_udf():
    @pandas_udf(SANTANDER_SCHEMA)
    def _udf(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for col in texts:
            yield pd.Series(
                [None if t is None else _santander_doc(t) for t in col], dtype=object
            )

    return _udf


def santander_records(col: Column | str) -> Column:
    return _santander_udf()(col)
