"""Pure-pandas golden oracle: reimplements each reference converter's loop
semantics at fixture scale, in our own words, over the synthetic corpus.

The engine under test must produce byte-identical CSV per url versus these
functions. Each oracle cites the reference lines it mirrors; trusted because
it is reviewable side-by-side with those lines. NEVER import engine code
here (the oracle must stay independent of the thing it checks) — the only
shared helper is the markup parser, which is the fixture format, not the
engine.
"""

from __future__ import annotations

import io
import re
from collections import defaultdict

import pandas as pd

from pdf_table_extractor_spark.markup import parse as parse_markup


def _csv_bytes(df: pd.DataFrame, **to_csv_kwargs) -> bytes:
    """pandas to_csv with utf-8-sig semantics → bytes (BOM + utf-8 body)."""
    buf = io.StringIO()
    df.to_csv(buf, index=False, **to_csv_kwargs)
    return b"\xef\xbb\xbf" + buf.getvalue().encode("utf-8")


def oracle_banestes(text: str, html: bytes) -> bytes | None:
    """Mirrors conversor_banestes.py:23-91 + sink :110 (iniciar_processamento
    path: sep=';', decimal=',', utf-8-sig)."""
    words, _ = parse_markup(html)
    day_carry = ""
    out = []
    pages = sorted({w.page_no for w in words})
    for page in pages:
        by_y = defaultdict(list)
        for w in words:
            if w.page_no == page:
                by_y[round(w.top, 0)].append(w)
        for y in sorted(by_y):
            date_txt, desc_txt, value_txt = "", "", ""
            for w in sorted(by_y[y], key=lambda w: w.x0):
                if w.x0 < 75:
                    date_txt += w.text
                elif w.x0 > 480:
                    value_txt += w.text
                else:
                    desc_txt += w.text + " "
            date_txt, desc_txt, value_txt = date_txt.strip(), desc_txt.strip(), value_txt.strip()
            if re.match(r"^\d{2}$", date_txt):
                day_carry = date_txt
            if desc_txt and value_txt and re.search(r"[\d]", value_txt):
                if "lançamento" in desc_txt.lower():
                    continue
                amount = float(
                    re.sub(r"[^\d,-]", "", value_txt).replace(".", "").replace(",", ".")
                )
                if amount > 0 and any(
                    k in desc_txt for k in ["Pix Enviado", "Pagamento", "Tarifa", "Cesta"]
                ):
                    amount *= -1
                out.append(
                    {"Data": f"{day_carry}/JUN/25", "Lançamento": desc_txt, "Valor (R$)": amount}
                )
    if not out:
        return None
    return _csv_bytes(pd.DataFrame(out), sep=";", decimal=",")


def oracle_pagbank(text: str, html: bytes) -> bytes | None:
    """Mirrors conversor_pagbank.py:30-48 (whole-doc findall, strings kept)."""
    pat = re.compile(r"(\d{2}/\d{2}/\d{4})\s+(.+?)\s+(-?R?\$\s?[\d\.]+,\d{2})")
    matches = pat.findall(text)
    if not matches:
        return None
    df = pd.DataFrame(matches, columns=["Data", "Descrição", "Valor"])
    return _csv_bytes(df, sep=";")


def oracle_cef(text: str, html: bytes) -> bytes | None:
    """Mirrors conversor_cef.py:13-39 (token split: first/middle/last)."""
    date_pat = re.compile(r"(\d{2}/\d{2}/\d{4})")
    rows = []
    for line in text.split("\n"):
        if date_pat.search(line):
            toks = line.split()
            if len(toks) > 2:
                rows.append([toks[0], " ".join(toks[1:-1]), toks[-1]])
    if not rows:
        return None
    df = pd.DataFrame(rows, columns=["Data", "Histórico", "Valor/Saldo"])
    return _csv_bytes(df, sep=";")


def oracle_inter(text: str, html: bytes) -> bytes | None:
    """Mirrors conversor_inter.py:8-56 (month-name date carry, R$ values,
    quote strip, thousands-dot strip; all strings)."""
    months = {
        "Janeiro": "01", "Fevereiro": "02", "Março": "03", "Abril": "04",
        "Maio": "05", "Junho": "06", "Julho": "07", "Agosto": "08",
        "Setembro": "09", "Outubro": "10", "Novembro": "11", "Dezembro": "12",
    }
    date_pat = re.compile(r"(\d{1,2}) de (\w+) de (\d{4})")
    value_pat = re.compile(r"(-?)R\$\s*(\d{1,3}(?:\.\d{3})*,\d{2})")
    carry = "01/01/2000"
    dates, descs, values = [], [], []
    for line in text.split("\n"):
        dm = date_pat.search(line)
        if dm:
            day, month, year = dm.groups()
            carry = f"{day}/{months.get(month, '00')}/{year}"
        vm = value_pat.search(line)
        if vm:
            sign, amount = vm.group(1), vm.group(2)
            desc = line[: vm.start()].strip().replace('"', "").replace("'", "")
            amount = f"-{amount}" if sign == "-" else amount
            amount = re.sub(r"\.(?=\d{3},)", "", amount)
            dates.append(carry)
            descs.append(desc)
            values.append(amount)
    df = pd.DataFrame({"Data": dates, "Histórico": descs, "Valor": values})
    return _csv_bytes(df, sep=";")


ORACLES = {
    "banestes": oracle_banestes,
    "pagbank": oracle_pagbank,
    "cef": oracle_cef,
    "inter": oracle_inter,
}


def golden(profile: str, text: str, html: bytes) -> bytes | None:
    return ORACLES[profile](text, html)
