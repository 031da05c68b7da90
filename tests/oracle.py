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


_DEACCENT_MULTI = {"ß": "ss", "æ": "ae", "Æ": "AE", "œ": "oe", "Œ": "OE",
                   "þ": "th", "Þ": "Th", "ĳ": "ij", "Ĳ": "IJ",
                   "ø": "o", "Ø": "O", "đ": "d", "Đ": "D", "ħ": "h", "Ħ": "H",
                   "ı": "i", "ł": "l", "Ł": "L", "ŧ": "t", "Ŧ": "T",
                   "ð": "d", "Ð": "D"}


def _deaccent(s: str) -> str:
    """What `unidecode` does to Latin text: decompose, drop the accent
    marks, expand the handful of 1→many letters."""
    import unicodedata

    out = []
    for ch in s:
        if ch.isascii():
            out.append(ch)
        elif ch in _DEACCENT_MULTI:
            out.append(_DEACCENT_MULTI[ch])
        else:
            base = "".join(
                c
                for c in unicodedata.normalize("NFKD", ch)
                if not unicodedata.combining(c)
            )
            out.append(base if base and base.isascii() else ch)
    return "".join(out)


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


def oracle_bbmod1(text: str, html: bytes) -> bytes | None:
    """Mirrors conversor_bbmod1.py:37-108 + sink :162 (buffer-until-value)."""
    start_pat = re.compile(r"^\d{2}/\d{2}/\d{2,4}")
    end_pat = re.compile(r"([\d\.,\s]+\(\s*[-+]\s*\))$")
    skip_pat = re.compile(
        r"^(Lançamentos|Histórico|Saldo Anterior|Dia\s+Lote|Extrato de Conta Corrente"
        r"|Cliente\s|Agência:|Total Aplicações|Informações Adicionais|SALDO"
        r"|Informações Complementares)",
        re.IGNORECASE,
    )
    inner_pat = re.compile(r"([\d\.,]+)\s*\(\s*([+-])\s*\)")

    rows = []
    cur_date, pieces = None, []
    for line in text.split("\n"):
        line = line.strip()
        if not line or skip_pat.search(line):
            continue
        if start_pat.search(line):
            cur_date = start_pat.search(line).group(0)
            first = start_pat.sub("", line).strip()
            first = re.sub(r"^\s*\d+\s+[\d\w]+\s*", "", first)
            pieces = [first]
        elif cur_date:
            pieces.append(line)
        if cur_date:
            joined = " ".join(pieces)
            m = end_pat.search(joined)
            if m:
                val_txt = m.group(1)
                desc = re.sub(r"\s+", " ", end_pat.sub("", joined).strip())
                im = inner_pat.search(val_txt)
                amount = 0.0
                if im:
                    amount = float(im.group(1).replace(".", "").replace(",", ".").strip())
                    if im.group(2) == "-":
                        amount *= -1
                if amount != 0.0:
                    rows.append({"Data": cur_date, "Lançamento": desc, "Valor": amount})
                cur_date, pieces = None, []
    if not rows:
        return None
    return _csv_bytes(pd.DataFrame(rows), sep=";", decimal=",")


def oracle_bbmod2(text: str, html: bytes) -> bytes | None:
    """Mirrors conversor_bbmod2.py:24-73 + sink :91 (dated-line flush)."""
    start_pat = re.compile(r"^\d{2}/\d{2}/\d{2,4}")
    value_pat = re.compile(r"([\d\.,]+\s[CD])")
    inner_pat = re.compile(r"([\d\.,]+)\s*([CD])")
    skip_pat = re.compile(r"(Lançamentos|Histórico|Saldo Anterior|SALDO|G336)")

    def parse_val(v):
        if not v:
            return 0.0
        m = inner_pat.search(v)
        if not m:
            return 0.0
        x = float(m.group(1).replace(".", "").replace(",", ".").strip())
        return -x if m.group(2) == "D" else x

    rows = []
    cur = None
    for line in text.split("\n"):
        if start_pat.search(line):
            if cur is not None and cur.get("Valor") is not None:
                cur["Lançamento"] = re.sub(r"\s+", " ", " ".join(cur["Lançamento"]).strip())
                rows.append(cur)
            date_tok = line.split()[0]
            found = value_pat.findall(line)
            vs = found[0] if found else None
            desc0 = line.replace(date_tok, "", 1).strip()
            for v in found:
                desc0 = desc0.replace(v, "").strip()
            cur = {"Data": date_tok, "Lançamento": [desc0], "Valor": parse_val(vs)}
        elif cur is not None:
            if not skip_pat.search(line):
                cur["Lançamento"].append(line.strip())
    if cur is not None and cur.get("Valor") is not None:
        cur["Lançamento"] = re.sub(r"\s+", " ", " ".join(cur["Lançamento"]).strip())
        rows.append(cur)
    if not rows:
        return None
    df = pd.DataFrame(rows)
    df = df[~df["Lançamento"].str.contains("Saldo Anterior", na=False)]
    df = df[df["Valor"] != 0.0]
    if df.empty:
        # reference: empty-after-filter df still written? no — `.empty` check
        # in iniciar_processamento treats it as an error (no file)
        return None
    return _csv_bytes(df, sep=";", decimal=",")


def oracle_sicoob1(text: str, html: bytes) -> bytes | None:
    """Mirrors conversor_sicoobmod1.py:9-77 + sink :97 (EOL C/D values,
    date carry, docnum strip; string-form values)."""
    date_pat = re.compile(r"^(\d{2}\/\d{2}\/\d{4})")
    value_pat = re.compile(r"([\d\.,]+)([CD])$")
    rows = []
    cur_date = None
    for line in text.split("\n"):
        if "SALDO ANTERIOR" in line or "SALDO DO DIA" in line or "EXTRATO CONTA CORRENTE" in line:
            continue
        dm = date_pat.search(line)
        if dm:
            cur_date = dm.group(1)
        vm = value_pat.search(line.strip())
        if vm and cur_date:
            val_orig = f"{vm.group(1)}{vm.group(2)}"
            lanc = line[: vm.start()].strip()
            if dm:
                lanc = lanc[dm.end():].strip()
            lanc = re.sub(r"^\S+\s", "", lanc, count=1)
            if lanc:
                rows.append([cur_date, lanc.strip(), val_orig])
    if not rows:
        return None
    df = pd.DataFrame(rows, columns=["Data", "Lancamento", "Valor_Original"])

    def fmt(v):
        is_d = v.endswith("D")
        body = v[:-1].replace(".", "")
        return "-" + body if is_d else body

    df["Valor"] = df["Valor_Original"].apply(fmt)
    return _csv_bytes(df[["Data", "Lancamento", "Valor"]], sep=";")


def oracle_sicoob2(text: str, html: bytes) -> bytes | None:
    """Mirrors conversor_sicoobmod2.py:10-73 + sink :93 (year sniff, section
    trims, block split before dd/mm)."""
    ym = re.search(r"PERÍODO: \d{2}\/\d{2}\/(\d{4})", text)
    year = ym.group(1) if ym else "1900"
    t = re.sub(r".*HISTÓRICO DE MOVIMENTAÇÃO\n", "", text, flags=re.DOTALL)
    t = re.sub(r"SALDO ANTERIOR.*?\n", "", t, flags=re.DOTALL)
    t = re.sub(r"\nRESUMO.*", "", t, flags=re.DOTALL)
    rows = []
    for block in re.split(r"\n(?=\d{2}/\d{2})", t.strip()):
        flat = re.sub(r"\s{2,}", " ", block.replace("\n", " ").strip())
        if "SALDO DO DIA" in flat:
            continue
        vm = re.search(r"(\d{1,3}(?:\.\d{3})*,\d{2}|\d+,\d{2}|\d+\.\d{2})\s*([CD])", flat)
        dm = re.match(r"(\d{2}/\d{2})", flat)
        if dm and vm:
            date = f"{dm.group(1)}/{year}"
            desc = re.sub(r"^\d{2}/\d{2}\s*", "", flat).strip()
            desc = desc.replace(vm.group(0), "", 1).strip()
            desc = re.sub(r"\s{2,}", " ", desc).strip()
            amount = float(vm.group(1).replace(".", "").replace(",", "."))
            if vm.group(2) == "D":
                amount *= -1
            if desc:
                rows.append([date, desc, amount])
    if not rows:
        return None
    df = pd.DataFrame(rows, columns=["Data", "Lancamento", "Valor"])
    df["Data"] = pd.to_datetime(df["Data"], format="%d/%m/%Y").dt.strftime("%d/%m/%Y")
    return _csv_bytes(df, sep=";", decimal=",")


def oracle_c6(text: str, html: bytes) -> bytes | None:
    """Mirrors conversor_c6.py:10-94 + sink :119-120 (year sniff, dd/mm
    carry with validity check, EOL R$ values, drop_duplicates; :109 senha
    unlock before parse)."""
    if text.startswith("ENC1:"):
        from pdf_table_extractor_spark.plans.profiles import C6_PASSWORD

        key = C6_PASSWORD.encode("utf-8")
        raw = bytes.fromhex(text[len("ENC1:"):])
        text = bytes(b ^ key[i % len(key)] for i, b in enumerate(raw)).decode("utf-8")
    ym = re.search(r"Período \d{1,2} de \w+ de (\d{4})", text) or re.search(
        r"exportado no dia \d{1,2} de \w+ de (\d{4})", text
    )
    if not ym:
        return None  # reference raises ValueError → error dialog, no file
    year = ym.group(1)
    rows = []
    cur_date = None
    for line in text.split("\n"):
        line = line.strip()
        if not line or "Saldo do dia" in line or "Data Lançamento" in line:
            continue
        dm = re.match(r"(\d{2}/\d{2})", line)
        if dm:
            day, month = dm.group(1).split("/")
            if 1 <= int(month) <= 12 and 1 <= int(day) <= 31:
                cur_date = f"{dm.group(1)}/{year}"
        tm = re.search(r"^(.*?)\s+(-?R\$\s?[\d\.,]+)$", line)
        if cur_date and tm:
            desc, val_txt = tm.groups()
            desc = re.sub(r"^\d{2}/\d{2}\s*", "", desc.strip()).strip()
            neg = "-" in val_txt
            body = re.sub(r"[^\d,]", "", val_txt).replace(",", ".")
            try:
                amount = float(body)
            except ValueError:
                amount = 0.0
            if neg:
                amount = -abs(amount)
            if desc and amount != 0.0:
                rows.append({"Data": cur_date, "Lançamento": desc, "Valor": amount})
    if not rows:
        return None
    df = pd.DataFrame(rows).drop_duplicates().reset_index(drop=True)
    df["Data"] = pd.to_datetime(df["Data"], format="%d/%m/%Y").dt.strftime("%d/%m/%Y")
    return _csv_bytes(df, sep=";", decimal=",")


SANT_KEYWORDS = [
    "boleto", "outros bancos", "aplicacao", "pix enviado", "transferência enviada",
    "tarifa", "comercial", "tributo", "estadual", "esgoto", "telefone", "devolvido",
    "cancelado", "estorno", "distribuidora", "fornecedores", "darf", "celular",
]


def oracle_santander(text: str, html: bytes) -> bytes | None:
    """Mirrors conversor_santander.py:18-161 (gate + lookahead joins +
    glued docnum fix + keyword/hyphen signs + post-hoc cleanup)."""
    value_pat = re.compile(r"(\d{1,3}(?:\.\d{3})*,\d{2}-?)")
    date_pat = re.compile(r"^(\d{2}/\d{2}(?:/\d{2,4})?)\b")
    rows = []
    cur_date = ""
    started = False
    lines = text.split("\n")
    idx = 0
    while idx < len(lines):
        base = lines[idx].strip()
        if "Movimentação" in base:
            started = True
            for skip_idx in range(idx + 1, min(idx + 4, len(lines))):
                if re.match(r"^\s*SALDO (ANTERIOR|EM \d{2}/\d{2}/\d{4})", lines[skip_idx].strip().upper()):
                    idx = skip_idx + 1
                    break
                if date_pat.match(lines[skip_idx].strip()):
                    idx = skip_idx
                    break
            else:
                idx += 2
            continue
        if not started or ("EXTRATO CONSOLIDADO" in base and not date_pat.match(base)):
            idx += 1
            continue
        # lookahead join (preparar_linha)
        joined = lines[idx].strip().replace("\t", " ")
        used = 1
        for off in (1, 2):
            if idx + off < len(lines):
                extra = lines[idx + off].strip().replace("\t", " ")
                if (
                    not re.search(r"\d{1,3}(?:\.\d{3})*,\d{2}-?", joined)
                    and not date_pat.match(extra)
                    and extra
                ):
                    joined += " " + extra
                    used += 1
                else:
                    break
            else:
                break
        joined = re.sub(r"(\d{6,})(\d{1,3}(?:\.\d{3})*,\d{2}-?)", r"\1 \2", joined)
        dm = date_pat.match(joined)
        if dm:
            cur_date = dm.group(1)
            joined = date_pat.sub("", joined, 1).strip()
        if cur_date:
            vm = value_pat.search(joined)
            if vm:
                raw = vm.group(1)
                lanc = joined[: joined.rfind(raw)].strip()
                docm = re.search(r"(\d{6,})(?:\s+|\s*-\s*)?" + re.escape(raw), joined)
                doc = docm.group(1) if docm else ""
                low = lanc.lower()
                if any(k in low for k in SANT_KEYWORDS):
                    val = "-" + raw.replace("-", "").rstrip("-")
                else:
                    val = "-" + raw[:-1] if raw.endswith("-") else raw
                rows.append([cur_date, lanc, val, doc])
        idx += used
    if not rows:
        return None
    df = pd.DataFrame(rows, columns=["Data", "Lançamento", "Valor", "Documento"])
    df["Valor"] = df["Valor"].apply(
        lambda s: float(s.replace(".", "").replace(",", "."))
    )
    df.drop_duplicates(inplace=True)
    df = df[~df["Lançamento"].str.contains("SALDO ANTERIOR", case=False, na=False)]
    df = df[~df["Lançamento"].str.match(r"^\s*SALDO EM \d{2}/\d{2}(?:/\d{2,4})?\s*$", case=False, na=False)]
    if df.empty:
        return None
    return _csv_bytes(df, sep=";", decimal=",")


BRAD_NUMS = r"(\d+)\s+(-?\d{1,3}(?:\.\d{3})*(?:,\d{2})?)\s+(-?\d{1,3}(?:\.\d{3})*(?:,\d{2})?)$"


def oracle_bradesco(text: str, html: bytes) -> bytes | None:
    """Mirrors the 7-stage conversor_bradesco.py pipeline (:33-228); the XLS
    sheet's typed cells are recast as our logical-rows CSV (sep=';', utf-8,
    no BOM) with the same cell values."""
    rows = _bradesco_typed_rows(text)
    if not rows:
        return None
    df = pd.DataFrame(rows, columns=["Data", "Histórico", "Dcto.", "Valor", "Saldo"])
    buf = io.StringIO()
    df.to_csv(buf, index=False, sep=";")
    return buf.getvalue().encode("utf-8")  # utf-8, no BOM (txt/xls path)


def oracle_bradesco_workbook(text: str) -> bytes:
    """The typed-cell workbook MODEL the reference's xlwt writer would
    build (conversor_bradesco.py:170-227): sheet name, column widths, and
    per-cell (type, value) — independent re-derivation for byte-identity
    against engine serialize_workbook."""
    rows = _bradesco_typed_rows(text)
    lines = [
        "sheet:Transacoes",
        "widths:3000,12000,4000,4000,4000",
        "cols:" + "\x1f".join(["Data", "Histórico", "Dcto.", "Valor", "Saldo"]),
    ]
    for cells in rows:
        enc = []
        for i, v in enumerate(cells):
            if i < 2:
                enc.append(f"s:{v}")
            elif isinstance(v, float):
                enc.append(f"f:{v}")
            elif isinstance(v, int):
                enc.append(f"i:{v}")
            else:
                enc.append(f"s:{v}")
        lines.append("row:" + "\x1f".join(enc))
    return ("\n".join(lines) + "\n").encode("utf-8")


def _bradesco_typed_rows(text: str) -> list[list]:
    """conversor_bradesco.py:33-228 through txt_to_xls typing: one list per
    sheet row, cells python-typed (str date/hist, int/float/str values)."""
    lines = [ln.strip() for ln in text.split("\n") if ln.strip()]
    # clean_statement (:33-50)
    lines = lines[5:] if len(lines) > 5 else []
    for i, ln in enumerate(lines):
        if "total" in ln.lower():
            lines = lines[:i]
            break
    # mark_all_transaction_blocks (:52-74)
    marked, i = [], 0
    while i < len(lines):
        if i + 2 < len(lines) and re.match("^" + BRAD_NUMS, lines[i + 1]):
            marked += [f"*{lines[i]}", lines[i + 1], f"{lines[i + 2]}*"]
            i += 3
        else:
            marked.append(lines[i])
            i += 1
    # process_marked_blocks (:76-96)
    out, i = [], 0
    while i < len(marked):
        if marked[i].startswith("*") and i + 2 < len(marked) and marked[i + 2].endswith("*"):
            out.append(f"*{marked[i][1:]} {marked[i + 2][:-1]} {marked[i + 1]}*")
            i += 3
        else:
            out.append(marked[i])
            i += 1
    # first_exception (:98-119)
    lines, out, i = out, [], 0
    while i < len(lines):
        cur = lines[i]
        if (
            not cur.startswith("*")
            and i + 1 < len(lines)
            and not lines[i + 1].startswith("*")
        ):
            m1 = re.search(BRAD_NUMS, cur)
            m2 = re.search(BRAD_NUMS, lines[i + 1])
            if m1 and not m2:
                desc = re.sub(
                    r"\s+\d+\s+[-+]?\d{1,3}(?:\.\d{3})*(?:,\d{2})?\s+[-+]?\d{1,3}(?:\.\d{3})*(?:,\d{2})?$",
                    "",
                    cur,
                )
                out.append(f"{desc} {lines[i + 1]} {m1.group(0)}")
                i += 2
                continue
        out.append(cur)
        i += 1
    # second_exception (:121-140)
    lines, out, i = out, [], 0
    while i < len(lines):
        cur = lines[i]
        if (
            not cur.startswith("*")
            and i + 1 < len(lines)
            and not lines[i + 1].startswith("*")
        ):
            if not re.search(BRAD_NUMS, cur) and re.search(BRAD_NUMS, lines[i + 1]):
                out.append(f"{cur} {lines[i + 1]}")
                i += 2
                continue
        out.append(cur)
        i += 1
    # propagate_and_format (:142-164)
    cleaned = [ln.strip("*").strip() for ln in out]
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
    # txt_to_xls (:167-228) — typed cells
    rows = []
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
                    vals.append(float(cv) if "." in cv else int(cv))
                except ValueError:
                    vals.append(p)
            else:
                vals.append(p)
        hist = " ".join(parts[:-3]) if len(parts) > 3 else ""
        cells = [cur, hist] + [vals[c] if c < len(vals) else "" for c in range(3)]
        rows.append(cells)
    return rows


def _lattice_tables(html: bytes):
    """Shared-spec lattice detection over markup rulings: verticals grouped
    by identical (page, top, bottom) span form a table's column borders;
    horizontals inside the span are row borders; a cell's text is its
    words (center-in-cell) x-sorted, space-joined."""
    words, rulings = parse_markup(html)
    tables = []
    groups = defaultdict(list)
    for r in rulings:
        if r.x0 == r.x1:  # vertical
            groups[(r.page_no, r.top, r.bottom)].append(r.x0)
    for (page, top, bottom), xs in sorted(groups.items()):
        xs = sorted(set(xs))
        ys = sorted(
            {
                r.top
                for r in rulings
                if r.page_no == page and r.top == r.bottom and top <= r.top <= bottom
            }
        )
        if len(xs) < 2 or len(ys) < 2:
            continue
        in_table = [
            w
            for w in words
            if w.page_no == page
            and xs[0] <= (w.x0 + w.x1) / 2 <= xs[-1]
            and ys[0] <= (w.top + w.bottom) / 2 <= ys[-1]
        ]
        grid = []
        for j in range(len(ys) - 1):
            row = []
            for i in range(len(xs) - 1):
                cell_words = [
                    w
                    for w in in_table
                    if xs[i] <= (w.x0 + w.x1) / 2 < xs[i + 1]
                    and ys[j] <= (w.top + w.bottom) / 2 < ys[j + 1]
                ]
                row.append(" ".join(w.text for w in sorted(cell_words, key=lambda w: w.x0)))
            grid.append(row)
        tables.append((page, top, grid))
    tables.sort(key=lambda t: (t[0], t[1]))
    return [t[2] for t in tables]


def oracle_stone(text: str, html: bytes) -> bytes | None:
    """Mirrors conversor_stone.py:4-23: per-table DataFrames concatenated,
    headerless CSV (default sep=',', utf-8, no BOM)."""
    grids = _lattice_tables(html)
    dfs = [pd.DataFrame(g) for g in grids if g]
    if not dfs:
        return None
    final = pd.concat(dfs, ignore_index=True) if len(dfs) > 1 else dfs[0]
    buf = io.StringIO()
    final.to_csv(buf, index=False, header=False)
    return buf.getvalue().encode("utf-8")


def oracle_itau(text: str, html: bytes) -> bytes | None:
    """Mirrors conversor_itau.py (PDFTableExtractor.start, :15-45): per-page
    stream-mode table (fixture geometry from synth.ITAU_GEOM), fix_header
    :125-129, clean_data :47-66 (+fix_hyphen :68-73), sanitize :131-144,
    date ffill :146-152, credito/debito bfill :154-167, CSV :113-117 and
    finalize ';;'→';' :169-178."""
    import bisect

    from pdf_table_extractor_spark.synth import ITAU_GEOM  # fixture geometry spec

    words, _ = parse_markup(html)

    def fix_hyphen(v):
        if isinstance(v, str):
            v = v.strip().replace(".", "")
            v = re.sub(r"(\d+),(\d+)-$", r"-\1,\2", v)
        return v

    page_dfs = []
    for page in sorted({w.page_no for w in words}):
        cfg = ITAU_GEOM["page_1"] if page == 1 else ITAU_GEOM["page_2_end"]
        ax0, atop, ax1, abot = cfg["area"]
        seps = cfg["columns"]
        pw = [
            w
            for w in words
            if w.page_no == page
            and ax0 <= (w.x0 + w.x1) / 2 <= ax1
            and atop <= (w.top + w.bottom) / 2 <= abot
        ]
        if not pw:
            continue
        rows = defaultdict(list)
        for w in pw:
            rows[round(w.top, 0)].append(w)
        grid = []
        for y in sorted(rows):
            cells = [[] for _ in range(len(seps) + 1)]
            for w in rows[y]:
                cells[bisect.bisect_right(seps, (w.x0 + w.x1) / 2)].append(w)
            grid.append(
                [" ".join(x.text for x in sorted(c, key=lambda x: x.x0)) for c in cells]
            )
        if not grid:
            continue
        df = pd.DataFrame(grid)
        # fix_header
        df.columns = df.iloc[0]
        df = df.drop(0).reset_index(drop=True)
        # clean_data
        df = df.loc[:, ~df.columns.duplicated()]
        df = df.dropna(axis=1, how="all")
        df.columns = df.columns.str.strip()
        for col in df.columns:
            df[col] = df[col].apply(fix_hyphen)
        page_dfs.append(df)
    if not page_dfs:
        return None
    main = pd.concat(page_dfs, ignore_index=True)
    # sanitize_column_names: unidecode-equivalent Latin transliteration
    # (NFKD strip + the 1→many letters), re-derived here in our own words
    main.columns = main.columns.map(
        lambda x: re.sub(r"[^\w\s]", "", _deaccent(str(x))).replace(" ", "_").lower()
    )
    main = main.loc[:, ~main.columns.duplicated()]
    if "data_de_insercao" in main.columns:
        main = main.drop("data_de_insercao", axis=1)
    main = main.dropna(axis=1, how="all")
    # fill_empty_dates / remove_credit_debit_repeats
    if "data" in main.columns:
        main["data"] = main["data"].replace("", pd.NA).ffill()
    if "credito" in main.columns:
        main["credito"] = main["credito"].replace("", pd.NA).bfill()
    if "debito" in main.columns:
        main["debito"] = main["debito"].replace("", pd.NA).bfill()
    buf = io.StringIO()
    main.to_csv(buf, sep=";", index=False)
    return re.sub(r";{2,}", ";", buf.getvalue()).encode("utf-8")


CAIXA_FMTS = [
    (r"\d{2}/\d{2}/\d{4}", "%d/%m/%Y"),
    (r"\d{4}-\d{2}-\d{2}", "%Y-%m-%d"),
    (r"\d{4}/\d{2}/\d{2}", "%Y/%m/%d"),
    (r"\d{2}\.\d{2}\.\d{4}", "%d.%m.%Y"),
]


def oracle_caixa(text: str, html: bytes) -> bytes | None:
    """Mirrors conversor_caixa.py:98-192 (3-pattern cascade with skip-word
    continue), :232-271 (date/value processing with string fallback) and the
    :327 sink (sep=',', QUOTE_NONNUMERIC, utf-8-sig)."""
    import csv as csv_mod
    from datetime import datetime

    date_pat = None
    strp = None
    for pat, fmt in CAIXA_FMTS:
        if re.search(pat, text):
            date_pat, strp = pat, fmt
            break
    if not date_pat:
        return None

    patterns = [
        rf"({date_pat})\s+(\d+|\w+)\s+(.*?)\s+([\d\.,]+\s*[DC]?)\s+([\d\.,]+\s*[DC]?)",
        rf"({date_pat})\s+(.*?)\s+([\d\.,]+\s*[DC]?)\s+([\d\.,]+\s*[DC]?)",
        rf"({date_pat})(.+)",
    ]
    skip_words = ["SALDO DIA", "SALDO ANTERIOR", "TOTAL", "Data Mov", "Histórico", "Valor"]
    rows = []
    for line in text.split("\n"):
        line = line.strip()
        if not line or not re.search(date_pat, line):
            continue
        for pi, pat in enumerate(patterns):
            m = re.search(pat, line)
            if not m:
                continue
            if pi == 0:
                date, desc, bal = m.group(1), m.group(3).strip(), m.group(5).strip()
            elif pi == 1:
                date, desc, bal = m.group(1), m.group(2).strip(), m.group(4).strip()
            else:
                date, rest = m.group(1), m.group(2).strip()
                bm = re.search(r"([\d\.,]+\s*[DC]?)\s*$", rest)
                if bm:
                    bal = bm.group(1).strip()
                    desc = rest.rsplit(bal, 1)[0].strip()
                else:
                    desc, bal = rest, "Não identificado"
            if any(w in desc for w in skip_words):
                continue  # reference quirk: tries the NEXT pattern
            rows.append({"Data": date, "Histórico": desc, "Saldo": bal})
            break
    if not rows:
        return None
    df = pd.DataFrame(rows)
    try:
        df["Data"] = df["Data"].apply(lambda x: datetime.strptime(x, strp))
    except Exception:
        pass  # any bad date → whole column stays strings (:243-247)

    def clean_val(v):
        try:
            cleaned = re.sub(r"[^\d\.,\-+CD]", "", v)
            is_debit = "D" in v or "-" in v
            cleaned = cleaned.replace("D", "").replace("C", "")
            if "," in cleaned and "." in cleaned:
                cleaned = cleaned.replace(".", "").replace(",", ".")
            elif "," in cleaned:
                cleaned = cleaned.replace(",", ".")
            val = float(cleaned)
            if is_debit and val > 0:
                val = -val
            return val
        except Exception:
            return None

    df["Saldo"] = df["Saldo"].apply(clean_val)
    df = df[["Data", "Histórico", "Saldo"]]
    return _csv_bytes(df, quoting=csv_mod.QUOTE_NONNUMERIC)


def oracle_ofx(text: str, html: bytes) -> bytes | None:
    """Mirrors conversor_ofx.py:29-50 behavior on well-formed OFX: TRNAMT
    decimal pre-fix (:39), per-transaction (date, memo, amount) rows; the
    XLSX sheet is recast as our logical-rows CSV (sep=';', utf-8-sig)."""
    from datetime import datetime
    from decimal import Decimal

    fixed = re.sub(r"(<TRNAMT>)(-?[\d]+)\.(\d{2})", r"\1\2,\3", text)
    rows = []
    for block in re.findall(r"<STMTTRN>(.*?)</STMTTRN>", fixed, flags=re.DOTALL):
        dt = re.search(r"<DTPOSTED>(\d{8})", block)
        amt = re.search(r"<TRNAMT>(-?[\d,]+)", block)
        memo = re.search(r"<MEMO>([^\r\n<]*)", block)
        if not (dt and amt):
            continue
        date = datetime.strptime(dt.group(1), "%Y%m%d").strftime("%d/%m/%Y")
        amount = Decimal(amt.group(1).replace(",", "."))
        rows.append([date, memo.group(1).strip() if memo else "", str(amount)])
    if not rows:
        return None
    return _csv_bytes(pd.DataFrame(rows, columns=["Data", "Descrição", "Valor"]), sep=";")


_WP_ANCHOR = re.compile(r"https?://\S+")


def oracle_webpage(text: str, html: bytes) -> bytes | None:
    """Independent re-derivation of boilerpipe's NumWordsRulesClassifier
    (Kohlschuetter et al., WSDM 2010 — published thresholds) + plain-text
    rendering: blank-line blocks, (words, link-density) shallow features
    with prev/next context, content blocks rejoined with a blank line.
    All-boilerplate pages yield b'' (the profile always writes bytes)."""
    feats = []
    for idx, block in enumerate(re.split(r"\n{2,}", text)):
        if block.strip(" ") == "":  # mirror Spark trim: spaces only
            continue
        squeezed = re.sub(r"\s+", " ", block).strip(" ")
        n_words = 0 if squeezed == "" else len(squeezed.split(" "))
        n_anchor = len(_WP_ANCHOR.findall(block))
        ld = 0.0 if n_words == 0 else n_anchor / n_words
        feats.append((block, n_words, ld))
    kept = []
    for i, (block, nw, ld) in enumerate(feats):
        prev_w, prev_ld = (feats[i - 1][1], feats[i - 1][2]) if i else (0, 0.0)
        next_w = feats[i + 1][1] if i + 1 < len(feats) else 0
        if ld > 0.333333:
            keep = False
        elif prev_ld <= 0.555556:
            keep = nw > 16 or next_w > 15 or prev_w > 4
        else:
            keep = nw > 40 or next_w > 17
        if keep:
            kept.append(block)
    return "\n\n".join(kept).encode("utf-8")


_JT_STOP_EN = set(
    "the a an of and to in is it that for on with as at this by from or be".split()
)
_JT_LINK = re.compile(r"https?://\S+")


def _jt_neighbour(i, classes, ignore_neargood, inc, boundary):
    while i + inc != boundary:
        i += inc
        c = classes[i]
        if c in ("good", "bad"):
            return c
        if c == "neargood" and not ignore_neargood:
            return c
    return "bad"


def oracle_webjt(text: str, html: bytes) -> bytes | None:
    """Independent re-derivation of jusText (Pomikalek 2011, published
    defaults, no headings in a plain text-layer block frame): blank-line
    blocks, length/stopword-density/link-density context-free classes,
    then the sequential short + neargood neighbour revisions; good
    blocks rejoined with a blank line (b'' when none survive)."""
    blocks = [
        b for b in re.split(r"\n{2,}", text) if b.strip(" ") != ""
    ]
    cf = []
    for b in blocks:
        squeezed = re.sub(r"\s+", " ", b.lower()).strip(" ")
        words = [] if squeezed == "" else squeezed.split(" ")
        n_stop = sum(1 for w in words if w in _JT_STOP_EN)
        stop_density = n_stop / len(words) if words else 0.0
        link_chars = sum(len(m) for m in _JT_LINK.findall(b))
        length = len(b)
        link_density = link_chars / length if length else 0.0
        if link_density > 0.2:
            cf.append("bad")
        elif "©" in b or "&copy" in b:
            cf.append("bad")
        elif length < 70:
            cf.append("bad" if link_chars > 0 else "short")
        elif stop_density >= 0.32:
            cf.append("good" if length > 200 else "neargood")
        elif stop_density >= 0.30:
            cf.append("neargood")
        else:
            cf.append("bad")
    classes = list(cf)
    n = len(classes)
    new = {}
    for i in range(n):
        if classes[i] != "short":
            continue
        prev = _jt_neighbour(i, classes, True, -1, -1)
        nxt = _jt_neighbour(i, classes, True, 1, n)
        pair = {prev, nxt}
        if pair == {"good"}:
            new[i] = "good"
        elif pair == {"bad"}:
            new[i] = "bad"
        elif (prev == "bad" and _jt_neighbour(i, classes, False, -1, -1) == "neargood") or (
            nxt == "bad" and _jt_neighbour(i, classes, False, 1, n) == "neargood"
        ):
            new[i] = "good"
        else:
            new[i] = "bad"
    for i, c in new.items():
        classes[i] = c
    for i in range(n):
        if classes[i] != "neargood":
            continue
        prev = _jt_neighbour(i, classes, True, -1, -1)
        nxt = _jt_neighbour(i, classes, True, 1, n)
        classes[i] = "bad" if (prev, nxt) == ("bad", "bad") else "good"
    kept = [b for b, c in zip(blocks, classes) if c == "good"]
    return "\n\n".join(kept).encode("utf-8")


ORACLES = {
    "banestes": oracle_banestes,
    "pagbank": oracle_pagbank,
    "cef": oracle_cef,
    "inter": oracle_inter,
    "bbmod1": oracle_bbmod1,
    "bbmod2": oracle_bbmod2,
    "sicoob1": oracle_sicoob1,
    "sicoob2": oracle_sicoob2,
    "c6": oracle_c6,
    "santander": oracle_santander,
    "caixa": oracle_caixa,
    "ofx": oracle_ofx,
    "bradesco": oracle_bradesco,
    "stone": oracle_stone,
    "itau": oracle_itau,
    "webpage": oracle_webpage,
    "webjt": oracle_webjt,
}


def golden(profile: str, text: str, html: bytes) -> bytes | None:
    return ORACLES[profile](text, html)
