"""Deterministic synthetic page corpus (FIXTURES.md §1-2).

Generates the ``pages`` table ``(url, warc_ts, html:binary, text, lang)``
with per-profile bank-statement layouts encoded in the text layer (and, for
layout profiles, positioned words in the block-markup ``html``). Everything
is seeded per (seed, profile, doc_id) — the same doc_id always produces the
same bytes, on any worker, in any order — which is what makes golden tests,
checkpoint-resume tests, and two-parallelism bench runs comparable.

Scale path: `synth_spark` fans generation out over executors with
`mapInPandas`, so building the bench corpus is itself a distributed job.
Host names are Zipf-skewed (FIXTURES.md: s=1.3 over 50 hosts) so host-level
skew is real and the url-hash salt stage is observable.
"""

from __future__ import annotations

import datetime as dt
import random
from collections.abc import Iterator

import pandas as pd

from pdf_table_extractor_spark.markup import Ruling, Word, render

EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)

# Deterministic vocabulary. Debit keywords match the reference's lists
# (conversor_banestes.py:73 — 'Pix Enviado', 'Pagamento', 'Tarifa', 'Cesta').
DESC_CREDIT = [
    "Pix Recebido Loja Azul", "Deposito Online", "TED Recebida Cliente",
    "Credito Vendas", "Rendimento Poupanca", "Estorno Compra",
]
DESC_DEBIT = [
    "Pix Enviado Mercado Verde", "Pagamento Boleto Energia", "Tarifa Manutencao",
    "Cesta Servicos Mensal", "Pagamento Fornecedor; Lote 2",
]
NOISE_LINES = [
    "Extrato gerado eletronicamente", "Central de atendimento 0800 000 000",
    "Ouvidoria das 9h as 18h", "Pagina de informacoes gerais",
]
PT_MONTH_NAMES = [
    "Janeiro", "Fevereiro", "Março", "Abril", "Maio", "Junho",
    "Julho", "Agosto", "Setembro", "Outubro", "Novembro", "Dezembro",
]


def _br_amount(rng: random.Random, lo: int = 100, hi: int = 900_000) -> str:
    """Random money text '1.234,56' (US-format f-string with swapped seps)."""
    cents = rng.randrange(lo, hi)
    us = f"{cents / 100:,.2f}"
    return us.replace(",", "@").replace(".", ",").replace("@", ".")


def _host(rng: random.Random, n_hosts: int = 50, s: float = 1.3) -> int:
    """Zipf-skewed host index."""
    weights = [1.0 / (i + 1) ** s for i in range(n_hosts)]
    return rng.choices(range(n_hosts), weights=weights, k=1)[0]


# ---------------------------------------------------------------------------
# Per-profile document generators.
# Each returns (lines, words, rulings, pages): `lines` is the flat text
# layer; `words`/`rulings` only for layout profiles (else a trivial layout
# is synthesized so `html` is always well-formed markup).
# ---------------------------------------------------------------------------

def gen_banestes(rng: random.Random):
    """Positional layout (conversor_banestes.py): date zone x<75, value zone
    x>480, description between; day-only dates carried forward; 'Lançamento'
    header rows skipped; value text concatenated from zone words."""
    words: list[Word] = []
    lines: list[str] = []
    n_pages = rng.randint(1, 3)
    for page_no in range(1, n_pages + 1):
        top = 40.0
        # header row lands in the desc zone → exercises the skip branch
        words += [
            Word(page_no, 20, 45, top + 0.1, top + 9, "Data"),
            Word(page_no, 120, 190, top + 0.2, top + 9, "Lançamento"),
            Word(page_no, 500, 540, top + 0.1, top + 9, "Valor"),
        ]
        lines.append("Data Lançamento Valor")
        top += 12.0
        for _ in range(rng.randint(4, 40)):
            kind = rng.random()
            line_words: list[Word] = []
            if kind < 0.18:
                # bare day marker — sets the carried day, emits no row
                day = f"{rng.randint(1, 28):02d}"
                line_words.append(Word(page_no, 25, 40, top + 0.1, top + 9, day))
            else:
                if rng.random() < 0.55:
                    day = f"{rng.randint(1, 28):02d}"
                    line_words.append(Word(page_no, 25, 40, top + 0.1, top + 9, day))
                debit = rng.random() < 0.4
                desc = rng.choice(DESC_DEBIT if debit else DESC_CREDIT)
                x = 90.0
                for tok in desc.split(" "):
                    line_words.append(
                        Word(page_no, x + rng.uniform(-1.0, 1.0), x + 8 * len(tok), top + 0.2, top + 9, tok)
                    )
                    x += 8 * len(tok) + 5
                if rng.random() < 0.9:
                    amt = _br_amount(rng)
                    line_words.append(Word(page_no, 500, 500 + 6 * len(amt), top + 0.1, top + 9, amt))
            words += line_words
            lines.append(" ".join(w.text for w in sorted(line_words, key=lambda w: w.x0)))
            top += 12.0
    return lines, words, [], [(i, 595, 842) for i in range(1, n_pages + 1)]


def gen_pagbank(rng: random.Random):
    """Whole-doc regex profile (conversor_pagbank.py:38): dated lines with an
    R$ value, noise lines interleaved."""
    lines: list[str] = []
    for _ in range(rng.randint(8, 60)):
        if rng.random() < 0.25:
            lines.append(rng.choice(NOISE_LINES))
        else:
            d = f"{rng.randint(1, 28):02d}/{rng.randint(1, 12):02d}/{rng.choice([2023, 2024])}"
            desc = rng.choice(DESC_CREDIT + DESC_DEBIT).replace(";", "")
            sign = "-" if rng.random() < 0.3 else ""
            rs = rng.choice(["R$ ", "R$", "$ "])
            lines.append(f"{d} {desc} {sign}{rs}{_br_amount(rng)}")
    return lines, None, [], None


def gen_cef(rng: random.Random):
    """Token-split profile (conversor_cef.py:24-32): first token = date,
    last = value, middle = description."""
    lines: list[str] = []
    for _ in range(rng.randint(6, 50)):
        r = rng.random()
        if r < 0.2:
            lines.append(rng.choice(NOISE_LINES))
        elif r < 0.27:
            # date mid-line: reference still takes token[0] as Data
            d = f"{rng.randint(1, 28):02d}/{rng.randint(1, 12):02d}/2024"
            lines.append(f"SALDO EM {d} {_br_amount(rng)}")
        else:
            d = f"{rng.randint(1, 28):02d}/{rng.randint(1, 12):02d}/{rng.choice([2023, 2024])}"
            desc = rng.choice(DESC_CREDIT + DESC_DEBIT).replace(";", "")
            sign = rng.choice(["", "-"])
            lines.append(f"{d} {desc} {sign}{_br_amount(rng)}")
    return lines, None, [], None


def gen_inter(rng: random.Random):
    """Month-name date headers + R$ value lines (conversor_inter.py)."""
    lines: list[str] = []
    year = rng.choice([2023, 2024])
    for _ in range(rng.randint(3, 12)):
        day = rng.randint(1, 28)
        month = rng.choice(PT_MONTH_NAMES)
        lines.append(f"{day} de {month} de {year}")
        for _ in range(rng.randint(0, 6)):
            if rng.random() < 0.2:
                lines.append(rng.choice(NOISE_LINES))
            else:
                desc = rng.choice(DESC_CREDIT + DESC_DEBIT).replace(";", "")
                if rng.random() < 0.15:
                    desc = f'"{desc}"'
                sign = "-" if rng.random() < 0.35 else ""
                lines.append(f"{desc} {sign}R$ {_br_amount(rng)}")
    return lines, None, [], None


def gen_bbmod1(rng: random.Random):
    """Buffer-until-value record assembly (conversor_bbmod1.py:64-103):
    dated line opens a record, description lines accumulate until a
    '1.234,56 (+)' value closes it; skip-words and orphan lines interleave."""
    lines = [
        "Extrato de Conta Corrente",
        "Cliente ACME LTDA",
        "Agência: 1234-5",
        "SALDO ANTERIOR",
    ]
    for _ in range(rng.randint(3, 30)):
        d = f"{rng.randint(1, 28):02d}/{rng.randint(1, 12):02d}/{rng.choice(['2024', '24'])}"
        docnum = f"{rng.randint(1, 999)} {rng.choice(['A1B2', '77', 'XZ9'])} " if rng.random() < 0.5 else ""
        desc = rng.choice(DESC_CREDIT + DESC_DEBIT).replace(";", "")
        sign = rng.choice(["(+)", "(-)", "( + )", "( - )"])
        amt = _br_amount(rng) if rng.random() > 0.05 else "0,00"
        n_cont = rng.randint(0, 3)
        if n_cont == 0:
            lines.append(f"{d} {docnum}{desc} {amt} {sign}")
        else:
            lines.append(f"{d} {docnum}{desc}")
            for j in range(n_cont - 1):
                lines.append(f"continuacao pedido {rng.randint(1, 99)}")
            lines.append(f"referencia final {amt} {sign}")
        if rng.random() < 0.25:
            lines.append(rng.choice(["Histórico", "SALDO EM CONTA", "Total Aplicações"]))
        if rng.random() < 0.15:
            lines.append("linha orfa ignorada apos fechamento")
    if rng.random() < 0.3:
        lines.append(f"{rng.randint(1, 28):02d}/01/2024 registro sem valor final")
    return lines, None, [], None


def gen_bbmod2(rng: random.Random):
    """Dated-line-flush accumulation (conversor_bbmod2.py:36-65): value
    '1.234,56 C' sits on the dated line (first of possibly several), extra
    description lines follow until the next dated line."""
    lines = ["Extrato BB Modelo 2", "Lançamentos do periodo"]
    for _ in range(rng.randint(3, 30)):
        d = f"{rng.randint(1, 28):02d}/{rng.randint(1, 12):02d}/{rng.choice(['2024', '24'])}"
        desc = rng.choice(DESC_CREDIT + DESC_DEBIT).replace(";", "")
        cd = rng.choice(["C", "D"])
        r = rng.random()
        if r < 0.12:
            lines.append(f"{d} Saldo Anterior {_br_amount(rng)} {cd}")
        elif r < 0.2:
            lines.append(f"{d} {desc}")  # no value → Valor 0.0 → filtered
        elif r < 0.3:
            lines.append(
                f"{d} {desc} {_br_amount(rng)} {cd} {_br_amount(rng)} {rng.choice('CD')}"
            )
        else:
            lines.append(f"{d} {desc} {_br_amount(rng)} {cd}")
        for _ in range(rng.randint(0, 2)):
            if rng.random() < 0.3:
                lines.append(rng.choice(["Histórico", "SALDO PARCIAL", "G336"]))
            else:
                lines.append(f"complemento {rng.randint(100, 999)}")
    return lines, None, [], None


def gen_sicoob1(rng: random.Random):
    """Per-line '1.234,56D' EOL values with date carry
    (conversor_sicoobmod1.py): docnum token stripped from description."""
    lines = ["EXTRATO CONTA CORRENTE", "Cooperativa 4321"]
    for _ in range(rng.randint(4, 35)):
        d = f"{rng.randint(1, 28):02d}/{rng.randint(1, 12):02d}/2024"
        desc = rng.choice(DESC_CREDIT + DESC_DEBIT).replace(";", "")
        cd = rng.choice(["C", "D"])
        r = rng.random()
        if r < 0.12:
            lines.append(f"SALDO DO DIA {_br_amount(rng)}{cd}")
        elif r < 0.2:
            lines.append(d)  # bare date line, just updates the carry
        elif r < 0.45:
            # carried-date line: docnum + desc + value, no date
            lines.append(f"{rng.randint(100000, 999999)} {desc} {_br_amount(rng)}{cd}")
        else:
            lines.append(f"{d} {rng.randint(100000, 999999)} {desc} {_br_amount(rng)}{cd}")
    return lines, None, [], None


def gen_sicoob2(rng: random.Random):
    """Block-split profile (conversor_sicoobmod2.py): year from PERÍODO
    header, section trims, blocks split before dd/mm, 1-3 line blocks."""
    year = rng.choice([2023, 2024])
    lines = [
        "COOPERATIVA SICOOB",
        f"PERÍODO: 01/02/{year} A 28/02/{year}",
        "dados cadastrais diversos",
        "HISTÓRICO DE MOVIMENTAÇÃO",
        f"SALDO ANTERIOR {_br_amount(rng)} C",
    ]
    for _ in range(rng.randint(3, 25)):
        d = f"{rng.randint(1, 28):02d}/{rng.randint(1, 12):02d}"
        desc = rng.choice(DESC_CREDIT + DESC_DEBIT).replace(";", "").upper()
        cd = rng.choice(["C", "D"])
        toks = desc.split(" ")
        if rng.random() < 0.5 and len(toks) > 1:
            k = rng.randint(1, len(toks) - 1)
            lines.append(f"{d} {' '.join(toks[:k])}")
            lines.append(f"{' '.join(toks[k:])}  {_br_amount(rng)} {cd}")
        else:
            lines.append(f"{d} {desc} {_br_amount(rng)} {cd}")
        if rng.random() < 0.2:
            lines.append(f"SALDO DO DIA {_br_amount(rng)} C")
    lines += ["RESUMO", "totais do periodo 99.999,99"]
    return lines, None, [], None


def gen_c6(rng: random.Random):
    """Year sniff + dd/mm carry + EOL R$ values (conversor_c6.py); exact
    duplicate rows injected to exercise drop_duplicates."""
    year = rng.choice([2023, 2024])
    month_name = rng.choice(PT_MONTH_NAMES)
    lines = [
        f"Período 1 de {month_name} de {year}",
        "Data Lançamento Valor",
    ]
    prev = None
    for _ in range(rng.randint(4, 30)):
        d = f"{rng.randint(1, 28):02d}/{rng.randint(1, 12):02d}"
        desc = rng.choice(DESC_CREDIT + DESC_DEBIT).replace(";", "")
        sign = "-" if rng.random() < 0.35 else ""
        r = rng.random()
        if r < 0.1:
            lines.append(f"Saldo do dia R$ {_br_amount(rng)}")
        elif r < 0.18:
            lines.append("32/13 data invalida aqui")  # month 13 → no carry
        elif r < 0.3:
            lines.append(d)  # bare valid date
        else:
            line = f"{d} {desc} {sign}R$ {_br_amount(rng)}"
            lines.append(line)
            prev = line
        if prev and rng.random() < 0.12:
            lines.append(prev)  # exact duplicate
    if rng.random() < 0.3:
        # password-protected document (conversor_c6.py:109): the whole text
        # layer is locked behind the profile's senha; the engine must
        # decrypt before parsing (functions/textops.unlock_text)
        from pdf_table_extractor_spark.plans.profiles import C6_PASSWORD

        return [_lock_text("\n".join(lines), C6_PASSWORD)], None, [], None
    return lines, None, [], None


def _lock_text(text: str, password: str) -> str:
    """Deterministic document lock: repeating-key XOR + hex behind an
    ENC1: magic (the sandbox stand-in for PDF encryption)."""
    key = password.encode("utf-8")
    data = text.encode("utf-8")
    enc = bytes(b ^ key[i % len(key)] for i, b in enumerate(data))
    return "ENC1:" + enc.hex()


SANT_DEBIT_DESCS = [
    "PAGAMENTO BOLETO FORNECEDOR", "PIX ENVIADO LOJA CENTRO", "TARIFA MENSALIDADE",
    "TRIBUTO ESTADUAL PARCELA", "TELEFONE CONTA MENSAL", "ESTORNO COMPRA CANCELADO",
]
SANT_CREDIT_DESCS = [
    "PIX RECEBIDO CLIENTE A", "TED RECEBIDA EMPRESA", "DEPOSITO CHEQUE",
    "CREDITO VENDAS CARTAO", "RESGATE POUPANCA",
]


def gen_santander(rng: random.Random):
    """Section-gated sequential profile (conversor_santander.py): preamble
    junk, 'Movimentação' start marker with header-skip paths, ≤2-line
    lookahead joins, glued docnum+value, trailing-hyphen debits."""
    lines = [
        "SANTANDER EXTRATO MENSAL",
        "Agencia 0001 Conta 12345",
        f"Saldo informativo 9.999,99",  # value in preamble: must NOT extract
    ]
    lines.append("Movimentação")
    gate = rng.random()
    if gate < 0.4:
        lines.append(f"SALDO ANTERIOR {_br_amount(rng)}")
    elif gate < 0.7:
        # direct date line after marker (data_inicio path)
        pass
    else:
        lines += ["Data Descricao Documento Valor", "cabecalho extra"]
    for _ in range(rng.randint(3, 25)):
        debit = rng.random() < 0.45
        desc = rng.choice(SANT_DEBIT_DESCS if debit else SANT_CREDIT_DESCS)
        d = f"{rng.randint(1, 28):02d}/{rng.randint(1, 12):02d}"
        if rng.random() < 0.5:
            d += f"/{rng.choice(['2024', '24'])}"
        amt = _br_amount(rng)
        hyphen = "-" if (debit and rng.random() < 0.7) else ""
        docnum = str(rng.randint(100000, 99999999))
        r = rng.random()
        if r < 0.3:
            lines.append(f"{d} {desc} {docnum} {amt}{hyphen}")
        elif r < 0.45:
            lines.append(f"{d} {desc} {docnum}{amt}{hyphen}")  # glued doc+value
        elif r < 0.7:
            toks = desc.split(" ")
            k = rng.randint(1, len(toks) - 1)
            lines.append(f"{d} {' '.join(toks[:k])}")
            lines.append(f"{' '.join(toks[k:])} {docnum} {amt}{hyphen}")
        else:
            lines.append(f"{d} {desc} {amt}{hyphen}")
        if rng.random() < 0.12:
            sd = f"{rng.randint(1, 28):02d}/{rng.randint(1, 12):02d}/2024"
            lines.append(f"SALDO EM {sd} {_br_amount(rng)}")
    lines.append("EXTRATO CONSOLIDADO")
    lines += ["informacoes finais sem numeros", "atendimento 0800"]
    return lines, None, [], None


def gen_bradesco(rng: random.Random):
    """7-stage text pipeline fixture (conversor_bradesco.py): 5 header
    lines, 3-line blocks (desc / docnum+2 values / continuation), both
    exception shapes, plain dated lines, 'Total' trailer."""
    lines = [
        "BRADESCO EXTRATO",
        "Agencia 1234",
        "Conta 56789-0",
        "Periodo 01/06/2024 a 30/06/2024",
        "Data Historico Dcto Valor Saldo",
    ]

    def num(rng):
        return _br_amount(rng, 100, 400000)

    for _ in range(rng.randint(3, 22)):
        d = f"{rng.randint(1, 28):02d}/{rng.randint(1, 12):02d}/2024"
        desc = rng.choice(DESC_CREDIT + DESC_DEBIT).replace(";", "")
        doc = rng.randint(100, 999999)
        v1 = ("-" if rng.random() < 0.4 else "") + num(rng)
        v2 = ("-" if rng.random() < 0.2 else "") + num(rng)
        shape = rng.random()
        if shape < 0.35:
            # marked 3-line block: desc / numbers / continuation
            lines.append(f"{d} {desc}")
            lines.append(f"{doc} {v1} {v2}")
            lines.append("continuacao do historico")
        elif shape < 0.55:
            # exception 1: desc+numbers line, then trailing desc line
            lines.append(f"{d} {desc} {doc} {v1} {v2}")
            lines.append("complemento posterior")
        elif shape < 0.75:
            # exception 2: bare desc line, then numbers-at-end line
            lines.append(f"{d} {desc}")
            lines.append(f"saldo parcial {doc} {v1} {v2}")
        else:
            lines.append(f"{d} {desc} {doc} {v1} {v2}")
    if rng.random() < 0.7:
        lines.append(f"Total do periodo {num(rng)}")
        lines.append("linha apos total que deve sumir")
    return lines, None, [], None


def gen_stone(rng: random.Random):
    """Lattice-table fixture (conversor_stone.py): ruled grids; cells are
    words inside grid cells; 1-3 tables per doc, headerless CSV output."""
    words: list[Word] = []
    rulings: list[Ruling] = []
    lines: list[str] = []
    n_tables = rng.randint(1, 3)
    page_no, top = 1, 60.0
    for _t in range(n_tables):
        n_cols = rng.randint(3, 5)
        n_rows = rng.randint(3, 12)
        col_w, row_h = 110.0, 18.0
        x_left = 40.0
        xs = [x_left + i * col_w for i in range(n_cols + 1)]
        ys = [top + j * row_h for j in range(n_rows + 1)]
        for x in xs:
            rulings.append(Ruling(page_no, x, x, ys[0], ys[-1]))
        for y in ys:
            rulings.append(Ruling(page_no, xs[0], xs[-1], y, y))
        for j in range(n_rows):
            row_texts = []
            for i in range(n_cols):
                r = rng.random()
                if r < 0.15:
                    cell = ""
                elif r < 0.45:
                    cell = _br_amount(rng)
                elif r < 0.6:
                    cell = f"{rng.randint(1, 28):02d}/{rng.randint(1, 12):02d}/2024"
                else:
                    cell = rng.choice(["venda cartao", "taxa stone", "repasse", "ajuste"])
                row_texts.append(cell)
                if cell:
                    cx = xs[i] + 6
                    cy = ys[j] + 4
                    for k, tok in enumerate(cell.split(" ")):
                        words.append(
                            Word(page_no, cx + k * 40, cx + k * 40 + 36, cy, cy + 10, tok)
                        )
            lines.append(" ".join(t for t in row_texts if t))
        top = ys[-1] + 40.0
        if top > 700:
            page_no += 1
            top = 60.0
    pages = [(i, 595, 842) for i in range(1, page_no + 1)]
    return lines, words, rulings, pages


# itau stream-mode geometry (fixture spec; mirrors the SHAPE of the
# reference's camelot configs Conversor.py:219 — page-1 area differs from
# later pages, 9 column x-separators → 10 bins) in markup coordinates.
ITAU_GEOM = {
    "page_1": {"area": (40, 250, 560, 800), "columns": [95, 150, 260, 310, 360, 380, 470, 505, 545]},
    "page_2_end": {"area": (40, 55, 560, 800), "columns": [95, 150, 260, 310, 360, 380, 470, 505, 545]},
}
# bin index → logical content (bins 1/4/5/8 intentionally empty → ';;'
# runs in the CSV that finalize collapses, conversor_itau.py:169-178)
# "Dçtöß" exercises the non-pt fold path (ç from the pt charset, ö from
# Latin-1 outside it, ß a 1→2 transliteration) — sanitizes to "dctoss"
ITAU_HEADER = ["Data", "", "Lançamento", "Dçtöß", "", "", "Crédito", "Débito", "", "Saldo"]
_ITAU_XPOS = {0: 45, 2: 152, 3: 315, 6: 395, 7: 472, 9: 546}


def gen_itau(rng: random.Random):
    """Stream-mode grid fixture (conversor_itau.py): per-page header row,
    empty bins, ffill-able empty dates, bfill-able credito/debito, trailing
    hyphen values, junk outside the table area."""
    words: list[Word] = []
    lines: list[str] = []
    n_pages = rng.randint(1, 3)

    def put(page, bin_idx, y, txt):
        x = _ITAU_XPOS[bin_idx]
        for k, tok in enumerate(txt.split(" ")):
            words.append(Word(page, x + k * 30, x + k * 30 + 25, y, y + 10, tok))

    for page in range(1, n_pages + 1):
        geom = ITAU_GEOM["page_1"] if page == 1 else ITAU_GEOM["page_2_end"]
        ax0, atop, ax1, abot = geom["area"]
        if page == 1:
            words.append(Word(page, 100, 200, 80, 92, "EXTRATO ITAU CONTA 1234"))
            lines.append("EXTRATO ITAU CONTA 1234")
        y = atop + 2.0
        hdr_cells = []
        for i, h in enumerate(ITAU_HEADER):
            if h:
                put(page, i, y, h)
                hdr_cells.append(h)
        lines.append(" ".join(hdr_cells))
        y += 16.0
        for _ in range(rng.randint(3, 20)):
            if y > abot - 12:
                break
            row_cells = []
            if rng.random() < 0.5:
                d = f"{rng.randint(1, 28):02d}/{rng.randint(1, 12):02d}/2024"
                put(page, 0, y, d)
                row_cells.append(d)
            desc = rng.choice(["pix qr", "ted rec", "tarifa mes", "compra deb", "rend paga"])
            put(page, 2, y, desc)
            row_cells.append(desc)
            if rng.random() < 0.6:
                doc = str(rng.randint(100, 99999))
                put(page, 3, y, doc)
                row_cells.append(doc)
            amt = _br_amount(rng)
            if rng.random() < 0.5:
                put(page, 6, y, amt)
                row_cells.append(amt)
            else:
                amt2 = amt + ("-" if rng.random() < 0.5 else "")
                put(page, 7, y, amt2)
                row_cells.append(amt2)
            if rng.random() < 0.35:
                s = _br_amount(rng) + ("-" if rng.random() < 0.3 else "")
                put(page, 9, y, s)
                row_cells.append(s)
            lines.append(" ".join(row_cells))
            y += 16.0
        words.append(Word(page, 200, 280, 820, 830, "rodape fora da area"))
        lines.append("rodape fora da area")
    return lines, words, [], [(i, 595, 842) for i in range(1, n_pages + 1)]


def gen_caixa(rng: random.Random):
    """3-pattern cascade profile (conversor_caixa.py:98-192): per-doc date
    format, code/desc/value/balance lines, skip-word headers; ~10% of docs
    carry one invalid date to exercise the string-fallback path (:243-247)."""
    fmt = rng.choice(["dmy", "iso", "dot"])

    def mkdate(day=None, month=None):
        day = day if day is not None else rng.randint(1, 28)
        month = month if month is not None else rng.randint(1, 12)
        if fmt == "dmy":
            return f"{day:02d}/{month:02d}/2024"
        if fmt == "iso":
            return f"2024-{month:02d}-{day:02d}"
        return f"{day:02d}.{month:02d}.2024"

    lines = ["Extrato Caixa", "Data Mov Histórico Valor"]
    for _ in range(rng.randint(5, 40)):
        d = mkdate()
        desc = rng.choice(DESC_CREDIT + DESC_DEBIT).replace(";", "").replace(",", "")
        cd = rng.choice(["C", "D", ""])
        r = rng.random()
        if r < 0.15:
            lines.append(f"{d} SALDO DIA {_br_amount(rng)} {cd}")
        elif r < 0.45:
            # pattern-1 shaped: date code desc value balance
            lines.append(
                f"{d} {rng.randint(100, 9999)} {desc} {_br_amount(rng)} {rng.choice('CD')} {_br_amount(rng)} {rng.choice('CD')}"
            )
        elif r < 0.75:
            lines.append(f"{d} {desc} {_br_amount(rng)} {rng.choice('CD')} {_br_amount(rng)}{cd}")
        else:
            # pattern-3 shaped: date + free text (+ maybe trailing number)
            if rng.random() < 0.5:
                lines.append(f"{d} {desc} {_br_amount(rng)}")
            else:
                lines.append(f"{d} {desc} sem valor claro")
    if rng.random() < 0.1 and fmt == "dmy":
        lines.append(f"31/02/2024 {rng.choice(DESC_CREDIT)} 10,00 C 20,00 C")
    return lines, None, [], None


def gen_ofx(rng: random.Random):
    """OFX tagged text (conversor_ofx.py): US-decimal TRNAMT values that the
    pre-fix rewrites to comma form before parsing."""
    n = rng.randint(3, 25)
    lines = [
        "OFXHEADER:100", "DATA:OFXSGML", "<OFX>", "<BANKMSGSRSV1>",
        "<STMTTRNRS>", "<STMTRS>", "<BANKTRANLIST>",
    ]
    for _ in range(n):
        y, m, d = 2024, rng.randint(1, 12), rng.randint(1, 28)
        cents = rng.randrange(100, 900000) * rng.choice([1, -1])
        memo = rng.choice(DESC_CREDIT + DESC_DEBIT).replace(";", "")
        lines += [
            "<STMTTRN>",
            f"<TRNTYPE>{'CREDIT' if cents > 0 else 'DEBIT'}",
            f"<DTPOSTED>{y}{m:02d}{d:02d}120000",
            f"<TRNAMT>{cents // 100}.{abs(cents) % 100:02d}"
            if cents > 0
            else f"<TRNAMT>-{abs(cents) // 100}.{abs(cents) % 100:02d}",
            f"<FITID>{rng.randrange(10**9)}",
            f"<MEMO>{memo}",
            "</STMTTRN>",
        ]
    lines += ["</BANKTRANLIST>", "</STMTRS>", "</STMTTRNRS>", "</BANKMSGSRSV1>", "</OFX>"]
    return lines, None, [], None


# ---------------------------------------------------------------------------
# webpage — generic Common-Crawl-style page for the boilerpipe main-content
# profile (north rule: "HTML boilerplate strip"). Blocks are blank-line
# separated; word counts and link densities are drawn to straddle every
# NumWordsRules threshold (4/16/40 words, 1/3 and 0.5556 link density) so
# the classifier's whole tree is exercised by the golden gate.
# ---------------------------------------------------------------------------

WEB_WORDS = (
    "data systems engine spark shuffle partition column vector query table "
    "stream batch cluster executor memory disk network latency throughput "
    "index scan join filter window state checkpoint snapshot commit merge "
    "page host crawl fetch parse render block token anchor layout density"
).split()

NAV_LABELS = ["home", "news", "docs", "blog", "about", "contact", "login"]


def _wp_sentence(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(WEB_WORDS) for _ in range(n))


def _wp_wrap(sent: str, width: int = 12) -> str:
    toks = sent.split(" ")
    return "\n".join(
        " ".join(toks[i : i + width]) for i in range(0, len(toks), width)
    )


def _wp_link(rng: random.Random) -> str:
    return (
        f"https://site{rng.randint(0, 99):02d}.example/"
        f"{rng.choice(NAV_LABELS)}/{rng.randint(0, 999)}"
    )


def gen_webpage(rng: random.Random):
    """Generic web page: nav / headline / paragraphs / related-links /
    footer blocks. ~6% are link-farm pages whose every block is
    boilerplate (the profile's emit-empty path)."""
    if rng.random() < 0.06:
        blocks = [
            " ".join(_wp_link(rng) for _ in range(rng.randint(2, 6)))
            for _ in range(rng.randint(2, 5))
        ]
    else:
        blocks = [
            # nav bar: links only (link density 1.0)
            " ".join(_wp_link(rng) for _ in range(rng.randint(3, 7))),
            # headline: short plain words (content iff the lead paragraph
            # is long enough — the prev_ld > 0.5556 tree branch)
            _wp_sentence(rng, rng.randint(2, 9)),
        ]
        for _ in range(rng.randint(1, 6)):
            n = rng.randint(8, 80)
            sent = _wp_sentence(rng, n)
            if rng.random() < 0.3:  # occasional inline link
                toks = sent.split(" ")
                toks[rng.randrange(len(toks))] = _wp_link(rng)
                sent = " ".join(toks)
            blocks.append(_wp_wrap(sent))
            if rng.random() < 0.25:
                # teaser/caption around the 4/16-word thresholds
                blocks.append(_wp_sentence(rng, rng.randint(3, 18)))
        if rng.random() < 0.6:
            # related links: alternating word+link lines (ld ~ 0.5)
            blocks.append(
                "\n".join(
                    f"{rng.choice(WEB_WORDS)} {_wp_link(rng)}"
                    for _ in range(rng.randint(2, 5))
                )
            )
        blocks.append(f"copyright 2024 {_wp_link(rng)} all rights reserved")
    lines: list[str] = []
    for b in blocks:
        if lines:
            lines.append("")
        lines.extend(b.split("\n"))
    return lines, None, [], None


# ---------------------------------------------------------------------------
# webjt — generic web page for the jusText main-content profile (second
# published extraction algorithm; operators/justext.py). Stopword
# densities are drawn around the published 0.30/0.32 thresholds and
# block char-lengths straddle 70/200, so the context-free chain AND the
# short/neargood neighbour revisions are all exercised by the golden
# gate; ~7% of pages are all-boilerplate (emit-empty path).
# ---------------------------------------------------------------------------

STOP_EN = (
    "the a an of and to in is it that for on with as at this by from or be"
).split()


def _wjt_sentence(rng: random.Random, n: int, stop_rate: float) -> str:
    return " ".join(
        rng.choice(STOP_EN) if rng.random() < stop_rate else rng.choice(WEB_WORDS)
        for _ in range(n)
    )


def gen_webjt(rng: random.Random):
    if rng.random() < 0.07:
        blocks = [
            " ".join(_wp_link(rng) for _ in range(rng.randint(2, 6)))
            for _ in range(rng.randint(2, 4))
        ] + [f"© {rng.randint(2019, 2025)} {_wp_link(rng)} all rights reserved"]
    else:
        blocks = [
            " ".join(_wp_link(rng) for _ in range(rng.randint(3, 6))),
            _wjt_sentence(rng, rng.randint(2, 8), 0.1),  # headline (short)
        ]
        for _ in range(rng.randint(3, 8)):
            rate = rng.choice([0.05, 0.2, 0.31, 0.38, 0.5, 0.5, 0.65])
            n = rng.choice([rng.randint(4, 30), rng.randint(30, 90)])  # straddles 70 and 200 chars
            sent = _wjt_sentence(rng, n, rate)
            if rng.random() < 0.2:  # inline link pushes link density
                toks = sent.split(" ")
                toks[rng.randrange(len(toks))] = _wp_link(rng)
                sent = " ".join(toks)
            blocks.append(_wp_wrap(sent))
            if rng.random() < 0.2:
                blocks.append(_wjt_sentence(rng, rng.randint(2, 10), 0.31))
        if rng.random() < 0.5:
            blocks.append(
                "\n".join(
                    f"{rng.choice(WEB_WORDS)} {_wp_link(rng)}"
                    for _ in range(rng.randint(2, 4))
                )
            )
        blocks.append(f"© {rng.randint(2019, 2025)} example.org")
    lines: list[str] = []
    for b in blocks:
        if lines:
            lines.append("")
        lines.extend(b.split("\n"))
    return lines, None, [], None


GENERATORS = {
    "banestes": gen_banestes,
    "pagbank": gen_pagbank,
    "cef": gen_cef,
    "inter": gen_inter,
    "bbmod1": gen_bbmod1,
    "bbmod2": gen_bbmod2,
    "sicoob1": gen_sicoob1,
    "sicoob2": gen_sicoob2,
    "c6": gen_c6,
    "santander": gen_santander,
    "caixa": gen_caixa,
    "ofx": gen_ofx,
    "bradesco": gen_bradesco,
    "stone": gen_stone,
    "itau": gen_itau,
    "webpage": gen_webpage,
    "webjt": gen_webjt,
}

NOISE_LANGS = ["en", "es", "de"]


def _trivial_layout(lines: list[str]) -> tuple[list[Word], list]:
    """Lay text lines out as one word-per-line markup (50 lines/page)."""
    words = []
    for i, line in enumerate(lines):
        page_no = i // 50 + 1
        top = 40.0 + (i % 50) * 15.0
        words.append(Word(page_no, 50, 50 + 6 * len(line), top, top + 10, line))
    return words, []


def make_doc(profile: str, doc_id: int, seed: int = 42) -> dict:
    """One deterministic document row for the pages table."""
    rng = random.Random(f"{seed}:{profile}:{doc_id}")
    host = _host(rng)
    url = f"https://host{host:03d}.example/{profile}/{doc_id:06d}"
    ts = EPOCH + dt.timedelta(seconds=137 * doc_id)
    if profile == "noise":
        lang = rng.choice(NOISE_LANGS)
        lines = [f"generic {lang} web page content line {i}" for i in range(rng.randint(3, 30))]
        words, rulings, pages = *_trivial_layout(lines), None
    else:
        lang = "pt"
        lines, words, rulings, pages = GENERATORS[profile](rng)
        if words is None:
            words, rulings = _trivial_layout(lines)
    if pages is None:
        n_pages = max((w.page_no for w in words), default=1)
        pages = [(i, 595, 842) for i in range(1, n_pages + 1)]
    html = render(pages, words, rulings)
    return {
        "url": url,
        "warc_ts": ts.replace(tzinfo=None),
        "html": html,
        "text": "\n".join(lines),
        "lang": lang,
    }


def doc_plan(n_docs: int, profiles: list[str] | None = None, noise_frac: float = 0.1):
    """Deterministic (profile, doc_id) assignment for doc_id in [0, n_docs)."""
    profiles = profiles or list(GENERATORS)
    k = 0  # independent round-robin counter so no profile aligns with the
    # noise stride (with len(profiles) == the stride they'd collide)
    for doc_id in range(n_docs):
        if noise_frac > 0 and doc_id % max(1, round(1 / noise_frac)) == 0:
            yield "noise", doc_id
        else:
            yield profiles[k % len(profiles)], doc_id
            k += 1


def synth_pandas(
    n_docs: int, seed: int = 42, profiles: list[str] | None = None, noise_frac: float = 0.1
) -> pd.DataFrame:
    rows = [make_doc(p, i, seed) for p, i in doc_plan(n_docs, profiles, noise_frac)]
    return pd.DataFrame(rows)


PAGES_SCHEMA = "url string, warc_ts timestamp_ntz, html binary, text string, lang string"


def synth_spark(spark, n_docs: int, seed: int = 42, profiles: list[str] | None = None,
                noise_frac: float = 0.1, parallelism: int = 32):
    """Distributed corpus generation: doc_ids → mapInPandas(generate)."""
    plan = list(doc_plan(n_docs, profiles, noise_frac))
    from pdf_table_extractor_spark.ship import ensure_shipped
    ensure_shipped(spark)
    plan_df = spark.createDataFrame(plan, "profile string, doc_id long").repartition(parallelism)

    def generate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield pd.DataFrame(
                [make_doc(p, int(i), seed) for p, i in zip(b["profile"], b["doc_id"])]
            )

    return plan_df.mapInPandas(generate, schema=PAGES_SCHEMA)
