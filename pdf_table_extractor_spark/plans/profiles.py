"""Extraction profiles: each reference converter's semantics as a
config-driven Spark DataFrame pipeline (SURVEY §7.1 step 4).

A profile is (builder, sink): `builder(pages_of_this_profile) -> records`
where records carry (url, <order cols>, <value cols>); `sink` drives the
byte serializer. The per-bank hardcoded constants of the reference (zone
x-thresholds, regexes, keyword lists, month maps) are data here, not code.

Regex note: the reference runs Python `re` (unicode-aware ``\\w``); Spark
compiles Java regex where ``\\w`` is ASCII-only — profiles that match
accented words (inter month names) prefix ``(?U)`` to get identical
semantics.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pdf_table_extractor_spark.functions import textops, windows
from pdf_table_extractor_spark.operators.lines import layout_lines, text_lines
from pdf_table_extractor_spark.operators.serialize import Sink, WorkbookSink


@dataclass(frozen=True)
class Profile:
    name: str
    build: Callable[[DataFrame], DataFrame]
    sink: Sink
    emit_empty: bool = False  # header-only CSV when no records
    # False for branches whose first step is an Arrow UDF (layout parse /
    # state machine): they salt AFTER the UDF since ArrowEvalPython drops
    # outputPartitioning and a pages-level exchange would be wasted.
    salt_pages: bool = True


# ---------------------------------------------------------------------------
# banestes — positioned-word zones (conversor_banestes.py:23-91)
# ---------------------------------------------------------------------------

BANESTES_DEBIT_KEYWORDS = ["Pix Enviado", "Pagamento", "Tarifa", "Cesta"]


def build_banestes(pages: DataFrame) -> DataFrame:
    lines = layout_lines(pages).withColumn("ord", F.struct("page_no", "y"))
    day = F.when(F.col("date_txt").rlike(r"^\d{2}$"), F.col("date_txt"))
    lines = lines.withColumn("day", day).withColumn(
        "day_carry",
        F.coalesce(windows.ffill(F.col("day"), ["url"], "ord"), F.lit("")),
    )
    amount = F.regexp_replace(
        F.regexp_replace("value_txt", r"[^\d,\-]", ""), ",", "."
    ).try_cast("double")
    is_debit = F.lit(False)
    for k in BANESTES_DEBIT_KEYWORDS:
        is_debit = is_debit | F.col("desc_txt").contains(k)
    return (
        lines.withColumn("amount", amount)
        .filter(
            (F.col("desc_txt") != "")
            & (F.col("value_txt") != "")
            & F.col("value_txt").rlike(r"\d")
            & ~F.lower(F.col("desc_txt")).contains("lançamento")
        )
        .withColumn(
            "valor",
            F.when(is_debit & (F.col("amount") > 0), -F.col("amount")).otherwise(
                F.col("amount")
            ),
        )
        .select(
            "url",
            "page_no",
            "y",
            F.concat(F.col("day_carry"), F.lit("/JUN/25")).alias("data"),
            F.col("desc_txt").alias("lancamento"),
            "valor",
        )
    )


# ---------------------------------------------------------------------------
# pagbank — whole-doc regex findall (conversor_pagbank.py:38)
# ---------------------------------------------------------------------------

PAGBANK_PAT = r"(\d{2}/\d{2}/\d{4})\s+(.+?)\s+(-?R?\$\s?[\d\.]+,\d{2})"


def build_pagbank(pages: DataFrame) -> DataFrame:
    # ONE full-text findall (group 0), then group recovery per ~40-char
    # match string. The previous arrays_zip(g(1), g(2), g(3)) form ran the
    # regex over the whole document 3× — and the optimizer's inferred
    # pre-Generate filter (size(ms) > 0) duplicated all three again, for 6
    # full-text scans per doc. textops.pin keeps that inferred filter on
    # the attribute. Re-matching a match string standalone yields the same
    # groups: the money tail is delimited by the exact `,\d{2}` suffix, so
    # no decomposition depends on characters past the match.
    ms = F.regexp_extract_all("text", F.lit(PAGBANK_PAT), 0)
    zipped = pages.select("url", textops.pin(ms).alias("ms")).select(
        "url", F.posexplode("ms").alias("row_no", "m")
    )
    NUL = "\x00"
    parts = F.split(F.regexp_replace("m", PAGBANK_PAT, f"$1{NUL}$2{NUL}$3"), NUL)
    zipped = zipped.withColumn("parts", parts)
    return zipped.select(
        "url",
        "row_no",
        F.try_element_at("parts", F.lit(1)).alias("data"),
        F.try_element_at("parts", F.lit(2)).alias("descricao"),
        F.try_element_at("parts", F.lit(3)).alias("valor"),
    )


# ---------------------------------------------------------------------------
# cef — token split first/middle/last (conversor_cef.py:24-32)
# ---------------------------------------------------------------------------

def build_cef(pages: DataFrame) -> DataFrame:
    lines = text_lines(pages)
    toks = F.split(F.trim(F.col("line")), r"\s+")
    return (
        lines.filter(F.col("line").rlike(r"\d{2}/\d{2}/\d{4}"))
        .withColumn("toks", toks)
        .filter(F.size("toks") > 2)
        .select(
            "url",
            "line_no",
            F.element_at("toks", 1).alias("data"),
            F.array_join(
                F.slice(F.col("toks"), 2, F.size("toks") - 2), " "
            ).alias("historico"),
            F.element_at("toks", -1).alias("valor"),
        )
    )


# ---------------------------------------------------------------------------
# inter — month-name date carry + R$ values (conversor_inter.py)
# ---------------------------------------------------------------------------

INTER_DATE_PAT = r"(?U)(\d{1,2}) de (\w+) de (\d{4})"
INTER_VALUE_PAT = r"(-?)R\$\s*(\d{1,3}(?:\.\d{3})*,\d{2})"
INTER_MONTHS = {
    "Janeiro": "01", "Fevereiro": "02", "Março": "03", "Abril": "04",
    "Maio": "05", "Junho": "06", "Julho": "07", "Agosto": "08",
    "Setembro": "09", "Outubro": "10", "Novembro": "11", "Dezembro": "12",
}


def build_inter(pages: DataFrame) -> DataFrame:
    lines = text_lines(pages)
    month_pairs = []
    for k, v in INTER_MONTHS.items():
        month_pairs += [F.lit(k), F.lit(v)]
    month_map = F.create_map(*month_pairs)
    has_date = F.col("line").rlike(INTER_DATE_PAT)
    date_str = F.concat(
        F.regexp_extract("line", INTER_DATE_PAT, 1),
        F.lit("/"),
        F.coalesce(
            F.element_at(month_map, F.regexp_extract("line", INTER_DATE_PAT, 2)),
            F.lit("00"),
        ),
        F.lit("/"),
        F.regexp_extract("line", INTER_DATE_PAT, 3),
    )
    lines = lines.withColumn("date_here", F.when(has_date, date_str)).withColumn(
        "data",
        F.coalesce(
            windows.ffill(F.col("date_here"), ["url"], "line_no"), F.lit("01/01/2000")
        ),
    )
    has_value = F.col("line").rlike(INTER_VALUE_PAT)
    vstart = F.regexp_instr("line", F.lit(INTER_VALUE_PAT))
    historico = F.translate(
        F.trim(F.substr(F.col("line"), F.lit(1), vstart - 1)), "\"'", ""
    )
    valor = F.concat(
        F.regexp_extract("line", INTER_VALUE_PAT, 1),
        F.regexp_replace(
            F.regexp_extract("line", INTER_VALUE_PAT, 2), r"\.(?=\d{3},)", ""
        ),
    )
    return (
        lines.filter(has_value)
        .select("url", "line_no", "data", historico.alias("historico"), valor.alias("valor"))
    )


# ---------------------------------------------------------------------------
# bbmod1 — buffer-until-value record assembly (conversor_bbmod1.py:37-108)
# via cumulative-sum segmentation + ordered-concat aggregation
# ---------------------------------------------------------------------------

BB1_START = r"^\d{2}/\d{2}/\d{2,4}"
BB1_END = r"([\d\.,\s]+\(\s*[-+]\s*\))$"
BB1_INNER = r"([\d\.,]+)\s*\(\s*([+-])\s*\)"
BB1_SKIP = (
    r"(?i)^(Lançamentos|Histórico|Saldo Anterior|Dia\s+Lote|Extrato de Conta Corrente"
    r"|Cliente\s|Agência:|Total Aplicações|Informações Adicionais|SALDO"
    r"|Informações Complementares)"
)


def _ordered_join(piece_struct: str = "line_no", piece: str = "piece") -> "F.Column":
    """concat pieces in line order: array_join(sorted collect_list)."""
    return F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct(piece_struct, piece))),
            lambda x: x[piece],
        ),
        " ",
    )


def build_bbmod1(pages: DataFrame) -> DataFrame:
    lines = (
        text_lines(pages)
        .withColumn("line", F.trim("line"))
        .filter((F.col("line") != "") & ~F.col("line").rlike(BB1_SKIP))
    )
    is_start = F.col("line").rlike(BB1_START)
    lines = lines.withColumn("is_start", is_start).withColumn(
        "seg", windows.segment_id(is_start, ["url"], "line_no")
    ).filter(F.col("seg") >= 1)
    # completion = first line in the segment carrying the '(±)' value at EOL;
    # lines after it were consumed by the reset buffer → dropped.
    is_end = F.col("line").rlike(BB1_END.rstrip("$") + "$")
    wseg = Window.partitionBy("url", "seg")
    lines = (
        lines.withColumn("end_ln", F.min(F.when(is_end, F.col("line_no"))).over(wseg))
        .filter(F.col("end_ln").isNotNull() & (F.col("line_no") <= F.col("end_ln")))
    )
    piece = F.when(
        F.col("is_start"),
        F.regexp_replace(
            F.trim(F.regexp_replace("line", BB1_START, "")), r"^\s*\d+\s+[\d\w]+\s*", ""
        ),
    ).otherwise(F.col("line"))
    recs = (
        lines.withColumn("piece", piece)
        .groupBy("url", "seg")
        .agg(
            F.max(F.when(F.col("is_start"), F.regexp_extract("line", BB1_START, 0))).alias("data"),
            F.min("line_no").alias("rec_ln"),
            _ordered_join().alias("joined"),
        )
    )
    val_txt = F.regexp_extract("joined", BB1_END, 1)
    num = F.regexp_extract(val_txt, BB1_INNER, 1)
    sign = F.regexp_extract(val_txt, BB1_INNER, 2)
    amount = F.trim(F.regexp_replace(F.translate(num, ".", ""), ",", ".")).try_cast("double")
    valor = F.when(sign == "-", -amount).otherwise(amount)
    desc = textops.squeeze_ws(F.regexp_replace("joined", BB1_END, ""))
    return (
        recs.withColumn("valor", textops.pin(F.coalesce(valor, F.lit(0.0))))
        .withColumn("lancamento", desc)
        .filter(F.col("valor") != 0.0)
        .select("url", "rec_ln", "data", "lancamento", "valor")
    )


# ---------------------------------------------------------------------------
# bbmod2 — dated-line-flush accumulation (conversor_bbmod2.py:24-73)
# ---------------------------------------------------------------------------

BB2_VALUE = r"([\d\.,]+\s[CD])"
BB2_SKIP = r"(Lançamentos|Histórico|Saldo Anterior|SALDO|G336)"


def build_bbmod2(pages: DataFrame) -> DataFrame:
    lines = text_lines(pages)
    is_start = F.col("line").rlike(BB1_START)
    lines = (
        lines.withColumn("is_start", is_start)
        .withColumn("seg", windows.segment_id(is_start, ["url"], "line_no"))
        .filter(F.col("seg") >= 1)
        .filter(F.col("is_start") | ~F.col("line").rlike(BB2_SKIP))
    )
    date_tok = F.element_at(F.split("line", r"\s+"), 1)
    values = F.regexp_extract_all("line", F.lit(BB2_VALUE), 1)
    desc0 = F.trim(F.substr("line", F.length(date_tok) + 1))
    desc0 = F.aggregate(
        values, desc0, lambda acc, v: F.trim(F.replace(acc, v, F.lit("")))
    )
    piece = F.when(F.col("is_start"), desc0).otherwise(F.trim("line"))
    recs = (
        lines.withColumn("piece", piece)
        .withColumn("date_tok", F.when(F.col("is_start"), date_tok))
        .withColumn("vs", F.when(F.col("is_start") & (F.size(values) > 0), F.element_at(values, 1)))
        .groupBy("url", "seg")
        .agg(
            F.max("date_tok").alias("data"),
            F.max("vs").alias("vs"),
            F.min("line_no").alias("rec_ln"),
            _ordered_join().alias("joined"),
        )
    )
    num = F.regexp_extract("vs", r"([\d\.,]+)\s*([CD])", 1)
    cd = F.regexp_extract("vs", r"([\d\.,]+)\s*([CD])", 2)
    amount = F.trim(F.regexp_replace(F.translate(num, ".", ""), ",", ".")).try_cast("double")
    valor = F.coalesce(F.when(cd == "D", -amount).otherwise(amount), F.lit(0.0))
    return (
        recs.withColumn("valor", textops.pin(valor))
        .withColumn("lancamento", textops.pin(textops.squeeze_ws(F.col("joined"))))
        .filter(~F.col("lancamento").contains("Saldo Anterior") & (F.col("valor") != 0.0))
        .select("url", "rec_ln", "data", "lancamento", "valor")
    )


# ---------------------------------------------------------------------------
# sicoob1 — EOL C/D values with date carry (conversor_sicoobmod1.py:9-77)
# ---------------------------------------------------------------------------

SIC1_DATE = r"^(\d{2}/\d{2}/\d{4})"
SIC1_VALUE = r"([\d\.,]+)([CD])$"


def build_sicoob1(pages: DataFrame) -> DataFrame:
    lines = text_lines(pages).filter(
        ~F.col("line").contains("SALDO ANTERIOR")
        & ~F.col("line").contains("SALDO DO DIA")
        & ~F.col("line").contains("EXTRATO CONTA CORRENTE")
    )
    date_here = F.nullif(F.regexp_extract("line", SIC1_DATE, 1), F.lit(""))
    lines = lines.withColumn("date_here", date_here).withColumn(
        "data", windows.ffill(F.col("date_here"), ["url"], "line_no")
    )
    stripped = F.trim("line")
    vstart = F.regexp_instr(stripped, F.lit(SIC1_VALUE))
    has_value = F.col("line").rlike(SIC1_VALUE)
    lanc = F.trim(F.substr(stripped, F.lit(1), vstart - 1))
    lanc = F.when(
        F.col("date_here").isNotNull(), F.trim(F.substr(lanc, F.length("date_here") + 1))
    ).otherwise(lanc)
    lanc = F.regexp_replace(lanc, r"^\S+\s", "")
    body = F.translate(F.regexp_extract(stripped, SIC1_VALUE, 1), ".", "")
    valor = F.when(
        F.regexp_extract(stripped, SIC1_VALUE, 2) == "D", F.concat(F.lit("-"), body)
    ).otherwise(body)
    return (
        lines.withColumn("lancamento", textops.pin(F.trim(lanc)))
        .withColumn("has_value", textops.pin(has_value))
        .filter(F.col("has_value") & F.col("data").isNotNull() & (F.col("lancamento") != ""))
        .select("url", "line_no", "data", "lancamento", valor.alias("valor"))
    )


# ---------------------------------------------------------------------------
# sicoob2 — section trims + block split before dd/mm (conversor_sicoobmod2.py)
# ---------------------------------------------------------------------------

SIC2_VALUE = r"(\d{1,3}(?:\.\d{3})*,\d{2}|\d+,\d{2}|\d+\.\d{2})\s*([CD])"


def build_sicoob2(pages: DataFrame) -> DataFrame:
    year = F.regexp_extract("text", r"PERÍODO: \d{2}/\d{2}/(\d{4})", 1)
    year = F.when(year != "", year).otherwise(F.lit("1900"))
    # substring_index(..., -1) == regexp_replace(r"(?s).*DELIM", ""): text
    # after the LAST literal occurrence, whole text when absent — but a
    # linear literal scan instead of a leading-greedy dot-all regex that
    # backtracks at every char (measured 14.8s → ~0.3s over 48k docs).
    t = F.substring_index("text", "HISTÓRICO DE MOVIMENTAÇÃO\n", -1)
    t = F.regexp_replace(t, r"(?s)SALDO ANTERIOR.*?\n", "")
    t = F.regexp_replace(t, r"(?s)\nRESUMO.*", "")
    blocks = pages.select(
        "url",
        year.alias("year"),
        F.posexplode(F.split(F.trim(t), r"\n(?=\d{2}/\d{2})")).alias("block_no", "block"),
    )
    flat = F.trim(F.regexp_replace(F.trim(F.regexp_replace("block", r"\n", " ")), r"\s{2,}", " "))
    # textops.pin: the SALDO filter (and every later filter conjunct) would
    # otherwise push below this projection and re-inline the normalization
    # chain per conjunct (measured: 48 regexp_replace copies in the plan).
    blocks = blocks.withColumn("flat", textops.pin(flat)).filter(
        ~F.col("flat").contains("SALDO DO DIA")
    )
    # Evaluate the (unanchored, alternation-heavy) value regex ONCE per
    # block and re-match the groups on the ~15-char result instead of the
    # whole block: SIC2_VALUE over digit-dense text backtracks at every
    # position, and the naive form ran it 4× per block (rlike + 3 group
    # extracts) — this cut the branch from 23.9s to <converted> on the
    # 48k-doc bench slice. First-match semantics are identical.
    blocks = blocks.withColumn(
        "vfull", textops.pin(F.regexp_extract("flat", SIC2_VALUE, 0))
    )
    has_val = F.col("vfull") != ""
    has_date = F.col("flat").rlike(r"^\d{2}/\d{2}")
    vfull = F.col("vfull")
    vnum = F.regexp_extract("vfull", SIC2_VALUE, 1)
    vcd = F.regexp_extract("vfull", SIC2_VALUE, 2)
    desc = F.trim(F.regexp_replace("flat", r"^\d{2}/\d{2}\s*", ""))
    desc = F.trim(textops.remove_first_literal(desc, vfull))
    desc = F.trim(F.regexp_replace(desc, r"\s{2,}", " "))
    amount = F.regexp_replace(F.translate(vnum, ".", ""), ",", ".").try_cast("double")
    valor = F.when(vcd == "D", -amount).otherwise(amount)
    data = F.concat(F.regexp_extract("flat", r"^(\d{2}/\d{2})", 1), F.lit("/"), F.col("year"))
    return (
        blocks.filter(has_val & has_date)
        .withColumn("lancamento", textops.pin(desc))
        .filter(F.col("lancamento") != "")
        .select("url", "block_no", data.alias("data"), "lancamento", valor.alias("valor"))
    )


# ---------------------------------------------------------------------------
# c6 — year sniff + dd/mm carry + EOL R$ values (conversor_c6.py)
# ---------------------------------------------------------------------------

C6_TXN = r"^(.*?)\s+(-?R\$\s?[\d\.,]+)$"


# Per-profile document password (conversor_c6.py:109: the GUI collects a
# `senha` per file and hands it to the PDF reader). Config data, not code —
# a deployment maps url patterns → passwords the same way.
C6_PASSWORD = "c6-senha-2024"


def build_c6(pages: DataFrame) -> DataFrame:
    # decrypt BEFORE any parsing — locked docs carry an ENC1: payload
    pages = pages.withColumn("text", textops.unlock_text(F.col("text"), C6_PASSWORD))
    year = F.coalesce(
        F.nullif(F.regexp_extract("text", r"(?U)Período \d{1,2} de \w+ de (\d{4})", 1), F.lit("")),
        F.nullif(F.regexp_extract("text", r"(?U)exportado no dia \d{1,2} de \w+ de (\d{4})", 1), F.lit("")),
    )
    pages = pages.withColumn("year", textops.pin(year)).filter(
        F.col("year").isNotNull()
    )
    lines = pages.select(
        "url", "year", F.posexplode(F.split(F.col("text"), "\n")).alias("line_no", "line")
    ).withColumn("line", F.trim("line"))
    lines = lines.filter(
        (F.col("line") != "")
        & ~F.col("line").contains("Saldo do dia")
        & ~F.col("line").contains("Data Lançamento")
    )
    dm = F.regexp_extract("line", r"^(\d{2}/\d{2})", 1)
    day = F.substring(dm, 1, 2).try_cast("int")
    month = F.substring(dm, 4, 2).try_cast("int")
    date_here = F.when(
        (dm != "") & month.between(1, 12) & day.between(1, 31),
        F.concat(dm, F.lit("/"), F.col("year")),
    )
    lines = lines.withColumn("data", windows.ffill(date_here, ["url"], "line_no"))
    has_txn = F.col("line").rlike(C6_TXN)
    desc = F.trim(F.regexp_replace(F.trim(F.regexp_extract("line", C6_TXN, 1)), r"^\d{2}/\d{2}\s*", ""))
    val_txt = F.regexp_extract("line", C6_TXN, 2)
    body = F.regexp_replace(F.regexp_replace(val_txt, r"[^\d,]", ""), ",", ".").try_cast("double")
    amount = F.coalesce(body, F.lit(0.0))
    amount = F.when(val_txt.contains("-"), -F.abs(amount)).otherwise(amount)
    recs = (
        lines.withColumn("has_txn", textops.pin(has_txn))
        .withColumn("lancamento", textops.pin(desc))
        .withColumn("valor", textops.pin(amount))
        .filter(
            F.col("has_txn")
            & F.col("data").isNotNull()
            & (F.col("lancamento") != "")
            & (F.col("valor") != 0.0)
        )
    )
    # drop_duplicates keep-first (conversor_c6.py:94): min line_no per key
    return (
        recs.groupBy("url", "data", "lancamento", "valor")
        .agg(F.min("line_no").alias("rec_ln"))
        .select("url", "rec_ln", "data", "lancamento", "valor")
    )


# ---------------------------------------------------------------------------
# caixa — 3-pattern cascade with per-doc date-format sniff (conversor_caixa.py)
# ---------------------------------------------------------------------------

CAIXA_FMTS = [
    ("dmy", r"\d{2}/\d{2}/\d{4}", "dd/MM/yyyy"),
    ("iso", r"\d{4}-\d{2}-\d{2}", "yyyy-MM-dd"),
    ("ymd", r"\d{4}/\d{2}/\d{2}", "yyyy/MM/dd"),
    ("dot", r"\d{2}\.\d{2}\.\d{4}", "dd.MM.yyyy"),
]
CAIXA_SKIP = ["SALDO DIA", "SALDO ANTERIOR", "TOTAL", "Data Mov", "Histórico", "Valor"]


# Cascade pattern tails (group 1 = the date; conversor_caixa.py:138-185)
CAIXA_TAILS = [
    (r"\s+(\d+|\w+)\s+(.*?)\s+([\d\.,]+\s*[DC]?)\s+([\d\.,]+\s*[DC]?)", [1, 3, 5]),
    (r"\s+(.*?)\s+([\d\.,]+\s*[DC]?)\s+([\d\.,]+\s*[DC]?)", [1, 2, 4]),
    (r"(.+)", [1, 2]),
]


def _caixa_cascade(flt: DataFrame, pat_cols) -> DataFrame:
    """Add ``rec`` = (data, desc, bal) struct for the 3-pattern cascade,
    with the reference's skip-word-continues-to-next-pattern quirk
    (conversor_caixa.py:138-185).

    ``pat_cols``: the three wrapped whole-line pattern COLUMNS (the date
    regex varies per document format; data-driven patterns keep the 4-format
    dispatch out of the expression tree — see build_caixa).

    Each pattern is executed ONCE per line: a whole-line regexp_replace
    rewrites the first match to its capture groups NUL-joined (input text
    never contains NUL, so `split` recovers the groups and a 1-element
    result means no match), instead of the naive rlike + per-group
    regexp_extract (~5 executions of the same backtracking-heavy pattern).

    Structured as CHAINED PROJECTIONS, not one nested expression: every
    intermediate below is referenced several times downstream (the skip
    predicate alone reads each desc 6×), and inside a when-cascade those
    references defeat codegen subexpression elimination — the fully inlined
    tree grew past Janino's 64KB method limit and silently fell back to
    interpreted execution. Multi-referenced projection outputs are exactly
    what CollapseProject refuses to re-inline, so each is computed once."""
    NUL = "\x00"
    df = flt
    for i, (pc, (_tail, groups)) in enumerate(zip(pat_cols, CAIXA_TAILS)):
        repl = NUL.join(f"${g}" for g in groups)
        # try_element_at: the no-match case (1-element array) must yield
        # NULL, not an ANSI out-of-bounds error.
        parts = F.split(F.regexp_replace(F.col("line"), pc, F.lit(repl)), NUL)
        df = df.withColumn(f"_g{i}", parts)
    g = [F.col(f"_g{i}") for i in range(3)]
    df = (
        df.withColumn("_d1", F.try_element_at(g[0], F.lit(1)))
        .withColumn("_h1", F.trim(F.try_element_at(g[0], F.lit(2))))
        .withColumn("_b1", F.trim(F.try_element_at(g[0], F.lit(3))))
        .withColumn("_d2", F.try_element_at(g[1], F.lit(1)))
        .withColumn("_h2", F.trim(F.try_element_at(g[1], F.lit(2))))
        .withColumn("_b2", F.trim(F.try_element_at(g[1], F.lit(3))))
        .withColumn("_d3", F.try_element_at(g[2], F.lit(1)))
        .withColumn("_rest", F.trim(F.try_element_at(g[2], F.lit(2))))
    )
    rest = F.col("_rest")
    df = df.withColumn(
        "_balm", F.regexp_extract(rest, r"([\d\.,]+\s*[DC]?)\s*$", 1)
    ).withColumn("_bal3", F.trim(F.col("_balm")))
    balm, bal3 = F.col("_balm"), F.col("_bal3")
    # desc = rest.rsplit(bal, 1)[0].strip() — split at the LAST occurrence,
    # located via reverse+instr (the balance is an end-anchored match).
    rpos = F.instr(F.reverse(rest), F.reverse(bal3))
    last_start = F.length(rest) - rpos - F.length(bal3) + 2
    df = df.withColumn(
        "_h3",
        F.when(
            balm != "", F.trim(F.substr(rest, F.lit(1), last_start - 1))
        ).otherwise(rest),
    ).withColumn(
        "_b3", F.when(balm != "", bal3).otherwise(F.lit("Não identificado"))
    )

    def skip(desc):
        cond = F.lit(False)
        for w in CAIXA_SKIP:
            cond = cond | desc.contains(w)
        return cond

    mk = lambda i: F.struct(  # noqa: E731
        F.col(f"_d{i}").alias("d"), F.col(f"_h{i}").alias("h"), F.col(f"_b{i}").alias("b")
    )
    rec = (
        F.when((F.size(g[0]) > 1) & ~skip(F.col("_h1")), mk(1))
        .when((F.size(g[1]) > 1) & ~skip(F.col("_h2")), mk(2))
        .when((F.size(g[2]) > 1) & ~skip(F.col("_h3")), mk(3))
    )
    # Constant-true nondeterministic guard: Filter-through-Project pushdown
    # only requires the project FIELDS to be deterministic, so a plain rec
    # column lets the downstream isnotnull(rec) filter sink through every
    # projection above, substituting the FULL cascade tree into one Filter
    # predicate (measured: 70 element_at copies — evaluated a second time
    # per line and past Janino's 64KB method limit → the whole stage
    # silently fell back to interpreted execution). Tainting rec pins the
    # filter above this projection, where it reads the attribute.
    df = df.withColumn("rec", F.when(F.spark_partition_id() >= 0, rec))
    return df.drop(
        "_g0", "_g1", "_g2", "_d1", "_h1", "_b1", "_d2", "_h2", "_b2",
        "_d3", "_rest", "_balm", "_bal3", "_h3", "_b3",
    )


def build_caixa(pages: DataFrame) -> DataFrame:
    fmt = F.lit(None).cast("string")
    for key, pat, _ in reversed(CAIXA_FMTS):
        fmt = F.when(F.col("text").rlike(pat), F.lit(key)).otherwise(fmt)
    # NB: reference checks dd/mm first (its MM/DD branch is an identical
    # regex — dead code, SURVEY §2.8) so the when-chain order above (first
    # match wins after reversal) mirrors conversor_caixa.py:46-67.
    pages = pages.withColumn("fmt", fmt).filter(F.col("fmt").isNotNull())

    # Single-plan dispatch on the sniffed format. The round-1 design was
    # one sub-plan per format unioned — needed because the fused cascade
    # blew Janino's 64KB method limit — but each sub-plan shuffle-READ the
    # whole shared branch exchange: 4× payload amplification (measured ~6s
    # of the 12s caixa branch at 100k docs), plus a union whose unreliable
    # partitioning claim forced a round-robin barrier exchange. Here the
    # format only picks the PATTERN STRING (a 4-literal CASE per cascade
    # step) and the cascade itself is written once over those pattern
    # columns, so the expression tree stays far under the codegen limit and
    # the branch is a zero-extra-exchange text path: shared salt exchange →
    # explode → cascade → window → serializer groupBy, all url-partitioned.
    lines = pages.select(
        "url", "fmt", F.posexplode(F.split("text", "\n")).alias("line_no", "line")
    ).withColumn("line", F.trim("line"))

    def by_fmt(mk, as_lit: bool = True):
        """CASE fmt WHEN <key> THEN mk(datepat, java_fmt) — string results
        wrapped as literals by default."""
        out = None
        for key, pat, java_fmt in CAIXA_FMTS:
            c = F.col("fmt") == key
            v = mk(pat, java_fmt)
            v = F.lit(v) if as_lit else v
            out = F.when(c, v) if out is None else out.when(c, v)
        return out

    flt = lines.filter(
        (F.col("line") != "")
        & F.regexp_like(F.col("line"), by_fmt(lambda pat, _: pat))
    )
    pat_cols = [
        by_fmt(lambda pat, _, tail=tail: rf"^.*?({pat}){tail}.*$")
        for tail, _groups in CAIXA_TAILS
    ]
    recs = (
        _caixa_cascade(flt, pat_cols)
        .filter(F.col("rec").isNotNull())
        .withColumn(
            "data_parsed",
            by_fmt(lambda _, jf: F.try_to_date(F.col("rec.d"), jf), as_lit=False),
        )
    )
    # any unparseable date in the doc → whole Data column stays strings
    # (conversor_caixa.py:243-247 catches the apply() and keeps the column)
    w = Window.partitionBy("url")
    recs = recs.withColumn(
        "dates_ok", F.min(F.col("data_parsed").isNotNull().cast("int")).over(w) == 1
    )
    bal = F.col("rec.b")
    cleaned = F.regexp_replace(bal, r"[^\d\.,\-+CD]", "")
    is_debit = bal.contains("D") | bal.contains("-")
    c2 = F.translate(cleaned, "DC", "")
    c3 = (
        F.when(c2.contains(",") & c2.contains("."), F.regexp_replace(F.translate(c2, ".", ""), ",", "."))
        .when(c2.contains(","), F.regexp_replace(c2, ",", "."))
        .otherwise(c2)
    )
    saldo = c3.try_cast("double")
    saldo = F.when(is_debit & (saldo > 0), -saldo).otherwise(saldo)
    # Pre-render the Data column so the sink takes the batch-wide fast
    # path (was a per-doc `prepare`, the serializer's slow path): when the
    # whole doc parsed, pandas' Datetime64Formatter renders a midnight-only
    # datetime64 column as bare ISO dates — byte-equal to date_format
    # 'yyyy-MM-dd' (both quoted under QUOTE_NONNUMERIC); otherwise the raw
    # string carries through (conversor_caixa.py:243-247 fallback).
    data_out = F.when(
        F.col("dates_ok"), F.date_format(F.col("data_parsed"), "yyyy-MM-dd")
    ).otherwise(F.col("rec.d"))
    return recs.select(
        "url",
        "line_no",
        data_out.alias("data_out"),
        F.col("rec.h").alias("historico"),
        saldo.alias("saldo"),
    )


# ---------------------------------------------------------------------------
# ofx — tagged-text records with TRNAMT decimal pre-fix (conversor_ofx.py)
# ---------------------------------------------------------------------------

def build_ofx(pages: DataFrame) -> DataFrame:
    fixed = F.regexp_replace("text", r"(<TRNAMT>)(-?[\d]+)\.(\d{2})", r"$1$2,$3")
    blocks = pages.select(
        "url",
        F.posexplode(
            F.regexp_extract_all(fixed, F.lit(r"(?s)<STMTTRN>(.*?)</STMTTRN>"), 1)
        ).alias("row_no", "block"),
    )
    dt = F.regexp_extract("block", r"<DTPOSTED>(\d{8})", 1)
    amt = F.regexp_extract("block", r"<TRNAMT>(-?[\d,]+)", 1)
    memo = F.trim(F.regexp_extract("block", r"<MEMO>([^\r\n<]*)", 1))
    return (
        blocks.withColumn("dt", dt)
        .withColumn("amt", amt)
        .filter((F.col("dt") != "") & (F.col("amt") != ""))
        .select(
            "url",
            "row_no",
            F.date_format(F.try_to_date("dt", "yyyyMMdd"), "dd/MM/yyyy").alias("data"),
            memo.alias("descricao"),
            F.regexp_replace("amt", ",", ".").alias("valor"),
        )
    )


# ---------------------------------------------------------------------------
# itau — camelot-stream geometry → searchsorted column binning + header
# promotion + ffill/bfill windows + ';;' finalize (conversor_itau.py)
# ---------------------------------------------------------------------------

def _fix_hyphen_cell(c):
    """conversor_itau.py:68-73 per-cell: strip, drop dots, move trailing
    hyphen to front."""
    t = F.translate(F.trim(c), ".", "")
    return F.regexp_replace(t, r"^(\d+),(\d+)-$", r"-$1,$2")


def _sanitize_name(h):
    """conversor_itau.py:131-136: unidecode-fold, strip punct, spaces→_,
    lower (ascii_fold covers the fixture charset)."""
    from pdf_table_extractor_spark.operators.tables import ascii_fold

    return F.lower(F.regexp_replace(F.regexp_replace(ascii_fold(h), r"[^\w\s]", ""), " ", "_"))


def _dedup_keep_first(hdr):
    """Indices of first occurrence of each column name
    (df.loc[:, ~df.columns.duplicated()], conversor_itau.py:49)."""
    tagged = F.transform(hdr, lambda h, i: F.struct(i.alias("i"), h.alias("h")))
    return F.filter(
        tagged, lambda s: ~F.array_contains(F.slice(hdr, F.lit(1), s["i"]), s["h"])
    )


def build_itau(pages: DataFrame) -> DataFrame:
    from pdf_table_extractor_spark.operators.tables import stream_rows
    from pdf_table_extractor_spark.synth import ITAU_GEOM

    rows = pages.select(
        "url", F.explode(stream_rows("html", ITAU_GEOM)).alias("r")
    ).select(
        "url",
        F.col("r.page_no").alias("page_no"),
        F.col("r.row_no").alias("row_no"),
        F.col("r.cells").alias("cells"),
    ).repartition(
        # post-UDF salt: the branch's only shuffle; explicit count so AQE
        # can't size-coalesce this CPU-bound stage (see salt_repartition)
        int(pages.sparkSession.conf.get("spark.sql.shuffle.partitions")),
        F.col("url"),
    )
    # header promotion: first row of each page's table (fix_header per
    # camelot table, conversor_itau.py:110,125-129)
    wpage = Window.partitionBy("url", "page_no").orderBy("row_no")
    rows = rows.withColumn("raw_hdr", F.first("cells").over(wpage)).filter(
        F.col("row_no") > 0
    )
    keep = _dedup_keep_first(F.col("raw_hdr"))
    rows = rows.withColumn("keep", keep)
    cells2 = F.transform(
        F.col("keep"), lambda s: _fix_hyphen_cell(F.element_at(F.col("cells"), s["i"] + 1))
    )
    hdr2 = F.transform(F.col("keep"), lambda s: _sanitize_name(F.trim(s["h"])))
    rows = rows.withColumn("cells2", cells2).withColumn("hdr", hdr2)
    # second name-dedup + data_de_insercao drop (conversor_itau.py:138-142)
    keep2 = F.filter(
        F.transform(F.col("hdr"), lambda h, i: F.struct(i.alias("i"), h.alias("h"))),
        lambda s: ~F.array_contains(F.slice(F.col("hdr"), F.lit(1), s["i"]), s["h"])
        & (s["h"] != F.lit("data_de_insercao")),
    )
    rows = rows.withColumn("keep2", keep2)
    rows = rows.withColumn(
        "cells3", F.transform(F.col("keep2"), lambda s: F.element_at(F.col("cells2"), s["i"] + 1))
    ).withColumn("sane", F.transform(F.col("keep2"), lambda s: s["h"]))

    def idx_of(name):
        return F.array_position(F.col("sane"), name)

    def cell_at(idx):
        return F.when(idx > 0, F.nullif(F.element_at(F.col("cells3"), idx.cast("int")), F.lit("")))

    ord_cols = ["page_no", "row_no"]
    rows = rows.withColumn("ord", F.struct(*ord_cols))
    data_f = windows.ffill(cell_at(idx_of("data")), ["url"], "ord")
    cred_f = windows.bfill(cell_at(idx_of("credito")), ["url"], "ord")
    deb_f = windows.bfill(cell_at(idx_of("debito")), ["url"], "ord")
    rows = (
        rows.withColumn("data_f", F.coalesce(data_f, F.lit("")))
        .withColumn("cred_f", F.coalesce(cred_f, F.lit("")))
        .withColumn("deb_f", F.coalesce(deb_f, F.lit("")))
    )
    final_cells = F.transform(
        F.col("cells3"),
        lambda c, i: F.when((i + 1) == idx_of("data"), F.col("data_f"))
        .when((i + 1) == idx_of("credito"), F.col("cred_f"))
        .when((i + 1) == idx_of("debito"), F.col("deb_f"))
        .otherwise(c),
    )
    return rows.select(
        "url", "page_no", "row_no", final_cells.alias("cells"), F.col("sane").alias("header")
    )


def _itau_prepare(pdf):
    import pandas as pd

    cols = list(pdf["header"].iloc[0])
    return pd.DataFrame([list(c) for c in pdf["cells"]], columns=cols)


def _itau_postprocess(csv_text: str) -> str:
    import re as _re

    return _re.sub(r";{2,}", ";", csv_text)  # finalize_csv, conversor_itau.py:169-178


# ---------------------------------------------------------------------------
# santander — sequential per-doc state machine (operators/statemachines.py)
# ---------------------------------------------------------------------------

def build_bradesco(pages: DataFrame) -> DataFrame:
    """7-stage sequential pipeline with cursor-advancing consumes
    (conversor_bradesco.py:231-241) — per-doc UDF, pre-rendered cells."""
    from pdf_table_extractor_spark.operators.statemachines import bradesco_records

    recs = pages.select("url", F.posexplode(bradesco_records("text")).alias("row_no", "r"))
    return recs.select(
        "url",
        "row_no",
        F.col("r.data").alias("data"),
        F.col("r.historico").alias("historico"),
        F.col("r.dcto").alias("dcto"),
        F.col("r.valor").alias("valor"),
        F.col("r.saldo").alias("saldo"),
    )


def build_stone(pages: DataFrame) -> DataFrame:
    """Lattice-mode table rows (conversor_stone.py) — ruling-grid detection
    in an Arrow UDF, headerless row records."""
    from pdf_table_extractor_spark.operators.statemachines import stone_rows

    return pages.select(
        "url", F.posexplode(stone_rows("html")).alias("row_no", "cells")
    )


def _stone_prepare(pdf):
    import pandas as pd

    # variable-width rows: DataFrame constructor pads short rows with NaN,
    # matching the reference's pd.concat alignment (conversor_stone.py:20)
    return pd.DataFrame([list(c) for c in pdf["cells"]])


# ---------------------------------------------------------------------------
# webpage — generic boilerpipe main-content profile (north rule: "HTML
# boilerplate strip ... text/link-density boilerplate classifier"). Pure
# Catalyst: the blank-line block split, shallow features, and the
# NumWordsRules tree all run inside whole-stage codegen off the shared
# url-salt text exchange; the per-url neighbour window and the pack groupBy
# both inherit the salt's hash partitioning, so the branch adds NO exchange.
# ---------------------------------------------------------------------------

def build_webpage(pages: DataFrame) -> DataFrame:
    from pdf_table_extractor_spark.operators import boilerplate

    blocks = boilerplate.page_blocks(pages)
    labeled = boilerplate.classify_blocks(boilerplate.block_features(blocks))
    return labeled.filter("is_content").select("url", "block_idx", "block_text")


# webjt — jusText main-content profile (second published extraction
# algorithm, operators/justext.py — Pomikalek 2011 with the published
# default thresholds): blank-line paragraph blocks, stopword/link/length
# context-free classes, then the short/neargood neighbour revisions as
# window fills. Same branch shape as webpage: features + the rule chain
# are codegen off the shared text exchange; the revision windows and the
# pack groupBy ride the url key.

#: English stoplist for the webjt profile (jusText ships per-language
#: stoplists as data; this is the corpus-matched config — synth.STOP_EN).
WEBJT_STOPLIST = (
    "the a an of and to in is it that for on with as at this by from or be"
).split()


def build_webjt(pages: DataFrame) -> DataFrame:
    from pdf_table_extractor_spark.operators import boilerplate, justext

    blocks = boilerplate.page_blocks(pages)
    labeled = justext.revise_classification(
        justext.classify_context_free(
            justext.paragraph_features(blocks, stoplist=WEBJT_STOPLIST)
        )
    )
    return labeled.filter(F.col("cls") == "good").select(
        "url", "block_idx", "block_text"
    )


def build_santander(pages: DataFrame) -> DataFrame:
    from pdf_table_extractor_spark.operators.statemachines import santander_records

    recs = pages.select("url", F.posexplode(santander_records("text")).alias("row_no", "r"))
    return recs.select(
        "url",
        "row_no",
        F.col("r.data").alias("data"),
        F.col("r.lancamento").alias("lancamento"),
        F.col("r.valor").alias("valor"),
        F.col("r.documento").alias("documento"),
    )


# ---------------------------------------------------------------------------

PROFILES: dict[str, Profile] = {
    "banestes": Profile(
        "banestes",
        build_banestes,
        salt_pages=False,
        sink=Sink(
            columns=["Data", "Lançamento", "Valor (R$)"],
            source_cols=["data", "lancamento", "valor"],
            order_by=["page_no", "y"],
            float_cols=["Valor (R$)"],
        ),
    ),
    "pagbank": Profile(
        "pagbank",
        build_pagbank,
        Sink(
            columns=["Data", "Descrição", "Valor"],
            source_cols=["data", "descricao", "valor"],
            order_by=["row_no"],
        ),
    ),
    "cef": Profile(
        "cef",
        build_cef,
        Sink(
            columns=["Data", "Histórico", "Valor/Saldo"],
            source_cols=["data", "historico", "valor"],
            order_by=["line_no"],
        ),
    ),
    "inter": Profile(
        "inter",
        build_inter,
        Sink(
            columns=["Data", "Histórico", "Valor"],
            source_cols=["data", "historico", "valor"],
            order_by=["line_no"],
        ),
        emit_empty=True,
    ),
    "bbmod1": Profile(
        "bbmod1",
        build_bbmod1,
        Sink(
            columns=["Data", "Lançamento", "Valor"],
            source_cols=["data", "lancamento", "valor"],
            order_by=["rec_ln"],
            float_cols=["Valor"],
        ),
    ),
    "bbmod2": Profile(
        "bbmod2",
        build_bbmod2,
        Sink(
            columns=["Data", "Lançamento", "Valor"],
            source_cols=["data", "lancamento", "valor"],
            order_by=["rec_ln"],
            float_cols=["Valor"],
        ),
    ),
    "sicoob1": Profile(
        "sicoob1",
        build_sicoob1,
        Sink(
            columns=["Data", "Lancamento", "Valor"],
            source_cols=["data", "lancamento", "valor"],
            order_by=["line_no"],
        ),
    ),
    "sicoob2": Profile(
        "sicoob2",
        build_sicoob2,
        Sink(
            columns=["Data", "Lancamento", "Valor"],
            source_cols=["data", "lancamento", "valor"],
            order_by=["block_no"],
            float_cols=["Valor"],
        ),
    ),
    "c6": Profile(
        "c6",
        build_c6,
        Sink(
            columns=["Data", "Lançamento", "Valor"],
            source_cols=["data", "lancamento", "valor"],
            order_by=["rec_ln"],
            float_cols=["Valor"],
        ),
    ),
    "santander": Profile(
        "santander",
        build_santander,
        salt_pages=False,
        sink=Sink(
            columns=["Data", "Lançamento", "Valor", "Documento"],
            source_cols=["data", "lancamento", "valor", "documento"],
            order_by=["row_no"],
            float_cols=["Valor"],
        ),
    ),
    "caixa": Profile(
        "caixa",
        build_caixa,
        Sink(
            columns=["Data", "Histórico", "Saldo"],
            source_cols=["data_out", "historico", "saldo"],
            order_by=["line_no"],
            sep=",",
            decimal=".",
            float_cols=["Saldo"],
            quoting=__import__("csv").QUOTE_NONNUMERIC,
        ),
    ),
    "ofx": Profile(
        "ofx",
        build_ofx,
        Sink(
            columns=["Data", "Descrição", "Valor"],
            source_cols=["data", "descricao", "valor"],
            order_by=["row_no"],
        ),
    ),
    "bradesco": Profile(
        "bradesco",
        build_bradesco,
        salt_pages=False,
        sink=Sink(
            columns=["Data", "Histórico", "Dcto.", "Valor", "Saldo"],
            source_cols=["data", "historico", "dcto", "valor", "saldo"],
            order_by=["row_no"],
            utf8_sig=False,
            # reference txt_to_xls (conversor_bradesco.py:170-227): sheet
            # 'Transacoes', widths 3000/12000/4000×3, last-3 tokens typed.
            workbook=WorkbookSink(
                sheet="Transacoes",
                col_widths=(3000, 12000, 4000, 4000, 4000),
                typed_cols=("Dcto.", "Valor", "Saldo"),
            ),
        ),
    ),
    "stone": Profile(
        "stone",
        build_stone,
        salt_pages=False,
        sink=Sink(
            columns=[],
            source_cols=["cells"],
            order_by=["row_no"],
            sep=",",
            utf8_sig=False,
            header=False,
            prepare=_stone_prepare,
        ),
    ),
    "itau": Profile(
        "itau",
        build_itau,
        salt_pages=False,
        sink=Sink(
            columns=[],
            source_cols=["cells", "header"],
            order_by=["page_no", "row_no"],
            utf8_sig=False,
            prepare=_itau_prepare,
            postprocess=_itau_postprocess,
        ),
    ),
    "webpage": Profile(
        "webpage",
        build_webpage,
        # always emit bytes per url, even b"" for all-boilerplate pages —
        # the north rule gates on "byte-identical extracted text per url"
        emit_empty=True,
        sink=Sink(
            columns=["main_text"],
            source_cols=["block_text"],
            order_by=["block_idx"],
            utf8_sig=False,
            raw=True,
        ),
    ),
    "webjt": Profile(
        "webjt",
        build_webjt,
        emit_empty=True,
        sink=Sink(
            columns=["main_text"],
            source_cols=["block_text"],
            order_by=["block_idx"],
            utf8_sig=False,
            raw=True,
        ),
    ),
}
