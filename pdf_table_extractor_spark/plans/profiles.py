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

from pdf_table_extractor_spark.functions import windows
from pdf_table_extractor_spark.operators.lines import layout_lines, text_lines
from pdf_table_extractor_spark.operators.serialize import Sink


@dataclass(frozen=True)
class Profile:
    name: str
    build: Callable[[DataFrame], DataFrame]
    sink: Sink
    emit_empty: bool = False  # header-only CSV when no records


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
    ).cast("double")
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
    g = lambda i: F.regexp_extract_all("text", F.lit(PAGBANK_PAT), i)  # noqa: E731
    zipped = pages.select(
        "url", F.arrays_zip(g(1), g(2), g(3)).alias("ms")
    ).select("url", F.posexplode("ms").alias("row_no", "m"))
    return zipped.select(
        "url",
        "row_no",
        F.col("m").getField("0").alias("data"),
        F.col("m").getField("1").alias("descricao"),
        F.col("m").getField("2").alias("valor"),
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

PROFILES: dict[str, Profile] = {
    "banestes": Profile(
        "banestes",
        build_banestes,
        Sink(
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
}
