"""Date parsing: the reference's try-N-formats loops as `coalesce(to_date)`.

Reference: conversor_caixa.py:46-95 sniffs one of 5 formats per document and
then dispatches `strptime` per line with fallbacks. In Spark, `to_date`
returns NULL on mismatch, so the whole cascade is a single `coalesce` —
branch-free, codegen'd, and independent of a per-doc sniff (first non-null
format wins per value, which subsumes the sniff for unambiguous fixtures).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Order matters: first match wins (mirrors the reference's cascade order,
# conversor_caixa.py:48-58).
DEFAULT_FORMATS = ("dd/MM/yyyy", "yyyy-MM-dd", "dd.MM.yyyy", "dd-MM-yyyy", "MM/dd/yyyy")

# conversor_inter.py:21-25 — pt-BR month-name map (reference hardcodes 5;
# we carry all 12, the obvious intended behavior).
PT_MONTHS = {
    "janeiro": 1, "fevereiro": 2, "março": 3, "abril": 4, "maio": 5,
    "junho": 6, "julho": 7, "agosto": 8, "setembro": 9, "outubro": 10,
    "novembro": 11, "dezembro": 12,
}


def coalesce_to_date(col: Column, formats: tuple[str, ...] = DEFAULT_FORMATS) -> Column:
    """Try each format; first parse wins; NULL if none (which also gives the
    reference's validity predicate conversor_c6.py:64-70 for free)."""
    return F.coalesce(*[F.try_to_date(col, f) for f in formats])


def month_name_pt_to_number(col: Column) -> Column:
    """pt month name → int via a map literal (conversor_inter.py:21-25)."""
    pairs: list[Column] = []
    for name, num in PT_MONTHS.items():
        pairs.extend([F.lit(name), F.lit(num)])
    return F.element_at(F.create_map(*pairs), F.lower(col))
