"""Brazilian-locale money parsing as Catalyst expressions.

The reference parses money in per-row Python with four distinct sign
conventions (SURVEY §2.8):

- ``1.234,56 (+)`` / ``(-)``   — conversor_bbmod1.py:19,26-33
- ``1.234,56 C`` / ``D``       — conversor_bbmod2.py:14,17-21 (space),
                                  conversor_sicoobmod1.py:14 (no space, EOL)
- ``-R$ 1.234,56``             — conversor_c6.py:73, conversor_inter.py:28
- ``1.234,56-`` (trailing)     — conversor_santander.py:20,38-42,
                                  conversor_itau.py:68-73 (fix_hyphen)

Here each is one `regexp_extract` + a normalize/cast — JVM expressions the
optimizer folds into whole-stage codegen. Decimals (never binary floats)
preserve byte-exact round-trips back to ``1.234,56`` text (SURVEY §7.3).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A BR-locale number body: digits with optional '.' thousands and ',' decimals.
NUM = r"[\d\.]*\d,\d{2}"


def br_money_to_decimal(col: Column, precision: int = 18, scale: int = 2) -> Column:
    """``'1.234,56'`` (optionally signed) → decimal.

    Mirrors the strip-thousands / comma-to-point dance of
    conversor_bbmod1.py:26-33 as two translate-class expressions.
    """
    cleaned = F.regexp_replace(F.translate(col, ".", ""), ",", ".")
    return cleaned.cast(f"decimal({precision},{scale})")


def extract_money_paren_sign(col: Column) -> Column:
    """``'... 1.234,56 (+)'`` → signed decimal (bbmod1 convention,
    conversor_bbmod1.py:19)."""
    pat = rf"({NUM})\s*\(\s*([+-])\s*\)"
    val = br_money_to_decimal(F.regexp_extract(col, pat, 1))
    sign = F.regexp_extract(col, pat, 2)
    return F.when(sign == "-", -val).when(sign == "+", val)


def extract_money_cd(col: Column, at_eol: bool = False, spaced: bool = True) -> Column:
    """``'1.234,56 C'``/``'1.234,56D'`` → signed decimal.

    ``spaced`` mirrors conversor_bbmod2.py:14 (``\\s*``); ``at_eol`` mirrors
    conversor_sicoobmod1.py:14 (anchored, no space).
    """
    sep = r"\s*" if spaced else ""
    pat = rf"({NUM}){sep}([CD])" + ("$" if at_eol else "")
    val = br_money_to_decimal(F.regexp_extract(col, pat, 1))
    sign = F.regexp_extract(col, pat, 2)
    return F.when(sign == "D", -val).when(sign == "C", val)


def extract_money_rs(col: Column) -> Column:
    """``'-R$ 1.234,56'`` → signed decimal (conversor_c6.py:73,
    conversor_inter.py:28)."""
    pat = rf"(-?)R?\$\s?({NUM})"
    # No match → regexp_extract yields '' → decimal cast yields NULL, which
    # propagates through the sign branch — no explicit null guard needed.
    val = br_money_to_decimal(F.regexp_extract(col, pat, 2))
    sign = F.regexp_extract(col, pat, 1)
    return F.when(sign == "-", -val).otherwise(val)


def extract_money_trailing_hyphen(col: Column) -> Column:
    """``'1.234,56-'`` → negative decimal; plain ``'1.234,56'`` → positive
    (conversor_santander.py:20,38-42; conversor_itau.py:68-73)."""
    pat = rf"({NUM})(-?)\s*$"
    val = br_money_to_decimal(F.regexp_extract(col, pat, 1))
    neg = F.regexp_extract(col, pat, 2) == "-"
    return F.when(neg, -val).otherwise(val)


def fix_hyphen(col: Column) -> Column:
    """String-level ``'123,45-'`` → ``'-123,45'`` (also strips thousands
    dots), mirroring conversor_itau.py:68-73 byte semantics."""
    no_dots = F.translate(col, ".", "")
    return F.when(
        no_dots.rlike(r"^\d+,\d+-$"),
        F.concat(F.lit("-"), F.regexp_replace(no_dots, "-$", "")),
    ).otherwise(no_dots)


def sign_by_keywords(value: Column, desc: Column, keywords: list[str]) -> Column:
    """Negate ``value`` when ``desc`` contains any debit keyword
    (conversor_banestes.py:73-75 — 4 keywords; conversor_santander.py:32-42
    — 21 keywords). One case-insensitive rlike, not a keyword loop."""
    pat = "(?i)" + "|".join(keywords)
    return F.when(desc.rlike(pat), -F.abs(value)).otherwise(value)
