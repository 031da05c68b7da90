"""String ops: whitespace squeeze, quote strip, skip-word filters — the
reference's per-line `re.sub`/`strip` calls as Catalyst expressions."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def squeeze_ws(col: Column) -> Column:
    """`re.sub(r'\\s+', ' ', s).strip()` (conversor_bbmod1.py:91,
    conversor_sicoobmod2.py:42,57)."""
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def strip_quotes(col: Column) -> Column:
    """Remove double/single quotes (conversor_inter.py:50)."""
    return F.translate(col, "\"'", "")


def skip_word_filter(text: Column, skip_words: list[str]) -> Column:
    """Boolean keep-predicate: line contains none of the skip words
    (conversor_bbmod1.py:46-49 `padrao_ignorar` — 11 alternatives;
    conversor_caixa.py:174-176; conversor_c6.py:58-59). One rlike."""
    if not skip_words:
        return F.lit(True)
    return ~text.rlike("(?i)" + "|".join(skip_words))


def remove_first_occurrence(col: Column, pat: str) -> Column:
    """Remove only the FIRST regex occurrence (Python `re.sub(..., count=1)`
    used at conversor_bradesco.py:190; Spark's regexp_replace is global, so
    split at the first match and rejoin)."""
    # Find the first match text, then splice it out: before-match ++ after-match.
    m = F.regexp_extract(col, f"({pat})", 1)
    return remove_first_literal(col, m)


def remove_first_literal(col: Column, literal: Column) -> Column:
    """Remove the first occurrence of a per-row literal substring
    (Python `str.replace(x, '', 1)`, e.g. conversor_sicoobmod2.py:56)."""
    idx = F.instr(col, literal)  # 1-based position; 0 if absent/empty
    before = F.substr(col, F.lit(1), idx - 1)
    after = F.substr(col, idx + F.length(literal))
    return F.when((literal != "") & (idx > 0), F.concat(before, after)).otherwise(col)
