"""String ops: whitespace squeeze, quote strip, skip-word filters — the
reference's per-line `re.sub`/`strip` calls as Catalyst expressions."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def pin(col: Column) -> Column:
    """Constant-true nondeterministic guard around an expensive computed
    column that a downstream ``.filter()`` will read.

    Filter-through-Project pushdown only requires the project FIELDS to be
    deterministic, so a predicate on a plain computed column sinks below
    its defining projection with the full expression tree substituted into
    the Filter — the column is then evaluated twice per row (once in the
    filter, once in the projection), and a large tree duplicated across
    several conjuncts can push the generated method past Janino's 64KB
    limit, silently dropping the whole stage to interpreted execution
    (measured on the caixa cascade: 70 element_at copies in one predicate).
    Wrapping the value in a nondeterministic-flagged but constant-true
    branch pins downstream filters above the projection, where they read
    the attribute. Same idiom as the extract() branch dispatch."""
    return F.when(F.spark_partition_id() >= 0, col)


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


def transliterate(col: Column) -> Column:
    """General-purpose transliteration (Arrow-batched pandas UDF): the
    fallback for text whose characters fall outside the JVM Latin fold in
    operators.tables.ascii_fold — NFKD-decompose, strip combining marks,
    keep ASCII results, pass anything else through. Prefer ascii_fold in
    hot paths (pure Catalyst); use this for arbitrary-script columns."""
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    multi = {"ß": "ss", "æ": "ae", "Æ": "AE", "œ": "oe", "Œ": "OE",
             "þ": "th", "Þ": "Th", "ĳ": "ij", "Ĳ": "IJ",
             "ø": "o", "Ø": "O", "đ": "d", "Đ": "D", "ħ": "h", "Ħ": "H",
             "ı": "i", "ł": "l", "Ł": "L", "ŧ": "t", "Ŧ": "T", "ð": "d", "Ð": "D"}

    def fold_one(s: str | None) -> str | None:
        if s is None:
            return None
        out = []
        for ch in s:
            if ch.isascii():
                out.append(ch)
                continue
            if ch in multi:
                out.append(multi[ch])
                continue
            base = "".join(
                c
                for c in unicodedata.normalize("NFKD", ch)
                if not unicodedata.combining(c)
            )
            out.append(base if base and base.isascii() else ch)
        return "".join(out)

    @pandas_udf("string")
    def _fold(s: pd.Series) -> pd.Series:
        return s.map(fold_one)

    return _fold(col)


LOCK_MAGIC = "ENC1:"


def unlock_text(col: Column, password: str) -> Column:
    """Password-protected documents (conversor_c6.py:36,109 — the per-file
    `senha` handed to the PDF reader before text extraction). The sandbox
    lock format is a repeating-key XOR behind an 'ENC1:' magic + hex body;
    a production deployment swaps this seam for `F.aes_decrypt` or a
    qpdf/pikepdf UDF — the plumbing (profile-config password, decrypt
    before parse, pass-through for unlocked docs) is what's modeled.
    Arrow-batched; unlocked rows short-circuit inside the batch."""
    from pyspark.sql.functions import pandas_udf

    key = password.encode("utf-8")

    def unlock_one(v: str | None) -> str | None:
        if v is None or not v.startswith(LOCK_MAGIC):
            return v
        data = bytes.fromhex(v[len(LOCK_MAGIC):])
        return bytes(b ^ key[i % len(key)] for i, b in enumerate(data)).decode("utf-8")

    @pandas_udf("string")
    def _unlock(s: pd.Series) -> pd.Series:
        return s.map(unlock_one)

    return _unlock(col)


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


def nfc_normalize(col: Column) -> Column:
    """Unicode NFC normalization (Arrow-batched pandas UDF — Spark SQL has
    no built-in normalizer, the honest UDF case). Crawled text mixes
    composed and decomposed accent encodings; dedup/fingerprint keys must
    not split on them. Unicode defines NFC exactly, so any compliant
    oracle (DuckDB's utf8proc `nfc_normalize`) matches byte-for-byte."""
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        return s.map(lambda x: unicodedata.normalize("NFC", x) if x is not None else None)

    return _nfc(col)


def dehyphenate(col: Column) -> Column:
    """Repair PDF/print line-break hyphenation — 'exam-\\nple' ->
    'example' (the text-layer artifact every PDF extraction inherits;
    the reference's per-bank parsers never hit it only because bank
    statements avoid justified prose). Conservative rule: join ONLY
    letter + hyphen + newline(+indent) + lowercase letter, so
    'well-known' mid-line, uppercase continuations, and numeric ranges
    ('2023-\\n2024') stay untouched. Compound heuristic (round-4 ADVICE
    fix): when EITHER fragment shows the token is itself hyphenated
    ('state-of-the-\\nart', or 'state-\\nof-the-art'), the break hyphen
    is KEPT — dictionary-free, so a compound broken at a plain segment
    boundary ('state-\\nof' alone) still joins hyphen-less. Same \\p{L}
    semantics in Java regex and RE2."""
    # keep-hyphen passes consume the newline first, so the plain join
    # below can no longer touch their matches
    kept = F.regexp_replace(
        col, r"((?:\p{L}+-)+\p{L}+)-\n[ \t]*(\p{Ll})", r"$1-$2"
    )
    kept = F.regexp_replace(
        kept, r"(\p{L})-\n[ \t]*(\p{Ll}\p{L}*-\p{L})", r"$1-$2"
    )
    return F.regexp_replace(
        kept, r"(\p{L})-\n[ \t]*(\p{Ll})", r"$1$2"
    )


#: Cyrillic look-alikes of Latin letters (the UTS #39 confusables core
#: used for spam/evasion folding; lowercase + the common uppercase set).
HOMOGLYPH_CYR = "\u0430\u0435\u043e\u0440\u0441\u0445\u0443\u0456\u0410\u0412\u0415\u041a\u041c\u041d\u041e\u0420\u0421\u0422\u0425"
HOMOGLYPH_LAT = "aeopcxyiABEKMHOPCTX"


def homoglyph_fold(col: Column) -> Column:
    """Fold Cyrillic homoglyphs to Latin — but ONLY inside mixed-script
    words (a Latin letter AND a Cyrillic look-alike in the same token:
    the blocklist-evasion signature), so genuine Cyrillic text is never
    mangled. In-place (round-4 ADVICE fix): the split keeps whitespace
    runs as their own array elements (zero-width lookaround
    boundaries), so newlines, tabs and space runs survive and text with
    no homoglyphs round-trips byte-identically — the old \\s+
    split/space-join silently normalized whitespace. Pure array
    expressions."""
    pieces = F.split(col, r"(?<=\s)(?=\S)|(?<=\S)(?=\s)")
    folded = F.transform(
        pieces,
        lambda w: F.when(
            w.rlike("[A-Za-z]") & w.rlike("[" + HOMOGLYPH_CYR + "]"),
            F.translate(w, HOMOGLYPH_CYR, HOMOGLYPH_LAT),
        ).otherwise(w),
    )
    return F.array_join(folded, "")


def homoglyph_stats(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_mixed_words, folded_text): mixed-script word counts (the
    evasion detector) + the folded text. No shuffle."""
    text = F.col(text_col)
    toks = F.split(text, r"\s+")
    mixed = F.size(
        F.filter(
            toks,
            lambda w: w.rlike("[A-Za-z]") & w.rlike("[" + HOMOGLYPH_CYR + "]"),
        )
    )
    return df.select(
        F.col(id_col),
        mixed.alias("n_mixed_words"),
        homoglyph_fold(text).alias("folded_text"),
    )
