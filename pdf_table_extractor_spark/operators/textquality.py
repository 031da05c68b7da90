"""Text analysis for training-data curation: language-ID heuristic, quality
scoring, token counting, document fingerprinting. Pure Catalyst expressions
(codegen'd; no UDFs), so they run at scan speed and an external SQL oracle
can reproduce them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pdf_table_extractor_spark.operators.dedup import shingles, squeeze_lower, tokens

# Tiny marker wordlists (n-gram/stopword heuristic). Deliberately small and
# deterministic; real deployments swap in fastText-style models behind the
# same column contract.
LANG_MARKERS = {
    "en": ["the", "and", "of", "data", "value", "order", "key", "fast", "slow"],
    "pt": ["de", "que", "para", "com", "não", "uma", "saldo", "extrato"],
    "es": ["el", "los", "las", "por", "una", "pero"],
    "de": ["der", "die", "und", "nicht", "mit", "ein"],
}


def _hits(toks: Column, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc marker-word hit counts + argmax language (ties → earlier key,
    no hits → 'und')."""
    toks = tokens(F.col(text_col))
    out = df.select(F.col(id_col), toks.alias("toks"))
    for lang, words in LANG_MARKERS.items():
        out = out.withColumn(f"{lang}_hits", _hits(F.col("toks"), words))
    best = F.lit("und")
    best_hits = F.lit(0)
    for lang in LANG_MARKERS:  # first language wins ties (insertion order)
        is_better = F.col(f"{lang}_hits") > best_hits
        best = F.when(is_better, F.lit(lang)).otherwise(best)
        best_hits = F.when(is_better, F.col(f"{lang}_hits")).otherwise(best_hits)
    return out.select(
        id_col, *[f"{lang}_hits" for lang in LANG_MARKERS], best.alias("lang_guess")
    )


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Length / punctuation / stopword-ratio features + composite score.

    score = 0.4*min(n_tokens/100, 1) + 0.3*(1 - punct_ratio) + 0.3*stop_ratio
    (same literal op order as the SQL oracle → bit-identical doubles).
    """
    text = F.col(text_col)
    toks = tokens(text)
    n_tokens = F.size(toks)
    n_chars = F.length(text)
    punct = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    punct_ratio = punct / F.greatest(n_chars, F.lit(1))
    stop = _hits(toks, LANG_MARKERS["en"])
    stop_ratio = stop / F.greatest(n_tokens, F.lit(1))
    score = (
        F.lit(0.4) * F.least(n_tokens / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.3) * stop_ratio
    )
    return df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars_m"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + BPE-ish piece count (alnum runs and single
    punctuation marks, the classic pre-tokenizer regex)."""
    text = F.col(text_col)
    ws = F.size(F.split(F.trim(text), r"\s+"))
    pieces = F.size(F.regexp_extract_all(F.lower(text), F.lit(r"[a-z0-9]+|[^a-z0-9\s]"), 0))
    return df.select(
        F.col(id_col), ws.alias("ws_tokens"), pieces.alias("bpe_pieces")
    )


def fingerprints(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Doc fingerprint: md5 of the canonical text + winnowing-style k-min
    shingle hash (lexicographic min of shingle md5s)."""
    text = F.col(text_col)
    sh = shingles(text, 3)
    return df.select(
        F.col(id_col),
        F.md5(squeeze_lower(text)).alias("doc_md5"),
        F.array_min(F.transform(sh, lambda s: F.md5(s))).alias("min_shingle_md5"),
    )


def rolling_fingerprint(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    stride: int = 4,
) -> DataFrame:
    """Rolling char-window fingerprint (Rabin-Karp/winnowing shape): hash
    every `stride`-th k-char window of the canonical text, keep the min —
    robust to word-boundary edits in a way token shingles aren't.

    Expression-only (sequence + transform over substrings; the stride is the
    cost knob at 100 TB — sampling positions instead of hashing every
    window). Hash = md5 hex min, engine-portable like the MinHash path.
    """
    canon = squeeze_lower(F.col(text_col))
    n = F.length(canon)
    starts = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)), F.lit(stride))
    wins = F.transform(starts, lambda i: F.md5(F.substring(canon, i, k)))
    return df.select(
        F.col(id_col),
        F.array_min(wins).alias("min_window_md5"),
        F.size(wins).alias("n_windows"),
    )
