"""Text analysis for training-data curation: language-ID heuristic, quality
scoring, token counting, document fingerprinting. Pure Catalyst expressions
(codegen'd; no UDFs), so they run at scan speed and an external SQL oracle
can reproduce them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pdf_table_extractor_spark.operators.dedup import bind, shingles, squeeze_lower, tokens

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


def lang_guess_expr(toks: Column) -> Column:
    """Argmax language over the marker hit counts (ties → earlier key, no
    hits → 'und') as a single expression, reusable inside fused plans."""
    best = F.lit("und")
    best_hits = F.lit(0)
    for lang, words in LANG_MARKERS.items():  # first language wins ties
        h = _hits(toks, words)
        is_better = h > best_hits
        best = F.when(is_better, F.lit(lang)).otherwise(best)
        best_hits = F.when(is_better, h).otherwise(best_hits)
    return best


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


def quality_score_expr(text: Column) -> Column:
    """The composite quality score as one expression (same literal op order
    as quality_features / the SQL oracle → bit-identical doubles)."""
    toks = tokens(text)
    n_tokens = F.size(toks)
    n_chars = F.length(text)
    punct = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    punct_ratio = punct / F.greatest(n_chars, F.lit(1))
    stop = _hits(toks, LANG_MARKERS["en"])
    stop_ratio = stop / F.greatest(n_tokens, F.lit(1))
    return (
        F.lit(0.4) * F.least(n_tokens / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.3) * stop_ratio
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
    def wins_of(canon: Column) -> Column:
        n = F.length(canon)
        starts = F.sequence(
            F.lit(1), F.greatest(n - (k - 1), F.lit(1)), F.lit(stride)
        )
        return F.transform(starts, lambda i: F.md5(F.substring(canon, i, k)))

    wins = bind(squeeze_lower(F.col(text_col)), wins_of)
    return df.select(
        F.col(id_col),
        F.array_min(wins).alias("min_window_md5"),
        F.size(wins).alias("n_windows"),
    )


# PII patterns chosen to mean the same thing in Java regex (Spark) and RE2
# (DuckDB): no lookaround, no backrefs; leftmost-first alternation only.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PII_PHONE = r"\+\d{2}[ ]?\(?\d{2}\)?[ ]?\d{4,5}-?\d{4}"


def pii_scrub(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """PII redaction for training corpora: count + replace emails, IPv4
    addresses, and international-format phone numbers with typed tokens.
    Fixed scrub order (email → ipv4 → phone) so counts are taken on the
    original text and replacements can't create new matches. Pure Catalyst
    regexps — scan-speed, oracle-reproducible."""
    text = F.col(text_col)
    clean = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    clean = F.regexp_replace(clean, PII_IPV4, "<IP>")
    clean = F.regexp_replace(clean, PII_PHONE, "<PHONE>")
    return df.select(
        F.col(id_col),
        clean.alias("clean_text"),
        F.regexp_count(text, F.lit(PII_EMAIL)).alias("n_emails"),
        F.regexp_count(text, F.lit(PII_IPV4)).alias("n_ipv4"),
        F.regexp_count(text, F.lit(PII_PHONE)).alias("n_phones"),
    )


def gopher_quality(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher/C4-style repetition and shape filters: mean word length,
    bullet-line fraction, most-common-token fraction, and the composite
    pass flag (3 ≤ mean_word_len ≤ 10, max_unigram_frac ≤ 0.2,
    bullet_frac < 0.9). The unigram mode is an explode + two partially
    aggregated groupBys — the shuffle carries (doc, token) partial counts,
    never token lists."""
    text = F.col(text_col)
    toks = tokens(text)
    n_tokens = F.size(toks)
    lines = F.split(text, "\n")
    n_lines = F.size(lines)
    bullet = F.size(F.filter(lines, lambda l: F.trim(l).rlike(r"^[-*•]")))
    base = df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        F.round(
            F.aggregate(
                toks, F.lit(0.0), lambda acc, t: acc + F.length(t)
            ) / F.greatest(n_tokens, F.lit(1)),
            6,
        ).alias("mean_word_len"),
        F.round(bullet / F.greatest(n_lines, F.lit(1)), 6).alias("bullet_frac"),
    )
    tok_counts = (
        df.select(F.col(id_col), F.explode(tokens(text)).alias("tok"))
        .groupBy(id_col, "tok")
        .count()
        .groupBy(id_col)
        .agg(F.max("count").alias("max_cnt"), F.sum("count").alias("tot_cnt"))
        .select(
            F.col(id_col),
            F.round(F.col("max_cnt") / F.col("tot_cnt"), 6).alias("max_unigram_frac"),
        )
    )
    out = base.join(tok_counts, id_col, "left").withColumn(
        "max_unigram_frac", F.coalesce(F.col("max_unigram_frac"), F.lit(0.0))
    )
    passes = (
        (F.col("mean_word_len") >= 3)
        & (F.col("mean_word_len") <= 10)
        & (F.col("max_unigram_frac") <= 0.2)
        & (F.col("bullet_frac") < 0.9)
    )
    return out.withColumn("passes_gopher", passes)


# ---------------------------------------------------------------------------
# CCNet-style perplexity bucketing (Wenzek et al. 2020) with a
# self-trained unigram LM. CCNet scores each document with a KenLM model
# and splits the corpus into head/middle/tail perplexity buckets; the
# engine-native equivalent trains the LM on the corpus itself — token
# counts are one hash aggregate — and scores each document by its mean
# token negative-log-likelihood. No external model artifact, fully
# reproducible, and the whole thing is three shuffles keyed on token or
# doc id (counts aggregate, score join, doc aggregate).
# ---------------------------------------------------------------------------


def unigram_nll(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_toks, nll): mean unigram negative log-likelihood per doc
    under the corpus's own empirical unigram distribution (higher = more
    surprising = CCNet 'tail'). nll is rounded to 4 decimals so external
    oracles agree despite engine-specific float summation order.

    Scale: token counts are a map-side-combined hash aggregate; the
    score join keys on the token string — Zipf-hot tokens are exactly
    the skewed keys AQE skew-join splits (or broadcast the top-K vocab
    and join only the tail). The corpus total is a 1-row broadcast."""
    tok = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
    cnt = tok.groupBy("tok").agg(F.count("*").cast("double").alias("__c"))
    tot = cnt.select(F.sum("__c").alias("__t"))
    scored = (
        tok.join(cnt, "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_toks"),
            F.round(F.avg(F.log(F.col("__t")) - F.log(F.col("__c"))), 4).alias(
                "nll"
            ),
        )
    )
    return scored


def bigram_pairs(col: Column) -> Column:
    """array<struct<w1,w2>> of adjacent token pairs. The token split is
    ``bind``-ed so it evaluates once per row (the slice arguments would
    otherwise re-run the regexp+split twice — the CLAUDE.md
    multi-reference gotcha)."""
    return bind(
        tokens(col),
        lambda t: F.zip_with(
            F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))),
            F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    )


def kn_bigram_nll(
    df: DataFrame,
    train_df: DataFrame | None = None,
    *,
    discount: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_bigrams, nll): mean bigram negative log-likelihood per doc
    under an interpolated Kneser–Ney LM (Kneser & Ney 1995; Chen &
    Goodman 1999 eq. 4.25) trained on ``train_df`` (default: ``df``
    itself). The CCNet-style quality signal one step past
    ``unigram_nll``: a KenLM-shaped model whose training is itself a
    Spark aggregate, so the LM scales with the corpus.

        P(w2|w1) = max(c(w1 w2) - D, 0)/c(w1)
                   + (D · N1+(w1,·)/c(w1)) · Pcont(w2)
        Pcont(w2) = (N1+(·,w2) + 1) / (B + V)      [+1-smoothed so every
                    token — including OOV — has positive mass]
        unseen context w1 → P(w2|w1) = Pcont(w2)   [continuation backoff]

    B = distinct training bigrams, V = training vocab, D = ``discount``.
    Docs with < 2 tokens produce no bigram rows and are absent from the
    output (token_counts covers them). nll rounds to 4 decimals so
    external oracles agree despite engine float-summation order.

    Scale: the LM is two hash aggregates over training bigram rows
    (c12; per-context c1/N1+ fwd) plus one over w2 (continuation
    counts); scoring joins key on (w1,w2)/w1/w2 token strings —
    Zipf-hot keys are exactly what AQE skew-join splits, and for a
    bounded vocabulary the three LM tables broadcast. B/V are a 1-row
    broadcast. No windows, no UDFs, no driver-side model state."""
    train = train_df if train_df is not None else df
    tpairs = train.select(F.explode(bigram_pairs(F.col(text_col))).alias("p")).select(
        "p.w1", "p.w2"
    )
    # c12 feeds FOUR consumers (ctx, cont, B, the scoring join); the
    # constant-true nondeterministic guard stops join-inferred isnotnull
    # constraints from specializing each consumer's copy of its child, so
    # the training corpus is scanned and bigram-exploded ONCE and every
    # consumer reads the same reused (w1,w2) exchange (see
    # terms.bm25_topk / plans/extract.py for the pattern + measurements).
    c12 = (
        tpairs.groupBy("w1", "w2")
        .agg(F.count("*").alias("__c12"))
        .where(F.spark_partition_id() >= 0)
    )
    # The always-true __c12 references keep column pruning from dropping
    # the count out of these consumers' copies of the c12 child (a pruned
    # copy is a different subtree — no ReuseExchange; see terms.bm25_topk).
    c12_full = c12.where(F.col("__c12") > 0)
    ctx = c12.groupBy("w1").agg(
        F.sum("__c12").alias("__c1"), F.count("*").alias("__n1f")
    )
    cont = c12_full.groupBy("w2").agg(F.count("*").alias("__n1b"))
    vocab = train.select(F.explode(tokens(F.col(text_col))).alias("w")).agg(
        F.count_distinct("w").cast("double").alias("__v")
    )
    n_big = c12_full.agg(F.count("*").cast("double").alias("__b"))
    sc = df.select(
        F.col(id_col), F.explode(bigram_pairs(F.col(text_col))).alias("p")
    ).select(id_col, "p.w1", "p.w2")
    d = F.lit(discount)
    pcont = (F.coalesce(F.col("__n1b"), F.lit(0)) + F.lit(1.0)) / (
        F.col("__b") + F.col("__v")
    )
    p_seen_ctx = (
        F.greatest(F.coalesce(F.col("__c12"), F.lit(0)) - d, F.lit(0.0))
        / F.col("__c1")
        + d * F.col("__n1f") / F.col("__c1") * pcont
    )
    p = F.when(F.col("__c1").isNotNull(), p_seen_ctx).otherwise(pcont)
    return (
        sc.join(c12, ["w1", "w2"], "left")
        .join(ctx, "w1", "left")
        .join(cont, "w2", "left")
        .crossJoin(F.broadcast(n_big))
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(-F.log(p)), 4).alias("nll"),
        )
    )


def ppl_buckets(
    scored: DataFrame,
    *,
    n_buckets: int = 3,
    score_col: str = "nll",
    id_col: str = "doc_id",
    exact: bool = False,
) -> DataFrame:
    """Add a ``bucket`` column (1 = head/lowest nll ... n = tail).

    ``exact=True`` (contract scale — opt-in, never the default: a user
    calling this naively at corpus scale must not land on a
    single-partition stage): exact n-tile over (score, id) —
    deterministic under ties, but a global-ordered single-partition
    window over DOC-level rows.

    ``exact=False`` (the DEFAULT, the 10^12-doc path): threshold
    assignment —
    ``approx_percentile`` computes the n-1 score boundaries as one
    distributed aggregate, the 1-row boundary array is broadcast, and
    each doc is assigned by comparison. No global sort, no window, no
    single-partition stage; identical semantics up to boundary-epsilon
    (ties at a boundary all land in the lower bucket rather than being
    split by id)."""
    if exact:
        w = Window.orderBy(F.col(score_col), F.col(id_col))
        return scored.withColumn("bucket", F.ntile(n_buckets).over(w))
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = scored.agg(
        F.percentile_approx(F.col(score_col), probs, 100_000).alias("__bounds")
    )
    bucket = F.lit(1)
    for i in range(n_buckets - 1):
        bucket = bucket + F.when(
            F.col(score_col) > F.element_at("__bounds", i + 1), 1
        ).otherwise(0)
    return (
        scored.crossJoin(F.broadcast(bounds))
        .withColumn("bucket", bucket)
        .drop("__bounds")
    )


# ---------------------------------------------------------------------------
# Gopher-style intra-document repetition signals (Rae et al. 2021, A1.1):
# machine-generated and boilerplate pages repeat themselves — duplicate
# lines, one dominating n-gram, long duplicated n-gram runs. Everything
# is expression-only aggregates keyed on doc_id / (doc_id, gram): fully
# map-side-combinable, no window wider than one document, no UDFs.
# ---------------------------------------------------------------------------


def repetition_stats(
    df,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ns: tuple[int, ...] = (2, 3),
    dup_n: int = 5,
) -> DataFrame:
    """Per-document repetition fractions, all rounded to 6 decimals:

    - ``dup_line_frac`` / ``dup_line_char_frac``: fraction of nonempty
      lines (and of their characters) that are repeats of an earlier
      identical line;
    - ``top{n}gram_frac`` for n in ``top_ns``: fraction of tokens covered
      by occurrences of the single most frequent token n-gram (capped at
      1 — overlapping occurrences can exceed the doc);
    - ``dup{dup_n}gram_frac``: fraction of token positions covered by any
      {dup_n}-gram that occurs at least twice WITHIN the document
      (interval coverage by the same running-max window as the
      cross-document substring dedup — no interval materialization).
    """
    from pyspark.sql import Window as W

    text, did = F.col(text_col), F.col(id_col)
    toks = tokens(text)
    base = df.select(did, F.size(toks).alias("__nt"))

    # -- line repeats ------------------------------------------------------
    ln = df.select(
        did, F.explode(F.split(text, "\n")).alias("__raw")
    ).select(did, F.trim(F.col("__raw")).alias("__line")).where(F.col("__line") != "")
    per_line = ln.groupBy(id_col, "__line").agg(F.count("*").alias("__c"))
    line_stats = per_line.groupBy(id_col).agg(
        F.round(
            F.sum(F.col("__c") - 1) / F.sum("__c"), 6
        ).alias("dup_line_frac"),
        F.round(
            F.sum((F.col("__c") - 1) * F.length("__line"))
            / F.sum(F.col("__c") * F.length("__line")),
            6,
        ).alias("dup_line_char_frac"),
    )

    out = base.join(line_stats, id_col, "left")

    # -- top n-gram dominance ---------------------------------------------
    for n in top_ns:
        grams = df.select(
            did, F.explode(shingles(text, n)).alias("__g")
        )
        top = (
            grams.groupBy(id_col, "__g")
            .agg(F.count("*").alias("__c"))
            .groupBy(id_col)
            .agg(F.max("__c").alias("__mx"))
        )
        out = out.join(top, id_col, "left").withColumn(
            f"top{n}gram_frac",
            F.round(
                F.least(
                    F.lit(1.0),
                    F.coalesce(F.col("__mx") * n / F.col("__nt"), F.lit(0.0)),
                ),
                6,
            ),
        ).drop("__mx")

    # -- duplicated n-gram coverage ---------------------------------------
    pos = df.select(did, F.posexplode(shingles(text, dup_n)).alias("__p", "__g"))
    dup = (
        pos.groupBy(id_col, "__g")
        .agg(F.count("*").alias("__c"))
        .where(F.col("__c") >= 2)
        .select(id_col, "__g")
    )
    starts = pos.join(dup, [id_col, "__g"]).select(
        did, F.col("__p").alias("__i"), F.lit(1).alias("__s")
    )
    tok = df.select(did, F.posexplode(toks).alias("__i", "__t"))
    w = W.partitionBy(id_col).orderBy("__i").rowsBetween(W.unboundedPreceding, 0)
    cover = F.max(F.when(F.col("__s") == 1, F.col("__i") + dup_n)).over(w)
    covered = (
        tok.join(starts, [id_col, "__i"], "left")
        .withColumn("__cov", (cover.isNotNull() & (F.col("__i") < cover)).cast("long"))
        .groupBy(id_col)
        .agg(F.sum("__cov").alias("__ncov"))
    )
    out = out.join(covered, id_col, "left").withColumn(
        f"dup{dup_n}gram_frac",
        F.round(F.coalesce(F.col("__ncov") / F.col("__nt"), F.lit(0.0)), 6),
    )
    return (
        out.withColumn("dup_line_frac", F.coalesce("dup_line_frac", F.lit(0.0)))
        .withColumn(
            "dup_line_char_frac", F.coalesce("dup_line_char_frac", F.lit(0.0))
        )
        .select(
            id_col,
            F.col("__nt").cast("long").alias("n_toks"),
            "dup_line_frac",
            "dup_line_char_frac",
            *[f"top{n}gram_frac" for n in top_ns],
            f"dup{dup_n}gram_frac",
        )
    )


# ---------------------------------------------------------------------------
# Linear quality classifier: the engine seam where a trained fastText /
# logistic-regression quality model plugs in (CCNet's wiki-vs-crawl
# classifier, RedPajama's quality heads). Inference is a dot product over
# engine-computed features — one codegen projection, no model runtime —
# so a trained weight vector drops in as config without touching the
# plan. Weights here are config data, not learned artifacts.
# ---------------------------------------------------------------------------

#: Reference weights for the built-in feature set (intercept + per-feature).
QUALITY_WEIGHTS = {
    "intercept": -2.0,
    "len_score": 3.0,      # min(n_tokens/100, 1)
    "punct_ratio": -4.0,
    "stop_ratio": 5.0,
}


def linear_quality(
    df: DataFrame,
    *,
    weights: dict[str, float] | None = None,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, logit, prob, keep): sigmoid(w·x + b) over the standard
    length/punctuation/stopword features; keep = prob >= threshold.
    ``logit``/``prob`` round to 6 decimals so external oracles agree
    after their own exp().

    Scale: a single narrow projection (regex + array ops, all codegen);
    swap ``weights`` for a trained model's coefficients to deploy it."""
    w = weights or QUALITY_WEIGHTS
    text = F.col(text_col)
    toks = tokens(text)
    n_tokens = F.size(toks)
    n_chars = F.length(text)
    punct = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    punct_ratio = punct / F.greatest(n_chars, F.lit(1))
    stop = _hits(toks, LANG_MARKERS["en"])
    stop_ratio = stop / F.greatest(n_tokens, F.lit(1))
    len_score = F.least(n_tokens / F.lit(100.0), F.lit(1.0))
    logit = (
        F.lit(float(w["intercept"]))
        + F.lit(float(w["len_score"])) * len_score
        + F.lit(float(w["punct_ratio"])) * punct_ratio
        + F.lit(float(w["stop_ratio"])) * stop_ratio
    )
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))
    return df.select(
        F.col(id_col),
        F.round(logit, 6).alias("logit"),
        F.round(prob, 6).alias("prob"),
        (prob >= F.lit(float(threshold))).alias("keep"),
    )


def sentences(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, sent_no, sentence): regex sentence segmentation — runs of
    non-terminators plus their trailing .!? group, trimmed. Portable
    pattern (no lookbehind) so RE2-based oracles reproduce it exactly;
    one narrow posexplode, no shuffle."""
    segs = F.regexp_extract_all(F.col(text_col), F.lit(r"[^.!?]+[.!?]*"), 0)
    return (
        df.select(F.col(id_col), F.posexplode(segs).alias("sent_no", "__s"))
        .select(id_col, "sent_no", F.trim(F.col("__s")).alias("sentence"))
        .where(F.col("sentence") != "")
    )


def chunk_tokens(
    df: DataFrame,
    *,
    chunk: int = 128,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, chunk_no, chunk_text, n_toks): fixed-size token windows with
    optional overlap — the embedding-prep splitter (every RAG/embedding
    pipeline runs one). Stride = chunk - overlap; the final partial
    window is kept. Pure array expressions (sequence + slice off one
    tokens() array), one narrow posexplode — no shuffle, no UDF."""
    if not 0 <= overlap < chunk:
        raise ValueError("need 0 <= overlap < chunk")
    stride = chunk - overlap

    def chunks_of(toks: Column) -> Column:
        n = F.size(toks)
        n_chunks = F.greatest(F.ceil((n - F.lit(overlap)) / F.lit(stride)), F.lit(1))
        starts = F.sequence(F.lit(0), (n_chunks - 1) * stride, F.lit(stride))
        return F.transform(starts, lambda s: F.slice(toks, s + 1, F.lit(chunk)))

    chunks = bind(tokens(F.col(text_col)), chunks_of)
    return df.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_no", "__c")
    ).select(
        id_col,
        "chunk_no",
        F.array_join("__c", " ").alias("chunk_text"),
        F.size("__c").alias("n_toks"),
    )


# ---------------------------------------------------------------------------
# C4-style line/page cleaning (Raffel et al., "Exploring the Limits of
# Transfer Learning with a Unified Text-to-Text Transformer", JMLR 2020
# §2.2, and the public TFDS c4_utils.clean_page rule set).
# ---------------------------------------------------------------------------

#: Published policy-line substrings (TFDS _POLICY_SUBSTRINGS).
C4_POLICY_SUBSTRINGS = (
    "terms of use",
    "privacy policy",
    "cookie policy",
    "uses cookies",
    "use of cookies",
    "use cookies",
)

_C4_CITATION_RE = r"\[\d*\]|\[edit\]|\[citation needed\]"


def c4_clean(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = 5,
    min_num_sentences: int = 3,
    max_word_length: int = 1000,
    policy_substrings: tuple[str, ...] = C4_POLICY_SUBSTRINGS,
) -> DataFrame:
    """C4's line- and page-level cleaning, per-line rule chain in the
    published order: strip; drop lines containing any word over
    ``max_word_length`` chars (checked BEFORE citation removal, and a
    LINE drop, not a page drop — TFDS ``clean_page``'s
    ``line_has_too_long_word`` is a ``continue``, so a page with one
    long URL/base64 token keeps its other lines; round-4 ADVICE fix);
    citation-marker removal; drop lines not ending in a terminal mark
    (. ? ! \") or ending in an ellipsis; drop lines under
    ``min_words_per_line`` words; a surviving line containing "lorem
    ipsum" drops the PAGE; "javascript" lines are skipped; a surviving
    line containing "{" drops the PAGE; policy lines (cookie/terms
    boilerplate) are skipped. Pages also drop when fewer than
    ``min_num_sentences`` sentences survive. Sentences are counted as
    terminal-mark occurrences in retained lines (a deterministic
    stand-in for the original's English sentence tokenizer — no nltk at
    executor scale, and the count only gates a >=3 threshold).

    Returns (id, clean_text, n_lines, n_kept, n_sentences, page_keep);
    dropped pages keep their row with clean_text = '' so lineage
    accounting and keep-rate monitors see them.

    Scale: one projection chain of array expressions — no shuffle, no
    UDF, no explode; each stage's array materialises once per row via
    chained selects (CLAUDE.md multi-reference gotcha)."""
    text = F.col(text_col)
    raw_lines = F.split(text, r"\n")
    # TFDS order: trim → per-LINE too-long-word drop (pre-citation-removal)
    # → citation-marker removal on the survivors.
    stripped = F.transform(
        F.filter(
            F.transform(raw_lines, F.trim),
            lambda l: ~l.rlike(r"\S{%d}" % (max_word_length + 1)),
        ),
        lambda l: F.regexp_replace(l, _C4_CITATION_RE, ""),
    )
    s0 = df.select(
        F.col(id_col),
        F.size(raw_lines).alias("n_lines"),
        stripped.alias("__l1"),
    )
    # survive end-mark + ellipsis + min-words
    s1 = F.filter(
        F.col("__l1"),
        lambda l: l.rlike(r'[.?!"]$')
        & ~l.rlike(r"\.\.\.$")
        & (F.size(F.split(l, r"\s+")) >= min_words_per_line),
    )
    s0 = s0.select("*", s1.alias("__s1")).drop("__l1")
    lorem = F.exists(
        F.col("__s1"), lambda l: F.lower(l).contains("lorem ipsum")
    )
    s2 = F.filter(
        F.col("__s1"), lambda l: ~F.lower(l).contains("javascript")
    )
    s0 = s0.select(
        "*", lorem.alias("__lorem"), s2.alias("__s2")
    ).drop("__s1")
    curly = F.exists(F.col("__s2"), lambda l: l.contains("{"))

    def no_policy(l: Column) -> Column:
        cond = F.lit(True)
        for p in policy_substrings:
            cond = cond & ~F.lower(l).contains(p)
        return cond

    s3 = F.filter(F.col("__s2"), no_policy)
    s0 = s0.select("*", curly.alias("__curly"), s3.alias("__s3")).drop("__s2")
    n_sent = F.aggregate(
        F.col("__s3"),
        F.lit(0),
        lambda acc, l: acc + F.size(F.regexp_extract_all(l, F.lit(r"[.?!]"), F.lit(0))),
    )
    s0 = s0.select("*", n_sent.alias("n_sentences"))
    keep = (
        ~F.col("__lorem")
        & ~F.col("__curly")
        & (F.col("n_sentences") >= min_num_sentences)
    )
    return s0.select(
        id_col,
        F.when(keep, F.array_join("__s3", "\n")).otherwise(F.lit("")).alias(
            "clean_text"
        ),
        "n_lines",
        F.when(keep, F.size("__s3")).otherwise(F.lit(0)).alias("n_kept"),
        "n_sentences",
        keep.alias("page_keep"),
    )


def winnow_fingerprints(
    df: DataFrame,
    *,
    k: int = 3,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every token k-gram, slide a
    ``window`` over the hash sequence and select the MINIMUM of each
    window (ties to the RIGHTMOST occurrence), dedup selected
    positions. Guarantees: any shared run of ≥ window+k-1 tokens shares
    at least one fingerprint, and density is ~2/(window+1) — the
    published local-sampling sweet spot between "hash everything"
    (rolling_fingerprint's stride grid) and "hash nothing matches".
    Shorter documents (< window hashes) winnow their whole sequence as
    one window. Output: (id, pos, fp) — exploded skinny rows ready for
    the same equi-join/dedup machinery shingle tables use.

    Pure array expressions per document (hashes bound ONCE via
    dedup.bind — the HOF re-inlining gotcha is real), one narrow
    posexplode-shaped explode, no shuffle, no UDF; md5-derived hashes
    replay dyadic-exact cross-engine."""
    if window < 1:
        raise ValueError("window must be >= 1")
    sh = shingles(F.col(text_col), k)
    hashes = F.transform(
        sh,
        lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long"),
    )

    def selected(hs: Column) -> Column:
        n = F.size(hs)
        starts = F.sequence(F.lit(1), F.greatest(n - window + 1, F.lit(1)))
        picks = F.transform(
            starts,
            lambda j: F.struct(
                (
                    j
                    + F.array_max(
                        F.filter(
                            F.sequence(F.lit(0), F.least(F.lit(window - 1), n - j)),
                            lambda i: F.try_element_at(hs, j + i)
                            == F.array_min(F.slice(hs, j, window)),
                        )
                    )
                ).alias("pos"),
                F.array_min(F.slice(hs, j, window)).alias("fp"),
            ),
        )
        return F.array_distinct(picks)

    out = df.select(
        F.col(id_col),
        F.explode(F.when(F.size(sh) > 0, bind(hashes, selected))).alias("__s"),
    )
    return out.select(
        id_col,
        (F.col("__s.pos") - 1).alias("pos"),
        F.col("__s.fp").alias("fp"),
    )


def readability(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 4,
) -> DataFrame:
    """Flesch Reading Ease + Flesch–Kincaid grade level (Kincaid et
    al. 1975) per document — the classic surface-readability gate
    (complexity-band mixing, kid-safe filtering, OCR-garbage triage
    where syllable density explodes):

        ease  = 206.835 − 1.015·(words/sentences) − 84.6·(syll/words)
        grade = 0.39·(words/sentences) + 11.8·(syll/words) − 15.59

    Syllables use the standard vowel-group heuristic (runs of
    [aeiouy], minimum 1 per word — exactly replayable cross-engine,
    unlike dictionary syllabifiers); sentences count terminal-mark
    runs, minimum 1. Zero-word documents yield NULL scores via
    try_divide, never a throw. Pure array expressions, no shuffle."""
    text = F.col(text_col)
    # blank text tokenizes to [''] — filter so zero-word docs read 0/NULL
    toks = F.filter(tokens(text), lambda t: t != "")
    n_words = F.size(toks)
    n_sent = F.greatest(
        F.size(F.regexp_extract_all(text, F.lit(r"[.!?]+"), F.lit(0))),
        F.lit(1),
    )
    n_syll = F.aggregate(
        toks,
        F.lit(0),
        lambda acc, w: acc
        + F.greatest(
            F.size(F.regexp_extract_all(w, F.lit(r"[aeiouy]+"), F.lit(0))),
            F.lit(1),
        ),
    )
    wps = F.try_divide(n_words.cast("double"), n_sent)
    spw = F.try_divide(n_syll.cast("double"), n_words)
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        n_sent.alias("n_sentences"),
        n_syll.alias("n_syllables"),
        F.round(F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw, round_to).alias(
            "reading_ease"
        ),
        F.round(F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59), round_to).alias(
            "fk_grade"
        ),
    )


# ---------------------------------------------------------------------------
# Mojibake (UTF-8 read as cp1252) detection + repair — the ftfy problem
# class, scoped to the deterministic double-encoding case that dominates
# web corpora. The map is COMPUTED (ch.encode('utf-8').decode('cp1252'))
# for the common Western accented set + punctuation, not hand-typed;
# bytes unmappable in cp1252 (0x81/8D/8F/90/9D — e.g. the right double
# quote's 0x9D) are exactly the cases a replace chain cannot round-trip
# and are left to a bytes-level seam. Control-ish artifact chars (soft
# hyphen, nbsp) are spelled as escapes on purpose.
# ---------------------------------------------------------------------------

MOJIBAKE_MAP: tuple[tuple[str, str], ...] = tuple(
    (ch.encode("utf-8").decode("cp1252"), ch)
    for ch in "\u00e1\u00e9\u00ed\u00f3\u00fa\u00e3\u00f5\u00e7"
              "\u00e2\u00ea\u00f4\u00e0\u00e8\u00ec\u00f2\u00f9"
              "\u00fc\u00f1\u2019\u201c\u2013\u2014\u00b7"
)

#: Artifact detector: the lead chars of double-encoded Western text.
_MOJIBAKE_RE = "(?:\u00c3[\u0080-\u00bf\u00ad\u00a0]|\u00e2\u20ac.|\u00c2[\u00a0-\u00bf])"


def mojibake_fix(col: Column) -> Column:
    """Repair the deterministic UTF-8-as-cp1252 double-encoding for the
    computed Western map — 3-char sequences first (curly punctuation)
    so their lead pair is never half-eaten by a 2-char rule."""
    out = col
    for bad, good in sorted(MOJIBAKE_MAP, key=lambda kv: -len(kv[0])):
        out = F.replace(out, F.lit(bad), F.lit(good))
    return out


def mojibake_stats(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_artifacts, n_chars, artifacts_per_kchar, fixed_text): the
    encoding-health gate (a slice whose artifact rate jumps is an
    upstream decode regression) plus the repaired text. Scan-side
    regexp count + the replace chain; no shuffle."""
    text = F.col(text_col)
    n_art = F.size(
        F.regexp_extract_all(text, F.lit(_MOJIBAKE_RE), F.lit(0))
    )
    return df.select(
        F.col(id_col),
        n_art.alias("n_artifacts"),
        F.length(text).alias("n_chars"),
        F.round(
            F.try_divide(n_art * F.lit(1000.0), F.length(text)), 6
        ).alias("artifacts_per_kchar"),
        mojibake_fix(text).alias("fixed_text"),
    )
