"""Deduplication operators for web-scale training-data pipelines.

Five dedup families, all expressed as DataFrame ops (no Python in the hot
path; everything whole-stage-codegen'd or hash-aggregated JVM-side):

- exact:      hash-groupBy on canonicalized text (one shuffle, map-side
              partial agg).
- MinHash+LSH: shingle → per-seed min-hash → band → bucket self-join.
              Cross-engine-deterministic hashing: the per-seed hash of a
              shingle is ``md5(seed ':' shingle)`` and the min is the
              LEXICOGRAPHIC min of the hex strings — identical in any
              engine that has md5, which is what lets the DuckDB oracle
              verify signatures bit-for-bit.
- SimHash:    token-level 16-bit signature from md5 hex-digit parities.
- n-gram Jaccard: candidate-scoped (same `scope_col`) shingle-set overlap.
- embedding near-dup: cosine over `array<float>` via zip_with/aggregate.

Scale notes (100 TB): the LSH bucket join is the only quadratic-risk step —
bucket sizes are bounded by banding (r rows per band), the self-join is an
equi-join on (band_idx, band_key) so AQE skew handling applies, and
candidate verification stays proportional to true-duplicate density, which
is the point of LSH. Exact dedup is a single hash aggregate; signatures are
one explode + one partial-aggregated groupBy each.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def squeeze_lower(col: Column) -> Column:
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def tokens(col: Column) -> Column:
    return F.split(squeeze_lower(col), " ")


def bind(col: Column, f) -> Column:
    """Evaluate ``col`` exactly once per row and pass the result to ``f``
    as a bound lambda variable (via a single-element ``transform``).

    Catalyst re-inlines a multi-referenced expression at every reference —
    harmless for cheap exprs, catastrophic when the reference sits INSIDE
    a higher-order-function lambda: the full expression (e.g. the
    regexp+split token array) re-evaluates per ARRAY ELEMENT. shingles()
    measured 6.6× slower that way, with 5 regexp_replace copies in the
    optimized plan instead of 1 (the CLAUDE.md multi-reference gotcha,
    HOF edition)."""
    return F.element_at(F.transform(F.array(col), f), 1)


def shingles(col: Column, k: int = 3) -> Column:
    """Word k-gram shingles of a text column (array<string>; empty when the
    doc has fewer than k tokens).

    The token split is ``bind``-ed so it evaluates exactly once per row
    (see ``bind`` — referencing ``tokens(col)`` inside the per-shingle
    lambda re-evaluates the regexp+split per array element; measured 6.6×
    slower on the sf0.1 corpus)."""

    def grams_of(toks: Column) -> Column:
        n = F.size(toks)
        idx = F.sequence(F.lit(1), n - (k - 1))
        grams = F.transform(
            idx,
            lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(k)]),
        )
        return F.when(n >= k, grams).otherwise(F.array().cast("array<string>"))

    return bind(tokens(col), grams_of)


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: (text_md5, keep_id, n_copies). Keep = min id
    (deterministic winner)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


def seed_hash(shingle: Column, seed: int) -> Column:
    """Deterministic per-seed shingle hash usable from any md5-capable
    engine: md5 hex of 'seed:shingle' (compared lexicographically)."""
    return F.md5(F.concat(F.lit(f"{seed}:"), shingle))


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n_hashes: int = 8, k: int = 3
) -> DataFrame:
    """(id, h0..h{n-1}) — per-seed lexicographic-min md5 over shingles.
    One explode + one groupBy with n partial-aggregated mins."""
    sh = df.select(F.col(id_col), F.explode(shingles(F.col(text_col), k)).alias("s"))
    aggs = [F.min(seed_hash(F.col("s"), j)).alias(f"h{j}") for j in range(n_hashes)]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidates(
    sig: DataFrame, id_col: str = "doc_id", n_hashes: int = 8, band_size: int = 2
) -> DataFrame:
    """Candidate near-dup pairs: docs agreeing on any full band of the
    signature. Returns distinct (a, b) with a < b."""
    n_bands = n_hashes // band_size
    bands = F.array(
        *[
            F.concat_ws("|", *[F.col(f"h{b * band_size + r}") for r in range(band_size)])
            for b in range(n_bands)
        ]
    )
    exploded = sig.select(
        F.col(id_col).alias("id"), F.posexplode(bands).alias("band_idx", "band_key")
    )
    left = exploded.alias("l")
    right = exploded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .distinct()
    )


def simhash16(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """16-bit SimHash from token md5 hex-digit parities: bit j is set when
    the majority of tokens have an odd j-th md5 hex digit. (id, simhash)."""
    tok = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("t"))
    tok = tok.withColumn("h", F.md5("t"))
    aggs = [
        F.sum(
            (F.ascii(F.substring("h", j + 1, 1)) % 2) * 2 - 1
        ).alias(f"s{j}")
        for j in range(16)
    ]
    sums = tok.groupBy(id_col).agg(*aggs)
    sim = None
    for j in range(16):
        bit = F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sim = bit if sim is None else sim + bit
    return sums.select(F.col(id_col), sim.alias("simhash"))


def hamming16(a: Column, b: Column) -> Column:
    """Popcount of xor (near-dup test on simhash values)."""
    return F.bit_count(a.bitwiseXOR(b))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    scope_col: str | None = None,
    k: int = 3,
    threshold: float = 0.05,
    max_df: int | None = None,
) -> DataFrame:
    """Pairwise Jaccard over distinct k-gram sets, scoped to `scope_col`
    groups to bound the self-join (at 100 TB you NEVER all-pairs; the scope
    is the LSH bucket / host / source).

    The join is shingle-keyed, never all-pairs — but with no scope a
    Zipf-hot shingle shared by millions of docs still explodes the pair
    list, so an unscoped call REQUIRES ``max_df``: shingles whose document
    frequency exceeds it are dropped before the join (sizes are computed
    on the pruned sets, so Jaccard stays internally consistent over the
    pruned shingle universe — ubiquitous shingles carry no near-dup
    signal anyway). A hot shingle then contributes at most max_df^2/2
    candidate pairs instead of n^2/2."""
    if scope_col is None and max_df is None:
        raise ValueError(
            "ngram_jaccard_pairs without scope_col needs max_df: an unscoped "
            "shingle join blows up on Zipf-hot shingles at scale — pass the "
            "LSH-bucket/host/source column as scope_col, or a max document "
            "frequency above which shingles are pruned"
        )
    sh = df.select(
        F.col(id_col).alias("id"),
        (F.col(scope_col) if scope_col else F.lit("all")).alias("scope"),
        F.explode_outer(F.array_distinct(shingles(F.col(text_col), k))).alias("s"),
    )
    if max_df is not None:
        hot = (
            sh.groupBy("scope", "s")
            .agg(F.count("*").alias("__df"))
            .where(F.col("__df") > max_df)
            .select("scope", "s")
        )
        sh = sh.join(hot, ["scope", "s"], "left_anti")
    sizes = sh.groupBy("id", "scope").agg(F.count("s").alias("sz"))
    l, r = sh.alias("l"), sh.alias("r")
    inter = (
        l.join(
            r,
            (F.col("l.scope") == F.col("r.scope"))
            & (F.col("l.s") == F.col("r.s"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .groupBy(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("id").alias("b"), F.col("sz").alias("szb"))
    out = (
        inter.join(sa, "a")
        .join(sb, "b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("a", "b", F.round("jaccard", 6).alias("jaccard"))


def contamination(
    df: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Benchmark-contamination check: per document, how many of its distinct
    word k-shingles appear in the benchmark corpus `bench` (any text
    column named `text_col`). The benchmark shingle set is distinct-ed and
    broadcast — at 100 TB the corpus side stays a scan + broadcast-hash
    semi-join, no shuffle of the corpus. Output: (id, n_shingles,
    n_contaminated, contamination_ratio)."""
    bench_sh = F.broadcast(
        bench.select(F.explode(shingles(F.col(text_col), k)).alias("s")).distinct()
    )
    doc_sh = df.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), k)).alias("s")
    ).distinct()
    totals = doc_sh.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
    hits = (
        doc_sh.join(bench_sh, "s", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_contaminated"))
    )
    out = (
        df.select(id_col)
        .join(totals, id_col, "left")
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
        )
    )
    return out.withColumn(
        "contamination_ratio",
        F.round(
            F.col("n_contaminated") / F.greatest(F.col("n_shingles"), F.lit(1)), 6
        ),
    )


# ---------------------------------------------------------------------------
# Line-level cross-corpus dedup (CCNet-style, Wenzek et al. 2020: drop the
# lines that repeat across many documents — navigation chrome, cookie
# banners, boilerplate the block classifier can't see because it IS the
# page template). Unit is a (id, line_no, line) frame, same generic shape
# the boilerplate operator scores, produced by `line_frame` (regex split)
# or `chunk_frame` (fixed word windows for corpora without line structure).
#
# Scale (10^12 docs): the count is one hash aggregate with map-side partial
# combine, keyed on md5(line) so the shuffle carries 32-byte keys instead
# of arbitrary-length text; the removal is a left-anti equi-join on the
# same key (AQE skew-split applies — empty/ubiquitous lines are exactly the
# skewed keys). Both stages hash-partition on the key, nothing is
# collected to the driver.
# ---------------------------------------------------------------------------


def line_frame(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    pattern: str = r"\n",
) -> DataFrame:
    """(id, line_no, line): one row per regex-split line, empties dropped
    (document order kept in line_no, gaps where empties were)."""
    return (
        docs.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), pattern)).alias("line_no", "line"),
        )
        .where(F.trim("line") != "")
    )


def chunk_frame(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_words: int = 3,
) -> DataFrame:
    """(id, line_no, line) by non-overlapping n-word windows — the line
    unit for corpora whose text carries no newline structure."""

    def chunks_of(toks: Column) -> Column:
        n_chunks = (F.size(toks) + (n_words - 1)).cast("long") / n_words
        return F.transform(
            F.sequence(F.lit(0), F.floor(n_chunks).cast("int") - 1),
            lambda i: F.array_join(F.slice(toks, i * n_words + 1, n_words), " "),
        )

    chunks = bind(F.split(F.col(text_col), " "), chunks_of)
    return docs.select(
        F.col(id_col), F.posexplode(chunks).alias("line_no", "line")
    )


def common_lines(
    lines: DataFrame, *, min_docs: int = 2, id_col: str = "doc_id"
) -> DataFrame:
    """(line_key, n_docs) for lines appearing in >= min_docs distinct
    documents; line_key = md5(line)."""
    return (
        lines.groupBy(F.md5(F.col("line")).alias("line_key"))
        .agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )


def drop_common_lines(
    lines: DataFrame, *, min_docs: int = 2, id_col: str = "doc_id"
) -> DataFrame:
    """Remove every instance of a line that appears in >= min_docs distinct
    documents (CCNet's template-line removal), preserving the rest of the
    frame unchanged."""
    common = common_lines(lines, min_docs=min_docs, id_col=id_col)
    keyed = lines.withColumn("__line_key", F.md5(F.col("line")))
    return (
        keyed.join(
            common, keyed["__line_key"] == common["line_key"], "left_anti"
        ).drop("__line_key")
    )


def reassemble_lines(
    lines: DataFrame, *, id_col: str = "doc_id", sep: str = "\n"
) -> DataFrame:
    """(id, text): lines rejoined in line_no order — the cleaned document
    after `drop_common_lines`."""
    packed = F.array_sort(F.collect_list(F.struct("line_no", "line")))
    return lines.groupBy(id_col).agg(
        F.array_join(F.transform(packed, lambda s: s["line"]), sep).alias("text")
    )


def paragraph_dedup(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    split_pattern: str = r"\n+",
    joiner: str = "\n",
) -> DataFrame:
    """Corpus-wide keep-first paragraph dedup with document
    reconstruction (CCNet's per-paragraph hash dedup, Wenzek et al.
    2019 §3.1): split every document into paragraphs, hash the
    normalized paragraph, keep only its FIRST occurrence corpus-wide
    (global (doc, position) order), and rebuild each document from its
    surviving paragraphs. Complements ``drop_common_lines`` (which
    removes EVERY instance of a template line): here one copy of each
    repeated paragraph survives, so content is never lost, only
    repetition.

    Returns (id_col, clean_text, n_paras, n_dropped); documents whose
    normalized text has no non-empty paragraph are absent from the
    output (nothing to deduplicate).

    Scale (100 TB): first-occurrence election is ONE hash aggregate on
    the paragraph hash (min over a packed (doc, pos) struct — map-side
    combinable), the keep/drop decision an equi-join back on the hash,
    and reconstruction a per-document sorted-array aggregate — no
    corpus-wide window, no driver state. Boilerplate paragraphs (the
    operator's whole point) concentrate on single hash keys, but the
    rows carried per key are skinny (hash, doc, pos) and the aggregate /
    join are AQE-skew-splittable."""
    paras = (
        df.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), split_pattern)).alias(
                "para_idx", "para"
            ),
        )
        # normalize per paragraph for the HASH only (CCNet dedups on the
        # normalized form but emits the raw paragraph); splitting must see
        # the RAW text — squeeze_lower would erase the '\n' boundaries.
        .withColumn("__norm", squeeze_lower(F.col("para")))
        .where(F.length("__norm") > 0)
        .withColumn("para_key", F.md5(F.col("__norm")))
        .drop("__norm")
    )
    first = paras.groupBy("para_key").agg(
        F.min(F.struct(F.col(id_col), F.col("para_idx"))).alias("__first")
    )
    kept = paras.join(first, "para_key").where(
        (F.col(f"__first.{id_col}") == F.col(id_col))
        & (F.col("__first.para_idx") == F.col("para_idx"))
    )
    packed = F.array_sort(F.collect_list(F.struct("para_idx", "para")))
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(F.transform(packed, lambda s: s["para"]), joiner).alias(
            "clean_text"
        ),
        F.count("*").alias("__n_kept"),
    )
    stats = paras.groupBy(id_col).agg(F.count("*").alias("n_paras"))
    return stats.join(rebuilt, id_col, "left").select(
        id_col,
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        "n_paras",
        (F.col("n_paras") - F.coalesce("__n_kept", F.lit(0))).alias("n_dropped"),
    )


# ---------------------------------------------------------------------------
# Exact substring dedup (Lee et al. 2022, "Deduplicating Training Data
# Makes Language Models Better"): remove the PASSAGES that repeat across
# documents, not whole documents. The reference method builds a corpus
# suffix array; the Spark-first equivalent anchors matches at a fixed
# word-gram length n — every token covered by an n-gram that also occurs
# in >= min_docs documents is cut, so any shared substring of >= n words
# is removed end to end (suffix-array maximal matches differ only below
# the n-token threshold).
#
# Scale: one explode (n-grams with positions, md5 keys), one hash
# aggregate for the duplicated-gram set, one equi-join back, and one
# per-doc window for interval coverage — the same running-max
# gaps-and-islands shape as tables.assign_columns. All shuffles key on
# 32-byte hashes or doc ids; no driver collection; skewed keys (the
# ubiquitous grams) are exactly what AQE skew handling splits.
# ---------------------------------------------------------------------------


def ngram_positions(
    docs: DataFrame,
    *,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, pos, gram_key): every overlapping word n-gram with its 0-based
    start token position; gram_key = md5 of the space-joined gram."""

    def grams_of(toks: Column) -> Column:
        nt = F.size(toks)
        idx = F.sequence(F.lit(1), nt - (n - 1))
        return F.when(
            nt >= n,
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ", *[F.element_at(toks, i + j) for j in range(n)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    grams = bind(tokens(F.col(text_col)), grams_of)
    return docs.select(
        F.col(id_col), F.posexplode(grams).alias("pos", "gram")
    ).select(id_col, "pos", F.md5("gram").alias("gram_key"))


def drop_duplicated_spans(
    docs: DataFrame,
    *,
    n: int = 5,
    min_docs: int = 2,
    keep_first: bool = False,
    id_col: str = "doc_id",
    text_col: str = "text",
    dup_join: str = "shuffle",
) -> DataFrame:
    """(id, clean_text, n_tokens, n_dropped): documents with every
    cross-document duplicated passage (shared word n-gram runs) removed.

    ``keep_first=True`` switches to keep-one-copy semantics (the Lee et
    al. production setting): the LOWEST doc id containing a duplicated
    gram keeps its occurrence; only the other documents lose the span.
    One extra min-aggregate on the gram key, same join shape.

    Coverage is computed without materializing intervals: a token i is
    covered iff some duplicated gram starts at p <= i with p + n > i,
    i.e. iff the running max of (start + n) over starts <= i exceeds i —
    one window pass per document.

    Scale note: the n-gram explode runs twice (once into the duplicated-
    gram aggregate, once for the join back). That is deliberate —
    recompute-over-store: persisting the exploded grams would stage ~n×
    the corpus bytes, while the recompute is scan+codegen.

    ``dup_join`` picks the join-back strategy for the dup-gram set:

    - ``"shuffle"`` (default): plain equi-join — right when dup grams are
      a large fraction of all grams (heavily duplicated corpora).
    - ``"broadcast"``: the dup-gram set is usually the SMALL side (most
      grams are unique); broadcasting it turns the join-back into a
      broadcast-hash join, so the exploded corpus grams are never
      shuffled at all — the win at extreme corpus sizes. Exact same
      output. (A bloom pre-filter is the in-between when the dup set
      outgrows broadcast but stays << the gram stream; with Spark's
      runtime-filter conf on, the broadcast path already injects one.)"""
    from pyspark.sql import Window

    if dup_join not in ("shuffle", "broadcast"):
        raise ValueError(f"dup_join must be 'shuffle' or 'broadcast', got {dup_join!r}")
    pos = ngram_positions(docs, n=n, id_col=id_col, text_col=text_col)
    dup = (
        pos.groupBy("gram_key")
        .agg(
            F.count_distinct(F.col(id_col)).alias("n_docs"),
            F.min(F.col(id_col)).alias("__first_doc"),
        )
        .where(F.col("n_docs") >= min_docs)
        .select("gram_key", "__first_doc")
    )
    joined = pos.join(F.broadcast(dup) if dup_join == "broadcast" else dup, "gram_key")
    if keep_first:
        joined = joined.where(F.col(id_col) != F.col("__first_doc"))
    starts = joined.select(
        F.col(id_col), F.col("pos").alias("i"), F.lit(1).alias("__start")
    )
    return _cut_spans(docs, starts, n=n, id_col=id_col, text_col=text_col)


def _cut_spans(
    docs: DataFrame,
    starts: DataFrame,
    *,
    n: int,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """(id, clean_text, n_tokens, n_dropped): cut every n-token span whose
    start position appears in ``starts`` (columns: id, i, __start=1).

    Coverage without materialized intervals: token i is covered iff the
    running max of (start + n) over starts <= i exceeds i — one window
    pass per document (the gaps-and-islands shape shared with
    drop_duplicated_spans and tables.assign_columns)."""
    from pyspark.sql import Window

    tok = docs.select(
        F.col(id_col), F.posexplode(tokens(F.col(text_col))).alias("i", "tok")
    )
    flagged = tok.join(starts, [id_col, "i"], "left")
    w = (
        Window.partitionBy(id_col)
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cover = F.max(F.when(F.col("__start") == 1, F.col("i") + n)).over(w)
    keep = cover.isNull() | (F.col("i") >= cover)
    kept = flagged.withColumn("__keep", keep)
    packed = F.array_sort(
        F.collect_list(F.when(F.col("__keep"), F.struct("i", "tok")))
    )
    return kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(packed, lambda s: s["tok"]), " "
        ).alias("clean_text"),
        F.count("*").alias("n_tokens"),
        F.sum((~F.col("__keep")).cast("long")).alias("n_dropped"),
    )


def decontaminate_spans(
    docs: DataFrame,
    bench: DataFrame,
    *,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """(id, clean_text, n_tokens, n_dropped): surgical benchmark
    decontamination — remove from every training document the SPANS that
    share a word n-gram with the benchmark/eval corpus, keeping the rest
    of the document (the GPT-3 appendix-C method, applied span-level like
    Lee et al. rather than dropping whole documents; `contamination`
    is the report-only sibling, this is the fix).

    Scale: the benchmark side is tiny by construction (eval suites), so
    its distinct gram-key set is BROADCAST — the corpus-side exploded
    grams are never shuffled; corpus cost is one scan + codegen explode,
    one broadcast semi-join, and the per-doc coverage window. The
    benchmark never sees corpus data (no contamination in the other
    direction either)."""
    pos = ngram_positions(docs, n=n, id_col=id_col, text_col=text_col)
    bgrams = (
        ngram_positions(
            bench.select(F.lit(0).alias("__bid"), F.col(bench_text_col)),
            n=n,
            id_col="__bid",
            text_col=bench_text_col,
        )
        .select("gram_key")
        .distinct()
    )
    starts = pos.join(F.broadcast(bgrams), "gram_key").select(
        F.col(id_col), F.col("pos").alias("i"), F.lit(1).alias("__start")
    )
    return _cut_spans(docs, starts, n=n, id_col=id_col, text_col=text_col)


# ---------------------------------------------------------------------------
# Fuzzy-dedup cluster labeling: LSH emits candidate PAIRS; turning pairs
# into keep/drop decisions needs the connected components of the
# candidate graph (SlimPajama/Dolma pipelines do exactly this). Each
# round does (a) one-hop min-label propagation (equi-join + min-agg on
# the id key) and (b) a pointer-jump — label <- label(label) — which
# doubles the effective hop distance per round, so convergence is
# O(log diameter) rounds, not O(diameter). A fixpoint check (changed
# count per round) exits early and guarantees the EXACT component min,
# not a bounded approximation; localCheckpoint truncates the iterative
# lineage so the per-round plan stays flat. No driver-side graph, no
# collect; at 10^12 edges each round is two shuffles of (id, label)
# pairs. The contract asserts exactness vs DuckDB's recursive-CTE
# transitive closure on the real MinHash candidate graph.
# ---------------------------------------------------------------------------


def cc_labels(
    pairs: DataFrame,
    *,
    max_iter: int = 25,
    a_col: str = "a",
    b_col: str = "b",
    probe_every: int = 2,
    rows_per_partition: int = 500_000,
) -> DataFrame:
    """(id, label): exact connected-component label (the component's min
    doc id) for every node that appears in a candidate pair.

    Propagate-then-jump converges in O(log d) rounds (d = component
    diameter); the loop exits at the first probe round with zero label
    changes, so max_iter=25 covers diameters beyond any real corpus.

    Self-sizing: the candidate graph is orders of magnitude smaller
    than the corpus, so running the iterative stages at the session's
    corpus-width ``spark.sql.shuffle.partitions`` is pure
    task-scheduling overhead (22s → ~3s at sf0.01 against a
    200-partition session). The edge table is checkpointed first (at
    corpus width — deriving it from corpus-scale pairs is corpus
    work), counted (cheap: reads checkpoint blocks), and the loop runs
    with the session's shuffle width temporarily set to
    ``ceil(n_edges / rows_per_partition)`` capped at the caller's
    width, restored on exit. At 10^12 edges the cap leaves corpus
    width in place; at contract scale every round collapses to a
    handful of tasks without the caller resizing anything. (The
    set/restore is safe because cc_labels drives its own actions and
    this engine never plans concurrent queries on one session.)

    Fixpoint probing: each probe is a join + ``limit(1).count()``
    action; propagation is monotone, so rounds past the fixpoint are
    no-ops — probing every ``probe_every`` rounds trades a cheap extra
    no-op round for half the probe actions while still returning the
    EXACT component min."""
    a, b = F.col(a_col), F.col(b_col)
    edges = (
        pairs.select(a.alias("src"), b.alias("dst"))
        .union(pairs.select(b.alias("src"), a.alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    spark = pairs.sparkSession
    sp_key = "spark.sql.shuffle.partitions"
    old_sp = spark.conf.get(sp_key)
    n_part = max(1, min(int(old_sp), -(-edges.count() // rows_per_partition)))
    spark.conf.set(sp_key, str(n_part))
    try:
        labels = (
            edges.select(F.col("src").alias("id"))
            .distinct()
            .withColumn("label", F.col("id"))
            .localCheckpoint()
        )
        for it in range(max_iter):
            nbr = (
                edges.join(labels, edges["dst"] == labels["id"])
                .groupBy("src")
                .agg(F.min("label").alias("nbr_label"))
            )
            hop = labels.join(nbr, labels["id"] == nbr["src"], "left").select(
                F.col("id"),
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            # pointer jump: labels are themselves node ids (min over reached
            # ids, seeded with own id), so label(label) always resolves.
            ptr = hop.select(F.col("id").alias("pid"), F.col("label").alias("plabel"))
            new = (
                hop.join(ptr, hop["label"] == ptr["pid"], "left")
                .select(
                    F.col("id"),
                    F.coalesce(F.col("plabel"), F.col("label")).alias("label"),
                )
                .localCheckpoint()
            )
            if (it + 1) % probe_every == 0 or it == max_iter - 1:
                changed = (
                    new.alias("n")
                    .join(labels.alias("o"), "id")
                    .where(F.col("n.label") != F.col("o.label"))
                    .limit(1)
                    .count()
                )
                if changed == 0:
                    labels = new
                    break
            labels = new
    finally:
        spark.conf.set(sp_key, old_sp)
    return labels


def fuzzy_keep(
    docs: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    max_iter: int = 25,
) -> DataFrame:
    """(id, label, keep): one representative (the min doc id) per
    candidate-pair component keeps; docs in no pair keep trivially."""
    labels = cc_labels(pairs, max_iter=max_iter)
    joined = docs.select(F.col(id_col)).join(
        labels, docs[id_col] == labels["id"], "left"
    )
    label = F.coalesce(F.col("label"), F.col(id_col))
    return joined.select(
        F.col(id_col),
        label.alias("label"),
        (label == F.col(id_col)).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Incremental dedup against a persisted index (the production crawl shape:
# each new batch dedups against everything already KEPT without ever
# re-reading or re-shuffling the old corpus text — only its index rows).
# ---------------------------------------------------------------------------


def band_key_rows(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """(id, key): one row per LSH band of each doc's minhash signature,
    key = 'band_idx|h..|h..' (the flat string form an index stores)."""
    sig = minhash_signatures(df, text_col, id_col, n_hashes=n_hashes)
    n_bands = n_hashes // band_size
    keys = F.array(
        *[
            F.concat_ws(
                "|",
                F.lit(str(b)),
                *[F.col(f"h{b * band_size + r}") for r in range(band_size)],
            )
            for b in range(n_bands)
        ]
    )
    return sig.select(F.col(id_col).alias("id"), F.explode(keys).alias("key"))


def dedup_index(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """Build the persisted dedup index of a kept corpus: (kind, key)
    distinct rows — kind 'md5' (exact text hash) and 'band' (LSH band
    key). O(docs × (1 + n_bands)) skinny string rows; the corpus text
    itself never needs to be read again. Write it partitioned/bucketed
    by key so incremental joins co-locate."""
    ex = df.select(F.lit("md5").alias("kind"), F.md5(text_col).alias("key"))
    bd = band_key_rows(
        df, text_col=text_col, id_col=id_col, n_hashes=n_hashes, band_size=band_size
    ).select(F.lit("band").alias("kind"), "key")
    return ex.unionByName(bd).distinct()


def incremental_dedup(
    new_docs: DataFrame,
    index: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """Dedup a new batch against a kept-corpus index: per new doc
    (doc_id, status) with status ∈ 'exact_dup_index' (text md5 already
    kept), 'near_dup_index' (any minhash band collides with the index),
    'exact_dup_batch' (a smaller-id surviving copy exists in THIS
    batch), 'kept'. Precedence exact > near > batch; an exact-dup group
    shares its bands, so its status is uniform before the batch rule.

    Scale: the old corpus contributes only skinny index rows. Three
    joins, all equi-keyed on the hash/band string (uniform by
    construction — no skew salting needed except Zipf-hot band keys of
    boilerplate near-dup clusters, which AQE skew-split handles), plus
    one batch-scale exact_dedup aggregate. The batch side is typically
    ≪ the index; when small enough, broadcast it by hinting
    ``new_docs`` upstream — the joins here leave strategy to AQE."""
    nd = new_docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("__md5"))
    idx_md5 = index.where(F.col("kind") == "md5").select("key")
    idx_band = index.where(F.col("kind") == "band").select("key")

    exact_hit = (
        nd.join(idx_md5, nd["__md5"] == idx_md5["key"], "left_semi")
        .select(id_col)
        .withColumn("__exact", F.lit(True))
    )
    near_hit = (
        band_key_rows(
            new_docs,
            text_col=text_col,
            id_col=id_col,
            n_hashes=n_hashes,
            band_size=band_size,
        )
        .join(idx_band, "key", "left_semi")
        .select(F.col("id").alias(id_col))
        .distinct()
        .withColumn("__near", F.lit(True))
    )
    keep = exact_dedup(new_docs, text_col, id_col).select(
        F.col("text_md5").alias("__md5k"), F.col("keep_id")
    )
    out = (
        nd.join(exact_hit, id_col, "left")
        .join(near_hit, id_col, "left")
        .join(keep, nd["__md5"] == keep["__md5k"], "left")
    )
    status = (
        F.when(F.col("__exact"), F.lit("exact_dup_index"))
        .when(F.col("__near"), F.lit("near_dup_index"))
        .when(F.col(id_col) != F.col("keep_id"), F.lit("exact_dup_batch"))
        .otherwise(F.lit("kept"))
    )
    return out.select(F.col(id_col), status.alias("status"))


def cdc_chunks(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    mask_bits: int = 5,
    hash_fn: str = "md5",
) -> DataFrame:
    """Content-defined chunking (FastCDC/rsync gear shape): split the
    canonical text at positions where the hash of the trailing
    ``window``-char gram has its low ``mask_bits`` bits zero — expected
    chunk length 2^mask_bits chars. Emits (id, chunk_idx, chunk_md5,
    chunk_len).

    Because breakpoints depend only on LOCAL content, an insertion or
    edit reshapes at most the chunks it touches, so chunk_md5 keys dedupe
    storage across snapshots/near-copies where whole-doc hashing sees
    100% churn. The chunk table is what a 100-TB archive layer joins on
    (store each chunk once, docs become chunk-id lists).

    Deployment note: production CDC adds min/max chunk bounds via a
    stateful pass; this stateless gear is the cross-engine-replayable
    core (the md5 cut rule is the sampling.uniform_hash dyadic trick).

    Expression-only — no UDF, no shuffle (posexplode is narrow). Every
    derived array is ``bind``-ed so nothing re-evaluates per element
    (the HOF re-inlining gotcha).

    ``hash_fn="md5"`` is the cross-engine-replayable gear (any SQL
    oracle reproduces the cut rule); ``"xxhash64"`` swaps in the
    JVM-native hash — same chunking behavior, ~1.3× faster at corpus
    scale (no hex-string round-trip per position), different (engine-
    local) breakpoints.
    """
    mask = 1 << mask_bits
    if hash_fn not in ("md5", "xxhash64"):
        raise ValueError("hash_fn must be 'md5' or 'xxhash64'")

    def chunks_of(c: Column) -> Column:
        n = F.length(c)
        if hash_fn == "xxhash64":
            cut = lambda i: (  # noqa: E731
                F.pmod(
                    F.xxhash64(F.substring(c, i - (window - 1), window)),
                    F.lit(mask),
                )
                == 0
            )
        else:
            cut = lambda i: (  # noqa: E731
                F.conv(
                    F.substring(
                        F.md5(F.substring(c, i - (window - 1), window)), 1, 8
                    ),
                    16,
                    10,
                ).cast("long")
                % mask
                == 0
            )
        ends0 = F.when(
            n >= window, F.filter(F.sequence(F.lit(window), n), cut)
        ).otherwise(F.array().cast("array<int>"))

        def with_ends0(e0: Column) -> Column:
            ends = F.when(
                F.coalesce(F.try_element_at(e0, F.lit(-1)), F.lit(-1)) == n, e0
            ).otherwise(F.concat(e0, F.array(n)))

            def emit(e: Column) -> Column:
                def prev(j: Column) -> Column:
                    return F.when(j == 1, F.lit(0)).otherwise(
                        F.try_element_at(e, j - 1)
                    )

                return F.transform(
                    F.sequence(F.lit(1), F.size(e)),
                    lambda j: F.substring(
                        c, prev(j) + 1, F.element_at(e, j) - prev(j)
                    ),
                )

            return bind(ends, emit)

        return bind(ends0, with_ends0)

    ch = bind(squeeze_lower(F.col(text_col)), chunks_of)
    ex = df.select(F.col(id_col), F.posexplode(ch).alias("chunk_idx", "__chunk"))
    return ex.where(F.length("__chunk") > 0).select(
        F.col(id_col),
        F.col("chunk_idx"),
        F.md5("__chunk").alias("chunk_md5"),
        F.length("__chunk").cast("long").alias("chunk_len"),
    )


def lsh_candidate_prob(s: float, bands: int, rows: int) -> float:
    """P(candidate pair) for a pair with true Jaccard similarity ``s``
    under (bands × rows) MinHash banding: 1 - (1 - s^rows)^bands — the
    MMDS S-curve (Leskovec/Rajaraman/Ullman ch. 3)."""
    return 1.0 - (1.0 - s**rows) ** bands


def lsh_plan(n_hashes: int, threshold: float) -> tuple[int, int]:
    """Choose (bands, rows) with bands·rows = n_hashes whose S-curve
    inflection (1/bands)^(1/rows) sits closest to the target Jaccard
    ``threshold`` — the driver-side config step before
    minhash_signatures/lsh_candidates, so callers stop hand-picking
    band shapes that silently flood (too many bands) or starve (too few)
    the candidate join at 10^12 docs. Pure arithmetic over the divisors
    of n_hashes — no data access."""
    if n_hashes < 1:
        raise ValueError("n_hashes must be >= 1")
    if not (0.0 < threshold < 1.0):
        raise ValueError("threshold must be in (0, 1)")
    best = None
    for rows in range(1, n_hashes + 1):
        if n_hashes % rows:
            continue
        bands = n_hashes // rows
        inflection = (1.0 / bands) ** (1.0 / rows)
        score = abs(inflection - threshold)
        if best is None or score < best[0]:
            best = (score, bands, rows)
    return best[1], best[2]


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    scope_col: str | None = None,
    k: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """ASYMMETRIC near-dup: k-gram set containment C(A⊂B) = |A∩B|/|A|
    per candidate pair — the measure Jaccard misses when a small
    document is swallowed whole by a big one (quoted articles, page-in-
    page mirrors, listicle aggregation): a 100-gram doc fully inside a
    10 000-gram doc has Jaccard ≈ 0.01 but containment 1.0 (Broder
    1997's "containment" companion to resemblance). Emits (a, b, inter,
    sza, szb, c_a_in_b, c_b_in_a) for pairs where EITHER direction
    clears ``threshold``.

    Same scale discipline as `ngram_jaccard_pairs` (shingle-keyed join,
    never all-pairs; unscoped calls REQUIRE max_df hot-shingle pruning,
    with sizes computed on the pruned universe so both containments
    stay internally consistent)."""
    if scope_col is None and max_df is None:
        raise ValueError(
            "containment_pairs without scope_col needs max_df (see "
            "ngram_jaccard_pairs: unscoped shingle joins blow up on "
            "Zipf-hot shingles at scale)"
        )
    sh = df.select(
        F.col(id_col).alias("id"),
        (F.col(scope_col) if scope_col else F.lit("all")).alias("scope"),
        F.explode_outer(F.array_distinct(shingles(F.col(text_col), k))).alias("s"),
    )
    if max_df is not None:
        hot = (
            sh.groupBy("scope", "s")
            .agg(F.count("*").alias("__df"))
            .where(F.col("__df") > max_df)
            .select("scope", "s")
        )
        sh = sh.join(hot, ["scope", "s"], "left_anti")
    sizes = sh.groupBy("id", "scope").agg(F.count("s").alias("sz"))
    l, r = sh.alias("l"), sh.alias("r")
    inter = (
        l.join(
            r,
            (F.col("l.scope") == F.col("r.scope"))
            & (F.col("l.s") == F.col("r.s"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .groupBy(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("id").alias("b"), F.col("sz").alias("szb"))
    out = (
        inter.join(sa, "a")
        .join(sb, "b")
        .withColumn("c_a_in_b", F.col("inter") / F.col("sza"))
        .withColumn("c_b_in_a", F.col("inter") / F.col("szb"))
        .filter(
            (F.col("c_a_in_b") >= threshold) | (F.col("c_b_in_a") >= threshold)
        )
    )
    return out.select(
        "a", "b", "inter", "sza", "szb",
        F.round("c_a_in_b", 6).alias("c_a_in_b"),
        F.round("c_b_in_a", 6).alias("c_b_in_a"),
    )


def winnow_pairs(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    window: int = 4,
    min_shared: int = 2,
    max_df: int | None = 64,
) -> DataFrame:
    """Candidate near-dup pairs from WINNOWING fingerprints (the MOSS
    pipeline end to end): `textquality.winnow_fingerprints` selects
    ~2/(window+1) of the k-gram hashes per document, pairs form by
    fingerprint equi-join, and ``n_shared`` counts DISTINCT shared
    fingerprints per pair — the coverage guarantee means any shared run
    of ≥ window+k−1 tokens surfaces. The winnowed density is what makes
    the join affordable where a full shingle join is not.

    Same hot-key discipline as the shingle joins: fingerprints whose
    document frequency exceeds ``max_df`` are pruned before the join
    (boilerplate fragments shared by everyone carry no pair signal),
    bounding any fingerprint's contribution to max_df²/2 pairs."""
    from pdf_table_extractor_spark.operators.textquality import (
        winnow_fingerprints,
    )

    fps = winnow_fingerprints(
        df, k=k, window=window, text_col=text_col, id_col=id_col
    ).select(F.col(id_col).alias("id"), "fp").distinct()
    if max_df is not None:
        hot = (
            fps.groupBy("fp")
            .agg(F.count("*").alias("__df"))
            .where(F.col("__df") > max_df)
            .select("fp")
        )
        fps = fps.join(hot, "fp", "left_anti")
    l, r = fps.alias("l"), fps.alias("r")
    return (
        l.join(
            r,
            (F.col("l.fp") == F.col("r.fp")) & (F.col("l.id") < F.col("r.id")),
        )
        .groupBy(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
