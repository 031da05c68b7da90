"""Corpus/term statistics: TF-IDF keyword extraction, per-slice corpus
profiles, PMI collocations. The term-weighting layer a webtext pipeline
uses for topic tagging, quality slicing, and corpus QA dashboards.

Everything is hash aggregates keyed on (doc, token) / token / bigram —
map-side-combinable, AQE-skew-splittable (the Zipf head IS the skew), no
UDFs, no driver-side state. Scores that cross engines are rounded to 6
decimals and every ranking orders by (rounded score, term) so external
SQL oracles reproduce ranks exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pdf_table_extractor_spark.operators.dedup import tokens


def tfidf_topk(
    df: DataFrame,
    *,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, rank, token, tfidf): top-k tokens per document by
    tf·ln(N/df), rank 1 = highest; ties broken by token string so the
    ranking is total and engine-independent.

    Scale: one (doc, token) aggregate for tf, one token aggregate for
    df, an equi-join on token (Zipf-hot tokens → AQE skew split, or
    broadcast the head vocabulary), and a per-doc top-k window."""
    tok = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
    tf = tok.groupBy(id_col, "tok").agg(F.count("*").alias("__tf"))
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("__df"))
    n_docs = df.select(F.count("*").cast("double").alias("__n"))
    scored = (
        tf.join(dfreq, "tok")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(F.col("__tf") * F.log(F.col("__n") / F.col("__df")), 6),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("tok"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "rank", F.col("tok").alias("token"), "tfidf")
    )


def corpus_stats(
    df: DataFrame,
    *,
    by: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-slice corpus profile: (slice, n_docs, n_tokens, vocab,
    type_token_ratio, avg_doc_tokens). The QA table a curation run
    publishes per language/source/domain slice.

    Scale: distinct-token counting goes through a (slice, token)
    pre-aggregate — never count_distinct over raw token rows (that's a
    single huge hash set per slice); both layers partial-aggregate."""
    sl = F.col(by)
    tok = df.select(sl.alias("slice"), F.explode(tokens(F.col(text_col))).alias("tok"))
    per_tok = tok.groupBy("slice", "tok").agg(F.count("*").alias("__c"))
    token_side = per_tok.groupBy("slice").agg(
        F.sum("__c").alias("n_tokens"), F.count("*").alias("vocab")
    )
    doc_side = df.groupBy(sl.alias("slice")).agg(F.count("*").alias("n_docs"))
    return (
        doc_side.join(token_side, "slice")
        .withColumn(
            "type_token_ratio", F.round(F.col("vocab") / F.col("n_tokens"), 6)
        )
        .withColumn(
            "avg_doc_tokens", F.round(F.col("n_tokens") / F.col("n_docs"), 6)
        )
    )


def pmi_bigrams(
    df: DataFrame,
    *,
    k: int = 20,
    min_count: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """(rank, w1, w2, n_pairs, pmi): the corpus's top-k collocations by
    pointwise mutual information ln(c_xy·N / (c_x·c_y)), restricted to
    bigrams seen at least ``min_count`` times (PMI is noise below that).

    Scale: unigram + bigram hash aggregates, two equi-joins on the word
    key, then a global top-k — expressed as orderBy(...).limit(k), which
    Spark executes as per-partition top-k + a k-row merge (TakeOrdered),
    never a full sort; the rank window runs on the k surviving rows."""
    toks = tokens(F.col(text_col))
    uni = (
        df.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("__c"))
    )
    n_uni = uni.select(F.sum("__c").cast("double").alias("__n"))
    pairs = df.select(
        F.explode(
            F.zip_with(
                F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
                F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    big = pairs.groupBy("w1", "w2").agg(F.count("*").alias("n_pairs"))
    cx = uni.select(F.col("w").alias("w1"), F.col("__c").alias("__cx"))
    cy = uni.select(F.col("w").alias("w2"), F.col("__c").alias("__cy"))
    scored = (
        big.where(F.col("n_pairs") >= min_count)
        .join(cx, "w1")
        .join(cy, "w2")
        .crossJoin(F.broadcast(n_uni))
        .withColumn(
            "pmi",
            F.round(
                F.log(
                    F.col("n_pairs") * F.col("__n") / (F.col("__cx") * F.col("__cy"))
                ),
                6,
            ),
        )
    )
    top = scored.orderBy(F.desc("pmi"), "w1", "w2").limit(k)
    w = Window.orderBy(F.desc("pmi"), "w1", "w2")
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "w1", "w2", "n_pairs", "pmi"
    )


def length_percentiles(
    df: DataFrame,
    *,
    by: str = "source",
    text_col: str = "text",
    probs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Per-slice token-length percentiles (corpus QA: truncation budgets,
    outlier slices). Uses exact interpolating percentile — an aggregate,
    so it partial-aggregates per slice; at extreme cardinality swap for
    approx_percentile with a documented error bound. Values round to 6
    decimals for engine-exact comparison."""
    n_tok = F.size(tokens(F.col(text_col)))
    aggs = [
        F.round(F.percentile(n_tok, F.lit(p)), 6).alias(f"p{int(p * 100)}")
        for p in probs
    ]
    return df.groupBy(F.col(by).alias("slice")).agg(
        F.count("*").alias("n_docs"), *aggs
    )


def key_skew_stats(
    df: DataFrame,
    *,
    key_col: str,
) -> DataFrame:
    """One-row skew diagnosis of a prospective shuffle/partition key:
    (n_keys, n_rows, max_key_frac, gini). max_key_frac ≈ the straggler
    share a plain hash-partition would see; gini summarizes the whole
    distribution (0 uniform → 1 degenerate). The decision input for
    salting / AQE skew thresholds BEFORE running the expensive job.

    Scale: one hash aggregate over the data; the ranking window runs on
    KEY-level rows only (domains/languages — small by construction)."""
    counts = df.groupBy(key_col).agg(F.count("*").alias("__c"))
    rk = Window.orderBy(F.col("__c").asc(), F.col(key_col))
    ranked = counts.withColumn("__i", F.row_number().over(rk))
    return ranked.agg(
        F.count("*").alias("n_keys"),
        F.sum("__c").alias("n_rows"),
        F.round(F.max("__c") / F.sum("__c"), 6).alias("max_key_frac"),
        F.round(
            (F.lit(2.0) * F.sum(F.col("__i") * F.col("__c")))
            / (F.count("*") * F.sum("__c"))
            - (F.count("*") + F.lit(1.0)) / F.count("*"),
            6,
        ).alias("gini"),
    )


def heavy_keys(
    df: DataFrame,
    *,
    key_col: str,
    k: int = 10,
) -> DataFrame:
    """(key, n_rows, frac, rank): the top-k heaviest keys — the concrete
    salting list for a skewed join/aggregate. orderBy().limit(k) executes
    as per-partition top-k + k-row merge, never a full sort."""
    total = df.select(F.count("*").cast("double").alias("__t"))
    counts = (
        df.groupBy(key_col)
        .agg(F.count("*").alias("n_rows"))
        .crossJoin(F.broadcast(total))
        .withColumn("frac", F.round(F.col("n_rows") / F.col("__t"), 6))
        .drop("__t")
    )
    top = counts.orderBy(F.desc("n_rows"), key_col).limit(k)
    w = Window.orderBy(F.desc("n_rows"), key_col)
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", key_col, "n_rows", "frac"
    )


def bm25_topk(
    df: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "text",
) -> DataFrame:
    """(query_id, rank, doc_id, bm25): top-k documents per query under
    Okapi BM25 (Robertson & Walker; the Lucene idf variant
    ln(1 + (N - df + 0.5)/(df + 0.5)), which is always positive).
    The retrieval layer a curation pipeline uses to pull benchmark-like
    or seed-like documents out of a crawl (targeted decontamination,
    quality-seed expansion). Ranks break ties on (rounded score, doc_id)
    so external SQL oracles reproduce them exactly.

    Scale: the corpus side is two map-side-combined hash aggregates
    (per-doc tf, corpus df) and ONE equi-join of tf against the
    broadcast query-term list — the corpus is filtered to query terms
    BEFORE any scoring work, so a 10^12-row corpus costs one tf
    aggregate plus a small scored subset. N/avgdl is a 1-row broadcast.
    The top-k window partitions by query_id over scored DOC rows of the
    matching subset only; queries are bounded (a benchmark suite), so no
    single-partition global window appears.
    """
    tok = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
    # The tf aggregate feeds THREE consumers (scoring join, df, dl) and dl
    # feeds two (join back, N/avgdl stats). The constant-true
    # nondeterministic guard keeps join-inferred isnotnull constraints
    # from pushing below each consumer's copy (they would specialize the
    # exchange children and defeat ReuseExchange — the plans/extract.py
    # lesson), so the corpus is tokenized and tf-aggregated ONCE, with
    # every consumer reading the same reused shuffle output.
    guard = F.spark_partition_id() >= 0
    tf = tok.groupBy(id_col, "tok").agg(F.count("*").alias("__tf")).where(guard)
    dl = tf.groupBy(id_col).agg(F.sum("__tf").alias("__dl")).where(guard)
    # The always-true __tf reference keeps column pruning from dropping
    # the count out of this consumer's copy of the tf child (a pruned
    # copy is a DIFFERENT subtree — no ReuseExchange — and re-tokenizes
    # the whole corpus to save an 8-byte column).
    dfreq = (
        tf.where(F.col("__tf") > 0).groupBy("tok").agg(F.count("*").alias("__df"))
    )
    stats = dl.agg(
        F.count("*").cast("double").alias("__n"),
        F.avg("__dl").alias("__avgdl"),
    )
    qterms = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(F.array_distinct(tokens(F.col(query_text_col)))).alias("tok"),
    ).distinct()
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n") - F.col("__df") + F.lit(0.5)) / (F.col("__df") + F.lit(0.5))
    )
    tf_norm = (F.col("__tf") * F.lit(k1 + 1.0)) / (
        F.col("__tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.col("__avgdl"))
    )
    scored = (
        tf.join(F.broadcast(qterms), "tok")
        .join(dfreq, "tok")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum(idf * tf_norm), 4).alias("bm25"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("bm25"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "bm25")
    )


def kmv_distinct(
    df: DataFrame,
    *,
    key_expr: Column,
    by: str | None = None,
    k: int = 64,
) -> DataFrame:
    """(slice, n_seen_k, kmv_estimate): approximate distinct count via a
    k-minimum-values sketch over md5-hashed keys. Unlike HLL registers,
    the KMV sketch is a DETERMINISTIC function of the key set (the k
    smallest hash values), so estimates are bit-identical across
    engines, reruns, and partitionings — auditable approximate counting.
    estimate = (k-1)/u_k where u_k is the k-th smallest hash mapped to
    (0,1); exact count returned when fewer than k distinct keys exist.

    Scale: distinct-hash pre-aggregate, then a per-slice top-k window
    over HASH-level rows (bounded by distinct keys; for corpus-wide
    sketches on 10^12 keys, pre-filter u < k/expected_lower_bound so the
    window sees only candidate minima)."""
    u = (
        F.conv(F.substring(F.md5(key_expr.cast("string")), 1, 8), 16, 10)
        .cast("long")
        .cast("double")
        / F.lit(4294967296.0)
    )
    sl = F.col(by) if by else F.lit("all")
    hashes = df.select(sl.alias("slice"), u.alias("__u")).distinct()
    w = Window.partitionBy("slice").orderBy("__u")
    topk = hashes.withColumn("__r", F.row_number().over(w)).where(
        F.col("__r") <= k
    )
    return topk.groupBy("slice").agg(
        F.count("*").alias("n_seen_k"),
        F.round(
            F.when(
                F.count("*") < k, F.count("*").cast("double")
            ).otherwise((F.lit(float(k - 1))) / F.max("__u")),
            6,
        ).alias("kmv_estimate"),
    )


def hll_registers(
    df: DataFrame,
    *,
    key_expr: Column,
    by: str | None = None,
    p: int = 8,
) -> DataFrame:
    """(slice, register, max_rho): HyperLogLog register table (Flajolet,
    Fusy, Gandouet & Meunier 2007) over md5-hashed keys — per slice, the
    maximum leading-zero rank observed in each of m = 2^p registers.

    The register table IS the sketch: at most m rows per slice NO MATTER
    the key cardinality, and mergeable by max-per-register union across
    shards / days / stream micro-batches (see ``hll_merge``) — the
    property KMV lacks (its k-minima need a re-sort to merge) and the
    reason HLL is the standard distinct sketch at warehouse scale.

    Cross-engine determinism: the 32-bit value is the first 8 hex chars
    of md5 (shared with kmv/bloom/CMS); register = top p bits (integer
    shift), rank rho = leading zeros of the remaining 32-p bits + 1,
    computed from the length of the binary string (``bin`` prints no
    leading zeros in both Spark and DuckDB; an all-zero suffix gives
    bin='0' → stripped length 0 → rho = 32-p+1, the HLL convention).

    Scale: ONE map-side-combinable hash aggregate; output bounded by the
    CONFIG (2^p rows per slice), like the CMS cells and bloom words."""
    w_bits = 32 - p
    v = F.conv(F.substring(F.md5(key_expr.cast("string")), 1, 8), 16, 10).cast("long")
    sl = F.col(by) if by else F.lit("all")
    keyed = df.select(sl.alias("slice"), v.alias("__v"))
    bitlen = F.length(
        F.regexp_replace(F.bin(F.col("__v") % F.lit(1 << w_bits)), "^0+", "")
    )
    return (
        keyed.select(
            "slice",
            F.shiftright(F.col("__v"), w_bits).cast("int").alias("register"),
            (F.lit(w_bits + 1) - bitlen).cast("int").alias("rho"),
        )
        .groupBy("slice", "register")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Union HLL sketches: max per (slice, register) across register
    tables. hll_merge(sketch(A), sketch(B)) == hll_registers(A ∪ B)
    exactly (max is associative/commutative/idempotent), which is what
    makes per-shard/per-day sketches foldable without re-scanning —
    the same versioned-fold contract as the streaming CMS."""
    out = register_tables[0]
    for t in register_tables[1:]:
        out = out.unionByName(t)
    return out.groupBy("slice", "register").agg(F.max("max_rho").alias("max_rho"))


# Bias-correction constants (Flajolet et al. 2007 §4); m >= 128 uses the
# closed form. Computed driver-side so both engines see ONE double literal.
_HLL_ALPHA_SMALL = {4: 0.673, 5: 0.697, 6: 0.709}


def hll_alpha_m2(p: int) -> float:
    m = 1 << p
    alpha = _HLL_ALPHA_SMALL.get(p, 0.7213 / (1.0 + 1.079 / m))
    return alpha * m * m


def hll_estimate(regs: DataFrame, *, p: int = 8) -> DataFrame:
    """(slice, n_registers_set, hll_estimate): the raw harmonic-mean HLL
    estimate from a register table. Deliberately the RAW estimator — no
    small-range linear-counting branch, because ln() is libm-dependent
    across engines while the harmonic path is IEEE-exact: 2^-rho terms
    are dyadic (exact in double), their sum over ≤2^p register rows plus
    the integer count of empty registers is exact, and the final
    multiply/divide is correctly rounded — so even the APPROXIMATE
    estimate replays bit-for-bit in any SQL engine (the kmv_distinct
    property, kept for the mergeable sketch). Use kmv for small-range
    accuracy, HLL registers for mergeability."""
    m = 1 << p
    est = regs.groupBy("slice").agg(
        F.count("*").alias("n_registers_set"),
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("__s"),
    )
    denom = (F.lit(float(m)) - F.col("n_registers_set")) + F.col("__s")
    return est.select(
        "slice",
        "n_registers_set",
        F.round(F.lit(hll_alpha_m2(p)) / denom, 4).alias("hll_estimate"),
    )


def hll_distinct(
    df: DataFrame,
    *,
    key_expr: Column,
    by: str | None = None,
    p: int = 8,
) -> DataFrame:
    """Approximate distinct count per slice via HyperLogLog: compose
    ``hll_registers`` → ``hll_estimate``. One aggregate over the data,
    ≤2^p rows of state per slice, deterministic across engines."""
    return hll_estimate(hll_registers(df, key_expr=key_expr, by=by, p=p), p=p)


def cms_sketch(
    df: DataFrame,
    *,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-min sketch of a key column (Cormode & Muthukrishnan): depth
    hash rows × width buckets, each cell the count of keys hashing there.
    ONE map-side-combinable aggregate over the data; the output is at
    most depth·width rows NO MATTER the key cardinality — the mergeable
    artifact that makes frequency tracking work where exact groupBy-key
    state can't: streaming accumulation (cells just add), cross-shard /
    cross-day merges without re-scanning, and frequency probes of a
    10^12-row stream in kilobytes of state. Estimates only ever
    OVER-count (min over depth rows bounds the collision error by
    e·N/width with prob 1-e^-depth).

    Buckets come from bloom.hash_positions (dyadic md5), so any SQL
    engine replays the sketch bit-for-bit."""
    from pdf_table_extractor_spark.operators.bloom import hash_positions

    pos = hash_positions(F.col(key_col), depth, width)
    rows = df.select(
        F.posexplode(F.array(*pos)).alias("sketch_row", "bucket")
    )
    return rows.groupBy("sketch_row", "bucket").agg(F.count("*").alias("cell_count"))


def cms_heavy_hitters(
    df: DataFrame,
    *,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    min_count: int = 100,
) -> DataFrame:
    """(key, est_count, true_count): every distinct key whose count-min
    ESTIMATE reaches min_count — a superset of the true heavy hitters
    (CMS never under-counts), with the exact count joined alongside so
    over-estimates are visible.

    Scale: the sketch is one aggregate + a ≤depth·width-row broadcast;
    the candidate probe explodes depth bucket ids per DISTINCT key and
    re-aggregates per key — candidate keys (hosts, langs, shard ids) are
    orders of magnitude fewer than rows. The exact-count join here is
    the demonstration harness; a production pass filters on est alone
    and only exact-counts the surviving candidates."""
    from pdf_table_extractor_spark.operators.bloom import hash_positions

    sketch = cms_sketch(df, key_col=key_col, depth=depth, width=width)
    truth = df.groupBy(key_col).agg(F.count("*").alias("true_count"))
    pos = hash_positions(F.col(key_col), depth, width)
    probe = truth.select(
        F.col(key_col),
        F.col("true_count"),
        F.posexplode(F.array(*pos)).alias("sketch_row", "bucket"),
    )
    est = (
        probe.join(F.broadcast(sketch), ["sketch_row", "bucket"])
        .groupBy(key_col, "true_count")
        .agg(F.min("cell_count").alias("est_count"))
    )
    return est.where(F.col("est_count") >= min_count).select(
        key_col, "est_count", "true_count"
    )


def _cms_min_estimate(
    candidates: DataFrame,
    sketch: DataFrame,
    *,
    key_col: str,
    depth: int,
    width: int,
    count_col: str = "cell_count",
) -> DataFrame:
    """min-over-rows CMS probe of a candidate key set against a (sketch_row,
    bucket, count) cell table (broadcast — it is ≤ depth·width rows)."""
    from pdf_table_extractor_spark.operators.bloom import hash_positions

    pos = hash_positions(F.col(key_col), depth, width)
    probe = candidates.select(
        F.col(key_col),
        F.posexplode(F.array(*pos)).alias("sketch_row", "bucket"),
    )
    return (
        probe.join(F.broadcast(sketch), ["sketch_row", "bucket"])
        .groupBy(key_col)
        .agg(F.min(count_col).alias("est_count"))
    )


def cms_sketch_windowed(
    df: DataFrame,
    *,
    key_col: str,
    ts_col: str = "ts",
    grain: str = "day",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Per-time-bucket count-min sketches: (bucket_start, sketch_row,
    bucket, cell_count) — ≤ depth·width cells per grain bucket, one
    map-side-combinable aggregate over the stream regardless of key
    cardinality.

    Because CMS cells are linear, the sketch of ANY time interval is the
    cell-wise SUM of its buckets' sketches — frequency-over-interval
    queries against bounded state (the ECM-sketch idea of Rivetti et
    al., "Stream Frequency Over Interval Queries", VLDB 2018, with exact
    per-grain cells instead of exponential-histogram decay). A crawl
    monitor answers "how hot was this host over any window" from
    kilobytes per day."""
    b = F.date_trunc(grain, F.col(ts_col))
    from pdf_table_extractor_spark.operators.bloom import hash_positions

    pos = hash_positions(F.col(key_col), depth, width)
    rows = df.select(
        b.alias("bucket_start"),
        F.posexplode(F.array(*pos)).alias("sketch_row", "bucket"),
    )
    return rows.groupBy("bucket_start", "sketch_row", "bucket").agg(
        F.count("*").alias("cell_count")
    )


def cms_interval_estimate(
    windowed_sketch: DataFrame,
    candidates: DataFrame,
    *,
    key_col: str,
    t0: str,
    t1: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """(key, est_count) over the half-open time interval [t0, t1): sums
    the interval's per-bucket sketch cells (cell-wise union), then takes
    the min over depth rows — still a strict over-estimate, computed
    without touching a single raw event row."""
    cells = (
        windowed_sketch.where(
            (F.col("bucket_start") >= F.lit(t0).cast("timestamp_ntz"))
            & (F.col("bucket_start") < F.lit(t1).cast("timestamp_ntz"))
        )
        .groupBy("sketch_row", "bucket")
        .agg(F.sum("cell_count").alias("cell_count"))
    )
    return _cms_min_estimate(
        candidates, cells, key_col=key_col, depth=depth, width=width
    )


def token_histogram(df: DataFrame, *, text_col: str = "text") -> DataFrame:
    """(token, n): the corpus unigram table — ONE map-side-combinable
    hash aggregate regardless of corpus size; the output is
    vocabulary-scale, not corpus-scale."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )


def corpus_divergence(
    a: DataFrame,
    b: DataFrame,
    *,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """Per-token Jensen–Shannon drift table between two corpus
    snapshots: (token, n_a, n_b, p_a, p_b, js_term), where js_term is
    the token's contribution (in bits) to JS(p_a ‖ p_b) — ranking by it
    names exactly which tokens moved between snapshots (new spam
    vocabulary, a source shifting language, a scraper bug dropping
    markup). JS rather than KL because it is finite when a token exists
    on only one side (that token contributes p/2 bits).

    Scale: one unigram aggregate per side (vocabulary-sized outputs), a
    vocabulary-scale full-outer equi-join, and a 1-row broadcast of the
    two token totals — the corpora are each read once and never joined
    row-to-row. ``min_count`` bounds the emitted table to tokens with
    support (the long tail's js_terms are individually negligible but
    keep the FULL tail when summing — see corpus_divergence_summary).

    Cross-engine: probabilities are exact integer divisions in double,
    js_term is rounded to 9 decimals; both replay in ANSI SQL as
    ``p * log2(p / ((p_a+p_b)/2))`` guarded by CASE WHEN p > 0."""
    return divergence_from_histograms(
        token_histogram(a, text_col=text_col),
        token_histogram(b, text_col=text_col),
        min_count=min_count,
    )


def divergence_from_histograms(
    hist_a: DataFrame, hist_b: DataFrame, *, min_count: int = 1
) -> DataFrame:
    """corpus_divergence's math over PRE-AGGREGATED (token, n) unigram
    tables — the shared core that lets a streaming-maintained histogram
    snapshot (streaming/drift.py) be drift-checked with byte-identical
    semantics to the batch operator."""
    ha = hist_a.withColumnRenamed("n", "n_a")
    hb = hist_b.withColumnRenamed("n", "n_b")
    j = ha.join(hb, "token", "full_outer").select(
        "token",
        F.coalesce("n_a", F.lit(0)).alias("n_a"),
        F.coalesce("n_b", F.lit(0)).alias("n_b"),
    )
    tot = j.agg(
        F.sum("n_a").cast("double").alias("__na"),
        F.sum("n_b").cast("double").alias("__nb"),
    )
    p_a = F.col("n_a") / F.col("__na")
    p_b = F.col("n_b") / F.col("__nb")
    m = (p_a + p_b) / F.lit(2.0)

    def side(p):
        return F.when(p > 0, p * F.log2(p / m)).otherwise(F.lit(0.0))

    js = (side(p_a) + side(p_b)) / F.lit(2.0)
    out = j.crossJoin(F.broadcast(tot)).select(
        "token",
        "n_a",
        "n_b",
        F.round(p_a, 9).alias("p_a"),
        F.round(p_b, 9).alias("p_b"),
        F.round(js, 9).alias("js_term"),
    )
    if min_count > 1:
        out = out.where(F.col("n_a") + F.col("n_b") >= min_count)
    return out


def corpus_divergence_summary(
    a: DataFrame, b: DataFrame, *, text_col: str = "text"
) -> DataFrame:
    """One-row corpus drift monitor: total JS divergence in bits
    (0 = identical token distributions, 1 = disjoint) plus vocabulary
    and token-mass tallies per side — the cheap per-snapshot health
    check a pipeline runs before committing a new crawl into the
    training mix. Sums the FULL vocabulary's rounded js_terms (the
    per-token table's min_count filter would bias the total)."""
    return summarize_divergence(corpus_divergence(a, b, text_col=text_col, min_count=1))


def summarize_divergence(d: DataFrame) -> DataFrame:
    """Fold a per-token divergence table (corpus_divergence /
    divergence_from_histograms output) into the 1-row monitor."""
    return d.agg(
        F.round(F.sum("js_term"), 6).alias("js_bits"),
        F.sum((F.col("n_a") > 0).cast("long")).alias("vocab_a"),
        F.sum((F.col("n_b") > 0).cast("long")).alias("vocab_b"),
        F.count("*").alias("vocab_union"),
        F.sum("n_a").alias("tokens_a"),
        F.sum("n_b").alias("tokens_b"),
    )


def zipf_fit(df: DataFrame, *, text_col: str = "text", top_n: int = 512) -> DataFrame:
    """One-row Zipf rank–frequency fit over the head vocabulary: OLS of
    ln(count) on ln(rank) for the ``top_n`` most frequent tokens →
    (slope, intercept, r2, n_ranks). Natural text sits near slope −1
    with r² ≈ 0.98+; a slope collapsing toward 0 or an r² falling off a
    cliff is the classic symptom of machine-generated/boilerplate-
    flooded corpora — a one-row QA gate per source or snapshot.

    Scale: the unigram aggregate is the only corpus-wide pass; the
    top-n extraction is a distributed TakeOrdered, and the rank window
    runs on ≤ top_n rows (model-sized by construction, so the global
    window is NOT the usual anti-pattern). Ties are broken by token
    string so ranks replay exactly in any engine."""
    h = token_histogram(df, text_col=text_col)
    top = h.orderBy(F.desc("n"), F.asc("token")).limit(top_n)
    w = Window.orderBy(F.desc("n"), F.asc("token"))
    xy = top.select(
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("n").cast("double")).alias("y"),
    )
    slope = F.covar_pop("x", "y") / F.var_pop("x")
    return xy.agg(
        F.round(slope, 5).alias("slope"),
        F.round(F.avg("y") - slope * F.avg("x"), 5).alias("intercept"),
        F.round(F.pow(F.corr("x", "y"), F.lit(2.0)), 5).alias("r2"),
        F.count("*").alias("n_ranks"),
    )


def ngram_diversity(
    df: DataFrame,
    *,
    by: str = "source",
    text_col: str = "text",
    n_max: int = 3,
) -> DataFrame:
    """Distinct-n diversity per slice: (by, n, total_ngrams,
    distinct_ngrams, distinct_ratio) for n = 1..n_max — the
    distinct-n / Self-BLEU-adjacent QA metric that flags template-
    generated or synthetic-flooded slices (their higher-order ratios
    collapse long before eyeballs notice).

    Scale: per n, one (slice, gram) hash aggregate then one slice
    aggregate — exact distinct counting WITHOUT countDistinct's
    per-group set state, partial-combinable all the way; the corpus is
    scanned once per n (unionable upstream if the scan dominates)."""
    from pdf_table_extractor_spark.operators.dedup import shingles

    outs = []
    for n in range(1, n_max + 1):
        grams = df.select(
            F.col(by), F.explode(shingles(F.col(text_col), n)).alias("g")
        )
        per = grams.groupBy(by, "g").agg(F.count("*").alias("c"))
        outs.append(
            per.groupBy(by)
            .agg(
                F.count("*").alias("distinct_ngrams"),
                F.sum("c").alias("total_ngrams"),
            )
            .withColumn("n", F.lit(n))
        )
    u = outs[0]
    for o in outs[1:]:
        u = u.unionByName(o)
    return u.select(
        by,
        "n",
        "total_ngrams",
        "distinct_ngrams",
        F.round(
            F.col("distinct_ngrams") / F.col("total_ngrams"), 6
        ).alias("distinct_ratio"),
    )


def token_entropy(
    df: DataFrame, *, by: str = "source", text_col: str = "text"
) -> DataFrame:
    """Per-slice unigram Shannon entropy in bits: (by, entropy_bits,
    vocab, n_tokens). Low entropy at high volume = a slice dominated by
    a few tokens (spam floods, boilerplate); pairs with zipf_fit as the
    per-source corpus-health panel.

    Scale: one (slice, token) aggregate, one slice-total aggregate, an
    equi-join on the slice key, one closing aggregate — all hash
    aggregates, vocabulary-scale after the first. Per-token entropy
    terms are rounded to 9 decimals before summing so the total replays
    exactly in external SQL regardless of addition order."""
    per = (
        df.select(F.col(by), F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy(by, "token")
        .agg(F.count("*").alias("c"))
    )
    tot = per.groupBy(by).agg(F.sum("c").cast("double").alias("__N"))
    p = F.col("c") / F.col("__N")
    return (
        per.join(tot, by)
        .groupBy(by)
        .agg(
            F.round(-F.sum(F.round(p * F.log2(p), 9)), 6).alias("entropy_bits"),
            F.count("*").alias("vocab"),
            F.sum("c").alias("n_tokens"),
        )
    )


def phrase_search(
    docs: DataFrame,
    phrase: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact token-boundary phrase matching via positional postings —
    the inverted-index primitive behind quoted-query search and
    contamination auditing ("find every document containing this exact
    benchmark prompt"). Returns (id, n_matches) for documents with at
    least one occurrence.

    Shape: postings (id, pos, tok) are pre-filtered to the phrase's
    tokens BEFORE any shuffle (an isin literal filter at scan speed, so
    ~|phrase vocab| / |corpus vocab| of positions survive), then one
    broadcast join against the (token -> phrase offset) table emits
    candidate (id, start = pos - offset) anchors, and a single hash
    aggregate checks that every offset 0..k-1 is present at the anchor
    (count DISTINCT offsets == k — repeated phrase words contribute all
    their offsets through the broadcast, so "batch batch" matches only
    genuine adjacency). No self-joins, no window, two map-side-combined
    shuffles on skinny rows regardless of phrase length."""
    words = phrase.lower().split()
    if not words:
        raise ValueError("empty phrase")
    k = len(words)
    toks = F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " "
    )
    spark = docs.sparkSession
    offsets = spark.createDataFrame(
        [(w, i) for i, w in enumerate(words)], "tok string, off int"
    )
    postings = docs.select(
        F.col(id_col).alias("id"), F.posexplode(toks).alias("pos", "tok")
    ).where(F.col("tok").isin(list(set(words))))
    anchors = postings.join(F.broadcast(offsets), "tok").select(
        "id", (F.col("pos") - F.col("off")).alias("start"), "off"
    )
    full = (
        anchors.groupBy("id", "start")
        .agg(F.countDistinct("off").alias("__n_off"))
        .where(F.col("__n_off") == k)
    )
    return full.groupBy("id").agg(F.count("*").alias("n_matches")).select(
        F.col("id").alias(id_col), "n_matches"
    )


def heaps_fit(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_checkpoints: int = 12,
    round_to: int = 5,
) -> DataFrame:
    """One-row Heaps'-law vocabulary-growth fit: OLS of ln(distinct
    types) on ln(tokens seen) over ``n_checkpoints`` prefix checkpoints
    in id order -> (slope, intercept, r2, n_points). Natural corpora
    grow V(n) = K·n^β with β ≈ 0.4-0.6; β collapsing toward 0 means a
    closed template vocabulary (machine-generated floods), β near 1
    means id-like token churn (boilerplate hashes, tracking junk) —
    the growth-curve complement to `zipf_fit`'s head-shape gate.

    Scale: prefix counts are NOT a corpus-wide window — each doc maps
    to one of C id-range buckets, types bucket by their FIRST document
    (min-id aggregate), and the cumulative sums run over exactly C rows
    (model-sized single-partition window by construction). Two hash
    aggregates + one broadcast max; no collect."""
    c = int(n_checkpoints)
    toks = tokens(F.col(text_col))
    per_doc = df.select(
        F.col(id_col).alias("id"), F.size(toks).alias("n_toks")
    )
    mx = per_doc.agg(F.max("id").alias("__m"))
    bucket = F.expr(f"(id * {c}) div (__m + 1)")
    doc_b = (
        per_doc.crossJoin(F.broadcast(mx))
        .groupBy(bucket.alias("b"))
        .agg(F.sum("n_toks").alias("toks_b"))
    )
    firsts = (
        df.select(F.col(id_col).alias("id"), F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.min("id").alias("id"))
    )
    type_b = (
        firsts.crossJoin(F.broadcast(mx))
        .groupBy(bucket.alias("b"))
        .agg(F.count("*").alias("types_b"))
    )
    grid = mx.select(
        F.explode(F.sequence(F.lit(0), F.lit(c - 1))).alias("b")
    )
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    xy = (
        grid.join(doc_b, "b", "left")
        .join(type_b, "b", "left")
        .select(
            "b",
            F.sum(F.coalesce("toks_b", F.lit(0))).over(w).alias("cum_toks"),
            F.sum(F.coalesce("types_b", F.lit(0))).over(w).alias("cum_types"),
        )
        .where((F.col("cum_toks") > 0) & (F.col("cum_types") > 0))
        .select(
            F.log(F.col("cum_toks").cast("double")).alias("x"),
            F.log(F.col("cum_types").cast("double")).alias("y"),
        )
    )
    # try_divide: a CLOSED vocabulary (every type seen in the first
    # checkpoint — the extreme template-flood case this gate exists to
    # catch) makes var(y) zero; corr would throw under ANSI (when()
    # doesn't short-circuit vectorized evaluation), so slope/r2 go NULL
    # instead of killing the job.
    vx, vy = F.var_pop("x"), F.var_pop("y")
    cxy = F.covar_pop("x", "y")
    slope = F.try_divide(cxy, vx)
    r2 = F.try_divide(cxy * cxy, vx * vy)
    return xy.agg(
        F.round(slope, round_to).alias("slope"),
        F.round(F.avg("y") - slope * F.avg("x"), round_to).alias("intercept"),
        F.round(r2, round_to).alias("r2"),
        F.count("*").alias("n_points"),
    )


def rake_keywords(
    df: DataFrame,
    *,
    stoplist: list[str],
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 6,
) -> DataFrame:
    """RAKE keyword extraction (Rose, Engel, Cramer & Cowley, "Automatic
    Keyword Extraction from Individual Documents", 2010): candidate
    phrases are maximal runs of non-stopword tokens; each word scores
    deg(w)/freq(w) within the document (deg counts the words
    co-occurring in w's phrases, self included); a phrase scores the
    sum of its words' scores; top-``k`` distinct phrases per document
    win (ties broken by phrase text). The zero-training keyword
    extractor for indexing/faceting a fresh corpus.

    Spark shape: phrase segmentation is gaps-and-islands — position
    minus the non-stop token's per-doc rank is constant within a run —
    so NO regex alternation over the stoplist (RE2-portable for the
    oracle) and no per-row Python; everything downstream is doc-keyed
    aggregates and joins, and both windows (rank, top-k) partition by
    document, never corpus-wide."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "w"),
    ).where(F.col("w") != "")
    nonstop = toks.where(~F.col("w").isin(list(stoplist)))
    wnd = Window.partitionBy("id").orderBy("pos")
    runs = nonstop.withColumn(
        "grp", F.col("pos") - F.row_number().over(wnd)
    )
    phrases = runs.groupBy("id", "grp").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "w"))),
                lambda s: s["w"],
            ),
            " ",
        ).alias("phrase"),
        F.count("*").alias("plen"),
    )
    words = runs.join(
        phrases.select("id", "grp", "plen"), ["id", "grp"]
    )
    wscores = words.groupBy("id", "w").agg(
        (
            (F.sum(F.col("plen") - 1) + F.count("*")) / F.count("*")
        ).alias("wscore")
    )
    pscores = (
        words.join(wscores, ["id", "w"])
        .groupBy("id", "grp")
        .agg(F.round(F.sum("wscore"), round_to).alias("score"))
        .join(phrases.select("id", "grp", "phrase"), ["id", "grp"])
        .groupBy("id", "phrase")
        .agg(F.max("score").alias("score"), F.count("*").alias("n_occurrences"))
    )
    topw = Window.partitionBy("id").orderBy(
        F.desc("score"), F.asc("phrase")
    )
    return (
        pscores.withColumn("rank", F.row_number().over(topw))
        .where(F.col("rank") <= k)
        .select(
            F.col("id").alias(id_col),
            "rank",
            "phrase",
            "score",
            F.col("n_occurrences").cast("long").alias("n_occurrences"),
        )
    )


def textrank_keywords(
    df: DataFrame,
    *,
    stoplist: list[str],
    k: int = 5,
    window: int = 2,
    iters: int = 5,
    damping: float = 0.85,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 6,
) -> DataFrame:
    """TextRank keywords (Mihalcea & Tarau, EMNLP 2004): per document,
    non-stopword token TYPES are nodes, co-occurrence within a
    ``window`` of the token sequence weights undirected edges, and the
    weighted PageRank variant s(v) = (1−d) + d·Σ w(u,v)/wdeg(u)·s(u)
    runs a fixed ``iters`` rounds from s=1; top-``k`` types per doc win
    (rounded score, ties by word). The graph-based complement to RAKE's
    degree/frequency heuristic — TextRank rewards central vocabulary,
    RAKE rewards long collocations; disagreement between them is a
    useful doc-type signal.

    Spark shape: ALL documents iterate at once — edges are one
    offset-explode equi-join on (doc, position+offset) (never a self
    cartesian), weights/degrees are (doc, word)-keyed aggregates, and
    each iteration is exactly one join + one aggregate over the whole
    corpus' edge table, localCheckpointed so the plan stays flat. No
    per-doc driver loop, no window over the corpus."""
    if window < 2:
        # TextRank co-occurrence windows are >= 2 by definition (window
        # 1 would mean "a token co-occurs with itself"); clamping was a
        # silent window=2 (round-4 ADVICE fix).
        raise ValueError(f"textrank window must be >= 2, got {window}")
    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "w"),
    ).where((F.col("w") != "") & ~F.col("w").isin(list(stoplist)))
    left = toks.select(
        "id", "pos", F.col("w").alias("u"),
        F.explode(F.sequence(F.lit(1), F.lit(window - 1))).alias("__o"),
    ).select("id", (F.col("pos") + F.col("__o")).alias("pos2"), "u")
    pairs = left.join(
        toks.select("id", F.col("pos").alias("pos2"), F.col("w").alias("v")),
        ["id", "pos2"],
    ).where(F.col("u") != F.col("v"))
    und = pairs.select("id", "u", "v").union(
        pairs.select("id", F.col("v").alias("u"), F.col("u").alias("v"))
    )
    edges = und.groupBy("id", "u", "v").agg(
        F.count("*").cast("double").alias("wt")
    )
    edges = edges.localCheckpoint()
    wdeg = edges.groupBy("id", "u").agg(F.sum("wt").alias("__deg"))
    share = edges.join(wdeg, ["id", "u"]).select(
        "id", "u", "v", (F.col("wt") / F.col("__deg")).alias("__share")
    ).localCheckpoint()
    nodes = edges.select("id", F.col("u").alias("w")).distinct()
    scores = nodes.select("id", "w", F.lit(1.0).alias("s")).localCheckpoint()
    for _ in range(iters):
        contrib = (
            share.join(
                scores.select("id", F.col("w").alias("u"), "s"), ["id", "u"]
            )
            .groupBy("id", F.col("v").alias("w"))
            .agg(F.sum(F.col("s") * F.col("__share")).alias("__c"))
        )
        scores = (
            nodes.join(contrib, ["id", "w"], "left")
            .select(
                "id", "w",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce("__c", F.lit(0.0))
                ).alias("s"),
            )
            .localCheckpoint()
        )
    topw = Window.partitionBy("id").orderBy(
        F.desc("s_r"), F.asc("w")
    )
    ranked = scores.withColumn("s_r", F.round("s", round_to))
    return (
        ranked.withColumn("rank", F.row_number().over(topw))
        .where(F.col("rank") <= k)
        .select(
            F.col("id").alias(id_col),
            F.col("rank").cast("int").alias("rank"),
            F.col("w").alias("word"),
            F.col("s_r").alias("score"),
        )
    )


def oov_rate(
    df: DataFrame,
    vocab: list[str],
    *,
    by: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """(slice, n_tokens, n_oov, oov_rate): out-of-vocabulary token share
    per slice against a reference vocabulary — the tokenizer/corpus
    coverage audit (an OOV spike in one language slice means the vocab
    was trained on a different register, and every OOV token costs
    fallback bytes). For model-sized vocabularies the membership test is
    a literal isin (codegen set probe); ship the vocab as a broadcast
    join instead when it stops being config-sized.

    One explode + one slice aggregate, map-side combined."""
    toks = df.select(
        F.col(by).alias("slice"),
        F.explode(tokens(F.col(text_col))).alias("w"),
    ).where(F.col("w") != "")
    is_oov = (~F.col("w").isin(list(vocab))).cast("int")
    return toks.groupBy("slice").agg(
        F.count("*").alias("n_tokens"),
        F.sum(is_oov).alias("n_oov"),
        F.round(F.sum(is_oov) / F.count("*"), 6).alias("oov_rate"),
    )
