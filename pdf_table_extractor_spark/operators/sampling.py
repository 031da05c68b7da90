"""Deterministic sampling / splitting / resampling / sharding for
training-data curation.

Every decision here is a pure function of (key, salt) — NO RNG state, so
results are identical across engines, re-runs, partition layouts, and
cluster sizes (rerunning a failed 100 TB job must not resample). The
uniform variate is the first 8 hex chars of md5(salt || key) read as an
integer over 2^32: an exactly-representable dyadic rational that Spark
(`conv(hex,16,10)`) and any SQL oracle (`('0x'||hex)::UBIGINT`) agree on
bit-for-bit, so sample membership is hash-exact — no float-boundary
drift between engines.

Scale notes per operator live on the functions; nothing here collects to
the driver and every shuffle keys on doc ids or small coarse-group ids.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_U32 = 4294967296.0  # 2^32; division by it is exact in doubles


def uniform_hash(key: Column, salt: str = "") -> Column:
    """Deterministic uniform variate in [0, 1): md5-based, exactly
    reproducible in any engine with md5 + hex→int."""
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") / F.lit(_U32)


def hash_sample(
    df: DataFrame,
    fraction: float,
    *,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Keep rows whose hash variate falls below ``fraction``. One narrow
    filter — predicate-pushdown-friendly, no shuffle, no state."""
    return df.where(uniform_hash(F.col(key_col), salt) < F.lit(float(fraction)))


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    *,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Add a ``split`` column assigning each row to one named split
    (train/val/test, ...) by cumulative weight boundaries. Weights are
    config, not data, so boundaries are driver-side literals; the
    assignment itself is a narrow projection (no shuffle). Deterministic:
    a doc keeps its split under any re-run or repartition."""
    return df.withColumn("split", _split_expr(uniform_hash(F.col(key_col), salt), weights))


def _split_expr(u: Column, weights: dict[str, float]) -> Column:
    """Cumulative-boundary CASE over a uniform variate: the shared split
    assignment of `hash_split` and `leakage_safe_split`."""
    total = float(sum(weights.values()))
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return F.lit(names[0]) if expr is None else expr.otherwise(F.lit(names[-1]))


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    weights: dict[str, float],
    *,
    id_col: str = "doc_id",
    a_col: str = "a",
    b_col: str = "b",
    salt: str = "",
    max_iter: int = 25,
) -> DataFrame:
    """Train/eval assignment that near-duplicates can never straddle.

    `hash_split` keyed on the raw doc id leaks eval data: a near-dup
    pair (the same page crawled twice, a boilerplate-shifted copy)
    lands in train AND eval with probability 2p(1-p) — the classic
    contamination path benchmark decontamination misses because neither
    copy matches the benchmark, they match each other. Here the variate
    is drawn on the near-dup CLUSTER representative — the connected-
    component min-id over the candidate pair graph (`dedup.cc_labels`)
    — so every member of a cluster draws the SAME variate and the whole
    cluster moves to one split. Docs in no candidate pair are their own
    singleton cluster (representative = own id), where this degenerates
    to `hash_split` exactly.

    Output: docs columns + `cluster_rep` (same type as `id_col` — works
    for integer AND string/UUID ids; the variate hash stringifies the
    key itself) + `split`.

    Scale: the candidate graph only holds LSH-collided docs — orders of
    magnitude smaller than the corpus — so `cc_labels`' iterative joins
    run at pair-table width (size the session's shuffle partitions to
    the pair table, per its docstring). The only corpus-wide step is
    one equi-join of docs against the label table, broadcast-able when
    the dup set is small (AQE picks that up from the label-table size);
    the split assignment itself is the same narrow projection as
    `hash_split`.
    """
    from pdf_table_extractor_spark.operators.dedup import cc_labels

    labels = cc_labels(pairs, max_iter=max_iter, a_col=a_col, b_col=b_col).select(
        F.col("id").alias("__lid"), F.col("label").alias("__cc_label")
    )
    joined = docs.join(labels, docs[id_col] == labels["__lid"], "left").drop("__lid")
    rep = F.coalesce(F.col("__cc_label"), F.col(id_col))
    return (
        joined.withColumn("cluster_rep", rep)
        .withColumn("split", _split_expr(uniform_hash(F.col("cluster_rep"), salt), weights))
        .drop("__cc_label")
    )


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    *,
    strata_col: str,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Per-stratum hash sampling (e.g. per-language retention rates).
    Unlisted strata are dropped (fraction 0). Still a narrow filter —
    the per-stratum fraction is a literal map lookup, no shuffle."""
    pairs: list[Column] = []
    for k, v in fractions.items():
        pairs.extend([F.lit(k), F.lit(float(v))])
    frac = F.coalesce(
        F.try_element_at(F.create_map(*pairs), F.col(strata_col)), F.lit(0.0)
    )
    return df.where(uniform_hash(F.col(key_col), salt) < frac)


def temperature_weights(
    df: DataFrame,
    *,
    temperature: float,
    count_col: str = "n_docs",
) -> DataFrame:
    """Per-group downsampling probabilities for temperature-based mixing
    (multinomial sampling with p_g^(1/T), T>1 flattens the mix — the
    mixture scheme used by multilingual/domain-balanced training sets).

    Input: one row per group with its document count. Output adds
    ``keep_prob`` — p_g^(1/T - 1) normalized so the max-WEIGHT group's
    probability is 1 (for T>1 that is the rarest group: it keeps all its
    docs while larger groups are downsampled toward the flattened mix).
    Probabilities are rounded to 6 decimals so both engines in a
    contract agree bit-for-bit after their own pow/ln evaluations.

    Scale: the group table is tiny (domains/languages), so the two
    1-row aggregates (total, max weight) are broadcast cross-joins —
    no data-table shuffle at all."""
    alpha = 1.0 / float(temperature) - 1.0
    n = F.col(count_col).cast("double")
    tot = df.select(F.sum(count_col).cast("double").alias("__tot"))
    with_w = df.crossJoin(F.broadcast(tot)).withColumn(
        "__w", F.pow(n / F.col("__tot"), F.lit(alpha))
    )
    mx = with_w.select(F.max("__w").alias("__mx"))
    return (
        with_w.crossJoin(F.broadcast(mx))
        .withColumn("keep_prob", F.round(F.col("__w") / F.col("__mx"), 6))
        .drop("__tot", "__w", "__mx")
    )


def temperature_resample(
    docs: DataFrame,
    *,
    group_expr: Column,
    temperature: float,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Temperature-downsample a document table: derive per-group keep
    probabilities from the observed group sizes and keep each doc iff its
    hash variate < its group's probability. Adds (``group``,
    ``keep_prob``, ``keep``); callers filter on ``keep``.

    Scale: one hash aggregate over the docs (map-side combined) to get
    group sizes, then a BROADCAST join of the tiny weight table back —
    the corpus itself is never shuffled."""
    grouped = docs.groupBy(group_expr.alias("group")).agg(
        F.count("*").alias("n_docs")
    )
    probs = temperature_weights(grouped, temperature=temperature).select(
        F.col("group").alias("__grp"), "keep_prob"
    )
    u = uniform_hash(F.col(key_col), salt)
    with_g = docs.withColumn("group", group_expr)
    return (
        # eqNullSafe: a NULL group is a real group (the aggregate emits a
        # NULL-key row) — a plain equi-join would silently DROP those docs
        with_g.join(
            F.broadcast(probs), with_g["group"].eqNullSafe(F.col("__grp"))
        )
        .drop("__grp")
        .withColumn("keep", u < F.col("keep_prob"))
    )


def assign_shards(
    docs: DataFrame,
    *,
    tokens_per_shard: int,
    n_tokens: Column,
    order_col: str = "doc_id",
    group_size: int = 1 << 20,
    n_out: str | None = None,
) -> DataFrame:
    """Token-budgeted output sharding: documents in ``order_col`` order
    are packed into contiguous shards of ``tokens_per_shard`` tokens
    (shard = the doc's starting token offset // budget — offset-based, so
    assignment is a pure function of the prefix sums and every engine
    agrees exactly; integer arithmetic throughout).

    The global prefix sum is computed WITHOUT a single-partition window
    over the data: docs get a coarse contiguous group g = order//G, the
    per-group totals (N/G rows — 10^6 rows for 10^12 docs at the default
    G=2^20) take the only global-ordered window, and the offsets broadcast
    back; the per-doc running sum is then a window partitioned by g.
    That is the classic two-level scan: one small shuffle + one
    broadcast, never all rows on one task.

    ``n_out``: also expose the evaluated token count as this output
    column (pinned via ``textops.pin`` so a downstream ``.filter()`` on
    it reads the attribute instead of re-inlining the caller's
    ``n_tokens`` expression — the filter-through-Project gotcha).
    Callers that need the count again (pack_sequences) use this instead
    of re-evaluating their expression."""
    o = F.col(order_col)
    n_expr = n_tokens.cast("long")
    if n_out:
        from pdf_table_extractor_spark.functions.textops import pin

        n_expr = pin(n_expr)
    with_g = docs.withColumn("__n", n_expr).withColumn(
        "__g", F.floor(o / F.lit(int(group_size)))
    )
    totals = with_g.groupBy("__g").agg(F.sum("__n").alias("__gt"))
    w_off = Window.orderBy("__g").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__g", F.coalesce(F.sum("__gt").over(w_off), F.lit(0)).alias("__off")
    )
    w_in = (
        Window.partitionBy("__g")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.col("__off") + F.sum("__n").over(w_in)
    out = (
        with_g.join(F.broadcast(offsets), "__g")
        .withColumn("token_offset", (cum - F.col("__n")).cast("long"))
        .withColumn(
            "shard",
            F.floor(F.col("token_offset") / F.lit(int(tokens_per_shard))).cast(
                "long"
            ),
        )
        .drop("__g", "__off")
    )
    return out.withColumnRenamed("__n", n_out) if n_out else out.drop("__n")


def pack_sequences(
    docs: DataFrame,
    *,
    seq_len: int,
    n_tokens: Column,
    order_col: str = "doc_id",
    group_size: int = 1 << 20,
) -> DataFrame:
    """Concat-and-carve sequence packing: the manifest a training data
    loader needs to fill fixed-length sequences with document segments.
    Documents are concatenated in ``order_col`` order and carved into
    ``seq_len``-token sequences (the GPT-style packing scheme — documents
    spanning a boundary are split across the adjacent sequences). Output:
    one row per (doc, sequence) segment with

    - ``seq_id``      the training sequence the segment lands in
    - ``seg_no``      0-based segment index within the doc
    - ``doc_start``   the segment's first token, as an offset into the doc
    - ``seg_len``     tokens contributed to this sequence
    - ``seq_pos``     the segment's start slot within the sequence

    Segments tile each doc exactly (Σ seg_len = n_tokens, contiguous from
    0) and tile each sequence exactly (Σ seg_len = seq_len for every
    sequence but the last) — property-tested in tests/test_sampling.py.

    Scale: the global token offsets come from ``assign_shards``'s
    two-level prefix-sum (one coarse-group shuffle + one broadcast — no
    single-partition window over doc rows), and the carve itself is a
    narrow bounded posexplode (a doc spans at most n/seq_len + 1
    sequences). Zero-token docs contribute no segments."""
    L = int(seq_len)
    if L <= 0:
        raise ValueError("seq_len must be positive")
    # n_out: the caller's n_tokens expression (often a full tokenize) is
    # evaluated ONCE inside assign_shards and read back as an attribute
    # here; `shard` = floor(offset / L) is exactly the doc's first
    # sequence, so it is reused rather than recomputed.
    with_off = assign_shards(
        docs,
        tokens_per_shard=L,
        n_tokens=n_tokens,
        order_col=order_col,
        group_size=group_size,
        n_out="__n",
    )
    n = F.col("__n")
    off = F.col("token_offset")
    last = ((off + n - F.lit(1)) / F.lit(L)).cast("long")
    seg = with_off.where(n > 0).select(
        "*",
        F.posexplode(F.sequence(F.col("shard"), last)).alias("seg_no", "seq_id"),
    )
    g_start = F.greatest(off, F.col("seq_id") * L)
    g_end = F.least(off + n, (F.col("seq_id") + 1) * L)
    return seg.select(
        *[c for c in with_off.columns if c not in ("shard", "__n")],
        F.col("seq_id").cast("long").alias("seq_id"),
        "seg_no",
        (g_start - off).cast("long").alias("doc_start"),
        (g_end - g_start).cast("long").alias("seg_len"),
        (g_start - F.col("seq_id") * L).cast("long").alias("seq_pos"),
    )


def weighted_topk_sample(
    df: DataFrame,
    *,
    k: int,
    weight: Column,
    by: str | None = None,
    key_col: str = "doc_id",
    salt: str = "",
    prefilter: bool | None = None,
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis–
    Spirakis A-Res): each row gets priority u^(1/w) from its md5 hash
    variate; the top-k priorities per slice form an exact weighted
    sample — quality-weighted subset selection with no RNG state, stable
    under reruns and repartitioning. Rows with weight <= 0 are excluded.

    Scale: a narrow priority projection + per-slice top-k window. With
    ``by=None`` the window is corpus-wide (one partition!), so a
    priority prefilter runs first by default: ONE aggregate pass buckets
    priorities by dyadic distance from 1 (bucket b = floor(-log2(1-pri)),
    <= 65 model-sized rows back to the driver), and the tightest bucket
    boundary whose cumulative-from-top count reaches ~4k becomes a
    literal threshold filter. Because the boundary IS a priority value,
    every survivor outranks every excluded row — the exact top-k over
    survivors equals the exact top-k over everything, with no count()
    scan and no percentile-accuracy/n coupling (the same pass works
    unchanged at 10^12 rows). Set ``prefilter=False`` to skip the extra
    pass on small inputs."""
    u = uniform_hash(F.col(key_col), salt)
    w = weight.cast("double")
    pri = F.pow(u, F.lit(1.0) / w)
    cand = df.where(w > 0).withColumn("__pri", pri)
    if prefilter is None:
        prefilter = by is None
    if prefilter:
        margin = 4 * k
        # pri in (0,1) always (u in (0,1), w > 0), so -log2(1-pri) > 0;
        # the 2^-64 floor caps the bucket index for pri within 1e-19 of 1.
        bucket = F.least(
            F.lit(64),
            F.floor(
                -F.log2(F.greatest(F.lit(1.0) - F.col("__pri"), F.lit(2.0 ** -64)))
            ),
        ).cast("int")
        hist = {
            int(r["b"]): int(r["c"])
            for r in cand.groupBy(bucket.alias("b"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        total = sum(hist.values())
        if total > 2 * margin:
            cum = 0
            for b in sorted(hist, reverse=True):
                cum += hist[b]
                if cum >= margin:
                    if cum < total:  # threshold actually cuts something
                        cand = cand.where(
                            F.col("__pri") >= F.lit(1.0 - 2.0 ** -b)
                        )
                    break
    sl = F.col(by) if by else F.lit("all")
    win = Window.partitionBy(sl).orderBy(F.desc("__pri"), F.col(key_col))
    return (
        cand.withColumn("__rk", F.row_number().over(win))
        .where(F.col("__rk") <= k)
        .drop("__pri", "__rk")
    )


def mix_plan(
    stats: DataFrame,
    *,
    target_tokens: int,
    weights: dict[str, float],
    group_col: str = "slice",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """(slice, n_tokens, target_share, target_tokens, repeat_factor,
    oversampled): the training-mix manifest — how many tokens each source
    contributes to a ``target_tokens`` budget under configured mixture
    weights, and the repeat factor (epochs over that source) needed to
    get there. repeat_factor > 1 flags oversampling (the quality/rarity
    tradeoff reviewers sign off on). Weights are config → driver-side
    literals; sources missing from ``weights`` get share 0.

    Scale: operates on the per-source stats table (tiny); pure
    projection, no shuffle beyond what produced the stats."""
    total_w = float(sum(weights.values()))
    pairs: list[Column] = []
    for k, v in weights.items():
        pairs.extend([F.lit(k), F.lit(float(v) / total_w)])
    share = F.coalesce(
        F.try_element_at(F.create_map(*pairs), F.col(group_col)), F.lit(0.0)
    )
    tgt = F.round(share * F.lit(float(target_tokens))).cast("long")
    return stats.select(
        F.col(group_col),
        F.col(tokens_col).cast("long").alias("n_tokens"),
        F.round(share, 6).alias("target_share"),
        tgt.alias("target_tokens"),
        # try_divide: a 0-token slice yields NULL repeat_factor instead of
        # an ANSI divide-by-zero error; such a slice is still flagged
        # oversampled whenever it has a nonzero target (it can never meet it).
        F.round(F.try_divide(tgt, F.col(tokens_col)), 6).alias("repeat_factor"),
        (tgt > F.col(tokens_col)).alias("oversampled"),
    )
