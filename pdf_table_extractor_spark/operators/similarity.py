"""Similarity search over an embedding column (`array<float>`).

Brute-force cosine top-k is the exact baseline: a broadcast of the (small)
query set against the corpus — one pass, no shuffle on the corpus side,
per-group top-k via window row_number (TakeOrdered per partition under AQE).

The scale path is sign-LSH bucketing: an 8/16-bit bucket from the signs of
the leading dimensions (or any fixed projection) turns the all-pairs join
into an equi-join on bucket id — the same shape Spark already optimizes,
and bucket population is data-independent enough for AQE's skew splitting
to absorb imbalance. Recall is tuned by bucket bits / multiple probes.

All dot products run as zip_with + aggregate on doubles — JVM higher-order
functions, no UDF, deterministic left-to-right fold order (which keeps an
external SQL oracle bit-compatible).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pdf_table_extractor_spark.operators.dedup import bind


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i as an ordered fold (aggregate over zip_with)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k: (query_id, rank, neighbor_id). `queries` is expected to
    be small → broadcast; ties broken by neighbor id for determinism.

    Norms are projected per ROW before the join (same fold → bit-identical
    cosine) instead of recomputed per PAIR — at N corpus × Q queries that
    removes O(N·Q·dim) redundant work from the scored stage."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            norm(F.col(vec_col)).alias("qn"),
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        norm(F.col(vec_col)).alias("cn"),
    )
    scored = (
        c.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", dot(F.col("qvec"), F.col("cvec")) / (F.col("qn") * F.col("cn")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def sign_bucket(vec: Column, bits: int = 4) -> Column:
    """LSH bucket id from the signs of the first `bits` dimensions (exact
    float comparisons — engine-independent)."""
    b = F.lit(0)
    for d in range(bits):
        b = b + F.when(F.element_at(vec, d + 1) > 0, F.lit(1 << d)).otherwise(F.lit(0))
    return b


MAX_LSH_BITS = 24  # 16M buckets — enough for any bounded target at 10^12 rows


def bits_for(n_rows: int, target_bucket_rows: int = 10_000) -> int:
    """Smallest bit count whose expected bucket population stays at or under
    `target_bucket_rows` (uniform-sign assumption): the within-bucket join
    is ~(n/2^bits)² per bucket, so bits MUST grow with the corpus — a fixed
    default (round-1's bits=4 → 16 buckets) degenerates to all-pairs at
    100 TB. Requires the embedding dimension ≥ the returned bits."""
    import math

    if n_rows <= target_bucket_rows:
        return 1
    return min(MAX_LSH_BITS, math.ceil(math.log2(n_rows / target_bucket_rows)))


_PROBE_ROWS = 64  # bounded head sample for row-width measurement


def _datum_bytes(v, dt) -> int:
    """Approximate serialized byte width of one value under its Spark type.
    Catalyst's own defaultSize cannot be used here: it charges an array as
    ONE element (array<float> = 4 bytes), which under-weighs embedding rows
    by ~dim× and would overshoot the derived LSH bits by ~log2(dim)."""
    from pyspark.sql import types as T

    if v is None:
        return 1
    if isinstance(dt, T.StructType):
        return sum(_datum_bytes(v[f.name], f.dataType) for f in dt.fields)
    if isinstance(dt, T.ArrayType):
        return 4 + sum(_datum_bytes(x, dt.elementType) for x in v)
    if isinstance(dt, T.MapType):
        return 4 + sum(
            _datum_bytes(k, dt.keyType) + _datum_bytes(x, dt.valueType)
            for k, x in v.items()
        )
    if isinstance(dt, T.StringType):
        return 4 + len(v.encode("utf-8", errors="replace"))
    if isinstance(dt, T.BinaryType):
        return 4 + len(v)
    if isinstance(dt, (T.BooleanType, T.ByteType)):
        return 1
    if isinstance(dt, (T.ShortType,)):
        return 2
    if isinstance(dt, (T.IntegerType, T.FloatType, T.DateType)):
        return 4
    return 8  # long/double/timestamp/decimal-ish


def estimate_rows(df: DataFrame) -> int:
    """Row-count estimate WITHOUT a full scan, for log2-accuracy sizing
    (LSH bucket bits, partition counts). Resolution order:

    1. The optimizer's exact ``rowCount`` when the plan statistics carry
       it (ANALYZEd tables) — zero actions.
    2. A bounded ``limit(64)`` probe: if the table has fewer rows, that
       IS the exact count; otherwise the probe's median measured row
       width divides the plan's ``sizeInBytes``. The probe touches one
       partition (CollectLimit stops early) — negligible vs a count()
       full scan at 10^12 rows, and compression error is ≤ a bit or two
       of log2, which the callers tolerate by design.
    3. A ``count()`` action only when sizeInBytes is the unknown
       sentinel (conf.defaultSizeInBytes = Long.MaxValue)."""
    size = None
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        rc = stats.rowCount()
        if rc.isDefined():
            return max(1, int(str(rc.get())))
        sz = int(str(stats.sizeInBytes()))
        if 0 < sz < (1 << 62):
            size = sz
    except Exception:  # pragma: no cover - connect/Java API drift
        pass
    head = df.limit(_PROBE_ROWS).collect()
    if len(head) < _PROBE_ROWS:
        return max(1, len(head))
    if size is None:
        return df.count()
    schema = df.schema
    widths = sorted(max(1, _datum_bytes(r, schema)) for r in head)
    return max(_PROBE_ROWS, size // widths[len(widths) // 2])


def _flip_mask(dim_col: Column, bits: int) -> Column:
    """1 << d as a when-chain (shiftleft needs a literal shift amount)."""
    m = F.lit(0)
    for d in range(bits):
        m = F.when(dim_col == d, F.lit(1 << d)).otherwise(m)
    return m


def probe_buckets(vec: Column, bits: int, n_probe: int) -> Column:
    """Multi-probe bucket ids: the primary bucket plus `n_probe - 1`
    variants with the lowest-margin sign bits flipped (|v_d| smallest → the
    sign least certain → the flip most likely to recover a true neighbor).
    Deterministic tie-break on dimension index."""
    if n_probe <= 1:
        return F.array(sign_bucket(vec, bits))
    margins = F.zip_with(
        F.slice(vec, 1, bits),
        F.sequence(F.lit(0), F.lit(bits - 1)),
        lambda v, d: F.struct(F.abs(v).alias("m"), d.alias("d")),
    )
    flips = F.slice(F.array_sort(margins), 1, n_probe - 1)

    # bind: the primary-bucket aggregate would otherwise re-evaluate per
    # probe flip (dedup.bind docstring — HOF-lambda re-inlining)
    def probes_of(prim: Column) -> Column:
        return F.concat(
            F.array(prim),
            F.transform(flips, lambda s: prim.bitwiseXOR(_flip_mask(s["d"], bits))),
        )

    return bind(sign_bucket(vec, bits), probes_of)


def lsh_nearest(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int | None = None,
    n_probe: int = 1,
    target_bucket_rows: int = 10_000,
    n_rows: int | None = None,
) -> DataFrame:
    """Approximate nearest neighbor via sign-LSH bucketing:
    (vec_id, neighbor_id). Equi-join on bucket → no all-pairs blowup.

    ``bits=None`` derives the bucket count from the corpus size so bucket
    population stays bounded (`bits_for`): pass ``n_rows`` when the count
    is already known upstream, else plan statistics size it without an
    action (`estimate_rows` — a count() scan only as a last resort when
    the plan carries no stats). Recall lost to more buckets is bought
    back with ``n_probe`` > 1: the probe side additionally searches the
    buckets reached by flipping its lowest-margin sign bits — candidates
    are a superset of the single-probe set, so recall is monotone in
    n_probe while cost stays ~n_probe × bucket size (never all-pairs)."""
    if bits is None:
        n = n_rows if n_rows is not None else estimate_rows(df)
        bits = bits_for(n, target_bucket_rows)
    withb = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
        norm(F.col(vec_col)).alias("n"),
        sign_bucket(F.col(vec_col), bits).alias("bkt"),
    )
    probing = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        norm(F.col(vec_col)).alias("n"),
        F.explode(probe_buckets(F.col(vec_col), bits, n_probe)).alias("bkt"),
    )
    l, r = probing.alias("l"), withb.alias("r")
    # per-row norms projected before the join: same fold → bit-identical
    # cosine, O(bucket²·dim) less work inside the bucket join
    scored = (
        l.join(r, (F.col("l.bkt") == F.col("r.bkt")) & (F.col("l.id") != F.col("r.id")))
        .withColumn(
            "cos",
            dot(F.col("l.v"), F.col("r.v")) / (F.col("l.n") * F.col("r.n")),
        )
    )
    w = Window.partitionBy(F.col("l.id")).orderBy(F.col("cos").desc(), F.col("r.id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(F.col("l.id").alias("vec_id"), F.col("r.id").alias("neighbor_id"))
    )


def kmeans_centroids(
    corpus: DataFrame,
    k: int,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = None,
) -> DataFrame:
    """Distributed Lloyd's k-means over an embedding column, as pure
    DataFrame ops: broadcast the k current centroids, argmax-assign every
    vector (cosine), recompute each centroid as the element-wise mean of
    its cell — one broadcast join + one groupBy per iteration, no UDFs,
    no driver-side loops over data (only k small centroid rows ever reach
    the driver, exactly like MLlib's implementation strategy).

    Deterministic: seeded by the k lowest-id vectors, fixed iteration
    count, and a first-min tie-break in the assignment. Empty cells keep
    their previous centroid. Returns (cent_id, cvec).

    ``round_to``: round each centroid mean to that many decimals per
    iteration (the train_linear_quality trajectory trick) — a distributed
    avg's float-sum order differs between engines/partitionings by
    ~1e-16, and rounding pins the trajectory so a SQL oracle replays it
    bit-identically. None (default) keeps raw doubles."""
    c = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    cents = (
        c.orderBy("id")
        .limit(k)
        .select(
            F.row_number().over(Window.orderBy("id")).alias("cent_id"),
            F.col("v").cast("array<double>").alias("cvec"),
        )
    )
    for _ in range(n_iter):
        bc = F.broadcast(cents)
        # argmax-assign as a map-side-combinable hash aggregate (max_by on
        # an (ccos, -cent_id) ordering struct = highest cosine, lowest
        # cent_id on ties) — NOT a row_number window: a window on the
        # unique vector id would shuffle+sort the whole corpus for a
        # per-key-size-1 ranking.
        assigned = (
            c.crossJoin(bc)
            .withColumn("ccos", cosine(F.col("v"), F.col("cvec")))
            .groupBy("id")
            .agg(
                F.max_by(
                    F.struct("cent_id", "v"),
                    F.struct(F.col("ccos"), (-F.col("cent_id")).alias("nc")),
                ).alias("best")
            )
            .select(F.col("best.cent_id").alias("cent_id"), F.col("best.v").alias("v"))
        )
        # element-wise mean per cell via posexplode + partial-aggregated
        # avg: the shuffle carries only k×dim partial sums, never whole
        # cells (a collect_list of a cell's vectors would OOM at scale)
        updated = (
            assigned.select("cent_id", F.posexplode("v").alias("pos", "x"))
            .groupBy("cent_id", "pos")
            .agg(
                (
                    F.round(F.avg(F.col("x").cast("double")), round_to)
                    if round_to is not None
                    else F.avg(F.col("x").cast("double"))
                ).alias("m")
            )
            .groupBy("cent_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("cvec")
            )
        )
        # empty cells keep their previous centroid (left join + coalesce)
        cents = (
            cents.alias("old")
            .join(updated.alias("new"), "cent_id", "left")
            .select(
                "cent_id",
                F.coalesce(F.col("new.cvec"), F.col("old.cvec")).alias("cvec"),
            )
        )
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_centroids: int = 16,
    n_probe: int = 2,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_iters: int = 0,
    round_to: int | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: assign every vector to its
    nearest centroid cell, search queries only inside their `n_probe`
    closest cells.

    ``kmeans_iters`` > 0 trains the centroids with that many distributed
    Lloyd's iterations (`kmeans_centroids`) — balanced cells, the
    production configuration. 0 uses the `n_centroids` lowest-id corpus
    vectors directly (cheap, deterministic, fine for contract tests).
    Either way the centroid table broadcasts; cell assignment is a
    broadcast-join argmax, and the search is an equi-join on cell id — the
    same shuffle-friendly shape as the LSH variant, with recall controlled
    by n_probe instead of bucket bits.

    ``round_to`` forwards to `kmeans_centroids`: rounding each iteration's
    centroid means pins the training trajectory so a SQL oracle replays the
    whole index build + search bit-identically (see q_ann_ivf).
    """
    if kmeans_iters > 0:
        cents = F.broadcast(
            kmeans_centroids(
                corpus,
                n_centroids,
                kmeans_iters,
                id_col=id_col,
                vec_col=vec_col,
                round_to=round_to,
            )
        )
    else:
        cents = F.broadcast(
            corpus.orderBy(id_col).limit(n_centroids).select(
                F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cvec")
            )
        )

    def assign(df: DataFrame, n_cells: int) -> DataFrame:
        """top-`n_cells` centroid ids per vector by cosine. The corpus side
        (n_cells=1) is a max_by hash aggregate — map-side-combinable, no
        window shuffle+sort on the unique id; the multi-probe query side
        (small by construction) keeps the row_number window."""
        scored = df.crossJoin(cents).withColumn(
            "ccos", cosine(F.col("v"), F.col("cvec"))
        )
        if n_cells == 1:
            return (
                scored.groupBy("id")
                .agg(
                    F.max_by(
                        F.struct("cent_id", "v"),
                        F.struct(F.col("ccos"), (-F.col("cent_id")).alias("nc")),
                    ).alias("best")
                )
                .select(
                    "id",
                    F.col("best.v").alias("v"),
                    F.col("best.cent_id").alias("cell"),
                )
            )
        w = Window.partitionBy("id").orderBy(F.col("ccos").desc(), F.col("cent_id"))
        return (
            scored.withColumn("crk", F.row_number().over(w))
            .filter(F.col("crk") <= n_cells)
            .select("id", "v", F.col("cent_id").alias("cell"))
        )

    c = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    q = queries.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    corpus_cells = assign(c, 1)  # each corpus vector lives in ONE cell
    query_cells = assign(q, n_probe)  # queries probe several

    cand = (
        query_cells.alias("q")
        .join(corpus_cells.alias("c"), F.col("q.cell") == F.col("c.cell"))
        .filter(F.col("q.id") != F.col("c.id"))
        .select(
            F.col("q.id").alias("query_id"),
            F.col("c.id").alias("neighbor_id"),
            cosine(F.col("q.v"), F.col("c.v")).alias("cos"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def sqdist(a: Column, b: Column) -> Column:
    """Σ (a_i − b_i)² as an ordered fold (aggregate over zip_with) —
    squared L2, the metric PQ codebooks are trained and probed with."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _subspace_rows(
    df: DataFrame, m: int, id_col: str, vec_col: str
) -> DataFrame:
    """(id, sub, sv): explode each vector into its ``m`` contiguous
    subspace slices (sub is 0-based; dim must divide by m — enforced by
    the slice arithmetic: a ragged tail would silently shrink the last
    subvector, so callers pick m | dim). One narrow explode — no shuffle."""
    v = F.col(vec_col).cast("array<double>")
    dsub = (F.size(F.col("__v")) / m).cast("int")
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
        v.alias("__v"),
    ).select(
        "id",
        "sub",
        F.slice(F.col("__v"), F.col("sub") * dsub + 1, dsub).alias("sv"),
    )


def pq_train(
    corpus: DataFrame,
    m: int = 4,
    k: int = 16,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = None,
) -> DataFrame:
    """Product-quantization codebooks (Jégou et al., PAMI 2011): split the
    dimension into ``m`` contiguous subspaces and train an independent
    k-means (squared-L2) in each — ALL m codebooks in the same distributed
    passes, the subspace id simply joining the grouping key. Returns
    (sub, cent_id, cvec) — m·k small rows.

    Scale: per iteration ONE broadcast join (m·k centroid rows) + one
    min_by hash aggregate + one posexplode partial-aggregate mean — the
    exact `kmeans_centroids` shape with `sub` added to every key; no
    window over the corpus, no driver data loops. Seeding/tie-breaks are
    deterministic (k lowest-id vectors per subspace, lowest cent_id on
    distance ties); ``round_to`` pins each iteration's centroid means so
    a SQL oracle replays the whole training trajectory (q_ann_pq)."""
    sv = _subspace_rows(corpus, m, id_col, vec_col)
    seeds = _subspace_rows(
        corpus.orderBy(id_col).limit(k), m, id_col, vec_col
    )
    cents = seeds.select(
        "sub",
        F.row_number()
        .over(Window.partitionBy("sub").orderBy("id"))
        .alias("cent_id"),
        F.col("sv").alias("cvec"),
    )
    for _ in range(n_iter):
        assigned = (
            sv.join(F.broadcast(cents), "sub")
            .withColumn("d2", sqdist(F.col("sv"), F.col("cvec")))
            .groupBy("id", "sub")
            .agg(
                F.min_by(
                    F.struct("cent_id", "sv"), F.struct("d2", "cent_id")
                ).alias("best")
            )
            .select(
                "sub",
                F.col("best.cent_id").alias("cent_id"),
                F.col("best.sv").alias("sv"),
            )
        )
        updated = (
            assigned.select("sub", "cent_id", F.posexplode("sv").alias("pos", "x"))
            .groupBy("sub", "cent_id", "pos")
            .agg(
                (
                    F.round(F.avg("x"), round_to)
                    if round_to is not None
                    else F.avg("x")
                ).alias("mx")
            )
            .groupBy("sub", "cent_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "mx"))),
                    lambda s: s["mx"],
                ).alias("cvec")
            )
        )
        cents = (
            cents.alias("old")
            .join(updated.alias("new"), ["sub", "cent_id"], "left")
            .select(
                "sub",
                "cent_id",
                F.coalesce(F.col("new.cvec"), F.col("old.cvec")).alias("cvec"),
            )
        )
    return cents


def pq_codes(
    corpus: DataFrame,
    codebooks: DataFrame,
    m: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, sub, code): quantize every vector to its nearest centroid per
    subspace. THIS is the table that lives at 100 TB — m small ints per
    vector instead of the float array (64-dim float32 → 4 ints is 16×
    smaller before encoding) — and the only corpus-sized input ADC search
    needs. One broadcast join + one min_by hash aggregate."""
    sv = _subspace_rows(corpus, m, id_col, vec_col)
    return (
        sv.join(F.broadcast(codebooks), "sub")
        .withColumn("d2", sqdist(F.col("sv"), F.col("cvec")))
        .groupBy("id", "sub")
        .agg(F.min(F.struct("d2", "cent_id")).alias("best"))
        .select("id", "sub", F.col("best.cent_id").alias("code"))
    )


def pq_adc_topk(
    codes: DataFrame,
    codebooks: DataFrame,
    queries: DataFrame,
    k: int = 3,
    m: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = None,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: per query, a lookup
    table of squared-L2 distances from its subvectors to every centroid
    (Q·m·k_cents rows — model-sized), then every corpus candidate's
    distance is the SUM of m table entries. (query_id, rank, neighbor_id),
    ranked by (adist asc, neighbor_id). ``round_to`` rounds each LUT entry
    so a SQL oracle's ADC sums rank identically (q_ann_pq).

    Scale: the LUT broadcasts; the corpus side touches ONLY the skinny
    codes table — one broadcast equi-join on (sub, code) + one
    map-side-combinable sum aggregate. Full vectors are never shuffled,
    never even read at query time — the canonical RAM-resident ANN shape
    (compose with ivf_topk cells to prune candidates first)."""
    d2 = sqdist(F.col("sv"), F.col("cvec"))
    if round_to is not None:
        d2 = F.round(d2, round_to)
    lut = (
        _subspace_rows(queries, m, id_col, vec_col)
        .withColumnRenamed("id", "query_id")
        .join(F.broadcast(codebooks), "sub")
        .select(
            "query_id",
            "sub",
            F.col("cent_id").alias("code"),
            d2.alias("d2"),
        )
    )
    # the adist round matters beyond oracle parity: candidates sharing a
    # code signature have MATHEMATICALLY equal sums, but float-add order
    # would break those ties by ulp noise instead of the neighbor_id
    # tie-break — rounding restores deterministic, run-invariant ranking
    adist = F.sum("d2")
    if round_to is not None:
        adist = F.round(adist, round_to)
    cand = (
        codes.join(F.broadcast(lut), ["sub", "code"])
        .filter(F.col("id") != F.col("query_id"))
        .groupBy("query_id", F.col("id").alias("neighbor_id"))
        .agg(adist.alias("adist"), F.count("*").alias("__m"))
        # a candidate missing LUT rows for some subspace would under-sum:
        # keep only complete m-subspace sums (always true by construction,
        # cheap to enforce)
        .filter(F.col("__m") == m)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scope_col: str | None = None,
    threshold: float = 0.4,
) -> DataFrame:
    """Embedding-cosine near-duplicates within a scope column (label/host):
    distinct (a, b), a < b, cosine ≥ threshold."""
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        norm(F.col(vec_col)).alias("n"),
        (F.col(scope_col) if scope_col else F.lit(1)).alias("scope"),
    )
    l, r = base.alias("l"), base.alias("r")
    # per-row norms before the scoped self-join (bit-identical cosine,
    # O(pairs·dim) less arithmetic)
    return (
        l.join(
            r,
            (F.col("l.scope") == F.col("r.scope")) & (F.col("l.id") < F.col("r.id")),
        )
        .withColumn(
            "cos", dot(F.col("l.v"), F.col("r.v")) / (F.col("l.n") * F.col("r.n"))
        )
        .filter(F.col("cos") >= threshold)
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
    )


def semdedup(
    corpus: DataFrame,
    *,
    k: int,
    threshold: float,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication" — public method): k-means-
    cluster the embedding space, then mark semantic near-duplicates
    WITHIN each cluster (cosine ≥ threshold) and keep one exemplar per
    duplicate group. Returns one row per vector: (id, cent_id, keep) —
    ``keep`` is False iff a lower-id vector in the same cluster sits
    within the threshold (the paper's one-pass within-cluster rule, with
    the lowest id as the deterministic exemplar).

    Scale: clustering is the distributed Lloyd's above (broadcast
    centroids + hash-aggregate argmax — no windows, no driver data); the
    cluster scoping IS the published method's point — the pairwise stage
    is never corpus-wide all-pairs, and k is the knob bounding the join
    (E[cluster size] = n/k). The drop rule is a distinct + left join on
    ids only. At extreme scale, persist the (id, vec) projection first:
    Lloyd's iterations re-scan it by design (MLlib does the same).
    ``round_to`` pins the centroid-mean trajectory so the whole
    composition — including the clustering — replays bit-identically in
    an external SQL oracle."""
    cents = kmeans_centroids(
        corpus, k, n_iter, id_col, vec_col, round_to=round_to
    )
    c = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    assigned = (
        c.crossJoin(F.broadcast(cents))
        .withColumn("ccos", cosine(F.col("v"), F.col("cvec")))
        .groupBy("id")
        .agg(
            F.max_by(
                F.col("cent_id"),
                F.struct(F.col("ccos"), (-F.col("cent_id")).alias("nc")),
            ).alias("cent_id")
        )
        .withColumnRenamed("id", id_col)
    )
    scoped = corpus.select(F.col(id_col), F.col(vec_col)).join(assigned, id_col)
    pairs = near_dup_pairs(
        scoped,
        id_col=id_col,
        vec_col=vec_col,
        scope_col="cent_id",
        threshold=threshold,
    )
    dropped = pairs.select(F.col("b").alias(id_col)).distinct().withColumn(
        "__drop", F.lit(True)
    )
    return assigned.join(dropped, id_col, "left").select(
        id_col,
        "cent_id",
        F.coalesce(~F.col("__drop"), F.lit(True)).alias("keep"),
    )


def mean_pool_dims(
    df: DataFrame,
    *,
    group_col: str = "label",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """(grp, dim, mean): element-wise mean of vectors per group — the
    chunk→document (or cluster-centroid) embedding pooling step, exposed
    dimension-wise.

    Scale: posexplode to (group, dim, value) then ONE hash aggregate
    keyed (group, dim) — fully map-side-combinable. Never
    collect_list(vector) per group: that ships every member vector to a
    single reducer row and caps group size at executor memory."""
    ex = df.select(
        F.col(group_col).alias("grp"),
        F.posexplode(F.col(vec_col)).alias("dim", "v"),
    )
    return ex.groupBy("grp", "dim").agg(
        F.round(F.avg(F.col("v").cast("double")), round_to).alias("mean")
    )


def mean_pool(
    df: DataFrame,
    *,
    group_col: str = "label",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """(grp, pooled): the packed-array form of mean_pool_dims (one extra
    per-group pack aggregate; the array is dim-ordered)."""
    dims = mean_pool_dims(
        df, group_col=group_col, vec_col=vec_col, round_to=round_to
    )
    packed = F.array_sort(F.collect_list(F.struct("dim", "mean")))
    return dims.groupBy("grp").agg(
        F.transform(packed, lambda s: s["mean"]).alias("pooled")
    )


def quantize_int8(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, q_min, q_max, q): per-vector min/max int8 scalar quantization
    — q[i] = round((x[i]-min)·255/(max-min)) in [0,255]; dequantize as
    min + q·(max-min)/255. The standard 4× memory shrink for ANN
    candidate stages. Pure codegen array expressions, no UDF; constant
    vectors (max==min) quantize to all-zeros."""
    vec = F.col(vec_col)
    mn = F.array_min(vec).cast("double")
    mx = F.array_max(vec).cast("double")
    span = mx - mn
    q = F.when(
        span > 0,
        F.transform(
            vec,
            lambda x: F.round((x.cast("double") - mn) * 255 / span, 0).cast("int"),
        ),
    ).otherwise(F.transform(vec, lambda x: F.lit(0)))
    return df.select(
        F.col(id_col),
        F.round(mn, 6).alias("q_min"),
        F.round(mx, 6).alias("q_max"),
        q.alias("q"),
    )


# ---------------------------------------------------------------------------
# PCA whitening: the embedding-preprocessing step in front of clustering /
# SemDeDup / IVF (decorrelated, variance-equalized coordinates make
# euclidean cells rounder and cosine thresholds sharper). The DATA work —
# the d×d covariance — is distributed aggregation; the MODEL work — the
# d×d eigendecomposition — is driver-side numpy on a model-sized matrix
# (768² doubles ≈ 4.7 MB), exactly like holding k-means centroids or
# trained classifier weights on the driver.
# ---------------------------------------------------------------------------


def embed_covariance(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    method: str = "expr",
    round_to: int = 6,
) -> DataFrame:
    """(i, j, n, cov): upper triangle (i <= j, 1-based dims) of the
    embedding covariance matrix, cov = (Σxy − ΣxΣy/n)/n (population).

    ``method='expr'`` (oracle-exact): per row, a codegen nested
    transform emits the d(d+1)/2 (i, j, x·y) terms, then ONE hash
    aggregate — n·d²/2 exploded rows, right up to ~10⁷ rows × moderate d.

    ``method='partial'`` (the 10^9-row × 768-dim path): an Arrow-batched
    mapInPandas computes each PARTITION's (n, Σx, Σy, Σxy) partials with
    one float64 BLAS call (vectors never explode into rows), then the
    same hash aggregate combines partitions — shuffle volume is
    partitions × d²/2 partial rows, independent of row count. Same
    result up to float-summation order (both sides round to
    ``round_to``)."""
    v = F.col(vec_col)
    if method == "expr":
        pairs = bind(
            v,
            lambda vv: F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.size(vv)),
                    lambda i: F.transform(
                        F.sequence(i, F.size(vv)),
                        lambda j: F.struct(
                            i.alias("i"),
                            j.alias("j"),
                            F.element_at(vv, i).cast("double").alias("x"),
                            F.element_at(vv, j).cast("double").alias("y"),
                        ),
                    ),
                )
            ),
        )
        ex = df.select(F.explode(pairs).alias("p")).select(
            "p.i", "p.j", "p.x", "p.y"
        )
        partial = ex.groupBy("i", "j").agg(
            F.count("*").alias("__n"),
            F.sum("x").alias("__sx"),
            F.sum("y").alias("__sy"),
            F.sum(F.col("x") * F.col("y")).alias("__sxy"),
        )
    elif method == "partial":
        import numpy as np
        import pandas as pd

        def part(batches):
            n = 0
            sx = None
            sxy = None
            for pdf in batches:
                m = np.stack(pdf[vec_col].to_numpy()).astype("float64")
                n += m.shape[0]
                sx = m.sum(axis=0) if sx is None else sx + m.sum(axis=0)
                g = m.T @ m
                sxy = g if sxy is None else sxy + g
            if n == 0:
                return
            d = len(sx)
            iu, ju = np.triu_indices(d)
            yield pd.DataFrame(
                {
                    "i": iu + 1,
                    "j": ju + 1,
                    "__n": n,
                    "__sx": sx[iu],
                    "__sy": sx[ju],
                    "__sxy": sxy[iu, ju],
                }
            )

        part_schema = "i int, j int, __n long, __sx double, __sy double, __sxy double"
        partial = (
            df.select(v.alias(vec_col))
            .mapInPandas(part, part_schema)
            .groupBy("i", "j")
            .agg(
                F.sum("__n").alias("__n"),
                F.sum("__sx").alias("__sx"),
                F.sum("__sy").alias("__sy"),
                F.sum("__sxy").alias("__sxy"),
            )
        )
    else:
        raise ValueError(f"method must be 'expr' or 'partial', got {method!r}")
    n = F.col("__n")
    cov = (F.col("__sxy") - F.col("__sx") * F.col("__sy") / n) / n
    return partial.select(
        "i", "j", n.alias("n"), F.round(cov, round_to).alias("cov")
    )


def pca_model(
    cov_df: DataFrame, *, k: int | None = None
) -> tuple[list[float], list[list[float]]]:
    """(eigenvalues desc, components) from an ``embed_covariance``
    output. DRIVER-SIDE BY DESIGN: the input is d(d+1)/2 MODEL rows
    (the covariance), never data rows — collecting it is the same move
    as holding trained classifier weights. Signs are fixed (largest-
    magnitude entry of each component made positive) so the model is
    deterministic across LAPACK builds up to eigenvalue ties."""
    import numpy as np

    rows = cov_df.collect()
    d = max(r["j"] for r in rows)
    m = np.zeros((d, d))
    for r in rows:
        m[r["i"] - 1, r["j"] - 1] = r["cov"]
        m[r["j"] - 1, r["i"] - 1] = r["cov"]
    vals, vecs = np.linalg.eigh(m)
    order = np.argsort(vals)[::-1]
    vals, vecs = vals[order], vecs[:, order]
    if k is not None:
        vals, vecs = vals[:k], vecs[:, :k]
    comps = []
    for c in range(vecs.shape[1]):
        col = vecs[:, c]
        if col[np.argmax(np.abs(col))] < 0:
            col = -col
        comps.append([float(x) for x in col])
    return [float(x) for x in vals], comps


def _round_half_up(x: float, r: int) -> float:
    """Half-away-from-zero rounding — the semantics Spark's ``round`` and
    DuckDB's ``ROUND`` share (Python's builtin is banker's)."""
    import math

    s = 10.0 ** r
    return math.copysign(math.floor(abs(x) * s + 0.5), x) / s


def pca_power_model(
    cov_df: DataFrame,
    *,
    k: int = 2,
    n_iter: int = 8,
    round_to: int = 6,
) -> tuple[list[float], list[list[float]]]:
    """(eigenvalues desc, components) via fixed-round power iteration with
    deflation over an ``embed_covariance`` output, every intermediate
    rounded to ``round_to`` — a trajectory-pinned eigensolver. Unlike
    ``pca_model`` (LAPACK ``eigh``, an engine-private float path no other
    engine can reproduce), every step here is plain rounded arithmetic, so
    a SQL oracle replays the WHOLE model build bit-identically
    (q_pca_whiten replays it in DuckDB — the same trick as the k-means /
    BPE / linear-quality trajectories). DRIVER-SIDE BY DESIGN: the input
    is d(d+1)/2 MODEL rows, never data rows, exactly like ``pca_model``.

    Trajectory: v₀ = round(1/√d)·𝟙; step v ← round(Mv/|Mv|); after
    ``n_iter`` steps λ = round(vᵀMv); sign-fix the OUTPUT copy (largest-
    |coordinate|, lowest-position tie-break, made positive — deflation is
    sign-invariant); deflate M ← round(M − λvvᵀ). Approximate for small
    eigen-gaps (documented), which is fine for whitening: coordinates are
    decorrelated along whatever directions the fixed trajectory found,
    and both engines find the same ones."""
    rows = cov_df.collect()
    d = max(r["j"] for r in rows)
    m = [[0.0] * d for _ in range(d)]
    for r in rows:
        m[r["i"] - 1][r["j"] - 1] = r["cov"]
        m[r["j"] - 1][r["i"] - 1] = r["cov"]
    vals: list[float] = []
    comps: list[list[float]] = []
    for _c in range(k):
        v = [_round_half_up(1.0 / d ** 0.5, round_to)] * d
        for _t in range(n_iter):
            w = [sum(m[i][j] * v[j] for j in range(d)) for i in range(d)]
            nrm = sum(x * x for x in w) ** 0.5
            v = [_round_half_up(x / nrm, round_to) for x in w]
        lam = _round_half_up(
            sum(v[i] * m[i][j] * v[j] for i in range(d) for j in range(d)),
            round_to,
        )
        amax = max(range(d), key=lambda i: (abs(v[i]), -i))
        vals.append(lam)
        comps.append([-x for x in v] if v[amax] < 0 else list(v))
        m = [
            [
                _round_half_up(m[i][j] - lam * v[i] * v[j], round_to)
                for j in range(d)
            ]
            for i in range(d)
        ]
    return vals, comps


def pca_project(
    df: DataFrame,
    components: list[list[float]],
    means: list[float],
    *,
    eigvals: list[float] | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "proj",
    round_to: int = 6,
    eps: float = 1e-9,
) -> DataFrame:
    """(id, proj): center on ``means`` and project onto ``components``
    (from ``pca_model``); pass ``eigvals`` to whiten (divide coordinate
    c by sqrt(λ_c + eps) — unit variance per retained direction).

    Scale: the model enters as literal arrays inside ONE codegen
    projection — no join, no broadcast table, no UDF; cost is a scan."""
    from pdf_table_extractor_spark.operators.dedup import bind

    mean_arr = F.array(*[F.lit(float(x)) for x in means])
    centered = F.zip_with(
        F.col(vec_col), mean_arr, lambda x, m: x.cast("double") - m
    )

    def coords_of(cv: Column) -> Column:
        # cv is a bound lambda var: the centering runs ONCE per row even
        # though every component's dot product references it (the
        # CLAUDE.md multi-reference gotcha).
        coords = []
        for c, comp in enumerate(components):
            carr = F.array(*[F.lit(float(x)) for x in comp])
            coord = F.aggregate(
                F.zip_with(cv, carr, lambda x, w: x * w),
                F.lit(0.0),
                lambda acc, t: acc + t,
            )
            if eigvals is not None:
                coord = coord / F.lit(float((eigvals[c] + eps) ** 0.5))
            coords.append(F.round(coord, round_to))
        return F.array(*coords)

    return df.select(F.col(id_col), bind(centered, coords_of).alias(out_col))


def bitext_margin(
    src: DataFrame,
    tgt: DataFrame,
    *,
    k: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int | None = None,
) -> DataFrame:
    """Margin-based bitext mining (Artetxe & Schwenk 2019, the
    CCMatrix/LASER method): for every source embedding, its best target
    under the margin score cos(x,y) / ((knn_k(x) + knn_k(y)) / 2), where
    knn_k(v) is the mean cosine of v's k nearest candidates on the other
    side — normalizing by local density kills hub vectors that are
    "close to everything". Returns (src_id, tgt_id, mutual); mutual=true
    means the pair is ALSO the target's best source — the high-precision
    mining criterion.

    Candidates: ``bits=None`` broadcasts the target side (exact — for
    bounded targets); ``bits=b`` equi-joins on the sign-LSH bucket
    (similarity.sign_bucket) so a 10^12×10^12 mining run touches only
    within-bucket pairs — size b with bits_for(), same as lsh_nearest.

    Everything after candidates is id-keyed: two top-k windows over
    per-id candidate lists (bucket-bounded, never global), two mean
    aggregates, two equi join-backs, and per-id argmax windows. The
    margin ranking breaks ties on neighbor id, like every ANN ranking
    here.
    """
    s = src.select(
        F.col(id_col).alias("src_id"),
        F.col(vec_col).alias("__sv"),
        norm(F.col(vec_col)).alias("__sn"),
    )
    t = tgt.select(
        F.col(id_col).alias("tgt_id"),
        F.col(vec_col).alias("__tv"),
        norm(F.col(vec_col)).alias("__tn"),
    )
    if bits is None:
        cand = s.crossJoin(F.broadcast(t))
    else:
        s = s.withColumn("__b", sign_bucket(F.col("__sv"), bits))
        t = t.withColumn("__b", sign_bucket(F.col("__tv"), bits))
        cand = s.join(t, "__b")
    pairs = cand.select(
        "src_id",
        "tgt_id",
        (dot(F.col("__sv"), F.col("__tv")) / (F.col("__sn") * F.col("__tn"))).alias(
            "cos"
        ),
    )
    ws = Window.partitionBy("src_id").orderBy(F.desc("cos"), F.asc("tgt_id"))
    wt = Window.partitionBy("tgt_id").orderBy(F.desc("cos"), F.asc("src_id"))
    ranked = pairs.withColumn("__rs", F.row_number().over(ws)).withColumn(
        "__rt", F.row_number().over(wt)
    )
    knn_s = (
        ranked.where(F.col("__rs") <= k)
        .groupBy("src_id")
        .agg(F.avg("cos").alias("__ks"))
    )
    knn_t = (
        ranked.where(F.col("__rt") <= k)
        .groupBy("tgt_id")
        .agg(F.avg("cos").alias("__kt"))
    )
    margins = (
        pairs.join(knn_s, "src_id")
        .join(knn_t, "tgt_id")
        .withColumn(
            "__margin", F.col("cos") / ((F.col("__ks") + F.col("__kt")) / F.lit(2.0))
        )
    )
    bs = Window.partitionBy("src_id").orderBy(F.desc("__margin"), F.asc("tgt_id"))
    bt = Window.partitionBy("tgt_id").orderBy(F.desc("__margin"), F.asc("src_id"))
    best_s = (
        margins.withColumn("__r", F.row_number().over(bs))
        .where(F.col("__r") == 1)
        .select("src_id", "tgt_id")
    )
    best_t = (
        margins.withColumn("__r", F.row_number().over(bt))
        .where(F.col("__r") == 1)
        .select(
            F.col("src_id").alias("__bts"), F.col("tgt_id").alias("__btt"),
            F.lit(True).alias("__m"),
        )
    )
    return (
        best_s.join(
            best_t,
            (best_s["src_id"] == F.col("__bts")) & (best_s["tgt_id"] == F.col("__btt")),
            "left",
        )
        .select("src_id", "tgt_id", F.coalesce(F.col("__m"), F.lit(False)).alias("mutual"))
    )


def random_projection(
    df: DataFrame,
    *,
    dim: int,
    out_dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    salt: str = "rp",
    round_to: int | None = None,
) -> DataFrame:
    """(id, proj): Johnson–Lindenstrauss sign random projection —
    y_j = (1/√k)·Σ_i x_i·s(i,j) with s(i,j) ∈ {±1} (Achlioptas 2003,
    database-friendly projections). The cheap dimensionality squeeze in
    front of LSH bucketing / coarse ANN when PCA's data pass is not
    worth it; distance distortion is bounded by the JL lemma for
    k = O(ln n / ε²).

    The ±1 matrix is md5-derived from (salt, i, j) LITERALS only, so
    Catalyst constant-folds the whole k×d matrix at plan time — per-row
    cost is k·d fused multiply-adds in codegen, zero md5 at runtime,
    and any engine (or executor, or rerun) derives the identical
    matrix with no shipped state. Sequential fold order (aggregate /
    list_reduce) is pinned so cross-engine sums agree bit-for-bit."""
    k, d = int(out_dim), int(dim)
    inv = 1.0 / (k ** 0.5)
    vec = F.col(vec_col)

    def sign(i: int, j: int) -> Column:
        h = F.md5(F.lit(f"{salt}:{i}:{j}"))
        bit = F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % 2
        return F.when(bit == 0, F.lit(1.0)).otherwise(F.lit(-1.0))

    smat = F.array(*[
        F.array(*[sign(i, j) for i in range(d)]) for j in range(k)
    ])
    proj = F.transform(
        smat,
        lambda srow: F.aggregate(
            F.zip_with(vec, srow, lambda x, sgn: x.cast("double") * sgn),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        * F.lit(inv),
    )
    if round_to is not None:
        proj = F.transform(proj, lambda y: F.round(y, round_to))
    return df.select(F.col(id_col), proj.alias("proj"))
