"""Hand-checkable unit tests for corpus/term statistics
(operators/terms.py); the sf contracts cover the full corpus."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pdf_table_extractor_spark.operators import terms


def test_tfidf_topk_ranks_discriminative_tokens(spark):
    docs = spark.createDataFrame(
        [
            (1, "common rare rare"),
            (2, "common other"),
            (3, "common thing"),
        ],
        "doc_id long, text string",
    )
    out = terms.tfidf_topk(docs, k=1).collect()
    top = {r["doc_id"]: (r["token"], r["tfidf"]) for r in out}
    # 'common' has df=3 -> idf=0; the doc-specific tokens win
    assert top[1] == ("rare", round(2 * math.log(3 / 1), 6))
    assert top[2][0] == "other" and top[3][0] == "thing"
    assert all(r["rank"] == 1 for r in out)


def test_corpus_stats_exact(spark):
    docs = spark.createDataFrame(
        [(1, "a b a", "s1"), (2, "a c", "s1"), (3, "x", "s2")],
        "doc_id long, text string, source string",
    )
    out = {r["slice"]: r for r in terms.corpus_stats(docs, by="source").collect()}
    s1 = out["s1"]
    assert (s1["n_docs"], s1["n_tokens"], s1["vocab"]) == (2, 5, 3)
    assert s1["type_token_ratio"] == round(3 / 5, 6)
    assert s1["avg_doc_tokens"] == 2.5
    assert out["s2"]["vocab"] == 1


def test_pmi_bigrams_collocation_wins(spark):
    # 'new york' always together; 'the' everywhere -> low PMI
    rows = [(i, "new york the city the state") for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = terms.pmi_bigrams(docs, k=3, min_count=5).collect()
    assert out[0]["rank"] == 1
    assert (out[0]["w1"], out[0]["w2"]) == ("new", "york")
    # exact PMI: c_xy=5, c_new=5, c_york=5, N=30 -> ln(5*30/25)=ln(6)
    assert out[0]["pmi"] == round(math.log(6), 6)


def test_link_graph_and_degrees(spark):
    from pdf_table_extractor_spark.operators import urls

    docs = spark.createDataFrame(
        [
            (1, "http://a.com/p", 'see http://b.com/x and "https://c.co.uk/y"'),
            (2, "http://b.com/q", "also http://www.b.com/self."),
            (3, "http://c.co.uk/r", "no links here"),
        ],
        "doc_id long, url string, text string",
    )
    edges = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in urls.link_graph(docs).collect()
    }
    # trailing quote/dot never leak into the host; subdomain folds to domain
    assert edges == {("a.com", "b.com"): 1, ("a.com", "c.co.uk"): 1, ("b.com", "b.com"): 1}
    deg = {
        r["host"]: (r["out_degree"], r["in_degree"])
        for r in urls.host_degrees(urls.link_graph(docs)).collect()
    }
    assert deg["a.com"] == (2, 0)
    assert deg["b.com"] == (1, 2)
    assert deg["c.co.uk"] == (0, 1)


def test_pagerank_hand_graph(spark):
    """Two-node cycle + one dangling sink: exact closed-form check."""
    from pdf_table_extractor_spark.operators import graph

    # a -> b, b -> a, a -> c (c dangling)
    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "a", 1), ("a", "c", 1)],
        "src_host string, dst_host string, n_links long",
    )
    pr1 = {r["host"]: r["pr"] for r in graph.pagerank(edges, iters=1).collect()}
    # pr0 = 1/3 each; contribs: a gets 1/3 (from b), b gets 1/6, c gets 1/6
    # dangling mass D = 1/3 (c), redistributed /3
    base, d = 0.15 / 3, 0.85
    third = 1 / 3
    exp_a = base + d * (third + third / 3)
    exp_b = base + d * (third / 2 + third / 3)
    exp_c = base + d * (third / 2 + third / 3)
    assert pr1["a"] == round(exp_a, 6)
    assert pr1["b"] == round(exp_b, 6)
    assert pr1["c"] == round(exp_c, 6)
    # more iterations: mass conserved (sums to ~1), hub 'a' ranks first
    pr10 = {r["host"]: r["pr"] for r in graph.pagerank(edges, iters=10).collect()}
    assert abs(sum(pr10.values()) - 1.0) < 1e-4
    assert pr10["a"] == max(pr10.values())


def test_length_percentiles_exact(spark):
    docs = spark.createDataFrame(
        [(i, "w " * n, "s") for i, n in enumerate([10, 20, 30, 40, 50, 60, 70, 80, 90, 100])],
        "doc_id long, text string, source string",
    )
    (row,) = terms.length_percentiles(docs, by="source").collect()
    assert row["p50"] == 55.0  # interpolated between 50 and 60
    assert row["p90"] == 91.0  # (n-1)*0.9 = 8.1 -> 90 + 0.1*10


def test_key_skew_and_heavy_keys(spark):
    rows = [(i, "hot") for i in range(80)] + [(100 + i, f"k{i}") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, key string")
    (s,) = terms.key_skew_stats(docs, key_col="key").collect()
    assert s["n_keys"] == 21 and s["n_rows"] == 100
    assert s["max_key_frac"] == 0.8
    assert s["gini"] > 0.7  # heavily skewed
    hk = terms.heavy_keys(docs, key_col="key", k=2).collect()
    assert hk[0]["key"] == "hot" and hk[0]["rank"] == 1 and hk[0]["frac"] == 0.8
    uniform = spark.createDataFrame(
        [(i, f"k{i % 10}") for i in range(100)], "doc_id long, key string"
    )
    (u,) = terms.key_skew_stats(uniform, key_col="key").collect()
    assert u["gini"] == 0.0  # perfectly uniform


def test_kmv_distinct_estimate_and_determinism(spark):
    # 5000 distinct keys, k=64: KMV should land within ~25% (1/sqrt(63)≈13% sd)
    df = spark.createDataFrame([(i, "s") for i in range(5000)], "k long, src string")
    (row,) = terms.kmv_distinct(df, key_expr=F.col("k"), by="src", k=64).collect()
    assert row["n_seen_k"] == 64
    assert 3500 < row["kmv_estimate"] < 6500
    # deterministic: identical estimate on a different partitioning
    (row2,) = terms.kmv_distinct(
        df.repartition(13), key_expr=F.col("k"), by="src", k=64
    ).collect()
    assert row2["kmv_estimate"] == row["kmv_estimate"]
    # below-k slices return the exact count
    small = spark.createDataFrame([(i % 7, "t") for i in range(100)], "k long, src string")
    (r3,) = terms.kmv_distinct(small, key_expr=F.col("k"), by="src", k=64).collect()
    assert r3["kmv_estimate"] == 7.0


def test_bm25_topk_hand_computed(spark):
    # 3-doc corpus, 1 query; hand-check the Lucene-idf BM25 score.
    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "apple cherry"),
            (3, "durian durian durian"),
        ],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame([(10, "apple durian")], "query_id long, text string")
    out = terms.bm25_topk(docs, queries, k=3, k1=1.2, b=0.75)
    rows = {r["doc_id"]: r for r in out.collect()}

    def score(tf, dl, df_t, n=3.0, avgdl=8.0 / 3.0, k1=1.2, b=0.75):
        idf = math.log(1 + (n - df_t + 0.5) / (df_t + 0.5))
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    # doc 3: 'durian' tf=3, dl=3, df=1 ; doc 1: 'apple' tf=2, dl=3, df=2
    assert rows[3]["bm25"] == round(score(3, 3, 1), 4)
    assert rows[1]["bm25"] == round(score(2, 3, 2), 4)
    assert rows[2]["bm25"] == round(score(1, 2, 2), 4)
    # ranking: durian doc has the rarer term -> rank 1
    assert rows[3]["rank"] == 1 and rows[1]["rank"] == 2 and rows[2]["rank"] == 3


def test_bm25_topk_scores_only_query_matched_docs(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (3, "alpha alpha")],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame([(1, "alpha"), (2, "zeta")], "query_id long, text string")
    out = terms.bm25_topk(docs, queries, k=5).collect()
    got = {(r["query_id"], r["doc_id"]) for r in out}
    # query 1 matches docs 1 and 3 only; query 2 matches nothing
    assert got == {(1, 1), (1, 3)}


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------


def _py_cms_positions(v, depth, width):
    import hashlib

    return [
        int(hashlib.md5(f"{i}:{v}".encode()).hexdigest()[:8], 16) % width
        for i in range(depth)
    ]


def test_cms_never_undercounts_and_matches_replay(spark):
    from collections import Counter

    vals = [i % 7 for i in range(140)] + [0] * 60  # key 0 is heavy
    truth = Counter(vals)
    depth, width = 3, 8  # tiny width → guaranteed collisions
    cells: dict = {}
    for v in vals:
        for r, p in enumerate(_py_cms_positions(v, depth, width)):
            cells[(r, p)] = cells.get((r, p), 0) + 1
    df = spark.createDataFrame([(v,) for v in vals], "k long")
    sk = {
        (r["sketch_row"], r["bucket"]): r["cell_count"]
        for r in terms.cms_sketch(df, key_col="k", depth=depth, width=width).collect()
    }
    assert sk == cells, "sketch cells must replay bit-for-bit"
    hh = terms.cms_heavy_hitters(
        df, key_col="k", depth=depth, width=width, min_count=1
    ).collect()
    got = {r["k"]: (r["est_count"], r["true_count"]) for r in hh}
    assert set(got) == set(truth), "min_count=1 must surface every key"
    for k, (est, true) in got.items():
        assert true == truth[k]
        assert est >= true, "CMS may never under-count"
        exp_est = min(cells[(r, p)] for r, p in enumerate(_py_cms_positions(k, depth, width)))
        assert est == exp_est


def test_cms_sketches_merge_by_cell_addition(spark):
    a = spark.createDataFrame([(i % 5,) for i in range(50)], "k long")
    b = spark.createDataFrame([(i % 3,) for i in range(30)], "k long")
    both = a.union(b)
    depth, width = 2, 16
    merged = (
        terms.cms_sketch(a, key_col="k", depth=depth, width=width)
        .union(terms.cms_sketch(b, key_col="k", depth=depth, width=width))
        .groupBy("sketch_row", "bucket")
        .agg(F.sum("cell_count").alias("cell_count"))
    )
    direct = terms.cms_sketch(both, key_col="k", depth=depth, width=width)
    m = {(r[0], r[1]): r[2] for r in merged.collect()}
    d = {(r[0], r[1]): r[2] for r in direct.collect()}
    assert m == d, "per-shard sketches must merge to the full-scan sketch"


def test_cms_sketch_size_is_bounded_by_config(spark):
    df = spark.range(0, 10000).select((F.col("id") % 997).alias("k"))
    sk = terms.cms_sketch(df, key_col="k", depth=4, width=32)
    assert sk.count() <= 4 * 32


def test_cms_windowed_linearity_and_interval_bound(spark):
    import datetime as dt

    rows = []
    for day in (1, 2, 3):
        for i in range(20 * day):  # key i%4, heavier later days
            rows.append((i % 4, dt.datetime(2024, 1, day, 12, 0, 0)))
    df = spark.createDataFrame(rows, "k long, ts timestamp_ntz")
    depth, width = 2, 8
    sw = terms.cms_sketch_windowed(
        df, key_col="k", ts_col="ts", grain="day", depth=depth, width=width
    )
    # linearity: summing the per-day cells over ALL days == one direct
    # sketch of the whole table
    summed = {
        (r["sketch_row"], r["bucket"]): r["cell_count"]
        for r in sw.groupBy("sketch_row", "bucket")
        .agg(F.sum("cell_count").alias("cell_count"))
        .collect()
    }
    direct = {
        (r["sketch_row"], r["bucket"]): r["cell_count"]
        for r in terms.cms_sketch(df, key_col="k", depth=depth, width=width).collect()
    }
    assert summed == direct
    # interval estimate over days 2-3 never under-counts the true count
    cand = df.select("k").distinct()
    est = {
        r["k"]: r["est_count"]
        for r in terms.cms_interval_estimate(
            sw, cand, key_col="k",
            t0="2024-01-02 00:00:00", t1="2024-01-04 00:00:00",
            depth=depth, width=width,
        ).collect()
    }
    true = {
        r["k"]: r["n"]
        for r in df.where(F.col("ts") >= F.lit("2024-01-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("k").agg(F.count("*").alias("n")).collect()
    }
    assert set(est) == set(true)
    for k, t in true.items():
        assert est[k] >= t


def test_corpus_divergence_identical_zero_disjoint_one(spark):
    a = spark.createDataFrame(
        [(1, "x y z x"), (2, "x q y")], "doc_id long, text string"
    )
    same = terms.corpus_divergence_summary(a, a).collect()[0]
    assert same["js_bits"] == 0.0
    assert same["vocab_a"] == same["vocab_b"] == same["vocab_union"]
    b = spark.createDataFrame([(3, "m n"), (4, "o p m")], "doc_id long, text string")
    dis = terms.corpus_divergence_summary(a, b).collect()[0]
    assert abs(dis["js_bits"] - 1.0) < 1e-6
    assert dis["vocab_union"] == dis["vocab_a"] + dis["vocab_b"]
    assert dis["tokens_a"] == 7 and dis["tokens_b"] == 5


def test_corpus_divergence_matches_pure_python(spark):
    import collections
    import math

    docs_a = ["the cat sat", "the dog ran the mile", "cat cat dog"]
    docs_b = ["the cat slept", "a dog barked loudly", "the the the end"]
    a = spark.createDataFrame(list(enumerate(docs_a)), "doc_id long, text string")
    b = spark.createDataFrame(list(enumerate(docs_b)), "doc_id long, text string")

    ca = collections.Counter(t for d in docs_a for t in d.split())
    cb = collections.Counter(t for d in docs_b for t in d.split())
    na, nb = sum(ca.values()), sum(cb.values())
    expected = 0.0
    for tok in set(ca) | set(cb):
        pa, pb = ca[tok] / na, cb[tok] / nb
        m = (pa + pb) / 2
        term = 0.0
        if pa > 0:
            term += pa * math.log2(pa / m)
        if pb > 0:
            term += pb * math.log2(pb / m)
        expected += round(term / 2, 9)

    got = terms.corpus_divergence_summary(a, b).collect()[0]
    assert abs(got["js_bits"] - round(expected, 6)) < 2e-6
    # per-token table agrees on a specific mover
    per = {
        r["token"]: r
        for r in terms.corpus_divergence(a, b, min_count=1).collect()
    }
    assert per["the"]["n_a"] == 3 and per["the"]["n_b"] == 4
    assert per["sat"]["n_b"] == 0 and per["sat"]["p_b"] == 0.0


def test_zipf_fit_recovers_exponent(spark):
    # token_i repeated round(2000 / i) times -> exact Zipf, slope -1
    words = []
    for i in range(1, 51):
        words.extend([f"tok{i:03d}"] * round(2000 / i))
    # spread across docs so the aggregate actually reduces
    docs = [
        (d, " ".join(words[d::10])) for d in range(10)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    row = terms.zipf_fit(df, top_n=50).collect()[0]
    assert row["n_ranks"] == 50
    assert -1.02 < row["slope"] < -0.98
    assert row["r2"] > 0.999


def test_token_entropy_uniform_and_skewed(spark):
    # uniform over 4 tokens -> exactly 2 bits; 1 token -> 0 bits
    df = spark.createDataFrame(
        [(1, "a b c d a b c d", "u"), (2, "x x x x", "k")],
        "doc_id long, text string, source string",
    )
    rows = {r["source"]: r for r in terms.token_entropy(df, by="source").collect()}
    assert rows["u"]["entropy_bits"] == 2.0 and rows["u"]["vocab"] == 4
    assert rows["k"]["entropy_bits"] == -0.0 or rows["k"]["entropy_bits"] == 0.0
    assert rows["k"]["n_tokens"] == 4 and rows["k"]["vocab"] == 1


def test_token_entropy_matches_pure_python(spark):
    import collections
    import math

    docs = ["the cat sat on the mat", "the dog the cat", "mat mat dog run"]
    df = spark.createDataFrame(
        [(i, t, "s") for i, t in enumerate(docs)],
        "doc_id long, text string, source string",
    )
    c = collections.Counter(t for d in docs for t in d.split())
    n = sum(c.values())
    expected = -sum(round(v / n * math.log2(v / n), 9) for v in c.values())
    got = terms.token_entropy(df, by="source").collect()[0]
    assert abs(got["entropy_bits"] - round(expected, 6)) < 1e-9


def test_ngram_diversity_flags_repetition(spark):
    unique = " ".join(f"w{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, unique, "fresh"), (2, "spam ham " * 30, "loop")],
        "doc_id long, text string, source string",
    )
    rows = {
        (r["source"], r["n"]): r
        for r in terms.ngram_diversity(df, by="source").collect()
    }
    assert rows[("fresh", 1)]["distinct_ratio"] == 1.0
    assert rows[("fresh", 2)]["distinct_ratio"] == 1.0
    # the loop slice collapses: 60 unigrams but only 2 distinct
    assert rows[("loop", 1)]["distinct_ngrams"] == 2
    assert rows[("loop", 1)]["total_ngrams"] == 60
    assert rows[("loop", 2)]["distinct_ngrams"] == 2  # 'spam ham', 'ham spam'
    assert rows[("loop", 3)]["distinct_ratio"] < 0.05


def test_hll_estimate_accuracy_partitioning_invariance_and_python_replay(spark):
    # 5000 distinct keys at p=8 (m=256): raw-estimator regime (n >> 2.5m),
    # standard error 1.04/sqrt(256) ≈ 6.5% — assert within ~3 sigma.
    df = spark.createDataFrame([(i, "s") for i in range(5000)], "k long, src string")
    (row,) = terms.hll_distinct(df, key_expr=F.col("k"), by="src", p=8).collect()
    assert 4000 < row["hll_estimate"] < 6000
    assert row["n_registers_set"] <= 256
    # deterministic under repartitioning (sketch is a pure set function)
    (row2,) = terms.hll_distinct(
        df.repartition(13), key_expr=F.col("k"), by="src", p=8
    ).collect()
    assert row2["hll_estimate"] == row["hll_estimate"]

    # pure-python replay of the register table + estimate
    import hashlib

    regs: dict[int, int] = {}
    for i in range(5000):
        v = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        idx, w = v >> 24, v % (1 << 24)
        rho = 25 - w.bit_length()
        regs[idx] = max(regs.get(idx, 0), rho)
    denom = (256.0 - len(regs)) + sum(2.0**-r for r in regs.values())
    expected = round(terms.hll_alpha_m2(8) / denom, 4)
    assert row["hll_estimate"] == expected
    assert row["n_registers_set"] == len(regs)
    spark_regs = {
        r["register"]: r["max_rho"]
        for r in terms.hll_registers(df, key_expr=F.col("k"), by="src", p=8).collect()
    }
    assert spark_regs == regs


def test_hll_merge_equals_sketch_of_union(spark):
    # mergeability is EXACT: max-per-register union == sketch of the union,
    # including overlapping key sets (idempotence).
    a = spark.createDataFrame([(i, "x") for i in range(0, 600)], "k long, src string")
    b = spark.createDataFrame([(i, "x") for i in range(400, 1100)], "k long, src string")
    merged = terms.hll_merge(
        terms.hll_registers(a, key_expr=F.col("k"), by="src"),
        terms.hll_registers(b, key_expr=F.col("k"), by="src"),
    )
    direct = terms.hll_registers(a.unionByName(b), key_expr=F.col("k"), by="src")
    assert sorted(map(tuple, merged.collect()), key=lambda t: t[:2]) == sorted(
        map(tuple, direct.collect()), key=lambda t: t[:2]
    )
    # and the folded estimate equals the direct estimate
    (em,) = terms.hll_estimate(merged, p=8).collect()
    (ed,) = terms.hll_estimate(direct, p=8).collect()
    assert em["hll_estimate"] == ed["hll_estimate"]


def test_phrase_search_repeated_word_adjacency(spark):
    """'batch batch' must require genuine adjacency: a lone token or two
    non-adjacent occurrences never match; overlapping runs count each
    anchor ('batch batch batch' -> 2)."""
    from pdf_table_extractor_spark.operators import terms

    df = spark.createDataFrame(
        [
            (1, "batch of batch things"),
            (2, "one batch batch two"),
            (3, "batch batch batch"),
            (4, "no hits here"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n_matches"]
        for r in terms.phrase_search(df, "batch batch").collect()
    }
    assert got == {2: 1, 3: 2}


def test_phrase_search_prefilters_before_shuffle(spark):
    from pdf_table_extractor_spark.operators import terms

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    qe = terms.phrase_search(df, "b c")._jdf.queryExecution()
    opt = qe.optimizedPlan().toString()
    phys = qe.executedPlan().toString()
    # exactly one (broadcast) join against the offsets table, never a
    # cartesian or a k-way self-join, and the postings filter survives
    assert opt.count("Join") == 1 and "Cartesian" not in phys, opt
    assert "BroadcastHashJoin" in phys, phys
    assert "Filter" in opt, opt


def test_heaps_fit_matches_python_replay_and_survives_closed_vocab(spark):
    import math

    from pdf_table_extractor_spark.operators import terms

    # open vocabulary: doc i contributes shared tokens + unique u<i>
    docs = [(i, "the scan " + " ".join(f"u{j}" for j in range(3 * i, 3 * i + 3)))
            for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    (row,) = terms.heaps_fit(df, n_checkpoints=8).collect()
    # python replay of the same buckets + OLS
    m = 39
    toks_b, first = {}, {}
    for i, t in docs:
        b = (i * 8) // (m + 1)
        ws = t.split()
        toks_b[b] = toks_b.get(b, 0) + len(ws)
        for wd in ws:
            first.setdefault(wd, i)
    types_b = {}
    for wd, i in first.items():
        b = (i * 8) // (m + 1)
        types_b[b] = types_b.get(b, 0) + 1
    xs, ys, ct, cv = [], [], 0, 0
    for b in range(8):
        ct += toks_b.get(b, 0)
        cv += types_b.get(b, 0)
        if ct > 0 and cv > 0:
            xs.append(math.log(ct))
            ys.append(math.log(cv))
    n = len(xs)
    mx_, my_ = sum(xs) / n, sum(ys) / n
    vx = sum((x - mx_) ** 2 for x in xs) / n
    cxy = sum((x - mx_) * (y - my_) for x, y in zip(xs, ys)) / n
    slope = cxy / vx
    assert row["n_points"] == n == 8
    assert abs(row["slope"] - slope) < 1e-4
    assert 0.0 < row["slope"] <= 1.1

    # closed vocabulary: flat growth must yield NULL slope/r2, not throw
    flat = spark.createDataFrame(
        [(i, "the scan works") for i in range(20)], "doc_id long, text string"
    )
    (frow,) = terms.heaps_fit(flat, n_checkpoints=6).collect()
    # tokens grow but types don't: slope exactly 0 (the flood signal),
    # r2 undefined (zero y-variance) -> NULL, never a throw
    assert frow["slope"] == 0.0 and frow["r2"] is None


def test_rake_matches_python_replay(spark):
    """Engine RAKE == the published algorithm replayed sequentially
    (freq/degree over all phrase occurrences, deg includes self)."""
    import random

    STOP = ["the", "a", "of", "and"]
    rng = random.Random(5)
    vocab = ["deep", "learning", "model", "data", "graph", "spark"]
    docs = []
    for i in range(30):
        toks = []
        for _ in range(rng.randrange(3, 40)):
            toks.append(rng.choice(STOP) if rng.random() < 0.3 else rng.choice(vocab))
        docs.append((i, " ".join(toks)))

    def ref(text, k=5):
        toks = [t for t in text.lower().split() if t]
        runs, cur = [], []
        for t in toks:
            if t in STOP:
                if cur:
                    runs.append(cur)
                cur = []
            else:
                cur.append(t)
        if cur:
            runs.append(cur)
        freq, deg = {}, {}
        for r in runs:
            for w in r:
                freq[w] = freq.get(w, 0) + 1
                deg[w] = deg.get(w, 0) + len(r) - 1
        score = {w: (deg[w] + freq[w]) / freq[w] for w in freq}
        agg = {}
        for r in runs:
            p = " ".join(r)
            s = round(sum(score[w] for w in r), 6)
            n, _ = agg.get(p, (0, s))
            agg[p] = (n + 1, s)
        ranked = sorted(agg.items(), key=lambda kv: (-kv[1][1], kv[0]))[:k]
        return {
            p: (rank + 1, s, n)
            for rank, (p, (n, s)) in enumerate(ranked)
        }

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in terms.rake_keywords(df, stoplist=STOP, k=5).collect():
        got.setdefault(r["doc_id"], {})[r["phrase"]] = (
            r["rank"], r["score"], r["n_occurrences"]
        )
    for i, t in docs:
        want = ref(t)
        assert got.get(i, {}) == want, (i, t, got.get(i), want)


def test_textrank_matches_python_replay(spark):
    """Engine TextRank == sequential replay (window-2 co-occurrence,
    weighted PageRank variant, fixed 5 iterations)."""
    import random

    STOP = ["the", "a"]
    rng = random.Random(9)
    vocab = ["deep", "learning", "model", "data", "graph"]
    docs = []
    for i in range(25):
        toks = [rng.choice(STOP) if rng.random() < 0.25 else rng.choice(vocab)
                for _ in range(rng.randrange(2, 30))]
        docs.append((i, " ".join(toks)))

    def ref(text, k=5, iters=5, d=0.85):
        seq = [t for t in text.lower().split() if t and t not in STOP]
        # NOTE: engine keeps original positions, so stopword removal
        # leaves GAPS — adjacency is over original positions, not the
        # compacted sequence. Replay that exactly.
        toks = [(p, t) for p, t in enumerate(text.lower().split()) if t and t not in STOP]
        pos = dict(toks)
        w = {}
        for p, t in toks:
            q = pos.get(p + 1)
            if q is not None and q != t:
                w[(t, q)] = w.get((t, q), 0) + 1
                w[(q, t)] = w.get((q, t), 0) + 1
        nodes = sorted({x for e in w for x in e})
        if not nodes:
            return {}
        deg = {}
        for (u, v), wt in w.items():
            deg[u] = deg.get(u, 0) + wt
        s = {v: 1.0 for v in nodes}
        for _ in range(iters):
            s = {
                v: 0.15 + d * sum(
                    s[u] * wt / deg[u]
                    for (u, vv), wt in w.items() if vv == v
                )
                for v in nodes
            }
        ranked = sorted(((round(sc, 6), wd) for wd, sc in s.items()),
                        key=lambda t: (-t[0], t[1]))[:k]
        return {wd: (r + 1, sc) for r, (sc, wd) in enumerate(ranked)}

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in terms.textrank_keywords(df, stoplist=STOP, k=5).collect():
        got.setdefault(r["doc_id"], {})[r["word"]] = (r["rank"], r["score"])
    for i, t in docs:
        want = ref(t)
        g = got.get(i, {})
        assert set(g) == set(want), (i, t, g, want)
        for wd in want:
            assert g[wd][0] == want[wd][0], (i, wd, g, want)
            assert abs(g[wd][1] - want[wd][1]) < 2e-6, (i, wd, g, want)


def test_textrank_rejects_window_below_2(spark):
    import pytest

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="window must be >= 2"):
        terms.textrank_keywords(df, stoplist=[], window=1)
