"""Unit tests for deterministic sampling/splitting/sharding
(operators/sampling.py), the unigram-LM scorer, and the domain
blocklist filter."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from pdf_table_extractor_spark.operators import sampling, textquality, urls


def _expected_u(key: str, salt: str = "") -> float:
    return int(hashlib.md5((salt + key).encode()).hexdigest()[:8], 16) / 2**32


def test_uniform_hash_matches_python_md5(spark):
    df = spark.range(50).withColumn(
        "u", sampling.uniform_hash(F.col("id"), salt="s")
    )
    for r in df.collect():
        assert r["u"] == _expected_u(str(r["id"]), "s")


def test_hash_split_deterministic_and_partitioned(spark):
    df = spark.range(2000)
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {
        r["id"]: r["split"]
        for r in sampling.hash_split(df, w, key_col="id").collect()
    }
    b = {
        r["id"]: r["split"]
        for r in sampling.hash_split(df.repartition(7), w, key_col="id").collect()
    }
    assert a == b  # membership survives repartitioning
    n = len(a)
    frac_train = sum(v == "train" for v in a.values()) / n
    assert 0.75 < frac_train < 0.85
    assert set(a.values()) == {"train", "val", "test"}


def test_stratified_sample_drops_unlisted(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "fr") for i in range(100)], "doc_id long, lang string"
    )
    out = sampling.stratified_sample(
        df, {"en": 1.0}, strata_col="lang"
    ).collect()
    assert len(out) == 50 and all(r["lang"] == "en" for r in out)


def test_temperature_weights_flatten(spark):
    g = spark.createDataFrame(
        [("big", 900), ("small", 100)], "grp string, n_docs long"
    )
    probs = {
        r["grp"]: r["keep_prob"]
        for r in sampling.temperature_weights(g, temperature=2.0).collect()
    }
    assert probs["small"] == 1.0  # rarest group keeps everything
    assert math.isclose(probs["big"], round(math.sqrt(100 / 900), 6))


def test_temperature_resample_uniform_groups_keep_all(spark):
    df = spark.createDataFrame(
        [(i, f"g{i % 4}") for i in range(40)], "doc_id long, lang string"
    )
    out = sampling.temperature_resample(
        df, group_expr=F.col("lang"), temperature=2.0
    ).collect()
    assert all(r["keep_prob"] == 1.0 and r["keep"] for r in out)


def test_assign_shards_exact_and_group_size_invariant(spark):
    docs = spark.createDataFrame(
        [(i, "w " * (10 * (i % 3 + 1))) for i in range(30)],
        "doc_id long, text string",
    )
    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+"))

    def run(gs):
        return sorted(
            (r["doc_id"], r["token_offset"], r["shard"])
            for r in sampling.assign_shards(
                docs, tokens_per_shard=50, n_tokens=n_tok, group_size=gs
            ).collect()
        )

    small, big = run(4), run(1000)
    assert small == big  # the two-level scan is exact for any grouping
    # doc 0: 10 toks at offset 0; doc 1: 20 toks at offset 10; ...
    assert small[0] == (0, 0, 0) and small[1] == (1, 10, 0)
    offs = dict((d, o) for d, o, _ in small)
    assert offs[2] == 30 and offs[3] == 60  # cumulative 10+20+30
    assert all(s == o // 50 for _, o, s in small)


def test_blocklist_filter_covers_subdomains(spark):
    docs = spark.createDataFrame(
        [
            (1, "http://www.bad.com/x"),
            (2, "http://cdn.a.bad.com/y"),
            (3, "http://good.com/z"),
            (4, "https://sub.bad.co.uk/w"),
        ],
        "doc_id long, url string",
    )
    blocked = spark.createDataFrame([("bad.com",), ("bad.co.uk",)], "domain string")
    kept = [r["doc_id"] for r in urls.blocklist_filter(docs, blocked).collect()]
    assert kept == [3]


def test_unigram_nll_and_buckets(spark):
    # corpus: 'a' appears 4x, 'b' 2x, total 6 tokens
    docs = spark.createDataFrame(
        [(1, "a a"), (2, "a b"), (3, "a b")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in textquality.unigram_nll(docs).collect()}
    nll_a = math.log(6 / 4)
    nll_ab = (math.log(6 / 4) + math.log(6 / 2)) / 2
    assert out[1]["nll"] == round(nll_a, 4)
    assert out[2]["nll"] == round(nll_ab, 4) == out[3]["nll"]
    b = {
        r["doc_id"]: r["bucket"]
        for r in textquality.ppl_buckets(
            textquality.unigram_nll(docs), exact=True
        ).collect()
    }
    assert b == {1: 1, 2: 2, 3: 3}  # ties broken by doc_id


def test_kn_bigram_nll_hand_computed(spark):
    # train 'a b a c': c12 = {ab:1, ba:1, ac:1}; ctx a:(c1=2,n1f=2),
    # b:(1,1); cont n1b = {b:1, a:1, c:1}; B=3, V=3
    train = spark.createDataFrame([(0, "a b a c")], "doc_id long, text string")
    score = spark.createDataFrame(
        [(1, "a b x"), (2, "x a"), (3, "a")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in textquality.kn_bigram_nll(score, train).collect()}
    p_ab = (1 - 0.75) / 2 + 0.75 * 2 / 2 * (1 + 1) / (3 + 3)  # seen pair
    p_bx = 0.75 * 1 / 1 * (0 + 1) / 6  # seen ctx, unseen pair, OOV w2
    p_xa = (1 + 1) / 6  # unseen ctx -> continuation backoff
    assert out[1]["n_bigrams"] == 2
    assert out[1]["nll"] == round(-(math.log(p_ab) + math.log(p_bx)) / 2, 4)
    assert out[2]["nll"] == round(-math.log(p_xa), 4)
    assert 3 not in out  # single-token doc: no bigrams, absent
    # self-trained scoring runs too (default train_df=df)
    assert textquality.kn_bigram_nll(score).count() == 2


def test_linear_quality_monotone_in_features(spark):
    import math as m

    docs = spark.createDataFrame(
        [
            (1, "the and of data value order key " * 20),  # long, stopword-rich
            (2, "!!! ??? *** ;;; ::: %%% $$$"),  # punctuation junk
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in textquality.linear_quality(docs).collect()}
    assert out[1]["keep"] and not out[2]["keep"]
    # exact check doc 1: len_score=1, punct=0, stop=1 -> logit 6
    assert out[1]["logit"] == 6.0
    assert out[1]["prob"] == round(1 / (1 + m.exp(-6.0)), 6)


def test_snapshot_diff_all_transitions(spark):
    docs_old = spark.createDataFrame(
        [("u1", "h1"), ("u2", "h2"), ("u3", "h3")], "url string, text_md5 string"
    )
    docs_new = spark.createDataFrame(
        [("u2", "h2"), ("u3", "h3x"), ("u4", "h4")], "url string, text_md5 string"
    )
    out = {
        r["url"]: r["change"]
        for r in urls.snapshot_diff(docs_old, docs_new).collect()
    }
    assert out == {"u1": "removed", "u2": "unchanged", "u3": "changed", "u4": "added"}


def test_temperature_resample_null_group_not_dropped(spark):
    df = spark.createDataFrame(
        [(1, "en"), (2, None), (3, None), (4, "en")],
        "doc_id long, lang string",
    )
    out = sampling.temperature_resample(
        df, group_expr=F.col("lang"), temperature=2.0
    ).collect()
    # NULL is a real group: all four docs survive with a keep decision
    assert len(out) == 4
    assert all(r["keep_prob"] == 1.0 for r in out)  # two equal-size groups


def test_weighted_topk_sample_deterministic_and_biased(spark):
    import hashlib

    rows = [(i, 100.0 if i < 10 else 1.0) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = sorted(
        r["doc_id"]
        for r in sampling.weighted_topk_sample(
            df, k=10, weight=F.col("w"), key_col="doc_id"
        ).collect()
    )
    # exact expected set via the same priority formula in python
    def pri(i, w):
        u = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) / 2**32
        return u ** (1.0 / w)

    exp = sorted(
        i for i, _ in sorted(rows, key=lambda t: (-pri(t[0], t[1]), t[0]))[:10]
    )
    assert got == exp
    # heavy-weight rows dominate the sample
    assert sum(1 for i in got if i < 10) >= 7
    # stable under repartitioning
    got2 = sorted(
        r["doc_id"]
        for r in sampling.weighted_topk_sample(
            df.repartition(9), k=10, weight=F.col("w"), key_col="doc_id"
        ).collect()
    )
    assert got2 == got


def test_mix_plan_manifest(spark):
    stats = spark.createDataFrame(
        [("web", 1000), ("code", 100), ("books", 500)], "slice string, n_tokens long"
    )
    out = {
        r["slice"]: r
        for r in sampling.mix_plan(
            stats, target_tokens=2000, weights={"web": 1.0, "code": 1.0}
        ).collect()
    }
    assert out["web"]["target_tokens"] == 1000 and not out["web"]["oversampled"]
    assert out["code"]["target_tokens"] == 1000 and out["code"]["oversampled"]
    assert out["code"]["repeat_factor"] == 10.0
    assert out["books"]["target_share"] == 0.0 and out["books"]["target_tokens"] == 0


def test_pack_sequences_tiles_docs_and_sequences(spark):
    # token counts chosen to exercise: multi-sequence spans (150, 200),
    # exact-boundary docs (64), zero-token docs (no segments), 1-token docs
    counts = [5, 0, 150, 64, 1, 63, 200, 0, 7]
    L = 64
    docs = spark.createDataFrame(
        [(i, n) for i, n in enumerate(counts)], "doc_id long, n long"
    )
    out = sampling.pack_sequences(
        docs, seq_len=L, n_tokens=F.col("n"), order_col="doc_id", group_size=3
    ).collect()

    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # zero-token docs contribute no segments; all others appear
    assert set(by_doc) == {i for i, n in enumerate(counts) if n > 0}
    for i, segs in by_doc.items():
        segs.sort(key=lambda r: r["seg_no"])
        # segments tile the doc: contiguous from 0, summing to n_tokens
        assert [s["seg_no"] for s in segs] == list(range(len(segs)))
        assert segs[0]["doc_start"] == 0
        assert sum(s["seg_len"] for s in segs) == counts[i]
        for a, b in zip(segs, segs[1:]):
            assert b["doc_start"] == a["doc_start"] + a["seg_len"]
            assert b["seq_id"] == a["seq_id"] + 1  # spans are contiguous seqs

    by_seq: dict[int, list] = {}
    for r in out:
        by_seq.setdefault(r["seq_id"], []).append(r)
    total = sum(counts)
    n_seqs = -(-total // L)
    assert set(by_seq) == set(range(n_seqs))
    for s, segs in by_seq.items():
        segs.sort(key=lambda r: r["seq_pos"])
        fill = L if s < n_seqs - 1 else total - (n_seqs - 1) * L
        # segments tile the sequence: contiguous slots from 0, full fill
        assert segs[0]["seq_pos"] == 0
        assert sum(r["seg_len"] for r in segs) == fill
        for a, b in zip(segs, segs[1:]):
            assert b["seq_pos"] == a["seq_pos"] + a["seg_len"]


def test_pack_sequences_is_partitioning_invariant(spark):
    docs = spark.range(100).select(
        F.col("id").alias("doc_id"), (F.col("id") % 37 + 1).alias("n")
    )
    a = sampling.pack_sequences(
        docs, seq_len=50, n_tokens=F.col("n"), group_size=8
    ).collect()
    b = sampling.pack_sequences(
        docs.repartition(7), seq_len=50, n_tokens=F.col("n"), group_size=8
    ).collect()
    key = lambda r: (r["doc_id"], r["seg_no"])
    assert sorted(a, key=key) == sorted(b, key=key) and len(a) == len(b) > 0


def test_leakage_safe_split_never_straddles_clusters(spark):
    # docs 1..10; near-dup clusters {1,2,3} (chain) and {7,8}; rest singleton
    docs = spark.range(1, 11).withColumnRenamed("id", "doc_id")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "a long, b long"
    )
    out = sampling.leakage_safe_split(
        docs, pairs, {"train": 0.5, "eval": 0.5}, salt="t"
    ).collect()
    split = {r["doc_id"]: r["split"] for r in out}
    rep = {r["doc_id"]: r["cluster_rep"] for r in out}
    # cluster members share representative AND split
    assert rep[1] == rep[2] == rep[3] == 1
    assert split[1] == split[2] == split[3]
    assert rep[7] == rep[8] == 7
    assert split[7] == split[8]
    # singletons degenerate to hash_split on their own id
    for d in (4, 5, 6, 9, 10):
        assert rep[d] == d
        expected = "train" if _expected_u(str(d), "t") < 0.5 else "eval"
        assert split[d] == expected
    # cluster split is drawn on the representative's variate
    assert split[1] == ("train" if _expected_u("1", "t") < 0.5 else "eval")
    assert split[7] == ("train" if _expected_u("7", "t") < 0.5 else "eval")


def test_leakage_safe_split_no_pair_straddles_at_sf(spark, sf_dir="/root/testdata/sf0.001"):
    from pdf_table_extractor_spark.operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sig = dedup.minhash_signatures(docs, n_hashes=4)
    prs = dedup.lsh_candidates(sig, n_hashes=4, band_size=1)
    out = sampling.leakage_safe_split(
        docs, prs, {"train": 0.9, "eval": 0.1}, salt="lsafe"
    ).select("doc_id", "split")
    straddle = (
        prs.join(out.withColumnRenamed("doc_id", "a"), "a")
        .withColumnRenamed("split", "split_a")
        .join(
            out.withColumnRenamed("doc_id", "b").withColumnRenamed("split", "split_b"),
            "b",
        )
        .where(F.col("split_a") != F.col("split_b"))
        .count()
    )
    assert straddle == 0


def test_bpe_denominated_shard_pack_mix(spark):
    """plans.curation wires bpe_encode_counts in as the token source:
    zero-token docs keep a row (offset-neutral), offsets are cumulative
    BPE counts, and pack/mix consume the same denomination."""
    from pdf_table_extractor_spark.operators import training
    from pdf_table_extractor_spark.plans import curation

    docs = spark.createDataFrame(
        [(1, "aa bb aa", "src0"), (2, "", "src0"), (3, "aa cc", "src1")],
        "doc_id long, text string, source string",
    )
    merges = training.bpe_merges(docs, 2)
    counts = {
        r["doc_id"]: r["n_subwords"]
        for r in training.bpe_encode_counts(docs, merges).collect()
    }
    assert 2 not in counts  # encode drops empty docs (inner vocab join)

    sharded = {
        r["doc_id"]: r
        for r in curation.shard_by_bpe_tokens(
            docs, tokens_per_shard=4, merges=merges, group_size=2
        ).collect()
    }
    assert set(sharded) == {1, 2, 3}  # ...but the plan keeps every row
    assert sharded[2]["n_bpe_tokens"] == 0
    assert sharded[1]["n_bpe_tokens"] == counts[1]
    assert sharded[1]["token_offset"] == 0
    assert sharded[2]["token_offset"] == counts[1]  # zero doc is neutral
    assert sharded[3]["token_offset"] == counts[1]
    assert sharded[3]["shard"] == counts[1] // 4

    segs = curation.pack_by_bpe_tokens(
        docs, seq_len=3, merges=merges, group_size=2
    ).collect()
    per_doc = {}
    for s in segs:
        per_doc[s["doc_id"]] = per_doc.get(s["doc_id"], 0) + s["seg_len"]
    assert per_doc == {d: n for d, n in counts.items() if n > 0}

    mix = {
        r["slice"]: r["n_tokens"]
        for r in curation.mix_plan_bpe(
            docs,
            target_tokens=100,
            weights={"src0": 0.5, "src1": 0.5},
            merges=merges,
        ).collect()
    }
    assert mix == {"src0": counts[1], "src1": counts[3]}


def test_leakage_safe_split_string_ids(spark):
    # Round-4 ADVICE regression: the representative must stay in the id
    # column's NATIVE type — string/UUID-keyed corpora (url-keyed web
    # pages) must work, not just int64 doc_id. ANSI mode would throw on
    # a long cast of these.
    docs = spark.createDataFrame(
        [("u-aa",), ("u-bb",), ("u-cc",), ("u-dd",)], "url string"
    )
    pairs = spark.createDataFrame([("u-bb", "u-cc")], "a string, b string")
    out = sampling.leakage_safe_split(
        docs, pairs, {"train": 0.7, "eval": 0.3}, id_col="url", salt="s"
    )
    assert dict(out.dtypes)["cluster_rep"] == "string"
    rows = {r["url"]: r for r in out.collect()}
    assert rows["u-bb"]["cluster_rep"] == rows["u-cc"]["cluster_rep"] == "u-bb"
    assert rows["u-bb"]["split"] == rows["u-cc"]["split"]
    for u in ("u-aa", "u-dd"):
        assert rows[u]["cluster_rep"] == u
        expected = "train" if _expected_u(u, "s") < 0.7 else "eval"
        assert rows[u]["split"] == expected
