"""Behavioral tests for the training-data curation operators on controlled
synthetic inputs (the DuckDB contract checks determinism; these check the
operators actually FIND what they claim to find)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_table_extractor_spark.operators import dedup, multimodal, similarity, textquality


@pytest.fixture(scope="module")
def docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog near the old river bank "
        "while data pipelines keep processing value records in order every day"
    )
    near = base.replace("lazy dog", "sleepy dog")  # one-token edit → near-dup
    rows = [
        (0, base, "a"),
        (1, base, "a"),  # exact dup of 0
        (2, near, "a"),  # near dup of 0
        (3, "completely different content about spark shuffles and joins okay", "a"),
        (4, "unrelated short text here", "b"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_exact_dedup(docs):
    out = {r.text_md5: r for r in dedup.exact_dedup(docs).collect()}
    groups = sorted((r.n_copies, r.keep_id) for r in out.values())
    assert (2, 0) in groups  # docs 0 and 1 collapse, keep id 0
    assert len(out) == 4


def test_minhash_lsh_finds_near_dups(docs):
    sig = dedup.minhash_signatures(docs, n_hashes=8)
    pairs = {(r.a, r.b) for r in dedup.lsh_candidates(sig, n_hashes=8, band_size=2).collect()}
    assert (0, 1) in pairs  # exact dups always collide
    assert (0, 2) in pairs or (1, 2) in pairs  # near dup caught by some band
    assert (0, 4) not in pairs and (3, 4) not in pairs  # unrelated docs don't


def test_simhash_near_dups_close(docs):
    sims = {r.doc_id: r.simhash for r in dedup.simhash16(docs).collect()}
    d = docs.sparkSession.createDataFrame(
        [(sims[0], sims[2]), (sims[0], sims[3])], "x long, y long"
    )
    h = d.select(dedup.hamming16(F.col("x"), F.col("y")).alias("h")).collect()
    near, far = h[0].h, h[1].h
    assert sims[0] == sims[1]  # identical text → identical simhash
    assert near < far  # near-dup closer in hamming space than unrelated


def test_ngram_jaccard(docs):
    pairs = {(r.a, r.b): r.jaccard for r in dedup.ngram_jaccard_pairs(
        docs, scope_col="source", threshold=0.3
    ).collect()}
    assert pairs[(0, 1)] == 1.0
    assert 0.5 < pairs[(0, 2)] < 1.0
    assert (0, 3) not in pairs


@pytest.fixture(scope="module")
def vecs(spark):
    import math

    rows = []
    for i in range(30):
        # +0.1 keeps dim values away from 0 so the ±0.001 twin (vec 30)
        # lands in the same sign bucket
        base = [math.sin(i * 7.3 + d + 0.1) for d in range(8)]
        rows.append((i, [float(x) for x in base], i % 3))
    # vector 30 = tiny perturbation of vector 0 → nearest neighbor
    rows.append((30, [x + 0.001 for x in rows[0][1]], 0))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_brute_force_topk(vecs):
    out = similarity.brute_force_topk(vecs, vecs.filter("vec_id = 0"), k=1).collect()
    assert out[0].query_id == 0 and out[0].neighbor_id == 30


def test_lsh_nearest_respects_buckets(vecs):
    out = {r.vec_id: r.neighbor_id for r in similarity.lsh_nearest(vecs, bits=2).collect()}
    assert out.get(0) == 30  # perturbed twin lands in the same sign bucket


def test_estimate_rows_exact_below_probe(vecs):
    # fewer rows than the probe bound → the limit() probe IS the count
    assert similarity.estimate_rows(vecs) == 31


def test_estimate_rows_parquet_within_log2(spark, tmp_path):
    # parquet-backed: sizeInBytes / measured row width must land within
    # the callers' log2 tolerance (bits_for moves ±1 per 2× error)
    import math

    n = 2000
    df = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(F.sequence(F.lit(1), F.lit(16)), lambda d: F.rand(42) + d).alias(
            "embedding"
        ),
    )
    path = str(tmp_path / "est_rows")
    df.write.parquet(path)
    est = similarity.estimate_rows(spark.read.parquet(path))
    assert abs(math.log2(est / n)) <= 2, est


def test_bits_for_scales_with_corpus():
    # bucket population must stay bounded: bits grows log2 with rows
    assert similarity.bits_for(5_000, 10_000) == 1
    assert similarity.bits_for(1_000_000, 10_000) == 7
    assert similarity.bits_for(10**12, 10_000) == similarity.MAX_LSH_BITS
    for n in (10**5, 10**7, 10**9):
        b = similarity.bits_for(n, 10_000)
        assert n / (1 << b) <= 10_000  # expected bucket ≤ target


def test_lsh_derived_bits_and_multiprobe(vecs):
    # derived bits: tiny corpus → 1 bit, still functional
    out = similarity.lsh_nearest(vecs, target_bucket_rows=8).collect()
    assert {r.vec_id for r in out} <= {r.vec_id for r in vecs.collect()}
    # multi-probe candidates are a superset → the chosen neighbor's cosine
    # is monotone non-decreasing in n_probe, and coverage never shrinks
    single = {r.vec_id: r.neighbor_id for r in similarity.lsh_nearest(vecs, bits=3).collect()}
    multi = {r.vec_id: r.neighbor_id for r in similarity.lsh_nearest(vecs, bits=3, n_probe=3).collect()}
    assert set(single) <= set(multi)
    rows = {r.vec_id: r.embedding for r in vecs.collect()}
    import math

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))

    for vid, nid in single.items():
        assert cos(rows[vid], rows[multi[vid]]) >= cos(rows[vid], rows[nid]) - 1e-9


def test_near_dup_pairs(vecs):
    pairs = {(r.a, r.b) for r in similarity.near_dup_pairs(
        vecs, scope_col="label", threshold=0.999
    ).collect()}
    assert (0, 30) in pairs


def test_lang_id_and_quality(spark):
    rows = [
        (0, "the cat and the dog sat on the mat of the house"),
        (1, "o saldo de extrato para uma conta que não existe"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    langs = {r.doc_id: r.lang_guess for r in textquality.lang_id(df).collect()}
    assert langs[0] == "en" and langs[1] == "pt"
    q = {r.doc_id: r for r in textquality.quality_features(df).collect()}
    assert 0 < q[0].quality_score <= 1
    toks = {r.doc_id: r for r in textquality.token_counts(df).collect()}
    assert toks[0].ws_tokens == 12


def test_multimodal_plumbing(spark):
    rows = [
        ("img1", "image", bytes([5, 7]) + b"payload" * 100),
        ("vid1", "video", bytes(range(256)) * 8),
        ("empty", "image", b""),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    meta = {r.id: r for r in multimodal.decode_media(media).collect()}
    assert meta["img1"].width == 6 and meta["img1"].height == 8
    assert meta["img1"].n_bytes == 2 + 7 * 100
    assert meta["empty"].n_bytes == 0 and meta["empty"].width == 1
    frames = multimodal.sample_frames(media, frame_bytes=256, every=4).collect()
    vid = [f for f in frames if f.id == "vid1"]
    assert [f.frame_no for f in vid] == [0, 4]  # 8 blocks, every 4th
    assert all(len(bytes(f.frame)) == 256 for f in vid)
    with pytest.raises(NotImplementedError):
        multimodal.decode_media_real(media)


def test_ivf_topk(vecs):
    exact = similarity.brute_force_topk(vecs, vecs.filter("vec_id = 0"), k=1).collect()
    approx = similarity.ivf_topk(vecs, vecs.filter("vec_id = 0"), n_centroids=8, n_probe=3, k=1).collect()
    # the perturbed twin (30) is so close that IVF with multi-probe finds it
    assert approx and approx[0].neighbor_id == exact[0].neighbor_id == 30


def test_kmeans_centroids_and_trained_ivf(vecs):
    cents = similarity.kmeans_centroids(vecs, k=4, n_iter=2).collect()
    assert len(cents) == 4
    assert sorted(c.cent_id for c in cents) == [1, 2, 3, 4]
    dim = len(vecs.first().embedding)
    assert all(len(c.cvec) == dim for c in cents)
    # deterministic across runs
    again = similarity.kmeans_centroids(vecs, k=4, n_iter=2).collect()
    assert {c.cent_id: list(c.cvec) for c in cents} == {c.cent_id: list(c.cvec) for c in again}
    # trained IVF still finds the perturbed twin of vector 0
    approx = similarity.ivf_topk(
        vecs, vecs.filter("vec_id = 0"), n_centroids=4, n_probe=2, k=1, kmeans_iters=2
    ).collect()
    assert approx and approx[0].neighbor_id == 30


def test_pq_codes_and_adc_topk(vecs):
    # codebooks: 4 subspaces (dim 8 -> 2 each) x 3 centroids, deterministic
    books = similarity.pq_train(vecs, m=4, k=3, n_iter=2, round_to=6)
    rows = books.collect()
    assert len(rows) == 4 * 3
    assert all(len(r.cvec) == 2 for r in rows)
    again = {(r.sub, r.cent_id): list(r.cvec) for r in
             similarity.pq_train(vecs, m=4, k=3, n_iter=2, round_to=6).collect()}
    assert {(r.sub, r.cent_id): list(r.cvec) for r in rows} == again
    # codes: exactly m small ints per vector, every code a trained centroid
    codes = similarity.pq_codes(vecs, books, m=4)
    by_id = {}
    for r in codes.collect():
        by_id.setdefault(r.id, []).append(r.code)
        assert 1 <= r.code <= 3
    assert all(len(v) == 4 for v in by_id.values()) and len(by_id) == 31
    # ADC: the perturbed twin (30) quantizes to vector 0's own codes, so
    # its asymmetric distance is the GLOBAL minimum (the query's LUT is
    # minimized per subspace exactly at its own code) — every neighbor
    # ranked above it is an exact quantization tie broken by lower id
    out = similarity.pq_adc_topk(
        codes, books, vecs.filter("vec_id = 0"), k=31, m=4, round_to=6
    ).collect()
    ranks = {r.neighbor_id: r.rank for r in out if r.query_id == 0}
    assert 30 in ranks
    cb = {(r.sub, r.cent_id): list(r.cvec) for r in rows}
    q0 = [float(x) for x in vecs.filter("vec_id = 0").first().embedding]

    def adist(nid):
        s = 0.0
        for sub in range(4):
            c = cb[(sub, by_id[nid][sub])]
            qs = q0[sub * 2 : sub * 2 + 2]
            s += round(sum((a - b) ** 2 for a, b in zip(qs, c)), 6)
        return round(s, 6)

    a30 = adist(30)
    assert all(adist(n) >= a30 for n in by_id if n != 0)
    above = [n for n, rk in ranks.items() if rk < ranks[30]]
    assert all(adist(n) == a30 and n < 30 for n in above)


def test_pii_scrub(spark):
    rows = [
        (0, "contact me at jane.doe+x@mail.example.com or +55 (11) 98765-4321"),
        (1, "server at 192.168.10.1 responded"),
        (2, "no pii in this one"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in textquality.pii_scrub(df).collect()}
    assert out[0].n_emails == 1 and out[0].n_phones == 1
    assert "<EMAIL>" in out[0].clean_text and "<PHONE>" in out[0].clean_text
    assert "jane" not in out[0].clean_text and "98765" not in out[0].clean_text
    assert out[1].n_ipv4 == 1 and "<IP>" in out[1].clean_text
    assert out[2].clean_text == "no pii in this one"
    assert (out[2].n_emails, out[2].n_ipv4, out[2].n_phones) == (0, 0, 0)


def test_gopher_quality(spark):
    rows = [
        (0, "a perfectly normal sentence with reasonably varied words here today"),
        (1, "spam " * 50),                     # one token dominates
        (2, "- item\n- item\n- item\n- item"),  # all bullets
    ]
    df = spark.createDataFrame([(i, t.strip()) for i, t in rows], "doc_id long, text string")
    out = {r.doc_id: r for r in textquality.gopher_quality(df).collect()}
    assert out[0].passes_gopher
    assert not out[1].passes_gopher and out[1].max_unigram_frac == 1.0
    assert not out[2].passes_gopher and out[2].bullet_frac == 1.0


def test_contamination(docs):
    # bench = doc 0; doc 1 is an exact copy (ratio 1), doc 3 unrelated (0)
    bench = docs.filter("doc_id = 0")
    out = {r.doc_id: r for r in dedup.contamination(docs, bench).collect()}
    assert out[1].contamination_ratio == 1.0
    assert out[3].n_contaminated == 0 and out[3].contamination_ratio == 0.0
    assert 0 < out[2].contamination_ratio < 1  # near-dup partially overlaps


def test_curate_docs_pipeline(spark):
    from pdf_table_extractor_spark.plans.curation import curate_docs

    good = ("a perfectly normal sentence with reasonably varied words here "
            "today about data and the order of the value records")
    rows = [
        (0, good),
        (1, good),              # exact dup of 0 → dropped
        (2, good + " slightly changed tail words"),  # near dup candidate
        (3, "spam " * 60),       # fails gopher
        (4, "o saldo de extrato para uma conta que não existe agora mesmo"),
    ]
    df = spark.createDataFrame([(i, t.strip()) for i, t in rows], "doc_id long, text string")
    out = {r.doc_id: r for r in curate_docs(df).collect()}
    assert len(out) == 5  # one curation row per doc, always
    assert out[0].keep == 1 and out[0].dup_rank == 1
    assert out[1].is_exact_dup == 1 and out[1].keep == 0
    assert out[0].text_md5 == out[1].text_md5
    assert out[2].near_dup_candidate == 1
    assert out[3].passes_gopher == 0 and out[3].keep == 0
    assert out[4].lang_guess == "pt"
    assert all(0 <= r.quality_score <= 1 for r in out.values())


def test_table_spans(spark):
    """'Table spans' payload (north star): lattice spans from ruling
    borders, stream spans from configured areas — verified against an
    independent recomputation on the synthetic stone/itau docs."""
    from pdf_table_extractor_spark import synth
    from pdf_table_extractor_spark.markup import parse as parse_markup
    from pdf_table_extractor_spark.operators.tables import table_spans
    from pdf_table_extractor_spark.synth import ITAU_GEOM

    docs = [synth.make_doc("stone", i) for i in range(40, 46)] + [
        synth.make_doc("itau", i) for i in range(50, 56)
    ]
    pages = spark.createDataFrame(
        [(d["url"], d["html"]) for d in docs], "url string, html binary"
    )
    got = table_spans(pages, stream_config=ITAU_GEOM).collect()
    by_url: dict = {}
    for r in got:
        by_url.setdefault(r.url, []).append(r)
    for d in docs:
        spans = by_url.get(d["url"], [])
        words, rulings = parse_markup(bytes(d["html"]))
        if "/stone/" in d["url"]:
            from pdf_table_extractor_spark.operators.statemachines import _stone_doc

            spans = [s for s in spans if s.mode == "lattice"]
            assert spans, d["url"]
            for s in spans:
                page_vxs = {r.x0 for r in rulings
                            if r.page_no == s.page_no and r.x0 == r.x1}
                assert s.x0 in page_vxs and s.x1 in page_vxs and s.x1 > s.x0
                assert s.n_cols >= 1 and s.n_rows >= 1
            # cross-operator consistency: the row extractor emits exactly
            # the rows the spans account for
            assert sum(s.n_rows for s in spans) == len(_stone_doc(bytes(d["html"])))
        else:
            stream = [s for s in spans if s.mode == "stream"]
            assert stream, d["url"]
            for s in stream:
                assert s.n_cols == len(
                    (ITAU_GEOM["page_1"] if s.page_no == 1 else ITAU_GEOM["page_2_end"])["columns"]
                ) + 1
                assert s.x1 > s.x0 and s.bottom > s.top and s.n_rows >= 2


def test_mean_pool_pack_and_values(spark):
    from pdf_table_extractor_spark.operators import similarity

    df = spark.createDataFrame(
        [(1, [1.0, 2.0], 0), (2, [3.0, 4.0], 0), (3, [10.0, 20.0], 1)],
        "vec_id long, embedding array<float>, label int",
    )
    out = {r["grp"]: r["pooled"] for r in similarity.mean_pool(df).collect()}
    assert out[0] == [2.0, 3.0]
    assert out[1] == [10.0, 20.0]


def test_quantize_int8_roundtrip(spark):
    from pdf_table_extractor_spark.operators import similarity

    df = spark.createDataFrame(
        [(1, [0.0, 0.5, 1.0]), (2, [2.0, 2.0, 2.0])],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r for r in similarity.quantize_int8(df).collect()}
    assert out[1]["q"] == [0, 128, 255]  # round(0.5*255)=127.5 -> HALF_UP 128
    assert out[1]["q_min"] == 0.0 and out[1]["q_max"] == 1.0
    assert out[2]["q"] == [0, 0, 0]  # constant vector -> zeros, no div0
    # dequantization error bounded by half a step
    step = 1.0 / 255
    deq = [out[1]["q_min"] + q * step for q in out[1]["q"]]
    assert all(abs(d - x) <= step / 2 + 1e-9 for d, x in zip(deq, [0.0, 0.5, 1.0]))


def test_chunk_tokens_windows(spark):
    from pdf_table_extractor_spark.operators import textquality

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, "a b")],
        "doc_id long, text string",
    )
    out = [
        (r["doc_id"], r["chunk_no"], r["chunk_text"], r["n_toks"])
        for r in textquality.chunk_tokens(docs, chunk=4, overlap=1)
        .orderBy("doc_id", "chunk_no")
        .collect()
    ]
    # stride 3: windows at 0, 3, 6 — the last one reaches t9, full coverage
    assert out == [
        (1, 0, "t0 t1 t2 t3", 4),
        (1, 1, "t3 t4 t5 t6", 4),
        (1, 2, "t6 t7 t8 t9", 4),
        (2, 0, "a b", 2),
    ]


def test_curation_operators_compose_end_to_end(spark):
    """The full crawl-curation chain wired together over one synthetic
    snapshot: latest-capture merge -> domain blocklist -> quality
    classifier -> cross-doc passage dedup -> fuzzy keep -> temperature
    rebalance -> token-budget sharding. Asserts the stage invariants
    (row conservation / monotone filtering), proving the operator APIs
    actually compose without adapters."""
    from pyspark.sql import functions as F

    from pdf_table_extractor_spark.operators import (
        dedup,
        sampling,
        textquality,
        urls,
    )

    base = "the and of data value order key fast slow table row scan"
    rows = []
    for i in range(40):
        host = f"site{i % 5}.com"
        rows.append(
            (
                i,
                f"http://{host}/p/{i % 20}",  # 2 captures per url
                1000 + i,
                f"{base} doc {i % 10} payload {'x y z w v u q r s t' if i % 2 else 'm n o p'}",
            )
        )
    pages = spark.createDataFrame(rows, "doc_id long, url string, warc_us long, text string")

    latest = urls.latest_capture(pages)  # newest of the 2 captures per url
    assert latest.count() == 20

    blocked = spark.createDataFrame([("site4.com",)], "domain string")
    allowed = urls.blocklist_filter(latest, blocked)
    n_allowed = allowed.count()
    assert n_allowed == 16  # 4 of 20 urls live on the blocked domain

    quality = textquality.linear_quality(allowed).where("keep")
    kept_q = allowed.join(quality.select("doc_id"), "doc_id")
    assert 0 < kept_q.count() <= n_allowed

    cleaned = dedup.drop_duplicated_spans(kept_q, n=5, min_docs=2)
    assert cleaned.count() == kept_q.count()  # row-preserving rewrite

    sig = dedup.minhash_signatures(kept_q, n_hashes=4)
    prs = dedup.lsh_candidates(sig, n_hashes=4, band_size=1)
    keep = dedup.fuzzy_keep(kept_q, prs).where("keep")

    survivors = kept_q.join(keep.select("doc_id"), "doc_id").withColumn(
        "domain", F.regexp_extract("url", r"http://([^/]+)/", 1)
    )
    resampled = sampling.temperature_resample(
        survivors, group_expr=F.col("domain"), temperature=2.0
    ).where("keep")

    sharded = sampling.assign_shards(
        resampled,
        tokens_per_shard=30,
        n_tokens=F.size(F.split(F.trim(F.col("text")), r"\s+")),
        group_size=4,
    )
    out = sharded.select("doc_id", "shard", "token_offset").collect()
    assert len(out) == resampled.count() > 0
    # shard ids are contiguous from 0 and offsets strictly increase by doc
    shards = sorted({r["shard"] for r in out})
    assert shards == list(range(len(shards)))


def test_semdedup_keep_rule(vecs):
    import math

    out = similarity.semdedup(vecs, k=3, threshold=0.95, n_iter=2).collect()
    assert len(out) == 31
    rows = {r.vec_id: r for r in vecs.collect()}
    cent = {r.vec_id: r.cent_id for r in out}
    keep = {r.vec_id: r.keep for r in out}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    # keep iff NO lower-id same-cluster vector within the threshold
    for i, r in rows.items():
        expect = not any(
            cent[j] == cent[i] and cos(rows[j].embedding, r.embedding) >= 0.95
            for j in rows
            if j < i
        )
        assert keep[i] == expect, i
    # the perturbed twin (30) of vector 0 must be dropped, its exemplar kept
    assert keep[0] and not keep[30]


def test_incremental_dedup_statuses(spark):
    """Incremental dedup against a persisted index: every status arm on
    a deterministic fixture — exact index hit, LSH-band near-dup of a
    kept doc (last word changed, both minhash bands preserved; md5 is
    fixed so this is pinned forever), unique kept, and within-batch
    keep-first. The old corpus participates only via its (kind,key)
    index rows."""
    from pdf_table_extractor_spark.operators import dedup

    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    )
    old = spark.createDataFrame(
        [(1, base), (2, "mike november oscar papa quebec romeo sierra tango")],
        "doc_id long, text string",
    )
    batch = "same batch copy text one two three four five six"
    new = spark.createDataFrame(
        [
            (3, base),
            (6, base.replace("lima", "zulu")),
            (9, "uniform victor whiskey xray yankee zulu unique words here now"),
            (12, batch),
            (15, batch),
        ],
        "doc_id long, text string",
    )
    idx = dedup.dedup_index(old, n_hashes=4, band_size=2)
    got = {
        r["doc_id"]: r["status"]
        for r in dedup.incremental_dedup(new, idx, n_hashes=4, band_size=2).collect()
    }
    assert got == {
        3: "exact_dup_index",
        6: "near_dup_index",
        9: "kept",
        12: "kept",
        15: "exact_dup_batch",
    }
    # index rows are skinny strings only: (kind, key)
    assert idx.columns == ["kind", "key"]


def test_decontaminate_spans_cuts_exact_benchmark_overlap(spark):
    docs = spark.createDataFrame(
        [
            # shares the 3-gram 'q1 q2 q3' mid-document
            (1, "intro words q1 q2 q3 outro words here"),
            # clean document: untouched
            (2, "totally unrelated content with no overlap at all"),
            # IS a benchmark doc verbatim: fully cut
            (3, "q1 q2 q3 q4"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([("q1 q2 q3 q4",)], "text string")
    out = {
        r["doc_id"]: r
        for r in dedup.decontaminate_spans(docs, bench, n=3).collect()
    }
    assert out[1]["clean_text"] == "intro words outro words here"
    assert out[1]["n_dropped"] == 3
    assert out[2]["clean_text"] == "totally unrelated content with no overlap at all"
    assert out[2]["n_dropped"] == 0
    assert out[3]["clean_text"] == "" and out[3]["n_dropped"] == 4


def test_embed_covariance_both_methods_match_numpy(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    data = rng.randn(40, 5).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(data)],
        "vec_id long, embedding array<float>",
    )
    exp = np.cov(data.astype("float64"), rowvar=False, bias=True)
    for method in ("expr", "partial"):
        got = similarity.embed_covariance(df, method=method).collect()
        assert len(got) == 5 * 6 // 2
        for r in got:
            assert r["n"] == 40
            assert abs(r["cov"] - exp[r["i"] - 1, r["j"] - 1]) < 2e-6, (method, r)


def test_pca_power_model_matches_eigh(spark):
    import numpy as np

    rng = np.random.RandomState(11)
    # well-separated spectrum so 8 power steps converge
    base = rng.randn(300, 4) * np.array([4.0, 1.5, 0.4, 0.05])
    q, _ = np.linalg.qr(rng.randn(4, 4))
    data = (base @ q).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(data)],
        "vec_id long, embedding array<float>",
    )
    cov = similarity.embed_covariance(df)
    pvals, pcomps = similarity.pca_power_model(cov, k=2, n_iter=8)
    evals, ecomps = similarity.pca_model(cov, k=2)
    assert pvals[0] > pvals[1] > 0
    for c in range(2):
        assert abs(pvals[c] - evals[c]) < 1e-3 * max(1.0, evals[c])
        # same direction up to the shared sign fix
        assert abs(abs(np.dot(pcomps[c], ecomps[c])) - 1.0) < 1e-4
    # deterministic: identical trajectory on a rerun
    pvals2, pcomps2 = similarity.pca_power_model(cov, k=2, n_iter=8)
    assert pvals2 == pvals and pcomps2 == pcomps


def test_pca_model_and_whitened_projection(spark):
    import numpy as np

    rng = np.random.RandomState(3)
    # anisotropic cloud: dominant direction along (1,1,0)/sqrt(2)
    base = rng.randn(200, 3) * np.array([3.0, 0.5, 0.1])
    rot = np.array([[2**-0.5, 2**-0.5, 0], [-(2**-0.5), 2**-0.5, 0], [0, 0, 1.0]])
    data = (base @ rot).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(data)],
        "vec_id long, embedding array<float>",
    )
    cov = similarity.embed_covariance(df)
    vals, comps = similarity.pca_model(cov, k=2)
    assert vals[0] > vals[1] > 0
    # top component aligns with the planted dominant direction
    assert abs(abs(np.dot(comps[0], rot[0])) - 1.0) < 0.05
    means = [float(m) for m in data.astype("float64").mean(axis=0)]
    proj = similarity.pca_project(
        df, comps, means, eigvals=vals, vec_col="embedding"
    )
    mat = np.array([r["proj"] for r in proj.orderBy("vec_id").collect()])
    # whitening: each retained coordinate has ~unit variance, ~zero mean
    assert np.allclose(mat.mean(axis=0), 0.0, atol=1e-3)
    assert np.allclose(mat.var(axis=0), 1.0, atol=0.05)
    # spark projection == numpy projection
    exp = (data.astype("float64") - means) @ np.array(comps).T / np.sqrt(
        np.array(vals) + 1e-9
    )
    assert np.allclose(mat, np.round(exp, 6), atol=2e-6)


def test_merge_upsert_covers_every_resolution_path(spark):
    """insert / update / stale-ignored / delete / delete-of-absent /
    untouched-target, each pinned to its own key."""
    from pdf_table_extractor_spark.operators import urls

    target = spark.createDataFrame(
        [
            ("upd", "old", 10),   # updated by a fresher change
            ("stale", "keep", 10),  # change carries an OLDER version
            ("del", "gone", 10),  # deleted by the batch
            ("only", "mine", 10),  # no change at all
        ],
        "k string, v string, ver int",
    )
    changes = spark.createDataFrame(
        [
            ("ins", "new", 5, False),     # insert (absent from target)
            ("upd", "mid", 11, False),    # superseded within the batch...
            ("upd", "newest", 12, False),  # ...by this last-writer
            ("stale", "replay", 9, False),  # stale replay — ignored
            ("del", "x", 11, True),       # delete wins
            ("ghost", "x", 7, True),      # delete-of-absent no-op
        ],
        "k string, v string, ver int, is_delete boolean",
    )
    out = urls.merge_upsert(
        target, changes, key_cols=["k"], version_col="ver", delete_col="is_delete"
    )
    got = {r["k"]: (r["v"], r["ver"]) for r in out.collect()}
    assert got == {
        "ins": ("new", 5),
        "upd": ("newest", 12),
        "stale": ("keep", 10),
        "only": ("mine", 10),
    }

    # no delete_col: pure upsert, deletes impossible
    out2 = urls.merge_upsert(
        target, changes.drop("is_delete"), key_cols=["k"], version_col="ver"
    )
    got2 = {r["k"]: r["v"] for r in out2.collect()}
    assert got2["del"] == "x" and got2["ghost"] == "x" and len(got2) == 6

    with pytest.raises(ValueError):
        urls.merge_upsert(target, changes.drop("v"), key_cols=["k"], version_col="ver")


def test_lsh_plan_picks_inflection_near_threshold():
    from pdf_table_extractor_spark.operators.dedup import lsh_candidate_prob, lsh_plan

    for n, t in [(16, 0.5), (64, 0.8), (128, 0.7), (12, 0.3)]:
        b, r = lsh_plan(n, t)
        assert b * r == n
        # the chosen plan's S-curve must cross ~0.5 candidate probability
        # in the neighbourhood of the threshold: clearly separating
        # pairs well below from pairs well above
        assert lsh_candidate_prob(min(t + 0.2, 0.99), b, r) > 0.5
        assert lsh_candidate_prob(max(t - 0.25, 0.01), b, r) < 0.6
    # degenerate configs rejected
    import pytest

    with pytest.raises(ValueError):
        lsh_plan(0, 0.5)
    with pytest.raises(ValueError):
        lsh_plan(16, 1.0)


def test_random_projection_folds_matrix_and_preserves_distance(spark):
    """The md5 sign matrix must constant-fold out of the runtime plan,
    and pairwise distances must be preserved within JL-plausible bounds
    on a hand corpus."""
    import math
    import random

    rng = random.Random(3)
    vecs = [(i, [rng.gauss(0, 1) for _ in range(32)]) for i in range(30)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = similarity.random_projection(df, dim=32, out_dim=16)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "md5" not in plan  # folded to literals at plan time
    got = {r["vec_id"]: r["proj"] for r in out.collect()}
    # norms preserved in expectation: median ratio within a loose band
    ratios = []
    for i, v in vecs:
        n0 = math.sqrt(sum(x * x for x in v))
        n1 = math.sqrt(sum(y * y for y in got[i]))
        ratios.append(n1 / n0)
    ratios.sort()
    assert 0.6 < ratios[len(ratios) // 2] < 1.4, ratios


def test_containment_asymmetric_vs_jaccard(spark):
    """A short doc fully inside a long one: containment ~1 one way,
    tiny the other; Jaccard would be small."""
    small = "alpha beta gamma delta epsilon"
    big = small + " " + " ".join(f"w{i} x{i} y{i}" for i in range(30))
    df = spark.createDataFrame(
        [(1, small, "s"), (2, big, "s"), (3, "unrelated stuff here now", "s")],
        "doc_id long, text string, source string",
    )
    rows = dedup.containment_pairs(df, scope_col="source", threshold=0.5).collect()
    assert len(rows) == 1
    (r,) = rows
    assert (r["a"], r["b"]) == (1, 2)
    assert r["c_a_in_b"] == 1.0  # every small-doc shingle is in big
    assert r["c_b_in_a"] < 0.1
    import pytest

    with pytest.raises(ValueError):
        dedup.containment_pairs(df)  # unscoped without max_df must refuse


def test_winnow_fingerprints_matches_python_replay(spark):
    """Engine winnowing == the published algorithm replayed in python
    (min per window, rightmost ties, distinct positions), plus the
    coverage guarantee: docs sharing a long run share a fingerprint."""
    import hashlib
    import random

    rng = random.Random(11)
    vocab = ["a", "b", "c", "d", "e", "f"]
    docs = []
    shared = " ".join(rng.choice(vocab) for _ in range(12))
    for i in range(25):
        n = rng.randrange(0, 15)
        words = [rng.choice(vocab) for _ in range(n)]
        if i % 5 == 0:
            words = words[: n // 2] + shared.split() + words[n // 2:]
        docs.append((i, " ".join(words)))
    k, w = 3, 4

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    def ref(text):
        toks = text.split()
        sh = [" ".join(toks[j:j + k]) for j in range(len(toks) - k + 1)]
        hs = [h(s) for s in sh]
        if not hs:
            return set()
        out = set()
        for j in range(max(len(hs) - w + 1, 1)):
            win = hs[j:j + w]
            m = min(win)
            pos = j + max(i for i, x in enumerate(win) if x == m)
            out.add((pos, m))
        return out

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in textquality.winnow_fingerprints(df, k=k, window=w).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    for i, t in docs:
        assert got.get(i, set()) == ref(t), (i, t)
    # coverage guarantee across the planted shared run
    sharers = [i for i, t in docs if shared in t]
    fps = [ {fp for _, fp in got[i]} for i in sharers ]
    common = set.intersection(*fps) if fps else set()
    assert len(sharers) >= 2 and common, sharers


def test_readability_hand_checked(spark):
    """'the cat sat on the mat.' — 6 words, 1 sentence, 6 syllables:
    ease = 206.835 - 1.015*6 - 84.6*1 = 116.145; grade = 0.39*6 +
    11.8*1 - 15.59 = -1.45. Empty docs yield NULLs, not throws."""
    df = spark.createDataFrame(
        [(1, "the cat sat on the mat."), (2, ""), (3, "beautiful anywhere!")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in textquality.readability(df).collect()}
    r1 = got[1]
    assert (r1["n_words"], r1["n_sentences"], r1["n_syllables"]) == (6, 1, 6)
    assert r1["reading_ease"] == round(206.835 - 1.015 * 6 - 84.6 * 1, 4)
    assert r1["fk_grade"] == round(0.39 * 6 + 11.8 * 1 - 15.59, 4)
    assert got[2]["reading_ease"] is None and got[2]["fk_grade"] is None
    # vowel groups: beautiful -> eau,i,u (3); anywhere! -> a,y,e,e (4)
    assert got[3]["n_syllables"] == 7 and got[3]["n_sentences"] == 1


def test_mojibake_roundtrip_and_score(spark):
    """Corrupt -> fix restores the original byte-for-byte for the whole
    computed map; clean text scores zero."""
    clean = "ação é ótima — “café único’ " + "plain ascii tail"
    bad = clean.encode("utf-8").decode("cp1252")
    df = spark.createDataFrame(
        [(1, bad), (2, clean), (3, "pure ascii only")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in textquality.mojibake_stats(df).collect()}
    assert got[1]["fixed_text"] == clean
    assert got[1]["n_artifacts"] > 0
    assert got[2]["fixed_text"] == clean  # already-clean text untouched
    assert got[3]["n_artifacts"] == 0 and got[3]["artifacts_per_kchar"] == 0.0
