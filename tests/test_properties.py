"""Property tests (SURVEY §5.3): money round-trip, date coalesce,
ffill/bfill ≡ pandas, segmentation reassembly. Hypothesis drives the input
space; each property collects a whole batch into ONE Spark job to keep
runtime sane."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from pdf_table_extractor_spark.functions import dates, money, windows

SET = settings(max_examples=12, deadline=None)

cents = st.integers(min_value=1, max_value=99_999_999)


def br_text(c: int) -> str:
    us = f"{c / 100:,.2f}"
    return us.replace(",", "@").replace(".", ",").replace("@", ".")


@given(st.lists(st.tuples(cents, st.sampled_from(["+", "-"])), min_size=1, max_size=30))
@SET
def test_money_paren_roundtrip(spark, vals):
    rows = [(f"DESC X {br_text(c)} ({s})", Decimal(c) / 100 * (1 if s == "+" else -1))
            for c, s in vals]
    df = spark.createDataFrame(rows, "line string, expected decimal(18,2)")
    bad = df.withColumn("got", money.extract_money_paren_sign(F.col("line"))).filter(
        "got IS DISTINCT FROM expected"
    )
    assert bad.count() == 0


@given(st.lists(st.tuples(cents, st.sampled_from(["C", "D"])), min_size=1, max_size=30))
@SET
def test_money_cd_roundtrip(spark, vals):
    rows = [(f"HIST {br_text(c)} {s}", Decimal(c) / 100 * (1 if s == "C" else -1))
            for c, s in vals]
    df = spark.createDataFrame(rows, "line string, expected decimal(18,2)")
    bad = df.withColumn("got", money.extract_money_cd(F.col("line"))).filter(
        "got IS DISTINCT FROM expected"
    )
    assert bad.count() == 0


@given(st.lists(st.dates(dt.date(1990, 1, 1), dt.date(2049, 12, 31)), min_size=1, max_size=30),
       st.sampled_from(["%d/%m/%Y", "%Y-%m-%d", "%d.%m.%Y"]))
@SET
def test_date_coalesce_roundtrip(spark, ds, fmt):
    rows = [(d.strftime(fmt), d) for d in ds]
    df = spark.createDataFrame(rows, "txt string, expected date")
    bad = df.withColumn("got", dates.coalesce_to_date(F.col("txt"))).filter(
        "got IS DISTINCT FROM expected"
    )
    assert bad.count() == 0


@given(st.lists(st.one_of(st.none(), st.integers(0, 9)), min_size=1, max_size=40))
@SET
def test_ffill_bfill_match_pandas(spark, vals):
    import pandas as pd

    rows = [("d", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "url string, line_no int, v int")
    got = (
        df.withColumn("f", windows.ffill(F.col("v"), ["url"], "line_no"))
        .withColumn("b", windows.bfill(F.col("v"), ["url"], "line_no"))
        .orderBy("line_no")
        .toPandas()
    )
    s = pd.Series(vals, dtype="Float64")
    assert [None if pd.isna(x) else int(x) for x in s.ffill()] == \
           [None if pd.isna(x) else int(x) for x in got["f"]]
    assert [None if pd.isna(x) else int(x) for x in s.bfill()] == \
           [None if pd.isna(x) else int(x) for x in got["b"]]


@given(st.lists(st.tuples(st.booleans(), st.text(alphabet="abc", min_size=1, max_size=4)),
                min_size=1, max_size=40))
@SET
def test_segmentation_reassembles(spark, items):
    # force the first line to start a segment (reference drops pre-start lines)
    items = [(True, items[0][1])] + list(items[1:])
    rows = [("d", i, st_, t) for i, (st_, t) in enumerate(items)]
    df = spark.createDataFrame(rows, "url string, line_no int, is_start boolean, t string")
    seg = df.withColumn("seg", windows.segment_id(F.col("is_start"), ["url"], "line_no"))
    joined = (
        seg.groupBy("seg")
        .agg(F.array_join(F.transform(F.array_sort(F.collect_list(F.struct("line_no", "t"))),
                                      lambda x: x["t"]), " ").alias("txt"),
             F.min("line_no").alias("ln"))
        .orderBy("ln")
        .collect()
    )
    # reassembled segments concatenated == original text sequence
    assert " ".join(r.txt for r in joined) == " ".join(t for _, t in items)
    # number of segments == number of start markers
    assert len(joined) == sum(1 for s, _ in items if s)


LATIN = "aàáâãäåbcçdeèéêëfghiìíîïnñoòóôõöøuùúûüyßæœłđ ÁÉÍÓÚÄÖÜÑÇ"


@given(st.lists(st.text(alphabet=LATIN, min_size=0, max_size=30), min_size=1, max_size=30))
@SET
def test_transliterate_agrees_with_jvm_fold(spark, texts):
    """The pandas-UDF fallback and the JVM translate fold are the same
    function on Latin input, and both produce pure ASCII."""
    from pdf_table_extractor_spark.functions import textops
    from pdf_table_extractor_spark.operators import tables

    df = spark.createDataFrame([(t,) for t in texts], "s string")
    got = df.select(
        tables.ascii_fold(F.col("s")).alias("jvm"),
        textops.transliterate(F.col("s")).alias("py"),
    ).collect()
    for r in got:
        assert r.jvm == r.py
        assert r.jvm.isascii() or r.jvm == ""


pii_piece = st.one_of(
    st.text(alphabet="abc xyz.,", min_size=1, max_size=12),
    st.builds(lambda a, b: f"{a}@{b}.com", st.text("ab", min_size=1, max_size=5),
              st.text("cd", min_size=1, max_size=5)),
    st.builds(lambda a, b, c, d: f"{a}.{b}.{c}.{d}",
              *([st.integers(0, 255)] * 4)),
)


@given(st.lists(st.lists(pii_piece, min_size=1, max_size=6), min_size=1, max_size=20))
@SET
def test_pii_counts_match_python_re(spark, docs):
    import re

    from pdf_table_extractor_spark.operators import textquality as tq

    texts = [" ".join(p) for p in docs]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r.doc_id: r for r in tq.pii_scrub(df).collect()}
    for i, t in enumerate(texts):
        assert got[i].n_emails == len(re.findall(tq.PII_EMAIL, t)), t
        assert got[i].n_ipv4 == len(re.findall(tq.PII_IPV4, t)), t


@given(st.lists(st.lists(st.sampled_from(["spark", "data", "fast", "a", "-", "pipeline"]),
                         min_size=1, max_size=40), min_size=1, max_size=15))
@SET
def test_gopher_unigram_matches_counter(spark, docs):
    from collections import Counter

    from pdf_table_extractor_spark.operators import textquality as tq

    texts = [" ".join(toks) for toks in docs]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r.doc_id: r for r in tq.gopher_quality(df).collect()}
    for i, toks in enumerate(docs):
        c = Counter(toks)
        expect = round(max(c.values()) / sum(c.values()), 6)
        assert abs(got[i].max_unigram_frac - expect) < 1e-9
        assert got[i].n_tokens == len(toks)


# ---------------------------------------------------------------------------
# Curation-operator properties: each Spark operator vs an independent
# pure-Python re-derivation on randomized inputs.
# ---------------------------------------------------------------------------

tok_st = st.sampled_from(["a", "b", "c", "d", "e"])
doc_st = st.lists(tok_st, min_size=0, max_size=14)


def _py_drop_spans(docs: dict[int, list[str]], n: int, min_docs: int):
    from collections import defaultdict

    gram_docs = defaultdict(set)
    for d, toks in docs.items():
        for i in range(max(len(toks) - n + 1, 0)):
            gram_docs[tuple(toks[i : i + n])].add(d)
    dup = {g for g, ds in gram_docs.items() if len(ds) >= min_docs}
    out = {}
    for d, toks in docs.items():
        covered = [False] * len(toks)
        for i in range(max(len(toks) - n + 1, 0)):
            if tuple(toks[i : i + n]) in dup:
                for j in range(i, i + n):
                    covered[j] = True
        kept = [t for t, c in zip(toks, covered) if not c]
        out[d] = (" ".join(kept), len(toks), sum(covered))
    return out


@given(st.lists(doc_st, min_size=2, max_size=6))
@SET
def test_drop_duplicated_spans_matches_python(spark, doc_lists):
    from pdf_table_extractor_spark.operators.dedup import drop_duplicated_spans

    docs = {i: toks for i, toks in enumerate(doc_lists)}
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in docs.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_dropped"])
        for r in drop_duplicated_spans(df, n=3, min_docs=2).collect()
    }
    exp = _py_drop_spans(docs, n=3, min_docs=2)
    # empty docs tokenize to [''] in the engine (split of '') — align
    for d, toks in docs.items():
        if not toks:
            exp[d] = ("", 1, 0)
    assert got == exp


@given(st.lists(st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=1, max_size=20))
@SET
def test_cc_labels_matches_union_find(spark, raw_pairs):
    from pdf_table_extractor_spark.operators.dedup import cc_labels

    pairs = [(a, b) for a, b in raw_pairs if a != b]
    if not pairs:
        pairs = [(0, 1)]
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp_min: dict[int, int] = {}
    for x in list(parent):
        r = find(x)
        comp_min[r] = min(comp_min.get(r, x), x)
    exp = {x: comp_min[find(x)] for x in parent}

    df = spark.createDataFrame(pairs, "a long, b long")
    got = {r["id"]: r["label"] for r in cc_labels(df).collect()}
    assert got == exp


@given(st.lists(st.integers(1, 30), min_size=1, max_size=25), st.integers(2, 9))
@SET
def test_assign_shards_matches_python_cumsum(spark, tok_counts, group_size):
    from pdf_table_extractor_spark.operators import sampling

    df = spark.createDataFrame(
        [(i, "w " * n) for i, n in enumerate(tok_counts)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["token_offset"], r["shard"])
        for r in sampling.assign_shards(
            df,
            tokens_per_shard=40,
            n_tokens=F.size(F.split(F.trim(F.col("text")), r"\s+")),
            group_size=group_size,
        ).collect()
    }
    off = 0
    for i, n in enumerate(tok_counts):
        assert got[i] == (off, off // 40)
        off += n


@given(
    st.lists(tok_st, min_size=1, max_size=30),
    st.integers(2, 8),
    st.integers(0, 3),
)
@SET
def test_chunk_tokens_exact_coverage(spark, toks, chunk, overlap):
    from pdf_table_extractor_spark.operators.textquality import chunk_tokens

    if overlap >= chunk:
        overlap = chunk - 1
    df = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    rows = chunk_tokens(df, chunk=chunk, overlap=overlap).collect()
    stride = chunk - overlap
    seen: dict[int, str] = {}
    for r in rows:
        start = r["chunk_no"] * stride
        for j, t in enumerate(r["chunk_text"].split(" ")):
            pos = start + j
            # overlapping windows must agree on shared positions
            assert seen.setdefault(pos, t) == t
    assert sorted(seen) == list(range(len(toks)))  # full, gap-free coverage
    assert [seen[i] for i in range(len(toks))] == toks


@given(st.lists(st.tuples(st.integers(0, 8), st.integers(0, 8)), min_size=1, max_size=12))
@SET
def test_pagerank_conserves_mass(spark, raw_edges):
    from pdf_table_extractor_spark.operators.graph import pagerank

    edges = [(f"h{a}", f"h{b}", 1) for a, b in raw_edges]
    df = spark.createDataFrame(edges, "src_host string, dst_host string, n_links long")
    pr = {r["host"]: r["pr"] for r in pagerank(df, iters=4).collect()}
    assert abs(sum(pr.values()) - 1.0) < 1e-3  # teleport + dangling conserve mass
    assert all(p > 0 for p in pr.values())


@given(st.lists(st.tuples(st.integers(0, 6), st.integers(0, 6)), min_size=1, max_size=12))
@SET
def test_hits_matches_sequential_replay(spark, raw_edges):
    """Engine HITS == a sequential dict replay of Kleinberg's update
    (auth from hub, hub from NEW auth, L2 norms over all nodes)."""
    import math

    from pdf_table_extractor_spark.operators.graph import hits

    edges = [(f"h{a}", f"h{b}", 1 + (a + b) % 3) for a, b in raw_edges]
    w = {}
    for s, d, n in edges:
        w[(s, d)] = w.get((s, d), 0) + n
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    hub = {v: 1.0 for v in nodes}
    auth = {v: 1.0 for v in nodes}
    for _ in range(3):
        auth = {v: sum(hub[s] * wt for (s, d), wt in w.items() if d == v) for v in nodes}
        na = math.sqrt(sum(a * a for a in auth.values()))
        auth = {v: a / na for v, a in auth.items()}
        hub = {v: sum(auth[d] * wt for (s, d), wt in w.items() if s == v) for v in nodes}
        nh = math.sqrt(sum(h * h for h in hub.values()))
        hub = {v: h / nh for v, h in hub.items()}
    agg = {}
    for s, d, n in edges:
        agg[(s, d)] = agg.get((s, d), 0) + n
    df = spark.createDataFrame(
        [(s, d, n) for (s, d), n in agg.items()],
        "src_host string, dst_host string, n_links long",
    )
    got = {r["host"]: (r["hub"], r["auth"]) for r in hits(df, iters=3).collect()}
    assert set(got) == set(nodes)
    for v in nodes:
        assert abs(got[v][0] - hub[v]) < 1e-5, (v, got[v], hub[v])
        assert abs(got[v][1] - auth[v]) < 1e-5, (v, got[v], auth[v])


@given(st.lists(st.tuples(st.integers(0, 6), st.integers(0, 6)), min_size=1, max_size=12))
@SET
def test_label_propagation_matches_sequential_replay(spark, raw_edges):
    """Engine synchronous LPA == a dict replay (undirected folded
    weights, weight-argmax with min-label ties, isolated keep-label)."""
    from pdf_table_extractor_spark.operators.graph import label_propagation

    und = {}
    for a, b in raw_edges:
        s, d, n = f"h{a}", f"h{b}", 1 + (a + b) % 3
        und[(s, d)] = und.get((s, d), 0) + n
        und[(d, s)] = und.get((d, s), 0) + n
    nodes = sorted({x for e in und for x in e})
    lab = {v: v for v in nodes}
    for _ in range(3):
        new = {}
        for v in nodes:
            votes = {}
            for (u, w_node), wt in und.items():
                if u == v:
                    votes[lab[w_node]] = votes.get(lab[w_node], 0) + wt
            if votes:
                new[v] = min(votes, key=lambda c: (-votes[c], c))
            else:
                new[v] = lab[v]
        lab = new
    agg = {}
    for a, b in raw_edges:
        s, d, n = f"h{a}", f"h{b}", 1 + (a + b) % 3
        agg[(s, d)] = agg.get((s, d), 0) + n
    df = spark.createDataFrame(
        [(s, d, n) for (s, d), n in agg.items()],
        "src_host string, dst_host string, n_links long",
    )
    got = {r["host"]: r["community"] for r in label_propagation(df, iters=3).collect()}
    assert got == lab


_merge_op = st.tuples(
    st.integers(min_value=0, max_value=6),   # key
    st.integers(min_value=0, max_value=15),  # version
    st.booleans(),                           # is_delete
)


@given(st.lists(st.lists(_merge_op, min_size=1, max_size=8), min_size=1, max_size=3))
@settings(max_examples=6, deadline=None)
def test_merge_upsert_matches_dict_replay(spark, raw_batches):
    """Sequential merge_upsert over random change batches ≡ a python dict
    replay of the same rules (last-writer-wins reduce, >= freshness guard,
    delete wins, delete-of-absent no-op) — multi-batch composition, the
    streaming/merge.py loop's algebra."""
    from pdf_table_extractor_spark.operators import urls

    state: dict = {}
    cur = spark.createDataFrame([], "k long, v string, ver long")
    for raw in raw_batches:
        seen, batch = set(), []
        for k, ver, d in raw:
            if (k, ver) in seen:  # (key, version) unique per batch: the
                continue          # operator's documented determinism contract
            seen.add((k, ver))
            batch.append((k, f"v{k}_{ver}", ver, d))
        red: dict = {}
        for k, v, ver, d in batch:
            if k not in red or ver > red[k][1]:
                red[k] = (v, ver, d)
        for k, (v, ver, d) in red.items():
            c = state.get(k)
            if c is None or ver >= c[1]:
                if d:
                    state.pop(k, None)
                else:
                    state[k] = (v, ver)
        ch = spark.createDataFrame(
            batch, "k long, v string, ver long, is_delete boolean"
        )
        cur = urls.merge_upsert(
            cur, ch, key_cols=["k"], version_col="ver", delete_col="is_delete"
        )
    got = {r["k"]: (r["v"], r["ver"]) for r in cur.collect()}
    assert got == state


_EPOCH = dt.datetime(2026, 3, 1)

_asof_left = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 120)),  # (key, ts offset s)
    min_size=1, max_size=25,
)
_asof_right = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 120), st.integers(0, 99)),
    min_size=1, max_size=25,
)


@given(_asof_left, _asof_right,
       st.sampled_from([None, 7.0]), st.sampled_from([None, 13]))
@settings(max_examples=8, deadline=None)
def test_asof_join_matches_pandas_merge_asof(spark, raw_l, raw_r, tol, bucket_s):
    """asof_join (plain AND bucketed carry path) ≡ pandas.merge_asof
    (backward-inclusive, by-key, tolerance) on random key/ts layouts —
    the independent oracle the DuckDB ASOF contract can't fuzz."""
    import pandas as pd

    from pdf_table_extractor_spark.operators.asof import asof_join

    lrows = [(k, _EPOCH + dt.timedelta(seconds=s)) for k, s in raw_l]
    rrows = sorted({(k, s): (k, _EPOCH + dt.timedelta(seconds=s), v)
                    for k, s, v in raw_r}.values())  # unique per (key, ts)
    from collections import Counter

    lf = spark.createDataFrame(lrows, "k int, ts timestamp")
    rf = spark.createDataFrame(rrows, "k int, ts timestamp, val int")
    got = Counter(
        (r["k"], r["ts"], r["val"])
        for r in asof_join(
            lf, rf, ["k"], "ts", ["val"],
            tolerance_s=tol, bucket_s=bucket_s,
        ).collect()
    )
    lp = pd.DataFrame(lrows, columns=["k", "ts"]).sort_values("ts", kind="stable")
    rp = pd.DataFrame(rrows, columns=["k", "ts", "val"]).sort_values("ts", kind="stable")
    mp = pd.merge_asof(
        lp, rp, on="ts", by="k", direction="backward",
        tolerance=None if tol is None else pd.Timedelta(seconds=tol),
    )
    want = Counter(
        (int(r.k), r.ts.to_pydatetime(), None if pd.isna(r.val) else int(r.val))
        for r in mp.itertuples()
    )
    assert got == want


_iv = st.tuples(st.integers(0, 40), st.integers(0, 25))  # (start s, length s)


@given(st.lists(_iv, min_size=1, max_size=12),
       st.lists(_iv, min_size=1, max_size=12),
       st.booleans())
@settings(max_examples=8, deadline=None)
def test_overlap_join_matches_bruteforce(spark, raw_l, raw_r, strict):
    """overlap_join's equi-bucket + meet-trick plan ≡ the O(n·m) python
    definition of interval intersection, exactly once per pair, for
    strict and touching-inclusive modes, across bucket boundaries."""
    from pdf_table_extractor_spark.operators.intervals import overlap_join

    def ts(s):
        return _EPOCH + dt.timedelta(seconds=s)

    lrows = [(i, ts(s), ts(s + n)) for i, (s, n) in enumerate(raw_l)]
    rrows = [(j, ts(s), ts(s + n)) for j, (s, n) in enumerate(raw_r)]
    lf = spark.createDataFrame(lrows, "lid int, ls timestamp, le timestamp")
    rf = spark.createDataFrame(rrows, "rid int, rs timestamp, re timestamp")
    out = overlap_join(
        lf, rf, "ls", "le", "rs", "re", bucket_s=7, strict=strict
    ).collect()
    got = sorted((r["lid"], r["rid"]) for r in out)
    assert len(got) == len(set(got))  # meet trick: exactly once per pair
    want = sorted(
        (i, j)
        for i, ls, le in lrows
        for j, rs, re in rrows
        if ((ls < re and rs < le) if strict else (ls <= re and rs <= le))
    )
    assert got == want


@given(st.lists(st.tuples(st.integers(0, 1), st.integers(0, 40)),
                min_size=1, max_size=15),
       st.lists(st.tuples(st.integers(0, 1), _iv), min_size=1, max_size=10),
       st.sampled_from(["inner", "left_semi", "left_anti"]))
@settings(max_examples=8, deadline=None)
def test_interval_join_matches_bruteforce(spark, raw_pt, raw_iv, how):
    """interval_join (point-in-interval, key-scoped, both-inclusive) ≡
    brute-force containment for inner/semi/anti forms."""
    from pdf_table_extractor_spark.operators.intervals import interval_join

    def ts(s):
        return _EPOCH + dt.timedelta(seconds=s)

    pts = [(i, k, ts(s)) for i, (k, s) in enumerate(raw_pt)]
    ivs = [(j, k, ts(s), ts(s + n)) for j, (k, (s, n)) in enumerate(raw_iv)]
    pf = spark.createDataFrame(pts, "pid int, k int, pts timestamp")
    vf = spark.createDataFrame(ivs, "iid int, k int, ivs timestamp, ive timestamp")
    out = interval_join(
        pf, vf, "pts", "ivs", "ive",
        bucket_s=7, key_cols=["k"], how=how,
    ).collect()
    matches = {
        (i, j)
        for i, pk, pt in pts
        for j, ik, s, e in ivs
        if pk == ik and s <= pt <= e
    }
    if how == "inner":
        assert sorted((r["pid"], r["iid"]) for r in out) == sorted(matches)
    else:
        in_any = {i for i, _ in matches}
        want = in_any if how == "left_semi" else {p[0] for p in pts} - in_any
        assert sorted(r["pid"] for r in out) == sorted(want)


# ---------------------------------------------------------------------------
# content-defined chunking ≡ pure-python gear replay (random texts,
# whole batch in ONE Spark job)
# ---------------------------------------------------------------------------


def _py_cdc(text: str, window: int = 8, mask_bits: int = 5) -> list[tuple[str, int]]:
    import hashlib

    canon = " ".join(text.lower().split())
    n = len(canon)
    ends = [
        i
        for i in range(window, n + 1)
        if int(
            hashlib.md5(canon[i - window : i].encode()).hexdigest()[:8], 16
        ) % (1 << mask_bits) == 0
    ]
    if not ends or ends[-1] != n:
        ends.append(n)
    bounds = [0] + ends
    return [
        (hashlib.md5(canon[a:b].encode()).hexdigest(), b - a)
        for a, b in zip(bounds, bounds[1:])
        if b > a
    ]


@given(
    st.lists(
        st.text(alphabet="ab cé.!\n\t", min_size=0, max_size=400),
        min_size=1,
        max_size=12,
    )
)
@SET
def test_cdc_chunks_match_python_gear_on_random_texts(spark, texts):
    from pdf_table_extractor_spark.operators import dedup

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got: dict[int, list[tuple[int, str, int]]] = {}
    for r in dedup.cdc_chunks(df).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_md5"], r["chunk_len"])
        )
    for i, t in enumerate(texts):
        exp = _py_cdc(t)
        have = [(m, ln) for _, m, ln in sorted(got.get(i, []))]
        assert have == exp, f"doc {i!r} {t!r}"


# ---------------------------------------------------------------------------
# Round-5 text repairs: structure-preservation + idempotence properties
# ---------------------------------------------------------------------------

_plain_word = st.text(
    alphabet="abcdefgxyz", min_size=1, max_size=8
)
_ws_run = st.text(alphabet=" \t\n", min_size=1, max_size=3)


@given(st.lists(st.tuples(_plain_word, _ws_run), min_size=1, max_size=25))
@SET
def test_homoglyph_fold_roundtrips_clean_text(spark, parts):
    """Text with no homoglyphs must survive BYTE-IDENTICALLY, whatever
    its whitespace structure (the round-4 ADVICE regression: the old
    split/join silently normalized newlines/tabs/space runs)."""
    from pdf_table_extractor_spark.functions import textops

    text = "".join(w + ws for w, ws in parts)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    (r,) = textops.homoglyph_stats(df).collect()
    assert r["folded_text"] == text
    assert r["n_mixed_words"] == 0


@given(st.lists(st.tuples(_plain_word, _ws_run), min_size=1, max_size=20),
       st.integers(min_value=0, max_value=5))
@SET
def test_homoglyph_fold_idempotent_with_mixed_words(spark, parts, n_mixed):
    """Folding twice equals folding once, and the fold only rewrites
    mixed-script tokens."""
    from pdf_table_extractor_spark.functions import textops

    pieces = [w + ws for w, ws in parts]
    for i in range(min(n_mixed, len(pieces))):
        pieces[i] = "wеb" + str(i) + " "  # Cyrillic е inside Latin
    text = "".join(pieces)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    (once,) = textops.homoglyph_stats(df).collect()
    df2 = spark.createDataFrame(
        [(1, once["folded_text"])], "doc_id long, text string"
    )
    (twice,) = textops.homoglyph_stats(df2).collect()
    assert twice["folded_text"] == once["folded_text"]
    assert twice["n_mixed_words"] == 0


@given(st.lists(st.tuples(_plain_word, _plain_word), min_size=1, max_size=12),
       st.booleans())
@SET
def test_dehyphenate_idempotent_and_join_correct(spark, pairs, compound):
    """dehyphenate(dehyphenate(x)) == dehyphenate(x), and each broken
    pair repairs to the expected join (plain pairs lose the hyphen,
    compound-marked fragments keep it)."""
    from pdf_table_extractor_spark.functions import textops

    frags = []
    expected = []
    for a, b in pairs:
        if compound:
            frags.append(f"{a}-of-{b}-\nend")
            expected.append(f"{a}-of-{b}-end")
        else:
            frags.append(f"{a}-\n{b}")
            expected.append(f"{a}{b}")
    text = " ".join(frags)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    (r1,) = df.select(textops.dehyphenate(F.col("text")).alias("d")).collect()
    assert r1["d"] == " ".join(expected)
    df2 = spark.createDataFrame([(1, r1["d"])], "doc_id long, text string")
    (r2,) = df2.select(textops.dehyphenate(F.col("text")).alias("d")).collect()
    assert r2["d"] == r1["d"]
