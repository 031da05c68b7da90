"""In-repo training (operators/training.py): the learned artifacts.

Properties verified:
- train_lang_markers matches an independent pandas re-derivation on a
  labeled fixture where the right answer is known by construction;
- the exact histogram prefilter returns byte-identical rows to the
  unfiltered top-k (two-phase exactness) and the plan keeps the ranking
  window off the corpus-scale candidate set;
- train_linear_quality's gradient ascent actually LEARNS: on a linearly
  separable label the trained weights beat the zero-weight majority
  baseline through the unchanged linear_quality inference seam;
- the trajectory is deterministic under repartitioning (engine-rounded
  updates kill float sum-order noise).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_table_extractor_spark.operators import textquality, training


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _labeled_docs(spark):
    # 40 docs, 2 langs; 'aa' saturates lang a, 'bb' saturates lang b,
    # 'cc' is uniform background (fails the lift test everywhere).
    rows = []
    for i in range(40):
        lang = "a" if i % 2 == 0 else "b"
        marker = "aa" if lang == "a" else "bb"
        # every doc has the background token; most docs carry their marker
        toks = ["cc", marker] if i % 10 != 9 else ["cc"]
        rows.append((i, lang, " ".join(toks)))
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_train_lang_markers_learns_the_planted_markers(spark):
    out = training.train_lang_markers(_labeled_docs(spark), k=2)
    got = {(r.lang, r.rank): r.token for r in out.collect()}
    # the planted marker is each language's top token; the uniform
    # background token 'cc' (lift == 1.0, not > 1.0) never qualifies
    assert got[("a", 1)] == "aa"
    assert got[("b", 1)] == "bb"
    assert "cc" not in {r.token for r in out.collect()}


def test_train_lang_markers_prefilter_is_exact(spark):
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("L"), (F.col("id") % 3).cast("string")).alias("lang"),
        # Zipfish vocabulary: token j appears in docs where id % (j+2) == 0
        F.concat_ws(
            " ",
            *[
                F.when((F.col("id") % (j + 2)) == 0, F.lit(f"t{j}")).otherwise(
                    F.lit("")
                )
                for j in range(12)
            ],
        ).alias("text"),
    )
    fast = training.train_lang_markers(docs, k=3, prefilter=True)
    slow = training.train_lang_markers(docs, k=3, prefilter=False)
    assert _rows(fast) == _rows(slow)
    assert fast.count() > 0


def test_train_linear_quality_learns_a_separable_label(spark):
    # label is a threshold on the features themselves → linearly separable;
    # stopword count varies per doc against a fixed filler so stop_ratio
    # and len_score both move and the label splits ~70/30
    docs = spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.concat(
                F.array_repeat(F.lit("the"), (F.col("id") % 40 + 1).cast("int")),
                F.array_repeat(F.lit("zz"), 20),
            ),
        ).alias("text"),
    )
    label = F.round(textquality.quality_score_expr(F.col("text")), 6) >= 0.55
    w = training.train_linear_quality(docs, label, iters=30, lr=4.0)
    assert set(w) == set(training.QUALITY_FEATURES)
    scored = textquality.linear_quality(docs, weights=w)
    labeled = docs.select(
        "doc_id", label.alias("y")
    ).join(scored, "doc_id")
    n = labeled.count()
    acc = labeled.filter(F.col("keep") == F.col("y")).count() / n
    base = labeled.filter(F.col("y")).count() / n  # majority class share
    assert acc > max(base, 1 - base) + 0.05, (acc, base)


def test_train_linear_quality_is_partitioning_invariant(spark):
    docs = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ", F.array_repeat(F.lit("data"), (F.col("id") % 25 + 1).cast("int"))
        ).alias("text"),
    )
    label = (F.col("doc_id") % 3) == 0
    w1 = training.train_linear_quality(docs, label, iters=6)
    w2 = training.train_linear_quality(docs.repartition(7), label, iters=6)
    assert w1 == w2


def _dsir_expected(
    raw_texts: dict[int, str], tgt_texts: dict[int, str], B: int
):
    """Pure-python DSIR reimplementation (hashlib md5, no engine code).
    Raw and target are independent corpora — the target need not be a
    subset of raw."""
    import hashlib
    import math

    def buckets(text: str) -> list[int]:
        toks = text.lower().split()
        feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        return [
            int(hashlib.md5(("dsir" + f).encode()).hexdigest()[:8], 16) % B
            for f in feats
        ]

    cr: dict[int, int] = {}
    ct: dict[int, int] = {}
    per_doc = {i: buckets(t) for i, t in raw_texts.items()}
    for bks in per_doc.values():
        for bk in bks:
            cr[bk] = cr.get(bk, 0) + 1
    for t in tgt_texts.values():
        for bk in buckets(t):
            ct[bk] = ct.get(bk, 0) + 1
    tr, tt = sum(cr.values()), sum(ct.values())
    out = {}
    for i, bks in per_doc.items():
        lw = sum(
            math.log((ct.get(bk, 0) + 1) / (tt + B))
            - math.log((cr[bk] + 1) / (tr + B))
            for bk in bks
        )
        out[i] = (len(bks), round(lw, 4))
    return out


def test_dsir_log_weights_match_python(spark):
    texts = {
        0: "the cat sat on the mat and the dog ran fast",
        1: "the quick brown fox jumps over the lazy dog",
        2: "o gato sentou no tapete e o extrato chegou",
        3: "uma mesa grande para o saldo da conta",
        4: "the data value order key fast slow and of the",
        5: "saldo extrato conta agencia valor documento",
    }
    en_ids = {0, 1, 4}
    B = 64
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    target = docs.where(F.col("doc_id").isin(list(en_ids)))
    got = {
        r["doc_id"]: (r["n_feats"], r["log_w"])
        for r in training.dsir_log_weights(docs, target, n_buckets=B).collect()
    }
    assert got == _dsir_expected(texts, {i: texts[i] for i in en_ids}, B)
    # target-like docs must outscore non-target docs
    en_min = min(got[i][1] for i in en_ids)
    pt_max = max(got[i][1] for i in texts if i not in en_ids)
    assert en_min > pt_max


def test_dsir_target_disjoint_from_raw(spark):
    # the target corpus hits buckets NO raw doc hits: tt must still count
    # that mass (a left-joined total silently shrank it — regression)
    raw_texts = {0: "aa bb aa", 1: "cc dd", 2: "aa cc"}
    tgt_texts = {100: "zz yy zz qq", 101: "aa zz"}
    B = 32
    raw = spark.createDataFrame(
        list(raw_texts.items()), "doc_id long, text string"
    )
    tgt = spark.createDataFrame(
        list(tgt_texts.items()), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_feats"], r["log_w"])
        for r in training.dsir_log_weights(raw, tgt, n_buckets=B).collect()
    }
    assert got == _dsir_expected(raw_texts, tgt_texts, B)


# ---------------------------------------------------------------------------
# BPE subword training
# ---------------------------------------------------------------------------


def _py_bpe(texts: list[str], k: int):
    """Independent pure-python BPE (Sennrich et al. pseudo-code): pair
    counts over the word-freq vocab, (count DESC, pair ASC) argmax,
    greedy left-to-right non-overlapping merge."""
    import collections
    import re

    freq = collections.Counter()
    for t in texts:
        for w in re.sub(r"\s+", " ", t.lower()).strip().split(" "):
            if w:
                freq[w] += 1
    vocab = {tuple(list(w) + ["</w>"]): c for w, c in freq.items()}
    merges = []
    for i in range(k):
        pairs = collections.Counter()
        for syms, c in vocab.items():
            for j in range(len(syms) - 1):
                pairs[(syms[j], syms[j + 1])] += c
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((i + 1, a, b, cnt))
        new = {}
        for syms, c in vocab.items():
            out, j = [], 0
            while j < len(syms):
                if j < len(syms) - 1 and syms[j] == a and syms[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            new[tuple(out)] = new.get(tuple(out), 0) + c
        vocab = new
    return merges, vocab


def _bpe_docs(spark):
    # exercises the nasty cases: overlapping pairs ('aaaa' -> (a,a)
    # counted 3x but merged non-overlapping into 'aa aa'), single-char
    # words (symbol string = char + marker only), pair-count ties
    # (broken on pair string), and merged symbols that later merge again.
    texts = [
        "aaaa aaaa aa a banana bandana",
        "banana banana band and sand a",
        "aaaa nan ban b an na a aa",
    ]
    return (
        spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        ),
        texts,
    )


def test_bpe_merges_match_independent_python(spark):
    df, texts = _bpe_docs(spark)
    k = 8
    got = [
        (m["merge_no"], m["left"], m["right"], m["pair_freq"])
        for m in training.bpe_merges(df, k)
    ]
    want, _ = _py_bpe(texts, k)
    assert got == want


def test_bpe_encode_counts_match_independent_python(spark):
    df, texts = _bpe_docs(spark)
    k = 5
    merges = training.bpe_merges(df, k)
    _, vocab = _py_bpe(texts, k)
    n_sub = {"".join(s).replace("</w>", ""): len(s) for s in vocab}
    got = {
        r["doc_id"]: (r["n_words"], r["n_subwords"])
        for r in training.bpe_encode_counts(df, merges).collect()
    }
    want = {}
    for i, t in enumerate(texts):
        ws = [w for w in t.lower().split() if w]
        want[i] = (len(ws), sum(n_sub[w] for w in ws))
    assert got == want


def test_bpe_training_deterministic_under_repartition(spark):
    df, _ = _bpe_docs(spark)
    a = training.bpe_merges(df, 6)
    b = training.bpe_merges(df.repartition(7), 6)
    assert a == b


def test_token_fertility_hand_corpus(spark):
    """Hand-checkable: tiny corpus with a supplied 1-merge vocabulary."""
    from pdf_table_extractor_spark.operators import training

    df = spark.createDataFrame(
        [(1, "aa b", "x"), (2, "aa aa", "x"), (3, "b", "y")],
        "doc_id long, text string, lang string",
    )
    merges = training.bpe_merges(df, 1)
    out = {r["slice"]: r for r in training.token_fertility(df, merges, bpe_k=1).collect()}
    # merge 1 fuses the most frequent pair inside 'aa<end>' chain;
    # whatever it is, totals must be consistent:
    x = out["x"]
    assert x["n_docs"] == 2 and x["n_words"] == 4
    assert x["fertility"] == round(x["n_subwords"] / x["n_words"], 6)
    assert x["n_bytes"] == 4 + 5  # 'aa b' + 'aa aa'
    y = out["y"]
    assert y["n_words"] == 1 and y["n_bytes"] == 1
    # single-char word 'b' + end marker, one merge may fuse it -> 1 or 2
    assert y["n_subwords"] in (1, 2)
