"""Unigram-LM tokenizer (training.unigram_*): parity with a pure-python
transcription of the hard-EM spec (Viterbi DP incl. the exact tie-break
the SQL oracle replays), plus end-to-end trainer equality on a fixed
corpus and plan hygiene (no corpus re-scan per round)."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from pdf_table_extractor_spark.operators import training


# ---------------------------------------------------------------------------
# Pure-python reference (independent of the engine)
# ---------------------------------------------------------------------------


def _ref_viterbi(w: str, logp: dict[str, float], max_len: int) -> list[str]:
    """DP with the engine's exact candidate key: (cost ASC, s-i
    [neg length] ASC, piece ASC); positions 0-based here."""
    m = len(w)
    dp: list[tuple[float, str, int]] = [(0.0, "", 0)]
    for i in range(1, m + 1):
        cands = []
        for s0 in range(max(0, i - max_len), i):
            p = w[s0:i]
            if p in logp:
                cands.append((dp[s0][0] + (-logp[p]), s0 - i, p, s0))
        cost, _nl, p, s0 = min(cands)
        dp.append((cost, p, s0))
    out: list[str] = []
    pos = m
    while pos > 0:
        _, p, s0 = dp[pos]
        out.append(p)
        pos = s0
    return list(reversed(out))


def _ref_train(word_freqs, *, max_len, seed_size, rounds, vocab_size=None,
               round_to=6):
    def rnd(x):  # HALF_UP like Spark round(), not python banker's
        q = 10 ** round_to
        return math.floor(x * q + 0.5) / q if x >= 0 else -math.floor(-x * q + 0.5) / q

    occ: dict[str, int] = {}
    for w, f in word_freqs.items():
        for s in range(len(w)):
            for l in range(1, min(max_len, len(w) - s) + 1):
                p = w[s : s + l]
                occ[p] = occ.get(p, 0) + f
    chars = sorted({c for w in word_freqs for c in w})
    multi = sorted((p for p in occ if len(p) > 1), key=lambda p: (-occ[p], p))
    sel = {p: occ[p] for p in chars}
    sel.update({p: occ[p] for p in multi[:seed_size]})
    tot = sum(sel.values())
    logp = {p: rnd(math.log(c / tot)) for p, c in sel.items()}
    cnts = dict(sel)
    for _ in range(rounds):
        counts: dict[str, int] = {}
        for w, f in word_freqs.items():
            for p in _ref_viterbi(w, logp, max_len):
                counts[p] = counts.get(p, 0) + f
        for ch in chars:
            counts[ch] = counts.get(ch, 0) + 1
        counts = {p: c for p, c in counts.items() if c > 0}
        tot = sum(counts.values())
        logp = {p: rnd(math.log(c / tot)) for p, c in counts.items()}
        cnts = counts
    if vocab_size is not None:
        keep_multi = sorted(
            (p for p in cnts if len(p) > 1), key=lambda p: (-cnts[p], p)
        )[: vocab_size - len(chars)]
        keep = set(chars) | set(keep_multi)
        cnts = {p: c for p, c in cnts.items() if p in keep}
        logp = {p: v for p, v in logp.items() if p in keep}
    return cnts, logp


# ---------------------------------------------------------------------------


def test_viterbi_property_parity(spark):
    """Random piece tables (decimal logp — identical doubles in both
    engines) + random words: segmentation matches the python DP, tie
    cases included."""
    rng = random.Random(11)
    alphabet = "abc"
    for trial in range(6):
        words = {}
        for _ in range(12):
            w = "".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 9)))
            words[w] = words.get(w, 0) + rng.randrange(1, 4)
        pieces = {c: -round(rng.randrange(1, 2000) / 1000, 3) for c in alphabet}
        for _ in range(8):
            n = rng.randrange(2, 4)
            p = "".join(rng.choice(alphabet) for _ in range(n))
            pieces[p] = -round(rng.randrange(1, 2000) / 1000, 3)
        pdf = spark.createDataFrame(
            [(p, lp) for p, lp in pieces.items()], "piece string, logp double"
        )
        wdf = spark.createDataFrame(
            [(w, f) for w, f in words.items()], "w string, freq long"
        )
        got = {
            r["w"]: list(r["seg"])
            for r in training.unigram_viterbi(wdf, pdf, max_len=3).collect()
        }
        for w in words:
            assert got[w] == _ref_viterbi(w, pieces, 3), (trial, w, got[w])
            assert "".join(got[w]) == w


def test_trainer_matches_python_replay(spark):
    docs = [
        (1, "banana bandana ban nab"),
        (2, "banana nab nab banana anna"),
        (3, "anna banda and and ban"),
        (4, "b an d banana bandana"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    wf = {}
    for _, t in docs:
        for w in t.split():
            wf[w] = wf.get(w, 0) + 1
    want_cnts, want_logp = _ref_train(
        wf, max_len=3, seed_size=5, rounds=2, vocab_size=len(set("".join(wf))) + 3
    )
    got = {
        r["piece"]: (r["cnt"], r["logp"])
        for r in training.unigram_train(
            df, max_len=3, seed_size=5, rounds=2,
            vocab_size=len(set("".join(wf))) + 3,
        ).collect()
    }
    assert set(got) == set(want_cnts)
    for p in want_cnts:
        assert got[p][0] == want_cnts[p], (p, got[p], want_cnts[p])
        assert abs(got[p][1] - want_logp[p]) < 1e-9, (p, got[p], want_logp[p])


def test_encode_counts_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, "banana ban"), (2, "nab anna")], "doc_id long, text string"
    )
    pieces = training.unigram_train(df, max_len=3, seed_size=4, rounds=1)
    got = {
        r["doc_id"]: (r["n_words"], r["n_pieces"])
        for r in training.unigram_encode_counts(df, pieces, max_len=3).collect()
    }
    assert got[1][0] == 2 and got[2][0] == 2
    # every word segments into at least one piece, at most its char count
    assert 2 <= got[1][1] <= len("bananaban")
    assert 2 <= got[2][1] <= len("nabanna")


def test_trainer_touches_corpus_once(spark):
    """Plan hygiene: the EM loop runs at vocabulary scale — the corpus
    relation appears in the word-frequency aggregate only, and each
    round's piece table is checkpoint-truncated (no nested plans)."""
    df = spark.createDataFrame([(1, "aa ab")], "doc_id long, text string")
    pieces = training.unigram_train(df, max_len=2, seed_size=2, rounds=2)
    # localCheckpoint truncation: the final plan must not reference the
    # original corpus scan at all
    plan = pieces._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan or "Scan" not in plan, plan


def test_encode_unknown_chars_fall_back_to_unk(spark):
    """Encoding NEW text with characters the training corpus never saw:
    every word still segments (single-char unk fallback) and keeps its
    row in the accounting — the strict no-unk path would silently drop
    words with uncovered positions."""
    train = spark.createDataFrame([(1, "banana ban")], "doc_id long, text string")
    pieces = training.unigram_train(train, max_len=3, seed_size=4, rounds=1)
    new = spark.createDataFrame(
        [(7, "banana zzq bxn")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_words"], r["n_pieces"])
        for r in training.unigram_encode_counts(new, pieces, max_len=3).collect()
    }
    # all 3 words counted; zzq segments as 3 unks, bxn as b + 2 unks
    assert got[7][0] == 3
    assert got[7][1] >= 2 + 3 + 3
    # direct viterbi check: unk pieces are the unknown single chars
    wdf = spark.createDataFrame([("zq", 1)], "w string, freq long")
    (row,) = training.unigram_viterbi(
        wdf, pieces.select("piece", "logp"), max_len=3, unk_logp=-20.0
    ).collect()
    assert list(row["seg"]) == ["z", "q"]
