"""C4 line/page cleaning: parity with a pure-python transcription of
the published rule chain, and plan hygiene (no shuffle, no UDF)."""

from __future__ import annotations

import random
import re

from pyspark.sql import Row

from pdf_table_extractor_spark.operators import textquality


def _ref_clean(text, *, min_words=5, min_sent=3, max_word_length=1000):
    """Sequential transcription of the published clean_page chain
    (strip; too-long-word -> LINE drop, pre-citation-sub, per TFDS
    line_has_too_long_word; citation sub; end-mark/ellipsis; min words;
    lorem -> page; javascript -> line; { -> page; policy -> line;
    sentence page gate). Returns (clean_text_or_None, n_kept, n_sent)."""
    kept, n_sent = [], 0
    for line in text.split("\n"):
        line = line.strip()
        if any(len(w) > max_word_length for w in line.split()):
            continue
        line = re.sub(r"\[\d*\]|\[edit\]|\[citation needed\]", "", line)
        if not re.search(r'[.?!"]$', line) or line.endswith("..."):
            continue
        if len(line.split()) < min_words:
            continue
        ll = line.lower()
        if "lorem ipsum" in ll:
            return None, 0, 0
        if "javascript" in ll:
            continue
        if "{" in line:
            return None, 0, 0
        if any(p in ll for p in textquality.C4_POLICY_SUBSTRINGS):
            continue
        n_sent += len(re.findall(r"[.?!]", line))
        kept.append(line)
    if n_sent < min_sent:
        return None, 0, 0
    return "\n".join(kept), len(kept), n_sent


_WORDS = ["the", "scan", "works", "well", "for", "large", "tables", "today"]


def _gen_line(rng):
    n = rng.randrange(2, 9)
    line = " ".join(rng.choice(_WORDS) for _ in range(n))
    roll = rng.random()
    if roll < 0.1:
        line += " lorem ipsum dolor."
    elif roll < 0.2:
        line += " enable javascript first."
    elif roll < 0.3:
        line += " config { x } done."
    elif roll < 0.4:
        line += " this site uses cookies."
    elif roll < 0.5:
        line += " works fine.[1]"
    elif roll < 0.6:
        line += " trailing..."
    elif roll < 0.8:
        line += rng.choice([".", "?", "!", '"', ""])
    if rng.random() < 0.05:
        line += " " + "x" * 1200 + "."
    return line


def test_property_parity_with_reference(spark):
    rng = random.Random(7)
    docs = [
        (i, "\n".join(_gen_line(rng) for _ in range(rng.randrange(1, 10))))
        for i in range(120)
    ]
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in docs])
    got = {r["doc_id"]: r for r in textquality.c4_clean(df).collect()}
    for i, t in docs:
        want_text, want_kept, want_sent = _ref_clean(t)
        g = got[i]
        if want_text is None:
            assert not g["page_keep"], (i, t, dict(g.asDict()))
            assert g["clean_text"] == "" and g["n_kept"] == 0
        else:
            assert g["page_keep"], (i, t)
            assert g["clean_text"] == want_text
            assert g["n_kept"] == want_kept
            assert g["n_sentences"] == want_sent


def test_no_shuffle_no_python(spark):
    df = spark.createDataFrame([Row(doc_id=0, text="a.\nb.")])
    plan = textquality.c4_clean(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan
