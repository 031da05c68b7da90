"""jusText classifier: parity with an independent pure-python
transcription of the published algorithm (context-free chain + all
FOUR revision passes, including the sequential cursor semantics the
window version must reproduce), plus plan shape (one exchange)."""

from __future__ import annotations

import random

from pyspark.sql import Row
from pyspark.sql import functions as F

from pdf_table_extractor_spark.operators import justext

STOP = ["the", "a", "of", "and", "to"]


# ---------------------------------------------------------------------------
# Independent reference: literal transcription of justext.core's
# classify_paragraphs / revise_paragraph_classification control flow
# (sequential cursor scans, in-place neargood updates) — no Spark, no
# engine imports.
# ---------------------------------------------------------------------------


def _ref_cf(text, is_heading, *, length_low=70, length_high=200,
            stopwords_low=0.30, stopwords_high=0.32, max_link_density=0.2):
    import re

    length = len(text)
    words = text.lower().split()
    n_stop = sum(1 for w in words if w in STOP)
    stop_density = n_stop / len(words) if words else 0.0
    link_chars = sum(len(m) for m in re.findall(r"https?://\S+", text))
    link_density = link_chars / length if length else 0.0
    if link_density > max_link_density:
        return "bad"
    if "©" in text or "&copy" in text:
        return "bad"
    if length < length_low:
        return "bad" if link_chars > 0 else "short"
    if stop_density >= stopwords_high:
        return "good" if length > length_high else "neargood"
    if stop_density >= stopwords_low:
        return "neargood"
    return "bad"


def _neighbour(i, classes, ignore_neargood, inc, boundary):
    while i + inc != boundary:
        i += inc
        c = classes[i]
        if c in ("good", "bad"):
            return c
        if c == "neargood" and not ignore_neargood:
            return c
    return "bad"


def _ref_revise(texts, headings, cf, *, max_heading_distance=200):
    classes = list(cf)
    n = len(classes)
    # heading promotion (sequential, as published)
    for i in range(n):
        if not (headings[i] and classes[i] == "short"):
            continue
        j, dist = i + 1, 0
        while j < n and dist <= max_heading_distance:
            if classes[j] == "good":
                classes[i] = "neargood"
                break
            dist += len(texts[j])
            j += 1
    # shorts: snapshot semantics via new_classes dict
    new = {}
    for i in range(n):
        if classes[i] != "short":
            continue
        prev = _neighbour(i, classes, True, -1, -1)
        nxt = _neighbour(i, classes, True, 1, n)
        pair = {prev, nxt}
        if pair == {"good"}:
            new[i] = "good"
        elif pair == {"bad"}:
            new[i] = "bad"
        elif (prev == "bad" and _neighbour(i, classes, False, -1, -1) == "neargood") or (
            nxt == "bad" and _neighbour(i, classes, False, 1, n) == "neargood"
        ):
            new[i] = "good"
        else:
            new[i] = "bad"
    for i, c in new.items():
        classes[i] = c
    # neargoods: in-place, as published
    for i in range(n):
        if classes[i] != "neargood":
            continue
        prev = _neighbour(i, classes, True, -1, -1)
        nxt = _neighbour(i, classes, True, 1, n)
        classes[i] = "bad" if (prev, nxt) == ("bad", "bad") else "good"
    # more good headings: in-place forward scan, as published (4th pass)
    for i in range(n):
        if not (headings[i] and classes[i] == "bad" and cf[i] != "bad"):
            continue
        j, dist = i + 1, 0
        while j < n and dist <= max_heading_distance:
            if classes[j] == "good":
                classes[i] = "good"
                break
            dist += len(texts[j])
            j += 1
    return classes


def _spark_classes(spark, pages):
    rows = [
        Row(url=u, block_idx=i, block_text=t, heading=h)
        for u, blocks in pages.items()
        for i, (t, h) in enumerate(blocks)
    ]
    df = spark.createDataFrame(rows)
    labeled = justext.revise_classification(
        justext.classify_context_free(
            justext.paragraph_features(
                df, stoplist=STOP, heading_col="heading"
            )
        )
    )
    out = {}
    for r in labeled.collect():
        out.setdefault(r["url"], {})[r["block_idx"]] = (r["cf_class"], r["cls"])
    return out


def _gen_block(rng):
    """Random paragraph hitting every rule branch with fair odds."""
    n = rng.choice([2, 6, 14, 30, 55])
    words = [rng.choice(STOP) if rng.random() < rng.choice([0.1, 0.31, 0.5])
             else rng.choice(["spark", "scan", "join", "merge", "column"])
             for _ in range(n)]
    text = " ".join(words)
    roll = rng.random()
    if roll < 0.12:
        text += " https://ex.com/" + "x" * rng.randrange(1, 60)
    elif roll < 0.18:
        text += " © acme"
    heading = rng.random() < 0.2
    return text, heading


def test_property_parity_with_reference(spark):
    rng = random.Random(42)
    pages = {
        f"u{p}": [_gen_block(rng) for _ in range(rng.randrange(1, 12))]
        for p in range(60)
    }
    got = _spark_classes(spark, pages)
    for u, blocks in pages.items():
        texts = [t for t, _ in blocks]
        heads = [h for _, h in blocks]
        cf = [_ref_cf(t, h) for t, h in blocks]
        want = _ref_revise(texts, heads, cf)
        for i in range(len(blocks)):
            assert got[u][i][0] == cf[i], (u, i, texts[i])
            assert got[u][i][1] == want[i], (u, i, cf, want, [got[u][j] for j in range(len(blocks))])


def test_heading_promotion_distance_boundary(spark):
    # Heading short, then SHORT-class fillers (they don't block the
    # neighbour scans) summing to exactly max_heading_distance chars,
    # then a good: the distance check is <=, so promoted (and the
    # promoted neargood resolves good); one char more and the heading
    # stays short and resolves bad.
    good = ("the a of and to " * 20).strip()  # stop-dense, >200 chars
    assert _ref_cf(good, False) == "good"
    for lens, want in [((66, 67, 67), "good"), ((67, 67, 67), "bad")]:
        fillers = [("y " * 40)[:n] for n in lens]
        assert all(_ref_cf(f, False) == "short" for f in fillers)
        blocks = [("short head", True)] + [(f, False) for f in fillers] + [
            (good, False)
        ]
        pages = {"u": blocks}
        got = _spark_classes(spark, pages)
        texts = [t for t, _ in blocks]
        heads = [h for _, h in blocks]
        ref = _ref_revise(texts, heads, [_ref_cf(t, h) for t, h in blocks])
        assert ref[0] == want, (lens, ref)
        for i in range(len(blocks)):
            assert got["u"][i][1] == ref[i], (lens, i, ref, got)


def test_more_good_headings_repromotion(spark):
    # Pass 4 ("more good headings"): a heading that ends BAD after the
    # first three passes flips to good when a paragraph that BECAME good
    # during revision sits within max_heading_distance. Setup: heading
    # short -> bad filler -> neargood -> good. Pass 1 can't promote (the
    # nearest cf-good is 244 chars away); pass 2 resolves the heading
    # bad (both decisive neighbours bad); pass 3 promotes the neargood
    # to good; pass 4 then sees that NEW good at filler-length distance.
    head = "intro head"
    neargood = ("the a of and to " * 9).strip()  # 143 ch, stop-dense
    good = ("the a of and to " * 20).strip()
    assert _ref_cf(head, True) == "short"
    assert _ref_cf(neargood, False) == "neargood"
    assert _ref_cf(good, False) == "good"
    for fill_len, want in [(100, "good"), (201, "bad")]:
        filler = ("y " * 110)[:fill_len]
        assert _ref_cf(filler, False) == "bad"
        blocks = [(head, True), (filler, False), (neargood, False), (good, False)]
        texts = [t for t, _ in blocks]
        heads = [h for _, h in blocks]
        ref = _ref_revise(texts, heads, [_ref_cf(t, h) for t, h in blocks])
        assert ref == [want, "bad", "good", "good"], (fill_len, ref)
        got = _spark_classes(spark, {"u": blocks})
        for i in range(len(blocks)):
            assert got["u"][i][1] == ref[i], (fill_len, i, ref, got)


def test_all_boilerplate_page_still_emits_row(spark):
    df = spark.createDataFrame(
        [Row(url="u", block_idx=0, block_text="x y")]
    )
    labeled = justext.revise_classification(
        justext.classify_context_free(
            justext.paragraph_features(df, stoplist=STOP)
        )
    )
    out = justext.justext_main(labeled).collect()
    assert len(out) == 1 and out[0]["main_text"] == "" and out[0]["n_good_blocks"] == 0


def test_single_exchange_plan(spark):
    df = spark.createDataFrame(
        [Row(url="u", block_idx=0, block_text="x")]
    )
    labeled = justext.revise_classification(
        justext.classify_context_free(
            justext.paragraph_features(df, stoplist=STOP)
        )
    )
    plan = justext_plan = labeled._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
