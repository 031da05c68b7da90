"""Boilerpipe-style block classifier: truth-table parity with the
published NumWordsRules tree, end-to-end page extraction, and plan shape
(pure codegen, one exchange)."""

from __future__ import annotations

import itertools

from pyspark.sql import Row
from pyspark.sql import functions as F

from pdf_table_extractor_spark.operators import boilerplate


def _java_tree(prev_words, prev_ld, curr_words, curr_ld, next_words):
    """Literal transcription of boilerpipe's NumWordsRulesClassifier
    nested-if structure (the independent reference for the flattened
    DNF in classify_blocks)."""
    if curr_ld <= 0.333333:
        if prev_ld <= 0.555556:
            if curr_words <= 16:
                if next_words <= 15:
                    return prev_words > 4
                return True
            return True
        if curr_words <= 40:
            return next_words > 17
        return True
    return False


def test_tree_truth_table(spark):
    """Every combination of feature values straddling each published
    threshold agrees with the nested-if original."""
    words_pts = [0, 4, 5, 15, 16, 17, 18, 40, 41]
    ld_pts = [0.0, 0.333333, 0.34, 0.555556, 0.56, 1.0]
    # One 3-block page per (prev, curr, next) combo; the middle block is
    # the one whose classification we check.
    cases = []
    for i, (pw, pld, cw, cld, nw) in enumerate(
        itertools.product(words_pts, ld_pts, words_pts, ld_pts, words_pts)
    ):
        if i % 7:  # keep the frame small; thresholds still fully crossed
            continue
        cases.append((i, pw, pld, cw, cld, nw))

    rows = []
    for i, pw, pld, cw, cld, nw in cases:
        rows.append(Row(url=str(i), block_idx=0, num_words=pw, anchor_words=0,
                        link_density=pld, block_text=""))
        rows.append(Row(url=str(i), block_idx=1, num_words=cw, anchor_words=0,
                        link_density=cld, block_text=""))
        rows.append(Row(url=str(i), block_idx=2, num_words=nw, anchor_words=0,
                        link_density=0.0, block_text=""))
    feats = spark.createDataFrame(rows)
    got = {
        r["url"]: r["is_content"]
        for r in boilerplate.classify_blocks(feats).where("block_idx = 1").collect()
    }
    for i, pw, pld, cw, cld, nw in cases:
        expect = _java_tree(pw, pld, cw, cld, nw)
        assert got[str(i)] == expect, (pw, pld, cw, cld, nw)


def test_boundary_blocks_use_empty_neighbours(spark):
    """First/last blocks see numWords=0 / linkDensity=0 sentinels, exactly
    boilerpipe's EMPTY_START/EMPTY_END behaviour."""
    feats = spark.createDataFrame(
        [
            Row(url="u", block_idx=0, num_words=10, anchor_words=0,
                link_density=0.0, block_text="a"),
            Row(url="u", block_idx=1, num_words=50, anchor_words=0,
                link_density=0.0, block_text="b"),
        ]
    )
    out = {r["block_idx"]: r for r in boilerplate.classify_blocks(feats).collect()}
    # Block 0: prev empty (0 words), next 50>15 -> content despite 10<=16.
    assert out[0]["prev_words"] == 0 and out[0]["is_content"]
    # Block 1: 50>16 -> content; its next_words sentinel is 0.
    assert out[1]["next_words"] == 0 and out[1]["is_content"]


def test_extract_main_end_to_end(spark):
    nav = "http://x/a http://x/b http://x/c"  # pure links -> boilerplate
    body1 = " ".join(f"w{i}" for i in range(30))  # long prose -> content
    body2 = " ".join(f"v{i}" for i in range(20))  # follows content -> content
    # A bare short block after long prose is KEPT (continuation heuristic:
    # prev_words > 4), so the rejected footer needs link density > 1/3.
    footer = "(c) http://x/legal"
    pages = spark.createDataFrame(
        [
            Row(url="p1", text=f"{nav}\n\n{body1}\n\n{body2}\n\n{footer}"),
            Row(url="p2", text=nav),  # all-boilerplate page still emits a row
            Row(url="p3", text="  \n\n  "),  # blank blocks dropped entirely
        ]
    )
    got = {r["url"]: r for r in boilerplate.extract_main(pages).collect()}
    assert got["p1"]["main_text"] == f"{body1}\n\n{body2}"
    assert got["p1"]["n_content_blocks"] == 2
    assert got["p2"]["main_text"] == "" and got["p2"]["n_content_blocks"] == 0
    assert "p3" not in got  # no non-empty blocks -> no row


def test_plan_pure_codegen_single_exchange(spark):
    """Features + tree are expression-only (no Python eval nodes) and the
    neighbour window + reassembly groupBy share one hash exchange on url."""
    pages = spark.createDataFrame([Row(url="u", text="a b c\n\nd e f")])
    plan = boilerplate.extract_main(pages)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # no ArrowEvalPython / BatchEvalPython
    assert plan.count("Exchange") == 1, plan
