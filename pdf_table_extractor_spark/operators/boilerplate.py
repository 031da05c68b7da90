"""Boilerpipe-style boilerplate/content block classification.

North-star component (BASELINE.json): "a text/link-density boilerplate
classifier (Boilerpipe-style block scoring over a lightweight DOM-block
array)". The decision rule is the published NumWordsRulesClassifier from
Kohlschuetter, Fankhauser & Nejdl, "Boilerplate Detection using Shallow
Text Features" (WSDM 2010) and the boilerpipe OSS DefaultExtractor: each
block is scored by its own word count and link density plus the previous
and next blocks' features; missing neighbours at page boundaries behave
as empty blocks (numWords=0, linkDensity=0), matching boilerpipe's
EMPTY_START/EMPTY_END sentinels.

Everything is pure Catalyst expressions — no Python in the loop, so
features and the decision tree run at scan speed inside whole-stage
codegen. The only shuffles are the per-url neighbour window and the final
reassembly groupBy, both hash-partitioned on the same url key the
extraction pipeline already salts by, so Catalyst plans exactly ONE
exchange for classify+reassemble (asserted in tests/test_plan.py).

Generic over any block frame ``(url, block_idx, block_text)``:
``page_blocks`` derives one from a pages-style table by splitting the
text layer on blank lines; the driver contracts derive one from the
``documents`` table. ``extract_main`` is the composed
pages -> main-content convenience.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Published thresholds (NumWordsRulesClassifier; see module docstring).
_CURR_LD = 0.333333
_PREV_LD = 0.555556

#: Default anchor shape for plain-text/markdown-ish pages: bare URLs.
DEFAULT_ANCHOR = r"https?://\S+"


def page_blocks(
    pages: DataFrame,
    *,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Split a pages-style table into the DOM-block array the classifier
    scores: one row per blank-line-separated block, document order kept in
    ``block_idx``. Empty blocks are dropped (boilerpipe classifies only
    non-empty blocks; neighbours are the adjacent surviving blocks)."""
    return (
        pages.select(
            F.col(url_col).alias("url"),
            F.posexplode(F.split(F.col(text_col), r"\n{2,}")).alias(
                "block_idx", "block_text"
            ),
        )
        .where(F.trim("block_text") != "")
    )


def _num_words(text: Column) -> Column:
    squeezed = F.trim(F.regexp_replace(text, r"\s+", " "))
    return F.when(squeezed == "", F.lit(0)).otherwise(
        F.size(F.split(squeezed, " "))
    )


def block_features(
    blocks: DataFrame,
    *,
    anchor_pattern: str = DEFAULT_ANCHOR,
    url_col: str = "url",
    idx_col: str = "block_idx",
    text_col: str = "block_text",
) -> DataFrame:
    """Per-block shallow text features: ``num_words`` (whitespace tokens),
    ``anchor_words`` (tokens matching ``anchor_pattern`` — the anchor-text
    share), ``link_density`` = anchor_words / num_words."""
    text = F.col(text_col)
    anchors = F.size(F.regexp_extract_all(text, F.lit(anchor_pattern), F.lit(0)))
    out = blocks.select(
        F.col(url_col).alias("url"),
        F.col(idx_col).alias("block_idx"),
        text.alias("block_text"),
        _num_words(text).alias("num_words"),
        anchors.alias("anchor_words"),
    )
    return out.withColumn(
        "link_density",
        F.when(F.col("num_words") == 0, F.lit(0.0)).otherwise(
            F.col("anchor_words") / F.col("num_words")
        ),
    )


def classify_blocks(feats: DataFrame) -> DataFrame:
    """Label each block content/boilerplate with the published
    NumWordsRules decision tree over (prev, curr, next) features."""
    w = Window.partitionBy("url").orderBy("block_idx")
    prev_words = F.lag("num_words", 1, 0).over(w)
    next_words = F.lead("num_words", 1, 0).over(w)
    prev_ld = F.lag("link_density", 1, 0.0).over(w)

    curr_ld = F.col("link_density")
    curr_words = F.col("num_words")
    # Tree flattened to DNF (branch-for-branch equivalent to the Java
    # original — see tests/test_curation.py for the truth-table check):
    #   curr_ld > 1/3                      -> boilerplate
    #   prev_ld <= .5556: content unless curr<=16 & next<=15 & prev<=4
    #   prev_ld  > .5556: content iff curr>40 | next>17
    is_content = (curr_ld <= _CURR_LD) & (
        (
            (prev_ld <= _PREV_LD)
            & ((curr_words > 16) | (next_words > 15) | (prev_words > 4))
        )
        | ((prev_ld > _PREV_LD) & ((curr_words > 40) | (next_words > 17)))
    )
    return feats.select(
        "url",
        "block_idx",
        "block_text",
        "num_words",
        "anchor_words",
        prev_words.alias("prev_words"),
        next_words.alias("next_words"),
        is_content.alias("is_content"),
    )


def main_content(labeled: DataFrame) -> DataFrame:
    """Reassemble retained blocks into one main-content string per url
    (blocks rejoined in document order with a blank line, boilerpipe's
    plain-text rendering). Pages whose every block is boilerplate still
    emit a row (empty main_text) so downstream accounting sees them."""
    packed = F.array_sort(
        F.collect_list(
            F.when(F.col("is_content"), F.struct("block_idx", "block_text"))
        )
    )
    return labeled.groupBy("url").agg(
        F.array_join(
            F.transform(packed, lambda s: s["block_text"]), "\n\n"
        ).alias("main_text"),
        F.sum(F.col("is_content").cast("int")).alias("n_content_blocks"),
    )


def extract_main(
    pages: DataFrame,
    *,
    anchor_pattern: str = DEFAULT_ANCHOR,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """pages -> (url, main_text, n_content_blocks): the composed generic
    main-content extractor for web-style pages."""
    blocks = page_blocks(pages, url_col=url_col, text_col=text_col)
    return main_content(
        classify_blocks(block_features(blocks, anchor_pattern=anchor_pattern))
    )
