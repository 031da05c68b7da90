"""Line extraction: text-layer split and layout-aware line assembly.

Two producers of the ``lines`` relation (D2 in SURVEY §1.1):

- `text_lines`: the `page.extract_text().split('\\n')` path every text
  profile uses (conversor_bradesco.py:23-26 et al.) — posexplode with a
  deterministic in-doc `line_no` (never monotonically_increasing_id, which
  breaks retry determinism).
- `layout_lines`: the positioned-word path (conversor_banestes.py:40-57) —
  y-cluster words into lines (`round(top)` buckets), x-sort within a line,
  and concatenate per configured x-zone. Pure builtins: groupBy +
  sort_array(collect_list(struct)) + higher-order array functions — no
  Python in the hot path at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pdf_table_extractor_spark.operators.blocks import parse_blocks


def text_lines(pages: DataFrame) -> DataFrame:
    """pages(url, text, ...) → (url, line_no, line); line_no is 0-based."""
    return pages.select(
        "url", F.posexplode(F.split(F.col("text"), "\n")).alias("line_no", "line")
    )


def layout_lines(pages: DataFrame, *, packed: bool = True) -> DataFrame:
    """pages(url, html) → one row per visual line with per-zone text.

    Default zones mirror conversor_banestes.py:30-32,51-57:
      date_txt: x0 < 75 (joined with ''), desc_txt: 75 ≤ x0 ≤ 480 (joined
      with ' '), value_txt: x0 > 480 (joined with '').

    Output: (url, page_no, y, date_txt, desc_txt, value_txt).
    """
    # Parse on scan partitions (input splits balance the UDF work), THEN
    # salt-repartition: python eval nodes drop outputPartitioning, so a
    # pre-UDF repartition would be re-shuffled — placing the exchange here
    # makes it the branch's ONLY shuffle (the groupBy/window/serializer
    # keys all contain url → subset rule).
    #
    # packed=True (default, the round-5 byte diet): the exchange carries
    # one row per PAGE with parallel word arrays, exploded back AFTER the
    # shuffle on the same partitions (Generate preserves partitioning) —
    # vs word_rows' one row per WORD, which repeats the url string and the
    # per-row shuffle overhead ~83×. Measured at 100k docs: branch
    # exchange 18.1→13.5 MB / 869k→10.5k records, stage thread-time
    # ~43s→~12s (BENCH/ab_word_pages.json).
    # packed=False keeps the flat word_rows path for A/B harnesses.
    from pdf_table_extractor_spark.operators.blocks import word_pages, word_rows

    n_part = int(pages.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    if packed:
        pw = word_pages(pages).repartition(n_part, F.col("url"))
        words = pw.select(
            "url",
            "page_no",
            F.explode(F.arrays_zip("x0s", "tops", "texts")).alias("w"),
        ).select(
            "url",
            "page_no",
            # Spark round() is HALF_UP while the reference's Python round()
            # is banker's; fixture tops keep fractional parts away from .5
            # so both agree (documented divergence).
            F.round(F.col("w.tops"), 0).alias("y"),
            F.col("w.x0s").alias("x0"),
            F.col("w.texts").alias("text"),
        )
    else:
        words = word_rows(pages).repartition(n_part, F.col("url")).select(
            "url",
            "page_no",
            F.round(F.col("top"), 0).alias("y"),
            "x0",
            "text",
        )
    ws = F.array_sort(F.collect_list(F.struct("x0", "text")))
    agg = words.groupBy("url", "page_no", "y").agg(ws.alias("ws"))

    def zone(cond, sep):
        return F.array_join(
            F.transform(F.filter(F.col("ws"), cond), lambda w: w["text"]), sep
        )

    return agg.select(
        "url",
        "page_no",
        "y",
        F.trim(zone(lambda w: w["x0"] < 75, "")).alias("date_txt"),
        F.trim(zone(lambda w: (w["x0"] >= 75) & (w["x0"] <= 480), " ")).alias("desc_txt"),
        F.trim(zone(lambda w: w["x0"] > 480, "")).alias("value_txt"),
    )
