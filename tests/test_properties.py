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
