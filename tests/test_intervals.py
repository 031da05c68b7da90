"""Unit tests for the equi-bucketed range join (operators/intervals.py):
hand-computed containment across bucket boundaries, inclusivity modes,
key scoping, and the malformed-interval guard."""

from __future__ import annotations

import datetime as dt

import pytest

from pdf_table_extractor_spark.operators import intervals


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _frames(spark):
    pts = spark.createDataFrame(
        [(1, "a", _ts(5)), (2, "a", _ts(10)), (3, "b", _ts(10)), (4, "a", _ts(25))],
        "pid long, k string, ts timestamp",
    )
    ivs = spark.createDataFrame(
        # window W1 spans the 0/10 bucket boundary at bucket_s=10
        [(100, "a", _ts(4), _ts(12)), (200, "b", _ts(9), _ts(10)), (300, "a", _ts(30), _ts(40))],
        "iid long, k string, s timestamp, e timestamp",
    )
    return pts, ivs


def test_interval_join_containment_across_buckets(spark):
    pts, ivs = _frames(spark)
    got = sorted(
        (r["pid"], r["iid"])
        for r in intervals.interval_join(
            pts, ivs, "ts", "s", "e", bucket_s=10
        ).collect()
    )
    # unscoped: pure temporal containment — pids 2 and 3 (ts=10) are in
    # BOTH W1 (4..12, crossing the bucket-10 edge) and W2 (9..10,
    # end-inclusive); pid=4 (ts=25) is in no window
    assert got == [(1, 100), (2, 100), (2, 200), (3, 100), (3, 200)]


def test_interval_join_key_scoped_and_half_open(spark):
    pts, ivs = _frames(spark)
    got = sorted(
        (r["pid"], r["iid"])
        for r in intervals.interval_join(
            pts, ivs, "ts", "s", "e", bucket_s=10, key_cols=["k"]
        ).collect()
    )
    assert got == [(1, 100), (2, 100), (3, 200)]
    half = sorted(
        (r["pid"], r["iid"])
        for r in intervals.interval_join(
            pts, ivs, "ts", "s", "e", bucket_s=10, key_cols=["k"], inclusive="left"
        ).collect()
    )
    # ts=10 == e of W2: excluded under [s, e)
    assert half == [(1, 100), (2, 100)]


def test_interval_join_guard_fails_open_ended(spark):
    pts, ivs = _frames(spark)
    wide = spark.createDataFrame(
        [(900, "a", _ts(0), _ts(10_000_000))], "iid long, k string, s timestamp, e timestamp"
    )
    with pytest.raises(Exception, match="max_span_buckets"):
        intervals.interval_join(
            pts, wide, "ts", "s", "e", bucket_s=10, max_span_buckets=100
        ).collect()


def test_interval_join_semi_and_anti(spark):
    pts, ivs = _frames(spark)
    semi = sorted(
        r["pid"]
        for r in intervals.interval_join(
            pts, ivs, "ts", "s", "e", bucket_s=10, how="left_semi"
        ).collect()
    )
    anti = sorted(
        r["pid"]
        for r in intervals.interval_join(
            pts, ivs, "ts", "s", "e", bucket_s=10, how="left_anti"
        ).collect()
    )
    # pids 2 and 3 match TWO windows each but appear ONCE in semi; pid=4
    # (ts=25, in no window) is exactly the anti set
    assert semi == [1, 2, 3]
    assert anti == [4]
    # semi/anti keep only point columns
    cols = intervals.interval_join(
        pts, ivs, "ts", "s", "e", bucket_s=10, how="left_semi"
    ).columns
    assert cols == ["pid", "k", "ts"]


def test_overlap_join_meet_trick_no_duplicates(spark):
    # L1 and R1 share THREE buckets at bucket_s=10 — the meet trick must
    # emit the pair exactly once; touching endpoints obey strict
    L = spark.createDataFrame(
        [(1, _ts(5), _ts(35)), (2, _ts(50), _ts(55))],
        "lid long, ls timestamp, le timestamp",
    )
    R = spark.createDataFrame(
        [(10, _ts(0), _ts(40)), (20, _ts(55), _ts(60)), (30, _ts(70), _ts(80))],
        "rid long, rs timestamp, re timestamp",
    )
    got = sorted(
        (r["lid"], r["rid"])
        for r in intervals.overlap_join(
            L, R, "ls", "le", "rs", "re", bucket_s=10
        ).collect()
    )
    # (1,10) overlaps across 4 shared buckets -> once; (2,20) touch at 55
    assert got == [(1, 10), (2, 20)]
    strict = sorted(
        (r["lid"], r["rid"])
        for r in intervals.overlap_join(
            L, R, "ls", "le", "rs", "re", bucket_s=10, strict=True
        ).collect()
    )
    assert strict == [(1, 10)]


def test_interval_join_open_and_reversed_guards(spark):
    pts, _ = _frames(spark)
    open_iv = spark.createDataFrame(
        [(1, "a", _ts(0), None)], "iid long, k string, s timestamp, e timestamp"
    )
    # SQL semantics: an open-ended (NULL end) interval matches NOTHING —
    # in inner AND anti modes (a NOT EXISTS oracle agrees)
    assert intervals.interval_join(pts, open_iv, "ts", "s", "e", bucket_s=10).count() == 0
    assert (
        intervals.interval_join(
            pts, open_iv, "ts", "s", "e", bucket_s=10, how="left_anti"
        ).count()
        == 4
    )
    # open_end_fill opts the open row into "valid until the horizon"
    # (the capture_intervals composition)
    got = intervals.interval_join(
        pts, open_iv, "ts", "s", "e", bucket_s=10, open_end_fill=_ts(100)
    ).count()
    assert got == 4  # every point falls in [0, horizon]
    reversed_iv = spark.createDataFrame(
        [(2, "a", _ts(50), _ts(0))], "iid long, k string, s timestamp, e timestamp"
    )
    with pytest.raises(Exception, match="reversed"):
        intervals.interval_join(pts, reversed_iv, "ts", "s", "e", bucket_s=10).collect()
    with pytest.raises(Exception, match="reversed"):
        intervals.overlap_join(
            pts.selectExpr("pid", "k", "ts AS s2", "ts AS e2"),
            reversed_iv, "s2", "e2", "s", "e", bucket_s=10,
        ).collect()
