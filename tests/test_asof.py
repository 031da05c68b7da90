"""Unit tests for the as-of join (operators/asof.py): hand-computed
backward-inclusive semantics, tie handling, tolerance gating, and
null-payload survival inside matched rows."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from pdf_table_extractor_spark.operators import asof


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, "a", _ts(5)), (2, "a", _ts(10)), (3, "a", _ts(2)), (4, "b", _ts(7)),
         (5, "c", _ts(9))],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("a", _ts(3), 30.0), ("a", _ts(10), 100.0), ("b", _ts(8), 80.0)],
        "k string, ts timestamp, v double",
    )
    return left, right


def test_asof_backward_inclusive_and_unmatched(spark):
    left, right = _frames(spark)
    got = {
        r["id"]: (r["v"], r["rts"])
        for r in asof.asof_join(
            left, right, ["k"], "ts", ["v"], right_ts_as="rts"
        ).collect()
    }
    assert got[1] == (30.0, _ts(3))  # latest at-or-before 5 is 3
    assert got[2] == (100.0, _ts(10))  # tie at equal ts is INCLUSIVE
    assert got[3] == (None, None)  # ts=2 precedes every right row
    assert got[4] == (None, None)  # right row at 8 is AFTER left 7
    assert got[5] == (None, None)  # key with no right rows at all


def test_asof_tolerance_drops_stale_not_fallback(spark):
    left, right = _frames(spark)
    got = {
        r["id"]: r["v"]
        for r in asof.asof_join(
            left, right, ["k"], "ts", ["v"], tolerance_s=1.5
        ).collect()
    }
    # id=1 matched ts=3 at gap 2s > 1.5s: dropped, NOT replaced by older
    assert got[1] is None
    assert got[2] == 100.0  # gap 0 within tolerance


def test_asof_null_field_in_matched_row_survives(spark):
    # a right row whose payload FIELD is null must still win the match
    # (struct packing: null field != no match)
    left = spark.createDataFrame([(1, "a", _ts(9))], "id long, k string, ts timestamp")
    right = spark.createDataFrame(
        [("a", _ts(3), 30.0), ("a", _ts(8), None)],
        "k string, ts timestamp, v double",
    )
    row = asof.asof_join(
        left, right, ["k"], "ts", ["v"], right_ts_as="rts"
    ).collect()[0]
    assert row["rts"] == _ts(8) and row["v"] is None


def test_asof_bucketed_matches_plain(spark):
    # deterministic pseudo-random corpus: 3 keys, sparse rights, empty
    # buckets, keys with no rights at all
    import hashlib

    def h(x):
        return int(hashlib.md5(str(x).encode()).hexdigest()[:6], 16)

    left = spark.createDataFrame(
        [(i, "k%d" % (h(i) % 3), _ts(h(i) % 900)) for i in range(300)],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("k%d" % (h(j * 7) % 2), _ts(h(j + 1000) % 900), float(j))
         for j in range(60)],
        "k string, ts timestamp, v double",
    ).groupBy("k", "ts").agg(F.max("v").alias("v"))
    kw = dict(right_ts_as="rts")
    plain = asof.asof_join(left, right, ["k"], "ts", ["v"], **kw)
    for bucket_s in (50, 7, 2000):  # multi-bucket, tiny, one-bucket
        buck = asof.asof_join(
            left, right, ["k"], "ts", ["v"], bucket_s=bucket_s, **kw
        )
        assert sorted(map(tuple, buck.collect())) == sorted(
            map(tuple, plain.collect())
        )
    # tolerance composes with the carry too
    pt = asof.asof_join(left, right, ["k"], "ts", ["v"], tolerance_s=40)
    bt = asof.asof_join(
        left, right, ["k"], "ts", ["v"], tolerance_s=40, bucket_s=50
    )
    assert sorted(map(tuple, bt.collect())) == sorted(map(tuple, pt.collect()))


def test_asof_bucketed_null_keys_match_plain(spark):
    # null keys group together in windows; the bucketed carry join-back
    # must be null-safe or cross-bucket null-key matches vanish
    left = spark.createDataFrame(
        [(1, None, _ts(500)), (2, "a", _ts(500))],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [(None, _ts(3), 30.0), ("a", _ts(4), 40.0)],
        "k string, ts timestamp, v double",
    )
    plain = sorted(map(tuple, asof.asof_join(left, right, ["k"], "ts", ["v"]).collect()))
    buck = sorted(
        map(tuple, asof.asof_join(left, right, ["k"], "ts", ["v"], bucket_s=50).collect())
    )
    assert buck == plain
    assert dict((r[0], r[3]) for r in buck) == {1: 30.0, 2: 40.0}
