"""Broadcast Bloom-filter prefilter (operators/bloom.py): no false
negatives ever, bit-exact agreement with an independent pure-python
replay of the md5 position scheme, and a probe plan that stays narrow
(no Exchange on the big side — the whole point of the operator)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from pdf_table_extractor_spark.operators import bloom


def _py_positions(v, k: int, m: int) -> list[int]:
    return [
        int(hashlib.md5(f"{i}:{v}".encode()).hexdigest()[:8], 16) % m
        for i in range(k)
    ]


def test_no_false_negatives_and_some_filtering(spark):
    keys = spark.range(0, 200).select(F.col("id").alias("k"))
    cand = spark.range(0, 5000).select(F.col("id").alias("k"))
    out = bloom.bloom_prefilter(
        cand, keys, key_col="k", keys_col="k", m_bits=4096, k=3
    )
    got = {r["k"] for r in out.collect()}
    assert set(range(200)) <= got, "a Bloom filter may never drop a true member"
    assert len(got) < 2500, "the filter should reject most non-members"


def test_membership_matches_pure_python_replay(spark):
    m, k = 512, 2
    keyvals = list(range(50))
    bits: set[int] = set()
    for v in keyvals:
        bits.update(_py_positions(v, k, m))
    expected = {
        v for v in range(2000) if all(p in bits for p in _py_positions(v, k, m))
    }
    keys = spark.createDataFrame([(v,) for v in keyvals], "k long")
    cand = spark.createDataFrame([(v,) for v in range(2000)], "k long")
    got = {
        r["k"]
        for r in bloom.bloom_prefilter(
            cand, keys, key_col="k", keys_col="k", m_bits=m, k=k
        ).collect()
    }
    assert got == expected


def test_words_match_pure_python_replay(spark):
    m, k = 256, 3
    keyvals = ["a", "bb", "ccc", "dddd"]
    dense = [0] * (m // 32)
    for v in keyvals:
        for p in _py_positions(v, k, m):
            dense[p // 32] |= 1 << (p % 32)
    keys = spark.createDataFrame([(v,) for v in keyvals], "k string")
    rows = bloom.bloom_words(keys, key_col="k", m_bits=m, k=k).collect()
    got = {r["word_idx"]: r["bits"] for r in rows}
    assert got == {i: w for i, w in enumerate(dense) if w}


def test_probe_plan_is_narrow_no_exchange(spark):
    keys = spark.range(0, 10).select(F.col("id").alias("k"))
    cand = spark.range(0, 100).select(F.col("id").alias("k"))
    out = bloom.bloom_prefilter(
        cand, keys, key_col="k", keys_col="k", m_bits=256, k=2
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "the prefilter must not shuffle the big side"
    assert "ArrowEvalPython" in plan, "membership should be the Arrow-batched UDF"


def test_rejects_unaligned_m_bits(spark):
    keys = spark.range(0, 4).select(F.col("id").alias("k"))
    try:
        bloom.bloom_words(keys, key_col="k", m_bits=100, k=2)
    except ValueError:
        return
    raise AssertionError("m_bits not a multiple of 32 must be rejected")


def test_bloom_then_exact_join_equals_plain_semi_join(spark):
    """The production composition: bloom prefilter in front of the exact
    semi join must change NOTHING about the result (false positives are
    removed by the exact join; false negatives don't exist)."""
    keys = spark.range(0, 300, 3).select(F.col("id").alias("k"))  # every 3rd
    big = spark.range(0, 3000).select(F.col("id").alias("k"))
    direct = {r["k"] for r in big.join(keys, "k", "left_semi").collect()}
    pre = bloom.bloom_prefilter(
        big, keys, key_col="k", keys_col="k", m_bits=1024, k=2
    )
    composed = {r["k"] for r in pre.join(keys, "k", "left_semi").collect()}
    assert composed == direct
