"""Broadcast Bloom-filter prefilter: membership-test a huge DataFrame
against a key set WITHOUT shuffling the huge side.

The 100-TB problem this solves: semi-joining a 10^12-row fact/corpus
against a key set that is too large to broadcast raw but whose *bit
fingerprint* is not (10^7 keys at ~10 bits/key ≈ 12 MB). A plain semi
join shuffles the entire big side on the key; the Bloom prefilter is a
narrow, pushdown-adjacent filter that drops (1 - selectivity) of it
before any exchange, at the price of a tunable false-positive rate —
exactly the trade Spark's own runtime bloom-filter join injection
(`spark.sql.optimizer.runtime.bloomFilter.enabled`) makes, but explicit,
engine-independent (md5-derived bit positions), and therefore
oracle-replayable in any SQL engine.

Topology:
- build: ONE hash aggregate over the key set → sparse (word_idx, bits)
  rows, at most m_bits/32 of them (bounded by the CONFIG m_bits, not by
  the data — model-sized by design, like the PCA covariance rows);
- probe: the dense bit array ships once per executor via a SparkContext
  broadcast; membership is an Arrow-vectorized pandas UDF over k
  JVM-computed bit positions — numpy gather + AND, no per-row Python.

Bit positions use 32-bit words stored in int64 so every shift stays in
non-negative BIGINT range on both engines (Spark `shiftleft` and DuckDB
`<<` agree with no sign wrap).

Sizing: false-positive rate ≈ (1 - e^(-k·n/m))^k. The broadcast is
m_bits/8 bytes: 10^8 bits = 12.5 MB (fine), 10^10 bits = 1.2 GB (use a
key-hash-partitioned bloom per bucket, or fall back to the built-in
runtime filter / a real shuffle semi join). No false negatives ever:
true members always pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WORD = 32  # bits per word; values stay < 2^32 so int64 never sign-wraps


def hash_positions(key: Column, k: int, m_bits: int) -> list[Column]:
    """k deterministic bit positions in [0, m_bits): the first 8 hex chars
    of md5(i ':' key) as an integer, mod m_bits (shared with the CMS
    sketch in terms.py) — the same dyadic-exact
    md5 trick as sampling.uniform_hash, replayable as
    ``('0x' || substr(md5(...), 1, 8))::UBIGINT % m`` in DuckDB."""
    return [
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{i}:"), key.cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % m_bits
        for i in range(k)
    ]


def bloom_words(
    keys: DataFrame,
    *,
    key_col: str,
    m_bits: int = 1 << 20,
    k: int = 3,
) -> DataFrame:
    """Sparse Bloom filter as (word_idx:int, bits:long) rows — one
    map-side-combinable aggregate over the key set; at most m_bits/32
    output rows regardless of key count."""
    if m_bits % _WORD:
        raise ValueError(f"m_bits must be a multiple of {_WORD}")
    pos = keys.select(
        F.explode(F.array(*hash_positions(F.col(key_col), k, m_bits))).alias("__p")
    )
    return (
        pos.groupBy((F.col("__p") / _WORD).cast("int").alias("word_idx"))
        .agg(
            F.bit_or(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(__p % {_WORD} AS INT))")
            ).alias("bits")
        )
    )


def bloom_prefilter(
    df: DataFrame,
    keys: DataFrame,
    *,
    key_col: str,
    keys_col: str,
    m_bits: int = 1 << 20,
    k: int = 3,
) -> DataFrame:
    """Keep the rows of ``df`` whose ``key_col`` *might* be in
    ``keys[keys_col]`` (all true members kept, plus ≈(1-e^(-kn/m))^k
    false positives). The big side sees ONE narrow filter — no exchange,
    no join — so this composes as a pre-shuffle guard in front of the
    exact semi/equi join that follows.

    Runs the build aggregate eagerly (the sparse words are model-sized
    by construction) and ships the dense array via a SparkContext
    broadcast, so the probe UDF is a pure numpy gather per Arrow batch.

    Downstream note: the probe is an ArrowEvalPython node — it drops
    outputPartitioning, so repartition AFTER this filter if the next op
    needs a specific layout (the CLAUDE.md Arrow gotcha).
    """
    import numpy as np

    rows = bloom_words(keys, key_col=keys_col, m_bits=m_bits, k=k).collect()
    dense = np.zeros(m_bits // _WORD, dtype=np.int64)
    for r in rows:
        dense[r["word_idx"]] = r["bits"]
    bc = df.sparkSession.sparkContext.broadcast(dense)

    @F.pandas_udf("boolean")
    def might_contain(*pos_cols):
        import numpy as np  # noqa: F811 — executor-side import
        import pandas as pd

        words = bc.value
        ok = np.ones(len(pos_cols[0]), dtype=bool)
        for p in pos_cols:
            pv = p.to_numpy(dtype=np.int64)
            ok &= ((words[pv // _WORD] >> (pv % _WORD)) & 1).astype(bool)
        return pd.Series(ok)

    pos = hash_positions(F.col(key_col), k, m_bits)
    return df.where(might_contain(*pos))


def bloom_sql_positions(key_expr: str, k: int, m_bits: int) -> list[str]:
    """The DuckDB replay of hash_positions, for oracle construction."""
    return [
        f"(('0x' || substr(md5('{i}:' || CAST({key_expr} AS VARCHAR)), 1, 8))"
        f"::UBIGINT % {m_bits})"
        for i in range(k)
    ]
