"""Hypertable rollup: multi-granularity continuous aggregates that scan
the raw table ONCE.

TimescaleDB's continuous aggregates (and every metrics pipeline's
hour→day→month rollup) answer the same query at several time grains.
The naive Spark form — one groupBy per grain, unioned — scans the raw
table once PER GRAIN; at 100 TB that multiplies the dominant cost by
the number of grains. This operator builds the hierarchy the way a
hypertable does: the finest grain aggregates the raw data, every
coarser grain re-aggregates the FINER AGGREGATE (sum of counts, sum of
sums, min of mins, max of maxes — the classic re-aggregable algebra;
non-decomposable aggs like exact median are deliberately unsupported).

The levels are emitted as one unioned frame, and because each coarser
branch's subtree *contains* the finer branch's aggregate verbatim,
Catalyst's exchange reuse collapses the physical plan to: one scan, one
exchange per grain, every finer exchange ReusedExchange'd by the
coarser branches (tests/test_plan.py asserts 1 scan + ≥3 reuses with
AQE off). So the union costs the same as computing only the coarsest
grain from raw — the finer results are free byproducts.

Grain alignment: Spark ``F.window`` tumbles from the 1970-01-01 epoch;
hour/6-hour/day grains therefore align with DuckDB/TimescaleDB
``time_bucket`` (origin 2000-01-01, a whole number of days apart).
WEEK grains do NOT (epoch is a Thursday, time_bucket weeks start
Monday) — callers wanting weeks should pass ``"7 days"`` knowing the
phase, or post-shift. Bucket starts surface as tz-independent strings
(the repo's q_time_bucket convention for NTZ parquet timestamps).

Reference parity: none (per-file tool, no time series) —
beyond-reference cluster surface named by the build brief's custom
operator list (hypertable rollup), sibling of operators/asof.py and
operators/intervals.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_UNIT_S = {
    "second": 1, "seconds": 1,
    "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600,
    "day": 86400, "days": 86400,
    "week": 604800, "weeks": 604800,
}


def _grain_seconds(grain: str) -> int:
    """Parse Spark window-duration strings ('1 hour', '90 minutes')."""
    import re

    m = re.fullmatch(r"\s*(\d+)\s+(\w+)\s*", grain)
    if not m or m.group(2).lower() not in _UNIT_S:
        raise ValueError(f"hypertable_rollup: unparseable grain {grain!r}")
    return int(m.group(1)) * _UNIT_S[m.group(2).lower()]


def hypertable_rollup(
    df: DataFrame,
    ts_col: str,
    grains: list[str],
    key_cols: list[str],
    sum_cols: list[str],
    *,
    count_alias: str = "n",
) -> DataFrame:
    """Tumbling-window aggregates of ``df`` at every grain in ``grains``
    (finest FIRST; each must evenly divide the next), computed
    hierarchically. Output: ``grain`` (the input string), ``bucket_start``
    (formatted string), ``key_cols``, ``count_alias`` plus
    ``sum_/min_/max_<c>`` for each ``c`` in ``sum_cols``."""
    # a coarser grain that does NOT evenly contain the finer one would
    # silently assign whole finer buckets to the wrong coarse window
    # (the re-agg windows the finer BUCKET START) — data corruption, so
    # validate loudly up front
    secs = [_grain_seconds(g) for g in grains]
    for (ga, sa), (gb, sb) in zip(zip(grains, secs), zip(grains[1:], secs[1:])):
        if sb < sa or sb % sa != 0:
            raise ValueError(
                f"hypertable_rollup: grain {gb!r} is not a whole multiple "
                f"of the finer grain {ga!r} — finer buckets would be "
                "misassigned; reorder or choose divisible grains"
            )
    sums = [F.sum(c).alias(f"sum_{c}") for c in sum_cols]
    mins = [F.min(c).alias(f"min_{c}") for c in sum_cols]
    maxs = [F.max(c).alias(f"max_{c}") for c in sum_cols]
    level = df.groupBy(F.window(ts_col, grains[0]).alias("__w"), *key_cols).agg(
        F.count("*").alias(count_alias), *sums, *mins, *maxs
    )
    # Constant-true nondeterministic barrier (the repo's exchange-reuse
    # pin, plans/extract.py): the coarser grain's window rewrite injects
    # an isnotnull on its grouping key which would otherwise push BELOW
    # this aggregate and fork that branch's subtree away from the emit
    # branch's — defeating ReusedExchange and re-scanning raw per grain.
    level = level.filter(F.spark_partition_id() >= 0)

    def _emit(lv: DataFrame, grain: str) -> DataFrame:
        return lv.select(
            F.lit(grain).alias("grain"),
            F.date_format("__w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "bucket_start"
            ),
            *key_cols,
            count_alias,
            *[F.col(f"{p}_{c}") for c in sum_cols for p in ("sum", "min", "max")],
        )

    out = _emit(level, grains[0])
    for grain in grains[1:]:
        # re-aggregate the finer AGGREGATE — never the raw table
        level = level.groupBy(
            F.window(F.col("__w.start"), grain).alias("__w"), *key_cols
        ).agg(
            F.sum(count_alias).alias(count_alias),
            *[F.sum(f"sum_{c}").alias(f"sum_{c}") for c in sum_cols],
            *[F.min(f"min_{c}").alias(f"min_{c}") for c in sum_cols],
            *[F.max(f"max_{c}").alias(f"max_{c}") for c in sum_cols],
        )
        level = level.filter(F.spark_partition_id() >= 0)
        out = out.unionByName(_emit(level, grain))
    return out
