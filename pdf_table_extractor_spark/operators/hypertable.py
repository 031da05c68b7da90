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
WEEK grains are phase-shifted here to match too: the epoch is a
Thursday while ``time_bucket`` weeks start Monday (origin 2000-01-03,
epoch second 946857600), so week-unit grains get ``F.window``'s
``startTime`` offset ``946857600 % grain_seconds`` — '1 week' buckets
start on Mondays exactly like ``time_bucket(INTERVAL '1 week')``, and
multi-week grains share time_bucket's origin arithmetic. Mixed-unit
hierarchies additionally validate PHASE congruence (a '1 day' level
nests into the Monday-shifted week because the 4-day shift is a whole
number of day grains; '90 minutes' under '1 week' would not and is
rejected loudly). Bucket starts surface as tz-independent strings
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


# time_bucket's week origin: 2000-01-03 00:00 UTC (a Monday), in epoch
# seconds — a whole number of days past the (Thursday) Unix epoch.
_WEEK_ORIGIN_S = 946_857_600


def _grain_seconds(grain: str) -> tuple[int, int]:
    """Parse Spark window-duration strings ('1 hour', '90 minutes') →
    (seconds, phase): phase is the epoch offset of the first bucket
    boundary (0 for sub-week units; the Monday shift for week units)."""
    import re

    m = re.fullmatch(r"\s*(\d+)\s+(\w+)\s*", grain)
    if not m or m.group(2).lower() not in _UNIT_S:
        raise ValueError(f"hypertable_rollup: unparseable grain {grain!r}")
    secs = int(m.group(1)) * _UNIT_S[m.group(2).lower()]
    phase = _WEEK_ORIGIN_S % secs if m.group(2).lower().startswith("week") else 0
    return secs, phase


def _grain_window(col, grain: str, phase: int):
    """F.window with the grain's phase shift (identity for phase 0)."""
    if phase:
        return F.window(col, grain, grain, f"{phase} seconds")
    return F.window(col, grain)


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
    parsed = [_grain_seconds(g) for g in grains]
    secs = [s for s, _ in parsed]
    phases = [p for _, p in parsed]
    for (ga, sa, pa), (gb, sb, pb) in zip(
        zip(grains, secs, phases), zip(grains[1:], secs[1:], phases[1:])
    ):
        if sb < sa or sb % sa != 0:
            raise ValueError(
                f"hypertable_rollup: grain {gb!r} is not a whole multiple "
                f"of the finer grain {ga!r} — finer buckets would be "
                "misassigned; reorder or choose divisible grains"
            )
        # phase congruence: every coarse boundary must land ON a finer
        # boundary or finer buckets straddle it (week grains are
        # Monday-shifted; a finer grain that doesn't divide the shift
        # would be silently misassigned)
        if (pb - pa) % sa != 0:
            raise ValueError(
                f"hypertable_rollup: grain {gb!r}'s bucket phase "
                f"(+{pb}s) is not aligned to the finer grain {ga!r} — "
                "finer buckets would straddle the coarse boundary"
            )
    sums = [F.sum(c).alias(f"sum_{c}") for c in sum_cols]
    mins = [F.min(c).alias(f"min_{c}") for c in sum_cols]
    maxs = [F.max(c).alias(f"max_{c}") for c in sum_cols]
    level = df.groupBy(
        _grain_window(ts_col, grains[0], phases[0]).alias("__w"), *key_cols
    ).agg(F.count("*").alias(count_alias), *sums, *mins, *maxs)
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
    for grain, phase in zip(grains[1:], phases[1:]):
        # re-aggregate the finer AGGREGATE — never the raw table
        level = level.groupBy(
            _grain_window(F.col("__w.start"), grain, phase).alias("__w"), *key_cols
        ).agg(
            F.sum(count_alias).alias(count_alias),
            *[F.sum(f"sum_{c}").alias(f"sum_{c}") for c in sum_cols],
            *[F.min(f"min_{c}").alias(f"min_{c}") for c in sum_cols],
            *[F.max(f"max_{c}").alias(f"max_{c}") for c in sum_cols],
        )
        level = level.filter(F.spark_partition_id() >= 0)
        out = out.unionByName(_emit(level, grain))
    return out
