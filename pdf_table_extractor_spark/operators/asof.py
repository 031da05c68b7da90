"""As-of join: attach to each left row the latest right row at-or-before
it, per key — the temporal alignment primitive Spark lacks natively.

Web-scale uses: align each page capture to the most recent preceding
robots.txt / sitemap capture of the same host; join crawl events to the
last-known domain policy; click→view attribution. The naive formulation
is a theta-join (``l.key = r.key AND r.ts <= l.ts`` + argmax), which
Spark plans as a sort-merge join with a per-row backward scan, or worse
a cartesian per key. This implementation never builds a join at all:

1. tag both sides and ``unionByName(allowMissingColumns=True)`` (right
   payload columns are packed into ONE struct so a null field inside a
   matched right row cannot be confused with "no match");
2. one hash exchange on the key, one partition-local sort on
   ``(ts, side)`` — at equal timestamps the right row sorts FIRST, so
   the match is inclusive (``r.ts <= l.ts``), matching DuckDB/Pandas
   ``ASOF JOIN`` / ``merge_asof`` semantics;
3. forward-fill the packed struct with ``last(..., ignorenulls=True)``
   over ``rowsBetween(unboundedPreceding, 0)`` (the repo's ffill shape,
   functions/windows.py) and keep only left rows.

Cost at 100 TB: exactly ONE shuffle of ``left ∪ right-projection`` and a
partition-local sort — the same price as the group-by both sides already
need; no join node, no per-key loop, nothing on the driver (plan-asserted
in tests/test_plan.py: 1 Exchange, 0 join operators). Skew: a hot key
(one mega-host's full history) lands on one task, the same failure class
as session windows — mitigation is range-bucketing the time axis with a
per-bucket boundary carry (compose: bucket by ``(key, ts_bucket)``,
as-of within buckets, then one cheap pass joining each bucket's head to
the previous bucket's tail), worth it only past ~10^8 rows per key.

``tolerance`` (seconds) nulls out matches older than the window, like
``pandas.merge_asof(tolerance=...)`` — the match is computed first, then
gated, so a too-old right row does NOT fall back to an even older one.

Reference parity: the reference has no temporal alignment at all (every
conversor handles one file in isolation); this is beyond-reference
cluster surface like sources/warc.py, named by the build brief's custom
operator list (as-of join).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    payload_cols: list[str],
    *,
    right_ts_as: str | None = None,
    tolerance_s: float | None = None,
    bucket_s: int | None = None,
) -> DataFrame:
    """For each left row, attach ``payload_cols`` from the latest right
    row with ``right.ts_col <= left.ts_col`` and equal ``key_cols``
    (backward-inclusive as-of). Unmatched left rows keep null payloads.

    ``right`` should be unique per ``(key_cols, ts_col)`` — pre-aggregate
    if not (ties inside right would otherwise resolve by partition sort
    order). ``right_ts_as`` additionally exposes the matched right
    timestamp under that name; ``tolerance_s`` nulls matches older than
    the given number of seconds.

    ``bucket_s`` is the hot-key scale path: with it, NO window ever holds
    more than one ``(key, time-bucket)`` of data (a mega-host's full
    history never lands on one task). Semantics are identical — proven by
    contract (q_asof_join_bucketed shares the plain path's DuckDB ASOF
    oracle) and property test. Mechanics: the in-bucket pass is the same
    union+ffill keyed on ``(key, bucket)``; the cross-bucket carry — what
    a left row at the start of a bucket should inherit — is an as-of over
    per-bucket right-side TAILS (one ``max_by`` hash aggregate, then a
    per-key window over ~#buckets rows, orders of magnitude smaller than
    the data), equi-joined back on ``(key, bucket)``. Pick ``bucket_s``
    so a bucket of the hottest key fits a task (e.g. one hour of the
    biggest host's captures)."""
    side = "__asof_side"
    pack = "__asof_pack"
    # Right payload rides in ONE struct (incl. its ts): ffill then sees a
    # single null-iff-no-right-row column, so per-field nulls inside a
    # matched row survive, and the struct is what tolerance gates on.
    r = right.select(
        *key_cols,
        F.col(ts_col),
        F.struct(F.col(ts_col).alias("__rts"), *payload_cols).alias(pack),
        F.lit(0).alias(side),
    )
    l = left.withColumn(side, F.lit(1))

    def _finalize(u: DataFrame, filled) -> DataFrame:
        if tolerance_s is not None:
            # gate AFTER the fill: an out-of-window match is dropped, not
            # replaced by an older one (merge_asof semantics)
            age = F.col(ts_col).cast("timestamp").cast("double") - filled[
                "__rts"
            ].cast("timestamp").cast("double")
            filled = F.when(age <= F.lit(float(tolerance_s)), filled)
        return (
            u.withColumn(pack, filled)
            .filter(F.col(side) == 1)
            .select(
                *left.columns,
                *[F.col(pack)[c].alias(c) for c in payload_cols],
                *(
                    [F.col(pack)["__rts"].alias(right_ts_as)]
                    if right_ts_as
                    else []
                ),
            )
        )

    if bucket_s is None:
        u = l.unionByName(r, allowMissingColumns=True)
        w = (
            Window.partitionBy(*key_cols)
            .orderBy(F.col(ts_col).asc(), F.col(side).asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        return _finalize(u, F.last(pack, ignorenulls=True).over(w))

    bcol = "__asof_b"
    us = 1_000_000 * int(bucket_s)
    _b = F.floor(F.unix_micros(F.col(ts_col).cast("timestamp")) / us)
    l2, r2 = l.withColumn(bcol, _b), r.withColumn(bcol, _b)
    # cross-bucket carry: per-(key,bucket) right tails (hash aggregate),
    # then for each DISTINCT left bucket the latest tail of any STRICTLY
    # earlier bucket (same-bucket rights are the in-bucket pass's job —
    # at equal bucket the probe sorts first)
    tails = r2.groupBy(*key_cols, bcol).agg(
        F.max_by(F.col(pack), F.col(pack)["__rts"]).alias(pack)
    ).withColumn(side, F.lit(0))
    probes = (
        l2.select(*key_cols, bcol).distinct().withColumn(side, F.lit(1))
    )
    wc = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(bcol).asc(), F.col(side).desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # carry columns get fresh names: carry shares lineage with u2's left
    # side, so joining on same-named attributes trips Spark's ambiguous-
    # self-join resolution (warns today, fails under
    # spark.sql.analyzer.failAmbiguousSelfJoin elsewhere)
    carry = (
        probes.unionByName(tails, allowMissingColumns=True)
        .withColumn("__asof_carry", F.last(pack, ignorenulls=True).over(wc))
        .filter(F.col(side) == 1)
        .select(
            *[F.col(c).alias(f"__c_{c}") for c in [*key_cols, bcol]],
            "__asof_carry",
        )
    )
    u = l2.unionByName(r2, allowMissingColumns=True)
    win = (
        Window.partitionBy(*key_cols, bcol)
        .orderBy(F.col(ts_col).asc(), F.col(side).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u2 = u.withColumn(pack, F.last(pack, ignorenulls=True).over(win)).filter(
        F.col(side) == 1
    )
    # eqNullSafe: windows group NULL keys together (the plain path matches
    # null-key rows to null-key rights), so the carry join-back must too —
    # a plain equi-join would silently drop every null-key cross-bucket
    # match and diverge from the plain path
    cond = [
        F.col(c).eqNullSafe(F.col(f"__c_{c}")) for c in [*key_cols, bcol]
    ]
    u2 = u2.join(carry, cond, "left").drop(
        *[f"__c_{c}" for c in [*key_cols, bcol]]
    )
    return _finalize(u2, F.coalesce(F.col(pack), F.col("__asof_carry")))
