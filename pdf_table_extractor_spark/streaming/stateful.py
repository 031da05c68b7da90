"""Custom stateful streaming operator: cross-batch exact dedup via
applyInPandasWithState (SURVEY brief: "applyInPandasWithState for custom
stateful operators").

A continuously-ingesting crawl re-sees documents; this operator keys state
by a hash prefix bucket (bounded cardinality → bounded state size; at
cluster scale bump `prefix_len`), keeps the set of seen content hashes per
bucket in GroupState, and emits only first-seen documents.

State growth policy (round-2): exact first-ever-seen semantics need the
full seen-set by definition, so the DEFAULT is unbounded state with the
cost made explicit: state bytes ≈ 32 B × distinct documents, spread over
16^prefix_len buckets — size prefix_len so each bucket's list stays
shuffle-friendly (10^12 docs at prefix_len=6 → ~60k hashes/bucket).
Deployments that can tolerate sliding-window semantics bound it instead:

- ``max_seen_per_bucket``: per-bucket LRU-ish cap — oldest hashes evict
  first, so a document re-seen after eviction re-emits (sliding dedup).
- ``ttl_minutes``: processing-time TTL — idle buckets drop their whole
  state (GroupStateTimeout.ProcessingTimeTimeout), the standard crawl
  pattern when re-crawls cluster in time.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "url string, text_md5 string"
STATE_SCHEMA = "seen array<string>"


def _make_dedup_fn(max_seen: int | None, ttl_minutes: int | None):
    def _dedup_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if ttl_minutes is not None and state.hasTimedOut:
            state.remove()
            return
        # state keeps ARRIVAL order so eviction drops the oldest first
        seen_list: list[str] = list(state.get[0]) if state.exists else []
        seen = set(seen_list)
        for pdf in pdfs:
            fresh = pdf[~pdf["text_md5"].isin(seen)].drop_duplicates("text_md5")
            if len(fresh):
                seen.update(fresh["text_md5"])
                seen_list.extend(fresh["text_md5"])
                yield fresh[["url", "text_md5"]]
        if max_seen is not None and len(seen_list) > max_seen:
            seen_list = seen_list[-max_seen:]
        state.update((seen_list,))
        if ttl_minutes is not None:
            state.setTimeoutDuration(ttl_minutes * 60_000)

    return _dedup_fn


def first_seen_stream(
    pages_stream: DataFrame,
    prefix_len: int = 2,
    max_seen_per_bucket: int | None = None,
    ttl_minutes: int | None = None,
) -> DataFrame:
    """pages stream → (url, text_md5) rows for first-ever-seen content.

    Bucket key = first `prefix_len` hex chars of the content hash
    (16^prefix_len state groups). See module docstring for the state-size
    policy behind `max_seen_per_bucket` / `ttl_minutes`.
    """
    hashed = pages_stream.select(
        "url",
        F.md5("text").alias("text_md5"),
        F.substring(F.md5("text"), 1, prefix_len).alias("bucket"),
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes is not None
        else GroupStateTimeout.NoTimeout
    )
    return hashed.groupBy("bucket").applyInPandasWithState(
        _make_dedup_fn(max_seen_per_bucket, ttl_minutes),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
