"""Custom stateful streaming operator: cross-batch exact dedup via
applyInPandasWithState (SURVEY brief: "applyInPandasWithState for custom
stateful operators").

A continuously-ingesting crawl re-sees documents; this operator keys state
by a hash prefix bucket (bounded cardinality → bounded state size; at
cluster scale bump `prefix_len`), keeps the set of seen content hashes per
bucket in GroupState, and emits only first-seen documents. Works on both
streaming and batch groupBys, but the state semantics (survive across
micro-batches, recoverable from the streaming checkpoint) are the point.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "url string, text_md5 string"
STATE_SCHEMA = "seen array<string>"


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    seen: set[str] = set(state.get[0]) if state.exists else set()
    for pdf in pdfs:
        fresh = pdf[~pdf["text_md5"].isin(seen)].drop_duplicates("text_md5")
        if len(fresh):
            seen.update(fresh["text_md5"])
            yield fresh[["url", "text_md5"]]
    state.update((sorted(seen),))


def first_seen_stream(pages_stream: DataFrame) -> DataFrame:
    """pages stream → (url, text_md5) rows for first-ever-seen content.

    Bucket key = first 2 hex chars of the content hash (256 state groups).
    """
    hashed = pages_stream.select(
        "url",
        F.md5("text").alias("text_md5"),
        F.substring(F.md5("text"), 1, 2).alias("bucket"),
    )
    return hashed.groupBy("bucket").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
