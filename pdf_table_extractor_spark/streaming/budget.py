"""Cross-batch per-host crawl budget on the transformWithStateInPandas
API (Spark 4 second-generation arbitrary state): the streaming complement
of urls.domain_cap — no single host may contribute more than ``max_pages``
documents over the stream's lifetime, enforced exactly across
micro-batches.

State is one counter per host key (typed ValueState, stored in the state
store and checkpointed with the query — a restart resumes budgets
exactly). Scale: state size = 8 bytes × hosts; keys partition by host
hash, so a hot host concentrates only its own counter updates on one
task, never the data volume.

Environment requirements (gated, like the Iceberg jars / media codecs):
the transformWithState runtime needs (a) the RocksDB state store
provider (`spark.sql.streaming.stateStore.providerClass`) and (b) the
`protobuf` python package for its state protocol — absent in this
sandbox, so the end-to-end stream test skips and the budget logic is
unit-tested by driving the processor directly."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import LongType, StringType, StructField, StructType

OUT_SCHEMA = StructType(
    [StructField("host", StringType()), StructField("url", StringType())]
)
_STATE_SCHEMA = StructType([StructField("n", LongType())])


def make_host_budget_processor(max_pages: int) -> StatefulProcessor:
    """Admit rows per key until the budget is exhausted; the counter
    survives micro-batch boundaries (and restarts) in ValueState.

    Defined as a closure class ON PURPOSE: Spark's transformWithState
    driver-side worker unpickles the processor in a FRESH python process
    that doesn't have this package on its path — cloudpickle serializes
    locally-defined classes by value, making the processor
    self-contained (a module-level class crashes that worker with
    ModuleNotFoundError unless PYTHONPATH is exported to it)."""
    import pandas as _pd

    class _HostBudget(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._n = handle.getValueState("n_taken", _STATE_SCHEMA)

        def handleInputRows(
            self, key, rows: Iterator[pd.DataFrame], timer_values
        ) -> Iterator[pd.DataFrame]:
            taken = self._n.get()[0] if self._n.exists() else 0
            for pdf in rows:
                room = max(max_pages - taken, 0)
                if room <= 0:
                    continue
                out = pdf.iloc[:room]
                taken += len(out)
                if len(out):
                    yield _pd.DataFrame({"host": key[0], "url": out["url"]})
            self._n.update((taken,))

        def close(self) -> None:
            pass

    return _HostBudget()


def host_budget_stream(pages: DataFrame, *, max_pages: int) -> DataFrame:
    """Admit at most ``max_pages`` pages per host across ALL micro-batches
    (deterministic within a batch up to arrival order — order rows
    upstream if strict priority matters). The grouping key is
    ``urls.host_of`` — the same host derivation used everywhere else, so
    pathless urls (http://example.com) and uppercase schemes get their own
    per-host budget instead of collapsing into one global '' key."""
    from pdf_table_extractor_spark.operators.urls import host_of

    host = host_of(F.col("url"))
    return (
        pages.withColumn("host", host)
        .groupBy("host")
        .transformWithStateInPandas(
            statefulProcessor=make_host_budget_processor(max_pages),
            outputStructType=OUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
