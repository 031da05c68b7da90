"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction pipeline on sf0.001;
``queries()``/``oracle_sql()`` expose one contract pair per implemented
operator from SURVEY.md §2 (registered in
``pdf_table_extractor_spark/contracts.py``).
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from pdf_table_extractor_spark import contracts  # noqa: E402
from pdf_table_extractor_spark import contracts_curation  # noqa: E402,F401 — registers curation queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H-ish pricing summary through the engine's expression library —
    replaced by the extraction flagship once synth+profiles land.
    """
    return contracts.queries()["q_agg_count"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return contracts.queries()


def oracle_sql() -> dict[str, str]:
    return contracts.oracle_sql()
