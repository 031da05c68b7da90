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
    """Flagship: the extraction pipeline itself — synthesises the seeded
    120-doc Common-Crawl-style corpus on executors and runs the full
    profile-routing + Arrow-UDF extraction + byte serializer DAG, returning
    one (url, profile, csv_md5) row per input document. Byte-level expected
    values live in tests/golden/extract_expected_120.parquet (see
    tools/gen_extract_expected.py); the sf_dir-based operator contracts are
    exposed via queries()/oracle_sql()."""
    return contracts.queries()["q_extract_pipeline"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return contracts.queries()


def oracle_sql() -> dict[str, str]:
    return contracts.oracle_sql()
