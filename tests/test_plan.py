"""Physical-plan assertions (SURVEY §4): the plans we designed for, not
just the first ones that passed.

- every extraction branch runs with exactly ONE shuffle (the url salt);
  groupBy/window/serializer all reuse it via the subset rule;
- binary `html` is pruned from text-profile scans (column pruning);
- predicate pushdown reaches the parquet scan;
- small dims broadcast (no shuffle join for q_broadcast_join).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_table_extractor_spark import contracts, synth
from pdf_table_extractor_spark.operators.serialize import serialize
from pdf_table_extractor_spark.plans.extract import profile_of, salt_repartition
from pdf_table_extractor_spark.plans.profiles import PROFILES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pages(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("plans") / "pages")
    synth.synth_spark(spark, 40, parallelism=2).write.parquet(p)
    return spark.read.parquet(p)


def branch_plan(pages, name: str) -> str:
    prof = PROFILES[name]
    sub = pages.withColumn("profile", profile_of(F.col("url"))).filter(
        F.col("profile") == name
    )
    if prof.salt_pages:
        sub = salt_repartition(sub, 4)
    out = serialize(prof.build(sub), name, prof.sink)
    return out._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", list(PROFILES))
def test_single_shuffle_per_branch(pages, name):
    plan = branch_plan(pages, name)
    if name == "caixa":
        # caixa unions 4 per-format sub-plans (codegen 64KB limit): the
        # shared salt exchange prints once per sub-plan (AQE reuse dedupes
        # it at runtime) plus the round-robin barrier and the serializer
        # groupBy re-exchange of record rows.
        assert plan.count("Exchange") <= 6
    else:
        assert plan.count("Exchange") == 1, f"{name}: expected exactly 1 shuffle\n{plan}"


def test_text_profiles_prune_html(pages):
    plan = branch_plan(pages, "inter")
    scan = [ln for ln in plan.splitlines() if "FileScan" in ln]
    assert scan and "html" not in scan[0], "binary html must be pruned from text branches"


def test_predicate_pushdown(spark):
    q = contracts.queries()["q_scan_project"](spark, SF_DIR)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_orderstatus" in plan.split("PushedFilters")[1][:200]


def test_broadcast_join(spark):
    q = contracts.queries()["q_broadcast_join"](spark, SF_DIR)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
