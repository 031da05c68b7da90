"""Hard plan-hygiene invariants over the WHOLE contract surface: no
row-at-a-time Python and no cartesian products anywhere, in any of the
137+ registered queries — the audit version of the per-operator plan
asserts scattered through test_plan/test_scale_paths. Runs at sf0.001
(plans only; explain does not execute the heavy stages)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo/tools")

SF_DIR = "/root/testdata/sf0.001"


def test_no_per_row_python_and_no_cartesian_anywhere(spark):
    from audit_plans import audit

    per_query = audit(spark, SF_DIR)
    errors = {k: v["error"] for k, v in per_query.items() if "error" in v}
    if errors:
        # Iterative queries (pagerank/HITS/LPA/cc) run localCheckpoint /
        # broadcast actions at BUILD time; under heavy host contention
        # those can time out and surface here as one-off planning
        # errors (observed 2026-08-21 in a full-suite run that passed
        # on immediate rerun). Retry the errored queries once before
        # declaring the plan broken.
        from pdf_table_extractor_spark import contracts

        qs = contracts.queries()
        retried = {}
        for k in errors:
            try:
                df = qs[k](spark, SF_DIR)
                df._jdf.queryExecution().executedPlan()
            except Exception as e:  # noqa: BLE001
                retried[k] = f"{type(e).__name__}: {e}"[:200]
        assert not retried, f"queries failed to plan (after retry): {retried}"
        per_query = {k: v for k, v in per_query.items() if "error" not in v}
    row_python = {
        k: v["batch_eval_python"]
        for k, v in per_query.items()
        if v["batch_eval_python"]
    }
    assert not row_python, f"row-at-a-time Python UDFs in: {row_python}"
    cartesian = {k: v["cartesian"] for k, v in per_query.items() if v["cartesian"]}
    assert not cartesian, f"CartesianProduct in: {cartesian}"
