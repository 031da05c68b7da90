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
    assert not errors, f"queries failed to plan: {errors}"
    row_python = {
        k: v["batch_eval_python"]
        for k, v in per_query.items()
        if v["batch_eval_python"]
    }
    assert not row_python, f"row-at-a-time Python UDFs in: {row_python}"
    cartesian = {k: v["cartesian"] for k, v in per_query.items() if v["cartesian"]}
    assert not cartesian, f"CartesianProduct in: {cartesian}"
