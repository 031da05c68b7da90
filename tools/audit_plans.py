"""Plan-hygiene audit over the ENTIRE contract surface.

Builds every registered query's DataFrame at a small SF and scans its
EXECUTED plan for the anti-patterns that matter at 100 TB:

- ``BatchEvalPython``   — row-at-a-time Python UDF in the data plane
                          (the banned slow path; Arrow is the floor);
- ``CartesianProduct``  — an unconstrained all-pairs join;
- ``Exchange`` count    — shuffles (excluding broadcast/reused ones);
- ``ArrowEvalPython``   — Python seams (allowed, but counted so a new
                          one is a visible diff);
- ``WholeStageCodegen`` — fused spans (more is healthier).

Prints one JSON line per query plus a summary, and writes
``BENCH/plan_audit.json``. tests/test_plan_audit.py asserts the hard
invariants (zero BatchEvalPython, zero CartesianProduct) so a regression
fails the gate, not just the eyeball.

Usage: python tools/audit_plans.py [sf_dir]   (default /root/testdata/sf0.001)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo")


def audit(spark, sf_dir: str) -> dict:
    from pdf_table_extractor_spark import contracts, contracts_curation  # noqa: F401

    out: dict[str, dict] = {}
    for name, fn in contracts.queries().items():
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            out[name] = {
                "exchanges": plan.count("Exchange")
                - plan.count("BroadcastExchange")
                - plan.count("ReusedExchange"),
                "broadcast_exchanges": plan.count("BroadcastExchange"),
                "reused_exchanges": plan.count("ReusedExchange"),
                "cartesian": plan.count("CartesianProduct"),
                "batch_eval_python": plan.count("BatchEvalPython"),
                "arrow_eval_python": plan.count("ArrowEvalPython"),
                "map_in_pandas": plan.count("MapInPandas")
                + plan.count("FlatMapGroupsInPandas"),
                "codegen_spans": plan.count("WholeStageCodegen"),
            }
        except Exception as e:  # pragma: no cover - audit must not die mid-list
            out[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from pdf_table_extractor_spark.session import build_spark

    spark = build_spark(app_name="plan-audit", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("FATAL")
    per_query = audit(spark, sf_dir)
    spark.stop()

    ok = {k: v for k, v in per_query.items() if "error" not in v}
    summary = {
        "n_queries": len(per_query),
        "n_errors": len(per_query) - len(ok),
        "n_batch_eval_python": sum(v["batch_eval_python"] for v in ok.values()),
        "n_cartesian": sum(v["cartesian"] for v in ok.values()),
        "n_with_arrow_seams": sum(1 for v in ok.values() if v["arrow_eval_python"] or v["map_in_pandas"]),
        "total_exchanges": sum(v["exchanges"] for v in ok.values()),
        "errors": sorted(k for k, v in per_query.items() if "error" in v),
    }
    for name in sorted(per_query):
        print(json.dumps({"query": name, **per_query[name]}))
    print(json.dumps({"summary": summary}))
    os.makedirs("/root/repo/BENCH", exist_ok=True)
    with open("/root/repo/BENCH/plan_audit.json", "w") as f:
        json.dump({"summary": summary, "queries": per_query}, f, indent=2)


if __name__ == "__main__":
    main()
