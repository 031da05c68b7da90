"""N→4N scaling evidence (BASELINE.json: efficiency ≥ 0.8 between two
cluster sizes; sandbox proxy = same job, same input, local[8] vs local[32]).

Runs the extraction pipeline over a large deterministic corpus in fresh
subprocesses (one JVM per parallelism level), measures docs/sec after a
warm-up pass, and writes BENCH/BASELINE.md. Corpus is sized so parallel
work dominates the fixed per-query floor (~11s of stage sequencing + python
worker spin-up measured at 100k docs — at bench scale that floor is noise).

Usage: python tools/bench_scaling.py [n_docs] (default 800000)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")

RUN_SNIPPET = """
import sys, time, json
sys.path.insert(0, "/root/repo")
from pdf_table_extractor_spark.session import build_spark
from pdf_table_extractor_spark.plans.extract import extract
cores = {cores}
spark = build_spark(master=f"local[{cores}]", shuffle_partitions={cores})
spark.sparkContext.setLogLevel("FATAL")
pages = spark.read.parquet("{corpus}")
extract(pages.limit(2000), num_partitions={cores}).count()   # warm: codegen, workers
df = extract(pages, num_partitions={cores})
t0 = time.perf_counter(); n = df.count(); dt = time.perf_counter() - t0
print("BENCH_JSON " + json.dumps({{"cores": cores, "n": n, "sec": dt}}))
spark.stop()
"""


def ensure_corpus(n_docs: int) -> str:
    path = f"/tmp/bench_pages_{n_docs}"
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    from pdf_table_extractor_spark import synth
    from pdf_table_extractor_spark.session import build_spark

    spark = build_spark(master="local[32]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("FATAL")
    synth.synth_spark(spark, n_docs, parallelism=256).write.mode("overwrite").parquet(path)
    spark.stop()
    return path


def run_level(cores: int, corpus: str) -> dict:
    code = RUN_SNIPPET.format(cores=cores, corpus=corpus)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3600
    )
    for line in out.stdout.splitlines():
        if line.startswith("BENCH_JSON "):
            return json.loads(line[len("BENCH_JSON "):])
    raise RuntimeError(f"no result from local[{cores}]:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000
    corpus = ensure_corpus(n_docs)
    # primary N→4N pair: 2→8 cores (single-JVM 32-thread contention makes
    # 8→32 unrepresentative of multi-executor scaling — see BENCH/BASELINE.md);
    # 32-core run included for absolute throughput.
    results = {n: run_level(n, corpus) for n in (2, 8, 32)}
    rate = {n: r["n"] / r["sec"] for n, r in results.items()}
    result = {"n_docs": n_docs}
    for n in (2, 8, 32):
        result[f"local{n}_sec"] = round(results[n]["sec"], 1)
        result[f"local{n}_docs_per_sec"] = round(rate[n], 1)
    result["scaling_efficiency_2_to_8"] = round((rate[8] / rate[2]) / 4, 3)
    result["scaling_efficiency_8_to_32"] = round((rate[32] / rate[8]) / 4, 3)
    print(json.dumps(result))
    os.makedirs("/root/repo/BENCH", exist_ok=True)
    with open("/root/repo/BENCH/scaling_result.json", "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
