"""Per-branch extraction cost profiler (the round-2/3 hot-loop workflow).

Times `extract(pages, {name: profile})` per profile over the cached bench
corpus so branch regressions stand out. Notes for reading the numbers:

- Each measurement carries the FULL-corpus fixed cost (the shared salt
  exchange writes all docs, the sentinel groupBy touches every url) —
  ofx/bradesco (~1.4 s) is the floor, not zero.
- The FIRST measured branch absorbs residual warm-up (python worker pool
  ramp at full partition count); order a throwaway branch first or repeat
  the branch of interest (the second sample is the trustworthy one).
- 8 cores is the stable timing regime on this host (32 saturates the
  memory bus and adds ±15% interference noise — BENCH/BASELINE.md).

Usage: python tools/profile_branches.py [profile ...]   (default: all)
Env:   SPARK_GRAFT_BENCH_DOCS (default 100000) selects the cached corpus.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_table_extractor_spark.session import build_spark  # noqa: E402
from pdf_table_extractor_spark.plans.extract import extract  # noqa: E402
from pdf_table_extractor_spark.plans.profiles import PROFILES  # noqa: E402


def main() -> None:
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "100000"))
    path = f"/tmp/bench_pages_{n_docs}"
    spark = build_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("FATAL")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from pdf_table_extractor_spark import synth

        synth.synth_spark(spark, n_docs, parallelism=64).write.mode(
            "overwrite"
        ).parquet(path)
    pages = spark.read.parquet(path).cache()
    pages.count()

    names = sys.argv[1:] or list(PROFILES)
    extract(pages.limit(2000), {names[0]: PROFILES[names[0]]}).count()  # warm
    for n in names:
        t0 = time.time()
        cnt = extract(pages, {n: PROFILES[n]}).filter("profile != ''").count()
        print(f"{n:12s} {time.time() - t0:7.2f}s  {cnt} docs", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
