"""A/B harness for the word-exchange byte diet (round-4 verdict stretch
ask #8): run the full extract over the cached bench corpus with the UI
enabled, then report per-stage shuffle write bytes + task time so the
banestes word exchange's size is measured, not guessed.

Usage: python tools/bench_word_exchange.py [n_docs] [reps] [--flat]
--flat patches the layout branch back to the one-row-per-word producer
(packed=False) so the two variants run from identical sessions.
Prints one JSON line with wall times and the top shuffle-writing stages.
"""

from __future__ import annotations

import functools
import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from pdf_table_extractor_spark.session import build_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--flat"]
    flat = "--flat" in sys.argv
    n_docs = int(args[0]) if len(args) > 0 else 100_000
    reps = int(args[1]) if len(args) > 1 else 3

    if flat:
        from pdf_table_extractor_spark.operators import lines
        from pdf_table_extractor_spark.plans import profiles as profmod

        profmod.layout_lines = functools.partial(lines.layout_lines, packed=False)

    spark = build_spark(
        app_name="word-exchange-ab",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    from bench import ensure_corpus
    from pdf_table_extractor_spark.plans.extract import extract

    corpus = ensure_corpus(spark, n_docs)
    pages = spark.read.parquet(corpus)
    df = extract(pages, num_partitions=32)
    df.count()  # warm-up

    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        df.count()
        walls.append(round(time.perf_counter() - t0, 3))

    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    stages = json.loads(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages?status=complete").read()
    )
    # keep the heaviest shuffle-writing stages of the LAST rep's job set
    rows = [
        {
            "stage": s["stageId"],
            "name": s["name"].split("\n")[0][:80],
            "shuffle_write_mb": round(s["shuffleWriteBytes"] / 1e6, 1),
            "shuffle_write_records": s["shuffleWriteRecords"],
            "task_time_sec": round(s["executorRunTime"] / 1e3, 1),
            "cpu_sec": round(s["executorCpuTime"] / 1e9, 1),
            "input_records": s["inputRecords"],
        }
        for s in stages
    ]
    rows.sort(key=lambda r: -r["shuffle_write_mb"])
    print(json.dumps({
        "variant": "flat" if flat else "packed",
        "n_docs": n_docs,
        "walls_sec": walls,
        "median_wall_sec": sorted(walls)[len(walls) // 2],
        "top_shuffle_stages": rows[:14],
    }))


if __name__ == "__main__":
    main()
