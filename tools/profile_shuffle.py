"""Shuffle-byte profile of the extract job (UI REST recipe, CLAUDE.md).

Runs extract() on the cached bench corpus with the UI enabled, then dumps
per-stage shuffle read/write bytes + records + task time vs executorCpuTime,
so byte-level fixes are judged against measured bytes, not guesses.

Usage: python tools/profile_shuffle.py [n_docs] [cpus]
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_table_extractor_spark.session import build_spark  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = build_spark(
        app_name="profile_shuffle",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pdf_table_extractor_spark.plans.extract import extract
    import bench

    corpus = bench.ensure_corpus(spark, n_docs)
    pages = spark.read.parquet(corpus)
    df = extract(pages, num_partitions=cpus)
    df.count()  # warm-up (codegen + python workers)
    t0 = time.perf_counter()
    df.count()
    wall = time.perf_counter() - t0

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages?status=complete")
    )
    # keep only the timed (second) run — warm-up stages carry codegen
    # compile time in runT and would double every byte column
    import datetime

    cutoff = datetime.datetime.now(datetime.timezone.utc) - datetime.timedelta(
        seconds=wall + 2
    )
    rows = []
    for s in stages:
        sub = s.get("submissionTime")
        if sub:
            ts = datetime.datetime.strptime(
                sub.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z"
            )
            if ts < cutoff:
                continue
        rows.append(
            {
                "stage": s["stageId"],
                "name": s["name"].split("\n")[0][:60],
                "tasks": s["numCompleteTasks"],
                "runT_s": round(s["executorRunTime"] / 1e3, 1),
                "cpuT_s": round(s["executorCpuTime"] / 1e9, 1),
                "in_rec": s["inputRecords"],
                "in_MB": round(s["inputBytes"] / 1e6, 1),
                "sh_read_MB": round(s["shuffleReadBytes"] / 1e6, 1),
                "sh_read_rec": s["shuffleReadRecords"],
                "sh_write_MB": round(s["shuffleWriteBytes"] / 1e6, 1),
                "sh_write_rec": s["shuffleWriteRecords"],
            }
        )
    rows.sort(key=lambda r: -r["runT_s"])
    print(f"wall={wall:.1f}s  n_docs={n_docs} cpus={cpus} (timed run's stages only)")
    hdr = list(rows[0].keys())
    print(" | ".join(hdr))
    for r in rows:
        print(" | ".join(str(r[k]) for k in hdr))
    tot_w = sum(r["sh_write_MB"] for r in rows)
    tot_r = sum(r["sh_read_MB"] for r in rows)
    print(f"TOTAL shuffle write {tot_w:.0f} MB / read {tot_r:.0f} MB (timed run)")
    spark.stop()


if __name__ == "__main__":
    main()
