"""A/B the shuffle/spill compression codec on the full extract() job.

Motivation: the scaling controls (BENCH/BASELINE.md) show this host's
memory bus saturates under concurrent streaming work — the engine's
residual scaling loss is bandwidth, not CPU. Shuffle compression trades
CPU (abundant at high core counts here) for bytes over that bus, so a
denser codec (zstd) may buy absolute throughput AND scaling efficiency
over the lz4 default. Measure, don't guess.

Usage: python tools/bench_codec.py [cores [n_docs]]   (default 8, 100000)
Runs each codec in a fresh JVM, warm-up pass first, prints one JSON line.
"""

from __future__ import annotations

import json
import subprocess
import sys

SNIPPET = """
import sys, time, json
sys.path.insert(0, "/root/repo")
from pdf_table_extractor_spark.session import build_spark
from pdf_table_extractor_spark.plans.extract import extract
cores = {cores}
spark = build_spark(
    master=f"local[{cores}]", shuffle_partitions={cores},
    extra_conf={{"spark.io.compression.codec": "{codec}"}},
)
spark.sparkContext.setLogLevel("FATAL")
pages = spark.read.parquet("{corpus}")
extract(pages.limit(2000), num_partitions={cores}).count()
df = extract(pages, num_partitions={cores})
t0 = time.perf_counter(); n = df.count(); dt = time.perf_counter() - t0
print("BENCH_JSON " + json.dumps({{"codec": "{codec}", "n": n, "sec": dt}}))
spark.stop()
"""


def run(codec: str, cores: int, corpus: str) -> dict:
    code = SNIPPET.format(cores=cores, codec=codec, corpus=corpus)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3600
    )
    for line in out.stdout.splitlines():
        if line.startswith("BENCH_JSON "):
            return json.loads(line[len("BENCH_JSON "):])
    raise RuntimeError(f"no result for {codec}:\n{out.stdout[-1500:]}\n{out.stderr[-1500:]}")


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    corpus = f"/tmp/bench_pages_{n_docs}"
    result = {"cores": cores, "n_docs": n_docs}
    for codec in ("lz4", "zstd", "snappy"):
        r = run(codec, cores, corpus)
        result[f"{codec}_sec"] = round(r["sec"], 1)
        result[f"{codec}_docs_per_sec"] = round(n_docs / r["sec"], 1)
        print(f"{codec}: {r['sec']:.1f}s", flush=True)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
