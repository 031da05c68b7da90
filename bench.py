"""Benchmark runner (driver contract: prints ONE JSON line).

Measures (a) the flagship extraction pipeline — documents/sec over a
deterministic synthetic page corpus (the BASELINE.json target metric) — and
(b) headline operator queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Protocol (BASELINE.md): a warm-up pass on a small slice first, then
wall-clock over the action. The synthetic corpus is written once to /tmp
and reused, so two-parallelism scaling runs (tools/bench_scaling.py) see
identical input bytes.

Env knobs:
  SPARK_GRAFT_SF_DIR   testdata dir            (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] parallelism    (default 32)
  SPARK_GRAFT_BENCH_DOCS  corpus size          (default 100000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pdf_table_extractor_spark.session import build_spark  # noqa: E402

HEADLINE = [
    "q_agg_count",
    "q_join_inner",
    "q_broadcast_join",
    "q_session_segment",
    "q_ffill_window",
    "q_locale_number",
    "q_split_explode",
    "q_sort",
    "q_line_dedup",
    "q_auto_columns",
    "q_dedup_substring",
    "q_unigram_ppl",
    "q_tfidf_topk",
    "q_pagerank",
    "q_assign_shards",
    # round-3 additions: the two most join/window-heavy previously-unbenched
    # ops, so sf0.1 catches regressions the sf0.01 contract scale hides.
    "q_fuzzy_dedup_keep",
    "q_repetition_stats",
    "q_pack_sequences",
    "q_dsir_weights",
    # round-3 late additions: the retrieval + LM-scoring headliners (the
    # two heaviest new join/aggregate topologies — BM25's shared-tf
    # exchange fan-out and Kneser-Ney's single bigram-explode LM train).
    "q_bm25_topk",
    "q_kn_bigram_ppl",
    # the temporal-alignment family (round-3 continuation): joinless
    # as-of (union + one exchange + ffill window) and the hierarchical
    # multi-grain rollup (one raw scan via exchange reuse)
    "q_asof_join",
    # round-4 session additions: the new extraction/web headliners —
    # jusText's shared-window classify+reassemble, C4's array-chain
    # cleaner, HTML table explode+pack, and winnowing's per-doc window
    # scan (the heaviest new array expression).
    "q_justext_main",
    "q_c4_clean",
    "q_table_markdown",
    "q_winnow_fingerprints",
    "q_hypertable_rollup",
    # CDC MERGE apply (reduce + full-outer join + resolution)
    "q_merge_upsert",
    # round-4: content-defined chunking — the heaviest pure-HOF text plan
    # (gear-hash filter + nested binds); regressions in HOF re-inlining
    # or Janino fallback show up here first
    "q_cdc_chunks",
    # round-4 late: corpus drift — dual unigram aggregates + a
    # vocabulary-scale full-outer join + 1-row totals broadcast (a join
    # topology no other headliner exercises)
    "q_corpus_divergence",
    # round-5: the unigram tokenizer trainer — the deepest expression
    # fold in the engine (nested HOF Viterbi DP) + an iterative
    # vocabulary-scale EM loop; Janino/codegen regressions on big
    # aggregate folds show up here first
    "q_unigram_tokenizer",
]


def ensure_corpus(spark, n_docs: int) -> str:
    """Cached synthetic corpus, regenerated when synth.py is newer than the
    cache (same stale-staging trap job.stage_pages guards against: a synth
    change with an old /tmp cache would silently bench outdated pages)."""
    from pdf_table_extractor_spark import synth

    path = f"/tmp/bench_pages_{n_docs}"
    marker = os.path.join(path, "_SUCCESS")
    fresh = os.path.exists(marker) and os.stat(marker).st_mtime >= os.stat(
        synth.__file__
    ).st_mtime
    if not fresh:
        synth.synth_spark(spark, n_docs, parallelism=64).write.mode("overwrite").parquet(path)
    return path


def run_count(df) -> int:
    """Force full execution; count() after a cache-free action chain."""
    return df.count()


def _copy_probe_once(mb: int, reps: int, q) -> None:
    import numpy as np

    a = np.arange(mb * 1024 * 1024 // 8, dtype=np.int64)
    b = np.empty_like(a)
    for warm in (True, False):
        t0 = time.perf_counter()
        for _ in range(reps):
            np.copyto(b, a)
            np.copyto(a, b)
        dt = time.perf_counter() - t0
    q.put(dt)


def host_copy_probe(active: int = 4, mb: int = 50, reps: int = 120) -> float:
    """Memory-bus contention probe, run in-band so the bench JSON
    self-documents its regime (round-4 verdict ask: a throughput dip on
    this shared host is hardware attribution only if the probe says so).
    Returns the slowdown of a 50 MB copy loop at `active` concurrent
    processes vs 1 — ~1.0 = quiet host, ≫1 = bus-bound window (r3/r4
    sessions measured 1.1-1.8× during contended benches). Same probe as
    tools/probe_host.py, fewer reps to keep bench cheap."""
    import multiprocessing as mp

    def run(k: int) -> float:
        ctx = mp.get_context("spawn")
        q = ctx.Queue()
        procs = [
            ctx.Process(target=_copy_probe_once, args=(mb, reps, q))
            for _ in range(k)
        ]
        for p in procs:
            p.start()
        vals = sorted(q.get() for _ in procs)
        for p in procs:
            p.join()
        return vals[len(vals) // 2]

    base = run(1)
    return round(run(active) / base, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "100000"))
    # Probe BEFORE Spark starts: measures contention from OTHER tenants of
    # this shared host, not our own executor threads.
    probe_pre = host_copy_probe()
    spark = build_spark(
        app_name="bench", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8)
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pdf_table_extractor_spark import contracts
    from pdf_table_extractor_spark import contracts_curation  # noqa: F401 — registers curation queries
    from pdf_table_extractor_spark.plans.extract import extract

    corpus_path = ensure_corpus(spark, n_docs)

    # ---- warm-up: full pipeline once (codegen compile, python worker pool,
    # AQE) + one query; then time three further runs of the same plan and
    # report the MEDIAN — the steady-state number a long-running job sees
    # (cold-start measured separately in BENCH/BASELINE.md's per-action
    # floor analysis; this shared host shows ±15-20% interference bursts,
    # so a single timed run is ±0.1 in any derived ratio — see the
    # BENCH/BASELINE.md measurement protocol).
    pages = spark.read.parquet(corpus_path)
    df = extract(pages, num_partitions=cpus)
    n_out = run_count(df)
    qs = contracts.queries()
    run_count(qs["q_agg_count"](spark, sf_dir))

    extract_reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_count(df)
        extract_reps.append(round(time.perf_counter() - t0, 3))
    extract_sec = sorted(extract_reps)[1]
    docs_per_sec = n_docs / extract_sec

    # ---- headline operator queries
    q_times: dict[str, float] = {}
    total = extract_sec
    for name in HEADLINE:
        t0 = time.perf_counter()
        run_count(qs[name](spark, sf_dir))
        q_times[name] = round(time.perf_counter() - t0, 3)
        total += q_times[name]

    q_times["extract_pipeline"] = round(extract_sec, 3)

    # Scaling-evidence summaries: SCALARS ONLY (efficiencies + medians).
    # Round 3's driver capture kept only the LAST 4k of stdout and the
    # embedded full evidence dicts pushed the per-query times off the
    # front of the line — so the blobs are now ~150 bytes each, the
    # queries dict is the LAST key of the object (the kept tail always
    # retains it), and a hard size guard drops scaling detail before it
    # ever drops a query time. Full evidence (levels, reps, hardware
    # controls) stays in BENCH/*.json.
    def scaling_summary(fname: str) -> dict | None:
        path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH", fname
        )
        if not os.path.exists(path):
            return None
        with open(path) as f:
            evidence = json.load(f)
        keep = {
            k: v
            for k, v in evidence.items()
            if isinstance(v, (int, float))
            and ("efficiency" in k or "median" in k or k.startswith("n_docs"))
        }
        keep["file"] = fname
        return keep

    scaling_keys = {
        "scaling": "scaling_result.json",
        "scaling_1_to_4": "scaling_1_4.json",
        "scaling_1_to_4_r3": "scaling_r3_14.json",
        # pinned (SPARK_GRAFT_TASKSET=1) = the cgroup-bounded executor
        # analogue; unpinned rerun alongside (BENCH/BASELINE.md §3)
        "scaling_1_to_4_r3_pinned": "scaling_r3d_14.json",
        "scaling_1_to_4_r3_unpinned_rerun": "scaling_r3c_14.json",
        "scaling_1_to_4_r4": "scaling_r4_14.json",
        # round-4 in-flight-probed campaigns (Q/R): every rep carries the
        # bus state measured DURING its legs; assembly conditions on
        # per-leg-type floors (BENCH/BASELINE.md round-4 section)
        "scaling_1_to_4_r4_probed": "scaling_r4q_14.json",
        # round-5 probe-gated pinned campaign (3 reps, every rep bracketed
        # AND in-flight-probed; bus_clean_* conditions on per-leg bus
        # floors — BENCH/BASELINE.md round-5 section)
        "scaling_1_to_4_r5_probed": "scaling_r5_14.json",
    }

    sf = sf_dir.rstrip("/").split("sf")[-1]
    payload = {
        "metric": "total_wall_sec",
        "value": round(total, 3),
        "unit": "sec",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "extract_docs": n_docs,
        "extract_docs_out": n_out,
        "extract_docs_per_sec": round(docs_per_sec, 1),
        "extract_reps_sec": extract_reps,
        "probe_copy_slowdown_4": probe_pre,
        "probe_copy_slowdown_4_post": host_copy_probe(),
        "cpus": cpus,
    }
    for key, fname in scaling_keys.items():
        summary = scaling_summary(fname)
        if summary is not None:
            payload[key] = summary
    payload["queries"] = q_times  # LAST: survives a kept-tail truncation
    line = json.dumps(payload)
    # driver keeps ~4k; never let scaling crowd queries. Drop the OLDEST
    # evidence first so the newest campaign summary survives longest.
    drop_order = [
        "scaling_1_to_4",
        "scaling_1_to_4_r3",
        "scaling_1_to_4_r3_unpinned_rerun",
        "scaling_1_to_4_r3_pinned",
        "scaling",
        "scaling_1_to_4_r4",
        "scaling_1_to_4_r4_probed",
        "scaling_1_to_4_r5_probed",
    ]
    while len(line) > 3800 and drop_order:
        payload.pop(drop_order.pop(0), None)
        line = json.dumps(payload)
    print(line)


if __name__ == "__main__":
    main()
