"""Assemble the repeated-measurement scaling evidence into
BENCH/scaling_result.json.

Protocol (BENCH/BASELINE.md): single-shot wall ratios on this shared host
are +-0.08 in efficiency, so `tools/bench_scaling.py` is run as a campaign
of independent reps (fresh JVMs, identical corpus) and the headline is the
MEDIAN over reps of both the whole-run and the marginal (4-point
decomposition) efficiency, with every raw rep preserved in the artifact.

Usage: python tools/assemble_scaling.py rep1.json [rep2.json ...]
       (each arg: a bench_scaling.py output JSON, or a campaign log whose
        last line is that JSON)

Hardware controls characterize the HOST, not the build. Pass
``--controls BENCH/host_controls_rN.json`` (tools/probe_host.py output,
re-measured per session — round-3 lesson: the sandbox VM's bus behavior
changes between sessions) to attach the current session's controls; the
round-2 session's controls are kept alongside for cross-session reads.
"""

from __future__ import annotations

import json
import statistics
import sys

ROUND2_SESSION_CONTROLS = {
    "single_thread_cpu_slowdown_8_active_vs_2": 1.008,
    "single_thread_cpu_slowdown_32_active_vs_2": 1.317,
    "memory_copy_slowdown_8_active_vs_2": 1.79,
    "memory_copy_slowdown_32_active_vs_2": 4.16,
    "local_cluster_4x8_docs_per_sec": 18752,
    "single_jvm_local32_docs_per_sec_same_build": 24393,
}

PROTOCOL = (
    "campaign of independent reps (fresh JVMs, same parquet corpus); each rep "
    "is a 4-point decomposition T_c(n) = fixed_c + marginal_c*n at two corpus "
    "sizes per parallelism level; headline = median over reps of whole-run AND "
    "marginal (steady-state) efficiency; raw reps preserved below. Repetition "
    "is required because this shared host shows +-15% interference bursts "
    "(see BENCH/BASELINE.md controls)."
)


def load_rep(path: str) -> dict:
    with open(path) as f:
        text = f.read().strip()
    try:
        return json.loads(text)
    except json.JSONDecodeError:
        for line in reversed(text.splitlines()):
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
    raise ValueError(f"no JSON rep found in {path}")


def main() -> None:
    argv = sys.argv[1:]
    dest = "/root/repo/BENCH/scaling_result.json"
    controls = None
    if argv and argv[0] == "--out":
        dest = f"/root/repo/BENCH/{argv[1]}"
        argv = argv[2:]
    if argv and argv[0] == "--controls":
        with open(argv[1]) as f:
            controls = json.load(f)
        argv = argv[2:]
    reps = [load_rep(p) for p in argv]
    if not reps:
        raise SystemExit("usage: assemble_scaling.py [--out name.json] rep.json [...]")

    levels = sorted(
        int(k[len("local"):-len("_sec")])
        for k in reps[0]
        if k.startswith("local")
        and k.endswith("_sec")
        and k[len("local"):-len("_sec")].isdigit()
    )
    pairs = [(lo, hi) for lo, hi in zip(levels, levels[1:])]

    out = {
        "n_docs": reps[0]["n_docs"],
        "n_docs_small": reps[0]["n_docs_small"],
        "levels": levels,
        "protocol": PROTOCOL,
        "reps": reps,
    }
    for c in levels:
        walls = [r[f"local{c}_sec"] for r in reps if r.get(f"local{c}_sec")]
        out[f"median_local{c}_sec"] = round(statistics.median(walls), 1)
        out[f"median_local{c}_docs_per_sec"] = round(
            statistics.median(r[f"local{c}_docs_per_sec"] for r in reps), 1
        )
        out[f"median_local{c}_marginal_docs_per_sec"] = round(
            statistics.median(r[f"local{c}_marginal_docs_per_sec"] for r in reps), 1
        )
    for lo, hi in pairs:
        whole = [r[f"scaling_efficiency_{lo}_to_{hi}"] for r in reps]
        marg = [r[f"marginal_scaling_efficiency_{lo}_to_{hi}"] for r in reps]
        out[f"scaling_efficiency_{lo}_to_{hi}"] = round(statistics.median(whole), 3)
        out[f"marginal_scaling_efficiency_{lo}_to_{hi}"] = round(
            statistics.median(marg), 3
        )
        # per-actual-core efficiency (round-4: sidecar /proc accounting per
        # leg) — the contention-robust reading; present when the campaign
        # ran with SPARK_GRAFT_SIDECAR=1.
        pac = [
            r[f"per_actual_core_efficiency_{lo}_to_{hi}"]
            for r in reps
            if f"per_actual_core_efficiency_{lo}_to_{hi}" in r
        ]
        if pac:
            out[f"median_per_actual_core_efficiency_{lo}_to_{hi}"] = round(
                statistics.median(pac), 3
            )
    cores = [
        r["sidecar_cpu"][k]["steady_state_cores"]
        for r in reps
        for k in r.get("sidecar_cpu", {})
        if str(r["n_docs"]) in k and "steady_state_cores" in r["sidecar_cpu"][k]
    ]
    if cores:
        out["sidecar_steady_state_cores_big_runs"] = cores

    # in-flight bus conditioning (round-4: tools/bus_probe.py): the probe
    # measures copy-burst time DURING each leg, but the engine's own
    # bandwidth use is part of that signal — an absolute threshold can
    # never be met mid-leg. Self-load is differenced out by construction
    # instead: every rep runs IDENTICAL code+corpus per leg type, so the
    # campaign-wide minimum burst-median for a given leg type is the
    # quietest EXTERNAL window observed under that exact self-load, and a
    # rep's ambient ratio over that per-leg floor isolates external
    # interference. Reps whose big legs all sit within the threshold of
    # their leg floors are 'bus-clean relative' — the honest answer to
    # "what does the engine scale like when the shared host isn't busy",
    # conditioned on state measured during the run, not cherry-picked.
    probed = [r for r in reps if r.get("bus_probe")]
    if probed:
        leg_floor: dict[str, float] = {}
        for r in probed:
            for c in levels:
                key = f"local{c}_big"
                p = r["bus_probe"].get(f"local{c}_n{r['n_docs']}")
                if p and p.get("n_samples"):
                    m = p["burst_median_s"]
                    leg_floor[key] = min(leg_floor.get(key, m), m)
        clean_threshold = 1.15
        for r in probed:
            for c in levels:
                p = r["bus_probe"].get(f"local{c}_n{r['n_docs']}")
                if p and p.get("n_samples"):
                    r[f"bus_ambient_local{c}_big"] = round(
                        p["burst_median_s"] / leg_floor[f"local{c}_big"], 3
                    )
        out["bus_leg_floor_s"] = {k: round(v, 4) for k, v in leg_floor.items()}
        out["bus_clean_threshold"] = clean_threshold
        # the floor rep is clean by definition — with few probed reps the
        # conditioning is weak; n_bus_probed_reps makes that visible
        out["n_bus_probed_reps"] = len(probed)
        for lo, hi in pairs:
            clean = [
                r
                for r in probed
                if r.get(f"bus_ambient_local{lo}_big", 99) <= clean_threshold
                and r.get(f"bus_ambient_local{hi}_big", 99) <= clean_threshold
            ]
            out[f"n_bus_clean_reps_{lo}_to_{hi}"] = len(clean)
            if clean:
                out[f"bus_clean_scaling_efficiency_{lo}_to_{hi}"] = round(
                    statistics.median(
                        r[f"scaling_efficiency_{lo}_to_{hi}"] for r in clean
                    ),
                    3,
                )
                out[f"bus_clean_marginal_efficiency_{lo}_to_{hi}"] = round(
                    statistics.median(
                        r[f"marginal_scaling_efficiency_{lo}_to_{hi}"] for r in clean
                    ),
                    3,
                )
    out["hardware_controls"] = (
        {"this_session": controls, "round2_session": ROUND2_SESSION_CONTROLS}
        if controls
        else ROUND2_SESSION_CONTROLS
    )

    print(json.dumps({k: v for k, v in out.items() if k not in ("reps", "protocol")}, indent=2))
    with open(dest, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {dest}")


if __name__ == "__main__":
    main()
