"""Host hardware controls for the scaling campaign (BENCH/BASELINE.md §3).

Measures, on THIS host at THIS moment, the single-thread slowdown of
(a) a pure-CPU loop and (b) a 50 MB memory-copy loop, when 1 vs K
processes run the same probe concurrently. A slowdown ≫1 at K active
means the host's shared memory bus (not the engine) bounds any K-way
parallel speedup measured in the same session.

Usage: python tools/probe_host.py [K ...]   (default: 4 8)
Prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _cpu_probe(n: int = 30_000_000) -> float:
    t0 = time.perf_counter()
    x = 1.0
    for i in range(n):
        x = x * 1.0000001 + 1e-9
    return time.perf_counter() - t0


def _copy_probe(mb: int = 50, reps: int = 300) -> float:
    import numpy as np

    a = np.arange(mb * 1024 * 1024 // 8, dtype=np.int64)
    b = np.empty_like(a)
    t0 = time.perf_counter()
    for _ in range(reps):
        np.copyto(b, a)
        np.copyto(a, b)
    return time.perf_counter() - t0


def _run(kind: str, q) -> None:
    fn = _cpu_probe if kind == "cpu" else _copy_probe
    fn()  # warm
    q.put(fn())


def measure(kind: str, active: int, trials: int = 2) -> float:
    best = float("inf")
    for _ in range(trials):
        q = mp.Queue()
        procs = [mp.Process(target=_run, args=(kind, q)) for _ in range(active)]
        for p in procs:
            p.start()
        vals = [q.get() for _ in procs]
        for p in procs:
            p.join()
        vals.sort()
        best = min(best, vals[len(vals) // 2])  # per-trial median process
    return best


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [4, 8]
    out = {}
    for kind in ("cpu", "copy"):
        base = measure(kind, 1)
        out[f"{kind}_1_active_sec"] = round(base, 3)
        for k in ks:
            t = measure(kind, k)
            out[f"{kind}_slowdown_{k}_active_vs_1"] = round(t / base, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
