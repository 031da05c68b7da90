"""Process-tree CPU accounting sidecar (round-3 finding, promoted from the
ad-hoc snippet that produced BENCH/sidecar_cpu_r3c.json).

Why it exists: unpinned local[n] on a many-core host is NOT an n-core
machine — python UDF workers and JVM service threads ride free on idle
host cores (measured: local[1] consumes 2.49 cores steady-state, local[4]
5.31), so wall-ratio scaling efficiency from unpinned legs is deflated.
This sampler walks /proc every `interval` seconds, sums utime+stime over
the whole descendant tree of a root pid (remembering last-seen totals for
pids that exit, so reaped children aren't lost OR double-counted via the
parent's cutime), and reports:

- ``tree_cpu_sec``      — total CPU-seconds the tree consumed
- ``steady_state_cores``— least-squares slope of tree CPU vs wall over the
                          middle 60% of the run (warm-up/tear-down cut)

Library: ``TreeCpuSampler(pid).start() ... .stop() -> dict``.
CLI:     ``python tools/sidecar_cpu.py <cmd...>`` runs cmd and prints the
         accounting JSON on stderr-safe stdout last line (SIDECAR_JSON …).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

_TICK = os.sysconf("SC_CLK_TCK")


def _stat_fields(pid: int) -> tuple[int, float] | None:
    """(ppid, cpu_sec) for one pid, or None if it vanished."""
    try:
        with open(f"/proc/{pid}/stat", "rb") as f:
            raw = f.read().decode("ascii", "replace")
    except OSError:
        return None
    # comm may contain spaces/parens: split after the LAST ')'
    rest = raw.rsplit(")", 1)[1].split()
    ppid = int(rest[1])  # field 4 overall; rest[0] is state
    utime, stime = int(rest[11]), int(rest[12])  # fields 14, 15
    return ppid, (utime + stime) / _TICK


def _tree_cpu(root: int, last_seen: dict[int, float]) -> float:
    """Sum CPU-sec over root's live descendant tree; update `last_seen` so
    exited pids keep contributing their final observed total."""
    ppids: dict[int, int] = {}
    cpu: dict[int, float] = {}
    for entry in os.listdir("/proc"):
        if not entry.isdigit():
            continue
        pid = int(entry)
        f = _stat_fields(pid)
        if f is not None:
            ppids[pid], cpu[pid] = f
    members = {root}
    changed = True
    while changed:  # transitive closure over the ppid relation
        changed = False
        for pid, ppid in ppids.items():
            if ppid in members and pid not in members:
                members.add(pid)
                changed = True
    for pid in members:
        if pid in cpu:
            last_seen[pid] = max(cpu[pid], last_seen.get(pid, 0.0))
    return sum(last_seen.values())


class TreeCpuSampler:
    def __init__(self, pid: int, interval: float = 1.0):
        self.pid = pid
        self.interval = interval
        self.samples: list[tuple[float, float]] = []  # (wall, tree_cpu_sec)
        self._last_seen: dict[int, float] = {}
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def _run(self) -> None:
        t0 = time.monotonic()
        while not self._stop.is_set():
            self.samples.append((time.monotonic() - t0, _tree_cpu(self.pid, self._last_seen)))
            self._stop.wait(self.interval)
        self.samples.append((time.monotonic() - t0, _tree_cpu(self.pid, self._last_seen)))

    def start(self) -> "TreeCpuSampler":
        self._thread.start()
        return self

    def stop(self) -> dict:
        self._stop.set()
        self._thread.join()
        s = self.samples
        out = {
            "n_samples": len(s),
            "wall_sec": round(s[-1][0], 2) if s else 0.0,
            "tree_cpu_sec": round(s[-1][1], 2) if s else 0.0,
        }
        # middle 60%: cut JVM spin-up and tear-down tails
        if len(s) >= 5:
            lo, hi = int(len(s) * 0.2), int(len(s) * 0.8)
            mid = s[lo:hi]
            n = len(mid)
            mx = sum(t for t, _ in mid) / n
            my = sum(c for _, c in mid) / n
            den = sum((t - mx) ** 2 for t, _ in mid)
            if den > 0:
                slope = sum((t - mx) * (c - my) for t, c in mid) / den
                out["steady_state_cores"] = round(slope, 3)
        return out


def main() -> None:
    proc = subprocess.Popen(sys.argv[1:])
    sampler = TreeCpuSampler(proc.pid).start()
    rc = proc.wait()
    acct = sampler.stop()
    print("SIDECAR_JSON " + json.dumps(acct), flush=True)
    sys.exit(rc)


if __name__ == "__main__":
    main()
