"""In-flight memory-bus probe for the scaling campaign.

The bracketing snapshot probes (tools/probe_host.py before/after a rep)
turned out to be weak predictors of rep quality: the shared host's bus
drifts minute-to-minute INSIDE an ~11-minute rep (campaign A's cleanest
pre-probe produced a 0.57 rep; a 1.28 pre-probe produced a 0.97 rep).
This sampler measures ambient bus pressure DURING each leg instead: a
short single-threaded copy burst every ``period`` seconds (~3-5% duty
cycle, small enough not to become the contention it measures; 32 MB per
copy so the burst is DRAM-bound, not cache-resident — 8 MB bursts sat
inside LLC and barely registered ambient pressure), recorded
as a time series. A leg's ambient slowdown is its burst-time median
normalized by the campaign-wide minimum burst time (the host's clean
floor) — reps can then be conditioned on the bus state that actually
held WHILE they ran, not on a 15-second snapshot an arbitrary drift
away.

The sampler thread lives in the (un-pinned) campaign parent process, so
a taskset-pinned leg never shares its cores with the probe; they share
only the bus — which is the thing being measured.
"""

from __future__ import annotations

import threading
import time


class BusProbe:
    def __init__(self, period: float = 5.0, burst_mb: int = 32, burst_reps: int = 8):
        self.period = period
        self.burst_mb = burst_mb
        self.burst_reps = burst_reps
        self.samples: list[tuple[float, float]] = []  # (t_monotonic, burst_sec)
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def _burst(self) -> float:
        import numpy as np

        a = np.arange(self.burst_mb * 1024 * 1024 // 8, dtype=np.int64)
        b = np.empty_like(a)
        t0 = time.perf_counter()
        for _ in range(self.burst_reps):
            np.copyto(b, a)
            np.copyto(a, b)
        return time.perf_counter() - t0

    def _loop(self) -> None:
        while not self._stop.is_set():
            t = time.monotonic()
            self.samples.append((t, self._burst()))
            self._stop.wait(self.period)

    def start(self) -> "BusProbe":
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> dict:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=30)
        times = sorted(s for _, s in self.samples)
        n = len(times)
        if not n:
            return {"n_samples": 0}
        return {
            "n_samples": n,
            "period_s": self.period,
            "burst_mb": self.burst_mb,
            "burst_reps": self.burst_reps,
            "burst_min_s": round(times[0], 4),
            "burst_median_s": round(times[n // 2], 4),
            "burst_p90_s": round(times[min(n - 1, (9 * n) // 10)], 4),
            "burst_max_s": round(times[-1], 4),
            # slowdown vs this leg's own best sample — a LOWER bound on
            # ambient contention (the leg may never have seen the clean
            # floor); campaign-level analysis re-normalizes by the
            # minimum across ALL legs/reps
            "median_over_min": round(times[n // 2] / times[0], 3),
            "samples_s": [round(s, 4) for _, s in self.samples],
        }
