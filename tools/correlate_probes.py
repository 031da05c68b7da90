"""Correlate each scaling rep's bracketing host probe with its leg walls.

The shared-host attribution argument (BENCH/BASELINE.md) predicts that
the 4-core leg's wall tracks the host's memory-bus state (the 50 MB-copy
probe) while the 1-core leg doesn't. This prints the per-rep pairing so
the correlation is inspectable rather than asserted.

Usage: python tools/correlate_probes.py <prefix>     e.g. r3c or r3d
Reads BENCH/reps/<prefix>_14_rep{i}.json + <prefix>_probe_pre{i}.json.
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> None:
    prefix = sys.argv[1] if len(sys.argv) > 1 else "r3d"
    rows = []
    for i in range(1, 10):
        try:
            with open(f"BENCH/reps/{prefix}_14_rep{i}.json") as f:
                rep = json.load(f)
            with open(f"BENCH/reps/{prefix}_probe_pre{i}.json") as f:
                probe = json.load(f)
        except OSError:
            break
        rows.append(
            {
                "rep": i,
                "copy_slowdown_4_active": probe["copy_slowdown_4_active_vs_1"],
                "copy_1_active_sec": probe.get("copy_1_active_sec"),
                "local1_sec": rep["local1_sec"],
                "local4_sec": rep["local4_sec"],
                "eff_whole": rep["scaling_efficiency_1_to_4"],
                "eff_marginal": rep["marginal_scaling_efficiency_1_to_4"],
            }
        )
    for r in rows:
        print(json.dumps(r))
    if len(rows) >= 3:
        def pearson(xs, ys):
            mx, my = statistics.fmean(xs), statistics.fmean(ys)
            num = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
            den = (
                sum((x - mx) ** 2 for x in xs) * sum((y - my) ** 2 for y in ys)
            ) ** 0.5
            return num / den if den else float("nan")

        probe_v = [r["copy_slowdown_4_active"] for r in rows]
        print(
            json.dumps(
                {
                    "pearson_probe_vs_local4_wall": round(
                        pearson(probe_v, [r["local4_sec"] for r in rows]), 3
                    ),
                    "pearson_probe_vs_local1_wall": round(
                        pearson(probe_v, [r["local1_sec"] for r in rows]), 3
                    ),
                    "pearson_probe_vs_eff": round(
                        pearson(probe_v, [r["eff_whole"] for r in rows]), 3
                    ),
                }
            )
        )


if __name__ == "__main__":
    main()
