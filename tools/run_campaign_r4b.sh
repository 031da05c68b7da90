#!/bin/bash
# Round-4 campaign B: PROBE-GATED opportunistic pinned 1->4 reps.
#
# The sandbox host's memory bus drifts between contended (copy probe
# 1.4-1.9x at 4-active) and clean (1.00x) within a session — campaign A's
# two clean-probe reps read 0.836/0.967 whole efficiency while its three
# contended reps read 0.58-0.74 on identical code+corpus. This loop
# probes every cycle and fires a taskset-pinned sidecar-accounted rep
# ONLY when the instantaneous 4-active copy probe is at/below the gate,
# sleeping otherwise. The probe is a ~15 s snapshot while a rep spans
# ~11 min, so the gate screens out the WORST windows rather than
# guaranteeing a clean rep (campaign A's two cleanest-outcome reps fired
# at probes 1.25/1.28 and its post-probe read 1.00 — the bus drifts
# minute-to-minute); pre+post brackets and the sidecar accounting make
# each rep interpretable after the fact. Every probe (fired or not) is
# appended to the gate log.
#
# Usage: tools/run_campaign_r4b.sh [max_reps] [gate] [prefix]
set -u
cd /root/repo
mkdir -p BENCH/reps
MAX="${1:-5}"
GATE="${2:-1.05}"
PREFIX="${3:-r4b}"
LOG="BENCH/reps/${PREFIX}_gate_log.jsonl"
n=0
cycle=0
while [ "$n" -lt "$MAX" ]; do
  cycle=$((cycle + 1))
  # session coordination: the builder touches this file before running
  # its own Spark jobs (tests/bench) so a rep never fires into
  # self-inflicted contention
  if [ -e /tmp/engine_busy ]; then
    echo "cycle ${cycle}: engine_busy lock present, sleeping 60s"
    sleep 60
    continue
  fi
  probe=$(python tools/probe_host.py 4 2>/dev/null)
  echo "{\"cycle\": ${cycle}, \"probe\": ${probe}}" >> "$LOG"
  copy=$(echo "$probe" | python -c "import json,sys; print(json.load(sys.stdin)['copy_slowdown_4_active_vs_1'])")
  ok=$(python -c "print(1 if ${copy} <= ${GATE} else 0)")
  if [ "$ok" = "1" ]; then
    n=$((n + 1))
    echo "$probe" > BENCH/reps/${PREFIX}_probe_pre${n}.json
    echo "=== cycle ${cycle}: CLEAN (copy ${copy}) -> firing rep ${n} ==="
    # reverse lock: the builder checks this before starting its own Spark
    # work so a mid-flight rep is never polluted from the other side
    touch /tmp/rep_running
    SPARK_GRAFT_TASKSET=1 SPARK_GRAFT_SIDECAR=1 SPARK_GRAFT_BUSPROBE=1 \
    SPARK_GRAFT_SCALING_LEVELS=1,4 SPARK_GRAFT_SCALING_OUT=tmp_${PREFIX}.json \
      python tools/bench_scaling.py 800000 100000 2>/dev/null | tail -3
    cp BENCH/tmp_${PREFIX}.json BENCH/reps/${PREFIX}_14_rep${n}.json
    python tools/probe_host.py 4 > BENCH/reps/${PREFIX}_probe_post${n}.json 2>/dev/null
    rm -f /tmp/rep_running
    echo "=== rep ${n} done ==="
  else
    echo "cycle ${cycle}: contended (copy ${copy}), sleeping 90s"
    sleep 90
  fi
done
rm -f BENCH/tmp_${PREFIX}.json
echo CAMPAIGN_DONE
