#!/bin/bash
# Round-4 pinned 1->4 campaign WITH per-actual-core sidecar accounting.
# taskset bounds the whole process tree (JVM daemons + python UDF workers)
# to exactly N cores — the cgroup-bounded cluster-executor analogue — and
# the sidecar samples /proc to document how many cores each leg actually
# consumed, so the result is interpretable even when the host's memory bus
# is contended (probe files bracket every rep).
set -u
cd /root/repo
mkdir -p BENCH/reps
REPS="${1:-5}"
PREFIX="${2:-r4}"
for i in $(seq 1 "$REPS"); do
  python tools/probe_host.py 4 > BENCH/reps/${PREFIX}_probe_pre${i}.json 2>/dev/null
  SPARK_GRAFT_TASKSET=1 SPARK_GRAFT_SIDECAR=1 \
  SPARK_GRAFT_SCALING_LEVELS=1,4 SPARK_GRAFT_SCALING_OUT=tmp_${PREFIX}.json \
    python tools/bench_scaling.py 800000 100000 2>/dev/null | tail -5
  cp BENCH/tmp_${PREFIX}.json BENCH/reps/${PREFIX}_14_rep${i}.json
  echo "=== rep ${i} done ==="
done
python tools/probe_host.py 4 > BENCH/reps/${PREFIX}_probe_post.json 2>/dev/null
rm -f BENCH/tmp_${PREFIX}.json
echo CAMPAIGN_DONE
