#!/bin/bash
# Round-3 continuation: fresh 1->4 scaling campaign on a clean host
# (probe_host measured copy-slowdown 1.04 at 4-active this session —
# the round-2 regime, unlike the 1.11-1.50 host that blocked r3/r3b).
# Protocol: probe brackets each rep; 5 reps; assemble medians after.
set -u
cd /root/repo
mkdir -p BENCH/reps
for i in 1 2 3 4 5; do
  python tools/probe_host.py 4 > BENCH/reps/r3c_probe_pre${i}.json 2>/dev/null
  SPARK_GRAFT_SCALING_LEVELS=1,4 SPARK_GRAFT_SCALING_OUT=tmp_r3c.json \
    python tools/bench_scaling.py 800000 100000 2>/dev/null | tail -5
  cp BENCH/tmp_r3c.json BENCH/reps/r3c_14_rep${i}.json
  echo "=== rep ${i} done ==="
done
python tools/probe_host.py 4 > BENCH/reps/r3c_probe_post.json 2>/dev/null
rm -f BENCH/tmp_r3c.json
echo CAMPAIGN_DONE
