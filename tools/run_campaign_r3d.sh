#!/bin/bash
# Pinned-core 1->4 campaign: taskset bounds the WHOLE process tree (JVM
# daemons + python UDF workers) to exactly N cores, emulating a
# cgroup-bounded cluster executor. The unpinned variant (r3c) lets the
# 1-core leg's sidecar work ride free on idle host cores, deflating the
# measured ratio vs what a real N-core vs 4N-core cluster would show.
set -u
cd /root/repo
mkdir -p BENCH/reps
for i in 1 2 3 4 5; do
  python tools/probe_host.py 4 > BENCH/reps/r3d_probe_pre${i}.json 2>/dev/null
  SPARK_GRAFT_TASKSET=1 SPARK_GRAFT_SCALING_LEVELS=1,4 SPARK_GRAFT_SCALING_OUT=tmp_r3d.json \
    python tools/bench_scaling.py 800000 100000 2>/dev/null | tail -5
  cp BENCH/tmp_r3d.json BENCH/reps/r3d_14_rep${i}.json
  echo "=== rep ${i} done ==="
done
python tools/probe_host.py 4 > BENCH/reps/r3d_probe_post.json 2>/dev/null
rm -f BENCH/tmp_r3d.json
echo CAMPAIGN_DONE
