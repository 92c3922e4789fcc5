#!/bin/bash
# Round-17 canonical driver: 3 interleaved A/B pairs against the r16 code
# (9e013c5), then 2 extra new-code runs for the min-of-5 canonical.
set -uo pipefail
cd /root/repo
mkdir -p bench_history/ab_r17
echo "[$(date +%T)] ab_bench 3 pairs starting"
tools/ab_bench.sh 9e013c5 3 /root/testdata/sf0.1 bench_history/ab_r17
for i in 4 5; do
  echo "[$(date +%T)] extra new run $i"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_REP_TIMES=1 \
    SPARK_GRAFT_SCRATCH_REUSE=1 sbt -batch "runMain graft.Bench" \
    2>/dev/null | grep '"metric"' | sed 's/^\[info\] //' \
    > "bench_history/ab_r17/new_run$i.json"
done
echo "[$(date +%T)] AB_BENCH_DONE"
