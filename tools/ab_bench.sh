#!/bin/bash
# Interleaved A/B canonical bench — the host-drift control.
#
# Host speed on this box swings 1.4x within a day, so comparing this
# round's canonical against LAST round's canonical conflates code and
# host. This script alternates OLD (the previous round's committed code,
# built once in a throwaway git worktree) and NEW (the current working
# tree) clean Bench runs in ONE session, so both code states sample the
# same host conditions. Feed the outputs to bench_agg.py:
#
#   tools/ab_bench.sh <old-ref> <n-pairs> /root/testdata/sf0.1 /tmp/ab
#   python3 tools/bench_agg.py /tmp/ab/new_run*.json \
#       --registry <verify_out>/oracle_sql.json \
#       --control /tmp/ab/ctl_run*.json --control-digest <old-ref> \
#       -o BENCH_clean_rN.json
#
# Runs are SERIAL (never two Spark JVMs at once — they race on scratch
# and co-tenant load inflates numbers 2x+). SPARK_GRAFT_SCRATCH_REUSE=1
# keys each code state's scratch on its own classfile digest, so the two
# states never share fixtures and runs 2..N of each state skip builds.
set -euo pipefail
REF=$1; N=$2; SF=$3; OUT=$4
mkdir -p "$OUT"
OUT=$(cd "$OUT" && pwd)  # control runs cd into the worktree — absolutize
WT=$(mktemp -d /tmp/graft_ab.XXXXXX)
rmdir "$WT"
git worktree add --detach "$WT" "$REF" >/dev/null
trap 'git worktree remove --force "$WT" >/dev/null 2>&1 || true' EXIT
echo "building control ($REF) in $WT ..."
(cd "$WT" && sbt -batch compile >/dev/null 2>&1)
for i in $(seq 1 "$N"); do
  echo "pair $i/$N: control run"
  (cd "$WT" && SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_REP_TIMES=1 \
    SPARK_GRAFT_SCRATCH_REUSE=1 sbt -batch "runMain graft.Bench" \
    2>/dev/null | grep '"metric"' | sed 's/^\[info\] //' > "$OUT/ctl_run$i.json")
  echo "pair $i/$N: new run"
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_REP_TIMES=1 \
    SPARK_GRAFT_SCRATCH_REUSE=1 sbt -batch "runMain graft.Bench" \
    2>/dev/null | grep '"metric"' | sed 's/^\[info\] //' > "$OUT/new_run$i.json"
done
echo "done: $OUT"
