#!/bin/bash
# Re-record BASELINE under driver conditions: N separate cold-process runs.
set -u
cd /root/repo
N=${1:-3}
for i in $(seq 1 "$N"); do
  rm -rf /tmp/graft_stream3_* /tmp/graft_io_* /tmp/graft_fsink_* \
         /tmp/graft_lids_* /tmp/graft_store* /tmp/graft_wh*
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    sbt -batch "runMain graft.Bench" > "/root/repo/bench_r7_run$i.log" 2>&1
  echo "run $i exit=$?"
done
