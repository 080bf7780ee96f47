#!/bin/bash
# Re-record BASELINE under driver conditions: N separate cold-process runs.
# Usage: record_baseline.sh [N] [log_prefix]
#   N           number of cold runs (default 3)
#   log_prefix  log file prefix (default "bench"); writes <prefix>_run<i>.log
# Logs are gitignored raw artifacts — distill medians into BASELINE.md.
set -u
cd "$(dirname "$0")/.."
N=${1:-3}
PREFIX=${2:-bench}
for i in $(seq 1 "$N"); do
  rm -rf /tmp/graft_stream3_* /tmp/graft_io_* /tmp/graft_fsink_* \
         /tmp/graft_lids_* /tmp/graft_store* /tmp/graft_wh*
  # SPARK_GRAFT_RETRY=0: recordings are RAW single-pass measurements —
  # the band-retry defense is for driver runs judged AGAINST the record.
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_RETRY=0 \
    sbt -batch "runMain graft.Bench" > "${PREFIX}_run$i.log" 2>&1
  echo "run $i exit=$?"
done
