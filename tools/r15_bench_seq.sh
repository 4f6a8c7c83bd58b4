#!/usr/bin/env bash
# Round-15 end-of-round bench sequence (machine must be otherwise idle):
#   1. fresh sf1 data via tools.GenSf (the non-replicated scaling point)
#   2. sf0.1 full-suite guarded draw 1 (the matching-pair member)
#   3. sf0.1 full-suite guarded draw 2 (pair agreement check)
#   4. sf1 full-suite guarded draw
# Each draw lands its full per-query file; stdout tails go to the log.
set -euo pipefail
cd /root/repo

if [ ! -d /tmp/gensf1 ]; then
  echo "=== GenSf sf1 ==="
  SPARK_GRAFT_CPUS=16 tools/run_main.sh graft.tools.GenSf /tmp/gensf1 10
fi

echo "=== sf0.1 draw 1 ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=8 \
  SPARK_GRAFT_BENCH_OUT=/root/repo/BENCH_sf0.1_r15local.json \
  tools/run_main.sh graft.Bench

echo "=== sf0.1 draw 2 ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=8 \
  SPARK_GRAFT_BENCH_OUT=/root/repo/BENCH_sf0.1_r15local_draw2.json \
  tools/run_main.sh graft.Bench

echo "=== sf1 draw ==="
SPARK_GRAFT_SF_DIR=/tmp/gensf1 SPARK_GRAFT_CPUS=8 \
  SPARK_GRAFT_BENCH_OUT=/root/repo/BENCH_sf1_r15.json \
  tools/run_main.sh graft.Bench

echo "=== done ==="
