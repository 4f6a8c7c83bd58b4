#!/usr/bin/env bash
# Round-16 end-of-round bench sequence (machine must be otherwise idle):
#   1. fresh sf1 data via tools.GenSf (the non-replicated scaling point)
#   2. sf0.1 matching pair via tools/bench_pair.py — draws guarded
#      full-suite benches until two ACCEPTED draws agree (total ≤5%,
#      headline ≤0.5%) and lands the pair with machine-readable
#      "pair" metadata (r15 judge item 3: the rule lives in the tool,
#      not in round narrative)
#   3. sf1 guarded draw at CPUS=32 (driver parity — the r15 cpu8 draw
#      mis-measured CPU-bound gates 2-4x; see calib_median.json note)
set -euo pipefail
cd /root/repo

if [ ! -d /tmp/gensf1 ]; then
  echo "=== GenSf sf1 ==="
  SPARK_GRAFT_CPUS=16 tools/run_main.sh graft.tools.GenSf /tmp/gensf1 10
fi

echo "=== sf0.1 matching pair ==="
SPARK_GRAFT_CPUS=8 python3 tools/bench_pair.py /root/testdata/sf0.1 \
  /root/repo/BENCH_sf0.1_r16local.json --max-draws 6 --sleep 60

echo "=== sf1 guarded draw (CPUS=32) ==="
SPARK_GRAFT_CPUS=32 python3 tools/bench_guard.py /tmp/gensf1 \
  /root/repo/BENCH_sf1_r16.json --max-tries 3 --sleep 120

echo "=== done ==="
