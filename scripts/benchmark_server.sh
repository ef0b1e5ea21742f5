#!/usr/bin/env bash
# Server-side benchmark sweep (reference scripts/benchmark_server.sh analogue).
# Runs bench.py across the reference's benchmark grid and collects JSON lines.
set -euo pipefail
OUT=${OUT:-results_tpu}
mkdir -p "$OUT"
for cfg in "2048 1024 12" "4096 2048 12" "8192 4096 13" "16384 4096 14"; do
  set -- $cfg
  rows=$1; cols=$2; logn=$3
  echo "== ${rows}x${cols} LogN=${logn} =="
  LUMENOS_BENCH_ROWS=$rows LUMENOS_BENCH_COLS=$cols LUMENOS_BENCH_LOGN=$logn \
    python3 -u bench.py 2> "$OUT/bench_${rows}x${cols}_${logn}.log" \
    | tee -a "$OUT/results.jsonl"
done
