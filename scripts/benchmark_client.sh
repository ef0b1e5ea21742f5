#!/usr/bin/env bash
# Client-side benchmark (reference scripts/benchmark_client.sh analogue):
# runs the HTTP pair at a given size and reports client-side span timings.
set -euo pipefail
ROWS=${ROWS:-256} COLS=${COLS:-128} LOGN=${LOGN:-8} PORT=${PORT:-8700}
python3 -u -m lumenos_tpu.apps.server --port "$PORT" --rows "$ROWS" \
  --cols "$COLS" --bench-mode &
SERVER_PID=$!
sleep 8
python3 -u -m lumenos_tpu.apps.client --server "http://127.0.0.1:$PORT" \
  --rows "$ROWS" --cols "$COLS" --logn "$LOGN" --point 7 --vdec --local-baseline
wait "$SERVER_PID" 2>/dev/null || true
