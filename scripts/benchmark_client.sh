#!/usr/bin/env bash
# Client-side benchmark (reference scripts/benchmark_client.sh analogue):
# runs the HTTP pair at a given size and reports client-side span timings.
set -euo pipefail
ROWS=${ROWS:-256} COLS=${COLS:-128} LOGN=${LOGN:-8} PORT=${PORT:-8700}
python3 -u -m lumenos_tpu.apps.server --port "$PORT" --rows "$ROWS" \
  --cols "$COLS" --bench-mode &
SERVER_PID=$!
# readiness poll (first jax compiles can take minutes)
for i in $(seq 1 120); do
  curl -s -o /dev/null --max-time 2 "http://127.0.0.1:$PORT/" && break
  sleep 5
done
python3 -u -m lumenos_tpu.apps.client --server "http://127.0.0.1:$PORT" \
  --rows "$ROWS" --cols "$COLS" --logn "$LOGN" --point 7 --vdec --local-baseline
wait "$SERVER_PID" 2>/dev/null || true
