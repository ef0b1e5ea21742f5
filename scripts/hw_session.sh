#!/bin/bash
# One-command hardware validation ladder for when the TPU tunnel is up.
# Respects single-tenancy: strictly sequential, settle delay between JAX
# processes (a killed process's device memory frees lazily).
#
#   bash scripts/hw_session.sh [logdir]
#
# Ladder: rescale-kernel validation (writes .pallas_rescale_ok on PASS)
# -> d2h transfer experiments -> full bench (2048/8192/16384). Inspect
# the logs, then commit .pallas_rescale_ok + refreshed .jax_cache/tpu.

set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/hw_session}
mkdir -p "$LOG"
SETTLE=150

step() {
    name=$1; tmo=$2; shift 2
    echo "=== $name (timeout ${tmo}s) -> $LOG/$name.log"
    timeout "$tmo" env PYTHONPATH=/root/repo:/root/.axon_site \
        python3 -u "$@" > "$LOG/$name.log" 2>&1
    rc=$?
    echo "=== $name rc=$rc"; tail -5 "$LOG/$name.log"
    echo "--- settling ${SETTLE}s"
    sleep "$SETTLE"
    return $rc
}

step rescale 1800 scripts/check_pallas_rescale.py
step transfer 900 scripts/check_transfer.py
LUMENOS_BENCH_BUDGET=3000 step bench 3600 bench.py

echo "=== done; logs in $LOG; if rescale PASSed: git add .pallas_rescale_ok .jax_cache/tpu && commit"
