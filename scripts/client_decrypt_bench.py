"""Client decrypt-phase benchmark on a 2-core CPU (reference-matched).

The reference's client runs on an m6i.large (2 vCPU, README.md:94) and its
decrypt phase is the client-side bottleneck at scale: 48.05 s total at
16384x4096, of which 47.53 s is decrypting the 2*cols MatR/MatZ inner-
product ciphertexts (README.md:85-87). This script measures OUR client
decrypt on matched silicon: it pins itself to 2 cores (taskset) and runs
the jax CPU backend.

Per config it fabricates the exact decrypt workload shapes (the timing
does not depend on upstream protocol state):
  - queries x level-1 ciphertexts, full-slot decrypt (decrypt_values)
    -> "decrypt queried columns";
  - 2*cols level-1 ciphertexts, constant-coefficient decode
    (decrypt_c0_fast: O(N) ternary dot, fhe/backend.py)
    -> "decrypt inner products".
Warm-compiled; median of ITERS runs. Writes CLIENT_BENCH.json and prints
one JSON line.

On-TPU client decrypt numbers (the TPU-native client story) are captured
by bench.py's "client" fields; this script is the CPU-parity row.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

if os.environ.get("LUMENOS_CLIENT_PINNED") != "1":
    env = dict(os.environ, LUMENOS_CLIENT_PINNED="1",
               JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    cores = os.environ.get("LUMENOS_CLIENT_CORES", "0,1")
    os.execvpe("taskset", ["taskset", "-c", cores, sys.executable, "-u",
                           os.path.abspath(__file__)] + sys.argv[1:], env)

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, REPO)
import numpy as np  # noqa: E402

from lumenos_tpu.core.field import GOLDILOCKS_57  # noqa: E402
from lumenos_tpu.core.ligero_plain import LigeroCommitter  # noqa: E402
from lumenos_tpu.fhe.backend import BgvBackend  # noqa: E402
from lumenos_tpu.fhe.params import generate_bgv_params_for_ntt  # noqa: E402

# (rows, cols, logn) ladder + reference client decrypt seconds
# (README.md:85-87, m6i.large)
CONFIGS = [
    (2048, 1024, 12, {"cols": 0.0959, "mats": 0.5316, "total": 0.6275}),
    (4096, 2048, 12, {"cols": 0.1077, "mats": 1.05, "total": 1.16}),
    (8192, 4096, 13, {"cols": 0.2201, "mats": 4.32, "total": 4.54}),
    (16384, 4096, 14, {"cols": 0.5133, "mats": 47.53, "total": 48.05}),
]
ITERS = int(os.environ.get("LUMENOS_CLIENT_ITERS", "3"))


def time_fn(fn, iters=ITERS):
    fn()                                   # warm (compile)
    outs = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        outs.append(time.perf_counter() - t0)
    return statistics.median(outs)


def run_config(rows, cols, log_n, ref):
    t = GOLDILOCKS_57
    params = generate_bgv_params_for_ntt(cols, log_n, t)
    backend = BgvBackend(params)
    rng = np.random.default_rng(21)
    sk, pk = backend.keygen(rng)
    queries = LigeroCommitter(128, rows, cols, 2).meta.queries

    # level-1 ciphertext batches with the production shapes
    qvals = rng.integers(0, t, (queries, rows)).astype(np.uint64)
    q_ct = backend.encrypt_values(qvals, pk, rng, level=1)
    m_ct = backend.encrypt_values(
        rng.integers(0, t, (2 * cols, backend.n)).astype(np.uint64),
        pk, rng, level=1)

    def dec_cols():
        backend.decrypt_values(q_ct, sk, rows).block_until_ready()

    def dec_mats():
        backend.decrypt_c0_fast(m_ct, sk).block_until_ready()

    t_cols = time_fn(dec_cols)
    t_mats = time_fn(dec_mats)
    # correctness spot: decrypted slots equal the encrypted values
    dec = np.asarray(backend.decrypt_values(q_ct, sk, rows))
    assert np.array_equal(dec[:4], qvals[:4]), "decrypt mismatch"
    total = t_cols + t_mats
    rec = {
        "rows": rows, "cols": cols, "logn": log_n, "queries": queries,
        "decrypt_cols_s": round(t_cols, 4),
        "decrypt_mats_s": round(t_mats, 4),
        "decrypt_total_s": round(total, 4),
        "reference_cols_s": ref["cols"], "reference_mats_s": ref["mats"],
        "reference_total_s": ref["total"],
        "vs_baseline": round(ref["total"] / max(total, 1e-9), 1),
    }
    print(f"[{rows}x{cols}] cols {t_cols:.3f}s (ref {ref['cols']}s)  "
          f"mats {t_mats:.3f}s (ref {ref['mats']}s)  "
          f"total {total:.3f}s vs {ref['total']}s -> "
          f"{rec['vs_baseline']}x", file=sys.stderr)
    return rec


def main():
    only = os.environ.get("LUMENOS_CLIENT_CONFIGS")
    results = []
    for rows, cols, log_n, ref in CONFIGS:
        if only and f"{rows}x{cols}" not in only:
            continue
        results.append(run_config(rows, cols, log_n, ref))
    report = {"hardware": "2 pinned cores (taskset), jax CPU backend; "
                          "reference client: m6i.large 2 vCPU",
              "iters": ITERS, "runs": results}
    with open(os.path.join(REPO, "CLIENT_BENCH.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
