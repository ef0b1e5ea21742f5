"""Device->host transfer experiments over the tunnel.

The bench's query phase is dominated by one ~40-80 MB d2h transfer at
~9 MB/s. This measures whether k concurrent async copies (separate relay
connections) aggregate more bandwidth than one stream, and how bandwidth
scales with transfer size. Run on the real TPU, nothing else attached:

    python3 -u scripts/check_transfer.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from lumenos_tpu import jaxcfg  # noqa: F401


def bw(nbytes: float, secs: float) -> str:
    return f"{nbytes / secs / 2**20:7.1f} MB/s"


def main() -> None:
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1 << 57, (306, 2, 2, 4096),
                                 dtype=np.uint64))   # 2048-config columns
    x.block_until_ready()
    nb = x.size * 8

    # single stream
    for _ in range(2):
        t0 = time.time()
        np.asarray(x)
        t1 = time.time() - t0
    print(f"single stream  ({nb / 2**20:.0f} MiB): {t1:.2f}s {bw(nb, t1)}",
          flush=True)

    # k concurrent async slices
    for k in (2, 4, 8):
        parts = [x[i::k] for i in range(k)]
        for p in parts:
            p.block_until_ready()
        t0 = time.time()
        for p in parts:
            try:
                p.copy_to_host_async()
            except Exception as e:
                print("no async d2h:", e)
                return
        outs = [np.asarray(p) for p in parts]
        t1 = time.time() - t0
        print(f"{k} async slices: {t1:.2f}s {bw(nb, t1)}", flush=True)
        del outs

    # size scaling (per-transfer overhead?)
    for mb in (1, 4, 16):
        y = x.reshape(-1)[: mb * 2**17]     # mb MiB of u64
        y.block_until_ready()
        t0 = time.time()
        np.asarray(y)
        t1 = time.time() - t0
        print(f"size {mb:2d} MiB: {t1:.2f}s {bw(mb * 2**20, t1)}", flush=True)


if __name__ == "__main__":
    main()
