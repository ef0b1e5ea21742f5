"""Hardware validation + timing for the fused Pallas rescale chain.

Run on the real TPU (tunnel up, no other JAX process):

    python3 -u scripts/check_pallas_rescale.py

Validates rescale_chain_pallas bit-exactly against the sequential
BgvBackend.rescale steps at production chain lengths, then times both at
a staged-encode-like shape. If everything passes, enable the fast path
with LUMENOS_PALLAS_RESCALE=1 (bench.py) and consider flipping the
default in fhe/backend.py rescale_to.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from lumenos_tpu.ops.devsync import sync

from lumenos_tpu.core.field import GOLDILOCKS_57
from lumenos_tpu.fhe.backend import BgvBackend, CtBatch
from lumenos_tpu.fhe.params import BgvParams
from lumenos_tpu.ops.pallas_rescale import rescale_chain_pallas


def sequential(backend, x, level, target):
    ct = CtBatch(data=x, level=level)
    while ct.level > target:
        ct = backend.rescale(ct)
    return ct.data


def main() -> None:
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    t = GOLDILOCKS_57
    params = BgvParams.generate(log_n=7, log_q=[58] + [56] * 12,
                                log_p=[55, 55], t=t)
    backend = BgvBackend(params)

    # correctness: short, medium, and the production stage-A/B chains
    for (level, target) in [(3, 1), (5, 1), (6, 1), (11, 5), (12, 1)]:
        rng = np.random.default_rng(level * 16 + target)
        qs = np.asarray(params.limb_consts(level)[0])
        x = np.stack([rng.integers(0, q, (8, 2, 512)) for q in qs],
                     axis=-2).astype(np.uint64)
        xd = jnp.asarray(x)
        ref = np.asarray(sequential(backend, xd, level, target))
        t0 = time.time()
        got = rescale_chain_pallas(xd, params.q_primes, level, target)
        sync(got)
        dt = time.time() - t0
        eq = np.array_equal(ref, np.asarray(got))
        print(f"chain ({level:2d}->{target}): compile+run {dt:6.1f}s "
              f"equal={eq}", flush=True)
        if not eq:
            bad = np.argwhere(ref != np.asarray(got))
            print("FAIL first mismatches:", bad[:5])
            sys.exit(1)

    # timing at a staged-encode-like shape: [1024 positions, 2, L+1, 8192]
    level, target = 11, 5
    rng = np.random.default_rng(0)
    qs = np.asarray(params.limb_consts(level)[0])
    x = np.stack([rng.integers(0, q, (1024, 2, 8192)) for q in qs],
                 axis=-2).astype(np.uint64)
    xd = jnp.asarray(x)

    seq_j = jax.jit(lambda v: sequential(backend, v, level, target))
    pal_j = jax.jit(lambda v: rescale_chain_pallas(
        v, params.q_primes, level, target))
    for name, fn in (("xla-seq", seq_j), ("pallas", pal_j)):
        sync(fn(xd))          # compile
        t0 = time.time()
        for _ in range(3):
            sync(fn(xd))
        print(f"{name}: {(time.time() - t0) / 3:.3f} s/iter "
              f"({x.nbytes / 2**30:.1f} GiB in)", flush=True)
    # validation marker: backend.rescale_to enables the fast path by
    # default when this file exists (commit it after a hardware PASS)
    marker = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".pallas_rescale_ok")
    with open(marker, "w") as f:
        f.write(f"validated {time.strftime('%Y-%m-%d %H:%M:%S')} on "
                f"{jax.default_backend()}\n")
    print(f"ALL OK - wrote {marker}", flush=True)


if __name__ == "__main__":
    main()
