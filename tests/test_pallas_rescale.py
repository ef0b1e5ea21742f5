"""Fused Pallas rescale-chain kernel vs sequential backend.rescale.

Bit-exact equality on CPU via the Pallas interpreter (hardware validation
happens through bench.py's decrypt spot-check, which exercises the fast
path on TPU).
"""

import numpy as np
import pytest

from lumenos_tpu.core.field import GOLDILOCKS_57
from lumenos_tpu.fhe.backend import BgvBackend, CtBatch
from lumenos_tpu.fhe.params import BgvParams
from lumenos_tpu.ops.pallas_rescale import rescale_chain_pallas

T = GOLDILOCKS_57


@pytest.fixture(scope="module")
def backend():
    params = BgvParams.generate(
        log_n=7, log_q=[58, 56, 56, 56, 56, 56], log_p=[55, 55], t=T)
    return BgvBackend(params)


@pytest.mark.parametrize("level,target", [(5, 4), (3, 0)])
def test_chain_matches_sequential(backend, level, target):
    # NOTE: XLA:CPU's compile of the interpret-mode program goes
    # superlinear past ~8 unrolled kept-limb updates (observed: (4,1)
    # never finishes), so single-kernel coverage here stays small;
    # longer chains are covered segmented below and on hardware by
    # bench.py's decrypt spot-check.
    import jax.numpy as jnp
    p = backend.params
    rng = np.random.default_rng(level * 10 + target)
    qs = np.asarray(p.limb_consts(level)[0])
    x = np.stack([rng.integers(0, q, (8, 2, 128)) for q in qs],
                 axis=-2).astype(np.uint64)      # [8, 2, L+1, N]
    ref = backend.rescale_to(CtBatch(data=jnp.asarray(x), level=level),
                             target)
    got = rescale_chain_pallas(x, p.q_primes, level, target,
                               interpret=True, cblk=128)
    assert np.array_equal(np.asarray(ref.data), np.asarray(got))


def test_long_chain_segmented(backend):
    """Full 5->1 chain via bounded segments (max_updates=6 keeps every
    kernel inside what the CPU interpreter can compile)."""
    import jax.numpy as jnp
    from lumenos_tpu.ops.pallas_rescale import _segment_levels
    p = backend.params
    rng = np.random.default_rng(7)
    qs = np.asarray(p.limb_consts(5)[0])
    x = np.stack([rng.integers(0, q, (8, 2, 128)) for q in qs],
                 axis=-2).astype(np.uint64)
    ref = backend.rescale_to(CtBatch(data=jnp.asarray(x), level=5), 1)
    got = rescale_chain_pallas(x, p.q_primes, 5, 1, interpret=True,
                               cblk=128, max_updates=6)
    assert np.array_equal(np.asarray(ref.data), np.asarray(got))
    assert _segment_levels(5, 1, 6) == [(5, 4), (4, 3), (3, 1)]
    assert _segment_levels(12, 5, 32) == [(12, 10), (10, 7), (7, 5)]
    assert _segment_levels(5, 1, 10**9) == [(5, 1)]


def test_chain_edge_values(backend):
    """Top-limb values at 0, half, half+1, q-1 hit every rounding branch."""
    import jax.numpy as jnp
    p = backend.params
    level, target = 2, 1
    qs = [int(q) for q in np.asarray(p.limb_consts(level)[0])]
    ql = qs[level]
    x = np.zeros((8, 2, level + 1, 128), dtype=np.uint64)
    specials = [0, 1, ql // 2, ql // 2 + 1, ql - 1, ql // 2 - 1]
    rng = np.random.default_rng(0)
    for j, q in enumerate(qs):
        x[..., j, :] = rng.integers(0, q, (8, 2, 128))
    x[..., level, : len(specials)] = np.array(specials, dtype=np.uint64)
    ref = backend.rescale_to(CtBatch(data=jnp.asarray(x), level=level),
                             target)
    got = rescale_chain_pallas(x, p.q_primes, level, target,
                               interpret=True, cblk=128)
    assert np.array_equal(np.asarray(ref.data), np.asarray(got))
