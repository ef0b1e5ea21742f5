"""decrypt_c0_fast (O(N) ternary-dot c0 decode) == decrypt_c0 (full INTT).

The fast path backs the client's inner-product decrypt phase
(fhe/backend.py decrypt_c0_fast; reference client cost README.md:86).
"""

import numpy as np
import pytest

from lumenos_tpu.core.field import GOLDILOCKS_57
from lumenos_tpu.fhe.backend import BgvBackend, CtBatch
from lumenos_tpu.fhe.params import BgvParams

T = GOLDILOCKS_57


@pytest.fixture(scope="module")
def setup():
    params = BgvParams.generate(
        log_n=6, log_q=[58, 56, 56, 56], log_p=[55, 55], t=T)
    backend = BgvBackend(params)
    rng = np.random.default_rng(11)
    sk, pk = backend.keygen(rng)
    return backend, sk, pk, rng


@pytest.mark.parametrize("level", [0, 1, 3])
def test_c0_fast_matches_full(setup, level):
    backend, sk, pk, rng = setup
    vals = rng.integers(0, T, (7, backend.n)).astype(np.uint64)
    ct = backend.encrypt_values(vals, pk, rng, level=level)
    slow = np.asarray(backend.decrypt_c0(ct, sk))
    fast = np.asarray(backend.decrypt_c0_fast(ct, sk))
    assert np.array_equal(slow, fast)


def test_c0_fast_after_rescale(setup):
    """Level-1 cts out of a rescale chain (the MatR/MatZ shape class)."""
    backend, sk, pk, rng = setup
    vals = rng.integers(0, T, (5, backend.n)).astype(np.uint64)
    ct = backend.encrypt_values(vals, pk, rng, level=3)
    ct1 = backend.rescale_to(ct, 1)
    slow = np.asarray(backend.decrypt_c0(ct1, sk))
    fast = np.asarray(backend.decrypt_c0_fast(ct1, sk))
    assert np.array_equal(slow, fast)
