"""Ring switch: big-ring ct -> small-ring ct preserving the constant
coefficient (and all multiples-of-k coefficients).

Reference TestRingSwitch (fhe/ring_switch_test.go:13) checks an
encrypt -> switch -> decrypt roundtrip; we additionally verify the
c_0 value used by the MatR/MatZ decode survives (the capability the
reference's slot-based decode lacks)."""

import numpy as np
import pytest

from lumenos_tpu.core.field import GOLDILOCKS_57
from lumenos_tpu.fhe.backend import BgvBackend
from lumenos_tpu.fhe.params import BgvParams
from lumenos_tpu.fhe.ring_switch import new_ring_switch_client, ring_switch_batch

T = GOLDILOCKS_57
LOG_N = 6           # big ring N = 64
LOG_N_SMALL = 4     # small ring N' = 16


@pytest.fixture(scope="module")
def setup():
    params = BgvParams.generate(log_n=LOG_N, log_q=[58, 56], log_p=[55, 55], t=T)
    backend = BgvBackend(params)
    rng = np.random.default_rng(5)
    sk, pk = backend.keygen(rng)
    rs = new_ring_switch_client(backend, sk, LOG_N_SMALL, rng)
    return backend, sk, pk, rng, rs


def test_ring_switch_preserves_c0(setup):
    backend, sk, pk, rng, rs = setup
    g = np.random.default_rng(1)
    n = backend.n
    vals = g.integers(0, T, (3, n)).astype(np.uint64)
    ct = backend.rescale_to(backend.encrypt_values(vals, pk, rng), 1)

    # big-ring c0 of the plaintext polynomial (the MatR decode value)
    big_c0 = np.asarray(backend.decrypt_c0(ct, sk))

    small_ct = ring_switch_batch(backend, ct, rs.evk, rs.k)
    assert small_ct.data.shape[-1] == 1 << LOG_N_SMALL
    small_c0 = np.asarray(rs.small_backend.decrypt_c0(small_ct, rs.sk_small))
    assert np.array_equal(small_c0, big_c0)


def test_ring_switch_preserves_subsampled_coeffs(setup):
    backend, sk, pk, rng, rs = setup
    g = np.random.default_rng(2)
    n = backend.n
    vals = g.integers(0, T, (2, n)).astype(np.uint64)
    ct = backend.rescale_to(backend.encrypt_values(vals, pk, rng), 1)
    big_poly = np.asarray(backend.decrypt_poly_t(ct, sk))
    small_ct = ring_switch_batch(backend, ct, rs.evk, rs.k)
    small_poly = np.asarray(rs.small_backend.decrypt_poly_t(small_ct, rs.sk_small))
    assert np.array_equal(small_poly, big_poly[:, ::rs.k])


def test_size_reduction(setup):
    backend, sk, pk, rng, rs = setup
    g = np.random.default_rng(3)
    vals = g.integers(0, T, (1, backend.n)).astype(np.uint64)
    ct = backend.rescale_to(backend.encrypt_values(vals, pk, rng), 1)
    small_ct = ring_switch_batch(backend, ct, rs.evk, rs.k)
    big_bytes = np.asarray(ct.data).nbytes
    small_bytes = np.asarray(small_ct.data).nbytes
    assert small_bytes * rs.k == big_bytes
