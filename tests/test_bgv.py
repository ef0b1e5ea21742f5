"""BGV/BFV backend tests: enc/dec roundtrip, evaluator ops, rescale, noise.

Differential style: every homomorphic result is decrypted and compared with
the plaintext computation (SURVEY.md section 4 pattern).
"""

import numpy as np
import pytest

from lumenos_tpu.core.field import GOLDILOCKS_57
from lumenos_tpu.fhe.params import BgvParams
from lumenos_tpu.fhe.backend import BgvBackend

T = GOLDILOCKS_57
LOG_N = 6
N = 1 << LOG_N


@pytest.fixture(scope="module")
def backend():
    params = BgvParams.generate(log_n=LOG_N, log_q=[58, 56, 56], log_p=[55, 55], t=T)
    return BgvBackend(params)


@pytest.fixture(scope="module")
def keys(backend):
    rng = np.random.default_rng(42)
    sk, pk = backend.keygen(rng)
    return sk, pk, rng


def test_encoder_roundtrip(backend):
    rng = np.random.default_rng(0)
    vals = rng.integers(0, T, (3, N)).astype(np.uint64)
    poly = backend.encoder.encode(vals)
    back = np.asarray(backend.encoder.decode(poly))
    assert np.array_equal(back, vals)


def test_encoder_partial_vector(backend):
    rng = np.random.default_rng(1)
    vals = rng.integers(0, T, (2, N // 2)).astype(np.uint64)
    poly = backend.encoder.encode(vals)
    back = np.asarray(backend.encoder.decode(poly))
    assert np.array_equal(back[:, :N // 2], vals)
    assert (back[:, N // 2:] == 0).all()


def test_encrypt_decrypt_roundtrip(backend, keys):
    sk, pk, rng = keys
    vals = np.random.default_rng(2).integers(0, T, (4, N)).astype(np.uint64)
    ct = backend.encrypt_values(vals, pk, rng)
    dec = np.asarray(backend.decrypt_values(ct, sk))
    assert np.array_equal(dec, vals)


def test_homomorphic_add_sub(backend, keys):
    sk, pk, rng = keys
    g = np.random.default_rng(3)
    a = g.integers(0, T, (2, N)).astype(np.uint64)
    b = g.integers(0, T, (2, N)).astype(np.uint64)
    ca = backend.encrypt_values(a, pk, rng)
    cb = backend.encrypt_values(b, pk, rng)
    add = np.asarray(backend.decrypt_values(backend.add(ca, cb), sk))
    sub = np.asarray(backend.decrypt_values(backend.sub(ca, cb), sk))
    assert np.array_equal(add, (a.astype(object) + b) % T)
    assert np.array_equal(sub.astype(object), (a.astype(object) - b) % T)


def test_mul_scalar(backend, keys):
    sk, pk, rng = keys
    g = np.random.default_rng(4)
    a = g.integers(0, T, (2, N)).astype(np.uint64)
    w = 0xDEADBEEFCAFEBABE  # raw u64 scalar, like Montgomery-form twiddles
    ct = backend.mul_scalar(backend.encrypt_values(a, pk, rng), w)
    dec = np.asarray(backend.decrypt_values(ct, sk))
    expect = (a.astype(object) * (w % T)) % T
    assert np.array_equal(dec.astype(object), expect)


def test_mul_plain(backend, keys):
    sk, pk, rng = keys
    g = np.random.default_rng(5)
    a = g.integers(0, T, (2, N)).astype(np.uint64)
    p = g.integers(0, T, N).astype(np.uint64)
    ct = backend.encrypt_values(a, pk, rng)
    poly_t = backend.encoder.encode(p)
    pt_ntt = backend._ntt(backend.encoder.lift_to_rns(poly_t, ct.level), ct.level)
    prod = backend.mul_plain_ntt(ct, pt_ntt)
    dec = np.asarray(backend.decrypt_values(prod, sk))
    expect = (a.astype(object) * p.astype(object)) % T
    assert np.array_equal(dec.astype(object), expect)


def test_rescale_preserves_plaintext(backend, keys):
    sk, pk, rng = keys
    g = np.random.default_rng(6)
    a = g.integers(0, T, (2, N)).astype(np.uint64)
    ct = backend.encrypt_values(a, pk, rng)
    ct = backend.rescale_to(ct, 1)
    assert ct.level == 1
    dec = np.asarray(backend.decrypt_values(ct, sk))
    assert np.array_equal(dec, a)


def test_mul_then_rescale(backend, keys):
    sk, pk, rng = keys
    g = np.random.default_rng(7)
    a = g.integers(0, T, (2, N)).astype(np.uint64)
    p = g.integers(0, T, N).astype(np.uint64)
    ct = backend.encrypt_values(a, pk, rng)
    poly_t = backend.encoder.encode(p)
    pt_ntt = backend._ntt(backend.encoder.lift_to_rns(poly_t, ct.level), ct.level)
    prod = backend.rescale_to(backend.mul_plain_ntt(ct, pt_ntt), 1)
    dec = np.asarray(backend.decrypt_values(prod, sk))
    expect = (a.astype(object) * p.astype(object)) % T
    assert np.array_equal(dec.astype(object), expect)


def test_sum_slots_identity(backend, keys):
    """Sum of ALL slot values == N * c_0 of the plaintext polynomial
    (DESIGN.md section 4, the rotation-free inner-product trick)."""
    sk, pk, rng = keys
    g = np.random.default_rng(8)
    a = g.integers(0, T, (2, N)).astype(np.uint64)
    ct = backend.encrypt_values(a, pk, rng)
    c0 = np.asarray(backend.decrypt_c0(ct, sk))
    slot_sum = np.array([int(sum(int(x) for x in row) % T) for row in a])
    n_c0 = (c0.astype(object) * N) % T
    assert np.array_equal(n_c0, slot_sum.astype(object))
