"""Keyswitching tests: automorphism, rotations, InnerSum, relinearization."""

import numpy as np
import pytest

from lumenos_tpu.core.field import GOLDILOCKS_57
from lumenos_tpu.fhe.backend import BgvBackend, CtBatch
from lumenos_tpu.fhe.keyswitch import (
    KeySwitcher, apply_automorphism, galois_element_rotation,
    galois_element_row_swap,
)
from lumenos_tpu.fhe.params import BgvParams
from lumenos_tpu.fhe.ring import barrett_mul
import jax.numpy as jnp

T = GOLDILOCKS_57
LOG_N = 5
N = 1 << LOG_N


@pytest.fixture(scope="module")
def setup():
    params = BgvParams.generate(log_n=LOG_N, log_q=[58, 56, 56], log_p=[55, 55], t=T)
    backend = BgvBackend(params)
    rng = np.random.default_rng(11)
    sk, pk = backend.keygen(rng)
    ks = KeySwitcher(backend)
    return backend, sk, pk, rng, ks


def test_automorphism_plaintext_semantics(setup):
    """Automorphism X->X^g in coeff domain == permutation of slot values."""
    backend, sk, pk, rng, ks = setup
    g = np.random.default_rng(0)
    vals = g.integers(0, T, N).astype(np.uint64)
    poly = backend.encoder.encode(vals)
    # lift to single "limb" = t itself for checking over Z_t
    q = np.array([T], dtype=np.uint64)
    auto = apply_automorphism(jnp.asarray(poly)[None, :], 5, q)
    back = np.asarray(backend.encoder.decode(auto[0]))
    # rotation group: applying X->X^5 must permute slots cyclically by 1
    # within each matrix row (direction checked empirically here)
    row0, row1 = vals[: N // 2], vals[N // 2:]
    b0, b1 = back[: N // 2], back[N // 2:]
    assert (sorted(b0.tolist()) == sorted(row0.tolist())
            and sorted(b1.tolist()) == sorted(row1.tolist()))
    shifted = np.roll(row0, -1)
    assert np.array_equal(b0, shifted) or np.array_equal(b0, np.roll(row0, 1))


def test_rotation_homomorphic(setup):
    backend, sk, pk, rng, ks = setup
    g = np.random.default_rng(1)
    vals = g.integers(0, T, (1, N)).astype(np.uint64)
    ct = backend.encrypt_values(vals, pk, rng)
    gal = galois_element_rotation(1, N)
    gk = ks.gen_galois_key(gal, sk, rng)
    rot = ks._apply_galois(ct, gal, gk)
    dec = np.asarray(backend.decrypt_values(rot, sk))[0]
    row0, row1 = vals[0, : N // 2], vals[0, N // 2:]
    expect = np.concatenate([np.roll(row0, -1), np.roll(row1, -1)])
    assert np.array_equal(dec, expect)


def test_row_swap_homomorphic(setup):
    backend, sk, pk, rng, ks = setup
    g = np.random.default_rng(2)
    vals = g.integers(0, T, (1, N)).astype(np.uint64)
    ct = backend.encrypt_values(vals, pk, rng)
    gal = galois_element_row_swap(N)
    gk = ks.gen_galois_key(gal, sk, rng)
    sw = ks._apply_galois(ct, gal, gk)
    dec = np.asarray(backend.decrypt_values(sw, sk))[0]
    expect = np.concatenate([vals[0, N // 2:], vals[0, : N // 2]])
    assert np.array_equal(dec, expect)


def test_inner_sum(setup):
    """InnerSum(1, n): slot 0 accumulates the sum of the first n slots
    (reference InnerSum semantics used by matrixInnerSumEval)."""
    backend, sk, pk, rng, ks = setup
    g = np.random.default_rng(3)
    n_sum = N // 2
    vals = np.zeros((1, N), dtype=np.uint64)
    vals[0, :n_sum] = g.integers(0, T, n_sum)
    ct = backend.encrypt_values(vals, pk, rng)
    keys = {gal: ks.gen_galois_key(gal, sk, rng)
            for gal in ks.galois_elements_for_inner_sum(n_sum)}
    summed = ks.inner_sum(ct, n_sum, keys)
    dec = np.asarray(backend.decrypt_values(summed, sk))[0]
    expect = sum(int(x) for x in vals[0, :n_sum]) % T
    assert int(dec[0]) == expect


def test_inner_sum_full_width(setup):
    backend, sk, pk, rng, ks = setup
    g = np.random.default_rng(4)
    vals = g.integers(0, T, (1, N)).astype(np.uint64)
    ct = backend.encrypt_values(vals, pk, rng)
    keys = {gal: ks.gen_galois_key(gal, sk, rng)
            for gal in ks.galois_elements_for_inner_sum(N)}
    summed = ks.inner_sum(ct, N, keys)
    dec = np.asarray(backend.decrypt_values(summed, sk))[0]
    expect = sum(int(x) for x in vals[0]) % T
    assert int(dec[0]) == expect


def test_relinearization_ct_ct_mul(setup):
    """Tensor + relinearize: Dec(relin(ct1 (x) ct2)) == m1*m2 slot-wise.

    MSB-form tensor product needs one rescale to restore Delta (the product
    has scale Delta^2 = (Q/t)^2; dividing by q_top approximates Q/t back
    only after enough rescales - here we check via the scale-invariant
    route: multiply then rescale and compare against plaintext with the
    appropriate Delta' tracking is deferred; the structural check is that
    relinearized phase equals c0+c1*s+c2*s^2."""
    backend, sk, pk, rng, ks = setup
    g = np.random.default_rng(5)
    a = g.integers(0, T, (1, N)).astype(np.uint64)
    ct = backend.encrypt_values(a, pk, rng)
    rlk = ks.gen_relin_key(sk, rng)
    lvl = ct.level
    # degree-2 "ciphertext" (c0, c1, c2) with c2 = small noise poly: check
    # relinearize(c0,c1,c2) decrypts like c0 + c1 s + c2 s^2
    c2 = backend._signed_to_rns(
        np.random.default_rng(6).integers(-3, 4, (1, N)).astype(np.int64), lvl)
    d0, d1 = ks.relinearize(ct.data[:, 0], ct.data[:, 1], c2, lvl, rlk)
    relin_ct = CtBatch(data=jnp.stack([d0, d1], axis=1), level=lvl)
    got = np.asarray(backend.decrypt_values(relin_ct, sk))

    # manual phase: c0 + c1*s + c2*s^2 -> decode
    qj, uj, sj = backend._consts(lvl)
    s1 = sk.s_ntt[: lvl + 1]
    s2 = barrett_mul(s1, s1, qj[:, None], uj[:, None], sj[:, None])
    c2_ntt = backend._ntt(c2, lvl)
    extra = backend._intt(barrett_mul(c2_ntt, s2, qj[:, None], uj[:, None], sj[:, None]), lvl)
    from lumenos_tpu.fhe.ring import add_rns
    manual = CtBatch(
        data=jnp.stack([add_rns(ct.data[:, 0], extra, qj[:, None]),
                        ct.data[:, 1]], axis=1), level=lvl)
    expect = np.asarray(backend.decrypt_values(manual, sk))
    assert np.array_equal(got, expect)
