"""ct x ct tensor layer: exact t/Q scaling primitive + the full
extended-basis scale-invariant multiplication (lattigo MulScaleInvariant
parity, reference vdec/batching.go:27)."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from lumenos_tpu.core.field import GOLDILOCKS_57
from lumenos_tpu.fhe.backend import BgvBackend
from lumenos_tpu.fhe.params import BgvParams
from lumenos_tpu.fhe.tensor import _scale_t_over_q, mul_ct_ct

T = GOLDILOCKS_57


@pytest.fixture(scope="module")
def backend():
    params = BgvParams.generate(log_n=4, log_q=[58, 56, 56], log_p=[55, 55], t=T)
    return BgvBackend(params)


def test_scale_t_over_q_exact(backend):
    lvl = 2
    qs = [int(q) for q in backend.params.q_primes[: lvl + 1]]
    Q = qs[0] * qs[1] * qs[2]
    random.seed(7)
    xs = [random.randrange(Q) for _ in range(256)]
    x_rns = np.zeros((1, lvl + 1, 256), dtype=np.uint64)
    for k, x in enumerate(xs):
        for j, q in enumerate(qs):
            x_rns[0, j, k] = x % q
    out = np.asarray(_scale_t_over_q(backend, jnp.asarray(x_rns), lvl))
    for k, x in enumerate(xs):
        expect = (T * x + Q // 2) // Q
        for j, q in enumerate(qs):
            assert int(out[0, j, k]) == expect % q, (k, j)


def test_mul_relin_roundtrip(backend):
    """Enc(a) x Enc(b) -> relinearize -> decrypt == a*b slotwise."""
    from lumenos_tpu.fhe.keyswitch import KeySwitcher
    from lumenos_tpu.fhe.tensor import mul_relin

    n = backend.n
    rng = np.random.default_rng(9)
    sk, pk = backend.keygen(rng)
    ks = KeySwitcher(backend)
    rlk = ks.gen_relin_key(sk, rng)

    va = rng.integers(0, T, (2, n)).astype(np.uint64)
    vb = rng.integers(0, T, (2, n)).astype(np.uint64)
    lvl = 2
    ca = backend.rescale_to(backend.encrypt_values(va, pk, rng), lvl)
    cb = backend.rescale_to(backend.encrypt_values(vb, pk, rng), lvl)
    prod = mul_relin(backend, ca, cb, ks, rlk)
    dec = np.asarray(backend.decrypt_values(prod, sk, n))
    expect = (va.astype(object) * vb.astype(object)) % T
    assert np.array_equal(dec.astype(object), expect)


def test_mul_ct_ct_degree2_phase(backend):
    """d0 + d1*s + d2*s^2 Delta-embeds the product (pre-relin check)."""
    from lumenos_tpu.fhe.backend import CtBatch
    n = backend.n
    rng = np.random.default_rng(10)
    sk, pk = backend.keygen(rng)
    va = rng.integers(0, T, (1, n)).astype(np.uint64)
    vb = rng.integers(0, T, (1, n)).astype(np.uint64)
    lvl = 2
    ca = backend.rescale_to(backend.encrypt_values(va, pk, rng), lvl)
    cb = backend.rescale_to(backend.encrypt_values(vb, pk, rng), lvl)
    d0, d1, d2 = mul_ct_ct(backend, ca, cb)
    # phase = d0 + d1 s + d2 s^2 over RNS, decoded via the backend
    qj, uj, sj = backend._consts(lvl)
    from lumenos_tpu.fhe.ring import add_rns, barrett_mul
    s_ntt = sk.s_ntt[: lvl + 1]
    mm = lambda x, y: barrett_mul(x, y, qj[:, None], uj[:, None], sj[:, None])
    d1s = backend._intt(mm(backend._ntt(d1, lvl), s_ntt), lvl)
    s2 = mm(s_ntt, s_ntt)
    d2s = backend._intt(mm(backend._ntt(d2, lvl), s2), lvl)
    c0 = add_rns(add_rns(d0, d1s, qj[:, None]), d2s, qj[:, None])
    fake = CtBatch(data=jnp.stack(
        [c0, jnp.zeros_like(c0)], axis=-3), level=lvl)
    dec = np.asarray(backend.decrypt_values(fake, sk, n))
    expect = (va.astype(object) * vb.astype(object)) % T
    assert np.array_equal(dec.astype(object), expect)
