"""RNS ring tests: negacyclic NTT roundtrip, output ordering, convolution."""

import jax.numpy as jnp
import numpy as np

from lumenos_tpu.core.field import _is_prime, bit_reverse, primitive_root
from lumenos_tpu.fhe.params import _build_limb
from lumenos_tpu.fhe.ring import ntt_fwd, ntt_inv, barrett_mul

N = 64
LOGN = 6


def _small_prime():
    p = (1 << 30) + 1
    p -= (p - 1) % (2 * N)
    while not _is_prime(p):
        p -= 2 * N
    return p


def _tables(p):
    lt = _build_limb(p, N)
    q = np.array([lt.q], dtype=np.uint64)
    fwd = lambda a: ntt_fwd(a, lt.psi_fwd[None], lt.psi_fwd_shoup[None], q)
    inv = lambda a: ntt_inv(a, lt.psi_bwd[None], lt.psi_bwd_shoup[None],
                            np.array([lt.n_inv], dtype=np.uint64),
                            np.array([lt.n_inv_shoup], dtype=np.uint64), q)
    return lt, fwd, inv


def test_roundtrip():
    p = _small_prime()
    lt, fwd, inv = _tables(p)
    rng = np.random.default_rng(2)
    x = rng.integers(0, p, (3, 1, N)).astype(np.uint64)
    rt = np.asarray(inv(fwd(jnp.asarray(x))))
    assert np.array_equal(rt, x)


def test_output_ordering():
    """Position i holds evaluation at psi^(2*bitrev(i)+1) - the contract
    the slot encoder depends on (params.slot_perm)."""
    p = _small_prime()
    lt, fwd, inv = _tables(p)
    e1 = np.zeros((1, 1, N), dtype=np.uint64)
    e1[0, 0, 1] = 1
    out = np.asarray(fwd(jnp.asarray(e1)))[0, 0]
    g = primitive_root(p)
    psi = pow(g, (p - 1) // (2 * N), p)
    expect = np.array([pow(psi, 2 * bit_reverse(i, LOGN) + 1, p) for i in range(N)],
                      dtype=np.uint64)
    assert np.array_equal(out, expect)


def test_negacyclic_convolution():
    p = _small_prime()
    lt, fwd, inv = _tables(p)
    rng = np.random.default_rng(4)
    a = rng.integers(0, p, N)
    b = rng.integers(0, p, N)
    conv = [0] * N
    for i in range(N):
        for j in range(N):
            k = i + j
            s = 1 if k < N else -1
            conv[k % N] = (conv[k % N] + s * int(a[i]) * int(b[j])) % p
    A = fwd(jnp.asarray(a.astype(np.uint64)[None, None]))
    B = fwd(jnp.asarray(b.astype(np.uint64)[None, None]))
    qv = jnp.asarray(np.array([lt.q], dtype=np.uint64))[:, None]
    uv = jnp.asarray(np.array([lt.barrett_u], dtype=np.uint64))[:, None]
    sv = jnp.asarray(np.array([lt.barrett_s], dtype=np.uint64))[:, None]
    C = barrett_mul(A, B, qv, uv, sv)
    c = np.asarray(inv(C))[0, 0]
    assert np.array_equal(c, np.array(conv, dtype=np.uint64))


def test_multi_limb():
    """Two limbs with different moduli transform independently."""
    p1 = _small_prime()
    p2 = p1 - 2 * N
    while not _is_prime(p2) or (p2 - 1) % (2 * N) != 0:
        p2 -= 2 * N
    l1, l2 = _build_limb(p1, N), _build_limb(p2, N)
    q = np.array([p1, p2], dtype=np.uint64)
    fwdt = np.stack([l1.psi_fwd, l2.psi_fwd])
    fwds = np.stack([l1.psi_fwd_shoup, l2.psi_fwd_shoup])
    rng = np.random.default_rng(5)
    x = np.stack([rng.integers(0, p1, N), rng.integers(0, p2, N)]).astype(np.uint64)[None]
    out = np.asarray(ntt_fwd(jnp.asarray(x), fwdt, fwds, q))
    # compare with single-limb transforms
    o1 = np.asarray(ntt_fwd(jnp.asarray(x[:, :1]), l1.psi_fwd[None], l1.psi_fwd_shoup[None],
                            np.array([p1], dtype=np.uint64)))
    o2 = np.asarray(ntt_fwd(jnp.asarray(x[:, 1:]), l2.psi_fwd[None], l2.psi_fwd_shoup[None],
                            np.array([p2], dtype=np.uint64)))
    assert np.array_equal(out[:, 0], o1[:, 0])
    assert np.array_equal(out[:, 1], o2[:, 0])
