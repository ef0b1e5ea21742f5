"""Per-limb negacyclic NTT and dyadic ring ops, vectorized over RNS limbs.

The polynomial ring R_Q = Z_Q[X]/(X^N+1) in RNS form: residues live in a
uint64 tensor [..., L, N] with per-limb moduli q_i. The forward transform is
the classic Cooley-Tukey negacyclic NTT (psi twiddles in bit-reversed table
order, natural input -> bit-reversed output); inverse is Gentleman-Sande.
Twiddle multiplies use Shoup precomputation; every stage is a full-tensor
vector op so XLA fuses the whole transform (reference analogue: lattigo's
ring package + Intel HEXL AVX512 NTT, SURVEY.md C7).

Output position i holds the evaluation at psi^(2*bitrev(i, logN)+1) - the
slot encoder (encoder.py) relies on exactly this ordering; verified by
tests/test_ring.py (monomial evaluation check).
"""

from __future__ import annotations

import numpy as np

from .. import jaxcfg  # noqa: F401
import jax.numpy as jnp

from ..ops.modmath import mul64wide, _u64


def _bcast_tail(arr: np.ndarray, extra: int):
    """Reshape [L, ...] constant to broadcast against trailing dims."""
    return jnp.asarray(arr, jnp.uint64).reshape(arr.shape + (1,) * extra)


def shoup_mul(x, w, w_shoup, q):
    """x*w mod q, all broadcastable u64 arrays; w_shoup = floor(w<<64/q)."""
    hi, _ = mul64wide(x, w_shoup)
    r = x * w - hi * q
    return jnp.where(r >= q, r - q, r)


def barrett_mul(a, b, q, u, s):
    """Exact a*b mod q with per-element Barrett constants (arrays)."""
    hi, lo = mul64wide(a, b)
    xs = (hi << (_u64(64) - s)) | (lo >> s)
    t, _ = mul64wide(xs, u)
    r = lo - t * q
    r = jnp.where(r >= q, r - q, r)
    r = jnp.where(r >= q, r - q, r)
    r = jnp.where(r >= q, r - q, r)
    return r


def add_rns(a, b, q):
    s = a + b
    return jnp.where(s >= q, s - q, s)


def sub_rns(a, b, q):
    s = a + (q - b)
    return jnp.where(s >= q, s - q, s)


def ntt_fwd(x, fwd: np.ndarray, fwd_shoup: np.ndarray, q: np.ndarray):
    """Forward negacyclic NTT along the last axis.

    x: [..., L, N]; fwd/fwd_shoup: [L, N] tables; q: [L] moduli.
    """
    n = x.shape[-1]
    logn = n.bit_length() - 1
    L = x.shape[-2]
    w_all = jnp.asarray(fwd, jnp.uint64)
    ws_all = jnp.asarray(fwd_shoup, jnp.uint64)
    qb = jnp.asarray(np.asarray(q), jnp.uint64).reshape((L, 1, 1))
    lead = x.shape[:-2]
    for stage in range(logn):
        m = 1 << stage          # groups
        t = n >> (stage + 1)    # butterflies per group
        xv = x.reshape(lead + (L, m, 2, t))
        u = xv[..., 0, :]
        v = xv[..., 1, :]
        w = w_all[:, m:2 * m].reshape((L, m, 1))
        ws = ws_all[:, m:2 * m].reshape((L, m, 1))
        vw = shoup_mul(v, w, ws, qb)
        nu = add_rns(u, vw, qb)
        nv = sub_rns(u, vw, qb)
        x = jnp.stack([nu, nv], axis=-2).reshape(lead + (L, n))
    return x


def ntt_inv(x, bwd: np.ndarray, bwd_shoup: np.ndarray,
            n_inv: np.ndarray, n_inv_shoup: np.ndarray, q: np.ndarray):
    """Inverse negacyclic NTT (GS) along the last axis; scales by N^-1."""
    n = x.shape[-1]
    logn = n.bit_length() - 1
    L = x.shape[-2]
    w_all = jnp.asarray(bwd, jnp.uint64)
    ws_all = jnp.asarray(bwd_shoup, jnp.uint64)
    qb3 = jnp.asarray(np.asarray(q), jnp.uint64).reshape((L, 1, 1))
    lead = x.shape[:-2]
    for stage in range(logn - 1, -1, -1):
        m = 1 << stage
        t = n >> (stage + 1)
        xv = x.reshape(lead + (L, m, 2, t))
        u = xv[..., 0, :]
        v = xv[..., 1, :]
        w = w_all[:, m:2 * m].reshape((L, m, 1))
        ws = ws_all[:, m:2 * m].reshape((L, m, 1))
        nu = add_rns(u, v, qb3)
        nv = shoup_mul(sub_rns(u, v, qb3), w, ws, qb3)
        x = jnp.stack([nu, nv], axis=-2).reshape(lead + (L, n))
    qb2 = jnp.asarray(np.asarray(q), jnp.uint64).reshape((L, 1))
    ninv = jnp.asarray(np.asarray(n_inv), jnp.uint64).reshape((L, 1))
    ninv_s = jnp.asarray(np.asarray(n_inv_shoup), jnp.uint64).reshape((L, 1))
    return shoup_mul(x, ninv, ninv_s, qb2)
