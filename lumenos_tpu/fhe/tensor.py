"""Scale-invariant ct x ct multiplication + relinearization (API parity).

lattigo's MulScaleInvariant / MulRelinNew equivalent (SURVEY.md 2.3). The
protocol itself never multiplies two ciphertexts; this completes the
evaluator surface.

Scheme (Brakerski scale-invariant, our round(Q*m/t) embedding): the tensor
of two phases Delta-embeds the product after scaling by t/Q:

    (d0, d1, d2) = round( (t/Q) * (c0*c'0, c0*c'1 + c1*c'0, c1*c'1) )

because phase_i = (Q*m_i - r_i)/t + e_i makes the m1*m2 carry term a
multiple of Q (vanishes), leaving error ~ e*t*N (DESIGN.md section 8).
The degree-2 component is relinearized with the s^2 switching key.

round((t/Q)*x) over RNS (exact up to the documented 2^-50 rounding-edge
ambiguity): with y_j = [x_j * (Q/q_j)^{-1}]_{q_j},

    t*x/Q = sum_j t*y_j/q_j - t*k,   k = floor(sum_j y_j/q_j).

Per limb j precompute c_j = floor(t/q_j) and V_j = floor((t mod q_j)*2^64
/ q_j): the integer part of t*y_j/q_j is y_j*c_j + mulhi(y_j, V_j) (+-1,
folded into the fixed-point fraction), accumulated mod each output prime;
k comes from a 55-bit fixed-point fraction sum.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from .. import jaxcfg  # noqa: F401
import jax.numpy as jnp

from ..ops.modmath import mul64wide, _u64
from .backend import BgvBackend, CtBatch
from .ring import add_rns, barrett_mul, sub_rns


@lru_cache(maxsize=None)
def _tensor_consts(backend_id: int, level: int, t: int, q_primes: tuple):
    qs = [int(q) for q in q_primes[: level + 1]]
    Q = 1
    for q in qs:
        Q *= q
    lam = [pow(Q // q, q - 2, q) for q in qs]          # [(Q/q_j)^{-1}]_{q_j}
    c = [t // q for q in qs]                            # floor(t/q_j)
    tmod = [t % q for q in qs]
    # 128-bit fixed point for (t mod q)/q: 64-bit precision is only ~2^-6
    # relative to 58-bit y and flips ~5% of rounding decisions
    V128 = [((tm << 128) // q) for q, tm in zip(qs, tmod)]
    V_hi = [v >> 64 for v in V128]
    V_lo = [v & ((1 << 64) - 1) for v in V128]
    V = (tuple(V_hi), tuple(V_lo))
    # fraction of y_j/q_j for k: U_j = floor(2^119/q_j) -> 55-bit fixed point
    U = [(1 << 119) // q for q in qs]
    # t*y/q fractional part in 2^64 fixed point: W_j = V_j (same constant)
    # cross-limb residues for accumulating integer parts mod q_i
    return qs, lam, c, V, U, Q


def _scale_t_over_q(backend: BgvBackend, x, level: int):
    """round(t*x/Q) mod each q_i for RNS x [..., L, N] -> [..., L, N]."""
    p = backend.params
    t = p.t
    qs, lam, c, V, U, Q = _tensor_consts(id(backend), level, t, p.q_primes)
    L = level + 1
    qj, uj, sj = backend._consts(level)
    q2 = qj[:, None]

    lam_j = jnp.asarray(np.array(lam, dtype=np.uint64))[:, None]
    y = barrett_mul(x, lam_j, q2, uj[:, None], sj[:, None])   # [..., L, N]

    # integer parts g_j = y_j*c_j + floor(y_j * (tmod_j/q_j)) with the
    # fraction tracked in 128-bit fixed point (top 64 bits accumulated)
    c_j = jnp.asarray(np.array(c, dtype=np.uint64))[:, None]
    vh_j = jnp.asarray(np.array(V[0], dtype=np.uint64))[:, None]
    vl_j = jnp.asarray(np.array(V[1], dtype=np.uint64))[:, None]
    g_int = y * c_j                      # y < 2^58, c <= 3: fits u64
    p1h, p1l = mul64wide(y, vh_j)
    p2h, _ = mul64wide(y, vl_j)
    s128 = p1l + p2h
    carry1 = jnp.where(s128 < p1l, _u64(1), _u64(0))
    g = g_int + p1h + carry1             # integer part per limb
    g_lo_frac = s128                     # top 64 bits of the 128-bit frac

    # fractional accumulation for rounding of sum_j frac(t*y_j/q_j)
    frac_sum_lo = jnp.sum(g_lo_frac & _u64(0xFFFFFFFF), axis=-2)
    frac_sum_hi = jnp.sum(g_lo_frac >> _u64(32), axis=-2)
    total_lo = frac_sum_lo + ((frac_sum_hi & _u64(0xFFFFFFFF)) << _u64(32))
    carry = (frac_sum_hi >> _u64(32)) + jnp.where(total_lo < frac_sum_lo,
                                                  _u64(1), _u64(0))
    round_bit = carry + jnp.where((total_lo + _u64(1 << 63)) < total_lo,
                                  _u64(1), _u64(0))

    # overflow count k = floor(sum_j y_j/q_j) via 55-bit fixed point
    U_j = jnp.asarray(np.array(U, dtype=np.uint64))[:, None]
    k_hi, _ = mul64wide(y, U_j)          # y*2^55/q approx
    k = jnp.sum(k_hi, axis=-2) >> _u64(55)

    # result mod q_i: sum_j (g_j mod q_i) + round - k*t
    out = None
    t_mod = np.array([t % int(q) for q in qs], dtype=np.uint64)
    for j in range(L):
        gj = g[..., j, :][..., None, :]  # broadcast over output limbs i
        term = gj % q2                   # [..., L, N]
        out = term if out is None else add_rns(out, term, q2)
    out = add_rns(out, round_bit[..., None, :] % q2, q2)
    kt = barrett_mul(k[..., None, :] % q2, jnp.asarray(t_mod)[:, None],
                     q2, uj[:, None], sj[:, None])
    return sub_rns(out, kt, q2)


def mul_ct_ct(backend: BgvBackend, a: CtBatch, b: CtBatch):
    """Tensor product -> degree-2 ciphertext components (d0, d1, d2).

    STATUS (round 1): INCOMPLETE - the tensor must be computed over an
    extended RNS basis (the product exceeds Q) with an exact lift
    (fixed-point k-correction, BEHZ/HPS style) before the t/Q scaling;
    the mod-Q shortcut below loses the high part. The scaling primitive
    (_scale_t_over_q) is exact and unit-tested; the exact lift is the
    remaining piece. Raises until then."""
    raise NotImplementedError(
        "ct x ct needs the extended-basis tensor (see docstring); "
        "the protocol itself never uses ciphertext-ciphertext products")
    # unreachable reference implementation of the mod-Q tensor:
    assert a.level == b.level and not a.is_ntt and not b.is_ntt
    lvl = a.level
    qj, uj, sj = backend._consts(lvl)
    q2 = qj[:, None]
    a_ntt = backend._ntt(a.data, lvl)
    b_ntt = backend._ntt(b.data, lvl)
    a0, a1 = a_ntt[..., 0, :, :], a_ntt[..., 1, :, :]
    b0, b1 = b_ntt[..., 0, :, :], b_ntt[..., 1, :, :]
    mm = lambda x, y: barrett_mul(x, y, q2, uj[:, None], sj[:, None])
    d0 = backend._intt(mm(a0, b0), lvl)
    d1 = backend._intt(add_rns(mm(a0, b1), mm(a1, b0), q2), lvl)
    d2 = backend._intt(mm(a1, b1), lvl)
    d0 = _scale_t_over_q(backend, d0, lvl)
    d1 = _scale_t_over_q(backend, d1, lvl)
    d2 = _scale_t_over_q(backend, d2, lvl)
    return d0, d1, d2


def mul_relin(backend: BgvBackend, a: CtBatch, b: CtBatch, ks, rlk) -> CtBatch:
    """MulRelinNew: tensor + relinearize back to degree 1."""
    d0, d1, d2 = mul_ct_ct(backend, a, b)
    c0, c1 = ks.relinearize(d0, d1, d2, a.level, rlk)
    return CtBatch(data=jnp.stack([c0, c1], axis=-3), level=a.level)
