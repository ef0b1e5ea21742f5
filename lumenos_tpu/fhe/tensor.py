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


# ---------------------------------------------------------------------------
# extended-basis tensor (HPS-style): the integer tensor coefficients reach
# N * Q^2, so the product is computed in the combined basis M = Q * B
# (B = fresh 55-bit NTT-friendly primes with Q*B > N*Q^2), then scaled
# back to Q with an exact generalized scale-and-round round(t*z/Q) =
# round((t*B) * z / M).

@lru_cache(maxsize=None)
def _ext_consts(backend_id: int, level: int, t: int, q_primes: tuple,
                p_primes: tuple, n: int):
    from .params import _build_limb, _ntt_friendly_primes
    qs = [int(q) for q in q_primes[: level + 1]]
    Q = 1
    for q in qs:
        Q *= q
    need_bits = Q.bit_length() + n.bit_length() + 2   # M > 4*N*Q^2 margin
    b_count = -(-need_bits // 54)
    avoid = set(qs) | set(int(p) for p in p_primes) | {t}
    bs = _ntt_friendly_primes(55, 2 * n, b_count, avoid)
    B = 1
    for bq in bs:
        B *= bq
    limbs_b = [_build_limb(bq, n) for bq in bs]

    # Q -> B extension constants
    lam_q = [pow(Q // q, q - 2, q) for q in qs]
    qj_mod_b = [[(Q // q) % bq for bq in bs] for q in qs]
    q_mod_b = [Q % bq for bq in bs]
    u_q = [(1 << 118) // q for q in qs]   # fits u64 for q >= 2^55

    # (tB / M) scale-and-round constants over the combined limbs ms
    ms = qs + bs
    M = Q * B
    tB = t * B
    lam_m = [pow(M // m, m - 2, m) for m in ms]
    c_mod_q = [[(tB // m) % q for q in qs] for m in ms]
    frac_hi = [(((tB % m) << 128) // m) >> 64 for m in ms]
    frac_lo = [(((tB % m) << 128) // m) & ((1 << 64) - 1) for m in ms]
    u_m = [(1 << 118) // m for m in ms]   # fits u64 for m >= 2^55
    tB_mod_q = [tB % q for q in qs]
    return (qs, bs, limbs_b, lam_q, qj_mod_b, q_mod_b, u_q,
            lam_m, c_mod_q, frac_hi, frac_lo, u_m, tB_mod_q)


def _b_consts(limbs_b):
    """B-limb Barrett constants as HOST numpy arrays (ntt_fwd/ntt_inv
    require the modulus vector as a trace-time constant)."""
    bq = np.array([l.q for l in limbs_b], dtype=np.uint64)
    bu = np.array([l.barrett_u for l in limbs_b], dtype=np.uint64)
    bsh = np.array([l.barrett_s for l in limbs_b], dtype=np.uint64)
    return bq, bu, bsh


def _base_extend_with(backend: BgvBackend, x_q, level: int, ext):
    """x [..., L, N] residues mod Q-limbs -> [..., Lb, N] mod B-limbs,
    exact via the fixed-point overflow count k = floor(sum_j y_j / q_j)
    (off-by-one probability ~ 2^-55 per coefficient — the standard HPS
    fast-base-extension caveat)."""
    (qs, bs, limbs_b, lam_q, qj_mod_b, q_mod_b, u_q, *_) = ext
    L = len(qs)
    qj, uj, sj = backend._consts(level)
    lam_j = jnp.asarray(np.array(lam_q, np.uint64))[:, None]
    y = barrett_mul(x_q, lam_j, qj[:, None], uj[:, None], sj[:, None])

    u_j = jnp.asarray(np.array(u_q, np.uint64))[:, None]
    k_hi, _ = mul64wide(y, u_j)
    k = jnp.sum(k_hi, axis=-2) >> _u64(54)          # [..., N], < L

    bq, bu, bsh = _b_consts(limbs_b)
    b2 = bq[:, None]
    acc = None
    for j in range(L):
        yj = y[..., j, :][..., None, :]             # broadcast over B limbs
        cj = jnp.asarray(np.array(qj_mod_b[j], np.uint64))[:, None]
        term = barrett_mul(yj % b2, cj, b2, bu[:, None], bsh[:, None])
        acc = term if acc is None else add_rns(acc, term, b2)
    qmb = jnp.asarray(np.array(q_mod_b, np.uint64))[:, None]
    kq = barrett_mul(k[..., None, :] % b2, qmb, b2, bu[:, None], bsh[:, None])
    return sub_rns(acc, kq, b2)


def _scale_tB_over_M(backend: BgvBackend, z_q, z_b, level: int, ext):
    """round((t*B) * z / M) mod each q_i for z given as residues over the
    combined basis (z_q over Q-limbs, z_b over B-limbs) -> [..., L, N].
    Same algorithm as _scale_t_over_q generalized to a >64-bit scale:
    the per-limb integer part uses (floor(tB/m) mod q_i) via Barrett."""
    (qs, bs, limbs_b, _, _, _, _,
     lam_m, c_mod_q, frac_hi, frac_lo, u_m, tB_mod_q) = ext
    qj, uj, sj = backend._consts(level)
    q2 = qj[:, None]
    bq, bu, bsh = _b_consts(limbs_b)
    n_m = len(qs) + len(bs)

    # y'_m per limb (own-limb barrett)
    lam_qq = jnp.asarray(np.array(lam_m[: len(qs)], np.uint64))[:, None]
    lam_bb = jnp.asarray(np.array(lam_m[len(qs):], np.uint64))[:, None]
    y_q = barrett_mul(z_q, lam_qq, q2, uj[:, None], sj[:, None])
    y_b = barrett_mul(z_b, lam_bb, bq[:, None], bu[:, None], bsh[:, None])
    ys = [y_q[..., m, :] for m in range(len(qs))] + \
         [y_b[..., m, :] for m in range(len(bs))]

    acc = None                       # integer parts, accumulated mod q_i
    frac_sum_lo = None               # 2^64 fixed-point fraction, 32-bit split
    frac_sum_hi = None
    k_acc = None
    for m in range(n_m):
        ym = ys[m][..., None, :]                       # [..., 1, N]
        cm = jnp.asarray(np.array(c_mod_q[m], np.uint64))[:, None]
        g_int = barrett_mul(ym % q2, cm, q2, uj[:, None], sj[:, None])
        vh = _u64(frac_hi[m])
        vl = _u64(frac_lo[m])
        p1h, p1l = mul64wide(ym, vh)
        p2h, _ = mul64wide(ym, vl)
        s128 = p1l + p2h
        carry1 = jnp.where(s128 < p1l, _u64(1), _u64(0))
        g_floor = (p1h + carry1) % q2                  # < y_m < 2^58
        term = add_rns(g_int, g_floor, q2)
        acc = term if acc is None else add_rns(acc, term, q2)
        fl = s128[..., 0, :] & _u64(0xFFFFFFFF)
        fh = s128[..., 0, :] >> _u64(32)
        frac_sum_lo = fl if frac_sum_lo is None else frac_sum_lo + fl
        frac_sum_hi = fh if frac_sum_hi is None else frac_sum_hi + fh
        kh, _ = mul64wide(ys[m], _u64(u_m[m]))
        k_acc = kh if k_acc is None else k_acc + kh
    total_lo = frac_sum_lo + ((frac_sum_hi & _u64(0xFFFFFFFF)) << _u64(32))
    carry = (frac_sum_hi >> _u64(32)) + jnp.where(total_lo < frac_sum_lo,
                                                  _u64(1), _u64(0))
    round_bit = carry + jnp.where((total_lo + _u64(1 << 63)) < total_lo,
                                  _u64(1), _u64(0))
    # Overflow count, ROUNDED to nearest: the tensor coefficient is signed
    # with |z| < N*Q^2 <= M/4, so Z/M lives in [0, 1/4) u (3/4, 1).
    # Nearest-rounding both absorbs the <= n_m-ulp truncation underestimate
    # (Z near 0 would otherwise undercount k by 1 -> spurious +tB) and
    # selects k+1 for negative z, i.e. scales the CENTERED representative.
    k = (k_acc + _u64(1 << 53)) >> _u64(54)

    out = add_rns(acc, round_bit[..., None, :] % q2, q2)
    tb_q = jnp.asarray(np.array(tB_mod_q, np.uint64))[:, None]
    kt = barrett_mul(k[..., None, :] % q2, tb_q, q2, uj[:, None], sj[:, None])
    return sub_rns(out, kt, q2)


def mul_ct_ct(backend: BgvBackend, a: CtBatch, b: CtBatch):
    """Tensor product -> degree-2 ciphertext components (d0, d1, d2).

    lattigo MulScaleInvariant equivalent (vdec/batching.go:27): lift both
    ciphertexts to the extended basis Q*B (exact fast base extension),
    NTT-tensor in both bases, and scale each component by t/Q with the
    exact generalized scale-and-round. Phases Delta-embed products:
    round((t/Q) * phase_a * phase_b) = Delta*(m_a*m_b) + small error
    (module docstring)."""
    assert a.level == b.level and not a.is_ntt and not b.is_ntt
    lvl = a.level
    p = backend.params
    ext = _ext_consts(id(backend), lvl, p.t, p.q_primes, p.p_primes, p.n)
    (qs, bs, limbs_b, *_) = ext

    qj, uj, sj = backend._consts(lvl)
    q2 = qj[:, None]
    bq, bu, bsh = _b_consts(limbs_b)
    b2 = bq[:, None]

    # lift to B, NTT both bases
    a_b = _base_extend_with(backend, a.data, lvl, ext)
    b_b = _base_extend_with(backend, b.data, lvl, ext)
    from .ring import ntt_fwd, ntt_inv
    # host-side constant tables (ntt_fwd/ntt_inv np.asarray their q/ninv
    # args, so these must not be device/tracer arrays under jit)
    fwd_b = np.stack([np.asarray(l.psi_fwd) for l in limbs_b])
    fwds_b = np.stack([np.asarray(l.psi_fwd_shoup) for l in limbs_b])
    bwd_b = np.stack([np.asarray(l.psi_bwd) for l in limbs_b])
    bwds_b = np.stack([np.asarray(l.psi_bwd_shoup) for l in limbs_b])
    ninv_b = np.array([l.n_inv for l in limbs_b], np.uint64)
    ninvs_b = np.array([l.n_inv_shoup for l in limbs_b], np.uint64)

    aq = backend._ntt(a.data, lvl)
    bq_ntt = backend._ntt(b.data, lvl)
    ab = ntt_fwd(a_b, fwd_b, fwds_b, bq)
    bb = ntt_fwd(b_b, fwd_b, fwds_b, bq)

    mmq = lambda x, y: barrett_mul(x, y, q2, uj[:, None], sj[:, None])
    mmb = lambda x, y: barrett_mul(x, y, b2, bu[:, None], bsh[:, None])

    def tensor(basis_a, basis_b, mm, addq):
        a0, a1 = basis_a[..., 0, :, :], basis_a[..., 1, :, :]
        b0, b1 = basis_b[..., 0, :, :], basis_b[..., 1, :, :]
        return (mm(a0, b0), addq(mm(a0, b1), mm(a1, b0)), mm(a1, b1))

    dq = tensor(aq, bq_ntt, mmq, lambda x, y: add_rns(x, y, q2))
    db = tensor(ab, bb, mmb, lambda x, y: add_rns(x, y, b2))
    backend._count_muls(a)

    outs = []
    for zq_ntt, zb_ntt in zip(dq, db):
        zq = backend._intt(zq_ntt, lvl)
        zb = ntt_inv(zb_ntt, bwd_b, bwds_b, ninv_b, ninvs_b, bq)
        outs.append(_scale_tB_over_M(backend, zq, zb, lvl, ext))
    return tuple(outs)


def mul_relin(backend: BgvBackend, a: CtBatch, b: CtBatch, ks, rlk) -> CtBatch:
    """MulRelinNew: tensor + relinearize back to degree 1."""
    d0, d1, d2 = mul_ct_ct(backend, a, b)
    c0, c1 = ks.relinearize(d0, d1, d2, a.level, rlk)
    return CtBatch(data=jnp.stack([c0, c1], axis=-3), level=a.level)


def mul_relin_jit(backend: BgvBackend, ks, rlk, level: int):
    """One jitted program for the whole scale-invariant multiply.

    Eagerly, mul_relin dispatches ~hundreds of device ops; over the
    remote-compile TPU tunnel each distinct op is a separate compile, so
    the jitted wrapper is the usable evaluator entry point on hardware
    (same pattern as BgvBackend._keygen_jit)."""
    import jax

    @jax.jit
    def run(a_data, b_data):
        a = CtBatch(data=a_data, level=level)
        b = CtBatch(data=b_data, level=level)
        return mul_relin(backend, a, b, ks, rlk).data

    return lambda a, b: CtBatch(data=run(a.data, b.data), level=level)
