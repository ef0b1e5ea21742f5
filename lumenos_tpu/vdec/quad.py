"""LNP quadratic-relation layer: projection shortness proofs + quad-eval.

Counterpart of the reference's lnp_tbox machinery (vdec/c/src/vdec.c:
360-864 + lazer's lnp_quad_many): on top of the ABDLOP commitment and the
masked linear-form opening (vdec/pod.py), prove in zero-knowledge that the
committed witness is SHORT — not just that the masked opening has small
norm — via the 256-dimensional projection argument, with the projection's
correctness enforced by quadratic equations over the committed vector.

Protocol (one projection per witness block; we run two: the ternary
secret-key block S and the noise/wrap block EV):

  1. commit w in the Ajtai part; commit gaussian masks y_p (256 coeffs =
     4 ring polys) and a private sign beta_p in BDLOP slots
     (vdec.c:392-446);
  2. derive R_p in {0,+-1}^{256 x dim_p} from the transcript
     (_expand_R_i2 / brandom distribution), send
        z_p = beta_p * R_p P(w_p) + y_p            over the integers,
     bimodal rejection so z_p leaks nothing (rej_bimodal, vdec.c:510);
     the verifier checks ||z_p||_inf <= sqrt(Bz4_p): by the projection
     lemma (LNP22 Lemma 2.8) any witness consistent with 2*KAPPA of the
     z-coordinates has ||P(w_p)||_2 <= sqrt(337) * max|z_p| except with
     probability 2^-KAPPA — a coefficient-scale bound with slack
     ~sqrt(337), far tighter than the opening-norm bound 2*sigma1*
     sqrt(2 m1 d);
  3. z-correctness is quadratic in committed values (beta_p * w).
     Compress the 256 scalar equations
        y_p[i] + beta_p (R_p P(w_p))[i] - z_p[i] = 0
     with lambda uniform challenge vectors V_k in Z_q^256 into polynomial
     equations via the automorphism inner-product identity
        <a, P(x)> = const-coeff( sum_j sigma(x_j) * a_j(X) ),
     each masked by a committed uniform garbage poly g_k with zero
     constant coefficient:  h_k = g_k + E_k  is sent, verifier checks
     coeff0(h_k) = 0  (vdec.c:588-760).  NOTE the ordering deviation
     from the reference: vdec.c seeds the z-equation challenges V from
     the hash SAVED BEFORE tg (the g commitment) is absorbed
     (vdec.c:556 hash0 vs :625), which lets a prover choose g after
     seeing V; we derive V strictly after t_g enters the transcript.
  4. the 2*lambda h-equations plus beta_p^2 = 1 are combined with
     transcript scalars mu into ONE quadratic form Q over the committed
     vector and proven with the standard ABDLOP quadratic argument
     (lnp_quad_many_prove, vdec.c:783): with masked openings
     Z = c*s_hat + Y, the verifier's evaluation satisfies
        E(Z) := Z^T R2 Z + c r1 Z + c^2 r0 = t0 + c t1 + c^2 Q(s_hat),
     the prover commits t1 in a BDLOP extension slot (t_g1) and sends
     v0 = t0 + b_g1 y2 before the challenge; the verifier checks
        E(Z) - (c t_g1 - b_g1 z2) == v0.
     Challenges are sigma-invariant (o(c) = c, coefficients uniform in
     [-omega, omega]; lazer's quad-eval space), so sigma(z1) =
     c sigma(s1) + sigma(y1) and automorphism pairs evaluate uniformly.

Committed-vector layout (s_hat, length 2*m1 + 18 + n_g):
  [0, m1)           w                (Ajtai part)
  [m1, 2m1)         sigma(w)
  [2m1, 2m1+8)      y  (y_s 4 polys, y_ev 4 polys)    (BDLOP)
  [2m1+8, 2m1+16)   sigma(y)
  2m1+16, 2m1+17    beta_s, beta_ev                    (BDLOP)
  [2m1+18, ...)     g  (2*lambda polys)                (BDLOP)
BDLOP slot order in m / t_B: [y (8), beta (2), g (n_g), t1 (1, lext)].
"""

from __future__ import annotations

import ctypes
import hashlib
import secrets
from dataclasses import dataclass

import numpy as np

from .lnp import D, LnpRing, rejection_accept

KAPPA = 100          # statistical security of the proof (params_gen.KAPPA)
N_PROJ = 256         # projection dimension (vdec.c: 256)
OMEGA = 8            # challenge coefficient bound (vdec_params.h)


# ---------------------------------------------------------------------------
# ring helpers over the native layer

def ring_mul(ring: LnpRing, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Elementwise negacyclic product of residue vectors [n, L, D]."""
    n = a.shape[0]
    ac = np.ascontiguousarray(a)
    bc = np.ascontiguousarray(b)
    out = np.zeros_like(ac)
    ring.lib.lnp_polyvec_mul(ring.handle, ac.ctypes.data, bc.ctypes.data,
                             out.ctypes.data, n)
    return out


def ring_auto(ring: LnpRing, a: np.ndarray) -> np.ndarray:
    """sigma = (X -> X^{-1}) on residues [n, L, D]."""
    ac = np.ascontiguousarray(a)
    out = np.zeros_like(ac)
    ring.lib.lnp_auto(ring._primes.ctypes.data, ring.L, ac.ctypes.data,
                      out.ctypes.data, a.shape[0])
    return out


def auto_signed(ring: LnpRing, a: np.ndarray) -> np.ndarray:
    """sigma on signed coefficient vectors [n, D]."""
    ac = np.ascontiguousarray(a, np.int64)
    out = np.zeros_like(ac)
    ring.lib.lnp_auto_signed(ac.ctypes.data, out.ctypes.data, a.shape[0])
    return out


def quad_challenge(ring: LnpRing, hash_: bytes) -> np.ndarray:
    """sigma-invariant challenge, coefficients in [-OMEGA, OMEGA]."""
    c = np.zeros(D, np.int64)
    ring.lib.lnp_quad_challenge(hash_, len(hash_), OMEGA, c.ctypes.data)
    return c


def challenge_matrix(c: np.ndarray) -> np.ndarray:
    """[D, D] int64 matrix M with (w @ M.T) = negacyclic c*w for signed
    coefficient rows w (used for z1 = y1 + c*w without residue lifts)."""
    m = np.zeros((D, D), np.int64)
    for i in range(D):
        ci = int(c[i])
        if ci == 0:
            continue
        for j in range(D):
            k = i + j
            if k < D:
                m[k, j] += ci
            else:
                m[k - D, j] -= ci
    return m


def expand_v(ring: LnpRing, seed: bytes, domain: int, count: int) -> np.ndarray:
    """count x N_PROJ uniform Z_q scalars as residues [count, N_PROJ, L]."""
    polys = ring.expand_uniform(seed, domain, count * N_PROJ // D)
    # [count*4, L, D] -> scalars: coefficient j of poly b = entry b*D+j
    out = np.zeros((count, N_PROJ, ring.L), np.uint64)
    per = N_PROJ // D
    for k in range(count):
        for b in range(per):
            for l in range(ring.L):
                out[k, b * D:(b + 1) * D, l] = polys[k * per + b, l]
    return out


def project(ring: LnpRing, seed: bytes, x_signed: np.ndarray) -> np.ndarray:
    """R * P(x) over the integers; x_signed [n_chunks, D] -> [N_PROJ]."""
    flat = np.ascontiguousarray(x_signed.reshape(-1), np.int64)
    out = np.zeros(N_PROJ, np.int64)
    ring.lib.lnp_project(seed, len(seed), flat.ctypes.data, flat.size,
                         out.ctypes.data)
    return out


def v_dot_R(ring: LnpRing, seed: bytes, v_res: np.ndarray, dim: int
            ) -> np.ndarray:
    """V_k * R_p as chunk polys: [N_PROJ, L] residues -> [dim//D, L, D]."""
    vc = np.ascontiguousarray(v_res, np.uint64)
    out = np.zeros((ring.L, dim), np.uint64)
    ring.lib.lnp_vR(ring._primes.ctypes.data, ring.L, seed, len(seed),
                    vc.ctypes.data, dim, out.ctypes.data)
    # [L, dim] -> chunk polys [dim//D, L, D]
    return np.ascontiguousarray(out.reshape(ring.L, dim // D, D)
                                .transpose(1, 0, 2))



def vec_dot_scalars(ring: LnpRing, v_res: np.ndarray, z: np.ndarray
                    ) -> np.ndarray:
    """<V_k, z> mod q: v_res [N_PROJ, L] x signed z [N_PROJ] -> [L, D]."""
    out = np.zeros((ring.L, D), np.uint64)
    for li, q in enumerate(ring.params.primes):
        acc = 0
        qv = int(q)
        for i in range(N_PROJ):
            acc = (acc + int(v_res[i, li]) * int(z[i])) % qv
        out[li, 0] = acc
    return out


# ---------------------------------------------------------------------------
# sparse quadratic form

@dataclass
class QuadForm:
    """Q(s_hat) = sum R2[(a,b)] s_a s_b + sum r1[a] s_a + r0 over R_q."""

    r2: dict            # (a, b) -> residues [L, D]
    r1: dict            # a -> residues [L, D]
    r0: np.ndarray      # [L, D]

    def add_r2(self, ring, a, b, poly_res):
        key = (a, b)
        if key in self.r2:
            self.r2[key] = _addp(ring, self.r2[key], poly_res)
        else:
            self.r2[key] = poly_res.copy()

    def add_r1(self, ring, a, poly_res):
        if a in self.r1:
            self.r1[a] = _addp(ring, self.r1[a], poly_res)
        else:
            self.r1[a] = poly_res.copy()

    def add_r0(self, ring, poly_res):
        self.r0 = _addp(ring, self.r0, poly_res)


def qf_arrays(ring: LnpRing, qf: "QuadForm"):
    """Stack the sparse form into index/coefficient arrays so each
    evaluation is a handful of batched native calls instead of
    thousands of per-term ctypes round-trips."""
    k2 = list(qf.r2.keys())
    k1 = list(qf.r1.keys())
    ia = np.array([a for a, _ in k2], np.int64)
    ib = np.array([b for _, b in k2], np.int64)
    co2 = (np.stack([qf.r2[k] for k in k2])
           if k2 else np.zeros((0, ring.L, D), np.uint64))
    i1 = np.array(k1, np.int64)
    co1 = (np.stack([qf.r1[k] for k in k1])
           if k1 else np.zeros((0, ring.L, D), np.uint64))
    return ia, ib, co2, i1, co1


def _mod_sum(ring: LnpRing, prods: np.ndarray) -> np.ndarray:
    """Sum [K, L, D] residues mod each prime (values < 2^51; K < 2^13
    keeps the u64 accumulation exact)."""
    s = prods.sum(axis=0, dtype=np.uint64)
    q = np.asarray(ring._primes)[:, None]
    return (s % q).astype(np.uint64)


def eval_quad_batched(ring: LnpRing, arrs, xs: np.ndarray,
                      ys: np.ndarray | None = None):
    """(t_quad, t_lin): sum co2 * xs_a * zs_b and sum co1 * xs_a where
    zs = ys or xs — one batched native mul per stage."""
    ia, ib, co2, i1, co1 = arrs
    zs = xs if ys is None else ys
    out_q = np.zeros((ring.L, D), np.uint64)
    out_l = np.zeros((ring.L, D), np.uint64)
    if len(ia):
        prods = ring_mul(ring, ring_mul(ring, xs[ia], zs[ib]), co2)
        out_q = _mod_sum(ring, prods)
    if len(i1):
        out_l = _mod_sum(ring, ring_mul(ring, xs[i1], co1))
    return out_q, out_l


def eval_t0_t1(ring: LnpRing, arrs, s_hat: np.ndarray, y_vec: np.ndarray):
    """Garbage-commitment pair for the quadratic opening:
    t0 = sum co2 y_a y_b;  t1 = sum co2 (s_a y_b + y_a s_b) + sum co1 y_a.
    """
    ia, ib, co2, i1, co1 = arrs
    t0 = np.zeros((ring.L, D), np.uint64)
    t1 = np.zeros((ring.L, D), np.uint64)
    if len(ia):
        t0 = _mod_sum(ring, ring_mul(ring, ring_mul(
            ring, y_vec[ia], y_vec[ib]), co2))
        cross = ring.add(ring_mul(ring, s_hat[ia], y_vec[ib]),
                         ring_mul(ring, y_vec[ia], s_hat[ib]))
        t1 = _mod_sum(ring, ring_mul(ring, cross, co2))
    if len(i1):
        t1 = ring.add(t1[None], _mod_sum(
            ring, ring_mul(ring, y_vec[i1], co1))[None])[0]
    return t0, t1


def _addp(ring, a, b):
    return ring.add(a[None], b[None])[0]


def _subp(ring, a, b):
    return ring.sub(a[None], b[None])[0]


def _mulp(ring, a, b):
    return ring_mul(ring, a[None], b[None])[0]
