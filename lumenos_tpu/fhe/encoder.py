"""Slot encoder over Z_t + plaintext embeddings (Delta*m, NTT lifts).

Counterpart of lattigo's bgv.Encoder (SURVEY.md 2.3). SIMD slot semantics:
slot j of row r evaluates the plaintext polynomial at psi_t^(5^c * (-1)^r);
the slot set covers ALL odd exponents, which gives the sum-of-slots = N*c_0
identity exploited by the rotation-free inner products (DESIGN.md section 4).

Encode: values -> NTT-domain positions (params.slot_perm) -> INTT over Z_t.
Decode: NTT over Z_t -> gather slot positions.
"""

from __future__ import annotations

import numpy as np

from .. import jaxcfg  # noqa: F401
import jax.numpy as jnp

from .params import BgvParams
from .ring import ntt_fwd, ntt_inv, barrett_mul


class SlotEncoder:
    def __init__(self, params: BgvParams):
        self.params = params
        self.t = params.t
        self.n = params.n
        lt = params.t_limb
        self._t_arr = np.array([lt.q], dtype=np.uint64)
        self._fwd = (lt.psi_fwd[None], lt.psi_fwd_shoup[None])
        self._bwd = (lt.psi_bwd[None], lt.psi_bwd_shoup[None],
                     np.array([lt.n_inv], dtype=np.uint64),
                     np.array([lt.n_inv_shoup], dtype=np.uint64))

    def encode(self, values) -> jnp.ndarray:
        """[..., k<=N] slot values (mod t) -> [..., N] poly coefficients mod t.

        Shorter vectors are zero-padded (slots k..N-1 = 0), matching the
        protocol's use (columns of `rows` values, zero elsewhere).
        """
        v = jnp.asarray(values, jnp.uint64)
        k = v.shape[-1]
        if k < self.n:
            pad = [(0, 0)] * (v.ndim - 1) + [(0, self.n - k)]
            v = jnp.pad(v, pad)
        # scatter into NTT-domain order
        ntt_dom = jnp.zeros(v.shape, jnp.uint64).at[..., self.params.slot_perm].set(v)
        ntt_dom = ntt_dom[..., None, :]  # limb axis of size 1 (Z_t)
        poly = ntt_inv(ntt_dom, *self._bwd, self._t_arr)
        return poly[..., 0, :]

    def decode(self, poly_t, k: int | None = None) -> jnp.ndarray:
        """[..., N] coefficients mod t -> [..., k] slot values."""
        p = jnp.asarray(poly_t, jnp.uint64)[..., None, :]
        ntt_dom = ntt_fwd(p, *self._fwd, self._t_arr)[..., 0, :]
        vals = ntt_dom[..., self.params.slot_perm]
        if k is not None:
            vals = vals[..., :k]
        return vals

    # ------ plaintext embeddings into R_Q ---------------------------------

    def lift_to_rns(self, poly_t, level: int) -> jnp.ndarray:
        """[..., N] mod-t coefficients -> [..., L+1, N] per-limb residues."""
        q, _, _ = self.params.limb_consts(level)
        qj = jnp.asarray(q)[..., None]  # [L+1, 1]
        return jnp.asarray(poly_t, jnp.uint64)[..., None, :] % qj

    def embed_delta_m(self, poly_t, level: int) -> jnp.ndarray:
        """Delta*m = round(Q*m/t) in RNS: [..., N] mod t -> [..., L+1, N].

        Per limb: (-r_m) * t^{-1} mod q_i with r_m = [m * (Q mod t)]_t
        (Q = 0 mod q_i makes the integer part vanish per limb).
        """
        p = self.params
        Q = 1
        for i in range(level + 1):
            Q *= p.q_primes[i]
        q_mod_t = Q % p.t
        # r_m = m * (Q mod t) mod t  (in the t-field)
        tl = p.t_limb
        t_arr = jnp.asarray(np.array([tl.q], dtype=np.uint64))
        u_arr = jnp.asarray(np.array([tl.barrett_u], dtype=np.uint64))
        s_arr = jnp.asarray(np.array([tl.barrett_s], dtype=np.uint64))
        pm = jnp.asarray(poly_t, jnp.uint64)[..., None, :]
        r_m = barrett_mul(pm, jnp.asarray(np.uint64(q_mod_t)), t_arr[:, None],
                          u_arr[:, None], s_arr[:, None])[..., 0, :]
        # per limb: (q_i - r_m mod q_i) * t^{-1} mod q_i
        q, u, s = p.limb_consts(level)
        t_inv = np.array([pow(p.t, int(qi) - 2, int(qi)) for qi in q], dtype=np.uint64)
        qj = jnp.asarray(q)[:, None]
        uj = jnp.asarray(u)[:, None]
        sj = jnp.asarray(s)[:, None]
        neg_rm = (qj - (r_m[..., None, :] % qj)) % qj
        return barrett_mul(neg_rm, jnp.asarray(t_inv)[:, None], qj, uj, sj)
