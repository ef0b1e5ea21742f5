"""Hybrid RNS keyswitching, Galois automorphisms, rotations, relinearization.

Counterpart of lattigo's rlwe keyswitching stack (SURVEY.md 2.3:
ApplyEvaluationKey, GenGaloisKeysNew, InnerSum, relinearization). The
protocol hot path does NOT use rotations (DESIGN.md section 4), but the API
surface exists for parity: InnerSum-compatible mode, ring switching, and
ct x ct multiplication all run through this module.

Construction (GHS/hybrid): the switching key for target polynomial w under
secret s is, per digit d grouping alpha = |P| consecutive Q-limbs:

    ksk_d = ( -(a_d * s + e_d) + P * B_d * w ,  a_d )  over Q*P,
    B_d = (Q/Q_d) * [(Q/Q_d)^{-1}]_{Q_d}   (RNS digit reconstruction)

Application decomposes c1 into digits, base-extends each digit's residues
to the full Q*P basis (approximate fast base conversion), accumulates
digit x ksk products in the NTT domain, and divides by P with rounding.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import numpy as np

from .. import jaxcfg  # noqa: F401
import jax.numpy as jnp

from .backend import BgvBackend, CtBatch, SecretKey
from .params import BgvParams
from .ring import add_rns, barrett_mul, ntt_fwd, ntt_inv, sub_rns
from ..ops.modmath import _u64


# ---------------------------------------------------------------------------
# Galois automorphisms (coefficient-domain signed permutations)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def automorphism_tables(n: int, g: int):
    """X^j -> X^(g*j mod 2N): returns (src_index[n], negate[n]) so that
    out[dst] = +-in[src]: for j in [0,N): g*j = e mod 2N; if e < N:
    out[e] = in[j] else out[e-N] = -in[j]."""
    two_n = 2 * n
    src = np.zeros(n, dtype=np.int64)
    neg = np.zeros(n, dtype=bool)
    for j in range(n):
        e = (g * j) % two_n
        if e < n:
            src[e] = j
            neg[e] = False
        else:
            src[e - n] = j
            neg[e - n] = True
    return src, neg


def apply_automorphism(data, g: int, q: np.ndarray):
    """Coeff-domain automorphism on [..., L, N] residues."""
    n = data.shape[-1]
    src, negm = automorphism_tables(n, g)
    gathered = data[..., src]
    qj = jnp.asarray(np.asarray(q), jnp.uint64).reshape((len(q), 1))
    negated = jnp.where(gathered != 0, qj - gathered, gathered)
    return jnp.where(jnp.asarray(negm), negated, gathered)


def galois_element_rotation(k: int, n: int) -> int:
    """Slot rotation by k (within matrix rows): X -> X^(5^k)."""
    return pow(5, k, 2 * n)


def galois_element_row_swap(n: int) -> int:
    return 2 * n - 1


# ---------------------------------------------------------------------------
# switching keys
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class SwitchingKey:
    """ksk0/ksk1: [dnum, L_qp, N] NTT-domain residues over Q+P."""

    ksk0: jnp.ndarray
    ksk1: jnp.ndarray
    alpha: int       # limbs per digit (= |P|)
    level: int       # max Q level covered


class KeySwitcher:
    def __init__(self, backend: BgvBackend):
        self.backend = backend
        self.params = backend.params

    # -- constants ---------------------------------------------------------

    @lru_cache(maxsize=None)
    def _qp_consts(self, level: int):
        q, u, s = self.params.limb_consts(level, with_p=True)
        return jnp.asarray(q), jnp.asarray(u), jnp.asarray(s)

    @lru_cache(maxsize=None)
    def _digit_consts(self, level: int):
        """Per digit d: indices of its limbs; per (digit, limb j in digit):
        [ (Q_d/q_j)^{-1} ]_{q_j}; per (digit, target limb i over QP):
        (Q_d/q_j) mod p_i."""
        p = self.params
        alpha = len(p.p_primes)
        qs = [int(x) for x in p.q_primes[: level + 1]]
        all_primes = qs + [int(x) for x in p.p_primes]
        dnum = (len(qs) + alpha - 1) // alpha
        digits = []
        for d in range(dnum):
            idx = list(range(d * alpha, min((d + 1) * alpha, len(qs))))
            Qd = 1
            for j in idx:
                Qd *= qs[j]
            inv_hat = np.array(
                [pow(Qd // qs[j], qs[j] - 2, qs[j]) for j in idx], dtype=np.uint64)
            hat_mod = np.array(
                [[(Qd // qs[j]) % pi for pi in all_primes] for j in idx],
                dtype=np.uint64)
            qd_mod = np.array([Qd % pi for pi in all_primes], dtype=np.uint64)
            digits.append((idx, inv_hat, hat_mod, qd_mod, Qd))
        return digits

    @lru_cache(maxsize=None)
    def _moddown_consts(self, level: int):
        """P^{-1} mod q_i and (for the centered correction) P-related consts."""
        p = self.params
        P = 1
        for x in p.p_primes:
            P *= int(x)
        qs = [int(x) for x in p.q_primes[: level + 1]]
        p_inv = np.array([pow(P % qi, qi - 2, qi) for qi in qs], dtype=np.uint64)
        # fast base conversion P -> Q consts
        ps = [int(x) for x in p.p_primes]
        inv_hat = np.array(
            [pow(P // pj, pj - 2, pj) for pj in ps], dtype=np.uint64)
        hat_mod = np.array([[(P // pj) % qi for qi in qs] for pj in ps],
                           dtype=np.uint64)
        p_mod = np.array([P % qi for qi in qs], dtype=np.uint64)
        return p_inv, inv_hat, hat_mod, p_mod, P

    # -- key generation ----------------------------------------------------

    def gen_switching_key(self, w_ntt_qp, sk: SecretKey,
                          rng: np.random.Generator, level: int | None = None,
                          sk_out_ntt_qp=None) -> SwitchingKey:
        """Key switching FROM key w TO key s_out: ksk_d =
        (-(a*s_out + e) + P*B_d*w, a). Applying it to a ciphertext component
        c1 yields (d0, d1) with d0 + d1*s_out = c1*w.

        w_ntt_qp: [L_qp, N] NTT-domain residues of the OLD key polynomial
        (e.g. automorphism(s), s^2, or the big-ring secret for a ring
        switch); sk_out defaults to `sk` (same-key switching)."""
        p = self.params
        if level is None:
            level = p.max_level
        alpha = len(p.p_primes)
        n_q = level + 1
        digits = self._digit_consts(level)
        dnum = len(digits)
        n = p.n
        qj, uj, sj = self._qp_consts(level)
        q_np, _, _ = p.limb_consts(level, with_p=True)
        L_qp = len(q_np)
        P = 1
        for x in p.p_primes:
            P *= int(x)

        backend = self.backend
        ksk0_list, ksk1_list = [], []
        s_ntt_qp = sk_out_ntt_qp if sk_out_ntt_qp is not None else self._sk_ntt_qp(sk, level)
        for d, (idx, _, _, _, Qd) in enumerate(digits):
            a = np.stack([rng.integers(0, int(qi), n, dtype=np.uint64)
                          for qi in q_np])
            e = backend._sample_err(rng, (n,))
            a_ntt = jnp.asarray(a)
            e_rns = self._signed_to_rns_qp(e, level)
            e_ntt = self._ntt_qp(e_rns, level)
            a_s = barrett_mul(a_ntt, s_ntt_qp, qj[:, None], uj[:, None], sj[:, None])
            base = sub_rns(jnp.zeros_like(a_s), add_rns(a_s, e_ntt, qj[:, None]),
                           qj[:, None])
            # + P * B_d * w  : B_d = 0 mod q_j for j not in digit;
            # B_d = Qd/q_j * inv = 1 * ... => P*B_d mod q_j = P mod q_j for
            # j in digit; 0 on other Q limbs; 0 on P limbs (P*B_d = 0 mod p).
            pb = np.zeros(L_qp, dtype=np.uint64)
            for j in idx:
                qjv = int(q_np[j])
                pb[j] = (P % qjv)
            pbw = barrett_mul(w_ntt_qp, jnp.asarray(pb)[:, None],
                              qj[:, None], uj[:, None], sj[:, None])
            ksk0_list.append(add_rns(base, pbw, qj[:, None]))
            ksk1_list.append(a_ntt)
        return SwitchingKey(ksk0=jnp.stack(ksk0_list), ksk1=jnp.stack(ksk1_list),
                            alpha=alpha, level=level)

    # -- helpers over the extended QP basis --------------------------------

    def _sk_ntt_qp(self, sk: SecretKey, level: int):
        n_q = len(self.params.q_primes)
        idx = list(range(level + 1)) + list(
            range(n_q, n_q + len(self.params.p_primes)))
        return sk.s_ntt[np.array(idx)]

    def _signed_to_rns_qp(self, x: np.ndarray, level: int):
        q, _, _ = self.params.limb_consts(level, with_p=True)
        xj = jnp.asarray(x.astype(np.int64))[..., None, :]
        qj = jnp.asarray(q.astype(np.int64))[:, None]
        return ((xj % qj) + qj).astype(jnp.uint64) % qj.astype(jnp.uint64)

    def _ntt_qp(self, x, level: int):
        fwd, fwds, *_ = self.params.ntt_tables(level, with_p=True)
        q, _, _ = self.params.limb_consts(level, with_p=True)
        return ntt_fwd(x, fwd, fwds, q)

    def _intt_qp(self, x, level: int):
        _, _, bwd, bwds, ninv, ninvs = self.params.ntt_tables(level, with_p=True)
        q, _, _ = self.params.limb_consts(level, with_p=True)
        return ntt_inv(x, bwd, bwds, ninv, ninvs, q)

    # -- application -------------------------------------------------------

    def switch(self, c1_coeff, ksk: SwitchingKey, level: int):
        """Keyswitch the degree-1 component c1 [..., L_q, N] (coeff domain).
        Returns (d0, d1) coeff-domain over Q: the contribution pair such that
        d0 + d1*s = c1 * w (+ small error)."""
        p = self.params
        digits = self._digit_consts(level)
        qp, up, sp = self._qp_consts(level)
        qp2 = qp[:, None]
        L_qp = qp.shape[0]
        n = p.n

        # slice the stored max-level QP key down to this level's QP basis
        n_q_max = len(p.q_primes)
        limb_idx = np.array(list(range(level + 1)) +
                            list(range(n_q_max, n_q_max + len(p.p_primes))))
        ksk0 = ksk.ksk0[:, limb_idx, :]
        ksk1 = ksk.ksk1[:, limb_idx, :]

        acc0 = None
        acc1 = None
        for d, (idx, inv_hat, hat_mod, qd_mod, Qd) in enumerate(digits):
            # digit residues: y_j = [x_j * (Qd/q_j)^{-1}]_{q_j} for j in digit
            xs = c1_coeff[..., np.array(idx), :]
            qd_j = jnp.asarray(np.array([int(p.q_primes[j]) for j in idx],
                                        dtype=np.uint64))[:, None]
            ud_j = jnp.asarray(np.array([int(p.limbs[j].barrett_u) for j in idx],
                                        dtype=np.uint64))[:, None]
            sd_j = jnp.asarray(np.array([int(p.limbs[j].barrett_s) for j in idx],
                                        dtype=np.uint64))[:, None]
            y = barrett_mul(xs, jnp.asarray(inv_hat)[:, None], qd_j, ud_j, sd_j)
            # extend: ext_i = sum_j y_j * (Qd/q_j mod p_i)  (approx conversion)
            ext = None
            for jj in range(len(idx)):
                term = barrett_mul(
                    y[..., jj:jj + 1, :] % qp2,
                    jnp.asarray(hat_mod[jj])[:, None], qp2, up[:, None], sp[:, None])
                ext = term if ext is None else add_rns(ext, term, qp2)
            ext_ntt = self._ntt_qp(ext, level)
            t0 = barrett_mul(ext_ntt, ksk0[d], qp2, up[:, None], sp[:, None])
            t1 = barrett_mul(ext_ntt, ksk1[d], qp2, up[:, None], sp[:, None])
            acc0 = t0 if acc0 is None else add_rns(acc0, t0, qp2)
            acc1 = t1 if acc1 is None else add_rns(acc1, t1, qp2)

        acc0 = self._intt_qp(acc0, level)
        acc1 = self._intt_qp(acc1, level)
        return self._mod_down(acc0, level), self._mod_down(acc1, level)

    def _mod_down(self, x_qp, level: int):
        """[..., L_q+|P|, N] -> [..., L_q, N]: round(x / P) over Q."""
        p_inv, inv_hat, hat_mod, p_mod, P = self._moddown_consts(level)
        p = self.params
        n_q = level + 1
        xq = x_qp[..., :n_q, :]
        xp = x_qp[..., n_q:, :]
        qj, uj, sj = self.backend._consts(level)
        q2 = qj[:, None]
        # base-convert [x]_P to Q (approximate: + small multiple of P)
        ps = [int(v) for v in p.p_primes]
        yp = []
        for j, pj in enumerate(ps):
            lp = p.limbs[len(p.q_primes) + j]
            y = barrett_mul(xp[..., j:j + 1, :], _u64(int(inv_hat[j])),
                            _u64(pj), _u64(lp.barrett_u), _u64(lp.barrett_s))
            yp.append(y)
        conv = None
        for j in range(len(ps)):
            term = barrett_mul(yp[j] % q2, jnp.asarray(hat_mod[j])[:, None],
                               q2, uj[:, None], sj[:, None])
            conv = term if conv is None else add_rns(conv, term, q2)
        diff = sub_rns(xq, conv, q2)
        return barrett_mul(diff, jnp.asarray(p_inv)[:, None], q2,
                           uj[:, None], sj[:, None])

    # -- high-level ops ----------------------------------------------------

    def gen_galois_key(self, g: int, sk: SecretKey, rng: np.random.Generator
                       ) -> SwitchingKey:
        """Key for automorphism X -> X^g: target w = automorphism(s)."""
        p = self.params
        level = p.max_level
        q, _, _ = p.limb_consts(level, with_p=True)
        # sk residues in coeff domain over QP
        s_coeff = self._signed_to_rns_qp(sk.s_signed.astype(np.int64), level)
        s_auto = apply_automorphism(s_coeff, g, q)
        return self.gen_switching_key(self._ntt_qp(s_auto, level), sk, rng)

    def rotate(self, ct: CtBatch, k: int, gk: SwitchingKey) -> CtBatch:
        """Slot rotation by k via automorphism + keyswitch."""
        g = galois_element_rotation(k, self.params.n)
        return self._apply_galois(ct, g, gk)

    def row_swap(self, ct: CtBatch, gk: SwitchingKey) -> CtBatch:
        return self._apply_galois(ct, galois_element_row_swap(self.params.n), gk)

    def _apply_galois(self, ct: CtBatch, g: int, gk: SwitchingKey) -> CtBatch:
        assert not ct.is_ntt
        level = ct.level
        q, _, _ = self.params.limb_consts(level)
        c0 = apply_automorphism(ct.data[..., 0, :, :], g, q)
        c1 = apply_automorphism(ct.data[..., 1, :, :], g, q)
        d0, d1 = self.switch(c1, gk, level)
        qj, _, _ = self.backend._consts(level)
        out0 = add_rns(c0, d0, qj[:, None])
        return CtBatch(data=jnp.stack([out0, d1], axis=-3), level=level)

    def inner_sum(self, ct: CtBatch, n_sum: int, keys: dict) -> CtBatch:
        """InnerSum(1, n_sum): slot i += slots i+1..i+n_sum-1 (log-depth
        rotation tree; reference fhe/ligero.go:325 via lattigo InnerSum).
        `keys`: {galois_element: SwitchingKey} incl. row swap if n_sum = N.

        The doubling tree is only correct for power-of-two n_sum (the only
        case the protocol uses: rows is a power of two); lattigo's general
        ladder is not implemented, so reject other values instead of
        silently summing the wrong slot count (ADVICE.md round-1 low)."""
        backend = self.backend
        n = self.params.n
        if n_sum & (n_sum - 1):
            raise ValueError(f"inner_sum requires power-of-two n_sum, got {n_sum}")
        k = 1
        while k < min(n_sum, n // 2):
            g = galois_element_rotation(k, n)
            ct = backend.add(ct, self._apply_galois(ct, g, keys[g]))
            k *= 2
        if n_sum >= n:
            g = galois_element_row_swap(n)
            ct = backend.add(ct, self._apply_galois(ct, g, keys[g]))
        return ct

    def galois_elements_for_inner_sum(self, n_sum: int) -> list[int]:
        n = self.params.n
        els = []
        k = 1
        while k < min(n_sum, n // 2):
            els.append(galois_element_rotation(k, n))
            k *= 2
        if n_sum >= n:
            els.append(galois_element_row_swap(n))
        return els

    # -- relinearization (ct x ct support) ---------------------------------

    def gen_relin_key(self, sk: SecretKey, rng: np.random.Generator) -> SwitchingKey:
        """Key for s^2 -> s."""
        p = self.params
        level = p.max_level
        qp, up, sp = self._qp_consts(level)
        s2 = barrett_mul(self._sk_ntt_qp(sk, level), self._sk_ntt_qp(sk, level),
                         qp[:, None], up[:, None], sp[:, None])
        return self.gen_switching_key(s2, sk, rng)

    def relinearize(self, c0, c1, c2_coeff, level: int, rlk: SwitchingKey):
        """(c0, c1, c2) degree-2 ciphertext -> degree-1 via rlk."""
        d0, d1 = self.switch(c2_coeff, rlk, level)
        qj, _, _ = self.backend._consts(level)
        return add_rns(c0, d0, qj[:, None]), add_rns(c1, d1, qj[:, None])
