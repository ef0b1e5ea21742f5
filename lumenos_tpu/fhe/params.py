"""BGV/BFV parameter generation (RNS modulus chains, NTT tables).

Mirrors the reference's heuristic (fhe/bfv.go:121-188 GenerateBGVParamsForNTT):
  - requires t = 1 (mod 2N)
  - chain length k = log2(nttSize) (+0 for large t, -2 for small t)
  - LogQ = [58, 56, 56, ...], LogP = [55, 55]

Prime generation scans downward from 2^b for NTT-friendly primes
p = 1 (mod 2N), skipping t, like lattigo's NTTFriendlyPrimesGenerator
(exact lattigo prime choice is not required: ciphertext bits are random
anyway; correctness is enforced by differential decrypt-equality tests).

All per-limb NTT constants (psi tables in Shoup form), Barrett constants,
CRT/rescale constants are precomputed host-side with Python ints and frozen
into numpy arrays.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield
from functools import cached_property, lru_cache

import numpy as np

from ..core.field import _is_prime, primitive_root, bit_reverse


def _ntt_friendly_primes(bit_size: int, nth_root: int, count: int, avoid: set[int]) -> list[int]:
    """Largest `count` primes p < 2^bit_size with p = 1 mod nth_root."""
    out = []
    p = (1 << bit_size) + 1
    # align to 1 mod nth_root, scanning downward
    p -= ((p - 1) % nth_root)
    while len(out) < count:
        if p < (1 << (bit_size - 1)):
            raise RuntimeError(f"not enough {bit_size}-bit NTT primes")
        if p not in avoid and _is_prime(p):
            out.append(p)
            avoid.add(p)
        p -= nth_root
    return out


def generate_bgv_params_for_ntt(ntt_size: int, log_n: int, t: int) -> "BgvParams":
    """The reference's parameter heuristic (fhe/bfv.go:121-188)."""
    if ntt_size < 2:
        raise ValueError("nttSize must be >= 2")
    n = 1 << log_n
    if t % (2 * n) != 1:
        raise ValueError(f"t ({t}) != 1 mod 2N (2N={2 * n})")
    buffer_levels = 0 if t.bit_length() > 45 else -2
    k = (ntt_size.bit_length() - 1) + buffer_levels
    log_q = [58] + [56] * (k - 1)
    log_p = [55, 55]
    return BgvParams.generate(log_n=log_n, log_q=log_q, log_p=log_p, t=t)


@dataclass(frozen=True)
class LimbTables:
    """Per-prime negacyclic NTT + Barrett constants (frozen numpy)."""

    q: int
    barrett_u: int
    barrett_s: int
    psi_fwd: np.ndarray        # [N] bit-rev ordered CT twiddles (plain form)
    psi_fwd_shoup: np.ndarray  # [N]
    psi_bwd: np.ndarray        # [N] GS inverse twiddles
    psi_bwd_shoup: np.ndarray  # [N]
    n_inv: int                 # N^-1 mod q
    n_inv_shoup: int


def _build_limb(q: int, n: int) -> LimbTables:
    g = primitive_root(q)
    psi = pow(g, (q - 1) // (2 * n), q)
    psi_inv = pow(psi, q - 2, q)
    logn = n.bit_length() - 1
    fwd = np.zeros(n, dtype=np.uint64)
    bwd = np.zeros(n, dtype=np.uint64)
    pj, ipj = 1, 1
    fwd[0] = 1
    bwd[0] = 1
    for j in range(1, n):
        pj = pj * psi % q
        ipj = ipj * psi_inv % q
        rev = bit_reverse(j, logn)
        fwd[rev] = pj
        bwd[rev] = ipj
    shoup = lambda arr: np.array([(int(w) << 64) // q for w in arr], dtype=np.uint64)
    n_inv = pow(n, q - 2, q)
    s = q.bit_length() - 1
    return LimbTables(
        q=q,
        barrett_u=(1 << (64 + s)) // q,
        barrett_s=s,
        psi_fwd=fwd,
        psi_fwd_shoup=shoup(fwd),
        psi_bwd=bwd,
        psi_bwd_shoup=shoup(bwd),
        n_inv=n_inv,
        n_inv_shoup=(n_inv << 64) // q,
    )


@dataclass(frozen=True)
class BgvParams:
    """Full parameter set: moduli chains + all precomputed tables."""

    log_n: int
    t: int
    q_primes: tuple[int, ...]   # Q chain, level L = len-1
    p_primes: tuple[int, ...]   # keyswitch extension primes

    @classmethod
    def generate(cls, log_n: int, log_q: list[int], log_p: list[int], t: int) -> "BgvParams":
        n = 1 << log_n
        avoid = {t}
        qs: list[int] = []
        for b in log_q:
            qs += _ntt_friendly_primes(b, 2 * n, 1, avoid)
        ps: list[int] = []
        for b in log_p:
            ps += _ntt_friendly_primes(b, 2 * n, 1, avoid)
        return cls(log_n=log_n, t=t, q_primes=tuple(qs), p_primes=tuple(ps))

    @property
    def n(self) -> int:
        return 1 << self.log_n

    @property
    def max_level(self) -> int:
        return len(self.q_primes) - 1

    @cached_property
    def limbs(self) -> list[LimbTables]:
        """Q then P limb tables (index L+1.. are P)."""
        return [_build_limb(q, self.n) for q in (*self.q_primes, *self.p_primes)]

    # ---- packed per-limb constant arrays for vectorized kernels ----------

    def _stack(self, levels: int, attr: str, with_p: bool = False) -> np.ndarray:
        limbs = self.limbs[:levels + 1]
        if with_p:
            limbs = limbs + self.limbs[len(self.q_primes):]
        return np.stack([np.asarray(getattr(l, attr)) for l in limbs])

    @lru_cache(maxsize=None)
    def limb_consts(self, levels: int, with_p: bool = False):
        """(q[L], u[L], s[L]) u64 arrays for limbs 0..levels (+P limbs)."""
        limbs = self.limbs[:levels + 1]
        if with_p:
            limbs = limbs + self.limbs[len(self.q_primes):]
        q = np.array([l.q for l in limbs], dtype=np.uint64)
        u = np.array([l.barrett_u for l in limbs], dtype=np.uint64)
        s = np.array([l.barrett_s for l in limbs], dtype=np.uint64)
        return q, u, s

    @lru_cache(maxsize=None)
    def ntt_tables(self, levels: int, with_p: bool = False):
        """(fwd, fwd_shoup, bwd, bwd_shoup, n_inv, n_inv_shoup) stacked [L, N]."""
        limbs = self.limbs[:levels + 1]
        if with_p:
            limbs = limbs + self.limbs[len(self.q_primes):]
        stk = lambda attr: np.stack([np.asarray(getattr(l, attr)) for l in limbs])
        n_inv = np.array([l.n_inv for l in limbs], dtype=np.uint64)
        n_inv_sh = np.array([l.n_inv_shoup for l in limbs], dtype=np.uint64)
        return (stk("psi_fwd"), stk("psi_fwd_shoup"), stk("psi_bwd"),
                stk("psi_bwd_shoup"), n_inv, n_inv_sh)

    # ---- slot encoder tables --------------------------------------------

    @cached_property
    def slot_perm(self) -> np.ndarray:
        """slot_to_ntt_pos[j]: NTT-domain position of slot j.

        Slot layout (SEAL/lattigo matrix encoding): slot (r, c), r in {0,1},
        c in [0, N/2), evaluates the plaintext at psi_t^{5^c * (-1)^r mod 2N}.
        Our negacyclic NTT's output position i holds the evaluation at
        psi^{exp(i)} where exp(i) = 2*bitrev(i, logN) + 1 (classic CT
        bit-reversed output). The permutation below is layout-only and thus
        shared by the t-encoder and every q-limb.
        """
        n = self.n
        logn = self.log_n
        two_n = 2 * n
        # exp(i) for our NTT output ordering
        exp_of_pos = np.array([2 * bit_reverse(i, logn) + 1 for i in range(n)],
                              dtype=np.int64)
        pos_of_exp = {int(e): i for i, e in enumerate(exp_of_pos)}
        perm = np.zeros(n, dtype=np.int64)
        g = 1
        for c in range(n // 2):
            perm[c] = pos_of_exp[g]                # row 0: exponent 5^c
            perm[c + n // 2] = pos_of_exp[two_n - g]  # row 1: exponent -5^c
            g = (g * 5) % two_n
        return perm

    @cached_property
    def slot_perm_inv(self) -> np.ndarray:
        inv = np.zeros(self.n, dtype=np.int64)
        inv[self.slot_perm] = np.arange(self.n)
        return inv

    @cached_property
    def t_limb(self) -> LimbTables:
        """NTT tables over Z_t (the slot-encoding transform)."""
        return _build_limb(self.t, self.n)

    # ---- rescale constants ----------------------------------------------

    @lru_cache(maxsize=None)
    def rescale_consts(self, level: int):
        """Constants for dropping limb `level`: per remaining limb i:
        (q_l mod q_i, q_l^{-1} mod q_i, t^{-1} mod q_l)."""
        ql = self.q_primes[level]
        rem = self.q_primes[:level]
        ql_mod = np.array([ql % qi for qi in rem], dtype=np.uint64)
        ql_inv = np.array([pow(ql, qi - 2, qi) for qi in rem], dtype=np.uint64)
        t_inv_ql = pow(self.t, ql - 2, ql)
        t_mod = np.array([self.t % qi for qi in rem], dtype=np.uint64)
        return ql_mod, ql_inv, t_inv_ql, t_mod
