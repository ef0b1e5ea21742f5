"""LNP lattice proof layer: parameters + ABDLOP commitments (native-backed).

Counterpart of the reference's lazer dependency and vdec_params.h
(SURVEY.md C4-C6). The proof ring is R = Z_q[X]/(X^64+1) with q a product
of ~50-bit NTT-friendly primes; public matrices are SHAKE-expanded from a
transcript seed; witnesses are short signed-coefficient polynomial vectors.

Implemented: parameter set, ABDLOP commit, and the Schnorr-style masked
opening proof with sparse ternary challenges and rejection sampling -
prove/verify roundtrip with norm checks.

Status (round 1): the quadratic-relation layer (ternary-secret proof and
the FHE decryption equation via Schwartz-Zippel accumulation,
vdec.c:727-864) sits on top of these primitives and is the next milestone;
prove_bfv_dec_batched currently performs the exact host-side witness check
(vdec/prover.py) in its place.
"""

from __future__ import annotations

import ctypes
import hashlib
from dataclasses import dataclass, field as dfield

import numpy as np

from ..core.field import _is_prime
from ..native import load_native

D = 64  # proof ring degree (reference vdec_params.h: d = 64)


def rejection_accept(z: np.ndarray, cv: np.ndarray, sigma: float, M: float,
                     seed: bytes) -> bool:
    """Source-hiding rejection decision (Lyubashevsky 2012, Fig. 4.5).

    z = y + cv with y ~ D_sigma; accept with probability
    min(1, D_sigma(z) / (M * D_{cv,sigma}(z)))
        = min(1, exp((-2<z,cv> + |cv|^2) / (2 sigma^2)) / M),
    which makes the accepted-z distribution exactly D_sigma/M-independent
    of the secret cv. The decision randomness comes from the PRIVATE seed
    (never the shared transcript). Counterpart of the reference's
    rejection step (vdec/c/src/vdec.c:420-520); the bimodal variant
    halves M but needs the +-c symmetric verification equation - the
    plain variant here is leak-free at M ~= rej_m repetitions.
    """
    zf = z.astype(np.float64).ravel()
    cf = cv.astype(np.float64).ravel()
    expo = (-2.0 * float(zf @ cf) + float(cf @ cf)) / (2.0 * sigma * sigma)
    # cap to avoid overflow; p > 1 means always accept
    p = 1.0 if expo > 40 else float(np.exp(expo)) / M
    u_bytes = hashlib.sha3_256(b"rej" + seed).digest()[:8]
    u = int.from_bytes(u_bytes, "little") / float(1 << 64)
    return u < p


def _find_primes(bits: int, count: int) -> tuple[int, ...]:
    out = []
    p = (1 << bits) + 1
    p -= (p - 1) % (2 * D)
    while len(out) < count:
        if _is_prime(p):
            out.append(p)
        p -= 2 * D
    return tuple(out)


@dataclass(frozen=True)
class LnpParams:
    """Proof-system parameters (analogue of vdec_params.h).

    Defaults follow the reference shape: d=64 ring, ~100-bit q from two
    50-bit CRT primes, challenge weight omega=8, gaussian masks sized for
    bimodal rejection with the reference's stdev ladder.
    """

    primes: tuple[int, ...] = dfield(default_factory=lambda: _find_primes(50, 2))
    n: int = 16          # MSIS rank (commitment rows)
    m2: int = 32         # randomness length
    omega: int = 8       # challenge weight (vdec_params.h)
    sigma1: float = float(1 << 12)   # mask stdev for s1 openings
    sigma2: float = float(1 << 12)
    rej_m: float = 2.0               # repetition parameter for z1
    rej_m2: float | None = None      # for z2 (defaults to rej_m)

    @property
    def rej_m2_eff(self) -> float:
        return self.rej_m if self.rej_m2 is None else self.rej_m2

    @property
    def q(self) -> int:
        r = 1
        for p in self.primes:
            r *= p
        return r


class LnpRing:
    """ctypes handle for the native ring."""

    def __init__(self, params: LnpParams):
        self.lib = load_native()
        if self.lib is None:
            raise RuntimeError("native library unavailable")
        self.params = params
        self._primes = np.array(params.primes, dtype=np.uint64)
        self.L = len(params.primes)
        self.handle = self.lib.lnp_ring_new(self._primes.ctypes.data, self.L)

    def __del__(self):
        try:
            self.lib.lnp_ring_free(self.handle)
        except Exception:
            pass

    # -- helpers -----------------------------------------------------------

    def expand_uniform(self, seed: bytes, domain: int, n_polys: int) -> np.ndarray:
        out = np.zeros((n_polys, self.L, D), dtype=np.uint64)
        self.lib.lnp_expand_uniform(self.handle, seed, len(seed), domain,
                                    out.ctypes.data, n_polys)
        return out

    def lift(self, coeffs: np.ndarray) -> np.ndarray:
        """[n_polys, D] signed -> [n_polys, L, D] residues."""
        c = np.ascontiguousarray(coeffs, dtype=np.int64)
        out = np.zeros((c.shape[0], self.L, D), dtype=np.uint64)
        self.lib.abdlop_lift(self._primes.ctypes.data, self.L,
                             c.ctypes.data, out.ctypes.data, c.shape[0])
        return out

    def mat_vec(self, mat: np.ndarray, vec: np.ndarray) -> np.ndarray:
        """[rows, cols, L, D] x [cols, L, D] -> [rows, L, D]."""
        rows, cols = mat.shape[0], mat.shape[1]
        m = np.ascontiguousarray(mat, dtype=np.uint64)
        v = np.ascontiguousarray(vec, dtype=np.uint64)
        out = np.zeros((rows, self.L, D), dtype=np.uint64)
        self.lib.lnp_polymat_mul_vec(self.handle, m.ctypes.data, v.ctypes.data,
                                     out.ctypes.data, rows, cols)
        return out

    def add(self, a, b):
        out = np.zeros_like(a)
        ac = np.ascontiguousarray(a)
        bc = np.ascontiguousarray(b)
        self.lib.abdlop_add(self._primes.ctypes.data, self.L,
                            ac.ctypes.data, bc.ctypes.data,
                            out.ctypes.data, a.shape[0])
        return out

    def sub(self, a, b):
        out = np.zeros_like(a)
        ac = np.ascontiguousarray(a)
        bc = np.ascontiguousarray(b)
        self.lib.abdlop_sub(self._primes.ctypes.data, self.L,
                            ac.ctypes.data, bc.ctypes.data,
                            out.ctypes.data, a.shape[0])
        return out

    def sample_ternary(self, seed: bytes, domain: int, n_polys: int) -> np.ndarray:
        out = np.zeros((n_polys, D), dtype=np.int64)
        self.lib.lnp_sample_ternary(seed, len(seed), domain,
                                    out.ctypes.data, n_polys * D)
        return out

    def sample_gauss(self, seed: bytes, domain: int, sigma: float,
                     n_polys: int) -> np.ndarray:
        out = np.zeros((n_polys, D), dtype=np.int64)
        self.lib.lnp_sample_gauss(seed, len(seed), domain,
                                  ctypes.c_double(sigma),
                                  out.ctypes.data, n_polys * D)
        return out

    def challenge(self, transcript_hash: bytes) -> np.ndarray:
        c = np.zeros(D, dtype=np.int64)
        self.lib.abdlop_challenge(transcript_hash, len(transcript_hash),
                                  self.params.omega, c.ctypes.data)
        return c

    def mask_add(self, y: np.ndarray, c: np.ndarray, s: np.ndarray) -> np.ndarray:
        """z = y + c*s over signed coefficients."""
        z = np.zeros_like(y)
        yc = np.ascontiguousarray(y, np.int64)
        cc = np.ascontiguousarray(c, np.int64)
        sc = np.ascontiguousarray(s, np.int64)
        self.lib.abdlop_mask_add(yc.ctypes.data, cc.ctypes.data, sc.ctypes.data,
                                 z.ctypes.data, y.shape[0])
        return z


@dataclass
class AbdlopCommitment:
    t_a: np.ndarray     # [n, L, D]
    t_b: np.ndarray     # [l, L, D]


@dataclass
class OpeningProof:
    w: np.ndarray       # [n, L, D]
    z1: np.ndarray      # [m1, D] signed
    z2: np.ndarray      # [m2, D] signed
    challenge_hash: bytes


class Abdlop:
    """ABDLOP commitment scheme over a public seed (matrices SHAKE-derived)."""

    def __init__(self, ring: LnpRing, seed: bytes, m1: int, ell: int):
        self.ring = ring
        p = ring.params
        self.m1 = m1
        self.ell = ell
        self.a1 = ring.expand_uniform(seed, 1, p.n * m1).reshape(p.n, m1, ring.L, D)
        self.a2 = ring.expand_uniform(seed, 2, p.n * p.m2).reshape(p.n, p.m2, ring.L, D)
        self.b = ring.expand_uniform(seed, 3, ell * p.m2).reshape(ell, p.m2, ring.L, D)

    def commit(self, s1: np.ndarray, msg: np.ndarray, rand_seed: bytes):
        """s1: [m1, D] signed short vector; msg: [ell, D] signed.
        Returns (commitment, s2 randomness)."""
        ring = self.ring
        s2 = ring.sample_ternary(rand_seed, 100, ring.params.m2)
        s1_r = ring.lift(s1)
        s2_r = ring.lift(s2)
        t_a = ring.add(ring.mat_vec(self.a1, s1_r), ring.mat_vec(self.a2, s2_r))
        t_b = ring.add(ring.mat_vec(self.b, s2_r), ring.lift(msg))
        return AbdlopCommitment(t_a=t_a, t_b=t_b), s2

    # -- opening proof -----------------------------------------------------

    def _transcript_hash(self, com: AbdlopCommitment, w: np.ndarray) -> bytes:
        h = hashlib.sha3_256()
        for arr in (com.t_a, com.t_b, w):
            h.update(np.ascontiguousarray(arr).tobytes())
        return h.digest()

    def prove_opening(self, com: AbdlopCommitment, s1, s2,
                      mask_seed: bytes | None = None,
                      max_tries: int = 64) -> OpeningProof:
        """mask_seed: PRIVATE prover entropy (None = OS CSPRNG). Must never
        be transcript-derived (ZK break - see PodProver.prove)."""
        import secrets as _secrets
        ring = self.ring
        p = ring.params
        if mask_seed is None:
            mask_seed = _secrets.token_bytes(32)
        for attempt in range(max_tries):
            seed_a = mask_seed + attempt.to_bytes(2, "little")
            y1 = ring.sample_gauss(seed_a, 200, p.sigma1, self.m1)
            y2 = ring.sample_gauss(seed_a, 201, p.sigma2, p.m2)
            w = ring.add(ring.mat_vec(self.a1, ring.lift(y1)),
                         ring.mat_vec(self.a2, ring.lift(y2)))
            ch = self._transcript_hash(com, w)
            c = ring.challenge(ch)
            z1 = ring.mask_add(y1, c, s1)
            z2 = ring.mask_add(y2, c, s2)
            # source-hiding rejection + verifier norm bounds
            bound1 = p.sigma1 * np.sqrt(2.0 * self.m1 * D)
            bound2 = p.sigma2 * np.sqrt(2.0 * p.m2 * D)
            if (rejection_accept(z1, z1 - y1, p.sigma1, p.rej_m, seed_a + b"r1")
                    and rejection_accept(z2, z2 - y2, p.sigma2, p.rej_m,
                                         seed_a + b"r2")
                    and np.linalg.norm(z1.astype(np.float64)) <= bound1
                    and np.linalg.norm(z2.astype(np.float64)) <= bound2):
                return OpeningProof(w=w, z1=z1, z2=z2, challenge_hash=ch)
        raise RuntimeError("rejection sampling failed to accept")

    def verify_opening(self, com: AbdlopCommitment, proof: OpeningProof) -> bool:
        ring = self.ring
        p = ring.params
        c = ring.challenge(proof.challenge_hash)
        # norms
        if np.linalg.norm(proof.z1.astype(np.float64)) > p.sigma1 * np.sqrt(2.0 * self.m1 * D):
            return False
        if np.linalg.norm(proof.z2.astype(np.float64)) > p.sigma2 * np.sqrt(2.0 * p.m2 * D):
            return False
        # A1 z1 + A2 z2 - c tA == w
        lhs = ring.add(ring.mat_vec(self.a1, ring.lift(proof.z1)),
                       ring.mat_vec(self.a2, ring.lift(proof.z2)))
        c_lift = ring.lift(c[None, :])  # [1, L, D]
        # c * tA: negacyclic scalar-poly times vector
        n = com.t_a.shape[0]
        c_vec = np.ascontiguousarray(np.broadcast_to(c_lift, (n, ring.L, D)))
        t_a_c = np.ascontiguousarray(com.t_a)
        prod = np.zeros_like(com.t_a)
        ring.lib.lnp_polyvec_mul(ring.handle, c_vec.ctypes.data,
                                 t_a_c.ctypes.data, prod.ctypes.data, n)
        expect = ring.sub(lhs, prod)
        if not np.array_equal(expect, proof.w):
            return False
        # transcript consistency
        return self._transcript_hash(com, proof.w) == proof.challenge_hash
