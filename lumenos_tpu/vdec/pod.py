"""Complete lattice proof-of-decryption (PoD) over the ABDLOP layer.

Counterpart of the reference's vdec_lnp_tbox (vdec/c/src/vdec.c): prove, in
zero-knowledge, knowledge of a short secret key s and bounded noise e with

    ct0_k + ct1_k * s - round(Q1*m_k/t) = e_k + Q1 * v_k   over Z,  k < 3,

for the three digit-batched level-1 ciphertexts (batching.py), where v_k is
the short modular-wrap witness.

Construction (and why it is sound WITHOUT the reference's quadratic-
relation machinery at our parameters):

- The big ring Z[X]/(X^N+1) is a free rank-(N/64) module over the proof
  ring R = Z[Y]/(Y^64+1) via Y = X^(N/64); strided chunking
  chunk_c(f) = sum_k f_{c + k*N/64} Y^k turns the N-dimensional negacyclic
  relation into a structured linear system A*w = u over R_qpf
  (q_pf ~ 150 bits > the relation's coefficient magnitudes, so the
  equation over Z_qpf IS the equation over Z).
- w = (s-chunks, e-chunks, v-chunks) is ABDLOP-committed; the opening
  proof is extended with a masked linear-form evaluation
  f = A*y1, and the verifier checks A*z1 - c*u == f. Knowledge soundness
  extracts w' with A*w' = u and ||w'|| <= ~2*sigma*sqrt(2 m1 D) ~= 2^22.
- Binding: a second solution would give a nonzero vector of norm <= 2^23
  in the lattice {(a, b, d, v): a*ct1 - Delta*d - b - Q1*v = 0}, whose
  Gaussian-heuristic first minimum is ~Q1^(1/3) = 2^38. So the relaxed
  (slack) norms already determine m uniquely - the LNP quadratic layer
  buys tighter parameters, not soundness, at these sizes. (The reference
  needs it because its statement modulus is a single ~60-bit prime.)

Transcript: SHA3 over statement || commitments || mask evaluations, sparse
ternary challenges (weight omega), bimodal-style rejection sampling on z.
"""

from __future__ import annotations

import hashlib
import secrets
from dataclasses import dataclass

import numpy as np

from ..core.tracer import Span, start_span
from .lnp import Abdlop, AbdlopCommitment, D, LnpParams, LnpRing, rejection_accept


def chunk_big_poly(coeffs: np.ndarray, n_big: int) -> np.ndarray:
    """[N] ints -> [N/64, 64]: strided module chunks (Y = X^(N/64))."""
    n_chunks = n_big // D
    out = np.zeros((n_chunks, D), dtype=object)
    for c in range(n_chunks):
        out[c] = coeffs[c::n_chunks]
    return out


def build_rotation_blocks(ct1: np.ndarray, n_big: int) -> np.ndarray:
    """Structured blocks of multiplication-by-ct1 over the R-module basis.

    ct1 * s where ct1 = sum_i X^i a_i(Y), s = sum_j X^j s_j(Y):
    output chunk c = sum_{i+j = c} a_i s_j + Y * sum_{i+j = c + n_chunks}
    a_i s_j  (since X^{n_chunks} = Y). Returns blocks[c][j] in R (coeff
    arrays [64] of Python ints) with the Y-shift folded in.
    """
    n_chunks = n_big // D
    a = chunk_big_poly(ct1, n_big)
    blocks = np.zeros((n_chunks, n_chunks, D), dtype=object)
    for c in range(n_chunks):
        for j in range(n_chunks):
            i = c - j
            if i >= 0:
                blocks[c, j] = a[i]
            else:
                # i + j = c + n_chunks -> multiply by Y (negacyclic shift)
                src = a[i + n_chunks]
                shifted = np.zeros(D, dtype=object)
                shifted[1:] = src[:-1]
                shifted[0] = -src[-1]
                blocks[c, j] = shifted
    return blocks


@dataclass
class PodProof:
    commitment: AbdlopCommitment
    w_mask: np.ndarray          # [n, L, D] residues (the Schnorr w)
    f_eval: np.ndarray          # [rows, L, D] masked linear-form evaluations
    z1: np.ndarray              # [m1, D] signed
    z2: np.ndarray              # [m2, D] signed
    challenge_hash: bytes


class PodProver:
    """Prove/verify decryption of the digit-batched ciphertexts."""

    def __init__(self, statement, params: LnpParams | None = None):
        """statement: vdec.prover.PodStatement (level-1, CT_COUNT cts)."""
        from .lnp import _find_primes
        self.st = statement
        # proof modulus must dominate the relation's coefficient sizes:
        # ||ct1*s|| <= N*Q1/2 ~ 2^126 -> use 3 x 50-bit primes (q ~ 2^150)
        # sigma1 must dominate ||c * w||: the digit-batched noise witness
        # reaches ~2^42 (2^15 fresh x 2^19 digit x ~cols), so sigma1 = 2^45.
        # Binding survives the slack: extracted infinity-norms (~2^51 for e,
        # ~2^21 for s, ~2^14 for v) satisfy 52+22+14 << 114 = log2(Q1), so
        # by per-coefficient counting no second solution exists (module
        # docstring).
        self.params = params or LnpParams(
            primes=_find_primes(50, 3),
            sigma1=float(1 << 45), sigma2=float(1 << 17))
        self.ring = LnpRing(self.params)
        n_big = statement.n
        self.n_chunks = n_big // D
        self.n_ct = statement.ct0.shape[0]
        q1 = statement.q_modulus
        self.q1 = q1

        # witness chunks: s, e_k, v_k  (v = (ct0 + ct1 s - dm - e)/Q1)
        s = statement.sk_signed.astype(object)
        self.w_chunks = [chunk_big_poly(s, n_big)]
        vs = []
        for k in range(self.n_ct):
            e = statement.noise[k]
            conv = _negacyclic_int(statement.ct1[k], s, n_big)
            num = statement.ct0[k] + conv - statement.delta_m[k] - e
            v = np.array([int(x) // q1 for x in num], dtype=object)
            assert all(int(x) % q1 == 0 for x in num), "wrap witness not integral"
            vs.append(v)
            self.w_chunks.append(chunk_big_poly(e, n_big))
        for k in range(self.n_ct):
            self.w_chunks.append(chunk_big_poly(vs[k], n_big))
        self.m1 = (1 + 2 * self.n_ct) * self.n_chunks

        # public linear system A w = u over R_qpf:
        # rows: per ct k, per chunk c:
        #   sum_j Rot(ct1_k)[c,j] s_j - e_{k,c} - Q1 v_{k,c} = u_{k,c}
        #   with u_{k,c} = chunk_c(dm_k - ct0_k)
        self.rot = [build_rotation_blocks(statement.ct1[k], n_big)
                    for k in range(self.n_ct)]
        self.u_chunks = [
            chunk_big_poly(statement.delta_m[k] - statement.ct0[k], n_big)
            for k in range(self.n_ct)]

        self.scheme = Abdlop(self.ring, b"lumenos-pod-v1", self.m1,
                             ell=1)  # tB carries a message slot (unused)

        # native residue form of the full linear map
        # A = [Rot(ct1_k) | -I | -Q1*I] and of u (for fast apply)
        rows = self.n_ct * self.n_chunks
        self.a_res = np.zeros((rows, self.m1, self.ring.L, D), dtype=np.uint64)
        nc = self.n_chunks
        for li, pq in enumerate(self.params.primes):
            for k in range(self.n_ct):
                for c in range(nc):
                    r = k * nc + c
                    for j in range(nc):
                        self.a_res[r, j, li] = [int(x) % pq
                                                for x in self.rot[k][c, j]]
                    # -e_{k,c}
                    self.a_res[r, (1 + k) * nc + c, li, 0] = pq - 1
                    # -Q1 * v_{k,c}
                    self.a_res[r, (1 + self.n_ct + k) * nc + c, li, 0] =                         pq - (q1 % pq)
        self.u_res = np.zeros((rows, self.ring.L, D), dtype=np.uint64)
        for li, pq in enumerate(self.params.primes):
            for k in range(self.n_ct):
                for c in range(nc):
                    self.u_res[k * nc + c, li] = [int(x) % pq
                                                  for x in self.u_chunks[k][c]]

    # -- linear map application (native, residue form) ---------------------

    def _apply_A(self, w_i64: np.ndarray) -> np.ndarray:
        """w [m1, D] signed i64 -> A*w residues [rows, L, D]."""
        return self.ring.mat_vec(self.a_res, self.ring.lift(w_i64))

    # -- prove / verify ----------------------------------------------------

    def _statement_hash(self) -> bytes:
        h = hashlib.sha3_256()
        for arr in (self.st.ct0, self.st.ct1, self.st.delta_m):
            h.update(np.array2string(arr, threshold=10**9).encode())
        return h.digest()

    def prove(self, seed: bytes | None = None,
              ctx: Span | None = None) -> PodProof:
        """Produce the PoD proof.

        ``seed``: PRIVATE prover entropy for masks/commitment randomness.
        None (production) draws from the OS CSPRNG; passing a value makes
        the proof deterministic FOR TESTS ONLY - the seed must never be
        derivable from the public transcript (a transcript-derived seed
        lets anyone recompute y1 and solve c*w = z1 - y1 for the witness,
        a complete ZK break; ADVICE.md round-1 high finding)."""
        ring = self.ring
        p = self.params
        if seed is None:
            seed = secrets.token_bytes(32)
        w = np.concatenate([c for c in self.w_chunks]).astype(object)
        w_i64 = w.astype(np.int64)

        with start_span("ABDLOP commit", ctx):
            com, s2 = self.scheme.commit(
                w_i64, np.zeros((1, D), np.int64), seed + b"-rand")

        with start_span("Proof generation", ctx):
            stmt_h = self._statement_hash()
            for attempt in range(128):
                sd = seed + attempt.to_bytes(2, "little")
                y1 = ring.sample_gauss(sd, 300, p.sigma1, self.m1)
                y2 = ring.sample_gauss(sd, 301, p.sigma2, p.m2)
                w_mask = ring.add(
                    ring.mat_vec(self.scheme.a1, ring.lift(y1)),
                    ring.mat_vec(self.scheme.a2, ring.lift(y2)))
                f_eval = self._apply_A(y1)
                ch = self._challenge_hash(stmt_h, com, w_mask, f_eval)
                c = ring.challenge(ch)
                z1 = ring.mask_add(y1, c, w_i64)
                z2 = ring.mask_add(y2, c, s2)
                # source-hiding rejection sampling (Lyu12): the accept
                # decision makes the z distribution independent of c*w,
                # so repeated proofs leak nothing about the witness
                # (replaces the round-1 norm cutoff; ADVICE.md medium).
                if (rejection_accept(z1, z1 - y1, p.sigma1, p.rej_m,
                                     sd + b"r1")
                        and rejection_accept(z2, z2 - y2, p.sigma2, p.rej_m,
                                             sd + b"r2")
                        and self._norm_ok(z1, z2)):
                    return PodProof(commitment=com, w_mask=w_mask,
                                    f_eval=f_eval, z1=z1, z2=z2,
                                    challenge_hash=ch)
            raise RuntimeError("rejection sampling failed")

    def _norm_ok(self, z1, z2) -> bool:
        """Verifier-side norm bounds (also enforced at proving time so an
        accepted proof always verifies)."""
        p = self.params
        b1 = p.sigma1 * np.sqrt(2.0 * self.m1 * D)
        b2 = p.sigma2 * np.sqrt(2.0 * p.m2 * D)
        return (np.linalg.norm(z1.astype(np.float64)) <= b1
                and np.linalg.norm(z2.astype(np.float64)) <= b2)

    def _lift_big(self, arr_int: np.ndarray) -> np.ndarray:
        """[rows, D] Python ints (mod q_pf) -> CRT residues [rows, L, D]."""
        rows = arr_int.shape[0]
        out = np.zeros((rows, self.ring.L, D), dtype=np.uint64)
        for li, pq in enumerate(self.params.primes):
            for r in range(rows):
                out[r, li] = [int(x) % pq for x in arr_int[r]]
        return out

    def _challenge_hash(self, stmt_h, com, w_mask, f_eval) -> bytes:
        h = hashlib.sha3_256()
        h.update(stmt_h)
        for arr in (com.t_a, com.t_b, w_mask, f_eval):
            h.update(np.ascontiguousarray(arr).tobytes())
        return h.digest()

    def verify(self, proof: PodProof) -> bool:
        ring = self.ring
        p = self.params
        # 1. norms
        if np.linalg.norm(proof.z1.astype(np.float64)) > p.sigma1 * np.sqrt(2.0 * self.m1 * D):
            return False
        if np.linalg.norm(proof.z2.astype(np.float64)) > p.sigma2 * np.sqrt(2.0 * p.m2 * D):
            return False
        # 2. transcript / challenge consistency
        stmt_h = self._statement_hash()
        if self._challenge_hash(stmt_h, proof.commitment, proof.w_mask,
                                proof.f_eval) != proof.challenge_hash:
            return False
        c = ring.challenge(proof.challenge_hash)
        # 3. opening: A1 z1 + A2 z2 - c tA == w_mask
        lhs = ring.add(ring.mat_vec(self.scheme.a1, ring.lift(proof.z1)),
                       ring.mat_vec(self.scheme.a2, ring.lift(proof.z2)))
        c_lift = ring.lift(c[None, :])
        n = proof.commitment.t_a.shape[0]
        c_vec = np.ascontiguousarray(np.broadcast_to(c_lift, (n, ring.L, D)))
        ta = np.ascontiguousarray(proof.commitment.t_a)
        prod = np.zeros_like(ta)
        ring.lib.lnp_polyvec_mul(ring.handle, c_vec.ctypes.data,
                                 ta.ctypes.data, prod.ctypes.data, n)
        if not np.array_equal(ring.sub(lhs, prod), proof.w_mask):
            return False
        # 4. linear relation: A z1 - c*u == f_eval  (mod q_pf)
        az = self._apply_A(proof.z1)
        rows = self.u_res.shape[0]
        c_vec = np.ascontiguousarray(np.broadcast_to(
            ring.lift(c[None, :]), (rows, ring.L, D)))
        u_c = np.ascontiguousarray(self.u_res)
        cu = np.zeros_like(self.u_res)
        ring.lib.lnp_polyvec_mul(ring.handle, c_vec.ctypes.data,
                                 u_c.ctypes.data, cu.ctypes.data, rows)
        return np.array_equal(ring.sub(az, cu), proof.f_eval)


def _ring_mul_int(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Negacyclic degree-64 product over Python ints (host, exact)."""
    out = np.zeros(D, dtype=object)
    for i in range(D):
        ai = a[i]
        if ai == 0:
            continue
        for j in range(D):
            k = i + j
            if k < D:
                out[k] += ai * b[j]
            else:
                out[k - D] -= ai * b[j]
    return out


def _negacyclic_int(a: np.ndarray, b: np.ndarray, n: int) -> np.ndarray:
    """Exact big-ring negacyclic product (host ints)."""
    out = np.zeros(n, dtype=object)
    for i in range(n):
        ai = int(a[i])
        if ai == 0:
            continue
        prod = b * ai
        out[i:] += prod[: n - i]
        if i:
            out[: i] -= prod[n - i:]
    return out
