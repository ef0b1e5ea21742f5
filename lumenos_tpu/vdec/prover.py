"""Proof-of-decryption: statement assembly + prover bridge.

Reference: vdec/prover.go (ProveBfvDecBatched / CallVdecProver). Flow:

1. batch the queried columns (batching.py) -> CT_COUNT=3 digit ciphertexts
   at level 1 (binding: noise 2^42 << Delta_1/2 = 2^56);
2. extract the witness: centered coefficients of sk, ct0, ct1 and the
   scaled plaintext Delta*m over the composite level-1 modulus Q1;
3. hand the statement [ct0 + ct1*s - Delta*m = e (mod Q1), |e| small,
   s ternary] to the LNP lattice prover (native C++, vdec/c); until the
   native prover lands, `check_witness` verifies the relation and bounds
   host-side exactly (the same self-check the reference's C prover runs,
   vdec/c/src/vdec.c:793-850).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..core.tracer import Span, start_span
from ..core.transcript import Transcript
from ..fhe.backend import BgvBackend, CtBatch, SecretKey
from .batching import (
    DIGIT_BITS, N_DIGITS, batch_ciphertexts, batch_columns,
    recombine_digit_values, sample_alphas,
)

POD_LEVEL = 1  # binding level: Delta_1 = Q1/t = 2^57


@dataclass
class PodStatement:
    """Public inputs + witness for the LNP proof-of-decryption."""

    q_modulus: int                 # composite Q1
    t: int
    n: int
    ct0: np.ndarray                # [CT_COUNT, N] centered int coeffs (object)
    ct1: np.ndarray
    delta_m: np.ndarray            # [CT_COUNT, N] centered round(Q1*m/t)
    sk_signed: np.ndarray | None   # [N] ternary witness (None: public form)
    noise: np.ndarray | None       # [CT_COUNT, N] the implied noise e
    noise_bound: int
    wrap: np.ndarray | None = None  # [CT_COUNT, N] i64 wrap witness v
    #   (ct0 + ct1*s - delta_m = noise + Q1*wrap over Z; filled by the
    #   native assembly path, recomputed host-side otherwise)

    def public(self) -> "PodStatement":
        """Witness-free copy: everything a public verifier needs (the
        reference has no standalone verifier - its C prover self-verifies,
        vdec.c:793-850; this is a capability on top)."""
        from dataclasses import replace
        return replace(self, sk_signed=None, noise=None, wrap=None)


def _crt_center(residues: np.ndarray, qs: list[int]) -> np.ndarray:
    """[L, N] residues -> [N] centered integers mod prod(qs) (object)."""
    Q = 1
    for q in qs:
        Q *= q
    basis = []
    for q in qs:
        other = Q // q
        basis.append(other * pow(other, q - 2, q))
    acc = np.zeros(residues.shape[-1], dtype=object)
    for i, b in enumerate(basis):
        acc = (acc + residues[i].astype(object) * b) % Q
    return np.where(acc > Q // 2, acc - Q, acc)


def extract_statement(
    backend: BgvBackend,
    batched: CtBatch,
    claimed_values: np.ndarray,
    sk: SecretKey,
    noise_bound: int = 1 << 43,
) -> PodStatement:
    """Build the PoD statement for the digit-batched ciphertexts.

    claimed_values: [CT_COUNT, rows] decrypted digit-batch values (public,
    mod t); the statement plaintext is their slot encoding's Delta-embedding
    at the PoD level.
    """
    assert batched.level == POD_LEVEL
    p = backend.params
    qs = [int(q) for q in p.q_primes[: POD_LEVEL + 1]]
    Q = 1
    for q in qs:
        Q *= q
    data = np.asarray(batched.data)        # [CT_COUNT, 2, L, N]
    n_ct = data.shape[0]

    ct0 = np.stack([_crt_center(data[k, 0], qs) for k in range(n_ct)])
    ct1 = np.stack([_crt_center(data[k, 1], qs) for k in range(n_ct)])

    # Delta*m for the claimed values (recompute like the reference:
    # vdec/prover.go:114-119 re-encodes the claimed message)
    poly_t = np.asarray(backend.encoder.encode(
        np.asarray(claimed_values, dtype=np.uint64)))
    dm = np.asarray(backend.encoder.embed_delta_m(poly_t, POD_LEVEL))
    delta_m = np.stack([_crt_center(dm[k], qs) for k in range(n_ct)])

    # implied noise e and wrap v: ct0 + ct1*s - Delta*m = e + Q*v over Z
    # (native exact i128 ternary convolution; Python O(N^2) fallback)
    from ..native import load_native
    lib = load_native()
    s = sk.s_signed.astype(object)
    noise = np.zeros((n_ct, backend.n), dtype=object)
    wrap = None
    if lib is not None and Q < (1 << 127):
        wrap = np.zeros((n_ct, backend.n), np.int64)
        s_i8 = np.ascontiguousarray(sk.s_signed, np.int8)
        e_hi = np.zeros(backend.n, np.int64)
        e_lo = np.zeros(backend.n, np.uint64)
        for k in range(n_ct):
            c0h, c0l = _obj_to_hilo(ct0[k])
            c1h, c1l = _obj_to_hilo(ct1[k])
            dmh, dml = _obj_to_hilo(delta_m[k])
            lib.pod_statement_noise(
                Q & ((1 << 64) - 1), Q >> 64, backend.n,
                c0h.ctypes.data, c0l.ctypes.data, c1h.ctypes.data,
                c1l.ctypes.data, dmh.ctypes.data, dml.ctypes.data,
                s_i8.ctypes.data, e_hi.ctypes.data, e_lo.ctypes.data,
                wrap[k].ctypes.data)
            noise[k] = _hilo_to_obj(e_hi, e_lo)
    else:
        for k in range(n_ct):
            conv = _negacyclic_mul(ct1[k], s, Q)
            e = (ct0[k] + conv - delta_m[k]) % Q
            noise[k] = np.where(e > Q // 2, e - Q, e)

    return PodStatement(
        q_modulus=Q, t=backend.t, n=backend.n, ct0=ct0, ct1=ct1,
        delta_m=delta_m, sk_signed=sk.s_signed, noise=noise,
        noise_bound=noise_bound, wrap=wrap)


def _obj_to_hilo(arr: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Centered big ints (|x| < 2^127) -> two's-complement (hi i64, lo u64)."""
    mask = (1 << 64) - 1
    hi = np.fromiter((int(x) >> 64 for x in arr), np.int64, len(arr))
    lo = np.fromiter((int(x) & mask for x in arr), np.uint64, len(arr))
    return hi, lo


def _hilo_to_obj(hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
    """Inverse of _obj_to_hilo."""
    out = np.empty(len(hi), dtype=object)
    for i in range(len(hi)):
        out[i] = (int(hi[i]) << 64) + int(lo[i])
    return out


def _negacyclic_mul(a: np.ndarray, b: np.ndarray, q: int) -> np.ndarray:
    """Exact negacyclic convolution over Z_q (object ints, host)."""
    n = len(a)
    # use integer FFT-free schoolbook via numpy object outer is O(n^2);
    # for N <= 16384 at the client this is seconds; native prover will
    # replace it.
    res = np.zeros(n, dtype=object)
    bq = b % q
    for i in range(n):
        ai = int(a[i]) % q
        if ai == 0:
            continue
        prod = (bq * ai)
        # X^i shift with negacyclic wrap
        res[i:] = (res[i:] + prod[: n - i]) % q
        if i:
            res[:i] = (res[:i] - prod[n - i:]) % q
    return res


def check_witness(st: PodStatement) -> None:
    """Host-side exact verification of the PoD relation and bounds (the
    reference C prover's self-check)."""
    if not set(np.unique(st.sk_signed)).issubset({-1, 0, 1}):
        raise ValueError("secret key is not ternary")
    worst = max(abs(int(x)) for x in st.noise.reshape(-1))
    if worst > st.noise_bound:
        raise ValueError(f"noise {worst} exceeds bound {st.noise_bound}")


def prove_bfv_dec_batched(
    backend: BgvBackend,
    queried_cols: CtBatch,
    queried_values: np.ndarray,
    queried_scales: np.ndarray | None,
    sk: SecretKey,
    transcript: Transcript,
    ctx: Span | None = None,
) -> PodStatement:
    """Full PoD pipeline (reference ProveBfvDecBatched, vdec/prover.go:50-98).

    queried_values: [cols, rows] decrypted (unscaled) column values.
    Returns the assembled statement; the native LNP prover consumes it
    (lumenos_tpu/vdec/c). Raises if the witness is invalid.
    """
    t = backend.t
    cols = queried_cols.data.shape[0]
    with start_span("Batching decrypted columns", ctx):
        alphas = sample_alphas(transcript, cols)
        batch_vals = batch_columns(queried_values, alphas, t)

    with start_span("Batching ciphertexts", ctx):
        batched = batch_ciphertexts(backend, queried_cols, alphas, queried_scales)
        batched = backend.rescale_to(batched, POD_LEVEL)

    with start_span("Witness generation", ctx):
        # per-digit claimed values: Dec(S_k); their recombination must equal
        # the plaintext RLC (binding check)
        digit_vals = np.asarray(backend.decrypt_values(batched, sk))
        rec = recombine_digit_values(digit_vals, t)
        rows = queried_values.shape[1]
        if not (np.array_equal(rec[:rows], batch_vals) and (rec[rows:] == 0).all()):
            raise ValueError("batched ciphertext does not decrypt to the RLC")
        st = extract_statement(backend, batched, digit_vals, sk)
        check_witness(st)
    return st


def prove_and_verify_pod(backend, queried_cols, queried_values, queried_scales,
                         sk, transcript, ctx=None):
    """Full PoD: statement + lattice proof + self-verify (the reference's
    C prover verifies its own proof before returning, vdec.c:793-850)."""
    st = prove_bfv_dec_batched(backend, queried_cols, queried_values,
                               queried_scales, sk, transcript, ctx)
    from .pod import PodProver
    prover = PodProver(st)
    with start_span("Proof generation", ctx):
        # mask/commitment entropy comes from the prover's private CSPRNG
        # (PodProver.prove default), NOT the shared transcript - a public
        # seed lets anyone recompute y1 and recover the witness from
        # c*w = z1 - y1 (ADVICE.md round-1 high finding).
        proof = prover.prove()
    if not prover.verify(proof):
        raise RuntimeError("generated PoD proof is not valid")
    return st, proof


def generate_header_file(st: PodStatement, path: str) -> None:
    """Emit the statement as static C arrays for standalone native-layer
    testing (reference GenerateHeaderFile, vdec/prover.go:240-297).

    Coefficients are written as centered (hi, lo) 64-bit pairs since the
    ~114-bit values exceed any C integer literal type."""
    def rows(arr2d):
        out = []
        for row in arr2d:
            hi, lo = _obj_to_hilo(np.asarray(row, dtype=object))
            out.append("  {" + ", ".join(
                f"{{{int(h)}LL, {int(x)}ULL}}" for h, x in zip(hi, lo)) + "}")
        return ",\n".join(out)

    n_ct, n = st.ct0.shape
    with open(path, "w") as f:
        f.write("// generated by lumenos_tpu.vdec.prover.generate_header_file\n")
        f.write("// value = hi * 2^64 + lo  (hi signed, lo unsigned)\n")
        f.write(f"#define VDEC_N_CT {n_ct}\n#define VDEC_N {n}\n")
        f.write("typedef struct { long long hi; unsigned long long lo; } "
                "vdec_coeff_t;\n")
        f.write(f"static const char vdec_q_modulus[] = \"{st.q_modulus}\";\n")
        f.write(f"static const unsigned long long vdec_t = {st.t}ULL;\n")
        for name, arr in (("ct0", st.ct0), ("ct1", st.ct1),
                          ("delta_m", st.delta_m)):
            f.write(f"static const vdec_coeff_t vdec_{name}"
                    f"[VDEC_N_CT][VDEC_N] = {{\n{rows(arr)}\n}};\n")
        if st.sk_signed is not None:
            f.write("static const signed char vdec_sk[VDEC_N] = {"
                    + ", ".join(str(int(x)) for x in st.sk_signed) + "};\n")
