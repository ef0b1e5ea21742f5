"""Random-linear-combination batching of queried columns for the PoD.

Reference (vdec/batching.go) batches ~309 queried-column ciphertexts into
ONE with per-slot full-size alphas via plaintext multiplications. At level 1
that multiplication's noise (~2^84, carried by the encoded alpha's full-size
coefficients) would exceed the level-1 binding bound Delta_1/2 = 2^56, so we
batch differently - same 2^-57 Schwartz-Zippel batching soundness, but
noise-sound at level 1:

- ONE transcript alpha per column (scalar); cheating in any slot of any
  column changes the batched value except w.p. ~1/t (Schwartz-Zippel in
  the alphas).
- Each alpha (57 bits, after folding in the public column scale sigma_j) is
  split into three 19-bit digits; digit k produces batched ciphertext
  S_k = sum_j d_{j,k} * ct_j via cheap scalar muls: noise <=
  2^15 * 2^19 * 309 ~ 2^42 << 2^56, so each S_k uniquely binds its
  plaintext at level 1.
- The verifier/client recombines: sum_k 2^(19k) * Dec(S_k) =
  sum_j alpha_j * v_j (mod t) = the plaintext RLC.

The proof-of-decryption then covers CT_COUNT = 3 ciphertexts (the
reference's prover is structured for a CT_COUNT loop, vdec/prover.go:150).
"""

from __future__ import annotations

import numpy as np

from .. import jaxcfg  # noqa: F401
import jax
import jax.numpy as jnp

from ..core.transcript import Transcript
from ..fhe.backend import BgvBackend, CtBatch
from ..fhe.ring import barrett_mul, add_rns

DIGIT_BITS = 19
N_DIGITS = 3  # covers the 57-bit plaintext modulus


def sample_alphas(transcript: Transcript, cols: int) -> np.ndarray:
    """One u64 alpha per queried column (label "pod_alpha")."""
    return np.array([transcript.sample_uint64("pod_alpha") for _ in range(cols)],
                    dtype=np.uint64)


def batch_columns(values: np.ndarray, alphas: np.ndarray, t: int) -> np.ndarray:
    """Plaintext RLC of (unscaled) column values [cols, rows] with scalar
    alphas [cols] -> [rows] mod t."""
    acc = np.zeros(values.shape[1], dtype=object)
    for j in range(values.shape[0]):
        acc = (acc + values[j].astype(object) * (int(alphas[j]) % t)) % t
    return np.array(acc.tolist(), dtype=np.uint64)


def alpha_digits(alphas: np.ndarray, scales: np.ndarray | None, t: int) -> np.ndarray:
    """[cols] raw alphas (+ optional sigma_j) -> [cols, N_DIGITS] 19-bit
    digits of alpha_j * sigma_j^{-1} mod t."""
    cols = alphas.shape[0]
    out = np.zeros((cols, N_DIGITS), dtype=np.uint64)
    mask = (1 << DIGIT_BITS) - 1
    for j in range(cols):
        a = int(alphas[j]) % t
        if scales is not None:
            a = a * pow(int(scales[j]), t - 2, t) % t
        for k in range(N_DIGITS):
            out[j, k] = (a >> (DIGIT_BITS * k)) & mask
    return out


def batch_ciphertexts(
    backend: BgvBackend,
    cts: CtBatch,
    alphas: np.ndarray,
    scales: np.ndarray | None = None,
) -> CtBatch:
    """-> [N_DIGITS, 2, L+1, N] batch: S_k = sum_j digit_{j,k} * ct_j.

    Dec(S_k) = sum_j d_{j,k} * m_j; recombining with 2^(19k) weights gives
    the plaintext RLC of the unscaled values.
    """
    t = backend.t
    digits = alpha_digits(alphas, scales, t)          # [cols, 3]
    lvl = cts.level
    q, _, _ = backend.params.limb_consts(lvl)
    # digits are < 2^19 < every q_i: same residue for all limbs
    dig = jnp.asarray(digits, jnp.uint64)             # [cols, 3]

    @jax.jit
    def impl(data, dig):
        qj, uj, sj = backend._consts(lvl)
        # [cols, 3, 1, L, 1] x [cols, 1(->3 bcast), 2, L, N]
        prod = barrett_mul(
            data[:, None], dig[:, :, None, None, None],
            qj[:, None], uj[:, None], sj[:, None])    # [cols, 3, 2, L, N]
        # tree-sum over columns without overflow
        acc = prod
        while acc.shape[0] > 1:
            half = acc.shape[0] // 2
            extra = acc[2 * half:]
            acc = add_rns(acc[:half], acc[half:2 * half], qj[:, None])
            if extra.shape[0]:
                acc = acc.at[:extra.shape[0]].set(
                    add_rns(acc[:extra.shape[0]], extra, qj[:, None]))
        return acc[0]                                  # [3, 2, L, N]

    return CtBatch(data=impl(cts.data, dig), level=lvl)


def recombine_digit_values(values_per_digit: np.ndarray, t: int) -> np.ndarray:
    """[N_DIGITS, rows] decrypted digit-batch values -> [rows] RLC mod t."""
    acc = np.zeros(values_per_digit.shape[1], dtype=object)
    for k in range(values_per_digit.shape[0]):
        acc = (acc + values_per_digit[k].astype(object) * (1 << (DIGIT_BITS * k))) % t
    return np.array(acc.tolist(), dtype=np.uint64)
