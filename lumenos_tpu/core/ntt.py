"""The Ligero row-encoding transform over F_t ("the NTT"), reference-exact.

The reference's encode transform (core/ntt.go) is NOT a textbook DFT: it
multiplies by entries of lattigo's bit-reversed *Montgomery-form* twiddle
table with a plain Barrett product, and its six-step twiddle loop mutates
``step`` across the outer iteration (core/ntt.go:70-97). Both prover and
verifier share the transform, so those exact values define the protocol.
We replicate the schedule precisely:

- base cases 2/4/8: fixed butterfly networks (core/ntt.go:10-69), realized
  here as tiny constant matrices over F_t obtained by pushing unit vectors
  through a scalar transcription of the same network;
- generic size: six-step recursion n = n1*n2 with transposes between passes
  and the twiddle matrix computed by the exact (step-mutating) loop.

Two implementations:
- ``ntt_scalar``: host-side Python ints, the differential oracle;
- ``ligero_ntt``: vectorized JAX over the last axis, jit-friendly; used by
  the plaintext prover/verifier (config 1) on TPU or CPU.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from .field import PrimeField
from ..ops.modmath import ModCtx, mulmod, matmul_mod_small, shoup_mulmod_vec

from .. import jaxcfg  # noqa: F401
import jax.numpy as jnp


def sqrt_factor(n: int) -> int:
    """Power-of-2 'square root' split (core/math.go:25-36)."""
    if n <= 0 or (n & (n - 1)) != 0:
        raise ValueError(f"NTT size {n} is not a positive power of 2")
    log2n = n.bit_length() - 1
    if log2n % 2 != 0:
        return 1 << ((log2n - 1) // 2)
    return 1 << (log2n // 2)


# ---------------------------------------------------------------------------
# scalar oracle (exact transcription of the reference network semantics)
# ---------------------------------------------------------------------------

def _base2(v: list[int], off: int, q: int) -> None:
    a, b = v[off], v[off + 1]
    v[off], v[off + 1] = (a + b) % q, (a - b) % q


def _base4(v: list[int], off: int, field: PrimeField) -> None:
    q = field.modulus
    w4 = field.root_forward(4)
    i = off
    v[i], v[i + 2] = (v[i] + v[i + 2]) % q, (v[i] - v[i + 2]) % q
    v[i + 1], v[i + 3] = (v[i + 1] + v[i + 3]) % q, (v[i + 1] - v[i + 3]) % q
    v[i + 3] = v[i + 3] * w4 % q
    v[i], v[i + 1] = (v[i] + v[i + 1]) % q, (v[i] - v[i + 1]) % q
    v[i + 2], v[i + 3] = (v[i + 2] + v[i + 3]) % q, (v[i + 2] - v[i + 3]) % q
    v[i + 1], v[i + 2] = v[i + 2], v[i + 1]


def _base8(v: list[int], off: int, field: PrimeField) -> None:
    q = field.modulus
    w8 = field.root_forward(8)
    w4 = field.root_forward(4)
    w8_3 = pow(w8, 3, q)
    i = off
    for d in range(4):
        a, b = v[i + d], v[i + d + 4]
        v[i + d], v[i + d + 4] = (a + b) % q, (a - b) % q
    v[i + 5] = v[i + 5] * w8 % q
    v[i + 6] = v[i + 6] * w4 % q
    v[i + 7] = v[i + 7] * w8_3 % q
    v[i], v[i + 2] = (v[i] + v[i + 2]) % q, (v[i] - v[i + 2]) % q
    v[i + 1], v[i + 3] = (v[i + 1] + v[i + 3]) % q, (v[i + 1] - v[i + 3]) % q
    v[i + 3] = v[i + 3] * w4 % q
    v[i], v[i + 1] = (v[i] + v[i + 1]) % q, (v[i] - v[i + 1]) % q
    v[i + 2], v[i + 3] = (v[i + 2] + v[i + 3]) % q, (v[i + 2] - v[i + 3]) % q
    v[i + 4], v[i + 6] = (v[i + 4] + v[i + 6]) % q, (v[i + 4] - v[i + 6]) % q
    v[i + 5], v[i + 7] = (v[i + 5] + v[i + 7]) % q, (v[i + 5] - v[i + 7]) % q
    v[i + 7] = v[i + 7] * w4 % q
    v[i + 4], v[i + 5] = (v[i + 4] + v[i + 5]) % q, (v[i + 4] - v[i + 5]) % q
    v[i + 6], v[i + 7] = (v[i + 6] + v[i + 7]) % q, (v[i + 6] - v[i + 7]) % q
    v[i + 1], v[i + 4] = v[i + 4], v[i + 1]
    v[i + 3], v[i + 6] = v[i + 6], v[i + 3]


def _transpose_chunk(v: list[int], off: int, rows: int, cols: int) -> None:
    sub = v[off:off + rows * cols]
    out = [0] * len(sub)
    for i in range(rows):
        for j in range(cols):
            out[j * rows + i] = sub[i * cols + j]
    v[off:off + rows * cols] = out


def ntt_scalar(values: list[int], size: int, field: PrimeField) -> list[int]:
    """In-place reference transform on a list of Python ints (mod t)."""
    _ntt_scalar_inner(values, size, field)
    return values


def _ntt_scalar_inner(v: list[int], size: int, field: PrimeField) -> None:
    q = field.modulus
    if size in (0, 1):
        return
    if size == 2:
        for i in range(0, len(v), 2):
            _base2(v, i, q)
        return
    if size == 4:
        for i in range(0, len(v), 4):
            _base4(v, i, field)
        return
    if size == 8:
        for i in range(0, len(v), 8):
            _base8(v, i, field)
        return
    n1 = sqrt_factor(size)
    n2 = size // n1
    tw = twiddle_matrix(field, size)
    for off in range(0, len(v), size):
        _transpose_chunk(v, off, n1, n2)
        chunk = v[off:off + size]
        _ntt_scalar_inner(chunk, n1, field)
        _transpose_chunk(chunk, 0, n2, n1)
        for i in range(1, n1):
            for j in range(1, n2):
                chunk[i * n2 + j] = chunk[i * n2 + j] * int(tw[i][j]) % q
        _ntt_scalar_inner(chunk, n2, field)
        _transpose_chunk(chunk, 0, n1, n2)
        v[off:off + size] = chunk


_TW_CACHE: dict[tuple[int, int, int], np.ndarray] = {}


def twiddle_matrix(field: PrimeField, size: int) -> np.ndarray:
    """[n1, n2] twiddle factors for the six-step pass at this size.

    Exact replication of the reference loop (core/ntt.go:84-93) including the
    ``step = (i*step) % N`` mutation across the outer iteration. Rows/cols 0
    are 1 (no multiplication in the reference).
    """
    key = (field.modulus, field.n, size)
    if key in _TW_CACHE:
        return _TW_CACHE[key]
    n1 = sqrt_factor(size)
    n2 = size // n1
    n = field.n
    tw = np.ones((n1, n2), dtype=np.uint64)
    step = n // size
    for i in range(1, n1):
        step = (i * step) % n
        idx = step
        for j in range(1, n2):
            idx %= n
            tw[i, j] = field.roots_forward[idx]
            idx += step
    _TW_CACHE[key] = tw
    return tw


# ---------------------------------------------------------------------------
# base-case matrices (F_t) for the vectorized path
# ---------------------------------------------------------------------------

_BASE_CACHE: dict[tuple[int, int, int], np.ndarray] = {}


def base_matrix(field: PrimeField, size: int) -> np.ndarray:
    """[size, size] matrix M with M @ v == base-case butterfly network (mod t)."""
    key = (field.modulus, field.n, size)
    if key in _BASE_CACHE:
        return _BASE_CACHE[key]
    assert size in (2, 4, 8)
    m = np.zeros((size, size), dtype=np.uint64)
    for j in range(size):
        e = [0] * size
        e[j] = 1
        _ntt_scalar_inner(e, size, field)
        for i in range(size):
            m[i, j] = e[i]
    _BASE_CACHE[key] = m
    return m


# ---------------------------------------------------------------------------
# vectorized JAX transform
# ---------------------------------------------------------------------------

def ligero_ntt(x, field: PrimeField, size: int | None = None):
    """Apply the reference transform along the last axis of ``x`` (uint64).

    ``x``: [..., size] residues < t. Returns same shape. jit-friendly: the
    recursion unrolls at trace time; constants are compile-time arrays.
    """
    if size is None:
        size = x.shape[-1]
    ctx = ModCtx.new(field.modulus)
    return _ligero_ntt_inner(x, size, field, ctx)


def _ligero_ntt_inner(x, size: int, field: PrimeField, ctx: ModCtx):
    if size in (0, 1):
        return x
    lead = x.shape[:-1]
    n_total = x.shape[-1]
    if size <= 8:
        m = base_matrix(field, size)
        xb = x.reshape(lead + (n_total // size, size))
        out = matmul_mod_small(m, xb, ctx)
        return out.reshape(lead + (n_total,))
    n1 = sqrt_factor(size)
    n2 = size // n1
    tw = twiddle_matrix(field, size)
    tw_shoup = _shoup_table(field, size, tw, ctx)

    xb = x.reshape(lead + (n_total // size, size))
    # Transpose(chunk, n1, n2): row-major [n1,n2] -> [n2,n1]
    xb = xb.reshape(lead + (n_total // size, n1, n2))
    xb = jnp.swapaxes(xb, -2, -1)  # [..., n2, n1]
    # n2 sub-NTTs of size n1 (contiguous groups of n1)
    xb = _ligero_ntt_inner(xb.reshape(lead + (n_total // size, size)), n1, field, ctx)
    # Transpose(chunk, n2, n1): [n2,n1] -> [n1,n2]
    xb = xb.reshape(lead + (n_total // size, n2, n1))
    xb = jnp.swapaxes(xb, -2, -1)  # [..., n1, n2]
    # twiddle multiply (Shoup: fixed multiplicands)
    xb = shoup_mulmod_vec(xb, tw, tw_shoup, ctx.q)
    # n1 sub-NTTs of size n2
    xb = _ligero_ntt_inner(xb.reshape(lead + (n_total // size, size)), n2, field, ctx)
    # final Transpose(chunk, n1, n2)
    xb = xb.reshape(lead + (n_total // size, n1, n2))
    xb = jnp.swapaxes(xb, -2, -1)
    return xb.reshape(lead + (n_total,))


_SHOUP_CACHE: dict[tuple[int, int, int], np.ndarray] = {}


def _shoup_table(field: PrimeField, size: int, tw: np.ndarray, ctx: ModCtx) -> np.ndarray:
    key = (field.modulus, field.n, size)
    if key not in _SHOUP_CACHE:
        q = ctx.q
        flat = [(int(w) << 64) // q for w in tw.reshape(-1)]
        _SHOUP_CACHE[key] = np.array(flat, dtype=np.uint64).reshape(tw.shape)
    return _SHOUP_CACHE[key]


def encode_row(x, rho_inv: int, field: PrimeField):
    """Reed-Solomon row encode: zero-pad cols -> cols*rho_inv, then transform
    (reference core/code.go:3-23). Acts on the last axis."""
    cols = x.shape[-1]
    pad = [(0, 0)] * (x.ndim - 1) + [(0, cols * (rho_inv - 1))]
    padded = jnp.pad(x, pad)
    return ligero_ntt(padded, field, cols * rho_inv)
