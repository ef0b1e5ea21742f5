"""Vectorized modular arithmetic over uint64 tensors (JAX).

The framework's word-level math: everything (field elements, RNS limbs)
is a uint64 residue < q < 2^61. TPU has no 128-bit type, so the 64x64->128
product is built from 32-bit halves and reduced with Barrett (exact, matching
the semantics of lattigo's BRed used throughout the reference:
core/field.go:56-58). All functions are shape-polymorphic and jit-friendly.

Conventions:
- Inputs to mulmod/shoup_mulmod MUST already be reduced < q (< 2^61).
  Transcript-sampled raw u64 values are reduced once at the boundary -
  mathematically identical to the reference's full Barrett reduction.
- ModCtx precomputes per-modulus constants host-side (Python ints).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .. import jaxcfg  # noqa: F401  (enables x64)
import jax.numpy as jnp

def _u64(x) -> jnp.ndarray:
    """Convert a Python int (possibly >= 2^63) to a u64 scalar array."""
    return jnp.asarray(np.uint64(x))


_U32 = _u64(0xFFFFFFFF)
_32 = _u64(32)


def mul64wide(a, b):
    """Full 64x64 -> 128 bit product as (hi, lo) uint64 words."""
    a = jnp.asarray(a, jnp.uint64)
    b = jnp.asarray(b, jnp.uint64)
    a0 = a & _U32
    a1 = a >> _32
    b0 = b & _U32
    b1 = b >> _32
    lolo = a0 * b0
    m1 = a1 * b0
    m2 = a0 * b1
    hihi = a1 * b1
    mid = m1 + m2
    mid_carry = jnp.where(mid < m1, jnp.uint64(1) << _32, jnp.uint64(0))
    lo = lolo + (mid << _32)
    lo_carry = jnp.where(lo < lolo, jnp.uint64(1), jnp.uint64(0))
    hi = hihi + (mid >> _32) + mid_carry + lo_carry
    return hi, lo


@dataclass(frozen=True)
class ModCtx:
    """Per-modulus Barrett constants for q < 2^62.

    With k = bitlen(q) and shift s = k-1: u = floor(2^(64+s)/q) < 2^64
    (since q >= 2^s), and xs = floor(x / 2^s) < 2^(k+1) <= 2^63 for
    x < q^2. Quotient estimate t = mulhi(xs, u) satisfies Q-2 <= t <= Q,
    so the remainder needs <= 3 conditional subtractions.
    """

    q: int
    u: int      # floor(2^(64+s) / q)
    s: int      # bitlen(q) - 1

    @classmethod
    def new(cls, q: int) -> "ModCtx":
        if q.bit_length() > 62:
            raise ValueError("modulus must be < 2^62")
        s = q.bit_length() - 1
        return cls(q=q, u=(1 << (64 + s)) // q, s=s)

    def shoup(self, w: int) -> int:
        """Shoup precomputation floor(w * 2^64 / q) for fixed multiplicand w < q."""
        return (int(w) << 64) // self.q


def addmod(a, b, q: int):
    q64 = _u64(q)
    s = a + b
    return jnp.where(s >= q64, s - q64, s)


def submod(a, b, q: int):
    q64 = _u64(q)
    s = a + (q64 - b)
    return jnp.where(s >= q64, s - q64, s)


def negmod(a, q: int):
    q64 = _u64(q)
    s = q64 - a
    return jnp.where(s >= q64, s - q64, s)  # maps 0 -> 0


def mulmod(a, b, ctx: ModCtx):
    """Exact a*b mod q for a, b < q < 2^62 (Barrett, vectorized)."""
    q = _u64(ctx.q)
    u = _u64(ctx.u)
    hi, lo = mul64wide(a, b)
    # xs = (hi*2^64 + lo) >> s; x < q^2 so xs < 2^(k+1) fits u64
    xs = (hi << _u64(64 - ctx.s)) | (lo >> _u64(ctx.s))
    t, _ = mul64wide(xs, u)  # quotient estimate = mulhi(xs, u)
    r = lo - t * q  # low 64 bits suffice: true remainder < 4q < 2^64
    r = jnp.where(r >= q, r - q, r)
    r = jnp.where(r >= q, r - q, r)
    r = jnp.where(r >= q, r - q, r)
    return r


def shoup_mulmod(x, w: int, w_shoup: int, q: int):
    """x*w mod q with precomputed w_shoup = floor(w<<64 / q); result < q."""
    wj = _u64(w)
    wsj = _u64(w_shoup)
    qj = _u64(q)
    hi, _ = mul64wide(x, wsj)
    r = x * wj - hi * qj
    return jnp.where(r >= qj, r - qj, r)


def shoup_mulmod_vec(x, w, w_shoup, q: int):
    """Elementwise x*w mod q where w/w_shoup are arrays (broadcastable)."""
    qj = _u64(q)
    hi, _ = mul64wide(x, jnp.asarray(w_shoup, jnp.uint64))
    r = x * jnp.asarray(w, jnp.uint64) - hi * qj
    return jnp.where(r >= qj, r - qj, r)


def summod(x, q: int, axis: int = -1):
    """Sum along axis mod q without u64 overflow.

    Reduces in chunks of c terms where c*q < 2^63 (c=32 for q < 2^58),
    taking a mod after each chunk level. Inputs must be < q.
    """
    x = jnp.moveaxis(x, axis, -1)
    qj = _u64(q)
    chunk = max(2, (1 << 63) // q)
    chunk = 1 << min(6, (chunk.bit_length() - 1))  # power of two <= 64
    while x.shape[-1] > chunk:
        n = x.shape[-1]
        pad = (-n) % chunk
        if pad:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
        x = x.reshape(x.shape[:-1] + (x.shape[-1] // chunk, chunk))
        x = jnp.sum(x, axis=-1) % qj
    return jnp.sum(x, axis=-1) % qj


def matmul_mod_small(m_rows: np.ndarray, x, ctx: ModCtx):
    """out[..., i] = sum_j m[i, j] * x[..., j] mod q for a tiny constant
    matrix m (entries < q). Used for NTT base cases (sizes 2/4/8)."""
    m = jnp.asarray(m_rows, jnp.uint64)  # [s, s]
    prod = mulmod(x[..., None, :], m, ctx)  # [..., s, s]
    s = m.shape[0]
    acc = jnp.sum(prod, axis=-1)  # s * q < 2^64 for s <= 8, q < 2^61
    return acc % _u64(ctx.q)
