"""Pallas TPU kernel: Shoup modular multiplication in 32-bit lanes.

Mosaic/Pallas has no 64-bit integer type, so residues are carried as
(hi, lo) u32 pairs and all wide arithmetic is built from 16x16->32
partial products - the native formulation for the TPU VPU, and the
template for migrating the framework's u64-emulated hot loops (NTT
butterflies, dyadic muls) off XLA's generic s64 emulation.

This module provides the first kernel of that family:
    shoup_mulmod_pallas(x, w, w_shoup, q): x * w mod q for fixed w
with exact agreement against the u64 reference (tests/test_pallas.py,
interpret mode). Hardware status: Mosaic compiles the kernel once the
leading axis is blocked under the ~16 MB scoped-VMEM budget (~24 live u32
temporaries per element); under jax_enable_x64 the BlockSpec index_map must
stay i32 (hence the `i - i` zero). Full-kernel hardware validation +
migration of the NTT butterflies is round-2 work.
"""

from __future__ import annotations

import numpy as np

from .. import jaxcfg  # noqa: F401
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_M16 = 0xFFFF


def _mul32x32(a, b):
    """u32 x u32 -> (hi, lo) u32 via 16-bit partial products."""
    a0 = a & _M16
    a1 = a >> 16
    b0 = b & _M16
    b1 = b >> 16
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = (p00 >> 16) + (p01 & _M16) + (p10 & _M16)
    lo = (p00 & _M16) | (mid << 16)
    hi = p11 + (p01 >> 16) + (p10 >> 16) + (mid >> 16)
    return hi, lo


def _add64(ah, al, bh, bl):
    lo = al + bl
    carry = (lo < al).astype(jnp.uint32)
    return ah + bh + carry, lo


def _mul64_lo_hi(xh, xl, yh, yl):
    """(x, y) u32-pair values -> low-64 product and high-64 product words.

    Returns ((lo_hi, lo_lo), (hi_hi, hi_lo)) of the 128-bit product."""
    h_ll, l_ll = _mul32x32(xl, yl)
    h_lh, l_lh = _mul32x32(xl, yh)
    h_hl, l_hl = _mul32x32(xh, yl)
    h_hh, l_hh = _mul32x32(xh, yh)
    # bits 32..63: l_lh + l_hl + h_ll
    m = l_lh + l_hl
    c1 = (m < l_lh).astype(jnp.uint32)
    m2 = m + h_ll
    c2 = (m2 < m).astype(jnp.uint32)
    lo_hi = m2
    lo_lo = l_ll
    # bits 64..127: h_lh + h_hl + l_hh + carries, then h_hh on top
    t = h_lh + h_hl
    c3 = (t < h_lh).astype(jnp.uint32)
    t2 = t + l_hh
    c4 = (t2 < t).astype(jnp.uint32)
    t3 = t2 + c1 + c2
    c5 = (t3 < t2).astype(jnp.uint32)
    hi_lo = t3
    hi_hi = h_hh + c3 + c4 + c5
    return (lo_hi, lo_lo), (hi_hi, hi_lo)


def _sub64(ah, al, bh, bl):
    lo = al - bl
    borrow = (al < bl).astype(jnp.uint32)
    return ah - bh - borrow, lo


def _geq64(ah, al, bh, bl):
    return (ah > bh) | ((ah == bh) & (al >= bl))


def _shoup_kernel(xh_ref, xl_ref, out_h_ref, out_l_ref, *, w, w_shoup, q):
    xh = xh_ref[...]
    xl = xl_ref[...]
    wh = jnp.uint32(w >> 32)
    wl = jnp.uint32(w & 0xFFFFFFFF)
    sh = jnp.uint32(w_shoup >> 32)
    sl = jnp.uint32(w_shoup & 0xFFFFFFFF)
    qh = jnp.uint32(q >> 32)
    ql = jnp.uint32(q & 0xFFFFFFFF)

    # t = mulhi64(x, w_shoup)
    _, (th, tl) = _mul64_lo_hi(xh, xl, sh, sl)
    # r = x*w - t*q  (low 64 bits)
    (xw_h, xw_l), _ = _mul64_lo_hi(xh, xl, wh, wl)
    (tq_h, tq_l), _ = _mul64_lo_hi(th, tl, qh, ql)
    rh, rl = _sub64(xw_h, xw_l, tq_h, tq_l)
    over = _geq64(rh, rl, qh, ql)
    rh2, rl2 = _sub64(rh, rl, qh, ql)
    out_h_ref[...] = jnp.where(over, rh2, rh)
    out_l_ref[...] = jnp.where(over, rl2, rl)


def shoup_mulmod_pallas(x_u64, w: int, w_shoup: int, q: int,
                        interpret: bool = False):
    """x * w mod q on u64 input, computed entirely in u32 lanes."""
    x = jnp.asarray(x_u64, jnp.uint64)
    xh = (x >> jnp.uint64(32)).astype(jnp.uint32)
    xl = (x & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    import functools
    kernel = functools.partial(_shoup_kernel, w=int(w), w_shoup=int(w_shoup),
                               q=int(q))
    # block over the leading axis to stay inside the ~16 MB VMEM budget
    assert x.ndim == 2
    rows, cols = x.shape
    blk = rows
    while blk * cols * 4 * 24 > 8 * 1024 * 1024 and blk % 2 == 0:  # ~24 live u32 temps
        blk //= 2
    spec = pl.BlockSpec((blk, cols), lambda i: (i, i - i))  # i-i: stay i32 under x64
    out_h, out_l = pl.pallas_call(
        kernel,
        grid=(rows // blk,),
        in_specs=[spec, spec],
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct(x.shape, jnp.uint32),
                   jax.ShapeDtypeStruct(x.shape, jnp.uint32)),
        interpret=interpret,
    )(xh, xl)
    return (out_h.astype(jnp.uint64) << jnp.uint64(32)) | out_l.astype(jnp.uint64)
