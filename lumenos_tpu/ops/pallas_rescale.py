"""Fused Pallas TPU kernel for the RNS rescale chain.

Profiling at the 8192x4096 config showed the staged encode is dominated
NOT by the butterfly schedule kernel (~0.13 s/chunk) but by the
XLA-executed rescale chains (~0.7-1.0 s/chunk): XLA's u64 emulation
reaches ~25 G int32 op/s on the VPU where hand-written u32-pair Mosaic
code reaches ~1.2 T op/s. This kernel executes the ENTIRE multi-step
rescale (level -> target) in one pass with every limb of a position block
resident in VMEM.

Semantics are bit-identical to the sequential BgvBackend.rescale steps
(backend.py:341-358): per dropped top limb l,

    is_neg  = c_l > q_l/2
    mag     = is_neg ? q_l - c_l : c_l
    r_i     = is_neg ? (q_i - mag mod q_i) mod q_i : mag mod q_i
    c_i     <- (c_i - r_i) * q_l^{-1}  mod q_i      for every kept i < l

The per-(l, i) inverse rides as a Shoup pair; `mag mod q_i` uses the
small-quotient reduction t = mulhi64(mag, floor(2^64/q_i)) (mag < 2^58,
q_i >= 2^55 so the quotient is < 8 and t is off by at most one).

Layout: x [B, L+1, N] -> transposed [L+1, B, N]; block (L+1, 8, cblk);
grid (B/8, N/cblk). All step constants are baked into the unrolled kernel
body as u32 literals (the prime schedule is static per parameter set).

Reference analogue: lattigo Rescale (SURVEY.md 2.3), fhe/ligero.go:149-154.
"""

from __future__ import annotations

from functools import partial

import numpy as np

from .. import jaxcfg  # noqa: F401
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .pallas_hsched import (_add64, _geq64, _mul64_hi, _mul64_lo, _shoup,
                            _sub64, _split_u32)


def _chain_consts(q_primes, level: int, target: int):
    """Static per-step constants: for each dropped limb l (level..target+1)
    and each kept limb i < l: (ql, half, qi, u64_div_qi, w, ws)."""
    steps = []
    for l in range(level, target, -1):
        ql = int(q_primes[l])
        half = ql // 2
        kept = []
        for i in range(l):
            qi = int(q_primes[i])
            u = (1 << 64) // qi          # quotient helper, < 2^9
            w = pow(ql, qi - 2, qi)      # ql^{-1} mod qi
            ws = (w << 64) // qi         # Shoup companion
            kept.append((qi, u, w, ws))
        steps.append((ql, half, kept))
    return steps


def _u32pair(v: int):
    return np.uint32(v >> 32), np.uint32(v & 0xFFFFFFFF)


def _rescale_kernel(xh_ref, xl_ref, oh_ref, ol_ref, *, steps, level: int,
                    target: int):
    # registers: per-limb [8, cblk] u32 pairs
    limbs = [(xh_ref[i], xl_ref[i]) for i in range(level + 1)]
    for si, (ql, half, kept) in enumerate(steps):
        l = level - si
        clh, cll = limbs[l]
        hh, hl = _u32pair(half + 1)
        qlh, qll = _u32pair(ql)
        is_neg = _geq64(clh, cll, hh, hl)       # cl > half  <=>  cl >= half+1
        nh, nl_ = _sub64(qlh, qll, clh, cll)    # ql - cl
        magh = jnp.where(is_neg, nh, clh)
        magl = jnp.where(is_neg, nl_, cll)
        new_limbs = []
        for i in range(l):
            qi, u, w, ws = kept[i]
            qih, qil = _u32pair(qi)
            uh, ul = _u32pair(u)
            # t = mulhi64(mag, u); r = mag - t*qi; cond-subtract twice
            th, tl = _mul64_hi(magh, magl, uh, ul)
            tqh, tql = _mul64_lo(th, tl, qih, qil)
            rh, rl = _sub64(magh, magl, tqh, tql)
            over = _geq64(rh, rl, qih, qil)
            r2h, r2l = _sub64(rh, rl, qih, qil)
            rh = jnp.where(over, r2h, rh)
            rl = jnp.where(over, r2l, rl)
            over = _geq64(rh, rl, qih, qil)
            r2h, r2l = _sub64(rh, rl, qih, qil)
            rh = jnp.where(over, r2h, rh)
            rl = jnp.where(over, r2l, rl)
            # r_i = is_neg ? (qi - r) mod qi : r   ((qi-0) mod qi = 0)
            zero = (rh | rl) == jnp.uint32(0)
            sh_, sl_ = _sub64(qih, qil, rh, rl)
            sh_ = jnp.where(zero, jnp.uint32(0), sh_)
            sl_ = jnp.where(zero, jnp.uint32(0), sl_)
            rih = jnp.where(is_neg, sh_, rh)
            ril = jnp.where(is_neg, sl_, rl)
            # diff = (c_i + (qi - r_i)) with one conditional subtract
            cih, cil = limbs[i]
            dh, dl = _sub64(qih, qil, rih, ril)
            dh, dl = _add64(cih, cil, dh, dl)
            over = _geq64(dh, dl, qih, qil)
            d2h, d2l = _sub64(dh, dl, qih, qil)
            dh = jnp.where(over, d2h, dh)
            dl = jnp.where(over, d2l, dl)
            # c_i <- diff * ql^{-1} mod qi (Shoup)
            wh, wl = _u32pair(w)
            wsh, wsl = _u32pair(ws)
            new_limbs.append(_shoup(dh, dl, wh, wl, wsh, wsl, qih, qil))
        limbs = new_limbs
    for i in range(target + 1):
        oh_ref[i] = limbs[i][0]
        ol_ref[i] = limbs[i][1]


def _segment_levels(level: int, target: int, max_updates: int):
    """Split the chain into segments of bounded kernel-body size.

    A fully unrolled (level -> target) chain has sum_{l=target+1}^{level} l
    kept-limb updates; very long unrolls blow up compile time (XLA:CPU's
    interpret-mode compile goes superlinear past ~8 updates, and Mosaic
    compile cost also grows with body size). Chains are cut greedily so
    each kernel has at most `max_updates` updates; the composition is
    bit-identical since rescale steps compose sequentially.
    """
    cuts = [level]
    acc = 0
    for l in range(level, target, -1):
        if acc and acc + l > max_updates:
            cuts.append(l)
            acc = 0
        acc += l
    cuts.append(target)
    return [(cuts[i], cuts[i + 1]) for i in range(len(cuts) - 1)]


def rescale_chain_pallas(x, q_primes, level: int, target: int, *,
                         interpret: bool = False, cblk: int = 512,
                         max_updates: int = 32):
    """x: [..., level+1, N] u64 residues -> [..., target+1, N], identical
    to iterating BgvBackend.rescale (level - target) times. Long chains
    run as several fused segments (see _segment_levels)."""
    assert level > target >= 0
    segs = _segment_levels(level, target, max_updates)
    if len(segs) > 1:
        for (lv, tg) in segs:
            x = rescale_chain_pallas(x, q_primes, lv, tg,
                                     interpret=interpret, cblk=cblk,
                                     max_updates=max_updates)
        return x
    lead = x.shape[:-2]
    L1 = level + 1
    N = x.shape[-1]
    B = 1
    for d in lead:
        B *= int(d)
    # largest 128-multiple block <= cblk that divides N (N % 128 == 0 is
    # guaranteed by rescale_ok; e.g. N = 640 -> cblk = 128)
    cblk = min(cblk, N)
    while N % cblk:
        cblk -= 128
    assert cblk >= 128 and N % cblk == 0 and B % 8 == 0
    steps = _chain_consts(q_primes, level, target)

    xt = jnp.moveaxis(jnp.asarray(x, jnp.uint64).reshape(B, L1, N), 1, 0)
    xh, xl = _split_u32(xt)

    spec_in = pl.BlockSpec((L1, 8, cblk), lambda b, c: (b - b, b, c))
    spec_out = pl.BlockSpec((target + 1, 8, cblk), lambda b, c: (b - b, b, c))
    kernel = partial(_rescale_kernel, steps=steps, level=level,
                     target=target)
    oh, ol = pl.pallas_call(
        kernel,
        grid=(B // 8, N // cblk),
        in_specs=[spec_in, spec_in],
        out_specs=(spec_out, spec_out),
        out_shape=(jax.ShapeDtypeStruct((target + 1, B, N), jnp.uint32),
                   jax.ShapeDtypeStruct((target + 1, B, N), jnp.uint32)),
        interpret=interpret,
    )(xh, xl)
    out = (oh.astype(jnp.uint64) << jnp.uint64(32)) | ol.astype(jnp.uint64)
    return jnp.moveaxis(out, 0, 1).reshape(lead + (target + 1, N))


def rescale_ok(x_shape, level: int, target: int) -> bool:
    """Fast-path applicability (mirrors hsched._pallas_ok)."""
    if jax.default_backend() == "cpu":
        return False
    if level <= target:
        return False
    lead = x_shape[:-2]
    B = 1
    for d in lead:
        B *= int(d)
    return x_shape[-1] % 128 == 0 and B % 8 == 0
