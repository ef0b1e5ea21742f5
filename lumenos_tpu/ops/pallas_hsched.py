"""Fused Pallas TPU kernel for the homomorphic-NTT butterfly schedule.

Executes ALL layers of a recorded HnttSchedule (fhe/hsched.py) in one
kernel: the ciphertext block stays resident in VMEM across layers instead
of doing one HBM round-trip per layer per op like the XLA executor
(apply_schedule) — the schedule path is HBM-bandwidth-bound, so fusing
the ~8 layers is the main lever on device time (round-1 VERDICT next #2).

Why this kernel is possible: in physical coordinates every butterfly
layer pairs positions p <-> p XOR d with at most two distinct power-of-2
distances d, uniformly across transform groups (asserted at build time).
The partner gather therefore reduces to sublane rolls plus a static
select:  part[p] = y[p^d] = where(bit_d(p), roll(y, +d), roll(y, -d)).

Mosaic has no 64-bit lanes; residues travel as (hi, lo) u32 pairs and the
Shoup mulmod is built from 16x16->32 partial products (ops/pallas_modmul
is the scalar template).

Layout: x [n_cts, 2, L, N] u64 -> split to u32 pairs; grid over
(position-group, component, limb, lane-block); block [G, CBLK] with
G = transform size (64/128). Per (layer, position, limb) Shoup multiplier
pairs ride a [nl, G, 1] block.

Reference analogue: fhe/ntt.go:20-279 (the per-ct butterfly loops).
"""

from __future__ import annotations

from functools import partial

import numpy as np

from .. import jaxcfg  # noqa: F401
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_M16 = 0xFFFF


def _mul32x32(a, b):
    """u32 x u32 -> (hi, lo) via 16-bit partial products."""
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


def _mul64_hi(xh, xl, yh, yl):
    """High 64 bits of the 128-bit product of u32-pair values."""
    h_ll, _ = _mul32x32(xl, yl)
    h_lh, l_lh = _mul32x32(xl, yh)
    h_hl, l_hl = _mul32x32(xh, yl)
    h_hh, l_hh = _mul32x32(xh, yh)
    m = l_lh + l_hl
    c1 = (m < l_lh).astype(jnp.uint32)
    m2 = m + h_ll
    c2 = (m2 < m).astype(jnp.uint32)
    t = h_lh + h_hl
    c3 = (t < h_lh).astype(jnp.uint32)
    t2 = t + l_hh
    c4 = (t2 < t).astype(jnp.uint32)
    t3 = t2 + c1 + c2
    c5 = (t3 < t2).astype(jnp.uint32)
    return h_hh + c3 + c4 + c5, t3


def _mul64_lo(xh, xl, yh, yl):
    """Low 64 bits of the product of u32-pair values."""
    h_ll, l_ll = _mul32x32(xl, yl)
    lo_hi = h_ll + xl * yh + xh * yl  # wrapping u32 is exact mod 2^32
    return lo_hi, l_ll


def _add64(ah, al, bh, bl):
    lo = al + bl
    carry = (lo < al).astype(jnp.uint32)
    return ah + bh + carry, lo


def _sub64(ah, al, bh, bl):
    lo = al - bl
    borrow = (al < bl).astype(jnp.uint32)
    return ah - bh - borrow, lo


def _geq64(ah, al, bh, bl):
    return (ah > bh) | ((ah == bh) & (al >= bl))


def _shoup(xh, xl, wh, wl, sh, sl, qh, ql):
    """x*w mod q with w_shoup = floor(w<<64 / q); q < 2^63."""
    th, tl = _mul64_hi(xh, xl, sh, sl)
    xw_h, xw_l = _mul64_lo(xh, xl, wh, wl)
    tq_h, tq_l = _mul64_lo(th, tl, qh, ql)
    rh, rl = _sub64(xw_h, xw_l, tq_h, tq_l)
    over = _geq64(rh, rl, qh, ql)
    rh2, rl2 = _sub64(rh, rl, qh, ql)
    return jnp.where(over, rh2, rh), jnp.where(over, rl2, rl)


def _sched_kernel(qh_ref, ql_ref, mask_ref, wh_ref, wl_ref, sh_ref, sl_ref,
                  xh_ref, xl_ref, oh_ref, ol_ref, *, dists_per_layer,
                  group: int):
    """dists_per_layer: static tuple of XOR-distance tuples (powers of 2,
    <= 2 per layer). mask_ref [nl8, n] u32 bitfield per (layer, pos):
    bit0 spos, bit1 sneg, bits (2+2k) dist==d_k, bits (3+2k) bit_dk set.
    w refs [1, nl8, n] carry the current limb's Shoup pairs; the kernel
    slices its group's rows with a dynamic sublane slice."""
    xh = xh_ref[0, 0, :, :]
    xl = xl_ref[0, 0, :, :]
    limb = pl.program_id(2)
    qh = qh_ref[limb]
    ql = ql_ref[limb]
    g0 = pl.multiple_of(pl.program_id(0) * group, group)
    zero = jnp.uint32(0)
    one = jnp.uint32(1)
    for li, dists in enumerate(dists_per_layer):
        m = mask_ref[pl.ds(g0, group), li][:, None]   # [G, 1] u32 bitfield
        wh = wh_ref[0, pl.ds(g0, group), li][:, None]
        wl = wl_ref[0, pl.ds(g0, group), li][:, None]
        sh = sh_ref[0, pl.ds(g0, group), li][:, None]
        sl = sl_ref[0, pl.ds(g0, group), li][:, None]
        yh, yl = _shoup(xh, xl, wh, wl, sh, sl, qh, ql)
        # partner gather: rolls + static selects (module docstring)
        ph, plo = yh, yl
        G = yh.shape[0]
        for k, d in enumerate(dists):
            # shifts must stay i32 under jax_enable_x64
            up = jnp.int32(G - d)              # = roll by -d
            dn = jnp.int32(d)
            up_h = pltpu.roll(yh, up, 0)
            up_l = pltpu.roll(yl, up, 0)
            dn_h = pltpu.roll(yh, dn, 0)
            dn_l = pltpu.roll(yl, dn, 0)
            bm = ((m >> jnp.uint32(3 + 2 * k)) & one) != zero
            gh = jnp.where(bm, dn_h, up_h)
            gl = jnp.where(bm, dn_l, up_l)
            dm = ((m >> jnp.uint32(2 + 2 * k)) & one) != zero
            ph = jnp.where(dm, gh, ph)
            plo = jnp.where(dm, gl, plo)
        # term: +y at u-slots, (q - y) at v-slots (0 stays 0), 0 if idle
        is_zero = (yh | yl) == zero
        nh, nl_ = _sub64(qh, ql, yh, yl)
        nh = jnp.where(is_zero, zero, nh)
        nl_ = jnp.where(is_zero, zero, nl_)
        pm = (m & one) != zero
        nm = ((m >> one) & one) != zero
        th = jnp.where(pm, yh, jnp.where(nm, nh, zero))
        tl = jnp.where(pm, yl, jnp.where(nm, nl_, zero))
        sh_, sl_ = _add64(ph, plo, th, tl)
        over = _geq64(sh_, sl_, qh, ql)
        rh, rl = _sub64(sh_, sl_, qh, ql)
        xh = jnp.where(over, rh, sh_)
        xl = jnp.where(over, rl, sl_)
    oh_ref[0, 0, :, :] = xh
    ol_ref[0, 0, :, :] = xl


def _layer_meta(sched):
    """Static distances + packed mask bitfield from the group-uniform
    schedule: returns (dists_per_layer, mask_words [nl, G, 1] u32)."""
    G = sched.size
    idx = np.arange(G)
    n_groups = sched.n // G
    dists_per_layer = []
    words = np.zeros((sched.n_layers, G), np.uint32)
    for l in range(sched.n_layers):
        p0 = sched.partner[l][:G] % G
        # group uniformity (verified at record time for our transforms)
        pg = sched.partner[l].reshape(n_groups, G) - (
            np.arange(n_groups)[:, None] * G)
        assert (pg == p0).all(), "schedule not group-uniform"
        dvec = idx ^ p0
        dists = sorted(set(int(v) for v in dvec[dvec != 0]))
        assert all(d & (d - 1) == 0 for d in dists) and len(dists) <= 2
        w = (sched.s_pos[l][:G].astype(np.uint32)
             | (sched.s_neg[l][:G].astype(np.uint32) << 1))
        for k, d in enumerate(dists):
            w |= (dvec == d).astype(np.uint32) << (2 + 2 * k)
            w |= ((idx & d) != 0).astype(np.uint32) << (3 + 2 * k)
        words[l] = w
        dists_per_layer.append(tuple(dists))
    return tuple(dists_per_layer), words


def _split_u32(a):
    a = jnp.asarray(a, jnp.uint64)
    return ((a >> jnp.uint64(32)).astype(jnp.uint32),
            (a & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32))


def apply_schedule_pallas(x, sched, w, ws, q: np.ndarray, *,
                          interpret: bool = False, cblk: int = 512):
    """Drop-in for hsched.apply_schedule on TPU hardware.

    x: [n, 2, L, N] u64; w/ws: [nl, n, L] u64 Shoup pairs; q: [L].
    Returns the transformed batch in physical layout (caller applies
    sched.final_pos).
    """
    n, ncomp, L, N = x.shape
    G = sched.size
    assert n % G == 0
    dists_per_layer, mask_words = _layer_meta(sched)
    nl = sched.n_layers
    nl8 = (nl + 7) // 8 * 8            # Mosaic sublane alignment
    cblk = min(cblk, N)
    assert N % cblk == 0
    # layouts satisfying Mosaic's (8, 128) block alignment with the
    # group slice on the SUBLANE axis:
    #   x  -> [2, L, n, N]   blocks (1, 1, G, cblk)
    #   w  -> [L, n, nl8]    blocks (1, n, nl8): the whole limb table
    #   m  -> [n, nl8]       (group masks replicated across groups)
    xt = jnp.transpose(jnp.asarray(x, jnp.uint64), (1, 2, 0, 3))
    xh, xl = _split_u32(xt)

    def _wtab(a):                       # [nl, n, L] u64 -> [L, n, nl8] u32x2
        hi, lo = _split_u32(jnp.transpose(jnp.asarray(a, jnp.uint64),
                                          (2, 1, 0)))
        pad = [(0, 0), (0, 0), (0, nl8 - nl)]
        return jnp.pad(hi, pad), jnp.pad(lo, pad)

    wh, wl = _wtab(w)
    sh, sl = _wtab(ws)
    masks = np.zeros((n, nl8), np.uint32)
    masks[:, :nl] = np.tile(mask_words.T, (n // G, 1))  # [nl,G] -> [n,nl8]
    qarr = np.asarray(q, np.uint64)
    q_hi = (qarr >> 32).astype(np.uint32).reshape(L)
    q_lo = (qarr & 0xFFFFFFFF).astype(np.uint32).reshape(L)

    grid = (n // G, ncomp, L, N // cblk)
    xspec = pl.BlockSpec((1, 1, G, cblk),
                         lambda g, c, l, b: (c, l, g, b))
    # index maps must produce i32 under jax_enable_x64: literal 0 would
    # be weak-typed i64 (Mosaic rejects i64 func.return) — use g - g
    wspec = pl.BlockSpec((1, n, nl8), lambda g, c, l, b: (l, g - g, g - g))
    mspec = pl.BlockSpec((n, nl8), lambda g, c, l, b: (g - g, g - g))
    # full [L] array in SMEM; kernel indexes it by pl.program_id(2)
    # (per-block SMEM slices need 8x128 alignment, whole arrays do not);
    # explicit index map because the default one emits i64 literals
    qspec = pl.BlockSpec((L,), lambda g, c, l, b: (g - g,),
                         memory_space=pltpu.SMEM)

    kernel = partial(_sched_kernel, dists_per_layer=dists_per_layer,
                     group=G)
    oh, ol = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[qspec, qspec, mspec, wspec, wspec, wspec, wspec,
                  xspec, xspec],
        out_specs=(xspec, xspec),
        out_shape=(jax.ShapeDtypeStruct(xt.shape, jnp.uint32),
                   jax.ShapeDtypeStruct(xt.shape, jnp.uint32)),
        interpret=interpret,
    )(q_hi, q_lo, masks, wh, wl, sh, sl, xh, xl)
    out = (oh.astype(jnp.uint64) << jnp.uint64(32)) | ol.astype(jnp.uint64)
    return jnp.transpose(out, (2, 0, 1, 3))


def apply_schedule_full_pallas(x, sched, residues, q, **kw):
    """Kernel + trailing permutation (counterpart of apply_schedule_full)."""
    w, ws = residues
    out = apply_schedule_pallas(x, sched, w, ws, q, **kw)
    return out[np.asarray(sched.final_pos)]
