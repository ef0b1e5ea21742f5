"""MXU matmul formulation of the six-step inner transforms.

The staged homomorphic encode's stage-A/stage-B sub-transforms (the n1-
and n2-point transforms of the six-step factorization, reference
fhe/ntt.go:245-279) are LINEAR maps over F_q per RNS limb: every recorded
butterfly layer (fhe/hsched.py) is a sparse linear operator, so the whole
group transform is one dense [size, size] matrix per limb. This module
executes that matrix product on the MXU instead of the VPU butterfly
kernel (ops/pallas_hsched.py), which plateaued at ~2 G Shoup-mulmods/s
across rounds 2-4 (round-4 VERDICT next-step #1):

  1. PROBE the exact matrix M_l per limb by running a numpy mirror of the
     schedule executor on identity inputs (bit-exact by construction —
     the executor IS the linear map).
  2. DIGIT-DECOMPOSE: with 7-bit digits, x = sum_a x_a 2^(7a) and
     V_a = (M 2^(7a) mod q) = sum_b V_{a,b} 2^(7b), V_{a,b} in [0,127].
     Then  M x mod q = sum_b 2^(7b) Q_b,  Q_b = sum_a V_{a,b} x_a,
     where every Q_b is an EXACT int32: products <= 127^2, contraction
     length D*size <= 9*128, so Q_b <= 127^2 * 1152 < 2^25.
  3. MXU: the Q_b for all bands are ONE s8 x s8 -> s32 dot_general
     [D*size, D*size] @ [D*size, M] per limb — the systolic array does
     ~all the multiply work of the transform.
  4. REDUCE (VPU, cheap): split the band-weighted sum at bit 42:
     S_lo = sum_{b<6} Q_b 2^(7b) < 2^60, S_hi = sum_{b>=6} Q_b 2^(7b-42)
     < 2^39, and  out = Shoup(S_lo, f) + Shoup(S_hi, f*2^42 mod q) mod q
     — two Shoup mulmods per OUTPUT element (vs 6-7 butterfly mulmods
     per element on the schedule path), with an arbitrary public output
     diagonal f folded in for free (stage B's per-row equalization).

Stage B's per-row transforms do NOT factor through a shared matrix:
the scale-deferral contract (out = diag(sigma) W diag(sc)^-1) holds in
the PLAINTEXT field mod t, and mod-t inverses do not lift to the
ciphertext limb moduli q — so each row's exact per-limb matrix is probed
and shipped as its own int8 digit table (device-resident; entering the
one-program-per-shape stage-B executor as a traced input slice).

Bit-exactness vs the schedule path is asserted by tests/test_mxu_ntt.py;
the integer pipeline is exact end-to-end (no rounding anywhere).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from .. import jaxcfg  # noqa: F401
import jax
import jax.numpy as jnp

from .modmath import _u64
from ..fhe.ring import shoup_mul, add_rns

DIG = 7
MASK = np.uint64((1 << DIG) - 1)
SPLIT = 6            # bands b < SPLIT -> S_lo, rest -> S_hi (shift 42)

_U32M = np.uint64(0xFFFFFFFF)
_N32 = np.uint64(32)


# ---------------------------------------------------------------------------
# host-side (numpy) exact 64-bit modmul — for probing only
# ---------------------------------------------------------------------------

def _np_mulhi64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """High 64 bits of the u64 x u64 product (vectorized numpy)."""
    a0 = a & _U32M
    a1 = a >> _N32
    b0 = b & _U32M
    b1 = b >> _N32
    lolo = a0 * b0
    m1 = a1 * b0
    m2 = a0 * b1
    mid = m1 + m2
    mid_carry = np.where(mid < m1, np.uint64(1) << _N32, np.uint64(0))
    lo = lolo + (mid << _N32)
    lo_carry = np.where(lo < lolo, np.uint64(1), np.uint64(0))
    return a1 * b1 + (mid >> _N32) + mid_carry + lo_carry


def _np_shoup(x, w, ws, q):
    """Numpy mirror of fhe.ring.shoup_mul (exact, wrapping u64)."""
    hi = _np_mulhi64(x, ws)
    r = x * w - hi * q
    return np.where(r >= q, r - q, r)


def apply_schedule_np(x: np.ndarray, sched, w: np.ndarray, ws: np.ndarray,
                      q: np.ndarray) -> np.ndarray:
    """Numpy executor of a recorded HnttSchedule (probing; bit-exact
    mirror of hsched.apply_schedule). x: [n, L, C] u64; w/ws: [nl, n, L];
    q: [L]. Returns physical layout (caller applies final_pos)."""
    q2 = q[None, :, None]
    zero = np.uint64(0)
    for l in range(sched.n_layers):
        y = _np_shoup(x, w[l][:, :, None], ws[l][:, :, None], q2)
        part = y[sched.partner[l]]
        neg = np.where(y == zero, zero, q2 - y)
        pos_m = sched.s_pos[l][:, None, None]
        neg_m = sched.s_neg[l][:, None, None]
        term = np.where(pos_m, y, np.where(neg_m, neg, zero))
        s = part + term
        x = np.where(s >= q2, s - q2, s)
    return x


def probe_unit_matrix(field, size: int, primes) -> np.ndarray:
    """Exact linear map of the unit-scale group transform, INCLUDING the
    trailing final_pos gather: M [L, size, size] u64 with
    out[o] = sum_i M[l, o, i] x[i] mod q_l."""
    from ..fhe.hsched import unit_schedule
    sched = unit_schedule(field, size, size)
    prim = [int(p) for p in primes]
    w, ws = sched.residues(prim)
    x = np.zeros((size, len(prim), size), np.uint64)
    for i in range(size):
        x[i, :, i] = 1
    out = apply_schedule_np(x, sched, w, ws,
                            np.array(prim, np.uint64))
    out = out[np.asarray(sched.final_pos)]
    return np.ascontiguousarray(np.transpose(out, (1, 0, 2)))


def probe_row_matrices(field, n2: int, row_res: list, primes) -> np.ndarray:
    """Exact per-row stage-B matrices M [n_rows, L, n2, n2]: row i's
    schedule shares the unit pairing (hsched: pairing is scale-
    independent) with per-row cofactor residues row_res[i] = (w, ws)
    [nl, n2, L]. One batched numpy-executor call probes every row."""
    from ..fhe.hsched import unit_schedule
    n_rows = len(row_res)
    sched = unit_schedule(field, n2, n_rows * n2)
    prim = [int(p) for p in primes]
    L = len(prim)
    nl = row_res[0][0].shape[0]
    w = np.concatenate([r[0] for r in row_res], axis=1)    # [nl, n_rows*n2, L]
    ws = np.concatenate([r[1] for r in row_res], axis=1)
    assert w.shape == (nl, n_rows * n2, L)
    x = np.zeros((n_rows * n2, L, n2), np.uint64)
    for g in range(n_rows):
        for j in range(n2):
            x[g * n2 + j, :, j] = 1
    out = apply_schedule_np(x, sched, w, ws, np.array(prim, np.uint64))
    out = out[np.asarray(sched.final_pos)]
    return np.transpose(out.reshape(n_rows, n2, L, n2), (0, 2, 1, 3))


# ---------------------------------------------------------------------------
# table builders
# ---------------------------------------------------------------------------

def n_digits(primes, dig: int = DIG) -> int:
    nbits = max(int(q).bit_length() for q in primes)
    return -(-nbits // dig)


def _digit_guards(D: int, si: int, dig: int) -> None:
    """Exactness guards: int32 accumulator and u64 band-weighted sums."""
    qmax = ((1 << dig) - 1) ** 2 * D * si
    assert qmax < 1 << 31, "band accumulator would overflow int32"
    lo_w = sum(1 << (dig * b) for b in range(min(D, SPLIT)))
    hi_w = sum(1 << (dig * (b - SPLIT)) for b in range(SPLIT, D))
    assert qmax * lo_w < 1 << 63 and qmax * hi_w < 1 << 63, \
        "band-weighted sum would overflow u64"


def build_digit_tables(M: np.ndarray, primes, dig: int = DIG):
    """int8 MXU tables from probed matrices (vectorized u64 host math).

    M: [..., L, so, si] u64 (entries < q_l). Returns (W8
    [..., L, D*so, D*si] int8, D) with
    W8[..., l, b*so+o, a*si+i] = digit_b((M[..., l, o, i] * 2^(dig*a)) mod q).
    """
    *lead, L, so, si = M.shape
    D = n_digits(primes, dig)
    _digit_guards(D, si, dig)
    W8 = np.zeros(tuple(lead) + (L, D * so, D * si), np.int8)
    for l, q in enumerate(int(p) for p in primes):
        qv = np.uint64(q)
        Ml = M[..., l, :, :]
        for a in range(D):
            w = pow(2, dig * a, q)
            ws = (w << 64) // q
            Va = _np_shoup(Ml, np.uint64(w), np.uint64(ws), qv)
            for b in range(D):
                W8[..., l, b * so:(b + 1) * so, a * si:(a + 1) * si] = (
                    (Va >> np.uint64(dig * b)) & MASK).astype(np.int8)
    return W8, D


def reduce_consts(primes, dig: int = DIG):
    """Per-limb Shoup pairs for the band reduce
    out = S_lo * 1 + S_hi * 2^(dig*SPLIT) mod q.

    Returns (w_lo, ws_lo, w_hi, ws_hi), each [L] u64. Shoup with w=1 is
    exact for ANY x < 2^64 (r = x - floor(x*ws/2^64)*q in [0, 2q), one
    conditional subtraction), so S_lo needs no pre-reduction."""
    prim = [int(p) for p in primes]
    shift = dig * SPLIT
    L = len(prim)
    out = np.zeros((4, L), np.uint64)
    for l, q in enumerate(prim):
        fh = pow(2, shift, q)
        out[0, l] = 1
        out[1, l] = (1 << 64) // q
        out[2, l] = fh
        out[3, l] = (fh << 64) // q
    return out[0], out[1], out[2], out[3]


@lru_cache(maxsize=16)
def _unit_tables_cached(modulus: int, field_n: int, size: int,
                        primes: tuple):
    from ..core.field import get_field
    field = get_field(modulus, field_n)
    M = probe_unit_matrix(field, size, primes)
    W8, D = build_digit_tables(M, primes)
    red = reduce_consts(primes)
    return W8, D, red


def unit_stage_tables(field, size: int, primes):
    """Cached (W8, D, reduce_consts) for the unit-scale transform of
    `size` over the given limb set (stage A / monolithic stages)."""
    return _unit_tables_cached(field.modulus, field.n, size,
                               tuple(int(p) for p in primes))


# ---------------------------------------------------------------------------
# jit-side transform
# ---------------------------------------------------------------------------

def _extract_digits(xl, D: int, axis: int, dig: int = DIG):
    """u64 -> D stacked 7-bit digits (int8) concatenated along `axis`
    (a-major blocks, matching the table layout)."""
    return jnp.concatenate(
        [(xl >> _u64(dig * a)) & _u64(int(MASK)) for a in range(D)],
        axis=axis).astype(jnp.int8)


def _band_reduce(bands, red_l, q, dig: int = DIG):
    """int32 bands [D, ...] (band-major axis 0) -> u64 mod-q values.

    S_lo = sum_{b<SPLIT} Q_b 2^(dig b) (< 2^60), S_hi the rest shifted
    down by dig*SPLIT (< 2^39); out = Shoup(S_lo, 1) + Shoup(S_hi,
    2^(dig SPLIT) mod q)."""
    D = bands.shape[0]
    u = bands.astype(jnp.uint64)
    s_lo = u[0]
    for b in range(1, min(D, SPLIT)):
        s_lo = s_lo + (u[b] << _u64(dig * b))
    out = shoup_mul(s_lo, red_l[0], red_l[1], q)
    if D > SPLIT:
        s_hi = u[SPLIT]
        for b in range(SPLIT + 1, D):
            s_hi = s_hi + (u[b] << _u64(dig * (b - SPLIT)))
        out = add_rns(out, shoup_mul(s_hi, red_l[2], red_l[3], q), q)
    return out


def matmul_transform(x, W8: np.ndarray, primes, D: int, red,
                     dig: int = DIG):
    """Execute the shared-matrix digit transform (traced/jit code).

    x: [L, si, *M] u64; W8: [L, D*so, D*si] int8 compile-time tables;
    red: reduce_consts(primes). Returns [L, so, *M] u64.
    """
    L = x.shape[0]
    so = W8.shape[1] // D
    outs = []
    for l in range(L):
        q = _u64(int(primes[l]))
        xd = _extract_digits(x[l], D, axis=0, dig=dig)
        bands = jax.lax.dot_general(
            jnp.asarray(W8[l]), xd,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        bands = bands.reshape((D, so) + x[l].shape[1:])
        rl = tuple(_u64(int(r[l])) for r in red)
        outs.append(_band_reduce(bands, rl, q, dig))
    return jnp.stack(outs, axis=0)


def matmul_transform_rows(x, w8_rows, primes, D: int, red, dig: int = DIG):
    """Per-row-matrix digit transform (stage B: each row has its own
    exact matrix — the per-limb linear maps do NOT factor through a
    shared matrix because the scale contract holds mod t, not mod q).

    x: [L, R, si, *M] u64; w8_rows: [R, L, D*so, D*si] int8 TRACED input
    (device-resident table slice); red: reduce_consts(primes).
    Returns [L, R, so, *M] u64.
    """
    L = x.shape[0]
    so = w8_rows.shape[2] // D
    outs = []
    for l in range(L):
        q = _u64(int(primes[l]))
        xl = x[l]                                   # [R, si, *M]
        lead = xl.shape
        xf = xl.reshape(lead[0], lead[1], -1)
        xd = _extract_digits(xf, D, axis=1, dig=dig)  # [R, D*si, M]
        bands = jax.lax.dot_general(
            w8_rows[:, l], xd,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)         # [R, D*so, M]
        bands = jnp.moveaxis(
            bands.reshape(lead[0], D, so, *lead[2:]), 1, 0)
        rl = tuple(_u64(int(r[l])) for r in red)
        outs.append(_band_reduce(bands, rl, q, dig))
    return jnp.stack(outs, axis=0)


def group_transform(x, field, size: int, primes):
    """[n, 2, L, N] u64 batch -> unit-scale transform of each contiguous
    group of `size` positions (drop-in for apply_schedule_full_auto on
    unit schedules; bit-identical — tests/test_mxu_ntt.py)."""
    n, ncomp, L, N = x.shape
    assert n % size == 0
    W8, D, red = unit_stage_tables(field, size, primes)
    g = n // size
    xt = jnp.transpose(
        x.reshape(g, size, ncomp, L, N), (3, 1, 0, 2, 4)
    ).reshape(L, size, g * ncomp * N)
    out = matmul_transform(xt, W8, primes, D, red)
    out = out.reshape(L, size, g, ncomp, N)
    return jnp.transpose(out, (2, 1, 3, 0, 4)).reshape(n, ncomp, L, N)
