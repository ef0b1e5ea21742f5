"""Scale-deferred homomorphic Ligero transform over the ciphertext axis.

Applies the reference transform (fhe/ntt.go - six-step recursion with base
cases 2/4/8) to a VECTOR OF CIPHERTEXTS, with the twiddle multiplications
deferred into public per-position scales (DESIGN.md section 3):

- twiddle mul  -> sigma[pos] *= tw^{-1} mod t (host bookkeeping, zero device
  work, zero noise);
- butterfly add -> balanced-rational equalization: device computes
  alpha*U +- beta*V with |alpha|,|beta| <~ sqrt(t) (29-bit), noise ~2^30 per
  layer instead of 2^57;
- transposes  -> pure reshapes of the ciphertext axis (all-to-all when the
  axis is sharded across chips).

Decrypted position p equals (plaintext transform output) * sigma_p; the
client divides by the public sigma_p, reproducing the reference's codeword
values exactly (differential-tested in tests/test_hligero.py).

Host-side scale math uses Python ints during jit tracing; the resulting
cofactor arrays are compile-time constants of the jitted program.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from .. import jaxcfg  # noqa: F401
import jax.numpy as jnp

from ..core.field import PrimeField
from ..core.ntt import sqrt_factor, twiddle_matrix
from .backend import BgvBackend, CtBatch
from .ring import barrett_mul, add_rns, sub_rns
from .scales import equalize


class _HNttCtx:
    """Per-invocation state: device data + host scales."""

    def __init__(self, backend, ct, field: PrimeField, n: int | None = None):
        self.field = field
        self.t = field.modulus
        if ct is not None:
            self.level = ct.level
            q, u, s = backend.params.limb_consts(ct.level)
            self.q_host = [int(x) for x in q]
            self.qj = jnp.asarray(q)
            self.uj = jnp.asarray(u)
            self.sj = jnp.asarray(s)
            self.x = ct.data                   # [n, 2, L, N]
            n = self.x.shape[0]
        else:
            self.x = None                      # scales-only simulation
        self.scales = np.array([1] * n, dtype=object)
        self.n_total = n

    # -- device helpers ----------------------------------------------------

    def _residues(self, coef: np.ndarray) -> jnp.ndarray:
        """Signed small host ints [G, k] -> residues [G, k, 1, L, 1] u64."""
        c = coef.astype(np.int64)
        q = np.array(self.q_host, dtype=np.int64)
        r = ((c[..., None] % q) + q) % q
        return jnp.asarray(r.astype(np.uint64))[..., None, :, None]

    def butterfly(self, view, ui: list[int], vi: list[int],
                  alphas: np.ndarray, betas: np.ndarray):
        """view: [G, b, 2, L, N]; batched pairs (ui[k], vi[k]) per group:
        (x_u, x_v) <- (a*x_u + b*x_v, a*x_u - b*x_v)."""
        u = view[:, np.array(ui)]
        v = view[:, np.array(vi)]
        a_r = self._residues(alphas)
        b_r = self._residues(betas)
        q4 = self.qj[:, None]
        u4, s4 = self.uj[:, None], self.sj[:, None]
        au = barrett_mul(u, a_r, q4, u4, s4)
        bv = barrett_mul(v, b_r, q4, u4, s4)
        view = view.at[:, np.array(ui)].set(add_rns(au, bv, q4))
        view = view.at[:, np.array(vi)].set(sub_rns(au, bv, q4))
        return view


@lru_cache(maxsize=32)
def _inv_tw_cache(modulus: int, field_n: int, size: int):
    """tw[i,j]^{-1} mod t for the six-step twiddle layer at this size."""
    from ..core.field import get_field
    field = get_field(modulus, field_n)
    tw = twiddle_matrix(field, size)
    t = modulus
    inv = np.empty(tw.shape, dtype=object)
    for i in range(tw.shape[0]):
        for j in range(tw.shape[1]):
            inv[i, j] = pow(int(tw[i, j]) % t, t - 2, t)
    return inv


def _base_schedule(size: int, field: PrimeField):
    """Butterfly network for base sizes as (op, ...) list, matching
    core/ntt.py's scalar transcription of the reference patterns.

    ops: ("bf", ui, vi)            - paired add/sub butterflies
         ("tw", pos_list, w_list)  - twiddle multiply (becomes scale update)
         ("swap", perm)            - position permutation
    """
    q = field.modulus
    w4 = field.root_forward(4)
    if size == 2:
        return [("bf", [0], [1])]
    if size == 4:
        return [
            ("bf", [0, 1], [2, 3]),
            ("tw", [3], [w4]),
            ("bf", [0, 2], [1, 3]),
            ("swap", [0, 2, 1, 3]),
        ]
    if size == 8:
        w8 = field.root_forward(8)
        w8_3 = pow(w8, 3, q)
        return [
            ("bf", [0, 1, 2, 3], [4, 5, 6, 7]),
            ("tw", [5, 6, 7], [w8, w4, w8_3]),
            ("bf", [0, 1], [2, 3]),
            ("tw", [3], [w4]),
            ("bf", [0, 2, 4, 5], [1, 3, 6, 7]),
            ("tw", [7], [w4]),
            ("bf", [4, 6], [5, 7]),
            ("swap", [0, 4, 2, 6, 1, 5, 3, 7]),
        ]
    raise ValueError(size)


def _apply_base(ctx: _HNttCtx, size: int) -> None:
    """Apply base-case network over every contiguous block of `size`."""
    n = ctx.n_total
    g = n // size
    t = ctx.t
    rec = getattr(ctx, "layers", None) is not None  # hsched._RecordCtx
    view = None if ctx.x is None else ctx.x.reshape((g, size) + ctx.x.shape[1:])
    scales = ctx.scales.reshape(g, size)
    for op in _base_schedule(size, ctx.field):
        kind = op[0]
        if kind == "bf":
            _, ui, vi = op
            k = len(ui)
            alphas = np.empty((g, k), dtype=object)
            betas = np.empty((g, k), dtype=object)
            for gi in range(g):
                for kk in range(k):
                    a, b, s_new = equalize(int(scales[gi, ui[kk]]),
                                           int(scales[gi, vi[kk]]), t)
                    alphas[gi, kk] = a
                    betas[gi, kk] = b
                    scales[gi, ui[kk]] = s_new
                    scales[gi, vi[kk]] = s_new
            if view is not None:
                view = ctx.butterfly(view, ui, vi, alphas, betas)
            if rec:
                ctx.record_layer(ctx.pos.reshape(g, size), None, g, size,
                                 ui, vi, alphas, betas)
        elif kind == "tw":
            _, pos, ws = op
            for p, w in zip(pos, ws):
                w_inv = pow(int(w) % t, t - 2, t)
                for gi in range(g):
                    scales[gi, p] = scales[gi, p] * w_inv % t
        elif kind == "swap":
            _, perm = op
            if view is not None:
                view = view[:, np.array(perm)]
            scales[:, :] = scales[:, perm]
            if rec:
                pv = ctx.pos.reshape(g, size)
                pv[:, :] = pv[:, np.array(perm)]
    if view is not None:
        ctx.x = view.reshape((n,) + ctx.x.shape[1:])
    ctx.scales = scales.reshape(n)


def _hntt_inner(ctx: _HNttCtx, size: int) -> None:
    if size <= 1:
        return
    if size <= 8:
        _apply_base(ctx, size)
        return
    n = ctx.n_total
    g = n // size
    n1 = sqrt_factor(size)
    n2 = size // n1
    tail = None if ctx.x is None else ctx.x.shape[1:]

    def transpose(r: int, c: int) -> None:
        if ctx.x is not None:
            ctx.x = ctx.x.reshape((g, r, c) + tail).swapaxes(1, 2).reshape((n,) + tail)
        ctx.scales = ctx.scales.reshape(g, r, c).swapaxes(1, 2).reshape(n)
        if getattr(ctx, "layers", None) is not None:
            ctx.pos = np.ascontiguousarray(
                ctx.pos.reshape(g, r, c).swapaxes(1, 2)).reshape(n)

    transpose(n1, n2)
    _hntt_inner(ctx, n1)
    transpose(n2, n1)
    # twiddle layer: pure scale update (device-free)
    inv_tw = _inv_tw_cache(ctx.t, ctx.field.n, size)
    sc = ctx.scales.reshape(g, n1, n2)
    for i in range(1, n1):
        for j in range(1, n2):
            w_inv = inv_tw[i, j]
            for gi in range(g):
                sc[gi, i, j] = sc[gi, i, j] * w_inv % ctx.t
    ctx.scales = sc.reshape(n)
    _hntt_inner(ctx, n2)
    transpose(n1, n2)


@lru_cache(maxsize=16)
def ligero_ntt_scales(modulus: int, field_n: int, size: int, n: int | None = None):
    """Public per-position output scales of the transform (host-only)."""
    from ..core.field import get_field
    field = get_field(modulus, field_n)
    ctx = _HNttCtx(None, None, field, n=n or size)
    _hntt_inner(ctx, size)
    return ctx.scales


def homomorphic_ligero_ntt(
    backend: BgvBackend, ct: CtBatch, field: PrimeField, size: int | None = None,
) -> tuple[CtBatch, np.ndarray]:
    """Apply the Ligero transform to a ciphertext vector.

    ct.data: [n, 2, L+1, N] coeff-domain batch; returns (transformed batch,
    per-position scales sigma [n] as Python ints). Decrypted position p
    times sigma_p^{-1} equals the plaintext transform output.
    """
    if size is None:
        size = ct.data.shape[0]
    ctx = _HNttCtx(backend, ct, field)
    _hntt_inner(ctx, size)
    return CtBatch(data=ctx.x, level=ct.level, is_ntt=ct.is_ntt), ctx.scales


def homomorphic_encode(
    backend: BgvBackend,
    matrix_ct: CtBatch,
    rows: int,
    rho_inv: int,
    pk,
    rng: np.random.Generator,
    field: PrimeField,
) -> tuple[CtBatch, np.ndarray]:
    """Homomorphic RS row-encode (reference fhe/code.go:8-34).

    Appends cols*(rho_inv-1) fresh encryptions of zero (the reference
    encrypts zeros rather than using transparent zeros - replicated), then
    runs the transform over the cols*rho_inv ciphertext vector.
    """
    cols = matrix_ct.data.shape[0]
    pad = cols * (rho_inv - 1)
    zeros = backend.encrypt_values(
        np.zeros((pad, rows), dtype=np.uint64), pk, rng)
    full = CtBatch(
        data=jnp.concatenate([matrix_ct.data, zeros.data], axis=0),
        level=matrix_ct.level, is_ntt=matrix_ct.is_ntt)
    return homomorphic_ligero_ntt(backend, full, field, cols * rho_inv)


def transform_depth(size: int) -> int:
    """Worst-path butterfly-layer count of the transform (noise budgeting).

    Each layer multiplies worst-path noise by ~2^29.5 (equalization
    cofactors <= sqrt(t)); twiddle layers are free (scale-deferred)."""
    if size <= 1:
        return 0
    base = {2: 1, 4: 2, 8: 3}
    if size in base:
        return base[size]
    n1 = sqrt_factor(size)
    return transform_depth(n1) + transform_depth(size // n1)


def min_start_level(params, size: int, safety_bits: int = 40) -> int:
    """Smallest encryption level whose noise budget covers the transform +
    a final level-1 decryption (DESIGN.md section 3 budget analysis)."""
    fresh_bits = params.t.bit_length() + 14   # t * e_fresh
    need = fresh_bits + transform_depth(size) * 30 + safety_bits
    acc = 0
    for lvl, q in enumerate(params.q_primes):
        acc += int(q).bit_length()
        if acc >= need:
            return min(max(lvl, 1), params.max_level)
    return params.max_level
