"""Two-stage chunked homomorphic encode for batches larger than HBM.

The monolithic encode program for 8192 positions x 9 limbs needs ~60 GB of
XLA liveness - 4x a v5e's HBM. This module splits the six-step transform's
TOP level into orchestrated chunked device calls with bounded liveness:

  view the position axis as [n1, n2] cells (i-major);
  stage A (chunked over j): size-n1 sub-transforms along i at the start
      level, each chunk rescaled to `mid_level` inside the chunk program
      (the noise-floor reset preserves the global margin - DESIGN.md 7);
      input chunks are donated and freed as they are consumed;
  twiddle layer: host-side scale bookkeeping only (scale-deferred);
  stage B (chunked over i): size-n2 sub-transforms along j at the reduced
      limb count, rescaled to level 1 inside the chunk;
  finalize: cells -> reference flat order j*n1 + i, fused striped leaf
      digests on device.

Both stages execute RECORDED butterfly schedules (fhe/hsched.py) by
default: the pairing/gather structure is compiled once, and the per-row
equalization cofactors enter stage B as array INPUTS - one stage-B
program per SUB-CHUNK SHAPE, where the sub-chunk widths form a per-block
ladder sized to the HBM freed as mid blocks are consumed
(_bd_cw_ladder). An MXU matmul formulation of both stages exists behind
LUMENOS_MXU_NTT (ops/mxu_ntt.py; bit-exact, benched not-faster -
DESIGN.md section 11).

Everything stays chunked (lists of arrays); the only full-size arrays
are the mid-level buffer and the level-1 output/cells. Fence policy
(every dispatch+drain fence is a ~78 ms round-trip on the tunneled
chip): stage-A chunks can be group-fenced, stage-B pacing fences drop
entirely when everything fits HBM (light_fences), and callers may evict
each cells block after extracting its columns (evict_cells) - see
DESIGN.md section 12 for the measured effect of each.

The caller encrypts the input in J-CHUNK order: chunk jc holds cells
(i, j) for j in [jc*cw, (jc+1)*cw), i-major (see bench.py).
"""

from __future__ import annotations

import numpy as np

from .. import jaxcfg  # noqa: F401
import jax
import jax.numpy as jnp

from ..core.field import PrimeField
from ..ops.devsync import sync
from ..core.ntt import sqrt_factor, twiddle_matrix
from ..ops.sha256_jax import sha256_leaves_striped
from .backend import BgvBackend, CtBatch
from .hntt import _HNttCtx, _hntt_inner, ligero_ntt_scales
from .hsched import apply_schedule_auto, apply_schedule_full_auto, \
    record_schedule, unit_schedule

_CACHE: dict = {}
_AOT_SWAPPED: set = set()


def _aot_swap(key, tag, sds) -> None:
    """Replace _CACHE[key] (a jitted program) with its AOT-compiled
    executable for the given input ShapeDtypeStructs — loaded from the
    on-disk executable store when LUMENOS_AOT_DIR holds it (no XLA
    work), compiled-and-persisted otherwise (ops/aot.py). No-op cost
    beyond .lower().compile() when the store is unconfigured."""
    if key in _AOT_SWAPPED:
        return
    from ..ops.aot import aot_dir, compile_or_load
    out = compile_or_load(tag, _CACHE[key], *sds)
    if aot_dir() is not None:
        # only swap the cached jit for the fixed-shape executable when a
        # store is configured: default behavior stays byte-for-byte the
        # old .lower().compile() warm-up (a jit serves any shape; a
        # Compiled serves exactly one)
        _CACHE[key] = out
    _AOT_SWAPPED.add(key)


def _params_tag(backend) -> str:
    """Cross-process-stable fingerprint of the parameter set (the
    in-process caches key on id(backend); the AOT store must not)."""
    import hashlib
    qs = tuple(int(q) for q in backend.params.q_primes)
    return hashlib.sha256(repr((qs, backend.params.n, backend.params.t))
                          .encode()).hexdigest()[:10]


def _hbm_budget() -> float:
    """Usable HBM bytes for the staged-encode chunk heuristics: the
    LUMENOS_HBM_BUDGET env override when set (it always wins), else the
    device's reported bytes_limit when the runtime exposes it, else 15 GB
    (v5e). ADVICE r3: the previous hardcoded 15e9 mis-sized chunks on
    chips with different memory."""
    import os
    env = os.environ.get("LUMENOS_HBM_BUDGET")
    if env:
        return float(env)
    try:
        stats = jax.local_devices()[0].memory_stats()
        limit = stats.get("bytes_limit") if stats else None
        if limit:
            return float(limit)
    except Exception:
        pass
    return 15.0e9


def _mxu_enabled() -> bool:
    """Default policy for the MXU matmul transform (ops/mxu_ntt.py):
    LUMENOS_MXU_NTT=1/0 forces it; with the env unset it is on only on
    TPU once the on-chip validation marker exists (committed after a
    hardware PASS, same convention as the Pallas rescale chain)."""
    import os
    env = os.environ.get("LUMENOS_MXU_NTT")
    if env is not None:
        return env == "1"
    if jax.default_backend() == "cpu":
        return False
    return os.path.exists(os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".mxu_ntt_ok"))


def _stage_a_transform(backend, field, n1: int, cw: int, level: int,
                       mxu: bool):
    """Traced group transform for stage A: chunk [n1, cw, 2, L, N] ->
    transformed [n1, cw, 2, L, N] (same level; caller rescales). The MXU
    and schedule paths are bit-identical (tests/test_mxu_ntt.py)."""
    q, _, _ = backend.params.limb_consts(level)
    if mxu:
        from ..ops.mxu_ntt import matmul_transform, unit_stage_tables
        W8, D, red = unit_stage_tables(field, n1, q)

        def tf(chunk):
            n = chunk.shape[-1]
            L = chunk.shape[-2]
            xt = jnp.transpose(chunk, (3, 0, 1, 2, 4)).reshape(
                L, n1, cw * 2 * n)
            out = matmul_transform(xt, W8, q, D, red)
            out = out.reshape(L, n1, cw, 2, n)
            return jnp.transpose(out, (1, 2, 3, 0, 4))
        return tf

    sched = unit_schedule(field, n1, cw * n1)
    res = sched.residues([int(x) for x in q])

    def tf(chunk):
        c = jnp.swapaxes(chunk, 0, 1)               # [cw, n1, ...]
        flat = c.reshape((cw * n1,) + c.shape[2:])
        out = apply_schedule_full_auto(flat, sched, res, q)
        o = out.reshape((cw, n1) + out.shape[1:])
        return jnp.swapaxes(o, 0, 1)
    return tf


def _stage_a_fn(backend, field, n1: int, cw: int, level: int, mid_level: int,
                mxu: bool = False, sds=None):
    key = ("A", id(backend), field.modulus, field.n, n1, cw, level,
           mid_level, mxu)
    if key not in _CACHE:
        tf = _stage_a_transform(backend, field, n1, cw, level, mxu)

        def impl(chunk):  # [n1, cw, 2, L, N] -> [n1, cw, 2, Lm, N]
            out = tf(chunk)
            return backend.rescale_to(
                CtBatch(data=out, level=level), mid_level).data
        _CACHE[key] = jax.jit(impl, donate_argnums=(0,))
    if sds is not None:
        _aot_swap(key, f"stA-{_params_tag(backend)}-{n1}x{cw}-"
                  f"{level}to{mid_level}-mxu{int(mxu)}", sds)
    return _CACHE[key]


def _stage_a_prod_fn(backend, field, n1: int, cw: int, level: int,
                     mid_level: int, n1h: int, prod_level: int,
                     mxu: bool = False, sds=None):
    """Stage A fused with the products-level derivation: ONE program per
    chunk returns (mid-level transform output, prod-level rescale of the
    matrix rows i < n1h). Replaces the separate ProductsSink dispatches
    (eager slice + extract + sync per chunk) on the single-pass path."""
    key = ("AP", id(backend), field.modulus, field.n, n1, cw, level,
           mid_level, n1h, prod_level, mxu)
    if key not in _CACHE:
        tf = _stage_a_transform(backend, field, n1, cw, level, mxu)

        def impl(chunk):  # [n1, cw, 2, L, N]
            pr = backend.rescale_to(
                CtBatch(data=chunk[:n1h].reshape((n1h * cw,)
                                                 + chunk.shape[2:]),
                        level=level), prod_level)
            pp = pr.data.reshape((n1h, cw) + pr.data.shape[1:])
            out = tf(chunk)
            out = backend.rescale_to(
                CtBatch(data=out, level=level), mid_level).data
            return out, pp
        _CACHE[key] = jax.jit(impl, donate_argnums=(0,))
    if sds is not None:
        _aot_swap(key, f"stAP-{_params_tag(backend)}-{n1}x{cw}-"
                  f"{level}to{mid_level}-p{n1h}x{prod_level}-mxu{int(mxu)}",
                  sds)
    return _CACHE[key]


def _stage_b_fn(backend, field, n2: int, cw: int, mid_level: int,
                mxu: bool = False):
    """ONE compiled program for every row chunk. Schedule path: per-row
    cofactor residues are inputs (w/ws [cw, nl, n2, L]), the pairing is a
    shared constant. MXU path (ops/mxu_ntt.py): each row's exact per-limb
    matrix enters as a device-resident int8 digit-table slice
    w8 [cw, Lm, D*n2, D*n2] — still exactly one program per row-chunk
    shape."""
    key = ("B", id(backend), field.modulus, field.n, n2, cw, mid_level,
           mxu)
    if key not in _CACHE:
        q, _, _ = backend.params.limb_consts(mid_level)
        if mxu:
            from ..ops.mxu_ntt import (matmul_transform_rows, n_digits,
                                       reduce_consts)
            D = n_digits(q)
            red = reduce_consts(q)

            def impl(chunk, w8):  # chunk [cw, n2, 2, Lm, N]
                n = chunk.shape[-1]
                Lm = chunk.shape[-2]
                x = jnp.transpose(chunk, (3, 0, 1, 2, 4)).reshape(
                    Lm, cw, n2, 2 * n)
                out = matmul_transform_rows(x, w8, q, D, red)
                out = out.reshape(Lm, cw, n2, 2, n)
                out = jnp.transpose(out, (1, 2, 3, 0, 4))
                return backend.rescale_to(
                    CtBatch(data=out, level=mid_level), 1).data
            _CACHE[key] = jax.jit(impl, donate_argnums=(0,))
            return _CACHE[key]
        sched = unit_schedule(field, n2, cw * n2)  # pairing is scale-indep.
        fpos = np.asarray(sched.final_pos)
        nl = sched.n_layers

        def impl(chunk, w, ws):  # chunk [cw, n2, 2, Lm, N]
            x = chunk.reshape((cw * n2,) + chunk.shape[2:])
            wall = jnp.transpose(w, (1, 0, 2, 3)).reshape(nl, cw * n2, -1)
            wsall = jnp.transpose(ws, (1, 0, 2, 3)).reshape(nl, cw * n2, -1)
            out = apply_schedule_auto(x, sched, wall, wsall, q)[fpos]
            out = backend.rescale_to(
                CtBatch(data=out, level=mid_level), 1).data
            return out.reshape((cw, n2) + out.shape[1:])
        _CACHE[key] = jax.jit(impl, donate_argnums=(0,))
    return _CACHE[key]


def _finalize_fn(size: int, n: int, sds=None):
    key = ("F", size, n)
    if key not in _CACHE:
        def impl(o):  # [n1, n2, 2, 2, N] -> (flat [size,2,2,N], digests)
            flat = jnp.swapaxes(o, 0, 1).reshape(size, 2, 2, n)
            leaves = flat.reshape(size, -1)
            digests = sha256_leaves_striped(leaves, leaves.shape[1] * 8)
            return flat, digests
        _CACHE[key] = jax.jit(impl, donate_argnums=(0,))
    if sds is not None:
        _aot_swap(key, f"fin-{size}x{n}", sds)
    return _CACHE[key]


class StagedEncode:
    """Orchestration + host scale bookkeeping for one (size, level) config.

    Attribute ``light_fences`` (default False): skip the per-stage-B-block
    pacing fences (each a ~78 ms tunnel round-trip) and let the device
    queue all stage-B dispatches — safe ONLY when the whole mid buffer,
    all cells blocks and program temps fit HBM simultaneously (the caller
    checks; small configs). Values are identical either way."""

    def __init__(self, backend: BgvBackend, field: PrimeField, size: int,
                 start_level: int, mid_level: int = 5,
                 chunk_a: int = 16, chunk_b: int = 16,
                 use_mxu: bool | None = None):
        self.backend = backend
        self.field = field
        self.size = size
        self.n1 = sqrt_factor(size)
        self.n2 = size // self.n1
        self.level = start_level
        # mid level must sit strictly inside the chain (small parameter
        # sets have fewer limbs than the default mid of 5)
        self.mid = max(1, min(mid_level, start_level - 1))
        self.chunk_a = min(chunk_a, self.n2)
        self.chunk_b = min(chunk_b, self.n1)
        t = field.modulus

        # scale bookkeeping (host, exact): stage A output scales per i,
        # twiddle layer, per-row stage-B input scales
        sa = ligero_ntt_scales(t, field.n, self.n1)
        sc = np.empty((self.n1, self.n2), dtype=object)
        for i in range(self.n1):
            sc[i, :] = sa[i]
        tw = twiddle_matrix(field, size)
        for i in range(1, self.n1):
            for j in range(1, self.n2):
                sc[i, j] = int(sc[i, j]) * pow(int(tw[i, j]) % t, t - 2, t) % t
        self.sc_mid = sc
        # per-row stage-B schedules: identical pairing, per-row cofactors
        q_mid, _, _ = backend.params.limb_consts(self.mid)
        primes_mid = [int(x) for x in q_mid]
        final = np.empty((self.n1, self.n2), dtype=object)
        self._row_res = []          # per row: (wa, wsa, wb, wsb)
        for i in range(self.n1):
            sr = record_schedule(field, self.n2, init_scales=sc[i])
            self._row_res.append(sr.residues(primes_mid))
            final[i] = sr.final_scales
        # reference flat order: position p = j*n1 + i
        self.final_scales = np.array(final.T.reshape(-1).tolist(), dtype=object)

        self.use_mxu = _mxu_enabled() if use_mxu is None else use_mxu
        if self.use_mxu:
            try:
                self._ensure_mxu()
            except ValueError as e:  # pragma: no cover - defensive
                import sys
                print(f"staged: MXU transform disabled ({e}); "
                      f"falling back to the schedule executor",
                      file=sys.stderr)
                self.use_mxu = False

    def _ensure_mxu(self) -> None:
        """Probe the stage-B per-row matrices and build their int8 digit
        tables, device-resident (one upload at setup; stage-B programs
        take the row-chunk slice as a traced input). The per-limb maps do
        not factor through a shared matrix (mxu_ntt.py docstring), so the
        tables are per-row: [n1, Lm, D*n2, D*n2] int8."""
        from ..ops.mxu_ntt import build_digit_tables, probe_row_matrices
        q_mid, _, _ = self.backend.params.limb_consts(self.mid)
        M = probe_row_matrices(self.field, self.n2, self._row_res, q_mid)
        W8, _ = build_digit_tables(M, q_mid)
        self.mxu_table_bytes = W8.nbytes
        self._mxu_w8_dev = jnp.asarray(W8)   # [n1, Lm, D*n2, D*n2] int8

    def _row_chunk_res(self, i0: int, cw: int):
        """Stacked cofactor inputs for rows i0..i0+cw-1: 2 x [cw, nl, n2, L]."""
        return tuple(np.stack([self._row_res[i0 + r][k] for r in range(cw)])
                     for k in range(2))

    def _row_args(self, i0: int, cw: int):
        """Stage-B per-row-chunk traced inputs for the active transform
        path: (w, ws) stacked residues (schedule) or the device-resident
        int8 table slice (MXU; device-side slice, no re-upload)."""
        if not self.use_mxu:
            return self._row_chunk_res(i0, cw)
        return (self._mxu_w8_dev[i0:i0 + cw],)

    def _row_args_sds(self, cw: int):
        """ShapeDtypeStructs matching _row_args (AOT precompilation)."""
        import jax as _jax
        u64 = jnp.uint64
        Lm = self.mid + 1
        if not self.use_mxu:
            nl = unit_schedule(self.field, self.n2, self.n2).n_layers
            w = _jax.ShapeDtypeStruct((cw, nl, self.n2, Lm), u64)
            return w, w
        ds = self._mxu_w8_dev.shape[2]
        return (_jax.ShapeDtypeStruct((cw, Lm, ds, ds), jnp.int8),)

    # -- compile everything with dummy shapes (no big buffers live) --------

    def precompile(self) -> None:
        n = self.backend.n
        L = self.level + 1
        Lm = self.mid + 1
        u64 = jnp.uint64
        import jax as _jax
        _stage_a_fn(self.backend, self.field, self.n1, self.chunk_a,
                    self.level, self.mid, self.use_mxu, sds=(
            _jax.ShapeDtypeStruct((self.n1, self.chunk_a, 2, L, n), u64),))
        cw = self.chunk_b
        _stage_b_fn(self.backend, self.field, self.n2, cw, self.mid,
                    self.use_mxu).lower(
            _jax.ShapeDtypeStruct((cw, self.n2, 2, Lm, n), u64),
            *self._row_args_sds(cw)).compile()
        _finalize_fn(self.size, n, sds=(
            _jax.ShapeDtypeStruct((self.n1, self.n2, 2, 2, n), u64),))

    # -- execution ---------------------------------------------------------

    def _run_stage_b(self, small):
        """[n1, n2, 2, Lm, N] mid buffer -> [n1, n2, 2, 2, N] cells."""
        import os
        import time as _time
        t0 = _time.perf_counter()
        outs = []
        for i0 in range(0, self.n1, self.chunk_b):
            cw = min(self.chunk_b, self.n1 - i0)
            fb = _stage_b_fn(self.backend, self.field, self.n2, cw,
                             self.mid, self.use_mxu)
            ob = fb(small[i0:i0 + cw], *self._row_args(i0, cw))
            sync(ob)
            outs.append(ob)
        cells = jnp.concatenate(outs, axis=0)
        sync(cells)
        if os.environ.get("LUMENOS_STAGED_PROFILE"):
            import sys
            print(f"[staged] stage B: {_time.perf_counter() - t0:.2f}s",
                  file=sys.stderr)
        return cells

    def run_streaming(self, make_chunk, n_chunks: int,
                      prod_cfg: tuple | None = None):
        """Memory-minimal execution: obtain each stage-A input chunk
        just-in-time from `make_chunk(jc)` (e.g. encrypt-on-demand), so at
        most ONE input chunk is device-resident next to the mid buffers.
        Returns (CtBatch, digests, scales, device_seconds[, prod_data])
        where device_seconds counts only the transform/digest device calls
        (chunk production is the client's encryption, not server work).

        prod_cfg=(n1h, prod_level): fused single-read products-level
        derivation — same semantics as run_streaming_cells(prod_cfg=...):
        the stage-A program also emits the prod-level rescale of the
        matrix rows and the assembled [n1h*n2, 2, prod_level+1, N] array
        is returned as a fifth element."""
        import time as _time
        backend = self.backend
        t_dev = 0.0
        Lm = self.mid + 1
        n = backend.n
        if prod_cfg is not None:
            n1h, prod_level = prod_cfg
            fa = _stage_a_prod_fn(backend, self.field, self.n1,
                                  self.chunk_a, self.level, self.mid,
                                  n1h, prod_level, self.use_mxu)
            prod_buf = jnp.zeros(
                (n1h, self.n2, 2, prod_level + 1, n), jnp.uint64)
            upd_prod = _CACHE.setdefault(
                ("UPDP", self.size, n1h, prod_level, n, self.chunk_a),
                jax.jit(lambda b, c, j0: jax.lax.dynamic_update_slice(
                    b, c, (0, j0, 0, 0, 0)), donate_argnums=(0,)))
        else:
            fa = _stage_a_fn(backend, self.field, self.n1, self.chunk_a,
                             self.level, self.mid, self.use_mxu)
        small = jnp.zeros((self.n1, self.n2, 2, Lm, n), dtype=jnp.uint64)
        upd = _CACHE.setdefault(
            ("upd", self.size, Lm, n, self.chunk_a),
            jax.jit(lambda b, c, j0: jax.lax.dynamic_update_slice(
                b, c, (0, j0, 0, 0, 0)), donate_argnums=(0,)))
        import os
        import sys
        prof = os.environ.get("LUMENOS_STAGED_PROFILE")
        for k in range(n_chunks):
            chunk = make_chunk(k)
            sync(chunk)
            t0 = _time.perf_counter()
            if prod_cfg is not None:
                out, pp = fa(chunk)
                prod_buf = upd_prod(prod_buf, pp, k * self.chunk_a)
            else:
                out = fa(chunk)
            small = upd(small, out, k * self.chunk_a)
            sync(small)
            t_dev += _time.perf_counter() - t0
            del chunk, out
        if prof:
            print(f"[staged] stage A total: {t_dev:.2f}s", file=sys.stderr)
        t0 = _time.perf_counter()
        cells = self._run_stage_b(small)
        del small
        t1 = _time.perf_counter()
        flat, digests = _finalize_fn(self.size, backend.n)(cells)
        sync(flat)
        if prof:
            print(f"[staged] finalize+digests: "
                  f"{_time.perf_counter() - t1:.2f}s", file=sys.stderr)
        t_dev += _time.perf_counter() - t0
        if prod_cfg is not None:
            prod_data = prod_buf.reshape(
                prod_buf.shape[0] * self.n2, *prod_buf.shape[2:])
            return (CtBatch(data=flat, level=1), digests,
                    self.final_scales, t_dev, prod_data)
        return CtBatch(data=flat, level=1), digests, self.final_scales, t_dev

    # -- cells-layout streaming (the LogN=14 / 16384x4096 memory shape) ---
    #
    # run_streaming materializes the level-1 output in reference order,
    # which costs a full permutation copy (2x the output) on top of the
    # whole mid buffer - fine at 8192 (~2 GB output), fatal at 16384
    # (~8.6 GB output + ~13 GB mid vs 15.75 GB HBM). This mode:
    #   - keeps the mid buffer as n_blocks SEPARATE i-blocks, freed one
    #     by one as stage B consumes them;
    #   - never materializes the flat reference-order output: the result
    #     stays in [i, j] cell layout (a list of i-blocks) and the leaf
    #     digests are permuted to reference order on the host (32 B each);
    #   - queried columns gather straight from the cell blocks
    #     (gather_positions), so no consumer needs the flat copy.

    def _stage_bd_fn(self, bw: int, sds=None):
        """Stage B + on-device leaf digests for one i-block."""
        key = ("BD", id(self.backend), self.field.modulus, self.field.n,
               self.n2, bw, self.mid, self.use_mxu)
        if key not in _CACHE:
            fb = _stage_b_fn(self.backend, self.field, self.n2, bw,
                             self.mid, self.use_mxu)
            n = self.backend.n

            def impl(chunk, *row_args):
                cells = fb(chunk, *row_args)      # [bw, n2, 2, 2, N]
                leaves = cells.reshape(bw * self.n2, -1)
                digests = sha256_leaves_striped(leaves, leaves.shape[1] * 8)
                return cells, digests
            _CACHE[key] = jax.jit(impl, donate_argnums=(0,))
        if sds is not None:
            _aot_swap(key, f"stBD-{_params_tag(self.backend)}-"
                      f"{bw}x{self.n2}-m{self.mid}-mxu{int(self.use_mxu)}",
                      sds)
        return _CACHE[key]

    def _bd_cw(self, bw: int) -> int:
        """Stage-B sub-chunk rows: while the whole mid buffer is still
        live (~12.9 GB at LogN=14), the per-call program footprint
        (input copy + ~4.5x HLO temps + the cells output block) must fit
        the remaining HBM. Whole-block when it fits, else the largest
        power-of-two row count that does."""
        mid_total = self.size * 2 * (self.mid + 1) * self.backend.n * 8
        row = self.n2 * 2 * (self.mid + 1) * self.backend.n * 8
        cells_blk = self.n2 * bw * 2 * 2 * self.backend.n * 8
        extra = (getattr(self, "extra_resident_bytes", 0)
                 + getattr(self, "mxu_table_bytes", 0))
        avail = _hbm_budget() - mid_total - cells_blk - extra
        if avail >= 5.5 * row * bw:
            return bw
        cw = max(1, min(bw, int(avail / (5.5 * row))))
        while cw & (cw - 1):
            cw &= cw - 1
        return cw

    def _bd_cw_ladder(self, bw: int, n_blocks: int,
                      evict: bool) -> list:
        """Per-block stage-B sub-chunk widths: block b runs with
        (n_blocks - b) mid blocks still resident and, unless the caller
        evicts cells after its on_block callback, b finished cells
        blocks accumulated — so later blocks afford wider sub-chunks
        (fewer ~78 ms pacing fences). Same 5.5x program-liveness model
        as _bd_cw."""
        mid_blk = bw * self.n2 * 2 * (self.mid + 1) * self.backend.n * 8
        cells_blk = self.n2 * bw * 2 * 2 * self.backend.n * 8
        row = self.n2 * 2 * (self.mid + 1) * self.backend.n * 8
        extra = (getattr(self, "extra_resident_bytes", 0)
                 + getattr(self, "mxu_table_bytes", 0))
        out = []
        for b in range(n_blocks):
            avail = (_hbm_budget() - (n_blocks - b) * mid_blk
                     - (1 + (0 if evict else b)) * cells_blk - extra)
            cw = max(1, min(bw, int(avail / (5.5 * row))))
            while cw & (cw - 1):
                cw &= cw - 1
            out.append(cw)
        return out

    def _bd_slice_upd(self, bw: int, cw: int):
        """(slice, update) programs for sub-chunked stage B over a block."""
        Lm = self.mid + 1
        n = self.backend.n
        key = ("BDS", self.size, bw, cw, Lm, n)
        if key not in _CACHE:
            sl = jax.jit(lambda blk, r0: jax.lax.dynamic_slice_in_dim(
                blk, r0, cw, 0))
            upd = jax.jit(lambda buf, c, r0: jax.lax.dynamic_update_slice(
                buf, c, (r0, 0, 0, 0, 0)), donate_argnums=(0,))
            _CACHE[key] = (sl, upd)
        return _CACHE[key]

    def _run_bd_block(self, blk, b: int, bw: int, cw: int):
        """Stage B + digests for mid block b, in cw-row sub-chunks.
        Returns (cells_b [bw, n2, 2, 2, N], DEVICE digest arrays list) —
        digests stay on device; the caller folds all blocks' digests
        into ONE device concat + ONE host transfer (each per-sub-chunk
        np.asarray was a ~120 ms small-transfer round-trip; the pacing
        fence is a tiny sync instead)."""
        assert bw % cw == 0, (
            f"stage-B sub-chunk {cw} must divide block rows {bw}: a "
            f"non-divisor clamps the last dynamic slice while the "
            f"cofactors advance unclamped, mismatching rows (ADVICE r3)")
        if cw >= bw:
            cells_b, dig_b = self._stage_bd_fn(bw)(
                blk, *self._row_args(b * bw, bw))
            if not getattr(self, "light_fences", False):
                sync(cells_b)
            return cells_b, [dig_b]
        sl, upd = self._bd_slice_upd(bw, cw)
        fbd = self._stage_bd_fn(cw)
        n = self.backend.n
        cells_b = jnp.zeros((bw, self.n2, 2, 2, n), jnp.uint64)
        digs = []
        for r0 in range(0, bw, cw):
            sub = sl(blk, r0)
            cell_s, dig_s = fbd(sub, *self._row_args(b * bw + r0, cw))
            digs.append(dig_s)
            cells_b = upd(cells_b, cell_s, r0)
            if not getattr(self, "light_fences", False):
                sync(cells_b)                       # pacing fence (tiny)
            del sub, cell_s
        return cells_b, digs

    def _scatter_fn(self, bw: int, n_blocks: int, Lm: int):
        """Per-block programs splitting a stage-A output across the mid
        blocks. One program updating all n_blocks at once presents every
        block as input AND output; the TPU compiler's HBM estimate does
        not credit donation aliasing, so at LogN=14 it rejects the
        program outright (20.25G estimated vs 15.75G). Per-block updates
        keep each program's footprint at one block (donated in-place at
        run time) plus the chunk slice."""
        key = ("SC", self.size, bw, n_blocks, Lm, self.backend.n,
               self.chunk_a)
        if key not in _CACHE:
            def mk(b):
                def impl(out, j0, blk):
                    return jax.lax.dynamic_update_slice(
                        blk, out[b * bw:(b + 1) * bw], (0, j0, 0, 0, 0))
                return jax.jit(impl, donate_argnums=(2,))
            fns = [mk(b) for b in range(n_blocks)]

            def scatter(out, j0, *blocks):
                return [scatter.fns[b](out, j0, blocks[b])
                        for b in range(n_blocks)]
            scatter.fns = fns
            _CACHE[key] = scatter
        return _CACHE[key]

    def _scatter_aot(self, bw: int, n_blocks: int, Lm: int,
                     out_sd, blk_sd) -> None:
        """AOT-compile/load the per-block scatter programs in place."""
        scatter = self._scatter_fn(bw, n_blocks, Lm)
        from ..ops.aot import aot_dir, compile_or_load
        akey = ("SCaot", self.size, bw, n_blocks, Lm, self.backend.n,
                self.chunk_a)
        if akey in _AOT_SWAPPED:
            return
        tagbase = (f"scat-{_params_tag(self.backend)}-{self.size}-"
                   f"{bw}x{n_blocks}-{Lm}-{self.chunk_a}")
        out = [compile_or_load(f"{tagbase}-b{b}", scatter.fns[b],
                               out_sd, 0, blk_sd)
               for b in range(n_blocks)]
        if aot_dir() is not None:   # see _aot_swap
            scatter.fns = out
        _AOT_SWAPPED.add(akey)

    def ref_to_cell_perm(self) -> np.ndarray:
        """digest_ref[p] = digest_cells[perm[p]] (cells are i-major)."""
        p = np.arange(self.size)
        return (p % self.n1) * self.n2 + p // self.n1

    def _gather_cells_fn(self, n_blocks: int):
        """One-program queried-column gather over the cell blocks.

        A per-position eager slice loop costs one tunnel round-trip per
        query (~306 dispatches); this is a single jitted program: each
        block contributes a static-shape [q]-row gather (clamped indices)
        and a lane select folds the per-block results together."""
        bw = self.n1 // n_blocks
        key = ("GC", id(self.backend), self.size, bw, n_blocks)
        if key not in _CACHE:
            n1 = self.n1

            def impl(pos, *blocks):
                i = pos % n1
                j = pos // n1
                blk = i // bw
                row = i % bw
                out = jnp.zeros((pos.shape[0],) + blocks[0].shape[2:],
                                blocks[0].dtype)
                for b in range(n_blocks):
                    hit = blk == b
                    sel = blocks[b][jnp.where(hit, row, 0),
                                    jnp.where(hit, j, 0)]
                    out = jnp.where(hit[:, None, None, None], sel, out)
                return out
            _CACHE[key] = jax.jit(impl)
        return _CACHE[key]

    def block_gather_fn(self, bw: int, k: int):
        """Jitted (cells_b [bw, n2, 2, 2, N], rows [k] i32, js [k] i32)
        -> [k, 2, 2, N]: the queried columns living in ONE stage-B block.
        Lets the caller start their device->host transfer as soon as the
        block lands (query indices depend only on transcript state, which
        never absorbs the root — reference fhe/ligero.go:199)."""
        key = ("BG", id(self.backend), self.size, bw, k)
        if key not in _CACHE:
            _CACHE[key] = jax.jit(lambda cb, ri, ji: cb[ri, ji])
        return _CACHE[key]

    def gather_positions(self, cells_blocks: list, positions) -> "jnp.ndarray":
        """Reference-order positions -> [k, 2, 2, N] level-1 cts."""
        fn = self._gather_cells_fn(len(cells_blocks))
        pos = jnp.asarray(np.asarray(positions, dtype=np.int32))
        return fn(pos, *cells_blocks)

    def precompile_cells(self, n_blocks: int, n_queries: int | None = None,
                         prod_cfg: tuple | None = None,
                         evict_cells: bool = False) -> None:
        """AOT-compile the cells-mode programs before big buffers exist."""
        import jax as _jax
        n = self.backend.n
        L = self.level + 1
        Lm = self.mid + 1
        u64 = jnp.uint64
        bw = self.n1 // n_blocks
        chunk_sd = _jax.ShapeDtypeStruct(
            (self.n1, self.chunk_a, 2, L, n), u64)
        if prod_cfg is not None:
            n1h, prod_level = prod_cfg
            _stage_a_prod_fn(self.backend, self.field, self.n1,
                             self.chunk_a, self.level, self.mid,
                             n1h, prod_level, self.use_mxu,
                             sds=(chunk_sd,))
            upd_prod = _CACHE.setdefault(
                ("UPDP", self.size, n1h, prod_level, n, self.chunk_a),
                jax.jit(lambda b, c, j0: jax.lax.dynamic_update_slice(
                    b, c, (0, j0, 0, 0, 0)), donate_argnums=(0,)))
            upd_prod.lower(
                _jax.ShapeDtypeStruct((n1h, self.n2, 2, prod_level + 1, n),
                                      u64),
                _jax.ShapeDtypeStruct((n1h, self.chunk_a, 2, prod_level + 1,
                                       n), u64), 0).compile()
        else:
            _stage_a_fn(self.backend, self.field, self.n1, self.chunk_a,
                        self.level, self.mid, self.use_mxu,
                        sds=(chunk_sd,))
        blk = _jax.ShapeDtypeStruct((bw, self.n2, 2, Lm, n), u64)
        out_sd = _jax.ShapeDtypeStruct((self.n1, self.chunk_a, 2, Lm, n), u64)
        self._scatter_aot(bw, n_blocks, Lm, out_sd, blk)
        for cw in sorted(set(self._bd_cw_ladder(bw, n_blocks,
                                                evict_cells))):
            if cw >= bw:
                self._stage_bd_fn(bw, sds=(blk,) + self._row_args_sds(bw))
                continue
            sl, upd = self._bd_slice_upd(bw, cw)
            sub = _jax.ShapeDtypeStruct((cw, self.n2, 2, Lm, n), u64)
            sl.lower(blk, 0).compile()
            self._stage_bd_fn(cw, sds=(sub,) + self._row_args_sds(cw))
            cbuf = _jax.ShapeDtypeStruct((bw, self.n2, 2, 2, n), u64)
            csub = _jax.ShapeDtypeStruct((cw, self.n2, 2, 2, n), u64)
            upd.lower(cbuf, csub, 0).compile()
        if n_queries is not None:
            out_blk = _jax.ShapeDtypeStruct((bw, self.n2, 2, 2, n), u64)
            self._gather_cells_fn(n_blocks).lower(
                _jax.ShapeDtypeStruct((n_queries,), jnp.int32),
                *([out_blk] * n_blocks)).compile()

    def run_streaming_cells(self, make_chunk, n_chunks: int,
                            n_blocks: int = 4, bd_cw: int | None = None,
                            on_block=None, prod_sink=None,
                            prod_cfg: tuple | None = None,
                            fence_group: int = 1,
                            evict_cells: bool = False):
        """Returns (cells_blocks, digests_ref [size,8] u32 on host,
        final_scales, device_seconds[, prod_data]). Bit-identical content
        to run_streaming (tests/test_staged.py cross-checks).

        on_block(b, cells_b): called as each stage-B block's cells land —
        lets the caller start the queried-column device->host transfer
        while the remaining blocks (and everything after) still compute.
        Its dispatch cost counts toward device_seconds.

        prod_sink(jc, chunk): called on each RAW stage-A input chunk
        before the transform consumes (donates) it — single-pass
        products-level matrix derivation (rescale of the received
        encode-level cts, fhe/ligero.py ProductsSink) without a second
        pass over the chunk stream. The sink times its own device work;
        it is NOT included in device_seconds here. CONTRACT: the sink
        must fence (sync) every device read of `chunk` before returning —
        stage A donates the chunk buffer on the next line, so a sink that
        defers device work would read an invalidated buffer
        (ProductsSink syncs its update internally; a custom sink must
        do the same).

        prod_cfg=(n1h, prod_level): FUSED single-pass derivation — the
        stage-A program itself also emits the prod-level rescale of the
        matrix rows (one program per chunk, no extra dispatches); the
        assembled [n1h*n2, 2, prod_level+1, N] array is returned as a
        fifth element and its time is inside device_seconds. Mutually
        exclusive with prod_sink.

        evict_cells: drop each cells block right after its on_block
        callback returns — the caller asserts it has extracted what it
        needs (e.g. gathered its queried columns). The freed HBM lets
        LATER blocks run wider stage-B sub-chunks (_bd_cw_ladder), and
        the returned cells_blocks list holds None. Memory-tight configs
        only; requires on_block.

        fence_group: stage-A chunks per timed fence. Each fence is one
        tunnel round-trip (~78 ms measured); grouping amortizes it while
        staying HONEST about server time — a group's chunks are ALL
        produced (client encrypt, untimed) before its timed segment
        dispatches their transforms and drains the device, so no server
        work can hide under untimed client windows. Memory cost: up to
        fence_group input chunks device-resident at once (the caller
        sizes it against HBM headroom; default 1 = previous behavior)."""
        import time as _time
        backend = self.backend
        assert self.n1 % n_blocks == 0
        assert not (prod_sink is not None and prod_cfg is not None)
        bw = self.n1 // n_blocks
        Lm = self.mid + 1
        n = backend.n
        if prod_cfg is not None:
            n1h, prod_level = prod_cfg
            fa = _stage_a_prod_fn(backend, self.field, self.n1,
                                  self.chunk_a, self.level, self.mid,
                                  n1h, prod_level, self.use_mxu)
            prod_buf = jnp.zeros(
                (n1h, self.n2, 2, prod_level + 1, n), jnp.uint64)
            upd_prod = _CACHE.setdefault(
                ("UPDP", self.size, n1h, prod_level, n, self.chunk_a),
                jax.jit(lambda b, c, j0: jax.lax.dynamic_update_slice(
                    b, c, (0, j0, 0, 0, 0)), donate_argnums=(0,)))
        else:
            fa = _stage_a_fn(backend, self.field, self.n1, self.chunk_a,
                             self.level, self.mid, self.use_mxu)
        blocks = [jnp.zeros((bw, self.n2, 2, Lm, n), dtype=jnp.uint64)
                  for _ in range(n_blocks)]
        scat = self._scatter_fn(bw, n_blocks, Lm)
        import os
        import sys
        prof = os.environ.get("LUMENOS_STAGED_PROFILE")
        group = max(1, int(os.environ.get("LUMENOS_STAGED_GROUP",
                                          fence_group)))
        t_dev = 0.0
        k = 0
        while k < n_chunks:
            g = min(group, n_chunks - k)
            chunks = []
            for j in range(k, k + g):          # client encrypt (untimed)
                c = make_chunk(j)
                sync(c)
                chunks.append(c)
            if prod_sink is not None:
                # dispatched before fa donates the chunk buffers
                for j, c in zip(range(k, k + g), chunks):
                    prod_sink(j, c)
            t0 = _time.perf_counter()
            for j, c in zip(range(k, k + g), chunks):
                if prod_cfg is not None:
                    out, pp = fa(c)
                    prod_buf = upd_prod(prod_buf, pp, j * self.chunk_a)
                else:
                    out = fa(c)
                blocks = list(scat(out, j * self.chunk_a, *blocks))
                del out
            del chunks, c
            sync(blocks[-1])
            t_dev += _time.perf_counter() - t0
            k += g
        if prof:
            print(f"[staged] cells stage A: {t_dev:.2f}s "
                  f"({n_chunks} chunks x {self.chunk_a}, "
                  f"fence group {group})", file=sys.stderr)
        t0 = _time.perf_counter()
        cells_blocks = []
        dig_parts = []
        assert not (evict_cells and on_block is None), \
            "evict_cells without on_block would discard the only output"
        if bd_cw is not None:
            cws = [bd_cw] * n_blocks
        else:
            cws = self._bd_cw_ladder(bw, n_blocks, evict_cells)
        if prof:
            print(f"[staged] stage B: cws={cws} bw={bw} "
                  f"n_blocks={n_blocks} evict={evict_cells} "
                  f"hbm_budget={_hbm_budget():.2e} "
                  f"extra={getattr(self, 'extra_resident_bytes', 0):.2e}",
                  file=sys.stderr)
        for cw in set(cws):
            if cw < bw and bw % cw != 0:
                raise ValueError(
                    f"bd_cw={cw} must divide the block row count {bw} "
                    f"(n1={self.n1} / n_blocks={n_blocks})")
        for b in range(n_blocks):
            cells_b, dig_b = self._run_bd_block(blocks[b], b, bw, cws[b])
            dig_parts.extend(dig_b)                  # device arrays
            blocks[b] = None                         # free this mid block
            if on_block is not None:
                on_block(b, cells_b)
            if evict_cells:
                # the on_block gather's reads are queued before anything
                # that could overwrite; dropping the reference lets the
                # allocator reuse the block once that gather has run
                cells_blocks.append(None)
                del cells_b
            else:
                cells_blocks.append(cells_b)
        # ONE device concat + reference-order permute, kept ON DEVICE:
        # the d2h queue may hold the early queried-column transfers, so a
        # synchronous fetch here would wait behind ~81 MB of them; the
        # caller fetches (np.asarray / async copy) when it needs host
        # bytes, typically hidden under the products phase
        digests_ref = _CACHE.setdefault(
            ("DIGP", self.size),
            jax.jit(lambda parts, perm: jnp.concatenate(parts, axis=0)[perm])
        )(dig_parts, jnp.asarray(self.ref_to_cell_perm()))
        if getattr(self, "light_fences", False):
            # the per-block pacing fences were skipped; drain the queued
            # stage-B work now so device_seconds stays honest
            sync(digests_ref)
        if prof:
            print(f"[staged] cells stage B+digests: "
                  f"{_time.perf_counter() - t0:.2f}s", file=sys.stderr)
        t_dev += _time.perf_counter() - t0
        if prod_cfg is not None:
            # grid position p = i*n2 + j == matrix column index
            prod_data = prod_buf.reshape(
                prod_buf.shape[0] * self.n2, *prod_buf.shape[2:])
            return cells_blocks, digests_ref, self.final_scales, t_dev, \
                prod_data
        return cells_blocks, digests_ref, self.final_scales, t_dev

    # NOTE: run() (list-based) kept for tests; run_streaming is the
    # memory-minimal production path

    def run_sharded(self, full, mesh, axis: str = "ct"):
        """Multi-chip staged encode over a jax Mesh (VERDICT round-1 weak
        item: the production staged path had no multi-device test).

        `full`: [n1, n2, 2, L, N] input cells. Stage A's size-n1
        sub-transforms mix only across i, so the j (n2) axis shards
        cleanly; stage B's size-n2 row transforms mix only across j, so
        the i (n1) axis shards. The mid-buffer handoff between the two
        shardings is the six-step transpose exchange — GSPMD lowers the
        constraint change to an all-to-all over ICI (SURVEY.md 2.4 /
        core/ntt.go:70-97 structure).

        Returns (CtBatch level-1 in reference order, digests, scales) —
        bit-identical to run()/run_streaming on one device."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        backend = self.backend
        shard_j = NamedSharding(mesh, P(None, axis))
        shard_i = NamedSharding(mesh, P(axis))
        wa, wsa = tuple(np.stack([self._row_res[i][k]
                                  for i in range(self.n1)])
                        for k in range(2))

        key = ("SH", id(backend), self.field.modulus, self.field.n,
               self.size, self.level, self.mid, id(mesh))
        if key not in _CACHE:
            fa = _stage_a_fn(backend, self.field, self.n1, self.n2,
                             self.level, self.mid)
            fb = _stage_b_fn(backend, self.field, self.n2, self.n1,
                             self.mid)
            ff = _finalize_fn(self.size, backend.n)

            def impl(x, w, ws):
                mid = fa(x)                              # j-sharded
                mid = jax.lax.with_sharding_constraint(mid, shard_i)
                cells = fb(mid, w, ws)                   # i-sharded
                return ff(cells)

            _CACHE[key] = jax.jit(
                impl, in_shardings=(shard_j, None, None),
                out_shardings=None)
        # Multi-process safe placement: a committed single-device jax array
        # cannot be device_put onto a sharding that spans other processes'
        # devices, but a host (numpy) array can — each process supplies the
        # same global value and jax takes only its addressable shards
        # (parallel/dist.py host-mesh path). Single-process jax inputs keep
        # the zero-copy path.
        if isinstance(full, jax.Array):
            inp = jax.device_put(full.astype(jnp.uint64), shard_j)
            w_a, w_sa = jnp.asarray(wa), jnp.asarray(wsa)
        else:
            rep = NamedSharding(mesh, P())
            inp = jax.device_put(np.asarray(full, dtype=np.uint64), shard_j)
            w_a = jax.device_put(np.asarray(wa), rep)
            w_sa = jax.device_put(np.asarray(wsa), rep)
        flat, digests = _CACHE[key](inp, w_a, w_sa)
        return CtBatch(data=flat, level=1), digests, self.final_scales

    def run(self, j_chunks: list):
        """j_chunks: list of [n1, chunk_a, 2, L, N] device arrays (consumed).
        Returns (level-1 CtBatch in reference order, digests, final scales)."""
        backend = self.backend
        fa = _stage_a_fn(backend, self.field, self.n1, self.chunk_a,
                         self.level, self.mid)
        mids = []
        for k in range(len(j_chunks)):
            out = fa(j_chunks[k])
            sync(out)  # serialize: avoid stacked executable temps
            mids.append(out)
            j_chunks[k] = None
        small = jnp.concatenate(mids, axis=1)   # [n1, n2, 2, Lm, N]
        sync(small)
        del mids
        cells = self._run_stage_b(small)
        del small
        flat, digests = _finalize_fn(self.size, backend.n)(cells)
        return CtBatch(data=flat, level=1), digests, self.final_scales
