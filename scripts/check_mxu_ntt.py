"""Hardware validation + A/B timing for the MXU matmul transform.

Run on the real TPU (tunnel up, no other JAX process):

    python3 -u scripts/check_mxu_ntt.py

Validates the digit-decomposed int8 MXU formulation (ops/mxu_ntt.py)
bit-exactly against the recorded-schedule Pallas/VPU executor at the
production 8192x4096 stage geometry, then times both stage-A and stage-B
programs. On PASS + speedup it writes the .mxu_ntt_ok marker that flips
the staged-encode default to the MXU path on TPU (fhe/staged.py
_mxu_enabled).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from lumenos_tpu.ops.devsync import sync
from lumenos_tpu.core.field import GOLDILOCKS_57, PrimeField
from lumenos_tpu.fhe.backend import BgvBackend
from lumenos_tpu.fhe.hntt import min_start_level
from lumenos_tpu.fhe.params import generate_bgv_params_for_ntt
from lumenos_tpu.fhe.staged import StagedEncode, _stage_a_fn, _stage_b_fn


def rand_chunk(rng, qs, shape_head, n):
    """Random residues [*head, 2, L, N] valid per limb."""
    return jnp.asarray(np.stack(
        [rng.integers(0, int(q), shape_head + (2, n))
         for q in qs], axis=-2).astype(np.uint64))


def main() -> None:
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    t = GOLDILOCKS_57
    cols, log_n = 4096, 13
    params = generate_bgv_params_for_ntt(cols, log_n, t)
    backend = BgvBackend(params)
    field = PrimeField(t, cols * 2)
    lvl = min_start_level(params, cols * 2)
    n = params.n
    print(f"geometry: size={cols*2} LogN={log_n} start_level={lvl}",
          flush=True)

    t0 = time.time()
    st_m = StagedEncode(backend, field, cols * 2, lvl, use_mxu=True)
    print(f"StagedEncode(mxu) setup {time.time()-t0:.1f}s "
          f"(tables {getattr(st_m, 'mxu_table_bytes', 0)/1e6:.0f} MB)",
          flush=True)
    st_s = StagedEncode(backend, field, cols * 2, lvl, use_mxu=False)
    n1, n2, mid = st_m.n1, st_m.n2, st_m.mid
    ca = 8
    bw = 16
    qs_a = params.limb_consts(lvl)[0]
    qs_b = params.limb_consts(mid)[0]
    rng = np.random.default_rng(0)

    # ---- correctness at reduced N (fast compile, full group math) ------
    n_small = 512
    # params' tables are for N; build via raw fns at the same (n1, ca)
    xa = rand_chunk(rng, qs_a, (n1, ca), n_small)
    fa_s = _stage_a_fn(backend, field, n1, ca, lvl, mid, False)
    fa_m = _stage_a_fn(backend, field, n1, ca, lvl, mid, True)
    ra = np.asarray(fa_s(xa + jnp.uint64(0)))
    rb = np.asarray(fa_m(xa + jnp.uint64(0)))
    eq_a = np.array_equal(ra, rb)
    print(f"stage A bit-equal (N={n_small}): {eq_a}", flush=True)

    xb = rand_chunk(rng, qs_b, (bw, n2), n_small)
    fb_s = _stage_b_fn(backend, field, n2, bw, mid, False)
    fb_m = _stage_b_fn(backend, field, n2, bw, mid, True)
    st_m.use_mxu = False
    args_s = st_m._row_args(0, bw)
    st_m.use_mxu = True
    args_m = st_m._row_args(0, bw)
    rs = np.asarray(fb_s(xb + jnp.uint64(0), *args_s))
    rm = np.asarray(fb_m(xb + jnp.uint64(0), *args_m))
    eq_b = np.array_equal(rs, rm)
    print(f"stage B bit-equal (N={n_small}): {eq_b}", flush=True)
    if not (eq_a and eq_b):
        print("FAIL: mismatch", flush=True)
        sys.exit(1)

    # ---- timing at full production N -----------------------------------
    del xa, xb, ra, rb, rs, rm
    results = {}
    xa = rand_chunk(rng, qs_a, (n1, ca), n)
    cp = jax.jit(lambda v: v + jnp.uint64(0))
    for name, fn in (("A/sched", fa_s), ("A/mxu", fa_m)):
        sync(fn(cp(xa)))                       # compile+warm
        ts = time.time()
        reps = 3
        for _ in range(reps):
            sync(fn(cp(xa)))
        dt = (time.time() - ts) / reps
        results[name] = dt
        print(f"{name}: {dt:.3f} s/chunk ({xa.nbytes/2**30:.2f} GiB)",
              flush=True)
    del xa
    xb = rand_chunk(rng, qs_b, (bw, n2), n)
    for name, fn, args in (("B/sched", fb_s, args_s),
                           ("B/mxu", fb_m, args_m)):
        sync(fn(cp(xb), *args))
        ts = time.time()
        reps = 3
        for _ in range(reps):
            sync(fn(cp(xb), *args))
        dt = (time.time() - ts) / reps
        results[name] = dt
        print(f"{name}: {dt:.3f} s/block ({xb.nbytes/2**30:.2f} GiB)",
              flush=True)
    del xb

    n_chunks = n2 // ca
    n_blocks_t = n1 // bw
    tot_s = results["A/sched"] * n_chunks + results["B/sched"] * n_blocks_t
    tot_m = results["A/mxu"] * n_chunks + results["B/mxu"] * n_blocks_t
    print(f"projected encode core: sched {tot_s:.2f}s vs mxu {tot_m:.2f}s "
          f"({tot_s/max(tot_m,1e-9):.2f}x)", flush=True)

    if tot_m < tot_s:
        marker = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".mxu_ntt_ok")
        with open(marker, "w") as f:
            f.write(f"validated {time.strftime('%Y-%m-%d %H:%M:%S')} on "
                    f"{jax.default_backend()}; "
                    f"A {results['A/sched']:.3f}->{results['A/mxu']:.3f} "
                    f"B {results['B/sched']:.3f}->{results['B/mxu']:.3f} "
                    f"s\n")
        print(f"ALL OK - wrote {marker}", flush=True)
    else:
        print("correct but NOT faster - marker not written", flush=True)


if __name__ == "__main__":
    main()
