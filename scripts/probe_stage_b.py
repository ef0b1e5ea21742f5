"""Isolate stage B of the 8192x4096 staged encode on the real chip.

The 2026-08-20 instrumented bench showed stage A 2.80 s / stage B
11.98 s, where stage B does ~0.5x stage A's arithmetic — either the
fused Pallas kernels regressed on the current runtime, or the per-chunk
eager slice / residue upload is the cost. This times each component
twice (warm) with real fences.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from lumenos_tpu import jaxcfg  # noqa
from lumenos_tpu.core.field import GOLDILOCKS_57, PrimeField
from lumenos_tpu.fhe.backend import BgvBackend
from lumenos_tpu.fhe.params import generate_bgv_params_for_ntt
from lumenos_tpu.fhe.hntt import min_start_level
from lumenos_tpu.fhe.staged import StagedEncode, _stage_b_fn
from lumenos_tpu.ops.devsync import sync

t = GOLDILOCKS_57
cols, log_n = 4096, 13
params = generate_bgv_params_for_ntt(cols, log_n, t)
backend = BgvBackend(params)
field = PrimeField(t, cols * 2)
start_level = min_start_level(params, cols * 2)
st = StagedEncode(backend, field, cols * 2, start_level)
print(f"n1={st.n1} n2={st.n2} mid={st.mid} chunk_b={st.chunk_b}", flush=True)
n = backend.n
Lm = st.mid + 1
rng = np.random.default_rng(0)
small = jnp.asarray(rng.integers(0, params.q_primes[0],
                    (st.n1, st.n2, 2, Lm, n), dtype=np.uint64))
sync(small)

cw = st.chunk_b
fb = _stage_b_fn(backend, field, st.n2, cw, st.mid)
w, ws = st._row_chunk_res(0, cw)
wd, wsd = jnp.asarray(w), jnp.asarray(ws)
chunk0 = sync(jnp.asarray(np.asarray(small[:cw])))

# a) full stage B chunk (slice+residues host-side precomputed)
for it in range(3):
    t0 = time.perf_counter()
    ob = fb(chunk0, wd, wsd)
    sync(ob)
    print(f"fb chunk iter{it}: {time.perf_counter()-t0:.3f}s", flush=True)
    del ob
    chunk0 = sync(jnp.asarray(np.asarray(small[:cw])))  # re-make (donated)

# b) eager slice cost
for it in range(2):
    t0 = time.perf_counter()
    sl = small[cw:2*cw]
    sync(sl)
    print(f"eager slice iter{it}: {time.perf_counter()-t0:.3f}s", flush=True)
    del sl

# c) residue host prep + h2d
t0 = time.perf_counter()
w2, ws2 = st._row_chunk_res(cw, cw)
t1 = time.perf_counter()
wd2, wsd2 = sync(jnp.asarray(w2)), sync(jnp.asarray(ws2))
print(f"residues host {t1-t0:.3f}s h2d {time.perf_counter()-t1:.3f}s", flush=True)

# d) full _run_stage_b wall
t0 = time.perf_counter()
cells = st._run_stage_b(small)
sync(cells)
print(f"_run_stage_b total: {time.perf_counter()-t0:.3f}s", flush=True)
