"""Benchmark: homomorphic Ligero server prove on the real TPU chip.

Prints ONE JSON line at the end:
    {"metric", "value", "unit", "vs_baseline", "configs": {...}}
vs_baseline = reference_seconds / our_seconds (speedup; >1 means faster
than the reference's 32-vCPU m7i.8xlarge numbers, BASELINE.md). The
headline metric is the largest completed config; per-config results are
in "configs".

Structure of one timed config run (all four configs share the
cells-layout staged path):

  1. host transcript: sample r, append point, sample query indices —
     BEFORE any device work. Sound: the Fiat-Shamir transcript never
     absorbs the Merkle root (reference fhe/ligero.go:199 keeps it out),
     so challenges and query positions depend only on host state. This
     lets the queried-column device->host transfer START as soon as each
     stage-B block lands, riding under everything that follows.
  2. staged cells encode (stage A over j-chunks, stage B over i-blocks);
     per block: gather that block's queried columns, start async d2h.
     Single-pass products-matrix sink: each received encode-level chunk
     is also rescaled to the products level on first read (no second
     pass) when the [cols] buffer fits HBM next to the mid buffer;
     two-pass derive_products_matrix (inside the transfer window)
     otherwise (16384x4096).
  3. products (MatR/MatZ), Merkle fold, then the residual wait on the
     in-flight queried-column transfer is the query phase.

total_s = encode + prodmat + products + merkle + query. The queried-
column d2h is COUNTED (it is mostly hidden under 2-3); on this tunnel it
moves at ~49 MB/s vs >10 GB/s on production PCIe, so the query/products
residuals here are upper bounds. Round 5: chunk sizes, fence groups and
the per-block pacing fences derive from HBM residency (each timed fence
is a ~78 ms tunnel round-trip — see staged.py); mid level defaults to 4
(empirically re-validated by the full verification each run); three
timed reps, best + median reported.

Correctness per config (LUMENOS_BENCH_NOCHECK=1 skips):
  - spot-check: decrypted codeword positions vs the plaintext oracle and
    two MatR c0-decodes vs host inner products;
  - FULL proof verification (round-3 verdict item 7): decrypt the entire
    queried-column set + MatR/MatZ, assemble the plaintext proof, and run
    the public verifier (core/ligero_plain.verify) against the
    polynomial evaluation — reported as "full_proof_verify".
The client decrypt phases are timed on-chip while doing so (reference
client table README.md:85-92) — "client_decrypt_*" fields.

Robustness: keygen and all device programs are AOT-compiled before any
large allocation; the persistent XLA compile cache lives in-repo
(.jax_cache/tpu); SIGTERM/SIGINT print best-so-far JSON; a soft budget
(LUMENOS_BENCH_BUDGET, default 2200 s) gates starting the next config.

Config via env: LUMENOS_BENCH_CONFIGS="2048x1024,8192x4096", each entry
ROWSxCOLS with LogN from the reference table (README.md:61).
"""

import json
import os
import signal
import sys
import time

import numpy as np

# reference numbers (BASELINE.md): rows x cols -> (prove_eval_total_s
# = encode + merkle + inner products + query) on m7i.8xlarge, 32 vCPU
REFERENCE = {
    (2048, 1024): {"prove_total": 9.61 + 5.17 + 1.03, "logn": 12},
    (4096, 2048): {"prove_total": 24.17 + 12.63 + 2.04, "logn": 12},
    (8192, 4096): {"prove_total": 113.16 + 66.78 + 9.17, "logn": 13},
    (16384, 4096): {"prove_total": 255.12 + 142.73 + 18.79, "logn": 14},
}

# reference client decrypt times (README.md:85-87, m6i.large 2 vCPU)
REFERENCE_CLIENT = {
    (2048, 1024): {"cols": 0.0959, "mats": 0.5316, "total": 0.6275},
    (4096, 2048): {"cols": 0.1077, "mats": 1.05, "total": 1.16},
    (8192, 4096): {"cols": 0.2201, "mats": 4.32, "total": 4.54},
    (16384, 4096): {"cols": 0.5133, "mats": 47.53, "total": 48.05},
}

RESULTS: dict = {}          # "ROWSxCOLS" -> per-config result dict
_PRINTED = False
_INIT_OK = [False]          # set once jax.devices() has returned


def emit_json() -> None:
    """Print the single driver-parsed JSON line (best-so-far)."""
    global _PRINTED
    if _PRINTED or not RESULTS:
        return
    _PRINTED = True
    # headline = largest completed config (by rows*cols)
    key = max(RESULTS, key=lambda k: int(k.split("x")[0]) * int(k.split("x")[1]))
    r = RESULTS[key]
    print(json.dumps({
        "metric": f"homomorphic_ligero_server_prove_{key}_logN{r['logn']}",
        "value": r["total_s"],
        "unit": "s",
        "vs_baseline": r["vs_baseline"],
        "configs": RESULTS,
    }), flush=True)


def _sig_handler(signum, frame):
    print(f"bench: caught signal {signum}, emitting partial results",
          file=sys.stderr)
    emit_json()
    sys.exit(0 if RESULTS else 1)


def run_config(rows: int, cols: int, log_n: int, check: bool) -> dict:
    rho = 2
    from lumenos_tpu.core.field import GOLDILOCKS_57, PrimeField
    from lumenos_tpu.core.chacha import random_matrix_row_major
    from lumenos_tpu.core.ligero_plain import LigeroCommitter
    from lumenos_tpu.core.merkle_fast import FastMerkleTree
    from lumenos_tpu.core.transcript import Transcript
    from lumenos_tpu.core.ligero_plain import _powers, sample_query_indices
    from lumenos_tpu.fhe.backend import BgvBackend, CtBatch
    from lumenos_tpu.fhe.params import generate_bgv_params_for_ntt
    from lumenos_tpu.fhe.pipeline import (
        build_products_pipeline, build_challenge_encode)
    from lumenos_tpu.fhe.hntt import min_start_level
    from lumenos_tpu.fhe.staged import StagedEncode, _hbm_budget
    from lumenos_tpu.fhe.ligero import (
        derive_products_matrix, precompile_products_extract)
    from lumenos_tpu.ops.devsync import sync
    from lumenos_tpu.ops.sha256_jax import digests_to_bytes

    t = GOLDILOCKS_57
    # device init FIRST (before keygen compiles anything): the tunnel's
    # TPU runtime spin-up after a container restart took 700 s once —
    # time it separately and satisfy the watchdog before heavy work
    import jax
    import jax.numpy as jnp
    t0 = time.perf_counter()
    jax.devices()
    _INIT_OK[0] = True
    t_init = time.perf_counter() - t0
    if t_init > 1.0:
        print(f"[{rows}x{cols}] device init: {t_init:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    params = generate_bgv_params_for_ntt(cols, log_n, t)
    backend = BgvBackend(params)
    field = PrimeField(t, cols * rho)
    rng = np.random.default_rng(1)
    sk, pk = backend.keygen(rng)
    committer = LigeroCommitter(128, rows, cols, rho)
    print(f"[{rows}x{cols}] setup: {time.perf_counter()-t0:.1f}s "
          f"(L={params.max_level+1} limbs, N={params.n})", file=sys.stderr)

    start_level = min_start_level(params, cols * rho)
    prod_level = 2   # one pt-mul of headroom (DESIGN.md budget analysis)
    ext_cols = cols * rho
    n = params.n
    u64 = np.uint64
    n_queries = committer.meta.queries

    # ---- host transcript first: challenges + query indices -------------
    tr = Transcript("bench")
    r = np.array([x % t for x in tr.sample_uints("r", rows)], dtype=np.uint64)
    point = 7
    b = _powers(field, pow(point, cols, t), rows)
    tr.append_field("point", point)
    idxs = sample_query_indices(tr, n_queries, ext_cols)

    # ---- staged cells geometry (ALL configs share this path) -----------
    # mid level: default 4 (LUMENOS_BENCH_MID overrides). Round-5: mid=4
    # verified end-to-end at 16384x4096 (full public verification OK), and
    # a smaller mid shrinks the mid buffer ~17% and stage B by one limb;
    # the per-config full proof verification below is the standing
    # empirical noise-margin check.
    mid_env = os.environ.get("LUMENOS_BENCH_MID")
    staged = StagedEncode(backend, field, ext_cols, start_level,
                          mid_level=int(mid_env) if mid_env else 4)
    # Stage-A chunk sizing: every chunk costs one timed fence (one tunnel
    # round-trip, measured ~78 ms) on top of its compute, so chunks should
    # be as LARGE as the HBM headroom next to the resident buffers allows
    # (round-5 profiling: at 8192x4096 the 16 fences alone were ~1.2 s of
    # "encode"). Headroom model: mid buffer + fused-prod buffer stay
    # resident; a chunk needs ~3x its bytes of program liveness; keep a
    # 3 GB general reserve. Bounds: [0.8 GB, 1.7 GB], whole-input if it
    # fits the cap. LUMENOS_BENCH_CA overrides the chunk row count.
    hbm0 = _hbm_budget()
    mid_bytes0 = ext_cols * 2 * (staged.mid + 1) * n * 8
    prod_bytes0 = cols * 2 * (prod_level + 1) * n * 8
    in_bytes_total = ext_cols * 2 * (start_level + 1) * n * 8
    cap = min(1.7e9, max(0.8e9, (hbm0 - mid_bytes0 - prod_bytes0 - 3e9) / 3))
    if in_bytes_total <= 1.7e9:
        cap = max(cap, in_bytes_total)   # small config: one chunk
    ca_env = os.environ.get("LUMENOS_BENCH_CA")
    ca = (int(ca_env) if ca_env else
          max(1, int(cap // (staged.n1 * 2 * (start_level + 1) * n * 8))))
    while ca & (ca - 1):
        ca &= ca - 1
    staged.chunk_a = min(max(ca, 1), staged.n2)
    hbm = _hbm_budget()
    mid_bytes = ext_cols * 2 * (staged.mid + 1) * n * 8
    cells_bytes = ext_cols * 2 * 2 * n * 8
    n_blocks = 4                       # early per-block transfers
    while (mid_bytes / n_blocks > 2e9 and n_blocks < staged.n1):
        n_blocks *= 2
    n_blocks = min(n_blocks, staged.n1)
    bw = staged.n1 // n_blocks
    # single-pass products sink when its buffer fits next to the peak
    prod_bytes = cols * 2 * (prod_level + 1) * n * 8
    sp_env = os.environ.get("LUMENOS_BENCH_SINGLEPASS")
    single_pass = mid_bytes + cells_bytes + prod_bytes + 2.5e9 < hbm \
        if sp_env is None else sp_env == "1"
    if single_pass:
        staged.extra_resident_bytes = prod_bytes
    # skip the per-stage-B-block pacing fences (~78 ms round-trips each)
    # when everything fits HBM at once (small configs; staged.py docstring)
    staged.light_fences = (
        mid_bytes + cells_bytes + prod_bytes + 5e9 < hbm)
    # early per-block queried-column transfer: a win when the opened
    # columns are small (fully hidden under stage B at N=4096), a LOSS on
    # this tunnel when they are large — the relay serializes DMA with
    # compute dispatches, so 81-162 MB in flight inflates every stage-B
    # and prodmat round-trip (measured: 8192 encode 11.8 s vs 3.6 s
    # clean). Large configs transfer in the tail window instead.
    # stage-A chunks per timed fence: during stage A only the mid blocks
    # (+ fused-prod buffer) are resident, and the transform program needs
    # ~3x one chunk of liveness; every ADDITIONAL in-flight chunk of a
    # fence group costs its own bytes
    chunk_bytes = staged.n1 * staged.chunk_a * 2 * (start_level + 1) * n * 8
    headroom = (hbm0 - mid_bytes - (prod_bytes0 if single_pass else 0)
                - 5 * chunk_bytes)   # program + encrypt temps ~5x a chunk
    fence_group = max(1, min(4, 1 + int(headroom // (2 * chunk_bytes))))
    xfer_bytes = n_queries * 2 * 2 * n * 8
    ex_env = os.environ.get("LUMENOS_BENCH_EARLYXFER")
    # measured at 8192 (81 MB): stage B absorbs ~+1.5 s of contention but
    # the tail exposure (~2.6 s) disappears — net win up to ~96 MB; at
    # 162 MB (16384) the contention dominates, keep the tail window
    early_xfer = xfer_bytes <= 96e6 if ex_env is None else ex_env == "1"
    n1h = cols // staged.n2

    # per-block query partition: block b owns queried positions whose
    # cell row i = p % n1 lies in [b*bw, (b+1)*bw). The spot-check
    # positions ride along (a few extra columns) so the gathered parts
    # are the ONLY consumer of the cells blocks — memory-tight configs
    # can then evict each block right after its gather (staged.py
    # evict_cells) and later stage-B blocks run wider sub-chunks.
    check_pos = [0, 1, cols, ext_cols - 1]
    gpos = list(idxs) + [p for p in check_pos if p not in set(idxs)]
    block_parts: list = [[] for _ in range(n_blocks)]   # (orig_i, row, j)
    for oi, p in enumerate(gpos):
        i, j = p % staged.n1, p // staged.n1
        block_parts[i // bw].append((oi, i - (i // bw) * bw, j))
    evict_cells = not staged.light_fences

    # ---- pre-compile EVERY device program before big buffers exist -----
    # every .lower().compile() goes through the AOT executable store
    # (ops/aot.py): a no-op without LUMENOS_AOT_DIR; with it, a fresh
    # process loads the serialized executables and skips XLA entirely
    # (scripts/aot_coldstart.py measures the cold-to-first-proof win)
    from lumenos_tpu.ops.aot import compile_or_load
    from lumenos_tpu.fhe.staged import _params_tag
    ptag = _params_tag(backend)
    t0 = time.perf_counter()
    sds = lambda *s, dt=np.int64: jax.ShapeDtypeStruct(s, dt)
    enc_chunk = staged.n1 * staged.chunk_a

    def swap_backend_cache(name, cache_key, tag, *shapes):
        from lumenos_tpu.ops.aot import aot_dir
        cache = backend.__dict__.setdefault("_cache_" + name, {})
        out = compile_or_load(
            f"{tag}-{ptag}", getattr(backend, name)(*cache_key), *shapes)
        if aot_dir() is not None:   # keep the shape-generic jit otherwise
            cache[cache_key] = out

    for lvl, nn in ((start_level, enc_chunk), (prod_level, 1024)):
        swap_backend_cache("_encode_embed_jit", (lvl,), f"embed-l{lvl}-{nn}",
                           sds(nn, rows, dt=u64))
        swap_backend_cache("_encrypt_jit", (lvl,), f"encr-l{lvl}-{nn}",
                           sds(nn, n), sds(nn, n), sds(nn, n),
                           sds(nn, lvl + 1, n, dt=u64),
                           sds(lvl + 1, n, dt=u64),
                           sds(lvl + 1, n, dt=u64))
    staged.precompile_cells(
        n_blocks, None,   # bench gathers per block; the one-program
                          # whole-set gather is not used here
        prod_cfg=(n1h, prod_level) if single_pass else None,
        evict_cells=evict_cells)
    # two-pass products derivation runs AFTER the mid buffer is freed, so
    # its chunks can be much larger than stage A's (fewer ~78 ms fences)
    # and group-fenced on top
    if not single_pass:
        free2 = hbm0 - cells_bytes - prod_bytes - 2e9
        unit2 = staged.n1 * 2 * (start_level + 1) * n * 8
        ca2 = max(staged.chunk_a, min(staged.n2, int(free2 / 3 // unit2)))
        while ca2 & (ca2 - 1):
            ca2 &= ca2 - 1
        pg2 = max(1, min(4, int(free2 // (2.5 * ca2 * unit2))))
        precompile_products_extract(backend, staged, cols, prod_level,
                                    chunk_a=ca2)
    # per-block queried-column gathers (exact static counts)
    for bp in block_parts:
        if bp:
            staged.block_gather_fn(bw, len(bp)).lower(
                sds(bw, staged.n2, 2, 2, n, dt=u64),
                sds(len(bp), dt=np.int32), sds(len(bp), dt=np.int32)
            ).compile()
    fn_prod = build_products_pipeline(backend, level=prod_level)
    # column-chunk the products when one whole-matrix program would blow
    # HBM: its HLO temps run ~4.5x the input bytes (measured: 13.5G temps
    # on the 3.0G LogN=14 input, which the compiler rejects against
    # 15.75G). Keep outputs as per-chunk arrays - concatenating would
    # double the 4.3G output liveness for nothing.
    in_bytes = cols * 2 * (prod_level + 1) * n * 8
    n_pchunks = 1
    while in_bytes / n_pchunks * 4.5 > 4e9 and n_pchunks < cols:
        n_pchunks *= 2
    assert cols % n_pchunks == 0, "power-of-two chunking needs 2^k cols"
    pchunk = cols // n_pchunks
    fn_prod_c1 = compile_or_load(
        f"prod-{ptag}-{pchunk}-{prod_level}", fn_prod,
        sds(pchunk, 2, prod_level + 1, n, dt=u64),
        sds(prod_level + 1, n, dt=u64),
        sds(prod_level + 1, n, dt=u64))
    if n_pchunks > 1:
        fn_pslice = jax.jit(
            lambda d, c0: jax.lax.dynamic_slice_in_dim(d, c0, pchunk, 0)
        ).lower(sds(cols, 2, prod_level + 1, n, dt=u64),
                sds(dt=np.int32)).compile()

    def fn_prod_c(prod_data, pr, pb):
        """Returns (mr_chunks, mz_chunks): lists of [pchunk, ...] arrays."""
        if n_pchunks == 1:
            mr, mz = fn_prod_c1(prod_data, pr, pb)
            return [mr], [mz]
        mrs, mzs = [], []
        for c in range(n_pchunks):
            mr, mz = fn_prod_c1(
                fn_pslice(prod_data, np.int32(c * pchunk)), pr, pb)
            mrs.append(mr)
            mzs.append(mz)
        return mrs, mzs
    fn_chal = build_challenge_encode(backend, prod_level)
    t_compile = time.perf_counter() - t0
    print(f"[{rows}x{cols}] precompile: {t_compile:.1f}s "
          f"(n_blocks={n_blocks}, single_pass={single_pass})",
          file=sys.stderr)

    # ---- client-side data prep (untimed) -------------------------------
    # the ChaCha matrix is deterministic (seed 1); cache it on disk so
    # repeat runs on this host skip the 30-110 s host generation
    t0 = time.perf_counter()
    mcache = f"/tmp/lumenos_matrix_{rows}x{cols}_{t}.npy"
    try:
        matrix = np.load(mcache)
        assert matrix.shape == (rows, cols)
    except Exception:
        matrix = random_matrix_row_major(rows, cols, t)
        try:
            np.save(mcache + f".tmp{os.getpid()}.npy", matrix)
            os.replace(mcache + f".tmp{os.getpid()}.npy", mcache)
        except Exception:
            pass
    full_vals = np.zeros((ext_cols, rows), dtype=np.uint64)
    full_vals[:cols] = matrix.T
    # stage-A input chunks are encrypted JUST-IN-TIME inside the staged
    # run (client work, untimed) so only one is ever device-resident.
    # enc_rng_state lets a second pass REPLAY the identical ciphertext
    # stream (= a production server re-reading received bytes).
    grid = full_vals.reshape(staged.n1, staged.n2, rows)
    enc_rng_state = rng.bit_generator.state

    def make_chunk(jc):
        j0 = jc * staged.chunk_a
        vals = np.ascontiguousarray(
            grid[:, j0:j0 + staged.chunk_a].reshape(-1, rows))
        ct = backend.encrypt_values(vals, pk, rng, level=start_level)
        return ct.data.reshape(
            (staged.n1, staged.chunk_a) + ct.data.shape[1:])

    def make_chunk2(jc):
        # the wider-chunk replay for the two-pass products derivation;
        # NOTE: a different chunk width changes the encrypt batch shape,
        # not the per-column randomness order, so the stream replays
        # bit-identically (rng state is reset before the pass)
        j0 = jc * ca2
        vals = np.ascontiguousarray(grid[:, j0:j0 + ca2].reshape(-1, rows))
        ct = backend.encrypt_values(vals, pk, rng, level=start_level)
        return ct.data.reshape((staged.n1, ca2) + ct.data.shape[1:])

    print(f"[{rows}x{cols}] matrix gen: "
          f"{time.perf_counter()-t0:.1f}s", file=sys.stderr)

    # challenge plaintexts (host transcript; device encode, one program)
    pt_r, pt_b = fn_chal(jnp.asarray(r), jnp.asarray(np.asarray(b, u64)))
    sync(pt_r)

    # ---- timed run -----------------------------------------------------
    # The protocol is a deterministic replay of the client's ciphertext
    # stream, so the timed section can run several times (artifacts are
    # bit-identical); the tunnel's throughput swings 2-4x minute to
    # minute, so the per-config result is the BEST of LUMENOS_BENCH_REPS
    # runs (default 3; median reported alongside every rep's total).
    TIMING_KEYS = ("t_encode_run", "t_prodmat", "t_prod", "t_merkle",
                   "t_query", "total")

    def timed_once():
        rng.bit_generator.state = enc_rng_state
        xfer_parts: list = [None] * n_blocks   # device arrays in flight

        def on_block(bi, cells_b):
            bp = block_parts[bi]
            if not bp:
                return
            ri = jnp.asarray(np.array([x[1] for x in bp], np.int32))
            ji = jnp.asarray(np.array([x[2] for x in bp], np.int32))
            part = staged.block_gather_fn(bw, len(bp))(cells_b, ri, ji)
            if early_xfer:
                try:
                    part.copy_to_host_async()
                except Exception:
                    pass              # np.asarray below is sync anyway
            xfer_parts[bi] = part

        if single_pass:
            # fused: the stage-A program also emits the products-level
            # rescale — t_prodmat is inside the encode by construction
            cells_blocks, digests, enc_scales, t_encode_run, prod_data = \
                staged.run_streaming_cells(
                    make_chunk, staged.n2 // staged.chunk_a,
                    n_blocks=n_blocks, on_block=on_block,
                    prod_cfg=(n1h, prod_level), fence_group=fence_group,
                    evict_cells=evict_cells)
            prod_ct = CtBatch(data=prod_data, level=prod_level)
            t_prodmat = 0.0
        else:
            cells_blocks, digests, enc_scales, t_encode_run = \
                staged.run_streaming_cells(
                    make_chunk, staged.n2 // staged.chunk_a,
                    n_blocks=n_blocks, on_block=on_block,
                    fence_group=fence_group, evict_cells=evict_cells)
            # two-pass rescale of the re-read ciphertext stream, BEFORE
            # the tail transfer opens (its untimed chunk re-uploads must
            # not contend with the timed opened-column d2h)
            rng.bit_generator.state = enc_rng_state
            prod_ct, t_prodmat = derive_products_matrix(
                backend, staged, make_chunk2, cols, prod_level,
                chunk_a=ca2, fence_group=pg2)
            sync(prod_ct.data)
        try:
            digests.copy_to_host_async()   # rides under products/merkle
        except Exception:
            pass
        print(f"[{rows}x{cols}] encode: {t_encode_run:.2f}s  "
              f"products-matrix rescale: "
              f"{'(fused)' if single_pass else f'{t_prodmat:.2f}s'}",
              file=sys.stderr)

        # large configs: open the transfer window at the tail — the
        # per-block gathers already ran during stage B; start their
        # async d2h now and run products + the Merkle fold under it
        t_gather = 0.0
        if not early_xfer:
            tg = time.perf_counter()
            for part in xfer_parts:
                if part is None:
                    continue
                try:
                    part.copy_to_host_async()
                except Exception:
                    pass
            t_gather = time.perf_counter() - tg

        tp = time.perf_counter()
        mr_chunks, mz_chunks = fn_prod_c(prod_ct.data, pt_r, pt_b)
        for _m in mr_chunks:
            sync(_m)
        backend.mul_count += 2 * cols   # one ct x pt per column/challenge
        t_prod = time.perf_counter() - tp
        print(f"[{rows}x{cols}] products(+xfer in flight): {t_prod:.2f}s",
              file=sys.stderr)

        tm = time.perf_counter()
        tree = FastMerkleTree(digests_to_bytes(np.asarray(digests)))
        t_merkle = time.perf_counter() - tm

        # query phase: gather dispatch + residual wait on the in-flight
        # transfer(s) + path openings
        tq = time.perf_counter()
        leaf_np = np.empty((len(gpos), 2, 2, n), dtype=u64)
        for bi in range(n_blocks):
            if xfer_parts[bi] is None:
                continue
            out = np.asarray(xfer_parts[bi])
            for k, (oi, _, _) in enumerate(block_parts[bi]):
                leaf_np[oi] = out[k]
        paths = [tree.get_path(i) for i in idxs]
        t_query = time.perf_counter() - tq + t_gather
        print(f"[{rows}x{cols}] merkle: {t_merkle:.2f}s  query(gather "
              f"{t_gather:.2f}s + residual xfer "
              f"{leaf_np.nbytes/1e6:.0f} MB + paths): {t_query:.2f}s",
              file=sys.stderr)
        t_device = t_encode_run + t_prodmat + t_prod
        return {
            "t_encode_run": t_encode_run, "t_prodmat": t_prodmat,
            "t_prod": t_prod, "t_merkle": t_merkle, "t_query": t_query,
            "total": t_device + t_merkle + t_query,
            "cells_blocks": cells_blocks, "digests": digests,
            "enc_scales": enc_scales, "prod_ct": prod_ct,
            "mr_chunks": mr_chunks, "mz_chunks": mz_chunks,
            "tree": tree, "leaf_np": leaf_np, "paths": paths,
            "xfer_parts": xfer_parts,
        }

    reps = max(1, int(os.environ.get("LUMENOS_BENCH_REPS", "3")))
    best = None
    art = None
    rep_totals = []
    for rep in range(reps):
        art = None                 # free previous rep's device arrays
        art = timed_once()
        rep_totals.append(round(art["total"], 3))
        t_only = {k: art[k] for k in TIMING_KEYS}
        if best is None or t_only["total"] < best["total"]:
            best = t_only
        print(f"[{rows}x{cols}] rep {rep + 1}/{reps}: "
              f"{art['total']:.2f}s", file=sys.stderr)
    t_encode_run = best["t_encode_run"]
    t_prodmat = best["t_prodmat"]
    t_prod = best["t_prod"]
    t_merkle = best["t_merkle"]
    t_query = best["t_query"]
    cells_blocks = art["cells_blocks"]
    digests = art["digests"]
    enc_scales = art["enc_scales"]
    prod_ct = art["prod_ct"]
    mr_chunks = art["mr_chunks"]
    mz_chunks = art["mz_chunks"]
    tree = art["tree"]
    leaf_np = art["leaf_np"]
    paths = art["paths"]

    t_device = t_encode_run + t_prodmat + t_prod
    total = t_device + t_merkle + t_query

    # ---- correctness + client decrypt phase (untimed window) -----------
    spot_ok = None
    full_verify = None
    client = {}
    if check:
        from lumenos_tpu.core.ligero_plain import (
            _encode_fn, evaluate_matrix_poly, verify, Proof, QueriedColumn)
        from lumenos_tpu.fhe.ligero import ct_leaf_bytes, fhe_leaf_hasher
        from lumenos_tpu.fhe.hntt import ligero_ntt_scales
        scales = enc_scales
        # full gathered set (queried + spot-check positions) assembled
        # on device from the per-block gather parts — the cells blocks
        # themselves may have been evicted (evict_cells); decrypt timed
        # WARM. The <=4 extra spot-check columns in the batch are
        # immaterial to the timing (306+ columns).
        xfer_parts = art["xfer_parts"]
        q_dev = jnp.zeros((len(gpos), 2, 2, n), jnp.uint64)
        for bi in range(n_blocks):
            if xfer_parts[bi] is None:
                continue
            oi = np.array([x[0] for x in block_parts[bi]], np.int32)
            q_dev = q_dev.at[jnp.asarray(oi)].set(xfer_parts[bi])
        sync(q_dev)
        qct = CtBatch(data=q_dev, level=1)
        vals_dev = backend.decrypt_values(qct, sk, rows)
        sync(vals_dev)                          # warmup (compile)
        tc = time.perf_counter()
        vals_dev = backend.decrypt_values(qct, sk, rows)
        sync(vals_dev)
        client["decrypt_cols_s"] = round(time.perf_counter() - tc, 3)
        c0_parts = []
        for mlist in (mr_chunks, mz_chunks):    # warmup
            for m in mlist:
                sync(backend.decrypt_c0_fast(CtBatch(data=m, level=1), sk))
        tc = time.perf_counter()
        for mlist in (mr_chunks, mz_chunks):
            parts = [backend.decrypt_c0_fast(CtBatch(data=m, level=1), sk)
                     for m in mlist]
            for p in parts:
                sync(p)
            c0_parts.append(parts)
        client["decrypt_mats_s"] = round(time.perf_counter() - tc, 3)
        client["decrypt_total_s"] = round(
            client["decrypt_cols_s"] + client["decrypt_mats_s"], 3)
        ref_c = REFERENCE_CLIENT.get((rows, cols))
        if ref_c:
            client["reference_total_s"] = ref_c["total"]
            client["vs_baseline"] = round(
                ref_c["total"] / max(client["decrypt_total_s"], 1e-9), 1)
        vals = np.asarray(vals_dev)
        c0_r = np.concatenate([np.asarray(p) for p in c0_parts[0]])
        c0_z = np.concatenate([np.asarray(p) for p in c0_parts[1]])
        mat_r = np.array([int(x) * n % t for x in c0_r], dtype=u64)
        mat_z = np.array([int(x) * n % t for x in c0_z], dtype=u64)

        # spot-check vs the plaintext oracle (decrypt equality): every
        # check position is in the gathered set by construction (gpos)
        spot_ok = True
        pos_all = {p: i for i, p in enumerate(gpos)}
        from lumenos_tpu.ops.modmath import ModCtx, mulmod
        pt_enc = np.asarray(_encode_fn(field, rho)(
            jnp.asarray(matrix[:4, :], jnp.uint64)))  # first 4 rows encoded
        for ci, p in enumerate(check_pos):
            sig_inv = pow(int(scales[p]), t - 2, t)
            row_vals = vals[pos_all[p]]
            got = [int(row_vals[rr]) * sig_inv % t for rr in range(4)]
            exp = [int(pt_enc[rr, p]) for rr in range(4)]
            if got != exp:
                spot_ok = False
        r_obj = r.astype(object)
        for j in (0, cols - 1):
            exp_ip = int((matrix[:, j].astype(object) * r_obj).sum() % t)
            if int(mat_r[j]) != exp_ip:
                spot_ok = False
        print(f"[{rows}x{cols}] spot-check decrypt vs plaintext oracle: "
              f"{'OK' if spot_ok else 'MISMATCH'}", file=sys.stderr)

        # FULL public verification of the decrypted proof
        tv = time.perf_counter()
        sig_inv_arr = np.array(
            [pow(int(scales[p]), t - 2, t) for p in idxs], dtype=u64)
        unscale = jax.jit(lambda v, s: mulmod(v, s[:, None], ModCtx.new(t)))
        vals_un = np.asarray(unscale(jnp.asarray(vals[:len(idxs)]),
                                     jnp.asarray(sig_inv_arr)))
        queried = [QueriedColumn(values=vals_un[i],
                                 leaf_bytes=ct_leaf_bytes(leaf_np, i))
                   for i in range(len(idxs))]
        proof = Proof(meta=committer.meta, root=tree.root, mat_r=mat_r,
                      mat_z=mat_z, queried_cols=queried, merkle_paths=paths)
        value = evaluate_matrix_poly(matrix, point, field)
        try:
            verify(proof, point, value, field, Transcript("bench"),
                   fhe_leaf_hasher)
            full_verify = True
        except ValueError as e:
            full_verify = False
            print(f"[{rows}x{cols}] FULL VERIFY FAILED: {e}",
                  file=sys.stderr)
        print(f"[{rows}x{cols}] full proof verify: "
              f"{'OK' if full_verify else 'FAIL'} "
              f"({time.perf_counter()-tv:.1f}s, untimed)", file=sys.stderr)
        if not spot_ok or not full_verify:
            raise SystemExit("bench correctness check failed")

    print(f"[{rows}x{cols}] device(encode+inner): {t_device:.2f}s "
          f"merkle: {t_merkle:.2f}s query: {t_query:.2f}s "
          f"total: {total:.2f}s", file=sys.stderr)

    ref = REFERENCE.get((rows, cols), {}).get("prove_total")
    vs = (ref / total) if ref else 0.0
    # BASELINE.json metric "NTT butterflies/s/chip": one butterfly =
    # one Shoup mulmod + one modular add per (position, poly, limb,
    # coeff) lane of one schedule layer of the homomorphic encode.
    import math
    n_bf = (ext_cols * n * 2
            * (math.log2(staged.n1) * (staged.level + 1)
               + math.log2(staged.n2) * (staged.mid + 1)))
    return {
        "logn": log_n,
        "total_s": round(total, 3),
        "total_median_s": round(float(np.median(rep_totals)), 3),
        "device_s": round(t_device, 3),
        "encode_s": round(t_encode_run, 3),
        "prodmat_s": round(t_prodmat, 3),
        "prodmat_fused": single_pass,
        "early_xfer": early_xfer,
        "rep_totals": rep_totals,
        "products_s": round(t_prod, 3),
        "merkle_s": round(t_merkle, 3),
        "query_s": round(t_query, 3),
        "compile_s": round(t_compile, 1),
        "vs_baseline": round(vs, 2),
        "spot_check": spot_ok,
        "full_proof_verify": full_verify,
        "client": client,
        "reference_s": ref,
        "butterfly_mulmods_per_s": round(n_bf / max(t_encode_run, 1e-9), 0),
        "mul_count": backend.mul_count,
    }


def _tunnel_guard() -> None:
    """Fail fast (with a diagnosis) instead of hanging the whole driver
    budget when the axon relay is down: jax init blocks forever if the
    tunnel's loopback ports are gone (observed: the relay dies with its
    launcher-side transport and cannot be restarted from inside)."""
    import socket
    import threading
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        return
    try:
        with socket.create_connection(("127.0.0.1", 8082), timeout=3):
            pass
    except OSError:
        print("bench: axon relay port 8082 closed - TPU tunnel is down; "
              "aborting before jax init (would hang)", file=sys.stderr)
        raise SystemExit(3)

    # watchdog: device INIT (not compile) must complete within 25 min -
    # run_config sets _INIT_OK[0] right after jax.devices() returns. A
    # half-dead tunnel (port open, upstream gone) otherwise hangs the
    # whole driver budget with no diagnosis.
    def watch():
        import time as _t
        _t.sleep(1500)
        if not _INIT_OK[0]:
            print("bench: jax device init did not complete in 1500 s - "
                  "tunnel half-dead; exiting", file=sys.stderr)
            os._exit(4)
    threading.Thread(target=watch, daemon=True).start()


def main() -> None:
    signal.signal(signal.SIGTERM, _sig_handler)
    signal.signal(signal.SIGINT, _sig_handler)
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        # the axon plugin initializes (and claims the single-tenant TPU
        # tunnel!) even under JAX_PLATFORMS=cpu — the config update before
        # any backend discovery is what actually keeps it off
        import jax
        jax.config.update("jax_platforms", "cpu")
    _tunnel_guard()
    budget = float(os.environ.get("LUMENOS_BENCH_BUDGET", 3200))
    check = not os.environ.get("LUMENOS_BENCH_NOCHECK")
    cfg_env = os.environ.get(
        "LUMENOS_BENCH_CONFIGS",
        "2048x1024,4096x2048,8192x4096,16384x4096")
    # legacy single-config envs still honored
    if os.environ.get("LUMENOS_BENCH_ROWS"):
        cfg_env = (f"{os.environ['LUMENOS_BENCH_ROWS']}x"
                   f"{os.environ.get('LUMENOS_BENCH_COLS', 1024)}")
    configs = []
    for item in cfg_env.split(","):
        rows, cols = (int(x) for x in item.strip().split("x"))
        log_n = int(os.environ.get(
            "LUMENOS_BENCH_LOGN",
            REFERENCE.get((rows, cols), {}).get("logn", 12)))
        configs.append((rows, cols, log_n))

    t_start = time.perf_counter()
    for i, (rows, cols, log_n) in enumerate(configs):
        elapsed = time.perf_counter() - t_start
        # wall-clock estimate of one config leg (compile + matrix gen +
        # timed reps + full verify + client timings) on warm caches
        # (measured round-5: largest leg ~500 s); skip the config only
        # if it cannot finish in the remaining budget
        est = 550 if rows * cols >= 16384 * 4096 else 300
        if i > 0 and elapsed > budget - est:
            print(f"bench: skipping {rows}x{cols} (elapsed {elapsed:.0f}s "
                  f"+ est {est}s exceeds {budget:.0f}s budget)",
                  file=sys.stderr)
            break
        try:
            RESULTS[f"{rows}x{cols}"] = run_config(rows, cols, log_n, check)
        except SystemExit:
            # spot-check failure: emit what already passed, then fail
            emit_json()
            raise
        except Exception as e:  # keep earlier results printable
            print(f"bench: config {rows}x{cols} failed: {e!r}", file=sys.stderr)
            if not RESULTS:
                raise
            break
    emit_json()


def _supervise() -> int:
    """Self-supervision against the tunnel's observed wedge mode: a fresh
    PJRT client sometimes connects while the previous session drains and
    then hangs forever BEFORE the first compile finishes (metadata RPCs
    answer, execute/compile never do; no TCP socket, main thread in a
    futex). The supervisor runs the real bench as a child, and if no
    config reaches its post-keygen "setup:" line with >600 s of silence,
    kills it by PID, waits for the relay to drain, and retries. Once any
    setup line is seen, the child owns the run (its own watchdog +
    SIGTERM partial-emit handle the rest). The driver-parsed JSON line is
    forwarded to stdout verbatim; everything else goes to stderr."""
    import subprocess
    import threading
    attempts = max(1, int(os.environ.get("LUMENOS_BENCH_ATTEMPTS", "3")))
    rc = 7
    for attempt in range(attempts):
        env = dict(os.environ, LUMENOS_BENCH_SUPERVISOR="0")
        child = subprocess.Popen(
            [sys.executable, "-u", os.path.abspath(__file__)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        last = [time.time()]
        got_setup = [False]

        def pump(stream=child.stdout):
            for line in stream:
                last[0] = time.time()
                if "setup:" in line:
                    got_setup[0] = True
                if line.startswith('{"metric"'):
                    print(line, end="", flush=True)
                else:
                    print(line, end="", file=sys.stderr, flush=True)

        th = threading.Thread(target=pump, daemon=True)
        th.start()

        def fwd(signum, frame, c=child):
            c.terminate()           # child emits its partial JSON line
        signal.signal(signal.SIGTERM, fwd)
        signal.signal(signal.SIGINT, fwd)

        stalled = False
        while child.poll() is None:
            time.sleep(5)
            if not got_setup[0] and time.time() - last[0] > 600:
                print(f"bench-supervisor: attempt {attempt + 1} stalled "
                      f"before setup; killing pid {child.pid}",
                      file=sys.stderr, flush=True)
                child.kill()
                stalled = True
                break
        th.join(timeout=15)
        if not stalled:
            rc = child.returncode if child.returncode is not None else 1
            break
        child.wait()
        time.sleep(90)              # let the relay drain the dead session
    return rc


if __name__ == "__main__":
    if os.environ.get("LUMENOS_BENCH_SUPERVISOR", "1") != "0":
        sys.exit(_supervise())
    main()
