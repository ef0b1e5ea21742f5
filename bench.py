"""Benchmark: homomorphic Ligero server prove on the real TPU chip.

Prints ONE JSON line at the end:
    {"metric", "value", "unit", "vs_baseline", "configs": {...}}
vs_baseline = reference_seconds / our_seconds (speedup; >1 means faster
than the reference's 32-vCPU m7i.8xlarge numbers, BASELINE.md). The
headline metric is the largest completed config; per-config results are
in "configs".

Robustness (the round-1 driver run timed out with no number - VERDICT
item 1):
  - keygen and all challenge encodes are single jitted programs (no
    eager per-op remote compiles);
  - the persistent XLA compile cache lives in-repo (.jax_cache/tpu,
    committed), so even a cold container hits warm compiles;
  - SIGTERM/SIGINT print the best-so-far JSON line before exiting, so a
    driver timeout still yields a parsed result;
  - a soft wall-clock budget (LUMENOS_BENCH_BUDGET, default 2200 s:
    all four reference configs with warm caches; SIGTERM still emits
    completed configs if an outer driver timeout fires first)
    gates starting the next config.
  - the decrypt spot-check vs the plaintext oracle is ON by default
    (set LUMENOS_BENCH_NOCHECK=1 to skip).

Config via env: LUMENOS_BENCH_CONFIGS="2048x1024,8192x4096" (default),
each entry ROWSxCOLS with LogN from the reference table (README.md:61).
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
    from lumenos_tpu.fhe.backend import BgvBackend
    from lumenos_tpu.fhe.params import generate_bgv_params_for_ntt
    from lumenos_tpu.fhe.pipeline import (
        build_encode_pipeline_full, build_products_pipeline,
        build_challenge_encode)
    from lumenos_tpu.fhe.hntt import min_start_level, ligero_ntt_scales
    from lumenos_tpu.fhe.bigbatch import encrypt_big_batch
    from lumenos_tpu.ops.devsync import sync

    t = GOLDILOCKS_57
    # device init FIRST (before keygen compiles anything): the tunnel's
    # TPU runtime spin-up after a container restart took 700 s once —
    # time it separately and satisfy the watchdog before heavy work
    import jax
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

    # pre-compile EVERY device program before any large allocation exists
    # (trace/compile with a ~full chip is what OOMs at the big configs)
    t0 = time.perf_counter()
    ext_cols = cols * rho
    n = params.n
    u64 = np.uint64
    # staged two-pass encode for batches whose monolithic program exceeds
    # HBM liveness (DESIGN.md section 7 / fhe/staged.py)
    staged = None
    use_cells = False
    n_blocks = 1
    force_cells = os.environ.get("LUMENOS_BENCH_FORCE_CELLS") == "1"
    if force_cells or ext_cols * 2 * (start_level + 1) * n * 8 > 1.5e9:
        from lumenos_tpu.fhe.staged import StagedEncode
        staged = StagedEncode(backend, field, ext_cols, start_level)
        # cells mode (no flat copy, blocked mid) when flat-mode peak
        # (2x output copy + whole mid buffer) would crowd 16 GB HBM
        cells_bytes = ext_cols * 2 * 2 * n * 8
        mid_bytes = ext_cols * 2 * (staged.mid + 1) * n * 8
        use_cells = force_cells or 2 * cells_bytes + mid_bytes > 11e9
        if use_cells:
            # input chunk <= ~0.8 GB; mid block <= ~2 GB (both powers of 2)
            ca = max(1, int(0.8e9 // (staged.n1 * 2 * (start_level + 1) * n * 8)))
            while ca & (ca - 1):
                ca &= ca - 1
            staged.chunk_a = min(max(ca, 1), staged.n2)
            n_blocks = 1
            while mid_bytes / n_blocks > 2e9 and n_blocks < staged.n1:
                n_blocks *= 2
    enc_chunk = staged.n1 * staged.chunk_a if staged else 512
    for lvl, nn in ((start_level, enc_chunk), (prod_level, 1024)):
        sds = lambda *s, dt=np.int64: jax.ShapeDtypeStruct(s, dt)
        backend._encode_embed_jit(lvl).lower(
            sds(nn, rows, dt=u64)).compile()
        backend._encrypt_jit(lvl).lower(
            sds(nn, n), sds(nn, n), sds(nn, n),
            sds(nn, lvl + 1, n, dt=u64),
            sds(lvl + 1, n, dt=u64), sds(lvl + 1, n, dt=u64)).compile()
    if staged is not None:
        if use_cells:
            staged.precompile_cells(n_blocks, committer.meta.queries)
        else:
            staged.precompile()
        from lumenos_tpu.fhe.ligero import precompile_products_extract
        precompile_products_extract(backend, staged, cols, prod_level)
        fn_enc_c = None
        fn_prodmat_c = None
    else:
        fn_enc = build_encode_pipeline_full(backend, field, ext_cols, start_level)
        fn_enc_c = fn_enc.lower(jax.ShapeDtypeStruct(
            (ext_cols, 2, start_level + 1, n), u64)).compile()
        from lumenos_tpu.fhe.backend import CtBatch as _CtB
        fn_prodmat = jax.jit(lambda d: backend.rescale_to(
            _CtB(data=d, level=start_level), prod_level).data)
        fn_prodmat_c = fn_prodmat.lower(jax.ShapeDtypeStruct(
            (cols, 2, start_level + 1, n), u64)).compile()
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
    pchunk = cols // n_pchunks
    fn_prod_c1 = fn_prod.lower(
        jax.ShapeDtypeStruct((pchunk, 2, prod_level + 1, n), u64),
        jax.ShapeDtypeStruct((prod_level + 1, n), u64),
        jax.ShapeDtypeStruct((prod_level + 1, n), u64)).compile()
    if n_pchunks > 1:
        fn_pslice = jax.jit(
            lambda d, c0: jax.lax.dynamic_slice_in_dim(d, c0, pchunk, 0)
        ).lower(jax.ShapeDtypeStruct((cols, 2, prod_level + 1, n), u64),
                jax.ShapeDtypeStruct((), np.int32)).compile()

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
    # queried-column gather: AOT like every other device program (an eager
    # fancy-index here costs an online compile round-trip over the tunnel)
    if staged is None or not use_cells:
        import jax.numpy as _jnp
        fn_gather_c = jax.jit(lambda bdat, i: bdat[i]).lower(
            jax.ShapeDtypeStruct((ext_cols, 2, 2, n), u64),
            jax.ShapeDtypeStruct((committer.meta.queries,), _jnp.int32),
        ).compile()
    t_compile = time.perf_counter() - t0
    print(f"[{rows}x{cols}] precompile: {t_compile:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    matrix = random_matrix_row_major(rows, cols, t)
    full_vals = np.zeros((ext_cols, rows), dtype=np.uint64)
    full_vals[:cols] = matrix.T
    if staged is not None:
        # stage-A input chunks are encrypted JUST-IN-TIME inside the staged
        # run (client work, untimed) so only one is ever device-resident.
        # enc_rng_state lets the products pass REPLAY the identical
        # ciphertext stream (= a production server re-reading received
        # bytes; fhe/ligero.py commit_streaming).
        grid = full_vals.reshape(staged.n1, staged.n2, rows)
        enc_rng_state = rng.bit_generator.state

        def make_chunk(jc):
            j0 = jc * staged.chunk_a
            vals = np.ascontiguousarray(
                grid[:, j0:j0 + staged.chunk_a].reshape(-1, rows))
            ct = backend.encrypt_values(vals, pk, rng, level=start_level)
            return ct.data.reshape(
                (staged.n1, staged.chunk_a) + ct.data.shape[1:])

        full_ct = None
    else:
        full_ct = encrypt_big_batch(backend, full_vals, pk, rng, start_level,
                                    chunk=512)
        sync(full_ct.data)
    print(f"[{rows}x{cols}] matrix gen + encrypt: "
          f"{time.perf_counter()-t0:.1f}s", file=sys.stderr)

    # challenge plaintexts (host transcript; device encode, one program)
    tr = Transcript("bench")
    r = np.array([x % t for x in tr.sample_uints("r", rows)], dtype=np.uint64)
    point = 7
    b = _powers(field, pow(point, cols, t), rows)
    import jax.numpy as jnp
    pt_r, pt_b = fn_chal(jnp.asarray(r), jnp.asarray(np.asarray(b, np.uint64)))

    # timed run: full server prove = device programs (encode + fused leaf
    # digests + inner products) + host tree fold + query openings
    from lumenos_tpu.ops.sha256_jax import digests_to_bytes

    def overlapped_tail(gather, digests, prod_data):
        """Products + Merkle fold + query openings, with the queried-column
        device->host transfer riding concurrently. Sound: query indices
        depend only on transcript state BEFORE the products (same order
        as fhe/ligero.py prove and the reference prover).
        `gather(positions) -> [k, 2, 2, N]` device array.
        Returns (t_prod, t_merkle, t_query, idxs, leaf_np, paths)."""
        t0b = time.perf_counter()
        tr.append_field("point", point)
        idxs = sample_query_indices(tr, committer.meta.queries, cols * rho)
        leaf_dev = gather(idxs)
        sync(leaf_dev)
        t_gather = time.perf_counter() - t0b
        print(f"[{rows}x{cols}]   tail: gather {t_gather:.2f}s",
              file=sys.stderr)
        # LUMENOS_D2H_SLICES=k: k concurrent async copies (separate relay
        # streams aggregate bandwidth on some links; scripts/
        # check_transfer.py measures whether they do here)
        k_slices = int(os.environ.get("LUMENOS_D2H_SLICES", "1"))
        parts = ([leaf_dev[i::k_slices] for i in range(k_slices)]
                 if k_slices > 1 else [leaf_dev])
        for part in parts:
            try:
                part.copy_to_host_async()
            except Exception:   # no async d2h: sync np.asarray below
                break
        t_cp = time.perf_counter()
        mr_chunks, mz_chunks = fn_prod_c(prod_data, pt_r, pt_b)
        for _m in mr_chunks:
            sync(_m)
        backend.mul_count += 2 * cols   # one ct x pt per column per challenge
        t1 = time.perf_counter()
        print(f"[{rows}x{cols}]   tail: products(+xfer in flight) "
              f"{t1 - t_cp:.2f}s", file=sys.stderr)
        t_prod = t1 - t0b
        overlapped_tail.t_prod_done = t1
        overlapped_tail.mr1 = mr_chunks
        tree = FastMerkleTree(digests_to_bytes(np.asarray(digests)))
        t_merkle = time.perf_counter() - t1
        t2 = time.perf_counter()
        if k_slices > 1:
            outs = [np.asarray(p) for p in parts]
            leaf_np = np.empty((len(idxs),) + outs[0].shape[1:],
                               dtype=outs[0].dtype)
            for i, o in enumerate(outs):
                leaf_np[i::k_slices] = o
        else:
            leaf_np = np.asarray(leaf_dev)
        print(f"[{rows}x{cols}]   tail: transfer residual "
              f"{time.perf_counter() - t2:.2f}s "
              f"({leaf_np.nbytes/1e6:.0f} MB)", file=sys.stderr)
        paths = [tree.get_path(i) for i in idxs]
        return (t_prod, t_merkle, time.perf_counter() - t2, idxs, leaf_np,
                paths)

    t0 = time.perf_counter()
    if staged is not None:
        if use_cells:
            cells_blocks, digests, enc_scales, t_encode_run = \
                staged.run_streaming_cells(
                    make_chunk, staged.n2 // staged.chunk_a,
                    n_blocks=n_blocks)
            gather = lambda ps: staged.gather_positions(cells_blocks, ps)
        else:
            enc_ct, digests, enc_scales, t_encode_run = staged.run_streaming(
                make_chunk, staged.n2 // staged.chunk_a)
            enc1 = enc_ct.data
            sync(enc1)
            gather = lambda ps: fn_gather_c(
                enc1, jnp.asarray(np.asarray(ps, np.int32)))
        # products-level matrix: SECOND PASS over the client's ciphertext
        # stream, rescaled on device (server work, COUNTED) - never
        # re-encrypted (fhe/ligero.py derive_products_matrix). Chunk
        # re-encryption below replays the client's exact bytes (untimed).
        from lumenos_tpu.fhe.ligero import derive_products_matrix
        rng.bit_generator.state = enc_rng_state
        prod_ct, t_prodmat = derive_products_matrix(
            backend, staged, make_chunk, cols, prod_level)
        sync(prod_ct.data)
        print(f"[{rows}x{cols}] products-matrix rescale: {t_prodmat:.2f}s",
              file=sys.stderr)
        t_prod, t_merkle, t_query, idxs, leaf_np, paths = overlapped_tail(
            gather, digests, prod_ct.data)
        print(f"[{rows}x{cols}] device split: encode {t_encode_run:.2f}s "
              f"prodmat {t_prodmat:.2f}s "
              f"products(+transfer overlap) {t_prod:.2f}s", file=sys.stderr)
        t_device = t_encode_run + t_prodmat + t_prod
    else:
        # products-level matrix from the encode-level cts (counted)
        te = time.perf_counter()
        prod_data = fn_prodmat_c(full_ct.data[:cols])
        sync(prod_data)
        t_prodmat = time.perf_counter() - te
        enc1, digests = fn_enc_c(full_ct.data)
        enc_scales = None
        gather = lambda ps: fn_gather_c(
                enc1, jnp.asarray(np.asarray(ps, np.int32)))
        # no block on enc1: the tail's gather/products enqueue behind the
        # encode on the device stream while the host samples the queries
        t_prod, t_merkle, t_query, idxs, leaf_np, paths = overlapped_tail(
            gather, digests, prod_data)
        t_device = overlapped_tail.t_prod_done - t0

    spot_ok = None
    if check:
        # spot-check: a few decrypted codeword positions vs plaintext oracle
        from lumenos_tpu.core.ligero_plain import _encode_fn
        from lumenos_tpu.fhe.backend import CtBatch
        scales = (enc_scales if enc_scales is not None
                  else ligero_ntt_scales(t, field.n, cols * rho))
        check_pos = [0, 1, cols, cols * rho - 1]
        # pad to the query count: gather is one AOT program of that shape
        padded = check_pos + [0] * (committer.meta.queries - len(check_pos))
        sub = CtBatch(data=gather(padded)[:len(check_pos)], level=1)
        dec = np.asarray(backend.decrypt_values(sub, sk, rows))
        pt_enc = np.asarray(_encode_fn(field, rho)(
            jnp.asarray(matrix[:4, :], jnp.uint64)))  # first 4 rows encoded
        spot_ok = True
        for ci, p in enumerate(check_pos):
            sig_inv = pow(int(scales[p]), t - 2, t)
            got = [int(dec[ci, rr]) * sig_inv % t for rr in range(4)]
            exp = [int(pt_enc[rr, p]) for rr in range(4)]
            if got != exp:
                spot_ok = False
        # inner-product spot-check: MatR c0-decode vs host oracle
        r_obj = r.astype(object)
        for j in (0, cols - 1):
            c0 = int(np.asarray(backend.decrypt_c0(
                CtBatch(data=overlapped_tail.mr1[j // pchunk][
                    jnp.asarray([j % pchunk])],
                        level=1), sk))[0])  # products rescale to level 1
            exp_ip = int((matrix[:, j].astype(object) * r_obj).sum() % t)
            if c0 * params.n % t != exp_ip:
                spot_ok = False
        print(f"[{rows}x{cols}] spot-check decrypt vs plaintext oracle: "
              f"{'OK' if spot_ok else 'MISMATCH'}", file=sys.stderr)
        if not spot_ok:
            raise SystemExit("bench correctness spot-check failed")

    total = t_device + t_merkle + t_query
    print(f"[{rows}x{cols}] device(encode+inner): {t_device:.2f}s "
          f"merkle: {t_merkle:.2f}s query: {t_query:.2f}s "
          f"total: {total:.2f}s", file=sys.stderr)

    ref = REFERENCE.get((rows, cols), {}).get("prove_total")
    vs = (ref / total) if ref else 0.0
    # BASELINE.json metric "NTT butterflies/s/chip": one butterfly =
    # one Shoup mulmod + one modular add per (position, poly, limb,
    # coeff) lane of one schedule layer of the homomorphic encode.
    import math
    if staged is not None:
        n_bf = (ext_cols * n * 2
                * (math.log2(staged.n1) * (staged.level + 1)
                   + math.log2(staged.n2) * (staged.mid + 1)))
    else:
        n_bf = ext_cols * n * 2 * math.log2(ext_cols) * (start_level + 1)
    enc_s = t_encode_run if staged is not None else t_device
    return {
        "logn": log_n,
        "total_s": round(total, 3),
        "device_s": round(t_device, 3),
        "prodmat_s": round(t_prodmat, 3),
        "merkle_s": round(t_merkle, 3),
        "query_s": round(t_query, 3),
        "compile_s": round(t_compile, 1),
        "vs_baseline": round(vs, 2),
        "spot_check": spot_ok,
        "reference_s": ref,
        "butterfly_mulmods_per_s": round(n_bf / max(enc_s, 1e-9), 0),
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
    _tunnel_guard()
    budget = float(os.environ.get("LUMENOS_BENCH_BUDGET", 2200))
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
        if i > 0 and elapsed > 0.45 * budget:
            print(f"bench: skipping {rows}x{cols} (elapsed {elapsed:.0f}s "
                  f"> 45% of {budget:.0f}s budget)", file=sys.stderr)
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


if __name__ == "__main__":
    main()
