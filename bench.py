"""Benchmark: homomorphic Ligero server prove on the real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = reference_seconds / our_seconds (speedup; >1 means faster
than the reference's 32-vCPU m7i.8xlarge numbers, BASELINE.md).

Config via env: LUMENOS_BENCH_ROWS/COLS/LOGN (default 2048x1024 @ LogN=12,
the reference's first benchmark column). The full prove-eval wall time
(encode + Merkle + inner products + query) is measured after a warmup run
(jit compile cached persistently; see lumenos_tpu/jaxcfg.py).
"""

import json
import os
import sys
import time

import numpy as np


def jnp_copy(x):
    import jax.numpy as jnp
    return jnp.array(x, copy=True)


# reference numbers (BASELINE.md): rows x cols -> (prove_eval_total_s,
# commit_encode_s, merkle_s) on m7i.8xlarge, 32 vCPU
REFERENCE = {
    (2048, 1024): {"prove_total": 9.61 + 5.17 + 1.03, "logn": 12},
    (4096, 2048): {"prove_total": 24.17 + 12.63 + 2.04, "logn": 12},
    (8192, 4096): {"prove_total": 113.16 + 66.78 + 9.17, "logn": 13},
    (16384, 4096): {"prove_total": 255.12 + 142.73 + 18.79, "logn": 14},
}


def main() -> None:
    rows = int(os.environ.get("LUMENOS_BENCH_ROWS", 2048))
    cols = int(os.environ.get("LUMENOS_BENCH_COLS", 1024))
    log_n = int(os.environ.get("LUMENOS_BENCH_LOGN",
                               REFERENCE.get((rows, cols), {}).get("logn", 12)))
    rho = 2

    from lumenos_tpu.core.field import GOLDILOCKS_57, PrimeField
    from lumenos_tpu.core.chacha import random_matrix_row_major
    from lumenos_tpu.core.ligero_plain import LigeroCommitter
    from lumenos_tpu.core.merkle_fast import FastMerkleTree
    from lumenos_tpu.core.transcript import Transcript
    from lumenos_tpu.core.ligero_plain import _powers, sample_query_indices
    from lumenos_tpu.fhe.backend import BgvBackend
    from lumenos_tpu.fhe.ligero import ct_leaf_bytes
    from lumenos_tpu.fhe.params import generate_bgv_params_for_ntt
    from lumenos_tpu.fhe.pipeline import (
        build_encode_pipeline_full, build_products_pipeline)
    from lumenos_tpu.fhe.hntt import min_start_level, ligero_ntt_scales
    from lumenos_tpu.fhe.bigbatch import encrypt_big_batch

    t = GOLDILOCKS_57
    t0 = time.perf_counter()
    params = generate_bgv_params_for_ntt(cols, log_n, t)
    backend = BgvBackend(params)
    field = PrimeField(t, cols * rho)
    rng = np.random.default_rng(1)
    sk, pk = backend.keygen(rng)
    committer = LigeroCommitter(128, rows, cols, rho)
    print(f"setup: {time.perf_counter()-t0:.1f}s "
          f"(L={params.max_level+1} limbs, N={params.n})", file=sys.stderr)

    start_level = min_start_level(params, cols * rho)
    prod_level = 2   # one pt-mul of headroom (DESIGN.md budget analysis)
    print(f"start level: {start_level} ({start_level+1} limbs of "
          f"{params.max_level+1}); products at level {prod_level}",
          file=sys.stderr)

    # pre-compile EVERY device program before any large allocation exists
    # (trace/compile with a ~full chip is what OOMs at the big configs)
    import jax
    t0 = time.perf_counter()
    ext_cols = cols * rho
    n = params.n
    u64 = np.uint64
    # staged two-pass encode for batches whose monolithic program exceeds
    # HBM liveness (DESIGN.md section 7 / fhe/staged.py)
    staged = None
    if ext_cols * 2 * (start_level + 1) * n * 8 > 1.5e9:  # batch bytes beyond safe monolithic liveness
        from lumenos_tpu.fhe.staged import StagedEncode
        staged = StagedEncode(backend, field, ext_cols, start_level)
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
        staged.precompile()
        fn_enc_c = None
    else:
        fn_enc = build_encode_pipeline_full(backend, field, ext_cols, start_level)
        fn_enc_c = fn_enc.lower(jax.ShapeDtypeStruct(
            (ext_cols, 2, start_level + 1, n), u64)).compile()
    fn_prod = build_products_pipeline(backend, level=prod_level)
    fn_prod_c = fn_prod.lower(
        jax.ShapeDtypeStruct((cols, 2, prod_level + 1, n), u64),
        jax.ShapeDtypeStruct((prod_level + 1, n), u64),
        jax.ShapeDtypeStruct((prod_level + 1, n), u64)).compile()
    print(f"precompile: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    matrix = random_matrix_row_major(rows, cols, t)
    full_vals = np.zeros((ext_cols, rows), dtype=np.uint64)
    full_vals[:cols] = matrix.T
    if staged is not None:
        # stage-A input chunks are encrypted JUST-IN-TIME inside the staged
        # run (client work, untimed) so only one is ever device-resident
        grid = full_vals.reshape(staged.n1, staged.n2, rows)

        def make_chunk(jc):
            j0 = jc * staged.chunk_a
            vals = np.ascontiguousarray(
                grid[:, j0:j0 + staged.chunk_a].reshape(-1, rows))
            ct = backend.encrypt_values(vals, pk, rng, level=start_level)
            return ct.data.reshape(
                (staged.n1, staged.chunk_a) + ct.data.shape[1:])

        full_ct = None
        prod_ct = None
    else:
        full_ct = encrypt_big_batch(backend, full_vals, pk, rng, start_level,
                                    chunk=512)
        prod_ct = encrypt_big_batch(backend, np.ascontiguousarray(matrix.T),
                                    pk, rng, prod_level, chunk=1024)
        prod_ct.data.block_until_ready()
    print(f"matrix gen + encrypt: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    # challenge plaintexts (host transcript + encode)
    tr = Transcript("bench")
    r = np.array([x % t for x in tr.sample_uints("r", rows)], dtype=np.uint64)
    point = 7
    b = _powers(field, pow(point, cols, t), rows)
    enc = backend.encoder
    pt_r = backend._ntt(enc.lift_to_rns(enc.encode(r), prod_level), prod_level)
    pt_b = backend._ntt(enc.lift_to_rns(enc.encode(b), prod_level), prod_level)

    # timed run: full server prove = device programs (encode + fused leaf
    # digests + inner products) + host tree fold + query openings
    t0 = time.perf_counter()
    if staged is not None:
        enc_ct, digests, enc_scales, t_encode_run = staged.run_streaming(
            make_chunk, staged.n2 // staged.chunk_a)
        enc1 = enc_ct.data
        enc1.block_until_ready()
        te = time.perf_counter()
        prod_ct = encrypt_big_batch(backend, np.ascontiguousarray(matrix.T),
                                    pk, rng, prod_level, chunk=1024)
        prod_ct.data.block_until_ready()
        print(f"(prod encrypt, not counted: {time.perf_counter()-te:.1f}s)",
              file=sys.stderr)
        t0b = time.perf_counter()
        mr1, mz1 = fn_prod_c(prod_ct.data, pt_r, pt_b)
        mr1.block_until_ready()
        t_device = t_encode_run + (time.perf_counter() - t0b)
    else:
        enc1, digests = fn_enc_c(full_ct.data)
        enc_scales = None
        mr1, mz1 = fn_prod_c(prod_ct.data, pt_r, pt_b)
        enc1.block_until_ready()
        mr1.block_until_ready()
        t_device = time.perf_counter() - t0

    t1 = time.perf_counter()
    from lumenos_tpu.ops.sha256_jax import digests_to_bytes
    tree = FastMerkleTree(digests_to_bytes(np.asarray(digests)))
    t_merkle = time.perf_counter() - t1

    t2 = time.perf_counter()
    tr.append_field("point", point)
    idxs = sample_query_indices(tr, committer.meta.queries, cols * rho)
    # open queried columns: device gather, transfer only ~queries leaves
    import jax.numpy as jnp
    leaf_np = np.asarray(enc1[jnp.asarray(np.array(idxs))])
    paths = [tree.get_path(i) for i in idxs]
    t_query = time.perf_counter() - t2

    if os.environ.get("LUMENOS_BENCH_CHECK"):
        # spot-check: a few decrypted codeword positions vs plaintext oracle
        from lumenos_tpu.core.ligero_plain import _encode_fn
        from lumenos_tpu.fhe.backend import CtBatch
        scales = (enc_scales if enc_scales is not None
                  else ligero_ntt_scales(t, field.n, cols * rho))
        check_pos = [0, 1, cols, cols * rho - 1]
        sub = CtBatch(data=enc1[jnp.asarray(np.array(check_pos))], level=1)
        dec = np.asarray(backend.decrypt_values(sub, sk, rows))
        pt_enc = np.asarray(_encode_fn(field, rho)(
            jnp.asarray(matrix[:4, :], jnp.uint64)))  # first 4 rows encoded
        ok = True
        for ci, p in enumerate(check_pos):
            sig_inv = pow(int(scales[p]), t - 2, t)
            got = [int(dec[ci, rr]) * sig_inv % t for rr in range(4)]
            exp = [int(pt_enc[rr, p]) for rr in range(4)]
            if got != exp:
                ok = False
        print(f"spot-check decrypt vs plaintext oracle: "
              f"{'OK' if ok else 'MISMATCH'}", file=sys.stderr)
        if not ok:
            raise SystemExit("bench correctness spot-check failed")

    total = t_device + t_merkle + t_query
    print(f"device(encode+inner): {t_device:.2f}s merkle: {t_merkle:.2f}s "
          f"query: {t_query:.2f}s total: {total:.2f}s", file=sys.stderr)

    ref = REFERENCE.get((rows, cols), {}).get("prove_total")
    vs = (ref / total) if ref else 0.0
    print(json.dumps({
        "metric": f"homomorphic_ligero_server_prove_{rows}x{cols}_logN{log_n}",
        "value": round(total, 3),
        "unit": "s",
        "vs_baseline": round(vs, 2),
    }))


if __name__ == "__main__":
    main()
