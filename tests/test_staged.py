"""Staged two-pass encode == monolithic encode (values, order, scales)."""

import numpy as np
import pytest

import jax.numpy as jnp

from lumenos_tpu.core.field import PrimeField, GOLDILOCKS_57
from lumenos_tpu.fhe.backend import BgvBackend, CtBatch
from lumenos_tpu.fhe.hntt import homomorphic_ligero_ntt, ligero_ntt_scales
from lumenos_tpu.fhe.params import BgvParams
from lumenos_tpu.fhe.staged import StagedEncode

T = GOLDILOCKS_57
LOG_N = 4
N = 1 << LOG_N
SIZE = 16  # n1 = n2 = 4


@pytest.fixture(scope="module")
def setup():
    params = BgvParams.generate(
        log_n=LOG_N, log_q=[58, 56, 56, 56, 56, 56], log_p=[55, 55], t=T)
    backend = BgvBackend(params)
    rng = np.random.default_rng(3)
    sk, pk = backend.keygen(rng)
    field = PrimeField(T, SIZE)
    vals = np.random.default_rng(1).integers(0, T, (SIZE, N)).astype(np.uint64)
    ct = backend.encrypt_values(vals, pk, rng, level=5)
    return backend, sk, field, ct


def test_staged_matches_monolithic(setup):
    backend, sk, field, ct = setup
    # monolithic reference: transform + rescale to 1
    mono, scales_mono = homomorphic_ligero_ntt(backend, ct, field, SIZE)
    mono1 = backend.rescale_to(mono, 1)
    dec_mono = np.asarray(backend.decrypt_values(mono1, sk))

    st = StagedEncode(backend, field, SIZE, start_level=5, mid_level=3,
                      chunk_a=2, chunk_b=2)
    st.precompile()
    # j-chunk order: cells (i, j) i-major per j-chunk
    grid = ct.data.reshape((st.n1, st.n2) + ct.data.shape[1:])
    chunks = [jnp.asarray(np.ascontiguousarray(
        np.asarray(grid[:, j0:j0 + st.chunk_a])))
        for j0 in range(0, st.n2, st.chunk_a)]
    out_ct, digests, scales_staged = st.run(chunks)
    dec_staged = np.asarray(backend.decrypt_values(out_ct, sk))

    # scales must match the monolithic schedule
    assert [int(x) for x in scales_staged] == [int(x) for x in scales_mono]
    # decrypted values: staged output went through extra rescales (exact
    # plaintext-preserving), so values must agree position-wise
    assert np.array_equal(dec_staged, dec_mono)


def test_staged_digests_match_leaves(setup):
    backend, sk, field, ct = setup
    from lumenos_tpu.ops.sha256_jax import ct_leaf_digest_host, digests_to_bytes
    from lumenos_tpu.fhe.ligero import ct_leaf_bytes
    st = StagedEncode(backend, field, SIZE, start_level=5, mid_level=3,
                      chunk_a=2, chunk_b=2)
    grid = ct.data.reshape((st.n1, st.n2) + ct.data.shape[1:])
    chunks = [jnp.asarray(np.ascontiguousarray(np.asarray(grid[:, j0:j0 + st.chunk_a])))
              for j0 in range(0, st.n2, st.chunk_a)]
    out_ct, digests, _ = st.run(chunks)
    got = digests_to_bytes(np.asarray(digests))
    leaf_np = np.asarray(out_ct.data)
    for i in range(SIZE):
        assert got[i] == ct_leaf_digest_host(ct_leaf_bytes(leaf_np, i))


def test_streaming_cells_matches_run(setup):
    """Cells-layout streaming (the 16384-config memory shape) must be
    bit-identical to run(): same level-1 values, same reference-order
    digests, same scales, and gather_positions must return the same
    columns as indexing the flat output."""
    backend, sk, field, ct = setup
    st = StagedEncode(backend, field, SIZE, start_level=5, mid_level=3,
                      chunk_a=2, chunk_b=2)
    grid = ct.data.reshape((st.n1, st.n2) + ct.data.shape[1:])
    chunks = [jnp.asarray(np.ascontiguousarray(np.asarray(
        grid[:, j0:j0 + st.chunk_a])))
        for j0 in range(0, st.n2, st.chunk_a)]
    flat_ct, digests, scales = st.run(chunks)
    flat = np.asarray(flat_ct.data)

    def make_chunk(k):
        return jnp.asarray(np.ascontiguousarray(np.asarray(
            grid[:, k * st.chunk_a:(k + 1) * st.chunk_a])))

    cells_blocks, dig_ref, scales_c, t_dev = st.run_streaming_cells(
        make_chunk, st.n2 // st.chunk_a, n_blocks=2)
    # digests in reference order match the flat path
    assert np.array_equal(dig_ref, np.asarray(digests))
    assert [int(x) for x in scales_c] == [int(x) for x in scales]
    # gathered positions equal flat indexing
    pos = [0, 1, st.n1, SIZE - 1, 7]
    got = np.asarray(st.gather_positions(cells_blocks, pos))
    assert np.array_equal(got, flat[np.array(pos)])
    # full reassembly: cells (i-major blocks) -> reference order
    all_cells = np.concatenate([np.asarray(b) for b in cells_blocks], axis=0)
    reassembled = all_cells.reshape(SIZE, *flat.shape[1:])[st.ref_to_cell_perm()]
    assert np.array_equal(reassembled, flat)


def test_streaming_cells_asymmetric_blocks(setup):
    """n1 != n2 with several mid blocks (the 16384-config shape class:
    n1=64, n2=128, n_blocks=8 - here scaled down to n1=4, n2=8,
    n_blocks=4, chunk_a=2)."""
    backend, sk, field, ct = setup
    SIZE2 = 32
    vals = np.random.default_rng(5).integers(
        0, T, (SIZE2, N)).astype(np.uint64)
    rngk = np.random.default_rng(8)
    sk2, pk2 = backend.keygen(rngk)
    ct2 = backend.encrypt_values(vals, pk2, rngk, level=5)
    f2 = PrimeField(T, SIZE2)
    st = StagedEncode(backend, f2, SIZE2, start_level=5, mid_level=3,
                      chunk_a=2, chunk_b=2)
    assert (st.n1, st.n2) == (4, 8)
    grid = ct2.data.reshape((st.n1, st.n2) + ct2.data.shape[1:])
    chunks = [jnp.asarray(np.ascontiguousarray(np.asarray(
        grid[:, j0:j0 + st.chunk_a])))
        for j0 in range(0, st.n2, st.chunk_a)]
    flat_ct, digests, scales = st.run(chunks)
    flat = np.asarray(flat_ct.data)

    def make_chunk(k):
        return jnp.asarray(np.ascontiguousarray(np.asarray(
            grid[:, k * st.chunk_a:(k + 1) * st.chunk_a])))

    cells_blocks, dig_ref, scales_c, _ = st.run_streaming_cells(
        make_chunk, st.n2 // st.chunk_a, n_blocks=4)
    assert len(cells_blocks) == 4 and cells_blocks[0].shape[0] == 1
    assert np.array_equal(dig_ref, np.asarray(digests))
    pos = [0, 3, 5, SIZE2 - 1, 17]
    got = np.asarray(st.gather_positions(cells_blocks, pos))
    assert np.array_equal(got, flat[np.array(pos)])


def test_streaming_cells_subchunked_stage_b(setup):
    """bd_cw=1 (the HBM-constrained LogN=14 shape) must be bit-identical
    to whole-block stage B."""
    backend, sk, field, ct = setup
    st = StagedEncode(backend, field, SIZE, start_level=5, mid_level=3,
                      chunk_a=2, chunk_b=2)
    grid = ct.data.reshape((st.n1, st.n2) + ct.data.shape[1:])

    def make_chunk(k):
        return jnp.asarray(np.ascontiguousarray(np.asarray(
            grid[:, k * st.chunk_a:(k + 1) * st.chunk_a])))

    full = st.run_streaming_cells(make_chunk, st.n2 // st.chunk_a,
                                  n_blocks=2)
    sub = st.run_streaming_cells(make_chunk, st.n2 // st.chunk_a,
                                 n_blocks=2, bd_cw=1)
    assert np.array_equal(sub[1], full[1])              # digests
    for a, b in zip(full[0], sub[0]):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_products_sink_and_block_gather(setup):
    """Round-4 bench path: single-pass ProductsSink output must be
    bit-identical to the two-pass derive_products_matrix, and the
    per-block early gathers (block_gather_fn via on_block) must
    reassemble exactly what the one-shot gather_positions returns."""
    from lumenos_tpu.fhe.ligero import ProductsSink, derive_products_matrix

    backend, sk, field, ct = setup
    st = StagedEncode(backend, field, SIZE, start_level=5, mid_level=3,
                      chunk_a=2, chunk_b=2)
    grid = ct.data.reshape((st.n1, st.n2) + ct.data.shape[1:])

    def make_chunk(k):
        return jnp.asarray(np.ascontiguousarray(np.asarray(
            grid[:, k * st.chunk_a:(k + 1) * st.chunk_a])))

    cols = SIZE // 2                       # rho_inv = 2
    prod_level = 2
    n_blocks = 2
    bw = st.n1 // n_blocks
    idxs = [0, 3, 7, SIZE - 1, 5, 3]       # incl. a duplicate
    block_parts = [[] for _ in range(n_blocks)]
    for oi, p in enumerate(idxs):
        i, j = p % st.n1, p // st.n1
        block_parts[i // bw].append((oi, i - (i // bw) * bw, j))
    parts_out = [None] * n_blocks

    def on_block(bi, cells_b):
        bp = block_parts[bi]
        if not bp:
            return
        ri = jnp.asarray(np.array([x[1] for x in bp], np.int32))
        ji = jnp.asarray(np.array([x[2] for x in bp], np.int32))
        parts_out[bi] = st.block_gather_fn(bw, len(bp))(cells_b, ri, ji)

    sink = ProductsSink(backend, st, cols, prod_level)
    cells_blocks, dig, scales, _ = st.run_streaming_cells(
        make_chunk, st.n2 // st.chunk_a, n_blocks=n_blocks,
        on_block=on_block, prod_sink=sink)
    single = np.asarray(sink.finish().data)

    two_pass, _ = derive_products_matrix(
        backend, st, make_chunk, cols, prod_level)
    assert np.array_equal(single, np.asarray(two_pass.data))

    # per-block gathers == one-shot gather in idxs order
    ref = np.asarray(st.gather_positions(cells_blocks, idxs))
    got = np.empty_like(ref)
    for bi in range(n_blocks):
        if parts_out[bi] is None:
            continue
        out = np.asarray(parts_out[bi])
        for k, (oi, _, _) in enumerate(block_parts[bi]):
            got[oi] = out[k]
    assert np.array_equal(got, ref)


def test_fused_prod_cfg_matches_two_pass(setup):
    """prod_cfg fused derivation (one stage-A program emits both outputs)
    must be bit-identical to derive_products_matrix AND leave the encode
    outputs unchanged."""
    from lumenos_tpu.fhe.ligero import derive_products_matrix

    backend, sk, field, ct = setup
    st = StagedEncode(backend, field, SIZE, start_level=5, mid_level=3,
                      chunk_a=2, chunk_b=2)
    grid = ct.data.reshape((st.n1, st.n2) + ct.data.shape[1:])

    def make_chunk(k):
        return jnp.asarray(np.ascontiguousarray(np.asarray(
            grid[:, k * st.chunk_a:(k + 1) * st.chunk_a])))

    cols = SIZE // 2
    prod_level = 2
    cells_f, dig_f, _, _, prod_data = st.run_streaming_cells(
        make_chunk, st.n2 // st.chunk_a, n_blocks=2,
        prod_cfg=(cols // st.n2, prod_level))
    two_pass, _ = derive_products_matrix(
        backend, st, make_chunk, cols, prod_level)
    assert np.array_equal(np.asarray(prod_data), np.asarray(two_pass.data))

    cells_p, dig_p, _, _ = st.run_streaming_cells(
        make_chunk, st.n2 // st.chunk_a, n_blocks=2)
    assert np.array_equal(dig_f, dig_p)
    for a, b in zip(cells_f, cells_p):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_streaming_cells_evict_matches(setup):
    """evict_cells mode: on_block gathers are the only consumer; the
    digests, prod matrix and gathered columns must be bit-identical to
    the keep-cells run (and the returned blocks are None)."""
    backend, sk, field, ct = setup

    def run(evict):
        st = StagedEncode(backend, field, SIZE, start_level=5, mid_level=3,
                          chunk_a=2, chunk_b=2, use_mxu=False)
        grid = ct.data.reshape((st.n1, st.n2) + ct.data.shape[1:])

        def make_chunk(jc):
            j0 = jc * st.chunk_a
            return jnp.asarray(np.ascontiguousarray(
                np.asarray(grid[:, j0:j0 + st.chunk_a])))

        bw = st.n1 // 2
        pos = [0, 3, SIZE - 1]
        parts = {}

        def on_block(b, cells_b):
            sel = [(oi, p % st.n1 - b * bw, p // st.n1)
                   for oi, p in enumerate(pos)
                   if b * bw <= p % st.n1 < (b + 1) * bw]
            if sel:
                ri = jnp.asarray(np.array([x[1] for x in sel], np.int32))
                ji = jnp.asarray(np.array([x[2] for x in sel], np.int32))
                parts[b] = (sel, st.block_gather_fn(bw, len(sel))(
                    cells_b, ri, ji))

        cb, dig, _, _, prod = st.run_streaming_cells(
            make_chunk, st.n2 // st.chunk_a, n_blocks=2,
            on_block=on_block, prod_cfg=(st.n1 // 2, 2),
            evict_cells=evict)
        got = {}
        for b, (sel, part) in parts.items():
            arr = np.asarray(part)
            for k, (oi, _, _) in enumerate(sel):
                got[oi] = arr[k]
        return cb, np.asarray(dig), np.asarray(prod), got

    cb_k, dig_k, prod_k, got_k = run(False)
    cb_e, dig_e, prod_e, got_e = run(True)
    assert all(c is None for c in cb_e)
    assert any(c is not None for c in cb_k)
    assert np.array_equal(dig_k, dig_e)
    assert np.array_equal(prod_k, prod_e)
    for oi in got_k:
        assert np.array_equal(got_k[oi], got_e[oi])
