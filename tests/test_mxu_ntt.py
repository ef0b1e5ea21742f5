"""MXU matmul transform == schedule executor, bit-for-bit.

The digit-decomposed int8 matmul formulation (ops/mxu_ntt.py) must
reproduce the recorded-schedule executor exactly: same residues, same
order, same scales, through the full staged encode.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from lumenos_tpu.core.field import GOLDILOCKS_57, PrimeField, get_field
from lumenos_tpu.fhe.backend import BgvBackend
from lumenos_tpu.fhe.hsched import apply_schedule_full, unit_schedule
from lumenos_tpu.fhe.params import BgvParams
from lumenos_tpu.fhe.staged import StagedEncode
from lumenos_tpu.ops.mxu_ntt import (
    apply_schedule_np, group_transform, probe_unit_matrix)

T = GOLDILOCKS_57
LOG_N = 4
N = 1 << LOG_N
SIZE = 16


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


def test_numpy_executor_matches_jax():
    """apply_schedule_np (the probe mirror) == hsched.apply_schedule."""
    field = get_field(T, 64)
    sched = unit_schedule(field, 8, 64)
    primes = [(1 << 58) - 27, (1 << 56) - 5]
    res = sched.residues(primes)
    q = np.array(primes, np.uint64)
    rng = np.random.default_rng(0)
    x = (rng.integers(0, primes[0], (64, len(primes), 8))
         .astype(np.uint64) % q[None, :, None])
    got = apply_schedule_np(x.copy(), sched, res[0], res[1], q)
    got = got[np.asarray(sched.final_pos)]
    # jax executor expects [n, 2, L, N]-ish: any trailing dims work
    exp = np.asarray(apply_schedule_full(
        jnp.asarray(x[:, None]), sched, res, q))[:, 0]
    assert np.array_equal(got, exp)


@pytest.mark.parametrize("size,groups", [(8, 4), (16, 2), (64, 1)])
def test_group_transform_matches_schedule(size, groups):
    """MXU group transform == schedule executor on the unit schedule."""
    field = get_field(T, 64)
    n = size * groups
    sched = unit_schedule(field, size, n)
    primes = [(1 << 58) - 27, (1 << 56) - 5, (1 << 56) - 113]
    res = sched.residues(primes)
    q = np.array(primes, np.uint64)
    rng = np.random.default_rng(7)
    N_c = 128
    x = (rng.integers(0, primes[0], (n, 2, len(primes), N_c))
         .astype(np.uint64) % q[None, None, :, None])
    exp = np.asarray(apply_schedule_full(jnp.asarray(x), sched, res, q))
    got = np.asarray(group_transform(jnp.asarray(x), field, size, q))
    assert np.array_equal(got, exp)


def test_probe_matrix_is_the_linear_map():
    """Probed M applied as a plain big-int matmul == executor output."""
    field = get_field(T, 64)
    primes = [(1 << 58) - 27, (1 << 56) - 5]
    M = probe_unit_matrix(field, 8, primes)
    sched = unit_schedule(field, 8, 8)
    res = sched.residues(primes)
    q = np.array(primes, np.uint64)
    rng = np.random.default_rng(1)
    x = (rng.integers(0, primes[0], (8, len(primes), 4))
         .astype(np.uint64) % q[None, :, None])
    exp = apply_schedule_np(x.copy(), sched, res[0], res[1], q)
    exp = exp[np.asarray(sched.final_pos)]
    for l, p in enumerate(primes):
        got = (M[l].astype(object) @ x[:, l].astype(object)) % p
        assert np.array_equal(got.astype(np.uint64), exp[:, l])


def test_staged_mxu_matches_schedule(setup):
    """Full staged encode: MXU path == schedule path, bit-for-bit
    (values, digests, scales) — exercises the stage-B diagonal
    factorization M_i = diag(f) T diag(d)."""
    backend, sk, field, ct = setup

    def run(use_mxu):
        st = StagedEncode(backend, field, SIZE, start_level=5, mid_level=3,
                          chunk_a=2, chunk_b=2, use_mxu=use_mxu)
        assert st.use_mxu == use_mxu  # factorization must not fall back
        grid = ct.data.reshape((st.n1, st.n2) + ct.data.shape[1:])
        chunks = [jnp.asarray(np.ascontiguousarray(
            np.asarray(grid[:, j0:j0 + st.chunk_a])))
            for j0 in range(0, st.n2, st.chunk_a)]
        return st.run(chunks)

    out_s, dig_s, sc_s = run(False)
    out_m, dig_m, sc_m = run(True)
    assert np.array_equal(np.asarray(out_s.data), np.asarray(out_m.data))
    assert np.array_equal(np.asarray(dig_s), np.asarray(dig_m))
    assert [int(x) for x in sc_s] == [int(x) for x in sc_m]


def test_streaming_cells_mxu_matches(setup):
    """Cells-mode streaming with the fused products derivation: MXU ==
    schedule path bit-for-bit (cells blocks, digests, prod matrix)."""
    backend, sk, field, ct = setup

    def run(use_mxu):
        st = StagedEncode(backend, field, SIZE, start_level=5, mid_level=3,
                          chunk_a=2, chunk_b=2, use_mxu=use_mxu)
        grid = ct.data.reshape((st.n1, st.n2) + ct.data.shape[1:])

        def make_chunk(jc):
            j0 = jc * st.chunk_a
            return jnp.asarray(np.ascontiguousarray(
                np.asarray(grid[:, j0:j0 + st.chunk_a])))
        return st.run_streaming_cells(
            make_chunk, st.n2 // st.chunk_a, n_blocks=2,
            prod_cfg=(st.n1 // 2, 2))

    cb_s, dig_s, _, _, prod_s = run(False)
    cb_m, dig_m, _, _, prod_m = run(True)
    for a, b in zip(cb_s, cb_m):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    assert np.array_equal(dig_s, dig_m)
    assert np.array_equal(np.asarray(prod_s), np.asarray(prod_m))
