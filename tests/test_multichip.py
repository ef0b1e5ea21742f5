"""Multi-chip sharding: the server pipeline over an 8-device CPU mesh.

The ciphertext axis is sharded (parallel/mesh.py); the transform's
transposes become collectives under GSPMD. Results must be bit-identical
to the single-device run.
"""

import numpy as np
import pytest

import jax

from lumenos_tpu.core.field import GOLDILOCKS_57, PrimeField
from lumenos_tpu.fhe.backend import BgvBackend
from lumenos_tpu.fhe.params import BgvParams
from lumenos_tpu.fhe.pipeline import build_server_pipeline
from lumenos_tpu.parallel.mesh import ct_sharding, make_mesh, pt_replicated

T = GOLDILOCKS_57
LOG_N = 4
N = 1 << LOG_N
COLS, RHO = 16, 2


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    params = BgvParams.generate(log_n=LOG_N, log_q=[58, 56, 56], log_p=[55, 55], t=T)
    backend = BgvBackend(params)
    field = PrimeField(T, COLS * RHO)
    rng = np.random.default_rng(17)
    sk, pk = backend.keygen(rng)
    vals = np.random.default_rng(1).integers(0, T, (COLS, N)).astype(np.uint64)
    mat_ct = backend.encrypt_values(vals, pk, rng)
    zeros_ct = backend.encrypt_values(
        np.zeros((COLS * (RHO - 1), N), dtype=np.uint64), pk, rng)
    enc = backend.encoder
    lvl = params.max_level
    g = np.random.default_rng(2)
    pt_r = backend._ntt(enc.lift_to_rns(enc.encode(
        g.integers(0, T, N).astype(np.uint64)), lvl), lvl)
    pt_b = backend._ntt(enc.lift_to_rns(enc.encode(
        g.integers(0, T, N).astype(np.uint64)), lvl), lvl)
    return backend, field, mat_ct, zeros_ct, pt_r, pt_b


def test_sharded_pipeline_matches_single_device(setup):
    backend, field, mat_ct, zeros_ct, pt_r, pt_b = setup

    # single device reference
    fn1 = build_server_pipeline(backend, field, COLS, RHO)
    ref = fn1(mat_ct.data, zeros_ct.data, pt_r, pt_b)

    # 8-device ct-axis sharding
    mesh = make_mesh(jax.devices()[:8])
    cts = ct_sharding(mesh)
    rep = pt_replicated(mesh)
    fn8 = build_server_pipeline(
        backend, field, COLS, RHO,
        in_shardings=(cts, cts, rep, rep), out_shardings=(cts, cts, cts))
    out = fn8(jax.device_put(mat_ct.data, cts), jax.device_put(zeros_ct.data, cts),
              jax.device_put(pt_r, rep), jax.device_put(pt_b, rep))

    for a, b in zip(ref, out):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_sharded_output_layout(setup):
    backend, field, mat_ct, zeros_ct, pt_r, pt_b = setup
    mesh = make_mesh(jax.devices()[:8])
    cts = ct_sharding(mesh)
    rep = pt_replicated(mesh)
    fn8 = build_server_pipeline(
        backend, field, COLS, RHO,
        in_shardings=(cts, cts, rep, rep), out_shardings=(cts, cts, cts))
    out = fn8(jax.device_put(mat_ct.data, cts), jax.device_put(zeros_ct.data, cts),
              jax.device_put(pt_r, rep), jax.device_put(pt_b, rep))
    # encoded batch stays sharded over the ct axis
    assert len(out[0].sharding.device_set) == 8
