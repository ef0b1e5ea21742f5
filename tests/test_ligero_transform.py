"""Differential tests: vectorized Ligero transform vs scalar oracle.

Mirrors the reference's differential-testing strategy (SURVEY.md section 4):
the jitted JAX transform must agree element-wise with a host-side scalar
transcription of core/ntt.go on deterministic data.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lumenos_tpu.core.field import PrimeField, GOLDILOCKS_57
from lumenos_tpu.core.ntt import ntt_scalar, ligero_ntt, encode_row
from lumenos_tpu.ops.modmath import ModCtx, mulmod, summod

Q = GOLDILOCKS_57


def test_mulmod_fuzz():
    ctx = ModCtx.new(Q)
    rng = np.random.default_rng(1)
    a = rng.integers(0, Q, 2000)
    b = rng.integers(0, Q, 2000)
    got = np.asarray(mulmod(jnp.array(a, dtype=jnp.uint64), jnp.array(b, dtype=jnp.uint64), ctx))
    exp = np.array([(int(x) * int(y)) % Q for x, y in zip(a, b)], dtype=np.uint64)
    assert np.array_equal(got, exp)


def test_mulmod_edge_cases():
    ctx = ModCtx.new(Q)
    vals = np.array([0, 1, Q - 1, Q - 2, 2, (Q - 1) // 2], dtype=np.uint64)
    a, b = np.meshgrid(vals, vals)
    got = np.asarray(mulmod(jnp.asarray(a.ravel()), jnp.asarray(b.ravel()), ctx))
    exp = np.array([(int(x) * int(y)) % Q for x, y in zip(a.ravel(), b.ravel())], dtype=np.uint64)
    assert np.array_equal(got, exp)


def test_summod():
    rng = np.random.default_rng(3)
    v = rng.integers(0, Q, 16384)
    assert int(summod(jnp.array(v, dtype=jnp.uint64), Q)) == sum(int(x) for x in v) % Q


@pytest.mark.parametrize("size", [2, 4, 8, 16, 64, 128, 512])
def test_transform_matches_scalar_oracle(size):
    f = PrimeField(Q, 2048)  # enclosing field (protocol: N = cols * rhoInv)
    rng = np.random.default_rng(size)
    v = [int(x) for x in rng.integers(0, Q, size)]
    expect = ntt_scalar(list(v), size, f)
    got = jax.jit(lambda a: ligero_ntt(a, f, size))(jnp.array(v, dtype=jnp.uint64))
    assert np.array_equal(np.array(expect, dtype=np.uint64), np.asarray(got))


def test_transform_full_field_size():
    f = PrimeField(Q, 2048)
    rng = np.random.default_rng(99)
    v = [int(x) for x in rng.integers(0, Q, 2048)]
    expect = ntt_scalar(list(v), 2048, f)
    got = jax.jit(lambda a: ligero_ntt(a, f, 2048))(jnp.array(v, dtype=jnp.uint64))
    assert np.array_equal(np.array(expect, dtype=np.uint64), np.asarray(got))


def test_encode_row():
    cols, rho = 1024, 2
    f = PrimeField(Q, cols * rho)
    rng = np.random.default_rng(7)
    row = [int(x) for x in rng.integers(0, Q, cols)]
    exp = ntt_scalar(list(row) + [0] * cols, cols * rho, f)
    got = jax.jit(lambda a: encode_row(a, rho, f))(jnp.array(row, dtype=jnp.uint64))
    assert np.array_equal(np.array(exp, dtype=np.uint64), np.asarray(got))


def test_transform_batched():
    f = PrimeField(Q, 2048)
    rng = np.random.default_rng(11)
    vs = rng.integers(0, Q, (5, 128))
    exp = np.stack([
        np.array(ntt_scalar([int(x) for x in r], 128, f), dtype=np.uint64) for r in vs
    ])
    got = np.asarray(jax.jit(lambda a: ligero_ntt(a, f, 128))(jnp.array(vs, dtype=jnp.uint64)))
    assert np.array_equal(exp, got)
