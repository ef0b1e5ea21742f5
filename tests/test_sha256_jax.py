"""Device-side SHA-256: bit-identical to hashlib on ciphertext leaves."""

import hashlib

import jax
import jax.numpy as jnp
import numpy as np

from lumenos_tpu.ops.sha256_jax import digests_to_bytes, sha256_leaves


def test_matches_hashlib():
    rng = np.random.default_rng(0)
    n, words = 7, 32  # 256-byte leaves (4 blocks + padding block)
    data = rng.integers(0, 1 << 62, (n, words), dtype=np.uint64)
    dig = np.asarray(jax.jit(
        lambda d: sha256_leaves(d, words * 8))(jnp.asarray(data)))
    got = digests_to_bytes(dig)
    for i in range(n):
        expect = hashlib.sha256(data[i].astype("<u8").tobytes()).digest()
        assert got[i] == expect, i


def test_single_block():
    data = np.zeros((2, 8), dtype=np.uint64)  # 64-byte zero leaves
    data[1, 0] = 0x0123456789ABCDEF
    dig = np.asarray(sha256_leaves(jnp.asarray(data), 64))
    got = digests_to_bytes(dig)
    for i in range(2):
        assert got[i] == hashlib.sha256(data[i].astype("<u8").tobytes()).digest()


def test_ct_shaped_leaves():
    """Same shape as protocol leaves: [n, 2, L, N] flattened rows."""
    rng = np.random.default_rng(1)
    n = 4
    data = rng.integers(0, 1 << 58, (n, 2, 2, 64), dtype=np.uint64)
    flat = data.reshape(n, -1)
    dig = np.asarray(sha256_leaves(jnp.asarray(flat), flat.shape[1] * 8))
    got = digests_to_bytes(dig)
    from lumenos_tpu.fhe.ligero import ct_leaf_bytes
    for i in range(n):
        assert got[i] == hashlib.sha256(ct_leaf_bytes(data, i)).digest()


def test_striped_leaf_digest():
    from lumenos_tpu.ops.sha256_jax import (
        ct_leaf_digest_host, sha256_leaves_striped)
    rng = np.random.default_rng(2)
    n = 3
    data = rng.integers(0, 1 << 58, (n, 2, 2, 2048), dtype=np.uint64)
    flat = data.reshape(n, -1)
    dig = np.asarray(jax.jit(
        lambda d: sha256_leaves_striped(d, flat.shape[1] * 8))(jnp.asarray(flat)))
    got = digests_to_bytes(dig)
    from lumenos_tpu.fhe.ligero import ct_leaf_bytes
    for i in range(n):
        assert got[i] == ct_leaf_digest_host(ct_leaf_bytes(data, i))
