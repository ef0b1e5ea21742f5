"""Parallel Merkle leaf hashing + fast tree construction.

The Merkle layer hashes ~gigabytes of serialized ciphertext columns
(256 KB per leaf at LogN=12 level 1). hashlib's SHA-256 releases the GIL
for large buffers, so a thread pool achieves near-linear speedup on the
leaf pass (the tree's interior levels are tiny by comparison: 32-byte
concatenations).

Counterpart of the reference's processLeafParallel + core.NewTree
(fhe/ligero.go:126-183, core/tree.go:76).
"""

from __future__ import annotations

import hashlib
import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from .merkle import MerkleTree


def _sha256(b) -> bytes:
    return hashlib.sha256(b).digest()


def hash_ct_leaves(data: np.ndarray, workers: int | None = None) -> list[bytes]:
    """Leaf hashes for a ciphertext batch [n, 2, L, N] (LE-u64 leaf bytes).

    Uses the native OpenMP SHA-256 when available (lumenos_tpu/native),
    else a Python thread pool (hashlib releases the GIL on large buffers).
    The leaf byte string is identical to ct_leaf_bytes(data, i).
    """
    n = data.shape[0]
    arr = np.ascontiguousarray(data.astype("<u8", copy=False))
    lib = _native()
    if lib is not None:
        leaf_bytes = arr.nbytes // n
        out = np.empty((n, 32), dtype=np.uint8)
        lib.merkle_leaf_hashes(arr.ctypes.data, n, leaf_bytes, out.ctypes.data)
        return [out[i].tobytes() for i in range(n)]
    workers = workers or min(32, (os.cpu_count() or 4) * 2)

    def leaf_hash(i: int) -> bytes:
        return _sha256(arr[i].tobytes())

    with ThreadPoolExecutor(max_workers=workers) as ex:
        return list(ex.map(leaf_hash, range(n), chunksize=max(1, n // workers)))


def hash_ct_leaves_striped(data: np.ndarray, stripes: int | None = None) -> list[bytes]:
    """Striped ciphertext-leaf digests (definition: ops/sha256_jax.py
    sha256_leaves_striped; host oracle ct_leaf_digest_host). Native two-pass
    when available."""
    n = data.shape[0]
    arr = np.ascontiguousarray(data.astype("<u8", copy=False)).reshape(n, -1)
    words = arr.shape[1]
    if stripes is None:
        from ..ops.sha256_jax import leaf_stripes
        stripes = leaf_stripes(words * 8)
    sub_words = words // stripes
    lib = _native()
    if lib is not None:
        flat = arr.reshape(n * stripes, sub_words)
        d1 = np.empty((n * stripes, 32), dtype=np.uint8)
        lib.merkle_leaf_hashes(flat.ctypes.data, n * stripes, sub_words * 8,
                               d1.ctypes.data)
        d1 = np.ascontiguousarray(d1.reshape(n, stripes * 32))
        d2 = np.empty((n, 32), dtype=np.uint8)
        lib.merkle_leaf_hashes(d1.ctypes.data, n, stripes * 32, d2.ctypes.data)
        return [d2[i].tobytes() for i in range(n)]
    from ..ops.sha256_jax import ct_leaf_digest_host
    return [ct_leaf_digest_host(arr[i].tobytes(), stripes) for i in range(n)]


def _native():
    try:
        from ..native import load_native
        return load_native()
    except Exception:
        return None


class FastMerkleTree(MerkleTree):
    """MerkleTree built from precomputed leaf hashes (skips re-hashing)."""

    def __init__(self, leaf_hashes: list[bytes]):
        if not leaf_hashes:
            raise ValueError("no leaves")
        self.n_leaves = len(leaf_hashes)
        levels: list[list[bytes]] = [list(leaf_hashes)]
        while len(levels[-1]) > 1:
            cur = levels[-1]
            nxt = []
            for i in range(0, len(cur), 2):
                left = cur[i]
                right = cur[i + 1] if i + 1 < len(cur) else cur[i]
                nxt.append(_sha256(left + right))
            levels.append(nxt)
        self.levels = levels


def merkle_tree_over_ct_batch(data: np.ndarray) -> FastMerkleTree:
    return FastMerkleTree(hash_ct_leaves(data))
