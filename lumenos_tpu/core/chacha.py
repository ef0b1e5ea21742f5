"""ChaCha20 keystream (RFC 8439 / IETF variant) vectorized with numpy.

Used to reproduce the reference's deterministic test-matrix generator
(reference: core/utils.go:46-97 - ChaCha20 with a 32-byte key whose first
8 bytes are LE(1), a 12-byte zero nonce, and block counter starting at 0;
each matrix row consumes ``8*cols`` keystream bytes, values are
``u64 % modulus``).

The block function is implemented over a ``[n_blocks, 16]`` u32 state array
so arbitrarily many 64-byte blocks are produced in one vectorized pass.
"""

from __future__ import annotations

import numpy as np

_SIGMA = np.frombuffer(b"expand 32-byte k", dtype="<u4")  # 4 x u32 constants


def _rotl32(x: np.ndarray, n: int) -> np.ndarray:
    return ((x << np.uint32(n)) | (x >> np.uint32(32 - n))).astype(np.uint32)


def _quarter(state: np.ndarray, a: int, b: int, c: int, d: int) -> None:
    # state: [n_blocks, 16] u32, columns indexed by a,b,c,d
    sa, sb, sc, sd = state[:, a], state[:, b], state[:, c], state[:, d]
    sa += sb
    sd = _rotl32(sd ^ sa, 16)
    sc += sd
    sb = _rotl32(sb ^ sc, 12)
    sa += sb
    sd = _rotl32(sd ^ sa, 8)
    sc += sd
    sb = _rotl32(sb ^ sc, 7)
    state[:, a], state[:, b], state[:, c], state[:, d] = sa, sb, sc, sd


def chacha20_keystream(key: bytes, nonce: bytes, n_bytes: int, counter: int = 0) -> bytes:
    """Generate ``n_bytes`` of ChaCha20 keystream (20 rounds)."""
    if len(key) != 32:
        raise ValueError("key must be 32 bytes")
    if len(nonce) != 12:
        raise ValueError("nonce must be 12 bytes (IETF variant)")
    n_blocks = (n_bytes + 63) // 64

    key_words = np.frombuffer(key, dtype="<u4")
    nonce_words = np.frombuffer(nonce, dtype="<u4")

    state = np.empty((n_blocks, 16), dtype=np.uint32)
    state[:, 0:4] = _SIGMA
    state[:, 4:12] = key_words
    state[:, 12] = (np.arange(counter, counter + n_blocks)).astype(np.uint32)
    state[:, 13:16] = nonce_words

    working = state.copy()
    with np.errstate(over="ignore"):
        for _ in range(10):  # 10 double-rounds = 20 rounds
            # column rounds
            _quarter(working, 0, 4, 8, 12)
            _quarter(working, 1, 5, 9, 13)
            _quarter(working, 2, 6, 10, 14)
            _quarter(working, 3, 7, 11, 15)
            # diagonal rounds
            _quarter(working, 0, 5, 10, 15)
            _quarter(working, 1, 6, 11, 12)
            _quarter(working, 2, 7, 8, 13)
            _quarter(working, 3, 4, 9, 14)
        working += state

    out = working.astype("<u4").tobytes()
    return out[:n_bytes]


def random_matrix_row_major(rows: int, cols: int, modulus: int) -> np.ndarray:
    """Deterministic matrix over F_modulus: the reference's test-data generator.

    Matches core/utils.go:46-97: seed key = LE64(1) || 24 zero bytes, zero
    nonce, each row draws ``8*cols`` bytes, entries = LE-u64 % modulus.
    Returns a ``[rows, cols]`` object-free uint64 array.
    """
    key = (1).to_bytes(8, "little") + bytes(24)
    nonce = bytes(12)
    stream = chacha20_keystream(key, nonce, rows * cols * 8)
    vals = np.frombuffer(stream, dtype="<u8").reshape(rows, cols)
    return (vals % np.uint64(modulus)).astype(np.uint64)
