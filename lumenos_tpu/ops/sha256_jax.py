"""SHA-256 on the accelerator: batched leaf hashing entirely on device.

Hashes n independent messages (the serialized ciphertext Merkle leaves) in
parallel lanes - only the 32-byte digests leave the device, eliminating the
gigabytes of device->host transfer the host-side Merkle pass needs.
Bit-identical to hashlib (tests/test_sha256_jax.py).

Layout: leaves are [n, words] u64 (LE); SHA-256 consumes big-endian u32
words, so each u64 splits into two byte-swapped u32 lanes. leaf byte length
must be a multiple of 64 (always true for ciphertext leaves); the final
padding block is a compile-time constant.
"""

from __future__ import annotations

import numpy as np

from .. import jaxcfg  # noqa: F401
import jax
import jax.numpy as jnp

_K = np.array([
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
    0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
    0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
    0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
    0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
    0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2], dtype=np.uint32)

_H0 = np.array([0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
                0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19], dtype=np.uint32)


def _rotr(x, n):
    return (x >> jnp.uint32(n)) | (x << jnp.uint32(32 - n))


def _bswap32(x):
    m1 = jnp.uint32(0xFF)
    return ((x & m1) << jnp.uint32(24)) | ((x & jnp.uint32(0xFF00)) << jnp.uint32(8)) \
        | ((x >> jnp.uint32(8)) & jnp.uint32(0xFF00)) | (x >> jnp.uint32(24))


def _compress(state, block):
    """state: [n, 8] u32; block: [n, 16] u32 (BE words).

    Rolling-window message schedule inside a fori_loop: the fully unrolled
    64-round graph stalls XLA's algebraic simplifier for minutes; a small
    loop body compiles instantly and the rounds are sequential anyway.
    """
    k_tab = jnp.asarray(_K)

    def round_body(i, carry):
        st, w_win = carry  # st: [n, 8]; w_win: [n, 16] ring buffer
        idx = i & 15
        w15 = w_win[:, (i + 1) & 15]
        w2 = w_win[:, (i + 14) & 15]
        s0w = _rotr(w15, 7) ^ _rotr(w15, 18) ^ (w15 >> jnp.uint32(3))
        s1w = _rotr(w2, 17) ^ _rotr(w2, 19) ^ (w2 >> jnp.uint32(10))
        expanded = w_win[:, idx] + s0w + w_win[:, (i + 9) & 15] + s1w
        wi = jnp.where(i < 16, w_win[:, idx], expanded)
        w_new = jax.lax.dynamic_update_index_in_dim(w_win, wi, idx, axis=1)

        a, b, c, d, e, f, g, h = [st[:, j] for j in range(8)]
        s1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = g ^ (e & (f ^ g))
        t1 = h + s1 + ch + k_tab[i] + wi
        s0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = ((a | b) & c) | (a & b)
        t2 = s0 + maj
        st_new = jnp.stack([t1 + t2, a, b, c, d + t1, e, f, g], axis=1)
        return st_new, w_new

    final, _ = jax.lax.fori_loop(0, 64, round_body, (state, block))
    return state + final


def sha256_leaves(data_u64, leaf_bytes: int):
    """data_u64: [n, words] u64 little-endian leaf data (leaf_bytes = 8*words,
    multiple of 64). Returns [n, 8] u32 digests (big-endian words)."""
    assert leaf_bytes % 64 == 0
    n = data_u64.shape[0]
    words64 = leaf_bytes // 8
    n_blocks = leaf_bytes // 64

    d = jnp.asarray(data_u64, jnp.uint64).reshape(n, words64)
    lo = _bswap32((d & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32))
    hi = _bswap32((d >> jnp.uint64(32)).astype(jnp.uint32))
    words = jnp.stack([lo, hi], axis=2).reshape(n, 2 * words64)  # [n, 16*blocks]

    state0 = jnp.broadcast_to(jnp.asarray(_H0), (n, 8)).astype(jnp.uint32)

    def body(i, st):
        block = jax.lax.dynamic_slice(words, (0, i * 16), (n, 16))
        return _compress(st, block)

    state = jax.lax.fori_loop(0, n_blocks, body, state0)

    # padding block: 0x80, zeros, 64-bit BE length
    pad = np.zeros((16,), dtype=np.uint32)
    pad[0] = 0x80000000
    bit_len = leaf_bytes * 8
    pad[14] = (bit_len >> 32) & 0xFFFFFFFF
    pad[15] = bit_len & 0xFFFFFFFF
    pad_block = jnp.broadcast_to(jnp.asarray(pad), (n, 16)).astype(jnp.uint32)
    return _compress(state, pad_block)


STRIPES = 64  # max intra-leaf parallelism for ciphertext leaves


def leaf_stripes(leaf_bytes: int) -> int:
    """Deterministic stripe count: largest power of two <= min(64,
    leaf_bytes/64), at least 2 (so the digest-of-digests message is
    block-aligned). Shared by device and host implementations."""
    s = min(STRIPES, leaf_bytes // 64)
    p = 2
    while p * 2 <= s:
        p *= 2
    return p


def sha256_leaves_striped(data_u64, leaf_bytes: int, stripes: int | None = None):
    """Two-level leaf digest: split each leaf into `stripes` equal stripes,
    SHA-256 each in parallel lanes, then SHA-256 the concatenated stripe
    digests. Defines the ciphertext Merkle leaf hash (host oracle:
    ct_leaf_digest_host). Gives n*stripes parallel lanes instead of n.
    """
    n = data_u64.shape[0]
    words64 = leaf_bytes // 8
    if stripes is None:
        stripes = leaf_stripes(leaf_bytes)
    assert words64 % stripes == 0
    sub_words = words64 // stripes
    assert (sub_words * 8) % 64 == 0
    d = jnp.asarray(data_u64, jnp.uint64).reshape(n * stripes, sub_words)
    stripe_dig = sha256_leaves(d, sub_words * 8)          # [n*stripes, 8] u32
    # concatenated digests as the second-level message: BE u32 words are
    # exactly the byte stream of the digests
    msg = stripe_dig.reshape(n, stripes * 8)
    # second level consumes BE words directly: pack as u64 little-endian
    # pairs matching sha256_leaves' expected LE-u64 input
    lo = _bswap32(msg[:, 0::2])
    hi = _bswap32(msg[:, 1::2])
    as_u64 = lo.astype(jnp.uint64) | (hi.astype(jnp.uint64) << jnp.uint64(32))
    return sha256_leaves(as_u64, stripes * 32)


def ct_leaf_digest_host(leaf: bytes, stripes: int | None = None) -> bytes:
    """Host oracle for sha256_leaves_striped (hashlib)."""
    import hashlib
    if stripes is None:
        stripes = leaf_stripes(len(leaf))
    sub = len(leaf) // stripes
    acc = b"".join(hashlib.sha256(leaf[i * sub:(i + 1) * sub]).digest()
                   for i in range(stripes))
    return hashlib.sha256(acc).digest()


def digests_to_bytes(digests: np.ndarray) -> list[bytes]:
    """[n, 8] u32 BE-word digests -> list of 32-byte hashes."""
    arr = np.asarray(digests, dtype=np.uint32)
    be = arr.astype(">u4")
    return [be[i].tobytes() for i in range(arr.shape[0])]
