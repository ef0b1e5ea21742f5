"""Differential test: homomorphic Ligero transform vs plaintext oracle.

Decrypt(hNTT(Enc(columns))) * sigma^{-1} must equal the plaintext transform
of the same data, element-wise (the reference's TestEncode pattern,
fhe/code_test.go:14).
"""

import numpy as np
import pytest

from lumenos_tpu.core.field import PrimeField, GOLDILOCKS_57
from lumenos_tpu.core.ntt import ntt_scalar
from lumenos_tpu.fhe.params import BgvParams
from lumenos_tpu.fhe.backend import BgvBackend
from lumenos_tpu.fhe.hntt import homomorphic_ligero_ntt, homomorphic_encode
from lumenos_tpu.fhe.scales import rational_reconstruct, equalize

T = GOLDILOCKS_57
LOG_N = 5
N = 1 << LOG_N          # slots per ciphertext ("rows")
SIZE = 16               # ciphertext-vector length (codeword positions)


def test_rational_reconstruct():
    rng = np.random.default_rng(0)
    bound = 1 << 30
    for r in [1, 2, T - 1, *rng.integers(1, T, 50)]:
        a, b = rational_reconstruct(int(r), T)
        assert a % T == int(r) * b % T
        assert 0 < abs(a) <= bound and 0 < abs(b) <= bound


def test_equalize():
    rng = np.random.default_rng(1)
    for _ in range(20):
        su, sv = int(rng.integers(1, T)), int(rng.integers(1, T))
        a, b, s_new = equalize(su, sv, T)
        # alpha/s_new == 1/su  and  beta/s_new == 1/sv (mod t)
        assert a % T == s_new * pow(su, T - 2, T) % T
        assert b % T == s_new * pow(sv, T - 2, T) % T


@pytest.fixture(scope="module")
def setup():
    # chain long enough for a size-16 transform (4 butterfly layers ~ 2^124
    # noise growth; 3 x 56-bit limbs on top of q0 gives plenty of headroom)
    params = BgvParams.generate(
        log_n=LOG_N, log_q=[58, 56, 56, 56], log_p=[55, 55], t=T)
    backend = BgvBackend(params)
    rng = np.random.default_rng(7)
    sk, pk = backend.keygen(rng)
    field = PrimeField(T, SIZE)
    return backend, sk, pk, rng, field


def test_homomorphic_ntt_matches_plaintext(setup):
    backend, sk, pk, rng, field = setup
    g = np.random.default_rng(2)
    # SIZE ciphertexts, each encrypting N slot values (columns of a matrix)
    data = g.integers(0, T, (SIZE, N)).astype(np.uint64)
    ct = backend.encrypt_values(data, pk, rng)
    out, scales = homomorphic_ligero_ntt(backend, ct, field, SIZE)
    dec = np.asarray(backend.decrypt_values(out, sk))   # [SIZE, N]
    # plaintext oracle: transform each slot-column independently
    for slot in range(N):
        col = [int(x) for x in data[:, slot]]
        expect = ntt_scalar(col, SIZE, field)
        got = [int(dec[p, slot]) * pow(int(scales[p]), T - 2, T) % T
               for p in range(SIZE)]
        assert got == [e % T for e in expect], f"slot {slot}"


def test_homomorphic_encode_matches_plaintext(setup):
    backend, sk, pk, rng, field = setup
    g = np.random.default_rng(3)
    cols = SIZE // 2
    data = g.integers(0, T, (cols, N)).astype(np.uint64)
    ct = backend.encrypt_values(data, pk, rng)
    out, scales = homomorphic_encode(backend, ct, N, 2, pk, rng, field)
    assert out.data.shape[0] == SIZE
    dec = np.asarray(backend.decrypt_values(out, sk))
    for slot in range(min(4, N)):
        col = [int(x) for x in data[:, slot]] + [0] * cols
        expect = ntt_scalar(col, SIZE, field)
        got = [int(dec[p, slot]) * pow(int(scales[p]), T - 2, T) % T
               for p in range(SIZE)]
        assert got == [e % T for e in expect], f"slot {slot}"


def test_rescale_after_transform(setup):
    """Transform output rescaled to level 1 still decrypts correctly."""
    backend, sk, pk, rng, field = setup
    g = np.random.default_rng(4)
    data = g.integers(0, T, (SIZE, N)).astype(np.uint64)
    ct = backend.encrypt_values(data, pk, rng)
    out, scales = homomorphic_ligero_ntt(backend, ct, field, SIZE)
    out = backend.rescale_to(out, 1)
    dec = np.asarray(backend.decrypt_values(out, sk))
    col = [int(x) for x in data[:, 0]]
    expect = ntt_scalar(col, SIZE, field)
    got = [int(dec[p, 0]) * pow(int(scales[p]), T - 2, T) % T
           for p in range(SIZE)]
    assert got == [e % T for e in expect]
