"""ChaCha20 keystream correctness (RFC 8439) + deterministic matrix gen."""

import numpy as np

from lumenos_tpu.core.chacha import chacha20_keystream, random_matrix_row_major
from lumenos_tpu.core.field import GOLDILOCKS_57


def test_rfc8439_block_vector():
    # RFC 8439 section 2.4.2 test vector (counter=1)
    key = bytes(range(32))
    nonce = bytes.fromhex("000000000000004a00000000")
    ks = chacha20_keystream(key, nonce, 114, counter=1)
    plaintext = (
        b"Ladies and Gentlemen of the class of '99: If I could offer you "
        b"only one tip for the future, sunscreen would be it."
    )
    ct = bytes(p ^ k for p, k in zip(plaintext, ks))
    assert ct[:16].hex() == "6e2e359a2568f98041ba0728dd0d6981"
    assert ct[-16:].hex() == "0bbf74a35be6b40b8eedf2785e42874d"


def test_keystream_continuity():
    """One long draw == many short draws (Go XORKeyStream streaming)."""
    key = (1).to_bytes(8, "little") + bytes(24)
    nonce = bytes(12)
    long = chacha20_keystream(key, nonce, 256)
    # draws of 64 bytes each are block aligned; matrix rows are 8*cols bytes
    assert long[:64] == chacha20_keystream(key, nonce, 64)
    assert long[64:128] == chacha20_keystream(key, nonce, 64, counter=1)


def test_matrix_deterministic():
    m1 = random_matrix_row_major(16, 8, GOLDILOCKS_57)
    m2 = random_matrix_row_major(16, 8, GOLDILOCKS_57)
    assert np.array_equal(m1, m2)
    assert (m1 < GOLDILOCKS_57).all()
    # the prefix of a bigger matrix with same cols is identical (row streaming)
    m3 = random_matrix_row_major(32, 8, GOLDILOCKS_57)
    assert np.array_equal(m3[:16], m1)
