"""LNP/ABDLOP native layer: ring algebra, commitments, opening proofs."""

import numpy as np
import pytest

from lumenos_tpu.native import load_native
from lumenos_tpu.vdec.lnp import Abdlop, LnpParams, LnpRing, D

pytestmark = pytest.mark.skipif(load_native() is None,
                                reason="native library unavailable")


@pytest.fixture(scope="module")
def ring():
    return LnpRing(LnpParams())


def test_expand_uniform_deterministic(ring):
    a = ring.expand_uniform(b"seed", 1, 4)
    b = ring.expand_uniform(b"seed", 1, 4)
    c = ring.expand_uniform(b"seed", 2, 4)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)
    for li, p in enumerate(ring.params.primes):
        assert (a[:, li] < p).all()


def test_mat_vec_linear(ring):
    """Matrix-vector product is linear: M(x+y) == Mx + My."""
    rng = np.random.default_rng(0)
    rows, cols = 3, 5
    m = ring.expand_uniform(b"m", 9, rows * cols).reshape(rows, cols, ring.L, D)
    x = ring.lift(rng.integers(-2, 3, (cols, D)))
    y = ring.lift(rng.integers(-2, 3, (cols, D)))
    lhs = ring.mat_vec(m, ring.add(x, y))
    rhs = ring.add(ring.mat_vec(m, x), ring.mat_vec(m, y))
    assert np.array_equal(lhs, rhs)


def test_abdlop_commit_open_roundtrip(ring):
    rng = np.random.default_rng(1)
    m1, ell = 8, 4
    scheme = Abdlop(ring, b"public-seed", m1, ell)
    s1 = rng.integers(-1, 2, (m1, D))
    msg = rng.integers(-1000, 1000, (ell, D))
    com, s2 = scheme.commit(s1, msg, b"rand")
    proof = scheme.prove_opening(com, s1, s2, b"masks")
    assert scheme.verify_opening(com, proof)


def test_abdlop_rejects_tampered_proof(ring):
    rng = np.random.default_rng(2)
    m1, ell = 8, 4
    scheme = Abdlop(ring, b"public-seed", m1, ell)
    s1 = rng.integers(-1, 2, (m1, D))
    msg = rng.integers(-1000, 1000, (ell, D))
    com, s2 = scheme.commit(s1, msg, b"rand")
    proof = scheme.prove_opening(com, s1, s2, b"masks")
    proof.z1 = proof.z1.copy()
    proof.z1[0, 0] += 1
    assert not scheme.verify_opening(com, proof)


def test_abdlop_rejects_wrong_commitment(ring):
    rng = np.random.default_rng(3)
    m1, ell = 8, 4
    scheme = Abdlop(ring, b"public-seed", m1, ell)
    s1 = rng.integers(-1, 2, (m1, D))
    msg = rng.integers(-1000, 1000, (ell, D))
    com, s2 = scheme.commit(s1, msg, b"rand")
    proof = scheme.prove_opening(com, s1, s2, b"masks")
    com2, _ = scheme.commit(s1, msg + 1, b"rand2")
    assert not scheme.verify_opening(com2, proof)


def test_challenge_weight(ring):
    c = ring.challenge(b"\x01" * 32)
    nz = c[c != 0]
    assert len(nz) == ring.params.omega
    assert set(np.unique(nz)).issubset({-1, 1})
