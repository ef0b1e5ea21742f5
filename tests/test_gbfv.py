"""GBFV proof-of-decryption over Z[X]/Phi_10752 (vdec/gbfv.py).

The reference's GBFV PoD (vdec_gbfv.c, IS_GBFV=true) is "partially
invalid" by its own README (103-104). Ours verifies: these tests run the
full protocol on GBFV-ring statements and check soundness probes.
"""

import copy

import numpy as np
import pytest

from lumenos_tpu.native import load_native
from lumenos_tpu.vdec.gbfv import (
    GBFV_N, GBFV_OFFSETS, GBFV_SIGNS, GbfvPodProver,
    extract_gbfv_statement, gbfv_mul_f, reduction_table_weights,
)
from lumenos_tpu.vdec.prover import _obj_to_hilo, _hilo_to_obj

pytestmark = pytest.mark.skipif(load_native() is None,
                                reason="native library unavailable")


def test_ring_is_phi_10752():
    """f = Phi_42(X^256) = Phi_10752: multiplying X^2816 by X^256 must
    reproduce the sparse reduction rule exactly."""
    a = np.zeros(GBFV_N, dtype=object)
    b = np.zeros(GBFV_N, dtype=object)
    a[2816] = 1
    b[256] = 1
    r = gbfv_mul_f(a, b)
    expect = np.zeros(GBFV_N, dtype=object)
    for off, sgn in zip(GBFV_OFFSETS, GBFV_SIGNS):
        expect[off] += sgn
    assert np.array_equal(r, expect)


def test_native_conv_matches_host_oracle():
    lib = load_native()
    rng = np.random.default_rng(3)
    Q = (1 << 120) - 1
    s = rng.integers(-1, 2, GBFV_N).astype(np.int8)
    ct1 = rng.integers(-10 ** 6, 10 ** 6, GBFV_N).astype(object)
    zero = np.zeros(GBFV_N, dtype=object)
    e_hi = np.zeros(GBFV_N, np.int64)
    e_lo = np.zeros(GBFV_N, np.uint64)
    c1h, c1l = _obj_to_hilo(ct1)
    zh, zl = _obj_to_hilo(zero)
    lib.gbfv_statement_noise(
        Q & ((1 << 64) - 1), Q >> 64, zh.ctypes.data, zl.ctypes.data,
        c1h.ctypes.data, c1l.ctypes.data, zh.ctypes.data, zl.ctypes.data,
        s.ctypes.data, e_hi.ctypes.data, e_lo.ctypes.data, 0)
    assert np.array_equal(_hilo_to_obj(e_hi, e_lo),
                          gbfv_mul_f(ct1, s.astype(object)))


@pytest.fixture(scope="module")
def gbfv_statement():
    """Synthetic GBFV-ring statement with planted small noise (the
    reference feeds its GBFV prover BFV data from lattigo — it cannot
    produce real GBFV ciphertexts either, README.md:103-104)."""
    lib = load_native()
    rng = np.random.default_rng(17)
    Q = ((1 << 58) - 27) * ((1 << 56) - 5)
    n_ct = 3

    def rand_centered(n):
        out = np.empty(n, dtype=object)
        for i in range(n):
            out[i] = (int(rng.integers(0, 1 << 62)) * (1 << 52)
                      + int(rng.integers(0, 1 << 52)))
        return out % Q - Q // 2

    sk = rng.integers(-1, 2, GBFV_N).astype(np.int64)
    ct0 = np.stack([rand_centered(GBFV_N) for _ in range(n_ct)])
    ct1 = np.stack([rand_centered(GBFV_N) for _ in range(n_ct)])
    dm = np.stack([rand_centered(GBFV_N) for _ in range(n_ct)])
    st0 = extract_gbfv_statement(Q, (1 << 57) - 13, ct0, ct1, dm, sk, lib)
    for k in range(n_ct):
        e_t = np.array([int(x) for x in
                        rng.integers(-(1 << 40), 1 << 40, GBFV_N)],
                       dtype=object)
        adj = (ct0[k] - st0.noise[k] + e_t) % Q
        ct0[k] = np.where(adj > Q // 2, adj - Q, adj)
    return extract_gbfv_statement(Q, (1 << 57) - 13, ct0, ct1, dm, sk, lib)


@pytest.fixture(scope="module")
def gbfv_pod(gbfv_statement):
    return GbfvPodProver(gbfv_statement)


@pytest.fixture(scope="module")
def gbfv_proof(gbfv_pod):
    return gbfv_pod.prove(b"gbfv-test")


def test_gbfv_wrap_within_bound(gbfv_statement, gbfv_pod):
    w = reduction_table_weights()
    assert np.abs(gbfv_statement.wrap).max() <= w.max() / 2 + 2
    assert gbfv_pod.blocks[2][2] == float(w.max()) / 2.0 + 2.0


def test_gbfv_prove_verify(gbfv_pod, gbfv_proof):
    assert gbfv_pod.verify(gbfv_proof)


def test_gbfv_security_report(gbfv_pod):
    rep = gbfv_pod.security_report()
    assert "SOUND" in rep and "INSUFFICIENT" not in rep


def test_gbfv_rejects_tampered_response(gbfv_pod, gbfv_proof):
    bad = copy.copy(gbfv_proof)
    bad.z1 = gbfv_proof.z1.copy()
    bad.z1[0, 0] += 1
    assert not gbfv_pod.verify(bad)


def test_gbfv_rejects_tampered_h(gbfv_pod, gbfv_proof):
    # tamper the SZ linear-equation garbage row specifically
    bad = copy.copy(gbfv_proof)
    bad.h = gbfv_proof.h.copy()
    bad.h[-1, 0, 1] ^= 1
    assert not gbfv_pod.verify(bad)


def test_gbfv_rejects_wrong_statement(gbfv_pod, gbfv_proof):
    ver = GbfvPodProver.__new__(GbfvPodProver)
    ver.__dict__.update(gbfv_pod.__dict__)
    ver._lin_cache = {}
    rhs2 = gbfv_pod.rhs_big.copy()
    rhs2[0, 0, 0] = (int(rhs2[0, 0, 0]) + 1) % int(
        gbfv_pod.params.primes[0])
    ver.rhs_big = rhs2
    assert not ver.verify(gbfv_proof)


def test_gbfv_rejects_nonempty_masked_eval(gbfv_pod, gbfv_proof):
    bad = copy.copy(gbfv_proof)
    bad.f_eval = np.zeros((1, gbfv_pod.ring.L, 64), np.uint64)
    assert not gbfv_pod.verify(bad)


def test_gbfv_public_verifier(gbfv_statement, gbfv_proof):
    """Witness-free GBFV verifier accepts the proof, rejects tampering."""
    verifier = GbfvPodProver(gbfv_statement.public())
    assert verifier.verify(gbfv_proof)
    import copy
    bad = copy.copy(gbfv_proof)
    bad.h = gbfv_proof.h.copy()
    bad.h[0, 0, 1] ^= 1
    assert not verifier.verify(bad)


def test_shipped_weights_match_computation():
    """The precomputed gbfv_weights.npy equals the O(n^2) derivation."""
    from lumenos_tpu.vdec.gbfv import (_compute_reduction_table_weights,
                                       reduction_table_weights)
    assert np.array_equal(reduction_table_weights(),
                          _compute_reduction_table_weights())


def test_gbfv_pod_from_values_wire_and_public_verify():
    """--gbfv client plumbing: statement from decrypted protocol values,
    session-transcript binding, wire roundtrip, witness-free verify."""
    from lumenos_tpu.core.transcript import Transcript
    from lumenos_tpu.vdec.gbfv import gbfv_pod_from_values
    from lumenos_tpu.vdec.pod import PodProof

    t = (1 << 57) - 13
    rng = np.random.default_rng(5)
    vals = rng.integers(0, t, 100).astype(np.uint64)
    tr = Transcript("vdec")
    st = gbfv_pod_from_values(vals, t, rng=rng, transcript=tr)
    tr2 = Transcript("vdec")
    assert tr.challenge_bytes(b"x", 8) != tr2.challenge_bytes(b"x", 8)

    # the statement's plaintext really is Delta * values
    Q = st.q_modulus
    delta = Q // t
    for i in range(8):
        dm = int(st.delta_m[0][i]) % Q
        assert dm == int(vals[i]) * delta % Q

    prover = GbfvPodProver(st)
    proof = prover.prove()
    blob = proof.to_bytes()
    assert GbfvPodProver(st.public()).verify(PodProof.from_bytes(blob))
