"""Mid-scale homomorphic Ligero differential test (VERDICT round-1 weak #5).

Same flow as test_hligero.py but at LogN=10 / 256 columns — large enough to
exercise the six-step homomorphic NTT's recursive split, the full modulus
chain (log2(256*2)=9 levels), and multi-chunk leaf hashing, while still
tractable on the CPU backend in CI. Marked slow; runs in the default suite.
"""

import numpy as np
import pytest

from lumenos_tpu.core.chacha import random_matrix_row_major
from lumenos_tpu.core.field import PrimeField, GOLDILOCKS_57
from lumenos_tpu.core.ligero_plain import (
    LigeroCommitter, evaluate_matrix_poly, ligero_prove_reference, verify,
)
from lumenos_tpu.core.transcript import Transcript
from lumenos_tpu.fhe.backend import BgvBackend
from lumenos_tpu.fhe.ligero import commit, decrypt_proof, fhe_leaf_hasher, prove
from lumenos_tpu.fhe.params import generate_bgv_params_for_ntt

T = GOLDILOCKS_57
ROWS, COLS, RHO = 1024, 256, 2
LOG_N = 10          # N = 1024 slots >= ROWS (reference README.md:61 ladder)
POINT = 12345


@pytest.fixture(scope="module")
def setup():
    params = generate_bgv_params_for_ntt(COLS, LOG_N, T)
    backend = BgvBackend(params)
    rng = np.random.default_rng(1234)
    sk, pk = backend.keygen(rng)
    field = PrimeField(T, COLS * RHO)
    matrix = random_matrix_row_major(ROWS, COLS, T)
    committer = LigeroCommitter(128, ROWS, COLS, RHO)
    ct = backend.encrypt_values(np.ascontiguousarray(matrix.T), pk, rng)
    prover = commit(committer, backend, ct, pk, rng, field)
    eproof = prove(prover, POINT, Transcript("mid"))
    return backend, sk, field, matrix, committer, eproof


def test_midscale_decrypt_verify(setup):
    backend, sk, field, matrix, committer, eproof = setup
    proof = decrypt_proof(eproof, backend, sk)
    value = evaluate_matrix_poly(matrix, POINT, field)
    verify(proof, POINT, value, field, Transcript("mid"), fhe_leaf_hasher)


def test_midscale_matches_plaintext_reference(setup):
    backend, sk, field, matrix, committer, eproof = setup
    proof = decrypt_proof(eproof, backend, sk)
    ref = ligero_prove_reference(committer, matrix, POINT, field,
                                 Transcript("mid"))
    assert np.array_equal(proof.mat_r, ref.mat_r)
    assert np.array_equal(proof.mat_z, ref.mat_z)
    for ours, theirs in zip(proof.queried_cols, ref.queried_cols):
        assert np.array_equal(ours.values, theirs.values)


def test_midscale_mul_counter(setup):
    """The backend counted homomorphic mults during commit+prove
    (reference fhe/bfv.go:34-46 observability parity)."""
    backend, *_ = setup
    assert backend.mul_count > 0


def test_midscale_wire_golden(setup):
    """Frozen encrypted-proof WIRE digest (round-3 verdict item 8): the
    plaintext golden vectors (tests/test_golden.py) cannot see backend or
    kernel refactors that change ciphertext bytes while preserving
    plaintext semantics; this pins the homomorphic wire itself at the
    midscale shape on the CPU backend (reference analog: the TestLigeroE2E
    marshalled artifacts, fhe/ligero_test.go:24-32). All randomness is
    seeded (np PCG64 + ChaCha20 matrix), so the bytes are reproducible.

    Regenerate after an INTENDED wire change with LUMENOS_GOLDEN_REGEN=1
    and say why in the commit message.
    """
    import hashlib
    import json
    import os

    *_, eproof = setup
    digest = hashlib.sha256(eproof.to_bytes()).hexdigest()
    path = os.path.join(os.path.dirname(__file__), "golden_vectors.json")
    with open(path) as f:
        golden = json.load(f)
    key = "midscale_wire_sha256_logn10_1024x256"
    if os.environ.get("LUMENOS_GOLDEN_REGEN") == "1":
        golden[key] = digest
        with open(path, "w") as f:
            json.dump(golden, f, indent=1)
    assert key in golden, "golden missing - run with LUMENOS_GOLDEN_REGEN=1"
    assert digest == golden[key], (
        "encrypted-proof wire bytes changed; if intended, regenerate with "
        "LUMENOS_GOLDEN_REGEN=1 and document the change")
