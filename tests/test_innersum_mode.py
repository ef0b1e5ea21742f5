"""Reference-compatible InnerSum prove mode: rotation-tree inner products
decode (slot 0) must equal the plaintext reference and the rotation-free
default mode."""

import numpy as np
import pytest

from lumenos_tpu.core.chacha import random_matrix_row_major
from lumenos_tpu.core.field import PrimeField, GOLDILOCKS_57
from lumenos_tpu.core.ligero_plain import (
    LigeroCommitter, evaluate_matrix_poly, ligero_prove_reference, verify)
from lumenos_tpu.core.transcript import Transcript
from lumenos_tpu.fhe.backend import BgvBackend
from lumenos_tpu.fhe.keyswitch import KeySwitcher
from lumenos_tpu.fhe.ligero import (
    commit, decrypt_proof_innersum, fhe_leaf_hasher, prove_innersum_mode)
from lumenos_tpu.fhe.params import generate_bgv_params_for_ntt

T = GOLDILOCKS_57
ROWS, COLS, RHO = 16, 8, 2   # rows = N/2 slots at LogN 5
LOG_N = 5
POINT = 5


def test_innersum_mode_matches_reference():
    params = generate_bgv_params_for_ntt(COLS, LOG_N, T)
    backend = BgvBackend(params)
    rng = np.random.default_rng(71)
    sk, pk = backend.keygen(rng)
    ks = KeySwitcher(backend)
    gks = {g: ks.gen_galois_key(g, sk, rng)
           for g in ks.galois_elements_for_inner_sum(ROWS)}
    field = PrimeField(T, COLS * RHO)
    matrix = random_matrix_row_major(ROWS, COLS, T)
    committer = LigeroCommitter(128, ROWS, COLS, RHO)
    ct = backend.encrypt_values(np.ascontiguousarray(matrix.T), pk, rng)
    prover = commit(committer, backend, ct, pk, rng, field)
    eproof = prove_innersum_mode(prover, POINT, Transcript("test"), ks, gks)
    proof = decrypt_proof_innersum(eproof, backend, sk)

    ref = ligero_prove_reference(committer, matrix, POINT, field,
                                 Transcript("test"))
    assert np.array_equal(proof.mat_r, ref.mat_r)
    assert np.array_equal(proof.mat_z, ref.mat_z)

    value = evaluate_matrix_poly(matrix, POINT, field)
    verify(proof, POINT, value, field, Transcript("test"), fhe_leaf_hasher)
