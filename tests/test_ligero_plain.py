"""Plaintext Ligero PCS end-to-end: prove + verify, tamper rejection."""

import numpy as np
import pytest

from lumenos_tpu.core.chacha import random_matrix_row_major
from lumenos_tpu.core.field import PrimeField, GOLDILOCKS_57
from lumenos_tpu.core.ligero_plain import (
    LigeroCommitter, calculate_queries, evaluate_matrix_poly,
    ligero_prove_reference, verify,
)
from lumenos_tpu.core.poly import DensePoly
from lumenos_tpu.core.transcript import Transcript

Q = GOLDILOCKS_57
ROWS, COLS, RHO = 64, 32, 2


def test_query_count_matches_reference():
    # README.md:52: 128-bit security, rhoInv=2 -> ~306 queries
    assert calculate_queries(128, 2) == 309


@pytest.fixture(scope="module")
def field():
    return PrimeField(Q, COLS * RHO)


@pytest.mark.parametrize("point", [1, 7])
def test_prove_verify_roundtrip(field, point):
    matrix = random_matrix_row_major(ROWS, COLS, Q)
    committer = LigeroCommitter(128, ROWS, COLS, RHO)
    proof = ligero_prove_reference(
        committer, matrix, point, field, Transcript("test"))
    value = evaluate_matrix_poly(matrix, point, field)
    # cross-check vectorized evaluation against Horner on small input
    assert value == DensePoly.from_matrix(matrix).evaluate(field, point)
    verify(proof, point, value, field, Transcript("test"))


def test_verify_rejects_wrong_value(field):
    matrix = random_matrix_row_major(ROWS, COLS, Q)
    committer = LigeroCommitter(128, ROWS, COLS, RHO)
    proof = ligero_prove_reference(committer, matrix, 1, field, Transcript("test"))
    value = evaluate_matrix_poly(matrix, 1, field)
    with pytest.raises(ValueError):
        verify(proof, 1, (value + 1) % Q, field, Transcript("test"))


def test_verify_rejects_tampered_column(field):
    matrix = random_matrix_row_major(ROWS, COLS, Q)
    committer = LigeroCommitter(128, ROWS, COLS, RHO)
    proof = ligero_prove_reference(committer, matrix, 1, field, Transcript("test"))
    value = evaluate_matrix_poly(matrix, 1, field)
    tampered = proof.queried_cols[0].values.copy()
    tampered[0] = (int(tampered[0]) + 1) % Q
    proof.queried_cols[0].values = tampered
    proof.queried_cols[0].leaf_bytes = tampered.astype("<u8").tobytes()
    with pytest.raises(ValueError):
        verify(proof, 1, value, field, Transcript("test"))


def test_verify_rejects_tampered_root(field):
    matrix = random_matrix_row_major(ROWS, COLS, Q)
    committer = LigeroCommitter(128, ROWS, COLS, RHO)
    proof = ligero_prove_reference(committer, matrix, 1, field, Transcript("test"))
    value = evaluate_matrix_poly(matrix, 1, field)
    proof.root = bytes(32)
    with pytest.raises(ValueError):
        verify(proof, 1, value, field, Transcript("test"))
