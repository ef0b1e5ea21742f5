"""Opt-in production-shape CPU canary (round-4 verdict item 7).

The CPU suite's homomorphic e2e coverage caps at LogN=10 / 1024x256
(tests/test_hligero_midscale.py); regressions that only appear at the
production staged-cells geometry (big n1/n2 split, multi-chunk stage A,
multi-block stage B, fused products, sub-chunked rescale chains) were
previously only catchable on a TPU run. This canary runs the REAL bench
path — staged cells encode + fused products + queried-column decrypt +
the full public verifier — at 4096x2048 / LogN=12 on CPU.

Takes several minutes: opt in with

    LUMENOS_CANARY=1 python -m pytest tests/test_production_canary.py -q

(referenced from README dev docs; excluded from the default suite run).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    not os.environ.get("LUMENOS_CANARY"),
    reason="production-shape canary is opt-in (LUMENOS_CANARY=1); "
           "it runs for several minutes on CPU")


def test_production_shape_proof_verifies():
    rows, cols, log_n = 4096, 2048, 12
    rho = 2
    from lumenos_tpu.core.field import GOLDILOCKS_57, PrimeField
    from lumenos_tpu.core.chacha import random_matrix_row_major
    from lumenos_tpu.core.ligero_plain import (
        LigeroCommitter, evaluate_matrix_poly, verify)
    from lumenos_tpu.core.transcript import Transcript
    from lumenos_tpu.fhe.backend import BgvBackend
    from lumenos_tpu.fhe.params import generate_bgv_params_for_ntt
    from lumenos_tpu.fhe.ligero import (
        commit_streaming, prove, decrypt_proof, fhe_leaf_hasher)

    t = GOLDILOCKS_57
    params = generate_bgv_params_for_ntt(cols, log_n, t)
    backend = BgvBackend(params)
    field = PrimeField(t, cols * rho)
    rng = np.random.default_rng(1)
    sk, pk = backend.keygen(rng)
    matrix = random_matrix_row_major(rows, cols, t)
    committer = LigeroCommitter(128, rows, cols, rho)

    prover = commit_streaming(committer, backend, matrix.T.copy(), pk, rng,
                              field)
    point = 7
    eproof = prove(prover, point, Transcript("canary"))
    proof = decrypt_proof(eproof, backend, sk)
    value = evaluate_matrix_poly(matrix, point, field)
    verify(proof, point, value, field, Transcript("canary"),
           fhe_leaf_hasher)  # raises ValueError on any mismatch
