"""Full proof-of-decryption: ABDLOP + linear-relation proof, end-to-end.

Builds the real statement from the protocol pipeline (digit-batched level-1
ciphertexts), proves, verifies; rejects tampered proofs and tampered
statements.
"""

import numpy as np
import pytest

from lumenos_tpu.core.field import GOLDILOCKS_57
from lumenos_tpu.core.transcript import Transcript
from lumenos_tpu.fhe.backend import BgvBackend
from lumenos_tpu.fhe.params import BgvParams
from lumenos_tpu.native import load_native
from lumenos_tpu.vdec.prover import prove_bfv_dec_batched
from lumenos_tpu.vdec.pod import PodProver

pytestmark = pytest.mark.skipif(load_native() is None,
                                reason="native library unavailable")

T = GOLDILOCKS_57
LOG_N = 7
N = 1 << LOG_N


@pytest.fixture(scope="module")
def statement():
    params = BgvParams.generate(log_n=LOG_N, log_q=[58, 56], log_p=[55, 55], t=T)
    backend = BgvBackend(params)
    rng = np.random.default_rng(61)
    sk, pk = backend.keygen(rng)
    g = np.random.default_rng(2)
    cols = 8
    vals = g.integers(0, T, (cols, N)).astype(np.uint64)
    cts = backend.rescale_to(backend.encrypt_values(vals, pk, rng), 1)
    return prove_bfv_dec_batched(backend, cts, vals, None, sk,
                                 Transcript("vdec"))


@pytest.fixture(scope="module")
def pod(statement):
    return PodProver(statement)


@pytest.fixture(scope="module")
def proof(pod):
    return pod.prove(b"test-seed")


def test_pod_prove_verify(pod, proof):
    assert pod.verify(proof)


def test_pod_rejects_tampered_response(pod, proof):
    import copy
    bad = copy.copy(proof)
    bad.z1 = proof.z1.copy()
    bad.z1[0, 0] += 1
    assert not pod.verify(bad)


def test_pod_rejects_tampered_linear_eval(pod, proof):
    import copy
    bad = copy.copy(proof)
    bad.f_eval = proof.f_eval.copy()
    bad.f_eval[0, 0, 0] ^= 1
    assert not pod.verify(bad)


def test_pod_rejects_wrong_statement(pod, proof, statement):
    """A verifier for a different claimed message must reject."""
    verifier = PodProver.__new__(PodProver)
    verifier.__dict__.update(pod.__dict__)
    u2 = pod.u_res.copy()
    u2[0, 0, 0] = (int(u2[0, 0, 0]) + 1) % int(pod.params.primes[0])
    verifier.u_res = u2
    assert not verifier.verify(proof)


def test_pod_rejects_tampered_projection(pod, proof):
    import copy
    bad = copy.copy(proof)
    bad.z_proj = proof.z_proj.copy()
    bad.z_proj[0, 0] += 1
    assert not pod.verify(bad)


def test_pod_rejects_nonzero_h_coeff0(pod, proof):
    import copy
    bad = copy.copy(proof)
    bad.h = proof.h.copy()
    bad.h[0, 0, 0] = 1
    assert not pod.verify(bad)


def test_pod_rejects_tampered_quad_garbage(pod, proof):
    import copy
    bad = copy.copy(proof)
    bad.v0 = proof.v0.copy()
    bad.v0[0, 0] ^= 1
    assert not pod.verify(bad)


def test_security_report_sound(pod):
    rep = pod.security_report()
    assert "SOUND" in rep and "INSUFFICIENT" not in rep


def test_calibrated_params_hardness(pod):
    # the derived MSIS/MLWE ranks must carry their hardness margins
    from lumenos_tpu.vdec.params_gen import DELTA128, calibrate
    import math
    a2 = sum((j1 - j0) * 64 * b * b for (j0, j1, b) in pod.blocks)
    cal = calibrate(153, 64, pod.m1, math.sqrt(a2), pod.N_SLOTS,
                    log2q1=51, nbit_moduli=51, compression=False)
    assert cal.delta_msis < DELTA128
    assert cal.delta_mlwe < DELTA128
    assert cal.k_msis == pod.params.n
    assert cal.m2 == pod.params.m2
