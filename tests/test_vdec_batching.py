"""vdec batching: Dec(recombine(S_k)) == plaintext RLC (reference
TestBatchCiphertexts / TestVdecBatched sanity, vdec/batching_test.go)."""

import numpy as np
import pytest

from lumenos_tpu.core.field import GOLDILOCKS_57
from lumenos_tpu.core.transcript import Transcript
from lumenos_tpu.fhe.backend import BgvBackend
from lumenos_tpu.fhe.params import BgvParams
from lumenos_tpu.vdec.batching import (
    batch_ciphertexts, batch_columns, recombine_digit_values, sample_alphas,
)

T = GOLDILOCKS_57
LOG_N = 5
N = 1 << LOG_N


@pytest.fixture(scope="module")
def setup():
    params = BgvParams.generate(log_n=LOG_N, log_q=[58, 56], log_p=[55, 55], t=T)
    backend = BgvBackend(params)
    rng = np.random.default_rng(21)
    sk, pk = backend.keygen(rng)
    return backend, sk, pk, rng


@pytest.mark.parametrize("cols", [1, 7, 64])
def test_batch_roundtrip(setup, cols):
    backend, sk, pk, rng = setup
    g = np.random.default_rng(cols)
    vals = g.integers(0, T, (cols, N)).astype(np.uint64)
    cts = backend.encrypt_values(vals, pk, rng)
    cts = backend.rescale_to(cts, 1)

    alphas = sample_alphas(Transcript("vdec"), cols)
    batched = batch_ciphertexts(backend, cts, alphas)
    dec = np.asarray(backend.decrypt_values(batched, sk))      # [3, N]
    got = recombine_digit_values(dec, T)
    expect = batch_columns(vals, alphas, T)
    assert np.array_equal(got, expect)


def test_batch_with_scales(setup):
    """Scaled ciphertexts (sigma_j) batch to the RLC of UNSCALED values."""
    backend, sk, pk, rng = setup
    g = np.random.default_rng(77)
    cols = 8
    vals = g.integers(0, T, (cols, N)).astype(np.uint64)
    scales = g.integers(1, T, cols).astype(np.uint64)
    # encrypt sigma_j * v_j (the scaled codeword the protocol produces)
    scaled = np.stack([
        ((vals[j].astype(object) * int(scales[j])) % T).astype(np.uint64)
        for j in range(cols)])
    cts = backend.rescale_to(backend.encrypt_values(scaled, pk, rng), 1)

    alphas = sample_alphas(Transcript("vdec"), cols)
    batched = batch_ciphertexts(backend, cts, alphas, scales)
    dec = np.asarray(backend.decrypt_values(batched, sk))
    got = recombine_digit_values(dec, T)
    expect = batch_columns(vals, alphas, T)   # RLC of unscaled values
    assert np.array_equal(got, expect)
