"""PoD statement assembly: relation holds exactly, noise inside bounds
(reference TestVdecBatched pattern, vdec/prover_test.go:23)."""

import numpy as np
import pytest

from lumenos_tpu.core.field import GOLDILOCKS_57
from lumenos_tpu.core.transcript import Transcript
from lumenos_tpu.fhe.backend import BgvBackend
from lumenos_tpu.fhe.params import BgvParams
from lumenos_tpu.vdec.prover import check_witness, prove_bfv_dec_batched

T = GOLDILOCKS_57
LOG_N = 5
N = 1 << LOG_N


@pytest.fixture(scope="module")
def setup():
    params = BgvParams.generate(log_n=LOG_N, log_q=[58, 56], log_p=[55, 55], t=T)
    backend = BgvBackend(params)
    rng = np.random.default_rng(31)
    sk, pk = backend.keygen(rng)
    return backend, sk, pk, rng


def test_pod_statement_valid(setup):
    backend, sk, pk, rng = setup
    g = np.random.default_rng(1)
    cols, rows = 16, N
    vals = g.integers(0, T, (cols, rows)).astype(np.uint64)
    cts = backend.rescale_to(backend.encrypt_values(vals, pk, rng), 1)
    st = prove_bfv_dec_batched(
        backend, cts, vals, None, sk, Transcript("vdec"))
    # relation verified inside; check bounds are meaningfully small
    worst = max(abs(int(x)) for x in st.noise.reshape(-1))
    assert worst < 1 << 45
    check_witness(st)


def test_pod_rejects_lying_values(setup):
    backend, sk, pk, rng = setup
    g = np.random.default_rng(2)
    cols, rows = 8, N
    vals = g.integers(0, T, (cols, rows)).astype(np.uint64)
    cts = backend.rescale_to(backend.encrypt_values(vals, pk, rng), 1)
    lies = vals.copy()
    lies[3, 7] = (int(lies[3, 7]) + 1) % T
    with pytest.raises(ValueError):
        prove_bfv_dec_batched(backend, cts, lies, None, sk, Transcript("vdec"))


def test_generate_header_file(tmp_path):
    """The C-vector emitter (reference GenerateHeaderFile parity) writes
    a header that a C compiler accepts."""
    import subprocess
    from lumenos_tpu.vdec.prover import PodStatement, generate_header_file
    rng = np.random.default_rng(5)
    n = 64
    Q = (1 << 114) - 5
    def cc(k):
        a = np.array([int(x) for x in rng.integers(-(1 << 62), 1 << 62, (k, n)).reshape(-1)],
                     dtype=object).reshape(k, n)
        return a
    st = PodStatement(q_modulus=Q, t=(1 << 57) - 13, n=n, ct0=cc(2), ct1=cc(2),
                      delta_m=cc(2), sk_signed=rng.integers(-1, 2, n).astype(np.int64),
                      noise=cc(2), noise_bound=1 << 43)
    hdr = tmp_path / "vdec_vectors.h"
    generate_header_file(st, str(hdr))
    main = tmp_path / "m.c"
    main.write_text(f'#include "{hdr}"\nint main(void){{return vdec_ct0[0][0].lo != 0 ? 0 : 0;}}\n')
    subprocess.run(["gcc", "-c", str(main), "-o", str(tmp_path / "m.o")], check=True)
