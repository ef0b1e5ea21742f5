"""HTTP PPD demo pair end-to-end (in-process loopback, CPU backend).

Mirrors the reference's cmd/server + cmd/client flow: keys upload over
POST /keys, proof download over GET /prove, client decrypt + public verify
+ proof-of-decryption, plus the wire-format roundtrip.
"""

import struct
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from lumenos_tpu.apps.server import PpdState, make_handler
from lumenos_tpu.apps.wire import deserialize_keys, serialize_keys
from lumenos_tpu.core.field import GOLDILOCKS_57, PrimeField
from lumenos_tpu.core.ligero_plain import verify
from lumenos_tpu.core.transcript import Transcript
from lumenos_tpu.fhe.backend import BgvBackend
from lumenos_tpu.fhe.ligero import EncryptedProof, decrypt_proof, fhe_leaf_hasher
from lumenos_tpu.fhe.params import generate_bgv_params_for_ntt
from lumenos_tpu.vdec.prover import prove_bfv_dec_batched

T = GOLDILOCKS_57
ROWS, COLS, RHO, LOG_N, POINT = 32, 16, 2, 5, 7


@pytest.fixture(scope="module")
def served():
    state = PpdState(ROWS, COLS, RHO, bench_mode=False)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(state))
    port = httpd.server_address[1]
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def test_wire_roundtrip():
    params = generate_bgv_params_for_ntt(COLS, LOG_N, T)
    backend = BgvBackend(params)
    rng = np.random.default_rng(3)
    sk, pk = backend.keygen(rng)
    blob = serialize_keys(params, pk)
    params2, pk2, evk, rs_k = deserialize_keys(blob)
    assert params2 == params
    assert np.array_equal(np.asarray(pk2.pk0_ntt), np.asarray(pk.pk0_ntt))
    assert evk is None and rs_k == 0


def test_http_ppd_end_to_end(served):
    params = generate_bgv_params_for_ntt(COLS, LOG_N, T)
    backend = BgvBackend(params)
    field = PrimeField(T, COLS * RHO)
    rng = np.random.default_rng(12345)
    sk, pk = backend.keygen(rng)

    blob = serialize_keys(params, pk)
    req = urllib.request.Request(served + "/keys", data=blob, method="POST")
    with urllib.request.urlopen(req) as resp:
        assert resp.read() == b"ok"

    with urllib.request.urlopen(f"{served}/prove?point={POINT}") as resp:
        payload = resp.read()
    value = struct.unpack_from("<Q", payload, 0)[0]
    eproof = EncryptedProof.from_bytes(payload[8:])

    proof = decrypt_proof(eproof, backend, sk)
    verify(proof, POINT, value, field, Transcript("ppd"), fhe_leaf_hasher)

    # proof-of-decryption over the received queried columns
    vals = np.stack([qc.values for qc in proof.queried_cols])
    st = prove_bfv_dec_batched(
        backend, eproof.queried_cols, vals, eproof.queried_scales,
        sk, Transcript("vdec"))
    assert st.q_modulus > 1 << 100


def test_http_ppd_ring_switched(served):
    """Ring-switched MatR/MatZ (reference RING_SWITCH_LOGN): the proof
    shrinks AND still verifies (the reference must skip verification,
    README.md:100-104)."""
    from lumenos_tpu.fhe.ring_switch import new_ring_switch_client

    params = generate_bgv_params_for_ntt(COLS, LOG_N, T)
    backend = BgvBackend(params)
    field = PrimeField(T, COLS * RHO)
    rng = np.random.default_rng(777)
    sk, pk = backend.keygen(rng)
    rs = new_ring_switch_client(backend, sk, LOG_N - 2, rng)

    blob = serialize_keys(params, pk, rs.evk, rs.k)
    params2, pk2, evk2, rs_k2 = deserialize_keys(blob)
    assert evk2 is not None and rs_k2 == rs.k

    req = urllib.request.Request(served + "/keys", data=blob, method="POST")
    with urllib.request.urlopen(req) as resp:
        assert resp.read() == b"ok"
    with urllib.request.urlopen(f"{served}/prove?point={POINT}") as resp:
        payload = resp.read()
    value = struct.unpack_from("<Q", payload, 0)[0]
    eproof = EncryptedProof.from_bytes(payload[8:])

    n_small = 1 << (LOG_N - 2)
    assert eproof.mat_r.data.shape[-1] == n_small
    assert eproof.mat_z.data.shape[-1] == n_small
    assert eproof.queried_cols.data.shape[-1] == 1 << LOG_N  # Merkle-bound

    proof = decrypt_proof(eproof, backend, sk,
                          small=(rs.small_backend, rs.sk_small))
    verify(proof, POINT, value, field, Transcript("ppd"), fhe_leaf_hasher)


def test_http_ppd_gbfv_client(served):
    """Full --gbfv client flow against the live server (reference IS_GBFV
    plumbing, cmd/client/main.go:40-47): fetch + decrypt + GBFV PoD with
    public verification + Ligero verify, via the real CLI entry point."""
    from lumenos_tpu.native import load_native
    if load_native() is None:
        pytest.skip("native library unavailable")
    from lumenos_tpu.apps import client as client_mod
    rc = client_mod.main([
        "--server", served, "--rows", str(ROWS), "--cols", str(COLS),
        "--logn", str(LOG_N), "--point", str(POINT),
        "--gbfv", "--deterministic"])
    assert rc == 0
