"""PPD HTTP client: keygen, upload keys, fetch + decrypt + verify a proof.

Reference: cmd/client/main.go - generate keys, POST /keys, GET /prove,
decrypt the encrypted proof, optional proof-of-decryption, public verify,
then run the local plaintext Ligero baseline for comparison.

Run: python -m lumenos_tpu.apps.client --server http://127.0.0.1:8700 \
         --rows 256 --cols 128 --logn 8 --point 7 [--vdec] [--local-baseline]
"""

from __future__ import annotations

import argparse
import struct
import sys
import urllib.request

import numpy as np

from ..core.chacha import random_matrix_row_major
from ..core.field import PrimeField
from ..core.ligero_plain import LigeroCommitter, ligero_prove_reference, verify
from ..core.tracer import start_span
from ..core.transcript import Transcript
from ..fhe.backend import BgvBackend
from ..fhe.ligero import EncryptedProof, decrypt_proof, fhe_leaf_hasher
from ..fhe.params import generate_bgv_params_for_ntt
from ..vdec.prover import prove_bfv_dec_batched
from .wire import serialize_keys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--server", default="http://127.0.0.1:8700")
    ap.add_argument("--rows", type=int, default=256)
    ap.add_argument("--cols", type=int, default=128)
    ap.add_argument("--rho", type=int, default=2)
    ap.add_argument("--logn", type=int, default=8)
    ap.add_argument("--point", type=int, default=1)
    ap.add_argument("--vdec", action="store_true")
    ap.add_argument("--gbfv", action="store_true",
                    help="run the GBFV-ring PoD over the decrypted values "
                         "(reference IS_GBFV, cmd/client/main.go:40-47). "
                         "Our GBFV proofs verify; see vdec/gbfv.py "
                         "gbfv_pod_from_values for the FHE-layer caveat")
    ap.add_argument("--ring-switch-logn", type=int, default=0,
                    help="switch MatR/MatZ to this LogN before download "
                         "(reference RING_SWITCH_LOGN; our proofs stay "
                         "verifiable after the switch)")
    ap.add_argument("--local-baseline", action="store_true")
    ap.add_argument("--deterministic", action="store_true",
                    help="fixed RNG seed (tests/benches ONLY - keys become "
                         "publicly reproducible; ADVICE.md round-1 medium)")
    args = ap.parse_args(argv)

    from ..core.field import GOLDILOCKS_57
    t = GOLDILOCKS_57
    params = generate_bgv_params_for_ntt(args.cols, args.logn, t)
    backend = BgvBackend(params)
    field = PrimeField(t, args.cols * args.rho)
    # OS entropy by default: the secret key must not be reproducible
    rng = np.random.default_rng(12345 if args.deterministic else None)

    span = start_span("Keygen + upload", None, "Keygen...")
    sk, pk = backend.keygen(rng)
    rs = None
    if args.ring_switch_logn:
        from ..fhe.ring_switch import new_ring_switch_client
        rs = new_ring_switch_client(backend, sk, args.ring_switch_logn, rng)
        blob = serialize_keys(params, pk, rs.evk, rs.k)
    else:
        blob = serialize_keys(params, pk)
    req = urllib.request.Request(args.server + "/keys", data=blob, method="POST")
    with urllib.request.urlopen(req) as resp:
        assert resp.read() == b"ok"
    span.end()
    print(f"[client] uploaded keys: {len(blob) / 1e6:.1f} MB", flush=True)

    span = start_span("Fetch proof", None)
    with urllib.request.urlopen(f"{args.server}/prove?point={args.point}") as resp:
        payload = resp.read()
    span.end()
    value = struct.unpack_from("<Q", payload, 0)[0]
    eproof = EncryptedProof.from_bytes(payload[8:])
    print(f"[client] received proof: {len(payload) / 1e6:.1f} MB, "
          f"claimed value {value}", flush=True)

    span = start_span("Decrypt proof", None, "Decrypt proof...")
    small = (rs.small_backend, rs.sk_small) if rs is not None else None
    proof = decrypt_proof(eproof, backend, sk, span, small=small)
    span.end(newline=True)

    if args.vdec:
        # full PoD: RLC batch -> witness -> lattice proof -> wire -> a
        # PUBLIC verifier re-checks it (reference ProveDecrypt flow,
        # fhe/ligero.go:504; our verifier needs no witness)
        span = start_span("Verifiable decrypt", None, "Verifiable decrypt...")
        from ..vdec.prover import prove_and_verify_pod
        from ..vdec.pod import PodProof, PodProver
        vals = np.stack([qc.values for qc in proof.queried_cols])
        try:
            st, pod_proof = prove_and_verify_pod(
                backend, eproof.queried_cols, vals, eproof.queried_scales,
                sk, Transcript("vdec"), span)
        except ValueError as e:
            # toy demo dimensions: the 256-dim projection argument needs
            # production ring degrees (the reference's vdec likewise
            # assumes degree >= 2048, vdec/prover.go:64). Fall back to
            # statement assembly + exact witness check.
            if "statistically complete" not in str(e):
                raise
            print(f"[client] full PoD skipped at demo dims ({e}); "
                  "running witness check only", flush=True)
            prove_bfv_dec_batched(
                backend, eproof.queried_cols, vals, eproof.queried_scales,
                sk, Transcript("vdec"), span)
            span.end()
        else:
            blob = pod_proof.to_bytes()
            public_ok = PodProver(st.public()).verify(
                PodProof.from_bytes(blob))
            span.end()
            print(f"[client] PoD proof {len(blob) / 1e6:.2f} MB, public "
                  f"verification {'OK' if public_ok else 'FAILED'}",
                  flush=True)
            if not public_ok:
                raise SystemExit("PoD public verification failed")

    if args.gbfv:
        # GBFV-ring PoD over the RLC-batched decrypted values (reference
        # IS_GBFV plumbing; statement bound to the session transcript)
        span = start_span("Verifiable decrypt (GBFV)", None,
                          "Verifiable decrypt (GBFV)...")
        from ..vdec.batching import batch_columns, sample_alphas
        from ..vdec.gbfv import GbfvPodProver, gbfv_pod_from_values
        from ..vdec.pod import PodProof
        tr = Transcript("vdec")
        vals = np.stack([qc.values for qc in proof.queried_cols])
        alphas = sample_alphas(tr, vals.shape[0])
        batch_vals = batch_columns(vals, alphas, t)
        st = gbfv_pod_from_values(
            batch_vals, t,
            rng=np.random.default_rng(777) if args.deterministic else None,
            transcript=tr)
        gproof = GbfvPodProver(st).prove()
        blob = gproof.to_bytes()
        public_ok = GbfvPodProver(st.public()).verify(
            PodProof.from_bytes(blob))
        span.end(newline=True)
        print(f"[client] GBFV PoD proof {len(blob) / 1e6:.2f} MB, public "
              f"verification {'OK' if public_ok else 'FAILED'}", flush=True)
        if not public_ok:
            raise SystemExit("GBFV PoD public verification failed")

    span = start_span("Verify proof", None)
    verify(proof, args.point, value, field, Transcript("ppd"), fhe_leaf_hasher)
    span.end()
    print("[client] proof VERIFIED", flush=True)

    if args.local_baseline:
        span = start_span("Ligero local", None, "Ligero local baseline...")
        matrix = random_matrix_row_major(args.rows, args.cols, t)
        committer = LigeroCommitter(128, args.rows, args.cols, args.rho)
        ligero_prove_reference(committer, matrix, args.point, field,
                               Transcript("local"))
        span.end()
    return 0


if __name__ == "__main__":
    sys.exit(main())
