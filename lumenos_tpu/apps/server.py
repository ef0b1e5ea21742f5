"""PPD HTTP server: accept client keys, prove over an encrypted witness.

Reference: cmd/server/main.go - POST /keys (pk upload), GET /prove?point=z
(generate the deterministic ChaCha matrix, encrypt under the client's pk,
homomorphic commit + prove, respond [8-byte LE value || proof bytes]).

Run: python -m lumenos_tpu.apps.server --port 8700 --rows 256 --cols 128 \
         --logn 8 [--bench-mode]
"""

from __future__ import annotations

import argparse
import struct
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from ..core.chacha import random_matrix_row_major
from ..core.field import PrimeField
from ..core.ligero_plain import LigeroCommitter, evaluate_matrix_poly
from ..core.tracer import start_span
from ..core.transcript import Transcript
from ..fhe.backend import BgvBackend
from ..fhe.ligero import commit, prove
from .wire import deserialize_keys


class PpdState:
    def __init__(self, rows: int, cols: int, rho: int, bench_mode: bool,
                 deterministic: bool = False):
        self.rows = rows
        self.cols = cols
        self.rho = rho
        self.bench_mode = bench_mode
        self.deterministic = deterministic
        self.backend: BgvBackend | None = None
        self.pk = None
        self.ring_switch = None   # (evk, k) when the client asked for it
        self.field: PrimeField | None = None
        self.done = threading.Event()


def make_handler(state: PpdState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            sys.stderr.write("[server] " + fmt % args + "\n")

        def do_POST(self):
            if self.path != "/keys":
                self.send_error(404)
                return
            length = int(self.headers["Content-Length"])
            blob = self.rfile.read(length)
            params, pk, evk, rs_k = deserialize_keys(blob)
            state.backend = BgvBackend(params)
            state.pk = pk
            state.ring_switch = (evk, rs_k) if evk is not None else None
            state.field = PrimeField(params.t, state.cols * state.rho)
            self.send_response(200)
            self.end_headers()
            self.wfile.write(b"ok")

        def do_GET(self):
            if not self.path.startswith("/prove"):
                self.send_error(404)
                return
            if state.backend is None:
                self.send_error(400, "keys not uploaded")
                return
            point = 1
            if "point=" in self.path:
                point = int(self.path.split("point=")[1].split("&")[0])

            backend, field = state.backend, state.field
            rows, cols, rho = state.rows, state.cols, state.rho
            # OS entropy unless --deterministic (encryption randomness must
            # not be publicly reproducible; ADVICE.md round-1 medium)
            rng = np.random.default_rng(2 if state.deterministic else None)

            span = start_span("Prove FHE evaluation", None,
                              "Prove FHE evaluation...")
            matrix = random_matrix_row_major(rows, cols, backend.t)
            committer = LigeroCommitter(128, rows, cols, rho)
            # monolithic commit up to ~mid sizes; streamed staged encode
            # beyond (bounded HBM liveness - fhe/ligero.py commit_streaming)
            big = (cols * rho * 2 * (backend.params.max_level + 1)
                   * backend.n * 8 > 1.5e9)
            if big:
                from ..fhe.ligero import commit_streaming
                prover = commit_streaming(committer, backend,
                                          np.ascontiguousarray(matrix.T),
                                          state.pk, rng, field, span)
            else:
                mat_ct = backend.encrypt_values(
                    np.ascontiguousarray(matrix.T), state.pk, rng)
                prover = commit(committer, backend, mat_ct, state.pk, rng,
                                field, span)
            eproof = prove(prover, point, Transcript("ppd"), span,
                           ring_switch=state.ring_switch)
            span.end(newline=True)

            value = evaluate_matrix_poly(matrix, point, field)
            payload = struct.pack("<Q", value) + eproof.to_bytes()
            sz = eproof.sizes()
            parts = " ".join(f"{k}={v / 1e6:.1f}MB" for k, v in sz.items()
                             if k != "root")
            print(f"[server] proof sizes: {parts}  "
                  f"muls={backend.mul_count}")
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)
            if state.bench_mode:
                state.done.set()

    return Handler


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8700)
    ap.add_argument("--rows", type=int, default=256)
    ap.add_argument("--cols", type=int, default=128)
    ap.add_argument("--rho", type=int, default=2)
    ap.add_argument("--bench-mode", action="store_true")
    ap.add_argument("--deterministic", action="store_true",
                    help="fixed RNG seed (tests/benches ONLY)")
    args = ap.parse_args(argv)

    state = PpdState(args.rows, args.cols, args.rho, args.bench_mode,
                     args.deterministic)
    httpd = ThreadingHTTPServer(("127.0.0.1", args.port), make_handler(state))
    print(f"[server] listening :{args.port} rows={args.rows} cols={args.cols}",
          flush=True)
    if args.bench_mode:
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        state.done.wait()
        httpd.shutdown()
    else:
        httpd.serve_forever()


if __name__ == "__main__":
    main()
