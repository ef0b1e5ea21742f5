"""Key/params wire serialization for the client->server upload.

Reference: cmd/client/main.go:105-148 posts marshaled pk (+ optional ring
switch evk) as the /keys payload; cmd/server/main.go:66-122 reconstructs
its backend from it. Our format: a little-endian header describing the
parameter set (so the server derives identical tables host-side) followed
by raw u64 dumps of the public key (and optional ring-switch evk).
"""

from __future__ import annotations

import struct

import numpy as np

from .. import jaxcfg  # noqa: F401
import jax.numpy as jnp

from ..fhe.backend import PublicKey
from ..fhe.keyswitch import SwitchingKey
from ..fhe.params import BgvParams

MAGIC = b"LMTP"


def _dump_u64(arr) -> bytes:
    a = np.asarray(arr).astype("<u8")
    return struct.pack("<B", a.ndim) + struct.pack(f"<{a.ndim}I", *a.shape) + a.tobytes()


def _load_u64(data: bytes, off: int):
    (nd,) = struct.unpack_from("<B", data, off)
    off += 1
    shape = struct.unpack_from(f"<{nd}I", data, off)
    off += 4 * nd
    count = int(np.prod(shape))
    arr = np.frombuffer(data, dtype="<u8", count=count, offset=off).reshape(shape)
    return jnp.asarray(arr.astype(np.uint64)), off + count * 8


def serialize_params(params: BgvParams) -> bytes:
    qs = params.q_primes
    ps = params.p_primes
    out = [struct.pack("<BQBB", params.log_n, params.t, len(qs), len(ps))]
    for q in (*qs, *ps):
        out.append(struct.pack("<Q", q))
    return b"".join(out)


def deserialize_params(data: bytes, off: int = 0):
    log_n, t, nq, npp = struct.unpack_from("<BQBB", data, off)
    off += 11
    primes = struct.unpack_from(f"<{nq + npp}Q", data, off)
    off += 8 * (nq + npp)
    params = BgvParams(log_n=log_n, t=t, q_primes=tuple(primes[:nq]),
                       p_primes=tuple(primes[nq:]))
    return params, off


def serialize_keys(params: BgvParams, pk: PublicKey,
                   rs_evk: SwitchingKey | None = None,
                   rs_k: int = 0) -> bytes:
    """rs_evk/rs_k: optional ring-switch evaluation key and subsample
    stride k = N / N' (reference cmd/client/main.go:112-129)."""
    out = [MAGIC, serialize_params(params),
           _dump_u64(pk.pk0_ntt), _dump_u64(pk.pk1_ntt)]
    if rs_evk is not None:
        out.append(b"\x01")
        out.append(struct.pack("<BBH", rs_evk.alpha, rs_evk.level, rs_k))
        out.append(_dump_u64(rs_evk.ksk0))
        out.append(_dump_u64(rs_evk.ksk1))
    else:
        out.append(b"\x00")
    return b"".join(out)


def deserialize_keys(data: bytes):
    assert data[:4] == MAGIC, "bad magic"
    params, off = deserialize_params(data, 4)
    pk0, off = _load_u64(data, off)
    pk1, off = _load_u64(data, off)
    has_evk = data[off]
    off += 1
    evk = None
    rs_k = 0
    if has_evk:
        alpha, level, rs_k = struct.unpack_from("<BBH", data, off)
        off += 4
        k0, off = _load_u64(data, off)
        k1, off = _load_u64(data, off)
        evk = SwitchingKey(ksk0=k0, ksk1=k1, alpha=alpha, level=level)
    return params, PublicKey(pk0_ntt=pk0, pk1_ntt=pk1), evk, rs_k
