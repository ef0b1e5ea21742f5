"""Fused, jittable server pipelines (commit + prove device programs).

The protocol allows full fusion: the Fiat-Shamir transcript never absorbs
the Merkle root before sampling r (reference fhe/ligero.go:199 keeps root
out "for compatibility"), so challenge encodings are host-precomputable and
the entire encode + rescale + inner-product server workload is ONE compiled
XLA program over the ciphertext batch. Merkle hashing and transcript ops
remain host-side around it.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from .. import jaxcfg  # noqa: F401
import jax
import jax.numpy as jnp

from ..core.field import PrimeField, get_field
from .backend import BgvBackend, CtBatch
from .hntt import homomorphic_ligero_ntt
from .ring import barrett_mul


_PIPE_CACHE: dict = {}


def build_server_pipeline(backend: BgvBackend, field: PrimeField,
                          cols: int, rho_inv: int, in_shardings=None,
                          out_shardings=None):
    """Returns jitted fn(matrix_data, zeros_data, pt_r_ntt, pt_b_ntt) ->
    (encoded_level1_data, mat_r_level1_data, mat_z_level1_data).

    matrix_data: [cols, 2, L+1, N]; zeros_data: [cols*(rho_inv-1), ...] fresh
    zero encryptions; pt_*_ntt: [L+1, N] challenge plaintexts (NTT domain).
    """
    key = ("full", id(backend), field.modulus, field.n, cols, rho_inv,
           id(in_shardings), id(out_shardings))
    if key in _PIPE_CACHE:
        return _PIPE_CACHE[key]
    lvl = backend.params.max_level
    size = cols * rho_inv

    def pipeline(matrix_data, zeros_data, pt_r_ntt, pt_b_ntt):
        full = CtBatch(data=jnp.concatenate([matrix_data, zeros_data], axis=0),
                       level=lvl)
        enc_ct, _ = homomorphic_ligero_ntt(backend, full, field, size)
        enc1 = backend.rescale_to(enc_ct, 1)

        qj, uj, sj = backend._consts(lvl)
        q2 = qj[:, None]
        d_ntt = backend._ntt(matrix_data, lvl)
        mr = backend._intt(barrett_mul(
            d_ntt, pt_r_ntt[None, None], q2, uj[:, None], sj[:, None]), lvl)
        mz = backend._intt(barrett_mul(
            d_ntt, pt_b_ntt[None, None], q2, uj[:, None], sj[:, None]), lvl)
        mr1 = backend.rescale_to(CtBatch(data=mr, level=lvl), 1).data
        mz1 = backend.rescale_to(CtBatch(data=mz, level=lvl), 1).data
        return enc1.data, mr1, mz1

    kwargs = {}
    if in_shardings is not None:
        kwargs["in_shardings"] = in_shardings
    if out_shardings is not None:
        kwargs["out_shardings"] = out_shardings
    _PIPE_CACHE[key] = jax.jit(pipeline, **kwargs)
    return _PIPE_CACHE[key]


def build_encode_pipeline(backend: BgvBackend, field: PrimeField,
                          cols: int, rho_inv: int, start_level: int | None = None):
    """Jitted fn(matrix_data, zeros_data) -> encoded level-1 data (commit
    phase). ``start_level``: level of the input ciphertexts (reduced-level
    encryption shrinks memory/compute). Inputs are donated (buffer reuse)."""
    if start_level is None:
        start_level = backend.params.max_level
    key = ("enc", id(backend), field.modulus, field.n, cols, rho_inv, start_level)
    if key in _PIPE_CACHE:
        return _PIPE_CACHE[key]
    size = cols * rho_inv

    def pipeline(matrix_data, zeros_data):
        full = CtBatch(data=jnp.concatenate([matrix_data, zeros_data], axis=0),
                       level=start_level)
        enc_ct, _ = homomorphic_ligero_ntt(backend, full, field, size)
        return backend.rescale_to(enc_ct, 1).data

    _PIPE_CACHE[key] = jax.jit(pipeline, donate_argnums=(1,))
    return _PIPE_CACHE[key]


def build_encode_pipeline_full(backend: BgvBackend, field: PrimeField,
                               size: int, start_level: int):
    """Jitted fn(full_data [size,2,L+1,N]) -> encoded level-1 data; the
    input batch (matrix columns + zero-pad encryptions, pre-assembled) is
    DONATED so XLA reuses its ~10 GB in place."""
    key = ("encfull", id(backend), field.modulus, field.n, size, start_level)
    if key in _PIPE_CACHE:
        return _PIPE_CACHE[key]

    def pipeline(full_data):
        full = CtBatch(data=full_data, level=start_level)
        enc_ct, _ = homomorphic_ligero_ntt(backend, full, field, size)
        enc1 = backend.rescale_to(enc_ct, 1).data
        # fused on-device Merkle leaf digests: only 32 B/leaf leaves the chip
        from ..ops.sha256_jax import sha256_leaves_striped
        flat = enc1.reshape(enc1.shape[0], -1)
        digests = sha256_leaves_striped(flat, flat.shape[1] * 8)
        return enc1, digests

    _PIPE_CACHE[key] = jax.jit(pipeline, donate_argnums=(0,))
    return _PIPE_CACHE[key]


def build_challenge_encode(backend: BgvBackend, level: int):
    """Jitted fn(r_vals [rows] u64, b_vals [rows] u64) -> (pt_r_ntt, pt_b_ntt)
    [L+1, N] NTT-domain challenge plaintexts. One program instead of ~30
    eager op dispatches (each a remote compile over the TPU tunnel)."""
    key = ("chal", id(backend), level)
    if key in _PIPE_CACHE:
        return _PIPE_CACHE[key]
    enc = backend.encoder

    def pipeline(r_vals, b_vals):
        out = []
        for vals in (r_vals, b_vals):
            out.append(backend._ntt(
                enc.lift_to_rns(enc.encode(vals), level), level))
        return tuple(out)

    _PIPE_CACHE[key] = jax.jit(pipeline)
    return _PIPE_CACHE[key]


def build_products_pipeline(backend: BgvBackend, level: int | None = None):
    """Jitted fn(matrix_data, pt_r_ntt, pt_b_ntt) -> (matR1, matZ1) data.
    ``level``: level of the matrix ciphertexts (>= 2 for noise headroom of
    one plaintext multiplication)."""
    lvl = backend.params.max_level if level is None else level
    key = ("prod", id(backend), lvl)
    if key in _PIPE_CACHE:
        return _PIPE_CACHE[key]

    def pipeline(matrix_data, pt_r_ntt, pt_b_ntt):
        qj, uj, sj = backend._consts(lvl)
        q2 = qj[:, None]
        d_ntt = backend._ntt(matrix_data, lvl)
        mr = backend._intt(barrett_mul(
            d_ntt, pt_r_ntt[None, None], q2, uj[:, None], sj[:, None]), lvl)
        mz = backend._intt(barrett_mul(
            d_ntt, pt_b_ntt[None, None], q2, uj[:, None], sj[:, None]), lvl)
        mr1 = backend.rescale_to(CtBatch(data=mr, level=lvl), 1).data
        mz1 = backend.rescale_to(CtBatch(data=mz, level=lvl), 1).data
        return mr1, mz1

    _PIPE_CACHE[key] = jax.jit(pipeline)
    return _PIPE_CACHE[key]


def products_apply(backend: BgvBackend, matrix_data, pt_r_ntt, pt_b_ntt,
                   level: int | None = None, max_temp_bytes: float = 4e9):
    """Run the products pipeline, column-chunked when one whole-matrix
    program would exceed HBM: its HLO temps run ~4.5x the input bytes
    (measured on-chip: 13.5G temps for the 3.0G LogN=14 input, rejected
    against 15.75G HBM at compile time). Chunking trades a few extra
    dispatches for a bounded program footprint; results are bit-identical
    (tests/test_hligero.py::test_products_chunked)."""
    cols = matrix_data.shape[0]
    in_bytes = matrix_data.size * matrix_data.dtype.itemsize
    n_chunks = 1
    while in_bytes / n_chunks * 4.5 > max_temp_bytes and n_chunks < cols:
        n_chunks *= 2
    fn = build_products_pipeline(backend, level=level)
    if n_chunks == 1:
        return fn(matrix_data, pt_r_ntt, pt_b_ntt)
    # ceil-div chunking: every column is covered exactly once for ANY
    # cols (non-power-of-two widths reach here from prove()); the ragged
    # tail chunk compiles one extra program shape, nothing is dropped
    ck = -(-cols // n_chunks)
    outs = [fn(matrix_data[c0:min(cols, c0 + ck)], pt_r_ntt, pt_b_ntt)
            for c0 in range(0, cols, ck)]
    return (jnp.concatenate([o[0] for o in outs]),
            jnp.concatenate([o[1] for o in outs]))
