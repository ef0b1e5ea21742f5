"""Plaintext Ligero PCS: commit / prove / verify over F_t (config 1).

This is simultaneously:
- the client-local proving baseline ("Ligero local", README.md:91),
- the differential oracle for the homomorphic prover, and
- the public verifier run on decrypted proofs.

Mirrors reference fhe/ligero.go:799-953 (LigeroProveReference) and :517-574
(Verify). Heavy tensor work (row encoding, inner products) is jitted JAX;
Merkle/transcript are host-side.

Deviation from the reference (documented): the reference's Verify and
LigeroProveReference build the power vectors a/b by storing a *pointer* to a
mutated accumulator (fhe/ligero.go:531-549), leaving every entry equal to
the final power. Its own FHE prover materializes correct powers
(fhe/ligero.go:209-221), so the two only agree at the reference's sole
tested evaluation point z=1. We implement correct powers everywhere -
identical behavior at z=1, and self-consistent for all z.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass

import numpy as np

from .. import jaxcfg  # noqa: F401
import jax
import jax.numpy as jnp

from .field import PrimeField
from .merkle import MerkleTree, verify_merkle_path
from .ntt import encode_row
from .transcript import Transcript
from ..ops.modmath import ModCtx, mulmod, summod


def calculate_queries(security_bits: float, rho_inv: int) -> int:
    """Query count: ceil(lambda / (1 - log2(1 + 1/rhoInv))) (ligero.go:65-71)."""
    log_term = math.log2(1.0 + 1.0 / rho_inv)
    if 1.0 - log_term <= 0:
        return 0
    return math.ceil(security_bits / (1.0 - log_term))


def calculate_queries_bci20(security_bits: float, rho_inv: int, rows: int, modulus: int) -> int:
    """BCI+20-style bound (ligero.go:73-93); unused by default, kept for parity."""
    codeword_len = float(rows * rho_inv)
    field_bits = modulus.bit_length()
    residual = codeword_len / math.pow(2, float(field_bits))
    rhs = math.log2(math.pow(2, -float(int(security_bits))) - residual)
    if not math.isinf(rhs):
        raise ValueError("field is not big enough")
    nom = rhs - 1.0
    denom = math.log2(0.5 + 0.5 / rho_inv)
    return math.ceil(nom / denom)


@dataclass(frozen=True)
class LigeroMetadata:
    rows: int
    cols: int
    rho_inv: int
    queries: int

    def to_bytes(self) -> bytes:
        return struct.pack("<IIBH", self.rows, self.cols, self.rho_inv, self.queries)

    @classmethod
    def from_bytes(cls, data: bytes) -> "LigeroMetadata":
        rows, cols, rho_inv, queries = struct.unpack("<IIBH", data[:11])
        return cls(rows, cols, rho_inv, queries)


class LigeroCommitter:
    def __init__(self, security_bits: float, rows: int, cols: int, rho_inv: int):
        if rows * cols <= 0:
            raise ValueError("size must be positive")
        self.meta = LigeroMetadata(
            rows=rows, cols=cols, rho_inv=rho_inv,
            queries=calculate_queries(security_bits, rho_inv),
        )


@dataclass
class QueriedColumn:
    values: np.ndarray        # [rows] decrypted/plaintext column values
    leaf_bytes: bytes         # the exact bytes hashed into the Merkle leaf


@dataclass
class Proof:
    """Decrypted / plaintext Ligero proof (reference fhe/ligero.go:370-378)."""

    meta: LigeroMetadata
    root: bytes
    mat_r: np.ndarray         # [cols]
    mat_z: np.ndarray         # [cols]
    queried_cols: list[QueriedColumn]
    merkle_paths: list[list[bytes]]


def element_column_bytes(col: np.ndarray) -> bytes:
    """Merkle leaf bytes for a plaintext column: concat LE u64 (ligero.go:867-875)."""
    return np.ascontiguousarray(col.astype("<u8")).tobytes()


def sample_query_indices(transcript: Transcript, queries: int, ext_cols: int) -> list[int]:
    # `% ext_cols` has modulo bias for non-power-of-2 ext_cols; this is
    # DELIBERATE parity with the reference (fhe/ligero.go:638-644), which
    # does the same — matching indices are required for proof agreement.
    return [transcript.sample_uint64("query") % ext_cols for _ in range(queries)]


def _powers(field: PrimeField, base: int, n: int) -> np.ndarray:
    out = np.zeros(n, dtype=np.uint64)
    acc = 1
    for i in range(n):
        out[i] = acc
        acc = acc * base % field.modulus
    return out


_JIT_CACHE: dict = {}


def _cached_jit(key, builder):
    if key not in _JIT_CACHE:
        _JIT_CACHE[key] = jax.jit(builder())
    return _JIT_CACHE[key]


def encode_matrix(matrix, rho_inv: int, field: PrimeField):
    """[rows, cols] -> [rows, cols*rho_inv] RS-encoded rows (jitted)."""
    return encode_row(matrix, rho_inv, field)


def _encode_fn(field: PrimeField, rho_inv: int):
    return _cached_jit(("encode", field.modulus, field.n, rho_inv),
                       lambda: (lambda m: encode_row(m, rho_inv, field)))


def _inner_fn(q: int):
    return _cached_jit(("inner", q),
                       lambda: (lambda m, w: inner_products(m, w, q)))


def inner_products(matrix, weights, q: int):
    """[rows, cols] x [rows] -> [cols]: column-wise weighted sums mod q."""
    ctx = ModCtx.new(q)
    prod = mulmod(matrix, weights[:, None], ctx)
    return summod(prod, q, axis=0)


def evaluate_matrix_poly(matrix: np.ndarray, point: int, field: PrimeField) -> int:
    """poly(z) where coefficients = row-major flatten of matrix.

    Vectorized Horner replacement: value = sum_i (z^cols)^i * <M[i,:], a>
    with a = powers of z (exact same value as DensePoly.evaluate).
    """
    rows, cols = matrix.shape
    q = field.modulus
    a = jnp.asarray(_powers(field, point, cols))
    b = jnp.asarray(_powers(field, pow(point, cols, q), rows))
    mat = jnp.asarray(matrix, jnp.uint64)
    row_vals = _inner_fn(q)(mat.T, a)        # [rows]
    ctx = ModCtx.new(q)
    return int(summod(mulmod(row_vals, b, ctx), q))


def ligero_prove_reference(
    committer: LigeroCommitter,
    matrix: np.ndarray,
    point: int,
    field: PrimeField,
    transcript: Transcript,
    span=None,
) -> Proof:
    """Full plaintext prover (reference fhe/ligero.go:799-953)."""
    meta = committer.meta
    rows, cols, rho_inv, queries = meta.rows, meta.cols, meta.rho_inv, meta.queries
    q = field.modulus

    mat = jnp.asarray(matrix, jnp.uint64)
    encoded = np.asarray(_encode_fn(field, rho_inv)(mat))          # [rows, extCols]
    encoded_cols = encoded.T                                       # [extCols, rows]

    leaves = [element_column_bytes(encoded_cols[i]) for i in range(cols * rho_inv)]
    tree = MerkleTree(leaves)

    r_raw = transcript.sample_fields("r", rows)
    r = jnp.asarray(np.array([x % q for x in r_raw], dtype=np.uint64))
    mat_r = np.asarray(_inner_fn(q)(mat, r))

    z_pow = pow(point, cols, q)
    b = jnp.asarray(_powers(field, z_pow, rows))
    mat_z = np.asarray(_inner_fn(q)(mat, b))

    transcript.append_field("point", point)

    query_indices = sample_query_indices(transcript, queries, cols * rho_inv)
    queried_cols = []
    merkle_paths = []
    for idx in query_indices:
        queried_cols.append(QueriedColumn(values=encoded_cols[idx], leaf_bytes=leaves[idx]))
        merkle_paths.append(tree.get_path(idx))

    return Proof(
        meta=meta, root=tree.root, mat_r=mat_r, mat_z=mat_z,
        queried_cols=queried_cols, merkle_paths=merkle_paths,
    )


def verify(
    proof: Proof,
    point: int,
    value: int,
    field: PrimeField,
    transcript: Transcript,
    leaf_hasher=None,
) -> None:
    """Public verifier (reference fhe/ligero.go:517-574). Raises on failure."""
    meta = proof.meta
    rows, cols = meta.rows, meta.cols
    q = field.modulus

    r_raw = transcript.sample_fields("r", rows)
    r = np.array([x % q for x in r_raw], dtype=np.uint64)

    enc = _encode_fn(field, meta.rho_inv)
    encoded_mat_r = np.asarray(enc(jnp.asarray(proof.mat_r, jnp.uint64)[None]))[0]
    encoded_mat_z = np.asarray(enc(jnp.asarray(proof.mat_z, jnp.uint64)[None]))[0]

    transcript.append_field("point", point)

    a = _powers(field, point, cols)
    z_pow = pow(point, cols, q)
    b = _powers(field, z_pow, rows)

    ext_cols = cols * meta.rho_inv
    query_indices = sample_query_indices(transcript, meta.queries, ext_cols)

    rj = jnp.asarray(r)
    bj = jnp.asarray(b)
    cols_mat = jnp.asarray(
        np.stack([qc.values for qc in proof.queried_cols]).astype(np.uint64).T)  # [rows, Qn]
    col_r = np.asarray(_inner_fn(q)(cols_mat, rj))
    col_b = np.asarray(_inner_fn(q)(cols_mat, bj))

    for i, idx in enumerate(query_indices):
        qc = proof.queried_cols[i]
        if not verify_merkle_path(qc.leaf_bytes, proof.merkle_paths[i],
                                  proof.root, idx, leaf_hasher):
            raise ValueError(f"failed to verify merkle path for column {idx}")
        if int(col_r[i]) != int(encoded_mat_r[idx]):
            raise ValueError(f"well-formedness R check failed for column {idx}")
        if int(col_b[i]) != int(encoded_mat_z[idx]):
            raise ValueError(f"well-formedness B check failed for column {idx}")

    mz = field.inner_product(proof.mat_z, a)
    if mz != value % q:
        raise ValueError("claimed value does not match the evaluation of the committed polynomial")
