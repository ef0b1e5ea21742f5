"""Plaintext crypto core: prime field, NTT, RS code, Merkle, transcript.

TPU-native counterpart of the reference's ``core/`` layer
(reference: core/field.go, core/ntt.go, core/code.go, core/tree.go,
core/transcript.go, core/poly.go, core/utils.go, core/tracer.go).
"""

from .field import PrimeField, GOLDILOCKS_57
from .chacha import chacha20_keystream, random_matrix_row_major
from .transcript import Transcript
from .merkle import MerkleTree, verify_merkle_path
from .poly import DensePoly
from .tracer import Span, start_span

__all__ = [
    "PrimeField",
    "GOLDILOCKS_57",
    "chacha20_keystream",
    "random_matrix_row_major",
    "Transcript",
    "MerkleTree",
    "verify_merkle_path",
    "DensePoly",
    "Span",
    "start_span",
]
