"""Native (C++) runtime components: OpenMP Merkle hashing, LNP PoD prover.

Built on demand with g++ (see build.py); Python falls back to the pure
implementations when the shared library is unavailable.
"""

from .build import load_native

__all__ = ["load_native"]
