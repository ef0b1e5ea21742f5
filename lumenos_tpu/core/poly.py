"""Dense polynomial with Horner evaluation over F_t.

Mirrors reference core/poly.go: coefficients are the row-major flattening of
the witness matrix (poly.go:13-16); evaluation is Horner from the highest
coefficient (poly.go:21-30).
"""

from __future__ import annotations

import numpy as np


class DensePoly:
    def __init__(self, coefficients: np.ndarray):
        self.coefficients = np.asarray(coefficients, dtype=np.uint64)

    @classmethod
    def from_matrix(cls, matrix: np.ndarray) -> "DensePoly":
        return cls(np.asarray(matrix, dtype=np.uint64).reshape(-1))

    def evaluate(self, field, point: int) -> int:
        q = field.modulus
        result = 0
        for c in self.coefficients[::-1]:
            result = (result * point + int(c)) % q
        return result
