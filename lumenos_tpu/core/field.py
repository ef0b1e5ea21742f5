"""Prime field F_t with lattigo-compatible NTT constants (host-side scalars).

Mirrors the reference's core/field.go + the slice of lattigo's ring.SubRing
it wraps (reference: core/field.go:138-197, "generateNTTConstants" ported
from lattigo subring.go):

- ``roots_forward[bitrev(j, logN)] = MForm(psi^j)`` where ``psi`` is a
  primitive 2N-th root of unity and ``MForm(x) = x * 2^64 mod q``
  (Montgomery form with R = 2^64).
- The reference multiplies these Montgomery-form table entries with a plain
  Barrett product (core/field.go:56-58), so every twiddle multiplication
  carries an extra factor 2^64 mod q. This is replicated deliberately: the
  transform is self-consistent between prover and verifier and its exact
  values define the protocol.

Scalar ops use Python ints (exact, host-side). Bulk tensor ops live in
ops/modmath.py (JAX) and share these tables.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

# Ligero plaintext prime t = 2^57 - 2^18 + 1 (README.md:47-52)
GOLDILOCKS_57 = (1 << 57) - (1 << 18) + 1


def _factorize(n: int) -> list[int]:
    """Distinct prime factors of n (trial division + Pollard rho)."""
    factors: set[int] = set()

    def pollard_rho(m: int) -> int:
        if m % 2 == 0:
            return 2
        import math
        import random
        rng = random.Random(0xC0FFEE ^ m)
        while True:
            x = rng.randrange(2, m)
            y, c, d = x, rng.randrange(1, m), 1
            while d == 1:
                x = (x * x + c) % m
                y = (y * y + c) % m
                y = (y * y + c) % m
                d = math.gcd(abs(x - y), m)
            if d != m:
                return d

    def rec(m: int) -> None:
        if m == 1:
            return
        if _is_prime(m):
            factors.add(m)
            return
        for p in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31):
            if m % p == 0:
                factors.add(p)
                while m % p == 0:
                    m //= p
                rec(m)
                return
        d = pollard_rho(m)
        rec(d)
        rec(m // d)

    rec(n)
    return sorted(factors)


def _is_prime(n: int) -> bool:
    """Deterministic Miller-Rabin for n < 3.3e24."""
    if n < 2:
        return False
    for p in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % p == 0:
            return n == p
    d, r = n - 1, 0
    while d % 2 == 0:
        d //= 2
        r += 1
    for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(r - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


def primitive_root(q: int) -> int:
    """Smallest primitive root of prime q, searched from g=2 upward.

    lattigo's ring.PrimitiveRoot performs the same factor-based test; the
    starting candidate is assumed equal (unverifiable without the Go
    toolchain; all protocol tests enforce self-consistency regardless).
    """
    factors = _factorize(q - 1)
    g = 2
    while True:
        if all(pow(g, (q - 1) // p, q) != 1 for p in factors):
            return g
        g += 1


def bit_reverse(x: int, bits: int) -> int:
    r = 0
    for _ in range(bits):
        r = (r << 1) | (x & 1)
        x >>= 1
    return r


class PrimeField:
    """F_q with an N-point NTT domain (NthRoot = 2N), lattigo table layout."""

    def __init__(self, modulus: int, n: int):
        if not _is_prime(modulus):
            raise ValueError(f"modulus {modulus} is not prime")
        nth_root = 2 * n
        if modulus % nth_root != 1:
            raise ValueError(f"modulus != 1 mod NthRoot (2N = {nth_root})")
        self.modulus = modulus
        self.n = n
        self.nth_root = nth_root
        self.log_n = n.bit_length() - 1

        q = modulus
        g = primitive_root(q)
        self.primitive_root_ = g
        # psi: primitive 2N-th root; psi_inv = psi^{-1}
        psi = pow(g, (q - 1) // nth_root, q)
        psi_inv = pow(psi, q - 2, q)
        self.psi = psi

        R = 1 << 64
        mform = lambda x: (x * R) % q
        # bit-reversed Montgomery-form twiddle tables (lattigo subring.go)
        logn = self.log_n
        fwd = np.zeros(n, dtype=np.uint64)
        bwd = np.zeros(n, dtype=np.uint64)
        pj, ipj = 1, 1
        fwd[0] = mform(1)
        bwd[0] = mform(1)
        for j in range(1, n):
            pj = pj * psi % q
            ipj = ipj * psi_inv % q
            rev = bit_reverse(j, logn)
            fwd[rev] = mform(pj)
            bwd[rev] = mform(ipj)
        self.roots_forward = fwd
        self.roots_backward = bwd
        self.n_inv_mont = mform(pow(n, q - 2, q))

    # -- scalar ops (exact Python ints; Barrett full reduction semantics) --

    def add(self, x: int, y: int) -> int:
        return (x + y) % self.modulus

    def sub(self, x: int, y: int) -> int:
        return (x - y) % self.modulus

    def neg(self, x: int) -> int:
        return (self.modulus - x) % self.modulus

    def mul(self, x: int, y: int) -> int:
        # matches lattigo BRed: exact x*y mod q for any u64 inputs
        return (x * y) % self.modulus

    def pow(self, exp: int, base: int) -> int:
        return pow(base, exp, self.modulus)

    def inv(self, x: int) -> int:
        return pow(x, self.modulus - 2, self.modulus)

    def root_forward(self, i: int) -> int:
        """Montgomery-form twiddle table entry (used as plain value)."""
        return int(self.roots_forward[i])

    def inner_product(self, v, r) -> int:
        q = self.modulus
        return sum((int(a) * int(b)) % q for a, b in zip(v, r, strict=True)) % q


@lru_cache(maxsize=8)
def get_field(modulus: int, n: int) -> PrimeField:
    return PrimeField(modulus, n)
