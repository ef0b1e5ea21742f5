"""Scale tracking + balanced rational reconstruction (host-side, exact).

Supports the scale-deferred homomorphic NTT (DESIGN.md section 3): ciphertext
positions carry public multiplicative scales sigma mod t; twiddle muls update
sigma for free; butterfly adds equalize scales with ~sqrt(t)-bounded
cofactors found by half-extended-Euclid.
"""

from __future__ import annotations

import math


def rational_reconstruct(r: int, t: int) -> tuple[int, int]:
    """Find (alpha, beta), |alpha|,|beta| <= ~sqrt(t), beta != 0, with
    alpha = r * beta (mod t).

    Classic half-extended Euclid on (t, r): iterate remainders (r_i) and
    cosequence (s_i) with r_i = s_i * r (mod t); stop when r_i < sqrt(t).
    Then |s_i| <= t / r_{i-1} <= sqrt(t) * O(1).
    """
    r %= t
    if r == 0:
        return 0, 1
    bound = math.isqrt(t)
    r0, r1 = t, r
    s0, s1 = 0, 1
    while r1 > bound:
        q = r0 // r1
        r0, r1 = r1, r0 - q * r1
        s0, s1 = s1, s0 - q * s1
    # r1 = s1 * r (mod t)
    return r1, s1


def equalize(sigma_u: int, sigma_v: int, t: int) -> tuple[int, int, int]:
    """Cofactors for adding values with scales sigma_u, sigma_v.

    Returns (alpha, beta, sigma_new) with alpha/sigma_new = 1/sigma_u and
    beta/sigma_new = 1/sigma_v (mod t), |alpha|,|beta| small. The device
    computes alpha*U +- beta*V; the result has scale sigma_new.
    """
    if sigma_u == sigma_v:
        return 1, 1, sigma_u
    r = sigma_v * pow(sigma_u, t - 2, t) % t  # sigma_v / sigma_u
    alpha, beta = rational_reconstruct(r, t)
    # alpha = r*beta => alpha/sigma_u' ... choose sigma_new = sigma_u * alpha
    sigma_new = sigma_u * (alpha % t) % t
    if sigma_new == 0:
        # pathological (alpha = 0 mod t cannot happen for r != 0); guard
        raise ArithmeticError("degenerate scale equalization")
    return alpha, beta, sigma_new


def centered_to_residues(x: int, moduli) -> list[int]:
    """Signed small integer -> per-modulus residues."""
    return [x % int(q) for q in moduli]
