"""Ring switching: shrink MatR/MatZ ciphertexts to a smaller ring.

Reference: fhe/ring_switch.go (LogN 13 -> 10 shrinks post-inner-product
ciphertexts 8-32x, README.md:100-118). The reference's version is
incomplete: BFV SlotsToCoeffs is unimplemented, so slot-0 decoding breaks
and verification is skipped in experimental mode (README.md:100-104).

OUR protocol reads the CONSTANT COEFFICIENT (sum-slots trick, DESIGN.md
section 4), which survives ring switching exactly:

1. keyswitch the big-ring ciphertext from s to s'(X^k) (the small-ring
   secret embedded via X' -> X^k, k = N/N');
2. subsample both components at coefficient indices = 0 mod k. The
   negacyclic product (c1' * s'(X^k)) only draws on multiples-of-k
   coefficients of c1' at multiples-of-k outputs, so the subsampled pair
   decrypts under s' in R_{N'} with phase'_j = phase_{jk} - in particular
   the constant coefficient is preserved.

Hence ring-switched proofs REMAIN verifiable here (a capability the
reference lacks). The small ring keeps the same two top moduli (level-1
decryption; Delta_1 = 2^57 binding unchanged).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .. import jaxcfg  # noqa: F401
import jax.numpy as jnp

from .backend import BgvBackend, CtBatch, PublicKey, SecretKey
from .keyswitch import KeySwitcher, SwitchingKey
from .params import BgvParams
from .ring import add_rns


@dataclass
class RingSwitch:
    """Client-side: small-ring params + secret + the evaluation key."""

    small_params: BgvParams
    small_backend: BgvBackend
    sk_small: SecretKey
    evk: SwitchingKey
    k: int  # N / N'


def new_ring_switch_client(
    backend: BgvBackend, sk: SecretKey, log_n_small: int,
    rng: np.random.Generator, level: int = 1,
) -> RingSwitch:
    """Generate the small ring, its secret, and the big-ring evk s -> s'(X^k)
    (reference NewRingSwitchClient, fhe/ring_switch.go:16-57)."""
    p = backend.params
    n_small = 1 << log_n_small
    k = p.n // n_small
    assert k >= 1 and p.n % n_small == 0

    small_params = BgvParams(
        log_n=log_n_small, t=p.t,
        q_primes=p.q_primes[: level + 1], p_primes=())
    small_backend = BgvBackend(small_params)

    # small-ring ternary secret
    s_small = rng.integers(-1, 2, n_small).astype(np.int8)
    s_small_rns = small_backend._signed_to_rns(s_small, level)
    sk_small = SecretKey(
        s_signed=s_small,
        s_ntt=small_backend._ntt(s_small_rns, level))

    # embed s'(X^k) into the big ring; the switching key moves FROM the
    # big secret s TO the embedded small secret: encrypted under s'(X^k),
    # carrying P*B_d*s
    embedded = np.zeros(p.n, dtype=np.int64)
    embedded[::k] = s_small.astype(np.int64)
    ks = KeySwitcher(backend)
    emb_rns = ks._signed_to_rns_qp(embedded, p.max_level)
    emb_ntt = ks._ntt_qp(emb_rns, p.max_level)
    w_old = ks._sk_ntt_qp(sk, p.max_level)   # the big-ring secret (OLD key)
    evk = ks.gen_switching_key(w_old, sk, rng, sk_out_ntt_qp=emb_ntt)
    return RingSwitch(small_params=small_params, small_backend=small_backend,
                      sk_small=sk_small, evk=evk, k=k)


def ring_switch_batch(
    backend: BgvBackend, ct: CtBatch, evk: SwitchingKey, k: int,
) -> CtBatch:
    """Server-side: keyswitch + subsample -> small-ring ciphertext batch
    (reference RingSwitchServer.RingSwitchNew, fhe/ring_switch.go:93-113)."""
    assert not ct.is_ntt
    level = ct.level
    ks = KeySwitcher(backend)
    c0 = ct.data[..., 0, :, :]
    c1 = ct.data[..., 1, :, :]
    d0, d1 = ks.switch(c1, evk, level)
    qj, _, _ = backend._consts(level)
    out0 = add_rns(c0, d0, qj[:, None])
    # subsample coefficients at multiples of k
    small0 = out0[..., ::k]
    small1 = d1[..., ::k]
    return CtBatch(data=jnp.stack([small0, small1], axis=-3), level=level)
