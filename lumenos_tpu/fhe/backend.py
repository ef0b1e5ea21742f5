"""BGV/BFV backend: keys, encryption, evaluator ops on ciphertext batches.

Counterpart of the reference's ServerBFV/ClientBFV (fhe/bfv.go) and the
lattigo APIs they wrap (SURVEY.md 2.3). Scheme: MSB / scale-invariant form
phase = Delta*m + e (DESIGN.md section 2); ciphertext batches are u64
tensors [n_cts, 2, L+1, N] in coefficient domain; all ops batched.

Randomness is generated host-side (numpy Generator) and mapped to RNS
residues on device; heavy polynomial arithmetic (NTT, dyadic muls) runs
on the accelerator.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from functools import cached_property, wraps


def _instance_cache(fn):
    """Per-instance memoization for methods. Unlike ``lru_cache`` on a
    method - whose class-level cache keys on ``self`` and pins up to
    maxsize backends (and the device constants captured by their jitted
    programs) alive past their last user reference - the cache dict
    lives on the instance, so dropping the backend frees everything."""
    name = "_cache_" + fn.__name__

    @wraps(fn)
    def wrapper(self, *args):
        cache = self.__dict__.setdefault(name, {})
        if args not in cache:
            cache[args] = fn(self, *args)
        return cache[args]
    return wrapper

import numpy as np

from .. import jaxcfg  # noqa: F401
import jax
import jax.numpy as jnp

from .params import BgvParams
from .encoder import SlotEncoder
from .ring import ntt_fwd, ntt_inv, barrett_mul, add_rns, sub_rns
from ..ops.modmath import mul64wide, _u64

SIGMA_ERR = 3.19  # discrete gaussian std-dev (lattigo default Xe)
_RESCALE_MARKER = None  # cached marker-file stat (see rescale_to)
ERR_BOUND = 19


@dataclass
class CtBatch:
    """Batch of RLWE ciphertexts: data [..., 2, L+1, N] (coeff domain)."""

    data: jnp.ndarray
    level: int
    is_ntt: bool = False

    @property
    def n(self) -> int:
        return self.data.shape[-1]


jax.tree_util.register_dataclass(
    CtBatch, data_fields=["data"], meta_fields=["level", "is_ntt"])


@dataclass(frozen=True)
class SecretKey:
    s_signed: np.ndarray      # [N] int8 ternary coefficients (host, for vdec)
    s_ntt: jnp.ndarray        # [L_all, N] NTT-domain residues over all Q+P limbs


@dataclass(frozen=True)
class PublicKey:
    pk0_ntt: jnp.ndarray      # [L+1, N] NTT domain, max level
    pk1_ntt: jnp.ndarray


class BgvBackend:
    """Evaluator + encryptor + decryptor over one parameter set."""

    def __init__(self, params: BgvParams):
        self.params = params
        self.encoder = SlotEncoder(params)
        self.n = params.n
        self.t = params.t
        # Homomorphic-multiplication counter (reference fhe/bfv.go:34-46).
        # Batched calls count one mul per ciphertext in the batch so the
        # number is comparable with the reference's per-ct counting.
        self.mul_count = 0

    def _count_muls(self, ct: CtBatch) -> None:
        shape = ct.data.shape
        n_cts = 1
        for d in shape[:-3]:
            n_cts *= int(d)
        self.mul_count += n_cts

    def reset_mul_count(self) -> None:
        self.mul_count = 0

    # -- table helpers -----------------------------------------------------

    def _consts(self, level: int, with_p: bool = False):
        q, u, s = self.params.limb_consts(level, with_p)
        return jnp.asarray(q), jnp.asarray(u), jnp.asarray(s)

    def _ntt(self, x, level: int, with_p: bool = False):
        fwd, fwds, *_ = self.params.ntt_tables(level, with_p)
        q, _, _ = self.params.limb_consts(level, with_p)
        return ntt_fwd(x, fwd, fwds, q)

    def _intt(self, x, level: int, with_p: bool = False):
        _, _, bwd, bwds, ninv, ninvs = self.params.ntt_tables(level, with_p)
        q, _, _ = self.params.limb_consts(level, with_p)
        return ntt_inv(x, bwd, bwds, ninv, ninvs, q)

    def _signed_to_rns(self, x, level: int, with_p: bool = False):
        """[..., N] small signed ints -> [..., L, N] residues (device)."""
        q, _, _ = self.params.limb_consts(level, with_p)
        xj = jnp.asarray(x, jnp.int64)[..., None, :]
        qj = jnp.asarray(q.astype(np.int64))[:, None]
        return ((xj % qj) + qj).astype(jnp.uint64) % qj.astype(jnp.uint64)

    # -- key generation ----------------------------------------------------

    @_instance_cache
    def _keygen_jit(self):
        """One jitted program for the whole keygen computation.

        Keygen previously ran eagerly: ~60 distinct op dispatches, each a
        separate remote compile over the TPU tunnel (minutes of wall time
        and the round-1 driver bench's 237 s "setup" cost). One program
        compiles once and hits the persistent cache afterwards."""
        p = self.params
        lvl = p.max_level

        def impl(s, a, e):
            s_rns = self._signed_to_rns(s, lvl, with_p=True)
            s_ntt = self._ntt(s_rns, lvl, with_p=True)
            e_rns = self._signed_to_rns(e, lvl)
            qj, uj, sj = self._consts(lvl)
            a_s = barrett_mul(a, s_ntt[: lvl + 1], qj[:, None], uj[:, None],
                              sj[:, None])
            e_ntt = self._ntt(e_rns, lvl)
            pk0 = sub_rns(jnp.zeros_like(a_s), add_rns(a_s, e_ntt, qj[:, None]),
                          qj[:, None])
            return s_ntt, pk0

        return jax.jit(impl)

    def keygen(self, rng: np.random.Generator) -> tuple[SecretKey, PublicKey]:
        p = self.params
        s = rng.integers(-1, 2, self.n).astype(np.int8)
        lvl = p.max_level
        q, _, _ = p.limb_consts(lvl)
        a = np.stack([rng.integers(0, int(qi), self.n, dtype=np.uint64) for qi in q])
        e = self._sample_err(rng, (self.n,))
        s_ntt, pk0 = self._keygen_jit()(
            jnp.asarray(s, jnp.int64), jnp.asarray(a), jnp.asarray(e))
        return SecretKey(s_signed=s, s_ntt=s_ntt), PublicKey(pk0_ntt=pk0, pk1_ntt=jnp.asarray(a))

    def _sample_err(self, rng: np.random.Generator, shape) -> np.ndarray:
        e = np.rint(rng.normal(0.0, SIGMA_ERR, shape)).astype(np.int64)
        return np.clip(e, -ERR_BOUND, ERR_BOUND)

    # -- encryption --------------------------------------------------------

    @_instance_cache
    def _encrypt_jit(self, lvl: int):
        def impl(u, e0, e1, delta_m, pk0, pk1):
            qj, uj, sj = self._consts(lvl)
            q2 = qj[:, None]
            u_ntt = self._ntt(self._signed_to_rns(u, lvl), lvl)
            c0 = self._intt(barrett_mul(u_ntt, pk0, q2, uj[:, None], sj[:, None]), lvl)
            c1 = self._intt(barrett_mul(u_ntt, pk1, q2, uj[:, None], sj[:, None]), lvl)
            c0 = add_rns(c0, self._signed_to_rns(e0, lvl), q2)
            c0 = add_rns(c0, jnp.asarray(delta_m, jnp.uint64), q2)
            c1 = add_rns(c1, self._signed_to_rns(e1, lvl), q2)
            return jnp.stack([c0, c1], axis=1)

        import jax
        return jax.jit(impl)

    def encrypt_polys(self, delta_m, pk: PublicKey, rng: np.random.Generator,
                      level: int | None = None) -> CtBatch:
        """delta_m: [n, L+1, N] RNS embedding of Delta*m (coeff domain).

        ``level``: encrypt directly at a reduced level (fewer limbs - less
        memory/compute; sound whenever the remaining noise budget covers the
        planned circuit, DESIGN.md section 3)."""
        lvl = self.params.max_level if level is None else level
        n_ct = delta_m.shape[0]
        u = rng.integers(-1, 2, (n_ct, self.n)).astype(np.int64)
        e0 = self._sample_err(rng, (n_ct, self.n))
        e1 = self._sample_err(rng, (n_ct, self.n))
        data = self._encrypt_jit(lvl)(
            u, e0, e1, delta_m, pk.pk0_ntt[: lvl + 1], pk.pk1_ntt[: lvl + 1])
        return CtBatch(data=data, level=lvl)

    @_instance_cache
    def _encode_embed_jit(self, lvl: int):
        def impl(values):
            poly_t = self.encoder.encode(values)
            return self.encoder.embed_delta_m(poly_t, lvl)

        import jax
        return jax.jit(impl)

    def encrypt_values(self, values, pk: PublicKey, rng: np.random.Generator,
                       level: int | None = None) -> CtBatch:
        """values [n, k<=N] slot vectors -> fresh ciphertext batch."""
        lvl = self.params.max_level if level is None else level
        dm = self._encode_embed_jit(lvl)(jnp.asarray(values, jnp.uint64))
        return self.encrypt_polys(dm, pk, rng, level=lvl)

    # -- decryption --------------------------------------------------------

    @_instance_cache
    def _decrypt_consts(self, level: int):
        """HPS scale-and-round constants: omega_i mod t, theta_i as 2^64 fixed."""
        p = self.params
        qs = [int(q) for q in p.q_primes[: level + 1]]
        Q = 1
        for q in qs:
            Q *= q
        omegas, thetas = [], []
        for qi in qs:
            lam = pow(Q // qi, qi - 2, qi)     # [(Q/q_i)^{-1}]_{q_i}
            num = p.t * lam
            omegas.append((num // qi) % p.t)
            thetas.append(((num % qi) << 64) // qi)
        return (np.array(omegas, dtype=np.uint64),
                np.array(thetas, dtype=np.uint64))

    def phase(self, ct: CtBatch, sk: SecretKey):
        """c0 + c1*s mod Q: [..., L+1, N] coeff-domain residues."""
        lvl = ct.level
        qj, uj, sj = self._consts(lvl)
        q2 = qj[:, None]
        c0 = ct.data[..., 0, :, :]
        c1 = ct.data[..., 1, :, :]
        c1_ntt = self._ntt(c1, lvl)
        prod = barrett_mul(c1_ntt, sk.s_ntt[: lvl + 1], q2, uj[:, None], sj[:, None])
        return add_rns(c0, self._intt(prod, lvl), q2)

    def phase_to_mt(self, x, level: int):
        """round(t * x / Q) mod t for RNS phase x [..., L+1, N] -> [..., N]."""
        omegas, thetas = self._decrypt_consts(level)
        tl = self.params.t_limb
        t_arr = _u64(tl.q)
        tu = _u64(tl.barrett_u)
        ts = _u64(tl.barrett_s)
        om = jnp.asarray(omegas)[:, None]
        xi_t = x % t_arr
        ipart = barrett_mul(xi_t, om, t_arr, tu, ts)
        int_sum = ipart.astype(jnp.uint64)
        # fractional accumulation in 128-bit fixed point
        th = jnp.asarray(thetas)[:, None]
        fhi, flo = mul64wide(x, th)
        lo_sum = jnp.sum(flo, axis=-2)
        hi_sum = jnp.sum(fhi, axis=-2)
        # count carries from lo additions: compare cumulative? cheaper: use
        # 32-bit split accumulation to make carries exact.
        lo_lo = jnp.sum(flo & _u64(0xFFFFFFFF), axis=-2)
        lo_hi = jnp.sum(flo >> _u64(32), axis=-2)
        total_lo = lo_lo + ((lo_hi & _u64(0xFFFFFFFF)) << _u64(32))
        carry = (lo_hi >> _u64(32)) + jnp.where(total_lo < lo_lo, _u64(1), _u64(0))
        frac_round = hi_sum + carry + jnp.where(
            (total_lo + _u64(1 << 63)) < total_lo, _u64(1), _u64(0))
        # sum integer parts mod t (L+1 terms each < t: chunked sum safe for L<=32)
        isum = jnp.sum(int_sum, axis=-2) % t_arr
        m = (isum + frac_round % t_arr) % t_arr
        return m

    @_instance_cache
    def _decrypt_jit(self, level: int):
        import jax

        def impl(data, s_ntt):
            ct = CtBatch(data=data, level=level)
            sk_like = SecretKey(s_signed=None, s_ntt=s_ntt)
            return self.phase_to_mt(self.phase(ct, sk_like), level)

        return jax.jit(impl)

    def decrypt_poly_t(self, ct: CtBatch, sk: SecretKey):
        """-> [..., N] plaintext polynomial coefficients mod t."""
        assert not ct.is_ntt, "decrypt expects a coefficient-domain ciphertext"
        return self._decrypt_jit(ct.level)(ct.data, sk.s_ntt)

    def decrypt_values(self, ct: CtBatch, sk: SecretKey, k: int | None = None):
        """-> [..., k] slot values (scale handling is the caller's job)."""
        return self.encoder.decode(self.decrypt_poly_t(ct, sk), k)

    def decrypt_c0(self, ct: CtBatch, sk: SecretKey):
        """Constant coefficient of the plaintext poly (sum-slots trick).
        Returns [...] values: m_poly[0] mod t."""
        return self.decrypt_poly_t(ct, sk)[..., 0]

    @_instance_cache
    def _decrypt_c0_fast_jit(self, level: int):
        import jax
        q, _, _ = self.params.limb_consts(level)
        pow32 = np.array([(1 << 32) % int(qi) for qi in q], dtype=np.uint64)

        def impl(data, mp, mm):
            # data [k, 2, L+1, N]; mp/mm [N] u64 {0,1} masks of the
            # ternary key's +/-1 positions (negacyclic-rotated)
            qj, uj, sj = self._consts(level)          # [L+1]
            c0 = data[..., 0, :, 0]                   # [k, L+1]
            c1 = data[..., 1, :, :]                   # [k, L+1, N]

            def tsum(x):   # sum over N mod q_j, 32-bit split (no overflow)
                lo = jnp.sum(x & _u64(0xFFFFFFFF), axis=-1)
                hi = jnp.sum(x >> _u64(32), axis=-1)
                return (barrett_mul(hi % qj, jnp.asarray(pow32), qj, uj, sj)
                        + lo) % qj

            sp = tsum(c1 * mp)
            sm = tsum(c1 * mm)
            phase0 = (c0 + sp + (qj - sm)) % qj       # [k, L+1]
            return self.phase_to_mt(phase0[..., None], level)[..., 0]

        return jax.jit(impl)

    def c0_masks(self, sk: SecretKey):
        """{0,1} masks of the +1/-1 entries of w, w[i] = s[-i] with the
        negacyclic sign: (c1*s)[0] = sum_i c1[i] * w[i]."""
        s = sk.s_signed.astype(np.int64)
        w = np.empty_like(s)
        w[0] = s[0]
        w[1:] = -s[:0:-1]          # w[i] = -s[N-i]
        return (jnp.asarray((w == 1).astype(np.uint64)),
                jnp.asarray((w == -1).astype(np.uint64)))

    def decrypt_c0_fast(self, ct: CtBatch, sk: SecretKey):
        """O(N)-per-ct c0 decode (vs the O(N log N) full-INTT decrypt):
        the constant plaintext coefficient is a ternary dot product
        against the key, so the client's inner-product decrypt phase
        (reference README.md:86 — 47.53 s at 16384x4096 on its 2-vCPU
        client) collapses to a masked sum + one scale-and-round. Equal to
        decrypt_c0 bit-for-bit (tests/test_backend_c0fast.py).

        The device-resident mask pair is cached per secret key (the
        advertised hot client path calls this twice per proof; rebuilding
        the masks was an O(N) host loop + two uploads per call)."""
        assert not ct.is_ntt, "decrypt expects a coefficient-domain ciphertext"
        cache = self.__dict__.setdefault("_c0_mask_cache", {})
        ent = cache.get(id(sk))
        if ent is None or ent[0] is not sk:
            cache[id(sk)] = ent = (sk, self.c0_masks(sk))
        mp, mm = ent[1]
        return self._decrypt_c0_fast_jit(ct.level)(ct.data, mp, mm)

    # -- evaluator ops -----------------------------------------------------

    def add(self, a: CtBatch, b: CtBatch) -> CtBatch:
        assert a.level == b.level and a.is_ntt == b.is_ntt
        qj, _, _ = self._consts(a.level)
        return replace(a, data=add_rns(a.data, b.data, qj[:, None]))

    def sub(self, a: CtBatch, b: CtBatch) -> CtBatch:
        assert a.level == b.level and a.is_ntt == b.is_ntt
        qj, _, _ = self._consts(a.level)
        return replace(a, data=sub_rns(a.data, b.data, qj[:, None]))

    def mul_scalar(self, ct: CtBatch, w: int) -> CtBatch:
        """ct * uint64 scalar (plaintext multiplied by w mod t). Domain-agnostic."""
        q, u, s = self.params.limb_consts(ct.level)
        w_res = np.array([int(w) % int(qi) for qi in q], dtype=np.uint64)
        qj, uj, sj = self._consts(ct.level)
        out = barrett_mul(ct.data, jnp.asarray(w_res)[:, None],
                          qj[:, None], uj[:, None], sj[:, None])
        self._count_muls(ct)
        return replace(ct, data=out)

    def mul_coeffs(self, ct: CtBatch, coeffs) -> CtBatch:
        """Per-ciphertext small-constant multiply: coeffs [n_cts, L+1] residues
        (broadcast over components and coefficients). Used by the
        scale-deferred NTT's equalization cofactors."""
        qj, uj, sj = self._consts(ct.level)
        c = jnp.asarray(coeffs, jnp.uint64)[..., None, :, None]  # [n,1,L+1,1]
        out = barrett_mul(ct.data, c, qj[:, None], uj[:, None], sj[:, None])
        self._count_muls(ct)
        return replace(ct, data=out)

    def mul_plain_ntt(self, ct: CtBatch, pt_ntt) -> CtBatch:
        """ct x plaintext, pt_ntt: [L+1, N] or [n, L+1, N] NTT-domain residues."""
        assert not ct.is_ntt
        lvl = ct.level
        qj, uj, sj = self._consts(lvl)
        q2 = qj[:, None]
        d_ntt = self._ntt(ct.data, lvl)
        pt = jnp.asarray(pt_ntt, jnp.uint64)
        if pt.ndim == 2:
            pt = pt[None, None]
        else:
            pt = pt[:, None]
        prod = barrett_mul(d_ntt, pt, q2, uj[:, None], sj[:, None])
        self._count_muls(ct)
        return replace(ct, data=self._intt(prod, lvl))

    # -- rescale (rounded division by the top prime) -----------------------

    @_instance_cache
    def _rescale_consts(self, level: int):
        p = self.params
        ql = int(p.q_primes[level])
        rem = [int(q) for q in p.q_primes[:level]]
        ql_inv = np.array([pow(ql, qi - 2, qi) for qi in rem], dtype=np.uint64)
        return ql, ql_inv

    def rescale(self, ct: CtBatch) -> CtBatch:
        """Drop the top limb: c' = round(c / q_l); plaintext scale Delta
        adjusts automatically (MSB form)."""
        assert not ct.is_ntt and ct.level >= 1
        lvl = ct.level
        ql, ql_inv = self._rescale_consts(lvl)
        qlj = _u64(ql)
        half = _u64(ql // 2)
        cl = ct.data[..., lvl:lvl + 1, :]     # [..., 1, N]
        is_neg = cl > half
        mag = jnp.where(is_neg, qlj - cl, cl)
        qj, uj, sj = self._consts(lvl - 1)
        q2 = qj[:, None]
        mag_mod = mag % q2                     # mag < 2^58, exact remainder
        r = jnp.where(is_neg, (q2 - mag_mod) % q2, mag_mod)
        diff = sub_rns(ct.data[..., :lvl, :], r, q2)
        out = barrett_mul(diff, jnp.asarray(ql_inv)[:, None], q2, uj[:, None], sj[:, None])
        return CtBatch(data=out, level=lvl - 1, is_ntt=False)

    def rescale_to(self, ct: CtBatch, target_level: int) -> CtBatch:
        # Fused Pallas chain (ops/pallas_rescale.py). Enabled when
        # LUMENOS_PALLAS_RESCALE=1, disabled when =0; with the env unset
        # it is on only if scripts/check_pallas_rescale.py has written its
        # validation marker (committed after a hardware PASS) - so an
        # unvalidated kernel's Mosaic-compile risk can never stall the
        # driver bench.
        import os
        flag = os.environ.get("LUMENOS_PALLAS_RESCALE")
        if flag is not None:
            enabled = flag == "1"
        else:
            global _RESCALE_MARKER
            if _RESCALE_MARKER is None:     # stat the marker once
                _RESCALE_MARKER = os.path.exists(
                    os.path.join(os.path.dirname(os.path.dirname(
                        os.path.dirname(os.path.abspath(__file__)))),
                        ".pallas_rescale_ok"))
            enabled = _RESCALE_MARKER
        if enabled and ct.level > target_level and not ct.is_ntt:
            from ..ops.pallas_rescale import rescale_chain_pallas, rescale_ok
            if rescale_ok(ct.data.shape, ct.level, target_level):
                data = rescale_chain_pallas(
                    ct.data, self.params.q_primes, ct.level, target_level)
                return CtBatch(data=data, level=target_level, is_ntt=False)
        while ct.level > target_level:
            ct = self.rescale(ct)
        return ct
