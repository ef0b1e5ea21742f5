"""Differential tests: recorded schedule executor == recursive hntt."""

import numpy as np
import pytest

from lumenos_tpu.core.field import GOLDILOCKS_57, PrimeField
from lumenos_tpu.fhe.backend import BgvBackend, CtBatch
from lumenos_tpu.fhe.hntt import homomorphic_ligero_ntt, min_start_level
from lumenos_tpu.fhe.hsched import (
    apply_schedule_full, record_schedule, unit_schedule)
from lumenos_tpu.fhe.params import generate_bgv_params_for_ntt

T = GOLDILOCKS_57


@pytest.mark.parametrize("size,groups", [(16, 1), (32, 1), (16, 2), (64, 1)])
def test_schedule_matches_recursive(size, groups):
    n = size * groups
    log_n = 4
    params = generate_bgv_params_for_ntt(max(size, 4), log_n, T)
    backend = BgvBackend(params)
    field = PrimeField(T, size)
    rng = np.random.default_rng(7)
    sk, pk = backend.keygen(rng)
    lvl = params.max_level
    vals = rng.integers(0, T, (n, 1 << log_n), dtype=np.uint64)
    ct = backend.encrypt_values(vals, pk, rng)

    # recursive oracle (applies the transform per contiguous group of size)
    ref_ct, ref_scales = homomorphic_ligero_ntt(backend, ct, field, size)

    sched = unit_schedule(field, size, n)
    assert np.array_equal(
        np.array([int(s) for s in sched.final_scales]),
        np.array([int(s) for s in ref_scales]))

    q, _, _ = params.limb_consts(lvl)
    res = sched.residues([int(x) for x in q])
    out = apply_schedule_full(ct.data, sched, res, q)
    assert np.array_equal(np.asarray(out), np.asarray(ref_ct.data))


def test_schedule_with_initial_scales():
    """Stage-B style: non-unit initial scales change cofactors, not pairing."""
    size = 16
    log_n = 4
    params = generate_bgv_params_for_ntt(size, log_n, T)
    backend = BgvBackend(params)
    field = PrimeField(T, size)
    rng = np.random.default_rng(8)
    sk, pk = backend.keygen(rng)
    lvl = params.max_level
    init = np.array([rng.integers(1, T) for _ in range(size)], dtype=object)

    vals = rng.integers(0, T, (size, 1 << log_n), dtype=np.uint64)
    ct = backend.encrypt_values(vals, pk, rng)

    from lumenos_tpu.fhe.hntt import _HNttCtx, _hntt_inner
    ctx = _HNttCtx(backend, ct, field)
    ctx.scales = init.copy()
    _hntt_inner(ctx, size)

    sched = record_schedule(field, size, init_scales=init)
    u = unit_schedule(field, size, size)
    assert np.array_equal(sched.partner, u.partner)  # pairing scale-free
    assert np.array_equal(sched.s_pos, u.s_pos)
    assert np.array_equal(sched.s_neg, u.s_neg)
    assert np.array_equal(sched.final_pos, u.final_pos)
    # the physical pairing is a <=2-distance XOR structure per layer
    for ds in u.xor_classes():
        assert len(ds) <= 2

    q, _, _ = params.limb_consts(lvl)
    res = sched.residues([int(x) for x in q])
    out = apply_schedule_full(ct.data, sched, res, q)
    assert np.array_equal(np.asarray(out), np.asarray(ctx.x))
    assert np.array_equal(
        np.array([int(s) for s in sched.final_scales]),
        np.array([int(s) for s in ctx.scales]))
