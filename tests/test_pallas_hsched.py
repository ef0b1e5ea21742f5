"""Fused Pallas schedule kernel vs the XLA executor (interpret mode).

Hardware validation happens in bench.py (decrypt spot-check) and the
round's TPU drives; here the kernel must be bit-identical to
hsched.apply_schedule on CPU via the Pallas interpreter.
"""

import numpy as np
import pytest

from lumenos_tpu.core.field import GOLDILOCKS_57, get_field
from lumenos_tpu.fhe.hsched import apply_schedule_full, record_schedule
from lumenos_tpu.ops.pallas_hsched import apply_schedule_full_pallas

PRIMES = np.array([144115188075593729, 144115188068319233], dtype=np.uint64)


@pytest.mark.parametrize("size,n", [(64, 256), (128, 256), (16, 64)])
def test_kernel_matches_xla_executor(size, n):
    field = get_field(GOLDILOCKS_57, 64)
    sched = record_schedule(field, size, n)
    res = sched.residues(PRIMES)
    rng = np.random.default_rng(size + n)
    x = rng.integers(0, PRIMES[None, None, :, None],
                     size=(n, 2, len(PRIMES), 128), dtype=np.uint64)
    ref = np.asarray(apply_schedule_full(x, sched, res, PRIMES))
    got = np.asarray(apply_schedule_full_pallas(x, sched, res, PRIMES,
                                                interpret=True, cblk=128))
    assert np.array_equal(ref, got)


def test_kernel_with_cofactors():
    """Stage-B-style schedule: nontrivial initial scales change only the
    multiplier tables, not the pairing."""
    field = get_field(GOLDILOCKS_57, 64)
    t = field.modulus
    rng = np.random.default_rng(3)
    init = np.array([int(v) for v in rng.integers(1, t, size=64)],
                    dtype=object)
    sched = record_schedule(field, 64, 64, init_scales=init)
    res = sched.residues(PRIMES)
    x = rng.integers(0, PRIMES[None, None, :, None],
                     size=(64, 2, len(PRIMES), 128), dtype=np.uint64)
    ref = np.asarray(apply_schedule_full(x, sched, res, PRIMES))
    got = np.asarray(apply_schedule_full_pallas(x, sched, res, PRIMES,
                                                interpret=True, cblk=128))
    assert np.array_equal(ref, got)
