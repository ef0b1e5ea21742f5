"""Pallas u32-pair Shoup mulmod: exact agreement with the u64 reference
(interpret mode on CPU; compiled path runs on hardware in later rounds)."""

import numpy as np
import pytest

from lumenos_tpu.core.field import GOLDILOCKS_57
from lumenos_tpu.ops.pallas_modmul import shoup_mulmod_pallas

Q = GOLDILOCKS_57


def test_shoup_mulmod_pallas_interpret():
    rng = np.random.default_rng(0)
    x = rng.integers(0, Q, (8, 128)).astype(np.uint64)
    w = int(rng.integers(1, Q))
    w_shoup = (w << 64) // Q
    got = np.asarray(shoup_mulmod_pallas(x, w, w_shoup, Q, interpret=True))
    expect = (x.astype(object) * w) % Q
    assert np.array_equal(got.astype(object), expect)


def test_shoup_mulmod_pallas_edges():
    w = Q - 1
    w_shoup = (w << 64) // Q
    x = np.array([[0, 1, Q - 1, Q - 2, 2, 12345, Q // 2, Q // 2 + 1]],
                 dtype=np.uint64)
    got = np.asarray(shoup_mulmod_pallas(x, w, w_shoup, Q, interpret=True))
    expect = (x.astype(object) * w) % Q
    assert np.array_equal(got.astype(object), expect)
