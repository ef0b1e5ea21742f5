"""ct x ct tensor layer: the exact t/Q scaling primitive (unit-tested);
the extended-basis tensor itself is round-2 work (see fhe/tensor.py)."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from lumenos_tpu.core.field import GOLDILOCKS_57
from lumenos_tpu.fhe.backend import BgvBackend
from lumenos_tpu.fhe.params import BgvParams
from lumenos_tpu.fhe.tensor import _scale_t_over_q, mul_ct_ct

T = GOLDILOCKS_57


@pytest.fixture(scope="module")
def backend():
    params = BgvParams.generate(log_n=4, log_q=[58, 56, 56], log_p=[55, 55], t=T)
    return BgvBackend(params)


def test_scale_t_over_q_exact(backend):
    lvl = 2
    qs = [int(q) for q in backend.params.q_primes[: lvl + 1]]
    Q = qs[0] * qs[1] * qs[2]
    random.seed(7)
    xs = [random.randrange(Q) for _ in range(256)]
    x_rns = np.zeros((1, lvl + 1, 256), dtype=np.uint64)
    for k, x in enumerate(xs):
        for j, q in enumerate(qs):
            x_rns[0, j, k] = x % q
    out = np.asarray(_scale_t_over_q(backend, jnp.asarray(x_rns), lvl))
    for k, x in enumerate(xs):
        expect = (T * x + Q // 2) // Q
        for j, q in enumerate(qs):
            assert int(out[0, j, k]) == expect % q, (k, j)


def test_mul_ct_ct_pending(backend):
    from lumenos_tpu.fhe.backend import CtBatch
    dummy = CtBatch(data=jnp.zeros((1, 2, 3, 16), jnp.uint64), level=2)
    with pytest.raises(NotImplementedError):
        mul_ct_ct(backend, dummy, dummy)
