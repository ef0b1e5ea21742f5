"""Real device synchronization fence.

`Array.block_until_ready()` is the documented way to wait for device
work, and on healthy PJRT backends it is one. On the tunneled axon
relay observed 2026-08-20 it returns immediately while execution is
deferred until the next actual device->host transfer drains the queue
— which silently collapses every phase timing into whichever call
happens to transfer first (a 325 s "products" window that was really
the whole pipeline).

`sync(x)` is a fence that works under both regimes: block_until_ready
(correct + cheap on healthy backends) followed by an 8-byte d2h of a
jitted scalar extract (forces the lazy relay to drain; ~30 ms of relay
round-trip latency, nothing on local PJRT). The extract program is
jit-cached per (shape, dtype) and lands in the persistent compile
cache, so it never costs an online tunnel compile twice.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

_FENCE_CACHE: dict = {}


def _fence_fn(shape, dtype):
    key = (shape, str(dtype))
    fn = _FENCE_CACHE.get(key)
    if fn is None:
        fn = jax.jit(lambda a: jnp.ravel(a)[:1])
        _FENCE_CACHE[key] = fn
    return fn


def sync(x):
    """Fence: returns `x` after all device work producing it has run."""
    if not isinstance(x, jax.Array) or isinstance(x, jax.core.Tracer):
        # tracers are jax.Array instances too: a sync() reached from
        # inside a jitted function must no-op, not crash on
        # block_until_ready
        return x
    x.block_until_ready()
    np.asarray(_fence_fn(x.shape, x.dtype)(x))
    return x
