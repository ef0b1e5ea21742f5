"""Memory-bounded big-batch helpers: chunked encryption, in-place assembly.

At 8192x4096/LogN13 the full ciphertext batch is ~10 GB; single-program
encryption of the whole batch exceeds a v5e's 16 GB HBM. These helpers
bound peak memory:

- encrypt in column chunks (each a small jitted program);
- assemble chunks into one resident device buffer with donated
  dynamic_update_slice calls (the big buffer is aliased, never copied);
- the encode pipeline then takes the assembled buffer with donation.
"""

from __future__ import annotations

import numpy as np

from .. import jaxcfg  # noqa: F401
import jax
import jax.numpy as jnp

from .backend import BgvBackend, CtBatch, PublicKey

_ASSEMBLE_CACHE: dict = {}


def _assemble_fn(shape, dtype):
    key = (shape, str(dtype))
    if key not in _ASSEMBLE_CACHE:
        def impl(buf, chunk, start):
            return jax.lax.dynamic_update_slice(
                buf, chunk, (start,) + (0,) * (buf.ndim - 1))
        _ASSEMBLE_CACHE[key] = jax.jit(impl, donate_argnums=(0,))
    return _ASSEMBLE_CACHE[key]


def encrypt_big_batch(
    backend: BgvBackend,
    values: np.ndarray,
    pk: PublicKey,
    rng: np.random.Generator,
    level: int,
    chunk: int = 512,
) -> CtBatch:
    """Encrypt [n, k] slot vectors into one resident [n, 2, L+1, N] buffer,
    never holding more than one chunk of temporaries."""
    n = values.shape[0]
    L = level + 1
    buf = jnp.zeros((n, 2, L, backend.n), dtype=jnp.uint64)
    fn = _assemble_fn(buf.shape, buf.dtype)
    for start in range(0, n, chunk):
        part = values[start:start + chunk]
        ct = backend.encrypt_values(part, pk, rng, level=level)
        if ct.data.shape[0] != chunk and start + chunk < n:
            raise AssertionError
        if ct.data.shape[0] != chunk:
            # last partial chunk: pad via smaller update
            buf = jax.jit(
                lambda b, c, s: jax.lax.dynamic_update_slice(
                    b, c, (s, 0, 0, 0)), donate_argnums=(0,))(buf, ct.data, start)
        else:
            buf = fn(buf, ct.data, start)
        del ct
    return CtBatch(data=buf, level=level)
