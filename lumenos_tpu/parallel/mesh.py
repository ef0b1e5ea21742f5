"""Mesh construction + sharding specs for the ciphertext axis.

TPU-native scaling (SURVEY.md section 2.4 mapping): the `n_cts` axis of
every ciphertext batch is sharded across chips ("ct" mesh axis). The
homomorphic transform's six-step transposes reshape the sharded axis, which
GSPMD lowers to all-to-all collectives over ICI; dyadic/butterfly ops stay
embarrassingly parallel. Limb/coefficient axes stay on-chip.
"""

from __future__ import annotations

from dataclasses import replace

import numpy as np

from .. import jaxcfg  # noqa: F401
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fhe.backend import CtBatch

CT_AXIS = "ct"


def make_mesh(devices=None, axis_name: str = CT_AXIS) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def ct_sharding(mesh: Mesh, axis_name: str = CT_AXIS) -> NamedSharding:
    """Shard axis 0 (ciphertext index); components/limbs/coeffs replicated."""
    return NamedSharding(mesh, P(axis_name, None, None, None))


def pt_replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_ct_batch(ct: CtBatch, mesh: Mesh) -> CtBatch:
    return replace(ct, data=jax.device_put(ct.data, ct_sharding(mesh)))
