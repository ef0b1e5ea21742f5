"""Device-mesh sharding of the ciphertext axis (multi-chip scaling)."""

from .mesh import make_mesh, ct_sharding, shard_ct_batch

__all__ = ["make_mesh", "ct_sharding", "shard_ct_batch"]
