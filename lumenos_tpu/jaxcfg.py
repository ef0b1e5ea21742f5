"""Central JAX configuration: 64-bit integers are required everywhere.

Import this module before any jax.numpy use inside lumenos_tpu. The
framework's correctness path stores RNS residues as uint64; the TPU backend
emulates u64 in 32-bit lanes (verified supported on TPU v5e). Hot kernels
graduate to explicit u32-pair Pallas kernels in ops/pallas_*.
"""

import jax

jax.config.update("jax_enable_x64", True)
