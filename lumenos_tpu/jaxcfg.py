"""Central JAX configuration: 64-bit integers are required everywhere.

Import this module before any jax.numpy use inside lumenos_tpu. The
framework's correctness path stores RNS residues as uint64; the TPU backend
emulates u64 in 32-bit lanes (verified supported on TPU v5e). Hot kernels
graduate to explicit u32-pair Pallas kernels in ops/pallas_*.
"""

import os

import jax

jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: first compile of the big jitted programs is
# expensive (remote TPU compile); subsequent runs hit this cache.
# Separate cache dirs per platform: remote-compiled TPU-host artifacts are
# NOT safe to load into local CPU processes (mismatched machine features).
# The cache lives IN THE REPO (committed) so the driver's cold bench run -
# possibly in a fresh container with a clean /tmp - still hits it. Any
# non-cpu platform string ("tpu", "axon", unset) maps to the same device
# cache: they are the same physical chip behind the axon tunnel.
_plat = os.environ.get("JAX_PLATFORMS", "tpu").split(",")[0] or "tpu"
_plat = "cpu" if _plat == "cpu" else "tpu"
_repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# CPU AOT cache artifacts are machine-feature-specific (see _hostfp):
# the DEFAULT cpu cache dir is keyed by the host fingerprint. An
# explicitly set LUMENOS_JAX_CACHE is honored verbatim - callers wanting
# per-host isolation append _hostfp.host_fingerprint() themselves (as
# tests/conftest.py does).
from ._hostfp import host_fingerprint  # noqa: E402

_default = os.path.join(_repo_root, ".jax_cache", _plat)
if _plat == "cpu":
    _default += "-" + host_fingerprint()
_cache_dir = os.environ.get("LUMENOS_JAX_CACHE", _default)
try:
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # pragma: no cover - cache is best-effort
    pass
