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


def host_fingerprint() -> str:
    """Short hash of the host CPU feature set.

    CPU AOT artifacts are machine-feature-specific: loading a cache entry
    compiled on a host with (say) AMX/prefer-no-scatter onto a host without
    them makes XLA spin or SIGILL (observed: pytest hung >10 min loading
    stale entries). The bench/test hosts change between sessions, so the
    CPU cache dir is keyed by this fingerprint; TPU executables run on the
    same physical chip regardless of host, so the tpu cache is shared.
    """
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha256(
                        " ".join(sorted(line.split()[2:])).encode()
                    ).hexdigest()[:10]
    except OSError:
        pass
    import platform
    return hashlib.sha256(platform.processor().encode()).hexdigest()[:10]


_default = os.path.join(_repo_root, ".jax_cache", _plat)
if _plat == "cpu":
    _default += "-" + host_fingerprint()
_cache_dir = os.environ.get("LUMENOS_JAX_CACHE", _default)
if _plat == "cpu" and os.environ.get("LUMENOS_JAX_CACHE"):
    _cache_dir = _cache_dir + "-" + host_fingerprint()
try:
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # pragma: no cover - cache is best-effort
    pass
