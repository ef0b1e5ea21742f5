"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a virtual CPU mesh
(xla_force_host_platform_device_count=8); the driver separately dry-runs
the multi-chip path, and bench.py runs on the real TPU chip.

Must run before any jax import in the test process (conftest is imported
first by pytest).
"""

import os
import sys

# Fully isolate tests from the axon TPU plugin: the tunnel is single-tenant
# and any jax init would block while a bench holds the device. Stripping the
# plugin's site dir forces a pure-CPU jax.
sys.path = [p for p in sys.path if "axon" not in p]
os.environ["PYTHONPATH"] = ""

os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)
os.environ["JAX_PLATFORMS"] = "cpu"
# per-host cache dir: stale AOT artifacts from another host hang XLA
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from lumenos_tpu._hostfp import host_fingerprint  # noqa: E402

os.environ.setdefault("LUMENOS_JAX_CACHE",
                      "/tmp/lumenos_jax_cache_cpu-" + host_fingerprint())

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
