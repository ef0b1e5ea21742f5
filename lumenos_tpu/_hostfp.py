"""Host CPU fingerprint (jax-free; importable before any jax config).

CPU AOT cache artifacts are machine-feature-specific: loading an entry
compiled on a host with a different feature set makes XLA spin or SIGILL
(observed: pytest hung >10 min on stale entries). Cache directories for
the CPU backend are therefore keyed by this hash. TPU executables run on
the same physical chip regardless of host, so the tpu cache is shared.
"""

from __future__ import annotations

import hashlib


def host_fingerprint() -> str:
    """Short stable hash of the host CPU feature set."""
    try:
        with open("/proc/cpuinfo") as f:
            text = f.read()
        for key in ("flags", "Features"):        # x86 / arm64 field names
            for line in text.splitlines():
                if line.startswith(key):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha256(feats.encode()).hexdigest()[:10]
        # no feature line: hash the stable lines of the whole file
        stable = "\n".join(ln for ln in text.splitlines()
                           if "MHz" not in ln and "bogomips" not in ln.lower())
        return hashlib.sha256(stable.encode()).hexdigest()[:10]
    except OSError:
        import platform
        tag = platform.machine() + ":" + platform.processor()
        return hashlib.sha256(tag.encode()).hexdigest()[:10]
