"""On-disk AOT executable store: serialize compiled programs, skip XLA.

The reference has zero compile phase (`go run`, cmd/server/main.go); our
warm-cache compiles still cost 16-96 s per config because the persistent
XLA compile cache replays HLO deserialization + backend codegen. This
store serializes the COMPILED PJRT executables
(jax.experimental.serialize_executable) so a fresh server process loads
the whole program set in seconds (round-4 verdict item 5; measured by
scripts/aot_coldstart.py).

Usage: set LUMENOS_AOT_DIR to a writable directory. Every
``compile_or_load(tag, jitfn, *shapes)`` call then
  - loads the stored executable when present (no XLA involved), or
  - compiles via ``jitfn.lower(*shapes).compile()`` and stores it.
The returned object is callable with the same positional arguments as
the jitted function, so callers that cache "the compiled program" (e.g.
fhe/staged.py's _CACHE) can hold either interchangeably. With the env
unset this is exactly ``.lower().compile()`` — zero behavior change.

Store keys include the jax version, backend platform and the abstract
input signature; executables are machine-specific by design (the CPU
loader warns on feature mismatch, the TPU loader rejects other chips) —
treat the directory like the XLA compile cache, not like a wire format.

MEASURED CAVEAT (AOT_COLDSTART.json, BENCH_NOTES): over a TUNNELED
device the store loses — the remote compile service keeps executables
server-side, while deserialize_and_load must ship the ~300 MB binary
set client->device, ballooning first-proof wall time (82 s -> 568 s at
2048x1024). Use only with direct-attached devices where executable
load is a local operation; it is default-off (env unset) everywhere.
"""

from __future__ import annotations

import hashlib
import os
import pickle

import jax


def aot_dir() -> str | None:
    return os.environ.get("LUMENOS_AOT_DIR") or None


def _key(tag: str, shapes) -> str:
    sig = repr([(s.shape, str(s.dtype)) if hasattr(s, "shape") else repr(s)
                for s in shapes])
    h = hashlib.sha256(
        f"{jax.__version__}|{jax.default_backend()}|{tag}|{sig}".encode()
    ).hexdigest()[:20]
    safe = "".join(c if c.isalnum() or c in "-_" else "_" for c in tag)[:48]
    return f"{safe}-{h}"


def compile_or_load(tag: str, jitfn, *shapes):
    """AOT-compile ``jitfn`` for ``shapes`` with an on-disk executable
    store (see module docstring). Returns a callable: the jax Compiled
    on a store miss (then persisted), the deserialized executable on a
    hit."""
    d = aot_dir()
    if d is None:
        return jitfn.lower(*shapes).compile()
    path = os.path.join(d, _key(tag, shapes) + ".jaxexec")
    if os.path.exists(path):
        from jax.experimental import serialize_executable as se
        with open(path, "rb") as f:
            blob, in_tree, out_tree = pickle.load(f)
        return se.deserialize_and_load(blob, in_tree, out_tree)
    compiled = jitfn.lower(*shapes).compile()
    try:
        from jax.experimental import serialize_executable as se
        payload = se.serialize(compiled)
        os.makedirs(d, exist_ok=True)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump(payload, f)
        os.replace(tmp, path)
    except Exception as e:  # serialization is best-effort; compile stands
        import sys
        print(f"aot: could not persist {tag}: {e!r}", file=sys.stderr)
    return compiled
