"""Normalized client PoD benchmark (VERDICT round-2 weak item 6).

The reference's client PoD numbers were measured on a 2-vCPU m6i.large
(results/baseline/client/*); our container host has many cores, so raw
wall times are not comparable. This script pins itself to TWO cpus
(sched_setaffinity + OMP_NUM_THREADS=2) before importing anything that
spins a thread pool, then times init / prove / verify for:

  - the BFV PoD at production scale (N=4096, 3 digit ciphertexts) -
    reference: 22.8 s prove (README.md:89, vdec.c prover), and
  - the GBFV PoD over Z[X]/Phi_10752 - reference: 3.2 s prove (and its
    own verification check fails, reference README.md:103-104).

Statement construction (synthetic, planted noise) reuses the test
builders so the shapes match the suite exactly.

Run:  python scripts/pod_bench.py      (prints a markdown table)
"""

import os
import sys
import time

os.environ.setdefault("OMP_NUM_THREADS", "2")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "2")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
# the env var alone does NOT stop the axon TPU plugin from claiming the
# single-tenant tunnel; the config update before backend discovery does
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
try:
    os.sched_setaffinity(0, {0, 1})
except (AttributeError, OSError):
    print("warning: could not pin to 2 cpus", file=sys.stderr)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_module(name, path):
    import importlib.util
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rows = []

    tp = load_module("tp", os.path.join(root, "tests", "test_pod.py"))
    from lumenos_tpu.vdec.pod import PodProver
    t0 = time.perf_counter()
    st = tp._synthetic_statement(4096)
    t_stmt = time.perf_counter() - t0
    t0 = time.perf_counter()
    pod = PodProver(st)
    t_init = time.perf_counter() - t0
    t0 = time.perf_counter()
    proof = pod.prove(b"pod-bench")
    t_prove = time.perf_counter() - t0
    t0 = time.perf_counter()
    ok = PodProver(st.public()).verify(proof)
    t_verify = time.perf_counter() - t0
    assert ok
    size = len(proof.to_bytes()) / 1e6
    rows.append(("BFV PoD N=4096 x3cts", t_init, t_prove, t_verify, size,
                 "22.8 s"))
    print(f"statement build (untimed): {t_stmt:.1f}s", file=sys.stderr)

    tg = load_module("tg", os.path.join(root, "tests", "test_gbfv.py"))
    from lumenos_tpu.vdec.gbfv import GbfvPodProver
    # the fixture function is wrapped by pytest; call the underlying fn
    stmt_fn = getattr(tg.gbfv_statement, "__wrapped__", tg.gbfv_statement)
    t0 = time.perf_counter()
    gst = stmt_fn()
    print(f"gbfv statement build (untimed): {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)
    t0 = time.perf_counter()
    gpod = GbfvPodProver(gst)
    g_init = time.perf_counter() - t0
    t0 = time.perf_counter()
    gproof = gpod.prove(b"gbfv-bench")
    g_prove = time.perf_counter() - t0
    t0 = time.perf_counter()
    gok = GbfvPodProver(gst.public()).verify(gproof)
    g_verify = time.perf_counter() - t0
    assert gok
    gsize = len(gproof.to_bytes()) / 1e6
    rows.append(("GBFV PoD deg 3072", g_init, g_prove, g_verify, gsize,
                 "3.2 s (self-check fails)"))

    print("\n## Client PoD, normalized to 2 vCPUs "
          "(sched_setaffinity {0,1}, OMP_NUM_THREADS=2)\n")
    print("| Variant | init | prove | verify | proof | Reference prove "
          "(m6i.large, 2 vCPU) |")
    print("|---|---|---|---|---|---|")
    for name, i, p, v, s, ref in rows:
        print(f"| {name} | {i:.1f} s | **{p:.1f} s** | {v:.1f} s | "
              f"{s:.2f} MB | {ref} |")


if __name__ == "__main__":
    main()
