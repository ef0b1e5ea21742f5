"""Cold-to-first-proof measurement for the AOT executable store.

The reference has zero compile phase (go run); our server previously
relied on the persistent XLA compile cache, which still pays HLO
replay + codegen on every fresh process (16-96 s per config). ops/aot.py
serializes the compiled PJRT executables themselves; this script
measures what that buys a fresh server process (round-4 verdict item 5):

  run A  fresh process, XLA cache warm, NO aot store   (status quo)
  run B  fresh process, XLA cache warm, aot store EMPTY (populates it)
  run C  fresh process, aot store POPULATED             (the headline)

Each run is one bench.py child (2048x1024 by default, 1 rep, no checks)
timed end-to-end: process start -> first complete proof. Results land in
AOT_COLDSTART.json. Run on the real TPU with the tunnel idle.
"""

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = os.environ.get("LUMENOS_COLDSTART_CFG", "2048x1024")
STORE = os.environ.get("LUMENOS_COLDSTART_DIR",
                       os.path.join(REPO, ".aot_exec"))


def run_child(aot: bool) -> dict:
    env = dict(os.environ,
               LUMENOS_BENCH_CONFIGS=CFG,
               LUMENOS_BENCH_NOCHECK="1",
               LUMENOS_BENCH_REPS="1",
               LUMENOS_BENCH_SUPERVISOR="0",
               PYTHONPATH=f"{REPO}:/root/.axon_site")
    if aot:
        env["LUMENOS_AOT_DIR"] = STORE
    else:
        env.pop("LUMENOS_AOT_DIR", None)
    t0 = time.perf_counter()
    out = subprocess.run(
        [sys.executable, "-u", os.path.join(REPO, "bench.py")],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=3000)
    wall = time.perf_counter() - t0
    line = [ln for ln in out.stdout.splitlines()
            if ln.startswith('{"metric"')]
    if out.returncode or not line:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(f"child failed rc={out.returncode}")
    rec = json.loads(line[-1])
    cfg = rec["configs"][CFG]
    return {"wall_to_first_proof_s": round(wall, 1),
            "compile_s": cfg.get("compile_s"),
            "prove_total_s": cfg.get("total_s"),
            "n_exec_files": len(os.listdir(STORE))
            if os.path.isdir(STORE) else 0}


def main() -> None:
    if os.path.isdir(STORE):
        shutil.rmtree(STORE)
    runs = {}
    runs["no_aot"] = run_child(aot=False)
    print("A (no aot):", runs["no_aot"], flush=True)
    runs["aot_populate"] = run_child(aot=True)
    print("B (aot populate):", runs["aot_populate"], flush=True)
    runs["aot_load"] = run_child(aot=True)
    print("C (aot load):", runs["aot_load"], flush=True)
    report = {
        "config": CFG,
        "store_dir": STORE,
        "runs": runs,
        "speedup_wall": round(
            runs["no_aot"]["wall_to_first_proof_s"]
            / max(runs["aot_load"]["wall_to_first_proof_s"], 1e-9), 2),
        "note": ("wall_to_first_proof_s = fresh python process -> one "
                 "complete proof at the config (bench.py child, 1 rep, "
                 "checks off). The XLA persistent compile cache is warm "
                 "in every run; the aot store additionally skips HLO "
                 "replay + backend codegen for the staged-encode program "
                 "set (ops/aot.py)."),
    }
    with open(os.path.join(REPO, "AOT_COLDSTART.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
