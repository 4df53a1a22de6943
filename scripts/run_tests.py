"""Suite-health recorder: run the test suite in stages and write TESTS_r{N}.json.

Stages:
  1. smoke  — `pytest -m smoke` on the forced-CPU platform (<~8 min): parsers,
     losses, geometry, RLE, eval protocol, serve engine, multi-chip dryrun.
  2. full   — the whole suite on the default backend (the TPU when present;
     ~40+ min there, dominated by remote compiles).

Writes one JSON file {stage: {passed, failed, errors, skipped, wall_s,
returncode}, ...} plus git HEAD, so every round has a committed record of
suite health at a known commit (VERDICT r2 weak #8).

Usage: python scripts/run_tests.py [--round N] [--smoke-only]
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_stage(args_list, env=None, timeout=7200):
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-m", "pytest", *args_list],
        cwd=ROOT,
        env={**os.environ, **(env or {})},
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    wall = time.time() - t0
    tail = (r.stdout or "")[-4000:]
    counts = {"passed": 0, "failed": 0, "errors": 0, "skipped": 0, "deselected": 0}
    for key in counts:
        m = re.findall(rf"(\d+) {key[:-1] if key != 'errors' else 'error'}", tail)
        if m:
            counts[key] = int(m[-1])
    return {
        **counts,
        "wall_s": round(wall, 1),
        "returncode": r.returncode,
        "summary_tail": tail.splitlines()[-1] if tail.splitlines() else "",
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=3)
    ap.add_argument("--smoke-only", action="store_true")
    a = ap.parse_args()

    head = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], cwd=ROOT, capture_output=True, text=True
    ).stdout.strip()
    out = {"git_head": head}

    print("stage 1: smoke (CPU) ...", flush=True)
    # strip the axon TPU-tunnel plugin so a hung tunnel can't stall the
    # CPU-only smoke stage (shared definition: padt_tpu/utils/hostenv.py)
    sys.path.insert(0, ROOT)
    from padt_tpu.utils.hostenv import cpu_subprocess_env

    full_env = cpu_subprocess_env(root=ROOT)
    cpu_env = {k: full_env[k] for k in ("PYTHONPATH", "JAX_PLATFORMS", "JAX_PLATFORM_NAME")}
    out["smoke"] = _run_stage(["tests/", "-m", "smoke", "-q"], env=cpu_env)
    print(json.dumps(out["smoke"]))

    path = os.path.join(ROOT, f"TESTS_r{a.round:02d}.json")

    if not a.smoke_only:
        print("stage 2: full suite (default backend) ...", flush=True)
        out["full"] = _run_stage(["tests/", "-q"], timeout=10800)
        out["full"]["git_head"] = head
        if out["full"]["returncode"] != 0:
            # name the failures in the record (the summary line only counts
            # them; round 5 had to dig them out of pytest's lastfailed cache)
            lf = os.path.join(ROOT, ".pytest_cache", "v", "cache", "lastfailed")
            if os.path.exists(lf):
                with open(lf) as f:
                    out["full"]["failed_tests"] = sorted(json.load(f))
        print(json.dumps(out["full"]))
    elif os.path.exists(path):
        # keep the most recent full-suite record (tagged with its own HEAD)
        # so a smoke-only refresh never erases the round's full-suite evidence
        with open(path) as f:
            prev = json.load(f)
        if "full" in prev:
            out["full"] = prev["full"]
            out["full"].setdefault("git_head", prev.get("git_head"))

    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)
    ok = all(v.get("returncode", 1) == 0 for k, v in out.items() if isinstance(v, dict))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
