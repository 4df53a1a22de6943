"""Multi-device sharding tests: run the graft dryrun on a virtual 8-device CPU
mesh in a subprocess (the in-process backend may already be the TPU)."""

import os
import subprocess
import sys

import pytest


def _cpu_env(n_devices: int):
    """Subprocess env that CANNOT touch the TPU tunnel (one shared
    definition: padt_tpu/utils/hostenv.py)."""
    from padt_tpu.utils.hostenv import cpu_subprocess_env

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return cpu_subprocess_env(n_devices, root=root)



@pytest.mark.parametrize("n", [8])
@pytest.mark.smoke
def test_dryrun_multichip(n):
    env = _cpu_env(8)
    code = (
        "import __graft_entry__ as g; g.dryrun_multichip(%d)" % n
    )
    r = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True,
        text=True,
        timeout=900,  # train + inference phases, one-core host
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "dryrun_multichip OK (train+infer+serve)" in r.stdout


def test_sharded_generate_matches_single_device():
    env = _cpu_env(8)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(root, "tests", "multichip_check.py"), "check_sharded_generate"],
        env=env, cwd=root, capture_output=True, text=True, timeout=560,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "sharded_generate OK" in r.stdout


@pytest.mark.smoke
def test_cached_vision_train_sharded_and_spmd_clean():
    """Cached vis_* train step on a (2,2,2) mesh: runs, finite loss, and NO
    involuntary full rematerializations (the cached-feature keys must not
    regress the SPMD-clean train step)."""
    env = _cpu_env(8)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(root, "tests", "multichip_check.py"), "check_cached_vision_train"],
        env=env, cwd=root, capture_output=True, text=True, timeout=560,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "cached_vision_train OK" in r.stdout
    n_remat = r.stderr.count("Involuntary full rematerialization")
    assert n_remat == 0, f"{n_remat} involuntary remats:\n" + r.stderr[-3000:]
