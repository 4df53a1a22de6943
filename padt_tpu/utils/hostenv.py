"""Subprocess environments that CANNOT touch the TPU tunnel.

The axon TPU plugin registers at interpreter startup (sitecustomize on
PYTHONPATH) and contacts the tunnel during import — even under
JAX_PLATFORMS=cpu — so a hung tunnel blocks every process that still has the
plugin on its path. CPU-only subprocesses (multi-device virtual meshes, smoke
test stages, dryrun bootstraps) must strip it AND force the CPU platform.
One definition here; tests/test_parallel.py, scripts/run_tests.py and
__graft_entry__.py all build on it.
"""

from __future__ import annotations

import os
from typing import Dict, Optional


def cpu_subprocess_env(
    n_devices: Optional[int] = None, root: Optional[str] = None
) -> Dict[str, str]:
    """os.environ copy with the axon plugin stripped from PYTHONPATH, the CPU
    platform forced, and (optionally) `n_devices` virtual CPU devices."""
    root = root or os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    pythonpath = os.pathsep.join(
        [root]
        + [
            p
            for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
            if p and "axon" not in p and p != root
        ]
    )
    env = dict(
        os.environ,
        PYTHONPATH=pythonpath,
        JAX_PLATFORMS="cpu",
        JAX_PLATFORM_NAME="cpu",
    )
    if n_devices:
        env["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n_devices}"
        )
    return env


def tpu_tunnel_expected() -> bool:
    """True when this process would target the axon TPU tunnel: the plugin is
    on the path and the CPU platform is not forced."""
    import sys

    if os.environ.get("JAX_PLATFORM_NAME", "") == "cpu":
        return False
    paths = os.environ.get("PYTHONPATH", "").split(os.pathsep) + sys.path
    return any("axon" in p for p in paths if p)


def wait_for_tpu(budget_s: Optional[float] = None, interval_s: float = 150.0) -> bool:
    """Block until the TPU tunnel answers a fresh-subprocess probe, up to
    `budget_s` (default PADT_TPU_WAIT_S or 3600). The tunnel aborts AND hangs
    transiently (CLAUDE.md); a fresh process several minutes later recovers,
    so long-lived entry points (bench.py, the driver's entry compile check)
    wait here instead of failing on the first dead jax.devices(). Probes run
    in subprocesses because a failed backend init poisons the parent's jax.
    Returns True when the tunnel answered, False when the budget ran out
    (callers proceed and fail loudly). No-op (True) when no tunnel is
    expected."""
    import subprocess
    import sys
    import time

    if not tpu_tunnel_expected():
        return True
    budget_s = float(os.environ.get("PADT_TPU_WAIT_S", "3600")) if budget_s is None else budget_s
    deadline = time.time() + budget_s
    first = True
    while True:
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True,
                timeout=interval_s,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            print("wait_for_tpu: budget exhausted, proceeding anyway", file=sys.stderr)
            return False
        if first:
            print(
                f"wait_for_tpu: TPU tunnel down, retrying up to {int(budget_s)}s "
                "(override: PADT_TPU_WAIT_S)",
                file=sys.stderr,
            )
            first = False
        time.sleep(min(interval_s, max(0.0, deadline - time.time())))
