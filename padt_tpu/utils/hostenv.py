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
