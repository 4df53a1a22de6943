import os
import sys

# Tests run on the default backend (the real TPU chip when present — faster
# than this machine's single CPU core, and better numerics coverage).
# Multi-device tests spawn subprocesses with JAX_PLATFORM_NAME=cpu +
# --xla_force_host_platform_device_count=8 (see test_parallel.py): the 'axon'
# TPU plugin in this environment ignores JAX_PLATFORMS; JAX_PLATFORM_NAME works.
os.environ.setdefault("JAX_ENABLE_X64", "0")

# `pytest -m smoke` is the fast CPU-only verification subset (<5 min): parser,
# losses, geometry, RLE, sampler, eval protocol, multi-chip dryrun. Force the
# CPU platform so no remote TPU compiles happen. Checked here (import time,
# before any test module imports jax) because backend choice is process-global.
def _smoke_selected(argv):
    for i, a in enumerate(argv):
        if a == "-m" and i + 1 < len(argv) and "smoke" in argv[i + 1]:
            return True
        if a.startswith("-m") and "smoke" in a:  # -msmoke / -m=smoke forms
            return True
    return False


if _smoke_selected(sys.argv):
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    os.environ["JAX_PLATFORMS"] = "cpu"
    # The axon sitecustomize imports jax at interpreter startup (its
    # register() path), so platform env vars set here are TOO LATE — the
    # config already latched. jax.config.update still works because
    # backends initialize lazily on first device use.
    if "jax" in sys.modules:
        sys.modules["jax"].config.update("jax_platforms", "cpu")

# harmless on TPU; gives 8 virtual devices if the CPU backend is ever selected
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
