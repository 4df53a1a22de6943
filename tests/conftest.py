import os

# Tests run on the default backend (the real TPU chip when present — faster
# than this machine's single CPU core, and better numerics coverage).
# Multi-device tests spawn subprocesses with JAX_PLATFORM_NAME=cpu +
# --xla_force_host_platform_device_count=8 (see test_parallel.py): the 'axon'
# TPU plugin in this environment ignores JAX_PLATFORMS; JAX_PLATFORM_NAME works.
os.environ.setdefault("JAX_ENABLE_X64", "0")

# harmless on TPU; gives 8 virtual devices if the CPU backend is ever selected
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
