"""Test configuration: force CPU with an 8-device virtual mesh.

Multi-chip sharding logic is validated on a virtual CPU mesh (the driver's
``dryrun_multichip`` does the same); the real-TPU path is exercised by
``bench.py`` only. Must run before jax is imported anywhere."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")
