"""Test configuration: force CPU with an 8-device virtual mesh + float64.

The image's sitecustomize registers the axon TPU plugin at interpreter start,
so JAX is already imported before conftest runs; platform/x64 selection must
therefore go through jax.config.update (still before first backend use), while
the CPU device count flag is read from XLA_FLAGS at backend init and can be
set here. Multi-chip sharding logic is validated on the virtual CPU mesh (the
driver's ``dryrun_multichip`` does the same); the real-TPU path is exercised
by ``bench.py`` only."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
