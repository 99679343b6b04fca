"""Test configuration: force an 8-device CPU mesh so multi-chip sharding logic
is exercised without TPU hardware (SURVEY.md §4)."""

import os
import sys

# Must be set before the CPU backend is instantiated.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The environment's sitecustomize (axon TPU tunnel) forces
# jax_platforms="axon,cpu" at interpreter start; steer tests back to the
# 8-device virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
