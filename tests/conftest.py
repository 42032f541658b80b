"""Test config: force an 8-device virtual CPU mesh before JAX import.

Multi-device sharding paths are validated on host CPU (the real topology is
a TPU mesh; XLA's CPU backend runs the same SPMD partitioning).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize pre-imports jax before this conftest runs, so the
# env vars alone are too late; redirect the (not-yet-initialised) backend
# explicitly too. Safe either way: backends initialise lazily.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on the CPU mesh"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
