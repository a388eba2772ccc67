"""Test configuration: force CPU with 8 virtual devices (for sharding
tests) and float64 before JAX initializes."""

import os
import sys

# Force CPU (the ambient environment may pin JAX_PLATFORMS to a TPU
# platform); override with NDSM_TEST_PLATFORM to test on real hardware.
os.environ["JAX_PLATFORMS"] = os.environ.get("NDSM_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
