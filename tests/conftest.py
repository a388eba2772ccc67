"""Test configuration: force CPU with 8 virtual devices (for sharding
tests) and float64 before JAX initializes."""

import os
import sys

# Force CPU (the ambient environment may pin JAX_PLATFORMS to a TPU
# platform); override with NDSM_TEST_PLATFORM to test on real hardware.
# Setting JAX_PLATFORMS alone is NOT always sufficient: the ambient TPU
# plugin can re-assert itself while its pool variable is present, which
# silently moves "CPU" tests onto the TPU (float64 there is emulated —
# pure-permutation round-trips come back with ulp-level differences and
# everything is tunnel-slow).  Detach fully unless explicitly requested.
_plat = os.environ.get("NDSM_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _plat
if _plat == "cpu":
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The ambient TPU plugin may import jax at interpreter startup (via
# sitecustomize), in which case jax.config captured JAX_PLATFORMS from
# the ORIGINAL environment and the os.environ writes above are no-ops.
# Updating the config directly still works as long as no backend has
# been instantiated yet.
jax.config.update("jax_platforms", _plat)
jax.config.update("jax_enable_x64", True)
