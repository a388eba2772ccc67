"""Platform capability probes."""

from __future__ import annotations

import functools
import os

import jax

__all__ = ["callbacks_supported", "pallas_fused_usable", "resolve_use_pallas"]


@functools.lru_cache(maxsize=None)
def callbacks_supported() -> bool:
    """Whether the default backend supports host callbacks
    (jax.debug.print / io_callback).  The axon TPU PJRT plugin does not;
    convergence warnings are then carried only by the returned ierr/info
    instead of printed."""
    if os.environ.get("NDSM_TPU_NO_CALLBACKS"):
        return False
    try:
        version = jax.devices()[0].client.platform_version
    except Exception:
        return True
    return "axon" not in version


@functools.lru_cache(maxsize=None)
def pallas_fused_usable() -> bool:
    """Runtime probe for the fused Pallas smoother (ops/pallas_fused.py):
    compile + run a tiny configuration on the default backend and check it
    against the XLA sweep.  Any failure (Mosaic toolchain bugs, unsupported
    platform) disables the kernel and the engine falls back to XLA.  The
    probe result is cached per process; the compiled probe program is tiny
    and hits the persistent compile cache on repeat runs."""
    import numpy as np

    try:
        if jax.devices()[0].platform == "cpu":
            return False
        import jax.numpy as jnp

        from ..ops import pallas_zc, stencils

        # Lane-aligned last axis; ny admits the window tiles of both
        # widths the engine composes with (1 and 2 sweeps per pass).
        # The z-compact kernel is the production path; fused/x-compact
        # fallbacks share its toolchain requirements, and a per-solve
        # compile-error fallback guards the residual cases.
        shape = (16, 32, 128)
        dq = np.array([0.1, 0.1, 0.1])
        bcs = (("D", "D"), ("D", "D"), ("N", "N"))
        rng = np.random.default_rng(0)
        u = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        r = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        for ns in (1, 2):
            f = pallas_zc.zc_smooth_3d(bcs, dq, shape, ns)
            if f is None:
                return False
            got = np.asarray(jax.block_until_ready(jax.jit(f)(u, r)))
            want = u
            for _ in range(ns):
                want = stencils.rb_sweep(want, r, dq, bcs)
            if np.abs(got - np.asarray(want)).max() >= 1e-4:
                return False
        return True
    except Exception:
        return False


def resolve_use_pallas(mode: str) -> str:
    """Resolve Options.use_pallas ("auto"/"on"/"off") to the engine's
    effective mode ("on"/"off"/"interpret").

    NDSM_TPU_PALLAS overrides "auto"/"on": "0" -> off, "1" -> on (no
    probe), "interpret" -> interpreter mode (testing the wiring on
    CPU).  An EXPLICIT Options(use_pallas="off") always wins — the
    kernel-compile-failure fallback rebuilds with use_pallas="off" and
    must come out kernel-free even under the env override, or a broken
    kernel would retry itself forever (round-5 fallback-test finding)."""
    if mode == "off":
        return "off"
    env = os.environ.get("NDSM_TPU_PALLAS")
    if env is not None:
        return {"0": "off", "1": "on", "interpret": "interpret"}.get(env, "off")
    if mode == "on":
        return "on"
    return "on" if pallas_fused_usable() else "off"
