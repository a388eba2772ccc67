"""Platform capability probes."""

from __future__ import annotations

import functools
import os

import jax

__all__ = ["callbacks_supported"]


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
