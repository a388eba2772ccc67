"""Host-side diagnostic message formatting.

The reference emits ``ERROR(sub):msg:eid`` / ``DEBUG(sub):msg`` lines to
ERROR_UNIT (fortran/ndsm_root.f90:476-503) and convergence warnings via
bare ``PRINT *`` (ndsm_poisson.f90:149; ndsm_multigrid_core.f90:797).
These helpers reproduce that observable behavior from the Python host —
they run after device results are fetched, so they work identically on
every platform (including runtimes without host-callback support, where
the previous in-graph ``jax.debug.print`` warnings were silently lost).
"""

from __future__ import annotations

import sys

__all__ = ["warn", "debug_msg", "error_msg"]


def warn(msg: str) -> None:
    """Bare warning line (reference: ``PRINT *``, ndsm_poisson.f90:149)."""
    print(msg, file=sys.stderr, flush=True)


def debug_msg(sub: str, msg: str) -> None:
    """``DEBUG(sub):msg`` trace line (reference: debug_msg,
    ndsm_root.f90:493-503)."""
    print(f"DEBUG({sub}):{msg}", file=sys.stderr, flush=True)


def error_msg(sub: str, msg: str, eid: int = 0) -> None:
    """``ERROR(sub):msg:eid`` line (reference: error_msg,
    ndsm_root.f90:476-491)."""
    print(f"ERROR({sub}):{msg}:{eid}", file=sys.stderr, flush=True)
