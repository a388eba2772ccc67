"""Profiling and phase-timing helpers.

The reference's only instrumentation is a single wall-clock timer around
the whole solve (ndsm_root.f90:521-536 captured into ROPT_TIM).  Here
every sub-solve reports wall time, cycles and final delta via SolveInfo,
and this module adds an opt-in XLA profiler trace for kernel-level
analysis (view with TensorBoard or Perfetto).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax

__all__ = ["trace", "Timer"]


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture an XLA profiler trace of the enclosed block.

    Example:
        with ndsm_tpu.utils.profiling.trace("/tmp/ndsm-trace"):
            vector_potential(x, y, z, b)
    """
    with jax.profiler.trace(log_dir):
        yield


class Timer:
    """Accumulating named phase timer.

    Example:
        t = Timer()
        with t.phase("smooth"):
            ...
        print(t.report())
    """

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync: Optional[object] = None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = [
            f"{name}: {total:.4f}s / {self.counts[name]} calls"
            for name, total in sorted(
                self.totals.items(), key=lambda kv: -kv[1]
            )
        ]
        return "\n".join(lines)
