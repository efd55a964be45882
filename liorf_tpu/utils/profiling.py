"""Profiling & tracing utilities.

Replaces the reference's ``TicToc`` wall timers
(``/root/reference/include/tictoc.h:12-47``) and adds what a TPU pipeline
actually needs: per-stage timing with device synchronization (a jit call
returns before the device finishes — timing without ``block_until_ready``
measures dispatch, not work) and optional JAX profiler traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class TicToc:
    """Scoped wall timer, reference semantics (print optional)."""

    def __init__(self, disp: bool = False):
        self.disp = disp
        self.tic()

    def tic(self):
        self._t0 = time.perf_counter()

    def toc(self, about: str = "") -> float:
        dt_ms = (time.perf_counter() - self._t0) * 1000.0
        if self.disp:
            print(f"{about}: {dt_ms:.2f} ms")
        return dt_ms


class StageTimers:
    """Accumulates per-stage wall time; `sync=True` blocks on the device."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_on is not None:
                jax.block_until_ready(sync_on)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> dict[str, dict]:
        return {
            k: dict(
                total_s=round(self.totals[k], 4),
                count=self.counts[k],
                mean_ms=round(1000 * self.totals[k] / max(self.counts[k], 1), 3),
            )
            for k in sorted(self.totals)
        }


@contextlib.contextmanager
def trace(log_dir: str):
    """JAX profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
