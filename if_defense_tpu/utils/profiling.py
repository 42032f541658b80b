"""Profiling / tracing helpers.

Upgrades the reference's manual `time.time()` buckets
(`CW/Perturb.py:81-150`, per-stage stats dicts in the mesh generators) to
(a) a phase timer that correctly synchronises device work and (b) real
`jax.profiler` traces viewable in TensorBoard/XProf.

NOTE on synchronisation: through the axon TPU tunnel,
`block_until_ready()` can return before remote execution completes; a
scalar host fetch is the reliable barrier, so `PhaseTimer.sync` fetches
one element of the given array.
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


class PhaseTimer:
    """Accumulates wall time per named phase (AverageMeter-style)."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync_array=None):
        t0 = time.time()
        try:
            yield
        finally:
            if sync_array is not None:
                self.sync(sync_array)
            dt = time.time() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    @staticmethod
    def sync(array):
        """Reliable device barrier: fetch one element to the host."""
        np.asarray(jax.numpy.ravel(array)[0])

    def summary(self) -> dict:
        return {
            name: {"total_s": self.totals[name],
                   "count": self.counts[name],
                   "mean_s": self.totals[name] / self.counts[name]}
            for name in self.totals
        }


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace (open with TensorBoard/XProf)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
