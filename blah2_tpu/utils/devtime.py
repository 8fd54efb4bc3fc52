"""Shared queued device-compute measurement protocol.

One implementation of the rules that r4/r5 measurement bugs established
(each previously re-derived per tool, with subtly different policies):

  - the null round trip is measured ADJACENT to the timed queue, as the
    MIN of a few samples (the fixed dispatch+fetch floor; a single
    sample can land on a co-tenant burst and overshoot the whole queue);
  - the queue must be deep enough that its wall sits well above the
    round trip's throttle variance, or the subtraction is noise;
  - the robust statistic is the MEDIAN of the POSITIVE corrected trials
    (min() prefers exactly the trials a throttled baseline corrupts
    toward zero); when every trial is non-positive the result falls back
    to the raw wall/N (a conservative upper bound) and is flagged.
"""

from __future__ import annotations

import time

import numpy as np


class QueuedTimer:
    """Queued-execution timer over resident inputs.

    ``timer = QueuedTimer()`` (compiles a tiny null program once), then
    ``timer.measure(dispatch, force, n_rep, reps)`` -> (ms_per_exec,
    suspect: bool).
    """

    def __init__(self):
        import jax
        import jax.numpy as jnp

        self._null = jax.jit(lambda v: v + 1.0)
        self._z8 = jnp.zeros(8, jnp.float32)
        np.asarray(self._null(self._z8))  # compile

    def null_rt_ms(self, min_of: int = 3) -> float:
        best = float("inf")
        for _ in range(min_of):
            t0 = time.perf_counter()
            np.asarray(self._null(self._z8)[:1])
            best = min(best, (time.perf_counter() - t0) * 1e3)
        return best

    def measure(self, dispatch, force, n_rep: int = 32,
                reps: int = 3):
        """Dispatch ``n_rep`` async executions per trial, force only the
        last; ``reps`` trials each with an adjacent baseline. Returns
        ``(ms_per_exec, suspect)``."""
        corrected, raw = [], []
        for _ in range(reps):
            rt = self.null_rt_ms()
            t0 = time.perf_counter()
            o = None
            for _ in range(n_rep):
                o = dispatch()
            force(o)
            wall = (time.perf_counter() - t0) * 1e3
            corrected.append((wall - rt) / n_rep)
            raw.append(wall / n_rep)
        pos = [t for t in corrected if t > 0]
        if pos:
            return float(np.median(pos)), False
        return float(np.median(raw)), True
