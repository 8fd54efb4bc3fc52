"""Shared queued device-compute timer (blah2_tpu.utils.devtime)."""

import jax.numpy as jnp
import numpy as np

from blah2_tpu.utils.devtime import QueuedTimer


def test_measure_positive_and_not_suspect():
    import jax

    qt = QueuedTimer()
    fn = jax.jit(lambda a: jnp.sum(a * a))
    x = jnp.arange(262_144, dtype=jnp.float32)
    np.asarray(fn(x))  # compile
    ms, suspect = qt.measure(lambda: fn(x), lambda o: np.asarray(o),
                             n_rep=16, reps=3)
    assert ms >= 0.0
    assert suspect in (True, False)
    # On any sane backend a 256k multiply-reduce queue of 16 is
    # measurable: the corrected median must stay well under 1 s/exec.
    assert ms < 1000.0


def test_null_rt_is_finite_and_small():
    qt = QueuedTimer()
    rt = qt.null_rt_ms()
    assert 0.0 <= rt < 10_000.0
