"""Linear vs circular Wiener-Hopf modes agree to O(n_bins/n)."""

import jax.numpy as jnp
import numpy as np

from blah2_tpu.capture.synthetic import synthetic_cpi
from blah2_tpu.dsp.clutter import WienerHopfFilter


def test_linear_close_to_circular():
    n, fs = 4_000, 10_000
    x, y = synthetic_cpi(n, fs, [], clutter_amplitude=3.0,
                         noise_amplitude=1e-3, seed=9)
    f_circ = WienerHopfFilter(-3, 12, n, dtype=jnp.complex128)
    f_lin = WienerHopfFilter(-3, 12, n, dtype=jnp.complex128, mode="linear")
    y_c, ok_c = f_circ(jnp.asarray(x), jnp.asarray(y))
    y_l, ok_l = f_lin(jnp.asarray(x), jnp.asarray(y))
    assert bool(ok_c) and bool(ok_l)
    # Both cancel the clutter; outputs agree to a small relative error.
    scale = float(np.sqrt(np.mean(np.abs(y) ** 2)))
    diff = float(np.sqrt(np.mean(np.abs(np.asarray(y_c) - np.asarray(y_l)) ** 2)))
    assert diff / scale < 0.02
    # And the linear mode cancels as deeply as the circular one.
    for y2 in (y_c, y_l):
        res = float(np.mean(np.abs(np.asarray(y2)[50:]) ** 2))
        before = float(np.mean(np.abs(y[50:]) ** 2))
        assert 10 * np.log10(before / res) > 35.0
