"""Wiener-Hopf clutter filter: parity and cancellation depth."""

import jax.numpy as jnp
import numpy as np

from blah2_tpu.capture.synthetic import TargetSpec, synthetic_cpi
from blah2_tpu.dsp.clutter import WienerHopfFilter
from tests.reference_impl import wiener_hopf_reference

FS = 10_000
N = 2_000


def _channels(seed=0, clutter=1.0, targets=(), noise=1e-3):
    return synthetic_cpi(N, FS, targets, clutter_amplitude=clutter,
                         noise_amplitude=noise, seed=seed)


def test_parity_vs_reference_impl():
    x, y = _channels(seed=11, clutter=2.0,
                     targets=[TargetSpec(5, 17.0, 0.05)])
    filt = WienerHopfFilter(-3, 10, N, round_hamming=True,
                            dtype=jnp.complex128)
    got, ok = filt(jnp.asarray(x), jnp.asarray(y))
    assert bool(ok)
    want, _ = wiener_hopf_reference(x, y, -3, 10)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-8)


def test_clutter_suppression_depth():
    """Direct-path clutter (0-lag copy of x) must be cancelled by >30 dB."""
    x, y = _channels(seed=2, clutter=5.0, noise=1e-4)
    filt = WienerHopfFilter(-3, 10, N, dtype=jnp.complex128)
    y2, ok = filt(jnp.asarray(x), jnp.asarray(y))
    assert bool(ok)
    # Skip the first filter-length samples: the linear-convolution ramp-up
    # transient is uncancelled by construction (same as the reference).
    skip = 20
    before = float(np.mean(np.abs(y[skip:]) ** 2))
    after = float(np.mean(np.abs(np.asarray(y2)[skip:]) ** 2))
    assert 10 * np.log10(before / after) > 40.0


def test_target_survives_filter():
    """A fast target outside the clutter lag window survives cancellation."""
    tgt = TargetSpec(delay_bins=30, doppler_hz=40.0, amplitude=0.5)
    x, y = _channels(seed=3, clutter=5.0, targets=[tgt], noise=1e-4)
    filt = WienerHopfFilter(-3, 10, N, dtype=jnp.complex128)
    y2, ok = filt(jnp.asarray(x), jnp.asarray(y))
    assert bool(ok)
    # Correlate filtered surveillance against the delayed+shifted reference.
    t = np.arange(N) / FS
    replica = np.zeros_like(x)
    replica[30:] = x[:-30]
    replica = replica * np.exp(2j * np.pi * 40.0 * t)
    power = np.abs(np.vdot(replica, np.asarray(y2))) / np.linalg.norm(replica)
    expected = 0.5 * np.linalg.norm(replica)
    assert power > 0.8 * expected


def test_float32_suppression():
    """The complex64 TPU path still cancels clutter deeply."""
    x, y = _channels(seed=4, clutter=5.0, noise=1e-3)
    filt = WienerHopfFilter(-3, 10, N, dtype=jnp.complex64)
    y2, ok = filt(jnp.asarray(x, dtype=jnp.complex64),
                  jnp.asarray(y, dtype=jnp.complex64))
    assert bool(ok)
    before = float(np.mean(np.abs(y) ** 2))
    after = float(np.mean(np.abs(np.asarray(y2)) ** 2))
    assert 10 * np.log10(before / after) > 20.0


def test_segmented_path_matches_monolithic_exactly():
    """The segmented-transform path (r5: batched ~16k segment FFTs with a
    shared reference-channel spectrum and overlap-add FIR) must be
    algebraically identical to the monolithic full-CPI-FFT path in BOTH
    modes — same correlations, same solve, same first-n linear
    convolution."""
    n = 32_768
    x, y = synthetic_cpi(n, FS, [TargetSpec(7, 23.0, 0.05)],
                         clutter_amplitude=2.0, noise_amplitude=1e-3,
                         seed=3)
    for mode in ("circular", "linear"):
        filt = WienerHopfFilter(-5, 40, n, dtype=jnp.complex128, mode=mode)
        assert filt.n_seg > 0, "segmentation must engage at this size"
        got, ok = filt(jnp.asarray(x), jnp.asarray(y))
        assert bool(ok)
        filt.n_seg = 0  # force the monolithic path on the same instance
        want, ok2 = filt(jnp.asarray(x), jnp.asarray(y))
        assert bool(ok2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-9, atol=1e-9)
