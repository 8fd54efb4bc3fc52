"""Ambiguity processor: geometry goldens, numeric parity, target localisation."""

import jax.numpy as jnp
import numpy as np
import pytest

from blah2_tpu.capture.synthetic import TargetSpec, synthetic_cpi
from blah2_tpu.dsp.ambiguity import AmbiguityProcessor, map_metrics
from tests.reference_impl import ambiguity_reference

# Small geometry for fast numeric tests: fs=10 kHz, 0.1 s CPI.
SMALL = dict(delay_min=-5, delay_max=20, doppler_min=-50, doppler_max=50,
             fs=10_000, n_samples=1_000)


def test_geometry_golden():
    """Constructor invariants per `TestAmbiguity.cpp:73-116` (fs=2 MHz,
    tCpi=0.5, delay −10..300, Doppler ±300)."""
    amb = AmbiguityProcessor(-10, 300, -300, 300, 2_000_000, 1_000_000,
                             round_hamming=False)
    assert amb.n_corr == 3322
    assert amb.n_doppler_bins == 301
    assert amb.nfft == 6643
    assert amb.n_delay_bins == 311
    amb_h = AmbiguityProcessor(-10, 300, -300, 300, 2_000_000, 1_000_000,
                               round_hamming=True)
    assert amb_h.nfft == 6750
    assert abs(amb_h.cpi - 3322 * 301 / 2e6) < 1e-12


def test_geometry_default_config():
    """Default config.yml: fs=2 MHz, tCpi=0.75, Doppler ±200."""
    amb = AmbiguityProcessor(-10, 400, -200, 200, 2_000_000, 1_500_000)
    assert amb.n_doppler_bins % 2 == 1
    assert amb.n_delay_bins == 411
    assert len(amb.doppler_axis) == amb.n_doppler_bins
    assert amb.doppler_axis[amb.n_doppler_bins // 2] == 0.0


def test_axes():
    amb = AmbiguityProcessor(**SMALL)
    assert amb.delay_axis[0] == -5 and amb.delay_axis[-1] == 20
    mid = amb.n_doppler_bins // 2
    assert amb.doppler_axis[mid] == 0.0
    assert np.allclose(np.diff(amb.doppler_axis), amb.doppler_resolution)


@pytest.mark.parametrize("round_hamming", [False, True])
def test_numeric_parity_vs_reference_impl(round_hamming):
    rng = np.random.default_rng(42)
    n = SMALL["n_samples"]
    x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    y = rng.standard_normal(n) + 1j * rng.standard_normal(n)

    amb = AmbiguityProcessor(**SMALL, round_hamming=round_hamming,
                             dtype=jnp.complex128)
    got = np.asarray(amb(jnp.asarray(x), jnp.asarray(y)))
    want = ambiguity_reference(x, y, SMALL["delay_min"], SMALL["delay_max"],
                               SMALL["doppler_min"], SMALL["doppler_max"],
                               SMALL["fs"], n, round_hamming)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_doppler_middle_preshift():
    """Non-centred Doppler window engages the pre-shift ramp
    (`Ambiguity.cpp:95-102`)."""
    cfg = dict(SMALL, doppler_min=-30, doppler_max=50)
    rng = np.random.default_rng(3)
    n = cfg["n_samples"]
    x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    y = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    amb = AmbiguityProcessor(**cfg, dtype=jnp.complex128)
    assert amb.doppler_middle == 10.0
    got = np.asarray(amb(jnp.asarray(x), jnp.asarray(y)))
    want = ambiguity_reference(x, y, cfg["delay_min"], cfg["delay_max"],
                               cfg["doppler_min"], cfg["doppler_max"],
                               cfg["fs"], n, True)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_matmul_vs_fft_doppler_paths():
    rng = np.random.default_rng(7)
    n = SMALL["n_samples"]
    x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    y = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    a1 = AmbiguityProcessor(**SMALL, dtype=jnp.complex128,
                            doppler_via_matmul=True)
    a2 = AmbiguityProcessor(**SMALL, dtype=jnp.complex128,
                            doppler_via_matmul=False)
    np.testing.assert_allclose(
        np.asarray(a1(jnp.asarray(x), jnp.asarray(y))),
        np.asarray(a2(jnp.asarray(x), jnp.asarray(y))),
        rtol=1e-8, atol=1e-8,
    )


def test_target_peak_location():
    """An injected target peaks at its delay/Doppler cell."""
    fs, n = 10_000, 10_000
    tgt = TargetSpec(delay_bins=7, doppler_hz=-24.0, amplitude=1.0)
    x, y = synthetic_cpi(n, fs, [tgt], noise_amplitude=1e-4, seed=1)
    amb = AmbiguityProcessor(-5, 20, -50, 50, fs, n, dtype=jnp.complex128)
    z = np.asarray(amb(jnp.asarray(x), jnp.asarray(y)))
    peak = np.unravel_index(np.argmax(np.abs(z)), z.shape)
    assert amb.delay_axis[peak[1]] == 7
    assert abs(amb.doppler_axis[peak[0]] - (-24.0)) <= amb.doppler_resolution


def test_map_metrics():
    z = jnp.asarray([[1.0 + 0j, 10.0 + 0j], [100.0 + 0j, 1.0 + 0j]])
    db, noise, maxp = map_metrics(z)
    assert abs(float(noise) - 7.5) < 1e-6
    assert abs(float(maxp) - 12.5) < 1e-6
    np.testing.assert_allclose(np.asarray(db)[1][0], 20.0, atol=1e-6)


def test_float32_close_to_float64():
    fs, n = 10_000, 10_000
    tgt = TargetSpec(delay_bins=3, doppler_hz=10.0, amplitude=0.5)
    x, y = synthetic_cpi(n, fs, [tgt], noise_amplitude=1e-3, seed=5)
    a32 = AmbiguityProcessor(-5, 20, -50, 50, fs, n, dtype=jnp.complex64)
    a64 = AmbiguityProcessor(-5, 20, -50, 50, fs, n, dtype=jnp.complex128)
    z32 = np.asarray(a32(jnp.asarray(x), jnp.asarray(y)))
    z64 = np.asarray(a64(jnp.asarray(x), jnp.asarray(y)))
    scale = np.max(np.abs(z64))
    assert np.max(np.abs(z32 - z64)) / scale < 1e-3
