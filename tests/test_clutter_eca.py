"""Alternative clutter cancellers (ECA-B, block NLMS) — the comparison
tier's subject matter (reference `test/README.md` declares the tier but
ships nothing)."""

import jax.numpy as jnp
import numpy as np
import pytest

from blah2_tpu.capture.synthetic import TargetSpec, synthetic_cpi
from blah2_tpu.config import config_from_dict
from blah2_tpu.dsp.clutter import WienerHopfFilter
from blah2_tpu.dsp.clutter_eca import (
    EcaBFilter, NlmsClutterFilter, make_clutter_filter)


def _ramp_clutter_scene(n, fs, seed=3):
    """Clutter whose complex gain drifts across the CPI (what a single
    full-CPI weight vector cannot cancel)."""
    rng = np.random.default_rng(seed)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) / np.sqrt(2)
    t = np.arange(n) / fs
    gain = (2.0 + 1.5 * np.sin(2 * np.pi * 1.7 * t / t[-1])) * \
        np.exp(1j * np.pi * (t / t[-1]) ** 2)
    d = 5
    xd = np.zeros_like(x)
    xd[d:] = x[:-d]
    y = gain * x + 0.4 * gain * xd + 1e-3 * (
        rng.standard_normal(n) + 1j * rng.standard_normal(n)) / np.sqrt(2)
    return x, y


def _residual_db(y_before, y_after, cut=64):
    before = float(np.mean(np.abs(np.asarray(y_before)[cut:]) ** 2))
    after = float(np.mean(np.abs(np.asarray(y_after)[cut:]) ** 2))
    return 10 * np.log10(before / after)


def _exact_ls_oracle(x, y, delay_min, delay_max, n_batches):
    """Per-segment exact covariance-method LS in plain NumPy: the oracle
    EcaBFilter must match (x_shift = 0 outside the CPI)."""
    n = len(x)
    nb = delay_max - delay_min
    xs = np.asarray(_shift_np(x, delay_min))
    L = -(-n // n_batches)
    pad = n_batches * L - n
    xs_p = np.pad(xs, (0, pad))
    y_p = np.pad(np.asarray(y), (0, pad))
    out = y_p.copy()
    for s in range(n_batches):
        t0 = s * L
        t = np.arange(t0, t0 + L)
        cols = []
        for k in range(nb):
            idx = t - k
            cols.append(np.where(idx >= 0, xs_p[np.clip(idx, 0, None)], 0))
        X = np.stack(cols, axis=1)
        w, *_ = np.linalg.lstsq(X, y_p[t], rcond=None)
        out[t] = y_p[t] - X @ w
    return out[:n]


def _shift_np(x, s):
    out = np.zeros_like(np.asarray(x))
    if s > 0:
        out[s:] = x[:-s]
    elif s < 0:
        out[:s] = x[-s:]
    else:
        out[:] = x
    return out


@pytest.mark.parametrize("n_batches", [1, 4])
def test_ecab_matches_exact_ls_oracle(n_batches):
    n, fs = 4_000, 10_000
    x, y = synthetic_cpi(n, fs, [], clutter_amplitude=3.0,
                         noise_amplitude=1e-3, seed=9)
    eca = EcaBFilter(-3, 12, n, n_batches=n_batches, diag_load=0.0,
                     dtype=jnp.complex128)
    y_e, ok = eca(jnp.asarray(x), jnp.asarray(y))
    assert bool(ok)
    oracle = _exact_ls_oracle(x, y, -3, 12, n_batches)
    np.testing.assert_allclose(np.asarray(y_e), oracle, rtol=0, atol=1e-8)


def test_ecab_single_batch_close_to_wiener_linear():
    """B=1 solves the same normal equations as the Wiener 'linear' mode up
    to O(nb/n) windowing (covariance vs autocorrelation method), so the
    two cancellers agree on the achieved suppression."""
    n, fs = 4_000, 10_000
    x, y = synthetic_cpi(n, fs, [], clutter_amplitude=3.0,
                         noise_amplitude=1e-3, seed=9)
    wiener = WienerHopfFilter(-3, 12, n, dtype=jnp.complex128, mode="linear")
    eca1 = EcaBFilter(-3, 12, n, n_batches=1, diag_load=0.0,
                      dtype=jnp.complex128)
    y_w, ok_w = wiener(jnp.asarray(x), jnp.asarray(y))
    y_e, ok_e = eca1(jnp.asarray(x), jnp.asarray(y))
    assert bool(ok_w) and bool(ok_e)
    supp_w = _residual_db(y, y_w)
    supp_e = _residual_db(y, y_e)
    assert abs(supp_w - supp_e) < 1.0
    assert supp_e > 25.0


def test_ecab_tracks_time_varying_clutter():
    # Piecewise-constant weights track the drifting gain only as segments
    # shrink: the *exact* per-segment LS ceiling on this scene is ~19.7 dB
    # at B=16 and ~31.8 dB at B=64 (measured with np.linalg.lstsq), so the
    # assertion below exercises both the B-scaling and that the
    # implementation sits at the exact-LS ceiling rather than the 10-25 dB
    # lower Toeplitz-approximation plateau.
    n, fs = 16_384, 10_000
    x, y = _ramp_clutter_scene(n, fs)
    wiener = WienerHopfFilter(-2, 14, n, dtype=jnp.complex128, mode="linear")
    y_w, _ = wiener(jnp.asarray(x), jnp.asarray(y))
    supp_w = _residual_db(y, y_w)

    eca16 = EcaBFilter(-2, 14, n, n_batches=16, dtype=jnp.complex128,
                       diag_load=1e-6)
    y_16, ok16 = eca16(jnp.asarray(x), jnp.asarray(y))
    assert bool(ok16)
    supp_16 = _residual_db(y, y_16)
    assert supp_16 > supp_w + 10.0
    assert supp_16 > 18.0

    eca64 = EcaBFilter(-2, 14, n, n_batches=64, dtype=jnp.complex128,
                       diag_load=1e-6)
    y_64, ok64 = eca64(jnp.asarray(x), jnp.asarray(y))
    assert bool(ok64)
    supp_64 = _residual_db(y, y_64)
    assert supp_64 > supp_16 + 8.0
    assert supp_64 > 30.0


def test_nlms_converges_on_stationary_clutter():
    n, fs = 32_768, 10_000
    x, y = synthetic_cpi(n, fs, [], clutter_amplitude=3.0,
                         noise_amplitude=1e-3, seed=5)
    nlms = NlmsClutterFilter(-2, 14, n, dtype=jnp.complex128)
    y_f, ok = nlms(jnp.asarray(x), jnp.asarray(y))
    assert bool(ok)
    # Score the converged half only (NLMS needs blocks to adapt).
    half = n // 2
    before = float(np.mean(np.abs(y[half:]) ** 2))
    after = float(np.mean(np.abs(np.asarray(y_f)[half:]) ** 2))
    assert 10 * np.log10(before / after) > 20.0


def test_nlms_preserves_target_energy():
    n, fs = 32_768, 10_000
    # A fast target is outside the canceller's clutter subspace; its
    # energy must survive.
    x, y = synthetic_cpi(n, fs, [], clutter_amplitude=0.0,
                         noise_amplitude=0.0, seed=7)
    t = np.arange(n) / fs
    d = 9
    xd = np.zeros_like(x)
    xd[d:] = x[:-d]
    tgt = 0.05 * xd * np.exp(2j * np.pi * 800.0 * t)
    y = y * 0 + tgt
    nlms = NlmsClutterFilter(-2, 14, n, dtype=jnp.complex128)
    y_f, _ = nlms(jnp.asarray(x), jnp.asarray(y))
    kept = float(np.mean(np.abs(np.asarray(y_f)[n // 2:]) ** 2))
    orig = float(np.mean(np.abs(tgt[n // 2:]) ** 2))
    assert kept > 0.7 * orig


@pytest.mark.parametrize("kind,cls", [
    ("wiener", WienerHopfFilter),
    ("eca-b", EcaBFilter),
    ("nlms", NlmsClutterFilter),
])
def test_factory_and_config_plumbing(kind, cls):
    cfg = config_from_dict({
        "capture": {"fs": 40_000, "fc": 100e6},
        "process": {
            "data": {"cpi": 0.1, "buffer": 2},
            "clutter": {"enable": True, "delayMin": -2, "delayMax": 14,
                        "filter": kind, "nBatches": 4},
        },
    })
    assert cfg.process.clutter.filter == kind
    assert cfg.process.clutter.n_batches == 4
    f = make_clutter_filter(cfg.process.clutter, cfg.n_samples)
    assert isinstance(f, cls)
    if isinstance(f, EcaBFilter):
        assert f.n_batches == 4


@pytest.mark.parametrize("kind", ["eca-b", "nlms"])
def test_pipeline_end_to_end_with_alternative_canceller(kind):
    from blah2_tpu.dsp.pipeline import CpiPipeline

    cfg = config_from_dict({
        "capture": {"fs": 40_000, "fc": 100e6},
        "process": {
            "data": {"cpi": 0.2, "buffer": 2},
            "ambiguity": {"delayMin": -5, "delayMax": 40,
                          "dopplerMin": -200, "dopplerMax": 200},
            "clutter": {"enable": True, "delayMin": -5, "delayMax": 20,
                        "filter": kind, "nBatches": 4},
            "detection": {"enable": True, "pfa": 1e-5, "nGuard": 2,
                          "nTrain": 6, "minDelay": 5, "minDoppler": 15,
                          "nCentroid": 6},
        },
    })
    x, y = synthetic_cpi(cfg.n_samples, cfg.capture.fs,
                         [TargetSpec(12, 55.0, 0.08)],
                         clutter_amplitude=2.0, noise_amplitude=1e-3, seed=1)
    pipe = CpiPipeline(cfg, use_pallas=False)
    out = pipe(x, y)
    assert bool(out.clutter_ok)
    det = out.detections
    cnt = int(det.count)
    assert cnt >= 1
    delays = np.asarray(det.delay)[np.asarray(det.valid)]
    dopplers = np.asarray(det.doppler)[np.asarray(det.valid)]
    assert np.any((np.abs(delays - 12) <= 1.5) &
                  (np.abs(dopplers - 55.0) <= 7.0))
