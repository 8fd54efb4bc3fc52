"""CFAR + centroid + interpolation chain tests."""

import jax.numpy as jnp
import numpy as np

from blah2_tpu.dsp.ambiguity import map_metrics
from blah2_tpu.dsp.cfar import CfarDetector
from blah2_tpu.dsp.centroid import CentroidFilter
from blah2_tpu.dsp.interpolate import PeakInterpolator
from tests.reference_impl import cfar_reference

N_ROWS, N_COLS = 21, 40
DELAY_AXIS = np.arange(-5, N_COLS - 5)
DOPPLER_AXIS = np.linspace(-50, 50, N_ROWS)


def _map_with_peaks(peaks, floor=1.0, seed=0):
    rng = np.random.default_rng(seed)
    z = floor * (rng.standard_normal((N_ROWS, N_COLS))
                 + 1j * rng.standard_normal((N_ROWS, N_COLS))) / np.sqrt(2)
    for (r, c, amp) in peaks:
        z[r, c] += amp
    return z


def _detector(**kw):
    args = dict(pfa=1e-4, n_guard=2, n_train=4, min_delay=3, min_doppler=10,
                delay_axis=DELAY_AXIS, doppler_axis=DOPPLER_AXIS,
                max_detections=64)
    args.update(kw)
    return CfarDetector(**args)


def test_single_target_detected():
    z = _map_with_peaks([(15, 20, 40.0)], seed=1)
    _, noise, _ = map_metrics(jnp.asarray(z))
    det = _detector()(jnp.asarray(z), noise)
    valid = np.asarray(det.valid)
    assert valid.sum() >= 1
    rows = np.asarray(det.row)[valid]
    cols = np.asarray(det.col)[valid]
    assert (15, 20) in set(zip(rows, cols))


def test_parity_vs_reference_impl():
    z = _map_with_peaks([(15, 20, 30.0), (4, 10, 25.0), (18, 35, 20.0)],
                        seed=2)
    _, noise, _ = map_metrics(jnp.asarray(z))
    noise_f = float(noise)

    det = _detector()(jnp.asarray(z), noise)
    valid = np.asarray(det.valid)
    got = list(zip(np.asarray(det.delay)[valid],
                   np.asarray(det.doppler)[valid],
                   np.asarray(det.snr)[valid]))

    want_d, want_f, want_s = cfar_reference(
        z, DELAY_AXIS, DOPPLER_AXIS, noise_f,
        pfa=1e-4, n_guard=2, n_train=4, min_delay=3, min_doppler=10)
    want = list(zip(want_d, want_f, want_s))

    assert len(got) == len(want)
    for (gd, gf, gs), (wd, wf, ws) in zip(got, want):
        assert gd == wd
        np.testing.assert_allclose(gf, wf, rtol=1e-5)
        np.testing.assert_allclose(gs, ws, rtol=1e-4, atol=1e-4)


def test_min_delay_min_doppler_masks():
    # Peaks inside the masked regions must not be reported.
    z = _map_with_peaks([(10, 5, 50.0),   # doppler row 10 → 0 Hz < 10
                         (15, 2, 50.0)],  # delay −3 < 3
                        seed=3)
    _, noise, _ = map_metrics(jnp.asarray(z))
    det = _detector()(jnp.asarray(z), noise)
    valid = np.asarray(det.valid)
    rows = np.asarray(det.row)[valid]
    cols = np.asarray(det.col)[valid]
    assert (10, 5) not in set(zip(rows, cols))
    assert (15, 2) not in set(zip(rows, cols))


def test_centroid_suppresses_sidelobes():
    det = _detector()
    z = _map_with_peaks([(15, 20, 40.0), (15, 21, 20.0), (16, 20, 15.0)],
                        seed=4)
    _, noise, _ = map_metrics(jnp.asarray(z))
    d = det(jnp.asarray(z), noise)
    cen = CentroidFilter(n_delay=3, n_doppler=3,
                         doppler_resolution=DOPPLER_AXIS[1] - DOPPLER_AXIS[0])
    d2 = cen(d)
    valid = np.asarray(d2.valid)
    kept = set(zip(np.asarray(d2.row)[valid], np.asarray(d2.col)[valid]))
    assert (15, 20) in kept
    assert (15, 21) not in kept
    assert (16, 20) not in kept


def test_interpolation_refines_peak():
    # Build a smooth parabolic peak in dB around (10, 20) offset by +0.3 bins.
    r0, c0 = 10.0, 20.3
    rr, cc = np.meshgrid(np.arange(N_ROWS), np.arange(N_COLS), indexing="ij")
    db = 30.0 - 5.0 * ((cc - c0) ** 2 + (rr - r0) ** 2)
    z = 10 ** (db / 20.0) + 0j  # |z| gives the dB map above
    zj = jnp.asarray(z)
    _, noise, _ = map_metrics(zj)
    det = _detector(min_doppler=0)(zj, noise)
    valid = np.asarray(det.valid)
    cols = np.asarray(det.col)[valid]
    assert 20 in cols
    interp = PeakInterpolator(True, True,
                              DOPPLER_AXIS[1] - DOPPLER_AXIS[0],
                              N_ROWS, N_COLS)
    db_rel = jnp.asarray(10 * np.log10(np.abs(z))) - noise
    d2 = interp(det, db_rel)
    valid2 = np.asarray(d2.valid)
    idx = np.nonzero(valid2 & (np.asarray(d2.col) == 20)
                     & (np.asarray(d2.row) == 10))[0]
    assert idx.size == 1
    got_delay = float(np.asarray(d2.delay)[idx[0]])
    # delay axis starts at −5, so cell 20 is delay 15; true peak at 15.3
    np.testing.assert_allclose(got_delay, 15.3, atol=0.05)


def test_interpolation_drops_boundary():
    z = _map_with_peaks([(15, 0, 40.0), (15, N_COLS - 1, 40.0)], seed=5)
    zj = jnp.asarray(z)
    _, noise, _ = map_metrics(zj)
    det = _detector(min_delay=-10)(zj, noise)
    interp = PeakInterpolator(True, True, 1.0, N_ROWS, N_COLS)
    d2 = interp(det, jnp.asarray(10 * np.log10(np.abs(z))) - noise)
    valid = np.asarray(d2.valid)
    cols = np.asarray(d2.col)[valid]
    assert 0 not in cols and (N_COLS - 1) not in cols


# -- OS-CFAR (comparison-tier alternative detector) --------------------------

def _os_detector(**kw):
    from blah2_tpu.dsp.cfar import OsCfarDetector

    args = dict(pfa=1e-4, n_guard=2, n_train=4, min_delay=3, min_doppler=10,
                delay_axis=DELAY_AXIS, doppler_axis=DOPPLER_AXIS,
                max_detections=64)
    args.update(kw)
    return OsCfarDetector(**args)


def test_os_alpha_monte_carlo_pfa():
    """os_cfar_alpha solves the exact exponential-background Pfa: the
    simulated false-alarm rate of a k-th-order-statistic threshold must
    match the requested pfa."""
    from blah2_tpu.dsp.cfar import os_cfar_alpha

    rng = np.random.default_rng(3)
    n, k, pfa = 8, 6, 0.05
    alpha = os_cfar_alpha(pfa, n, k)
    m = 400_000
    train = rng.exponential(size=(m, n))
    cell = rng.exponential(size=m)
    kth = np.sort(train, axis=1)[:, k - 1]
    rate = float(np.mean(cell > alpha * kth))
    np.testing.assert_allclose(rate, pfa, rtol=0.08)


def test_os_parity_vs_reference_impl():
    from tests.reference_impl import os_cfar_reference

    z = _map_with_peaks([(15, 20, 30.0), (4, 10, 25.0), (18, 35, 20.0)],
                        seed=2)
    _, noise, _ = map_metrics(jnp.asarray(z))
    det = _os_detector()(jnp.asarray(z), noise)
    valid = np.asarray(det.valid)
    got = list(zip(np.asarray(det.delay)[valid],
                   np.asarray(det.doppler)[valid],
                   np.asarray(det.snr)[valid]))

    want_d, want_f, want_s = os_cfar_reference(
        z, DELAY_AXIS, DOPPLER_AXIS, float(noise),
        pfa=1e-4, n_guard=2, n_train=4, min_delay=3, min_doppler=10)
    want = list(zip(want_d, want_f, want_s))

    assert len(got) == len(want) > 0
    for (gd, gf, gs), (wd, wf, ws) in zip(got, want):
        assert gd == wd
        np.testing.assert_allclose(gf, wf, rtol=1e-5)
        np.testing.assert_allclose(gs, ws, rtol=1e-4, atol=1e-4)


def test_os_detects_target_ca_masks():
    """The multi-target masking scenario OS-CFAR exists for: a strong
    interferer inside the train window inflates CA's mean-based threshold
    and masks the weaker target; the 3/4-rank order statistic ignores
    isolated train-cell spikes and keeps the detection."""
    r, c = 15, 20
    # Interferer 4 cells away: outside the guards (2), inside the train
    # window (offsets 3..6).
    z = _map_with_peaks([(r, c, 6.0), (r, c + 4, 60.0)], seed=4)
    zj = jnp.asarray(z)
    _, noise, _ = map_metrics(zj)

    ca = _detector()(zj, noise)
    ca_hits = set(zip(np.asarray(ca.row)[np.asarray(ca.valid)],
                      np.asarray(ca.col)[np.asarray(ca.valid)]))
    os_ = _os_detector()(zj, noise)
    os_hits = set(zip(np.asarray(os_.row)[np.asarray(os_.valid)],
                      np.asarray(os_.col)[np.asarray(os_.valid)]))

    assert (r, c) not in ca_hits, "scene too easy: CA sees the target too"
    assert (r, c) in os_hits
    assert (r, c + 4) in os_hits  # the interferer itself still detected


def test_os_cfar_through_pipeline_config():
    """process.detection.cfar: 'os' selects OS-CFAR in the fused pipeline
    (XLA chain; the fused Pallas kernel implements CA only)."""
    import jax

    from blah2_tpu.config import config_from_dict
    from blah2_tpu.dsp.cfar import OsCfarDetector
    from blah2_tpu.dsp.pipeline import CpiPipeline
    from blah2_tpu.capture.synthetic import synthetic_cpi, TargetSpec

    cfg = config_from_dict({
        "capture": {"fs": 50_000, "fc": 100e6},
        "process": {
            "data": {"cpi": 0.2},
            "ambiguity": {"delayMin": -5, "delayMax": 40,
                          "dopplerMin": -100, "dopplerMax": 100},
            "clutter": {"enable": True, "delayMin": -5, "delayMax": 20},
            "detection": {"enable": True, "pfa": 1e-5, "nGuard": 2,
                          "nTrain": 6, "minDelay": 5, "minDoppler": 10,
                          "nCentroid": 6, "cfar": "os"},
        },
    })
    pipe = CpiPipeline(cfg)
    assert isinstance(pipe.cfar, OsCfarDetector)
    assert pipe.fused_detector is None  # fused kernel is CA-only
    x, y = synthetic_cpi(cfg.n_samples, cfg.capture.fs,
                         [TargetSpec(12, 55.0, 0.1)],
                         clutter_amplitude=2.0, noise_amplitude=1e-3,
                         seed=11)
    out = pipe(jax.numpy.asarray(x, jax.numpy.complex64),
               jax.numpy.asarray(y, jax.numpy.complex64))
    valid = np.asarray(out.detections.valid)
    cols = np.asarray(out.detections.col)[valid]
    delays = np.asarray(out.detections.delay)[valid]
    assert valid.sum() >= 1
    assert any(abs(d - 12) <= 1 for d in delays), (delays, cols)
