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
