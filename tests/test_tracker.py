"""Tracker: kinematic-predict golden value, association, M-of-N life cycle."""

import numpy as np

from blah2_tpu.constants import SPEED_OF_LIGHT
from blah2_tpu.data.detection import Detection
from blah2_tpu.data.track import TrackState
from blah2_tpu.tracker import Tracker

FS = 2_000_000
FC = 204_640_000
RANGE_RES = SPEED_OF_LIGHT / FS
LAMBDA = SPEED_OF_LIGHT / FC


def _tracker(cpi=1.0, m=3, n=5, n_delete=4, max_acc=10.0):
    return Tracker(m, n, n_delete, cpi, max_acc, RANGE_RES, LAMBDA)


def test_predict_golden():
    """Golden per `TestTracker.cpp:74-83`: delay 10 bins, Doppler −20 Hz,
    acc 5 Hz/s, T=1 s → delay 9.821 bins, Doppler −15 Hz."""
    trk = _tracker()
    pred = trk.predict((10.0, -20.0, 0.0), 5.0, 1.0)
    np.testing.assert_allclose(pred[0], 9.821, atol=5e-4)
    np.testing.assert_allclose(pred[1], -15.0, atol=1e-9)


def test_initiation_per_acceleration_hypothesis():
    trk = _tracker(cpi=1.0, max_acc=3.0)
    # acc grid: resolution 1/cpi² = 1, span ±3 → 7 hypotheses
    assert len(trk.acc_init) == 7
    trk.process(Detection([10.0], [-20.0], [12.0]), 0)
    assert len(trk.store) == 7
    assert all(t.state == TrackState.TENTATIVE for t in trk.store.tracks)


def test_association_and_promotion():
    trk = _tracker(cpi=1.0, m=3, n=5, max_acc=0.5)
    # constant-velocity target: doppler −20 Hz ⇒ delay rate −20·λ/rangeRes
    delay, doppler = 100.0, -20.0
    drate = doppler * LAMBDA / RANGE_RES
    t_ms = 0
    for k in range(6):
        trk.process(Detection([delay + drate * k], [doppler], [15.0]), t_ms)
        t_ms += 1000
    states = {t.state for t in trk.store.tracks}
    assert TrackState.ACTIVE in states
    active = [t for t in trk.store.tracks if t.state == TrackState.ACTIVE]
    assert len(active[0].associated) >= 4


def test_missed_detections_coast_then_delete():
    trk = _tracker(cpi=1.0, m=2, n=3, n_delete=2, max_acc=0.5)
    delay, doppler = 100.0, -20.0
    drate = doppler * LAMBDA / RANGE_RES
    t_ms = 0
    for k in range(4):
        trk.process(Detection([delay + drate * k], [doppler], [15.0]), t_ms)
        t_ms += 1000
    assert any(t.state == TrackState.ACTIVE for t in trk.store.tracks)
    # now miss: empty detections
    trk.process(Detection(), t_ms)
    assert any(t.state == TrackState.COASTING for t in trk.store.tracks)
    for _ in range(3):
        t_ms += 1000
        trk.process(Detection(), t_ms)
    assert len(trk.store) == 0


def test_associated_detection_not_reinitiated():
    trk = _tracker(cpi=1.0, max_acc=0.5)
    trk.process(Detection([50.0], [10.0], [12.0]), 0)
    n0 = len(trk.store)
    drate = 10.0 * LAMBDA / RANGE_RES
    trk.process(Detection([50.0 + drate], [10.0], [12.0]), 1000)
    # the detection associated with an existing hypothesis ⇒ no new spawns
    assert len(trk.store) == n0


# -- alpha-beta smoothing (tracker.smooth, declared-but-TODO in the
# reference: `Tracker.h:7`, `config/config.yml:48`) ---------------------------

def _run_track(trk, meas, dt_ms=1000):
    """Feed per-CPI single-detection measurements; return the (delay,
    doppler) history of the surviving track."""
    hist = []
    for k, (d, f) in enumerate(meas):
        trk.process(Detection([d], [f], [15.0]), k * dt_ms)
        best = max(trk.store.tracks, key=lambda r: len(r.states))
        hist.append((best.current[0], best.current[1]))
    return np.asarray(hist)


def _noisy_cv_scene(n=40, seed=0):
    """Constant-velocity truth with measurement noise."""
    rng = np.random.default_rng(seed)
    doppler = -20.0
    drate = doppler * LAMBDA / RANGE_RES
    truth = np.asarray([(100.0 + drate * k, doppler) for k in range(n)])
    meas = truth + np.stack([rng.normal(0, 0.3, n),
                             rng.normal(0, 0.2, n)], axis=1)
    return truth, [tuple(m) for m in meas]


def test_smooth_none_keeps_raw_measurements():
    truth, meas = _noisy_cv_scene()
    trk = Tracker(3, 5, 4, 1.0, 0.5, RANGE_RES, LAMBDA, smooth="none")
    hist = _run_track(trk, meas)
    # Raw mode: associated track state IS the measurement.
    np.testing.assert_allclose(hist[-1], meas[-1], atol=1e-12)


def test_alpha_beta_smoothing_reduces_jitter():
    truth, meas = _noisy_cv_scene()
    raw = _run_track(
        Tracker(3, 5, 4, 1.0, 0.5, RANGE_RES, LAMBDA, smooth="none"), meas)
    sm = _run_track(
        Tracker(3, 5, 4, 1.0, 0.5, RANGE_RES, LAMBDA, smooth="alpha-beta"),
        meas)
    # Compare steady-state RMSE vs truth (skip the initiation transient).
    # Measured at the default gains (0.5, 0.25): delay ratio ~0.72,
    # Doppler ratio ~0.10 — assert with margin.
    e_raw = np.sqrt(np.mean((raw[10:, 0] - truth[10:, 0]) ** 2))
    e_sm = np.sqrt(np.mean((sm[10:, 0] - truth[10:, 0]) ** 2))
    assert e_sm < 0.85 * e_raw, (e_sm, e_raw)
    f_raw = np.sqrt(np.mean((raw[10:, 1] - truth[10:, 1]) ** 2))
    f_sm = np.sqrt(np.mean((sm[10:, 1] - truth[10:, 1]) ** 2))
    assert f_sm < 0.5 * f_raw, (f_sm, f_raw)


def test_alpha_beta_follows_accelerating_target():
    """Smoothing must not lag an accelerating target out of its own
    association gate: feed a constant-acceleration scene and require the
    track to stay associated and converge near the true Doppler."""
    n, acc = 30, 0.4  # Hz/s, within the ±0.5 init grid
    doppler0 = -20.0
    meas, delay = [], 100.0
    for k in range(n):
        doppler = doppler0 + acc * k
        meas.append((delay, doppler))
        delay += (doppler + 0.5 * acc) * LAMBDA / RANGE_RES
    trk = Tracker(3, 5, 4, 1.0, 0.5, RANGE_RES, LAMBDA, smooth="alpha-beta")
    hist = _run_track(trk, meas)
    assert abs(hist[-1][1] - meas[-1][1]) < 0.2  # Doppler tracked
    # One track, never coasting: the smoothed state stayed inside its
    # own association gate for the whole manoeuvre, and the Doppler-
    # residual gain converged the acceleration estimate to truth.
    assert len(trk.store) == 1
    best = trk.store.tracks[0]
    assert TrackState.COASTING not in best.states
    np.testing.assert_allclose(best.acceleration, acc, atol=0.02)


def test_smooth_config_validation():
    import pytest

    with pytest.raises(ValueError):
        Tracker(3, 5, 4, 1.0, 0.5, RANGE_RES, LAMBDA, smooth="bogus")
    with pytest.raises(ValueError):
        Tracker(3, 5, 4, 1.0, 0.5, RANGE_RES, LAMBDA,
                smooth="alpha-beta", smooth_alpha=0.0)
    with pytest.raises(ValueError):
        Tracker(3, 5, 4, 1.0, 0.5, RANGE_RES, LAMBDA,
                smooth="kalman", kalman_q=0.0)
    with pytest.raises(ValueError):
        Tracker(3, 5, 4, 1.0, 0.5, RANGE_RES, LAMBDA,
                smooth="kalman", kalman_r_delay=-1.0)


# -- Kalman smoothing (tracker.smooth: kalman, round 3) -----------------------

def test_kalman_smoothing_reduces_jitter():
    """Same constant-velocity noisy scene as the alpha-beta test: the KF
    must beat raw measurements on both axes (its gains shrink as the
    covariance converges, so late-track jitter rejection exceeds fixed
    alpha-beta gains)."""
    truth, meas = _noisy_cv_scene()
    raw = _run_track(
        Tracker(3, 5, 4, 1.0, 0.5, RANGE_RES, LAMBDA, smooth="none"), meas)
    kf = _run_track(
        Tracker(3, 5, 4, 1.0, 0.5, RANGE_RES, LAMBDA, smooth="kalman"),
        meas)
    e_raw = np.sqrt(np.mean((raw[10:, 0] - truth[10:, 0]) ** 2))
    e_kf = np.sqrt(np.mean((kf[10:, 0] - truth[10:, 0]) ** 2))
    assert e_kf < 0.8 * e_raw, (e_kf, e_raw)
    f_raw = np.sqrt(np.mean((raw[10:, 1] - truth[10:, 1]) ** 2))
    f_kf = np.sqrt(np.mean((kf[10:, 1] - truth[10:, 1]) ** 2))
    assert f_kf < 0.5 * f_raw, (f_kf, f_raw)


def test_kalman_follows_accelerating_target():
    """Constant-acceleration manoeuvre: the KF's accel state must
    converge to truth and the track must never coast (same harness as
    the alpha-beta manoeuvre test)."""
    n, acc = 30, 0.4
    doppler0 = -20.0
    meas, delay = [], 100.0
    for k in range(n):
        doppler = doppler0 + acc * k
        meas.append((delay, doppler))
        delay += (doppler + 0.5 * acc) * LAMBDA / RANGE_RES
    trk = Tracker(3, 5, 4, 1.0, 0.5, RANGE_RES, LAMBDA, smooth="kalman")
    hist = _run_track(trk, meas)
    assert abs(hist[-1][1] - meas[-1][1]) < 0.2
    assert len(trk.store) == 1
    best = trk.store.tracks[0]
    assert TrackState.COASTING not in best.states
    np.testing.assert_allclose(best.acceleration, acc, atol=0.05)
    # Covariance stayed symmetric positive-definite through the run.
    p = np.asarray(best.kf_p)
    np.testing.assert_allclose(p, p.T, atol=1e-12)
    assert np.all(np.linalg.eigvalsh(p) > 0)


def test_kalman_coast_propagates_covariance():
    """A missed CPI must grow the coasting track's covariance (the gate
    and gains then reflect the extra prediction uncertainty)."""
    trk = Tracker(3, 5, 8, 1.0, 0.5, RANGE_RES, LAMBDA, smooth="kalman")
    meas = [(100.0, -20.0), (100.0 - 20.0 * LAMBDA / RANGE_RES, -20.0)]
    trk.process(Detection([meas[0][0]], [meas[0][1]], [15.0]), 0)
    trk.process(Detection([meas[1][0]], [meas[1][1]], [15.0]), 1000)
    best = max(trk.store.tracks, key=lambda r: len(r.states))
    p_before = np.asarray(best.kf_p).copy()
    # Empty detection set: every track coasts.
    trk.process(Detection([], [], []), 2000)
    p_after = np.asarray(best.kf_p)
    assert np.trace(p_after) > np.trace(p_before)
