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
