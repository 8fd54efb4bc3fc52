"""Stage enable flags: the pipeline and runtime restructure correctly with
clutter/detection/tracker disabled (the reference gates each stage on its
config flag in the hot loop, `src/blah2.cpp:268-296`)."""

import json

import numpy as np
import pytest

from blah2_tpu.config import config_from_dict
from blah2_tpu.dsp.pipeline import CpiPipeline
from blah2_tpu.runtime.radar import RadarRuntime


def _cfg(clutter=True, detection=True, tracker=True):
    d = {
        "capture": {"fs": 40_000, "fc": 100_000_000, "type": "Synthetic"},
        "process": {
            "data": {"cpi": 0.1, "buffer": 4},
            "ambiguity": {"delayMin": -5, "delayMax": 40,
                          "dopplerMin": -50, "dopplerMax": 50},
            "clutter": {"enable": clutter, "delayMin": -5, "delayMax": 40},
            "detection": {"enable": detection, "pfa": 1e-4, "nGuard": 1,
                          "nTrain": 4, "minDelay": 3, "minDoppler": 10,
                          "nCentroid": 4},
            "tracker": {"enable": tracker, "M": 3, "N": 5, "deleteAfter": 4,
                        "maxAccelerationInit": 2.0},
        },
    }
    return config_from_dict(d)


def _iq(n, seed=1):
    rng = np.random.default_rng(seed)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64)
    y = (2.0 * x + 0.05 * np.roll(x, 7)).astype(np.complex64)
    return x, y


@pytest.mark.parametrize("clutter,detection,tracker", [
    (False, True, True),
    (True, False, False),
    (False, False, False),
    (True, True, False),
])
def test_pipeline_and_runtime_with_stages_disabled(clutter, detection,
                                                   tracker):
    cfg = _cfg(clutter, detection, tracker)
    pipe = CpiPipeline(cfg)
    x, y = _iq(cfg.n_samples)
    out = pipe(x, y)
    assert np.isfinite(float(out.noise_power))
    assert np.asarray(out.db_map).shape == (pipe.ambiguity.n_doppler_bins,
                                            pipe.ambiguity.n_delay_bins)
    if not detection:
        assert np.asarray(out.detections.valid).size == 0
    if not clutter:
        assert bool(out.clutter_ok)  # trivially true when disabled

    rt = RadarRuntime(cfg)
    emitted = rt.process_one_cpi(x, y, timestamp_ms=99)
    assert "map" in emitted and "iqdata" in emitted
    assert ("detection" in emitted) == detection
    assert ("track" in emitted) == (detection and tracker)
    m = json.loads(emitted["map"])
    assert m["timestamp"] == 99


def test_tracker_without_detection_is_inert():
    # tracker.enable without detection.enable cannot run (no input);
    # the runtime must not construct it (`src/blah2.cpp:292` guards on
    # both flags).
    cfg = _cfg(clutter=True, detection=False, tracker=True)
    rt = RadarRuntime(cfg)
    assert rt.tracker is None
