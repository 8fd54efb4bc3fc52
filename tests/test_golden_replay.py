"""Functional golden test: record → int16-quad file → replay → CPI → map.

The reference sketches this tier (`test/README.md` "functional": IQ file →
expected delay-Doppler map) but commits no data file; its golden test
(`TestAmbiguity.cpp:147-178`) skips when `20231214-230611.rspduo` is absent.
Here the golden scene is generated deterministically (seeded synthetic,
int16-quantised to raw ADC counts), round-tripped through the real record
path (`Source.record`) and the real replay path (`FileReplaySource` →
`IqRingBuffer`s), and the full pipeline output is pinned to committed
golden values.

If this test fails after an intentional DSP change, rerun with ``-s`` —
the test prints the measured goldens — and update the constants.
"""

from __future__ import annotations

import numpy as np

from blah2_tpu.capture.replay import FileReplaySource
from blah2_tpu.capture.source import Source
from blah2_tpu.capture.synthetic import TargetSpec, synthetic_cpi
from blah2_tpu.config import config_from_dict
from blah2_tpu.data.iq import IqRingBuffer
from blah2_tpu.dsp.pipeline import CpiPipeline

FS = 200_000
CPI = 0.1

# Committed goldens (float32 pipeline, CPU). Positions are exact grid
# facts; powers get loose-but-meaningful windows so a real regression
# (wrong window, off-by-one lag, broken filter) trips them while FFT
# library jitter does not.
GOLDEN = {
    "n_detections": 2,
    # (delay bins, doppler Hz) after quadratic interpolation, atol 0.5/2.0
    # (truth: delay 40 @ −77 Hz, delay 61 @ +112 Hz; Doppler res 10 Hz)
    "targets": [(40.09, -78.62), (60.99, 110.78)],
    "noise_db": 79.99,      # atol 0.3
    "max_power_db": 20.74,  # atol 1.5
}


def _scene():
    cfg = config_from_dict({
        "capture": {"fs": FS, "fc": 204_640_000},
        "process": {
            "data": {"cpi": CPI, "buffer": 2},
            "ambiguity": {"delayMin": -10, "delayMax": 100,
                          "dopplerMin": -200, "dopplerMax": 200},
            "clutter": {"enable": True, "delayMin": -10, "delayMax": 100},
            "detection": {"enable": True, "pfa": 1e-5, "nGuard": 2,
                          "nTrain": 6, "minDelay": 5, "minDoppler": 15,
                          "nCentroid": 6},
        },
    })
    x, y = synthetic_cpi(
        cfg.n_samples, FS,
        [TargetSpec(40, -77.0, 0.05), TargetSpec(61, 112.0, 0.03)],
        clutter_amplitude=3.0, noise_amplitude=1e-3, seed=20231214)
    # Quantise to a realistic ADC scale — the record format is int16 counts.
    return cfg, (x * 4000.0), (y * 4000.0)


def test_record_replay_pipeline_golden(tmp_path):
    cfg, x, y = _scene()
    n = cfg.n_samples

    # Record through the real path.
    src = Source("RspDuo", FS, 204_640_000, path=str(tmp_path))
    fname = src.open_record_file()
    src.record(x, y)
    src.close_record_file()
    assert fname and fname.endswith(".rspduo.iq")

    # Replay through the real path into ring buffers.
    buf1 = IqRingBuffer(2 * n)
    buf2 = IqRingBuffer(2 * n)
    rep = FileReplaySource(FS, 204_640_000, fname, loop=False)
    rep.process(buf1, buf2)
    xr = buf1.pop(n, timeout=0)
    yr = buf2.pop(n, timeout=0)
    assert xr is not None and yr is not None

    # Quantisation is the only loss: int16 cast truncates toward zero.
    np.testing.assert_allclose(xr.real, np.trunc(np.real(x)), atol=0)

    out = CpiPipeline(cfg)(xr, yr)

    noise = float(out.noise_power)
    maxp = float(out.max_power)
    v = np.asarray(out.detections.valid)
    dets = sorted(zip(np.asarray(out.detections.delay)[v].tolist(),
                      np.asarray(out.detections.doppler)[v].tolist()))
    print(f"goldens: n={int(v.sum())} dets={dets} "
          f"noise={noise:.2f} maxp={maxp:.2f}")

    assert int(v.sum()) == GOLDEN["n_detections"]
    for (d_got, f_got), (d_exp, f_exp) in zip(dets, GOLDEN["targets"]):
        assert abs(d_got - d_exp) < 0.5, (d_got, d_exp)
        assert abs(f_got - f_exp) < 2.0, (f_got, f_exp)
    assert abs(noise - GOLDEN["noise_db"]) < 0.3
    assert abs(maxp - GOLDEN["max_power_db"]) < 1.5
