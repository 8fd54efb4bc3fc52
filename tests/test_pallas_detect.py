"""Parity tests for the fused Pallas metrics+CFAR+centroid kernel.

The kernel (ops/pallas_detect.py) runs in interpreter mode on CPU; every
case checks it against the reference-parity XLA chain
(map_metrics → CfarDetector → CentroidFilter) that is itself validated
against the pure-NumPy reference implementation in tests/reference_impl.py.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from blah2_tpu.dsp.ambiguity import map_metrics
from blah2_tpu.dsp.cfar import CfarDetector
from blah2_tpu.dsp.centroid import CentroidFilter
from blah2_tpu.ops.pallas_detect import FusedDetector


def _axes(nr, nc, delay_min=-10, doppler_step=2.0):
    delay_axis = np.arange(delay_min, delay_min + nc, dtype=np.int32)
    half = nr // 2
    doppler_axis = doppler_step * np.arange(-half, nr - half, dtype=np.float64)
    return delay_axis, doppler_axis


def _mk_map(nr, nc, seed=0, targets=()):
    rng = np.random.default_rng(seed)
    z = (rng.standard_normal((nr, nc)) + 1j * rng.standard_normal((nr, nc)))
    for (r, c, amp) in targets:
        z[r, c] += amp
    return jnp.asarray(z.astype(np.complex64))


CASES = [
    # (nr, nc, pfa, guard, train, min_delay, min_doppler, n_centroid, cpi_cfg)
    (31, 53, 1e-3, 2, 6, 5, 6.0, 6, 0.5),
    (16, 40, 1e-2, 1, 3, 0, 0.0, 3, 0.25),
    (9, 130, 1e-4, 0, 4, 2, 4.0, 1, 1.0),
    (64, 64, 1e-3, 3, 5, 5, 2.0, 4, 0.125),
]


@pytest.mark.parametrize("case", CASES)
def test_fused_matches_xla_chain(case):
    nr, nc, pfa, g, t, min_delay, min_doppler, n_cent, cpi = case
    delay_axis, doppler_axis = _axes(nr, nc)
    res_cfg = 1.0 / cpi

    targets = [(nr // 2 + 2, nc // 2, 30.0), (nr // 2 + 2, nc // 2 + 1, 18.0),
               (3, 7, 25.0), (nr - 2, nc - 3, 22.0)]
    targets = [(r, c, a) for (r, c, a) in targets if r < nr and c < nc]
    z = _mk_map(nr, nc, seed=nr * nc, targets=targets)

    cfar = CfarDetector(pfa, g, t, min_delay, min_doppler,
                        delay_axis, doppler_axis, max_detections=128)
    centroid = CentroidFilter(n_cent, n_cent, res_cfg)
    db_x, noise_x, maxp_x = map_metrics(z)
    det_x = centroid(cfar(z, noise_x))

    fused = FusedDetector(pfa, g, t, min_delay, min_doppler, n_cent, n_cent,
                          res_cfg, delay_axis, doppler_axis,
                          max_detections=128, interpret=True)
    db_f, noise_f, maxp_f, det_f = fused(z)

    np.testing.assert_allclose(np.asarray(db_f), np.asarray(db_x),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(float(noise_f), float(noise_x), atol=1e-4)
    np.testing.assert_allclose(float(maxp_f), float(maxp_x), atol=1e-4)

    kx = np.asarray(det_x.valid)
    kf = np.asarray(det_f.valid)
    assert int(det_f.count) == int(np.sum(kf))
    # Same surviving cells (row-major extraction order ⇒ same slots).
    np.testing.assert_array_equal(
        np.asarray(det_x.row)[kx], np.asarray(det_f.row)[kf])
    np.testing.assert_array_equal(
        np.asarray(det_x.col)[kx], np.asarray(det_f.col)[kf])
    np.testing.assert_allclose(
        np.asarray(det_x.snr)[kx], np.asarray(det_f.snr)[kf], atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(det_x.delay)[kx], np.asarray(det_f.delay)[kf], atol=0)
    np.testing.assert_allclose(
        np.asarray(det_x.doppler)[kx], np.asarray(det_f.doppler)[kf],
        atol=1e-4)


def test_fused_tie_both_kept():
    # Two equal-power hits inside each other's centroid window (delta=5 <
    # n_centroid=6) but beyond CFAR train reach (> nGuard+nTrain=4):
    # strict-inequality centroid keeps both (Centroid.cpp strict <).
    nr, nc = 16, 40
    delay_axis, doppler_axis = _axes(nr, nc)
    z = np.full((nr, nc), 0.05 + 0j, dtype=np.complex64)
    z[8, 20] = 50.0
    z[8, 25] = 50.0
    fused = FusedDetector(1e-2, 1, 3, 0, 0.0, 6, 6, 2.0,
                          delay_axis, doppler_axis, interpret=True)
    _, _, _, det = fused(jnp.asarray(z))
    keep = np.asarray(det.valid)
    cols = sorted(np.asarray(det.col)[keep].tolist())
    assert cols == [20, 25]


def test_fused_in_pipeline_matches_xla_pipeline():
    """Full CpiPipeline with use_pallas=True (interpret) vs use_pallas=False."""
    from blah2_tpu.config import config_from_dict
    from blah2_tpu.dsp.pipeline import CpiPipeline

    cfg = config_from_dict({
        "capture": {"fs": 40_000, "fc": 100_000_000},
        "process": {
            "data": {"cpi": 0.5, "buffer": 2},
            "ambiguity": {"delayMin": -5, "delayMax": 40,
                          "dopplerMin": -50, "dopplerMax": 50},
            "clutter": {"enable": True, "delayMin": -5, "delayMax": 40},
            "detection": {"enable": True, "pfa": 1e-3, "nGuard": 2,
                          "nTrain": 6, "minDelay": 3, "minDoppler": 10,
                          "nCentroid": 6},
        },
    })
    rng = np.random.default_rng(7)
    n = cfg.n_samples
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64)
    y = (0.2 * np.roll(x, 9) + 3.0 * x
         + 0.01 * (rng.standard_normal(n)
                   + 1j * rng.standard_normal(n))).astype(np.complex64)

    out_x = CpiPipeline(cfg, use_pallas=False)(x, y)
    out_f = CpiPipeline(cfg, use_pallas=True)(x, y)

    np.testing.assert_allclose(np.asarray(out_f.db_map),
                               np.asarray(out_x.db_map), atol=2e-4)
    np.testing.assert_allclose(float(out_f.noise_power),
                               float(out_x.noise_power), atol=1e-4)
    kx = np.asarray(out_x.detections.valid)
    kf = np.asarray(out_f.detections.valid)
    np.testing.assert_array_equal(np.asarray(out_x.detections.row)[kx],
                                  np.asarray(out_f.detections.row)[kf])
    np.testing.assert_allclose(np.asarray(out_x.detections.snr)[kx],
                               np.asarray(out_f.detections.snr)[kf],
                               atol=2e-3)
