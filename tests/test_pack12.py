"""Packed-12-bit wire format (ops.pack12): lossless round trip and
pipeline equivalence with the int16 quad path."""

import numpy as np
import pytest

from blah2_tpu.ops.pack12 import (MAX12, MIN12, pack12,
                                  pack12_quads, unpack12, unpack12_np)


def test_roundtrip_exact_full_range():
    rng = np.random.default_rng(0)
    v = rng.integers(MIN12, MAX12 + 1, size=20_000).astype(np.int16)
    p = pack12(v)
    assert p.dtype == np.uint8 and p.size == v.size * 3 // 2
    np.testing.assert_array_equal(unpack12_np(p, v.size), v.astype(np.int32))
    np.testing.assert_array_equal(np.asarray(unpack12(p, v.size)),
                                  v.astype(np.int32))


def test_extremes_and_zero():
    v = np.array([MIN12, MAX12, 0, -1, 1, MAX12], dtype=np.int16)
    np.testing.assert_array_equal(unpack12_np(pack12(v), v.size), v)


def test_out_of_range_rejected():
    with pytest.raises(ValueError, match="12-bit"):
        pack12(np.array([0, 4096], dtype=np.int16))
    with pytest.raises(ValueError, match="12-bit"):
        pack12(np.array([-2049, 0], dtype=np.int16))


def test_odd_count_rejected():
    with pytest.raises(ValueError, match="even"):
        pack12(np.array([1, 2, 3], dtype=np.int16))


def test_pipeline_quad12_matches_quad():
    """The packed entry must produce bit-identical products to the int16
    quad entry (unpack is exact; everything downstream is shared)."""
    from blah2_tpu.config import config_from_dict
    from blah2_tpu.dsp.pipeline import CpiPipeline
    from blah2_tpu.capture.synthetic import TargetSpec, synthetic_cpi

    cfg = config_from_dict({
        "capture": {"fs": 40_000, "fc": 100e6},
        "process": {
            "data": {"cpi": 0.2, "buffer": 2},
            "ambiguity": {"delayMin": -5, "delayMax": 40,
                          "dopplerMin": -100, "dopplerMax": 100},
            "clutter": {"enable": True, "delayMin": -5, "delayMax": 20},
            "detection": {"enable": True, "pfa": 1e-5, "nGuard": 2,
                          "nTrain": 6, "minDelay": 5, "minDoppler": 10,
                          "nCentroid": 6},
        },
    })
    pipe = CpiPipeline(cfg, use_pallas=False)
    n = cfg.n_samples
    x, y = synthetic_cpi(n, cfg.capture.fs, [TargetSpec(12, 30.0, 0.05)],
                         clutter_amplitude=2.0, noise_amplitude=1e-3, seed=2)
    quads = np.empty((n, 4), dtype=np.int16)
    quads[:, 0] = np.clip(x.real * 500, MIN12, MAX12)
    quads[:, 1] = np.clip(x.imag * 500, MIN12, MAX12)
    quads[:, 2] = np.clip(y.real * 500, MIN12, MAX12)
    quads[:, 3] = np.clip(y.imag * 500, MIN12, MAX12)

    out_quad = pipe.call_quad(quads)
    out_packed = pipe.call_quad12(pack12_quads(quads))
    np.testing.assert_array_equal(np.asarray(out_quad.db_map),
                                  np.asarray(out_packed.db_map))
    np.testing.assert_array_equal(np.asarray(out_quad.detections.valid),
                                  np.asarray(out_packed.detections.valid))
    v = np.asarray(out_packed.detections.valid)
    assert v.any()  # the target is detected through the packed path


def test_planar_layout_segments():
    """The round-4 planar layout: byte segments B0|B1|B2 with value j
    paired against value j+N/2 (pure contiguous device unpack)."""
    v = np.arange(-8, 8, dtype=np.int16)
    p = pack12(v)
    half = v.size // 2
    u = (v.astype(np.int32) + 2048).astype(np.uint32)
    np.testing.assert_array_equal(p[:half], u[:half] >> 4)
    np.testing.assert_array_equal(
        p[half:2 * half], ((u[:half] & 0xF) << 4) | (u[half:] >> 8))
    np.testing.assert_array_equal(p[2 * half:], u[half:] & 0xFF)


def test_quads_components_contiguous():
    from blah2_tpu.ops.pack12 import unpack12_quads

    rng = np.random.default_rng(3)
    n = 512
    quads = rng.integers(MIN12, MAX12 + 1, size=(n, 4)).astype(np.int16)
    xr, xi, yr, yi = (np.asarray(a)
                      for a in unpack12_quads(pack12_quads(quads), n))
    np.testing.assert_array_equal(xr, quads[:, 0])
    np.testing.assert_array_equal(xi, quads[:, 1])
    np.testing.assert_array_equal(yr, quads[:, 2])
    np.testing.assert_array_equal(yi, quads[:, 3])


def test_planes_components_contiguous():
    from blah2_tpu.ops.pack12 import pack12_planes, unpack_components

    rng = np.random.default_rng(4)
    m = 300
    planes = rng.integers(MIN12, MAX12 + 1, size=(m, 2)).astype(np.int16)
    re, im = (np.asarray(a)
              for a in unpack_components(pack12_planes(planes)))
    np.testing.assert_array_equal(re, planes[:, 0])
    np.testing.assert_array_equal(im, planes[:, 1])
