"""Sharded pipeline on the virtual 8-device CPU mesh vs single-device parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blah2_tpu.capture.synthetic import TargetSpec, synthetic_cpi
from blah2_tpu.config import config_from_dict
from blah2_tpu.dsp.pipeline import CpiPipeline
from blah2_tpu.parallel.mesh import make_radar_mesh
from blah2_tpu.parallel.sharded import ShardedCpiPipeline


def _config(fs=80_000, cpi=0.2, detection=True, clutter=True):
    return config_from_dict({
        "capture": {"fs": fs, "fc": 204_640_000},
        "process": {
            "data": {"cpi": cpi, "buffer": 2},
            "ambiguity": {"delayMin": -5, "delayMax": 60,
                          "dopplerMin": -100, "dopplerMax": 100},
            "clutter": {"enable": clutter, "delayMin": -5, "delayMax": 30},
            "detection": {"enable": detection, "pfa": 1e-5, "nGuard": 2,
                          "nTrain": 6, "minDelay": 5, "minDoppler": 15,
                          "nCentroid": 6},
        },
    })


def _batch(cfg, b=2, seed=0):
    xs, ys = [], []
    for k in range(b):
        x, y = synthetic_cpi(
            cfg.n_samples, cfg.capture.fs,
            [TargetSpec(20, -44.0, 0.1)],
            clutter_amplitude=2.0, noise_amplitude=1e-3, seed=seed + k)
        xs.append(x)
        ys.append(y)
    return np.stack(xs), np.stack(ys)


def test_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4), (8, 1)])
def test_sharded_matches_single_device(mesh_shape):
    cfg = _config()
    xb, yb = _batch(cfg, b=mesh_shape[0] if mesh_shape[0] > 1 else 2)

    mesh = make_radar_mesh(*mesh_shape)
    sp = ShardedCpiPipeline(cfg, mesh, dtype=jnp.complex128)
    out = sp(*sp.shard_inputs(xb, yb))

    # The sharded pipeline computes linear (zero-extended) clutter
    # correlations; compare against the single-device linear mode.
    single = CpiPipeline(cfg, dtype=jnp.complex128, clutter_mode="linear")
    for i in range(xb.shape[0]):
        ref = single(jnp.asarray(xb[i]), jnp.asarray(yb[i]))
        np.testing.assert_allclose(np.asarray(out.db_map)[i],
                                   np.asarray(ref.db_map),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(float(out.noise_power[i]),
                                   float(ref.noise_power), atol=1e-8)
        np.testing.assert_allclose(np.asarray(out.spectrum_db)[i],
                                   np.asarray(ref.spectrum_db),
                                   rtol=1e-6, atol=1e-6)
        # detection sets agree
        v_s = np.asarray(out.detections.valid)[i]
        v_r = np.asarray(ref.detections.valid)
        got = set(zip(np.asarray(out.detections.row)[i][v_s],
                      np.asarray(out.detections.col)[i][v_s]))
        want = set(zip(np.asarray(ref.detections.row)[v_r],
                       np.asarray(ref.detections.col)[v_r]))
        assert got == want
        assert bool(out.clutter_ok[i]) == bool(ref.clutter_ok)


def test_sharded_target_found():
    cfg = _config()
    xb, yb = _batch(cfg, b=2, seed=5)
    mesh = make_radar_mesh(1, 8)
    sp = ShardedCpiPipeline(cfg, mesh)
    out = sp(*sp.shard_inputs(xb, yb))
    for i in range(2):
        v = np.asarray(out.detections.valid)[i]
        delays = np.asarray(out.detections.delay)[i][v]
        assert np.any(np.abs(delays - 20) < 1.0)


def test_sharded_detection_disabled():
    cfg = _config(detection=False)
    xb, yb = _batch(cfg, b=2)
    mesh = make_radar_mesh(2, 4)
    sp = ShardedCpiPipeline(cfg, mesh)
    out = sp(*sp.shard_inputs(xb, yb))
    assert out.detections.delay.shape == (2, 0)


@pytest.mark.parametrize("row_shard", [True, False])
def test_row_shard_layouts_match_single_device(row_shard):
    """The psum_scatter row-sharded Doppler/detection layout (VERDICT r1
    #7) and the replicated psum layout must produce identical products;
    'auto' picks by rows-per-rank, this pins both branches explicitly."""
    cfg = _config()
    xb, yb = _batch(cfg, b=2, seed=11)
    mesh = make_radar_mesh(2, 4)
    sp = ShardedCpiPipeline(cfg, mesh, dtype=jnp.complex128,
                            row_shard=row_shard)
    assert sp._row_shard is row_shard
    out = sp(*sp.shard_inputs(xb, yb))
    single = CpiPipeline(cfg, dtype=jnp.complex128, clutter_mode="linear")
    for i in range(2):
        ref = single(jnp.asarray(xb[i]), jnp.asarray(yb[i]))
        np.testing.assert_allclose(np.asarray(out.db_map)[i],
                                   np.asarray(ref.db_map),
                                   rtol=1e-6, atol=1e-6)
        v_s = np.asarray(out.detections.valid)[i]
        v_r = np.asarray(ref.detections.valid)
        got = set(zip(np.asarray(out.detections.row)[i][v_s],
                      np.asarray(out.detections.col)[i][v_s]))
        want = set(zip(np.asarray(ref.detections.row)[v_r],
                       np.asarray(ref.detections.col)[v_r]))
        assert got == want
