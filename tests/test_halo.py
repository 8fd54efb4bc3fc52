"""Halo-exchange backends: Pallas RDMA vs ppermute on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from blah2_tpu.capture.synthetic import TargetSpec, synthetic_cpi
from blah2_tpu.config import config_from_dict
from blah2_tpu.parallel.halo import shift_from_next, shift_from_prev
from blah2_tpu.parallel.mesh import make_radar_mesh
from blah2_tpu.parallel.sharded import ShardedCpiPipeline


@pytest.fixture(scope="module")
def mesh1d():
    return jax.make_mesh((8,), ("pulse",))


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.complex64])
@pytest.mark.parametrize("direction", ["next", "prev"])
def test_pallas_halo_matches_ppermute(mesh1d, direction, dtype):
    n_dev, count, blk = 8, 7, 64
    rng = np.random.default_rng(3)
    v = rng.standard_normal(n_dev * blk)
    if jnp.issubdtype(dtype, jnp.complexfloating):
        v = v + 1j * rng.standard_normal(n_dev * blk)
    v = jnp.asarray(v.astype(np.dtype(dtype)))
    vs = jax.device_put(v, NamedSharding(mesh1d, P("pulse")))

    fn = shift_from_next if direction == "next" else shift_from_prev

    def run(backend):
        def body(x):
            kw = dict(backend=backend)
            if backend == "pallas":
                kw["interpret"] = True
            return fn(x, count, "pulse", **kw)
        return np.asarray(jax.jit(jax.shard_map(
            body, mesh=mesh1d, in_specs=P("pulse"), out_specs=P("pulse"),
            check_vma=False,
        ))(vs))

    np.testing.assert_allclose(run("pallas"), run("ppermute"), atol=0)


def test_overlap_save_fir_with_rdma_halo(mesh1d):
    """Distributed causal FIR over a 1-D pulse mesh: the left-halo exchange
    runs through the RDMA kernel; result matches a single-host convolution
    (the exact communication pattern of the sharded clutter filter)."""
    n_dev, blk, n_taps = 8, 128, 9
    rng = np.random.default_rng(11)
    x = rng.standard_normal(n_dev * blk).astype(np.float32)
    w = rng.standard_normal(n_taps).astype(np.float32)
    expected = np.convolve(x, w)[: x.size]

    def body(x_loc):
        halo = shift_from_prev(x_loc, n_taps - 1, "pulse",
                               backend="pallas", interpret=True)
        ext = jnp.concatenate([halo, x_loc])
        full = jnp.convolve(ext, jnp.asarray(w))
        return full[n_taps - 1 : n_taps - 1 + blk]

    out = jax.jit(jax.shard_map(
        body, mesh=mesh1d, in_specs=P("pulse"), out_specs=P("pulse"),
        check_vma=False,
    ))(jax.device_put(jnp.asarray(x), NamedSharding(mesh1d, P("pulse"))))
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-4)


@pytest.mark.parametrize("direction", ["next", "prev"])
def test_pallas_halo_2axis_mesh(direction):
    """The RDMA halo on the production 2-axis (cpi, pulse) mesh shape:
    the TPU interpret mode simulates the remote DMAs per cpi group
    (`pltpu.InterpretParams`); output must match ppermute exactly."""
    mesh = make_radar_mesh(2, 4)
    n_cpi, n_pulse, count, blk = 2, 4, 5, 32
    rng = np.random.default_rng(7)
    v = rng.standard_normal((n_cpi, n_pulse * blk)).astype(np.float32)
    vs = jax.device_put(jnp.asarray(v),
                        NamedSharding(mesh, P("cpi", "pulse")))
    fn = shift_from_next if direction == "next" else shift_from_prev

    def run(backend):
        def body(x):
            kw = dict(backend=backend)
            if backend == "pallas":
                kw.update(interpret=True, n_mesh_axes=2)
            return fn(x[0], count, "pulse", **kw)[None]
        return np.asarray(jax.jit(jax.shard_map(
            body, mesh=mesh, in_specs=P("cpi", "pulse"),
            out_specs=P("cpi", "pulse"), check_vma=False,
        ))(vs))

    np.testing.assert_allclose(run("pallas"), run("ppermute"), atol=0)


def test_sharded_pipeline_pallas_backend_2axis():
    """Full sharded pipeline on the production 2-axis mesh with the RDMA
    halo backend (interpreted): products must match the ppermute backend
    bit-for-bit — the halo payloads are identical, only the transport
    differs."""
    cfg = config_from_dict({
        "capture": {"fs": 80_000, "fc": 204_640_000},
        "process": {
            "data": {"cpi": 0.2, "buffer": 2},
            "ambiguity": {"delayMin": -5, "delayMax": 60,
                          "dopplerMin": -100, "dopplerMax": 100},
            "clutter": {"enable": True, "delayMin": -5, "delayMax": 30},
            "detection": {"enable": False},
        },
    })
    x, y = synthetic_cpi(cfg.n_samples, cfg.capture.fs,
                         [TargetSpec(20, -44.0, 0.1)],
                         clutter_amplitude=2.0, noise_amplitude=1e-3, seed=5)
    xb, yb = np.stack([x, x]), np.stack([y, y])
    mesh = make_radar_mesh(2, 4)
    outs = {}
    for backend in ("ppermute", "pallas"):
        sp = ShardedCpiPipeline(cfg, mesh, halo_backend=backend)
        outs[backend] = sp(*sp.shard_inputs(xb, yb))
    np.testing.assert_allclose(np.asarray(outs["pallas"].db_map),
                               np.asarray(outs["ppermute"].db_map),
                               atol=1e-5)
    assert bool(np.all(np.asarray(outs["pallas"].clutter_ok)))


def test_sharded_fused_detect_matches_xla(mesh1d):
    """Opt-in fused Pallas detection in the sharded pipeline (interpret
    mode, vmapped over the cpi axis) matches the XLA detect chain."""
    del mesh1d  # unrelated fixture; keep module-level mesh alive
    cfg = config_from_dict({
        "capture": {"fs": 80_000, "fc": 204_640_000},
        "process": {
            "data": {"cpi": 0.2, "buffer": 2},
            "ambiguity": {"delayMin": -5, "delayMax": 60,
                          "dopplerMin": -100, "dopplerMax": 100},
            "clutter": {"enable": True, "delayMin": -5, "delayMax": 30},
            "detection": {"enable": True, "pfa": 1e-5, "nGuard": 2,
                          "nTrain": 6, "minDelay": 5, "minDoppler": 15,
                          "nCentroid": 6},
        },
    })
    x, y = synthetic_cpi(cfg.n_samples, cfg.capture.fs,
                         [TargetSpec(20, -44.0, 0.1)],
                         clutter_amplitude=2.0, noise_amplitude=1e-3, seed=9)
    xb, yb = np.stack([x, x]), np.stack([y, y])
    mesh = make_radar_mesh(2, 4)

    outs = {}
    for fused in (False, True):
        sp = ShardedCpiPipeline(cfg, mesh, use_pallas_detect=fused)
        outs[fused] = sp(*sp.shard_inputs(xb, yb))

    a, b = outs[False], outs[True]
    np.testing.assert_allclose(np.asarray(a.db_map), np.asarray(b.db_map),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(a.noise_power),
                               np.asarray(b.noise_power), atol=1e-4)
    # Slot packing differs (the XLA path invalidates centroid-suppressed
    # slots in place; the fused path suppresses before extraction): compare
    # the surviving detections, per CPI, in scan order.
    for i in range(np.asarray(a.db_map).shape[0]):
        va = np.asarray(a.detections.valid)[i]
        vb = np.asarray(b.detections.valid)[i]
        np.testing.assert_array_equal(np.asarray(a.detections.row)[i][va],
                                      np.asarray(b.detections.row)[i][vb])
        np.testing.assert_array_equal(np.asarray(a.detections.col)[i][va],
                                      np.asarray(b.detections.col)[i][vb])
        np.testing.assert_allclose(np.asarray(a.detections.snr)[i][va],
                                   np.asarray(b.detections.snr)[i][vb],
                                   atol=1e-3)
