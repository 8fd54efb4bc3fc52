"""Mesh mode: the runtime drives the multi-chip ShardedCpiPipeline,
batching CPI windows over the cpi axis and emitting every product per CPI
(SURVEY §2.5 made reachable from the production CLI)."""

import json

import jax
import numpy as np
import pytest

from blah2_tpu.config import config_from_dict
from blah2_tpu.parallel.sharded import ShardedCpiPipeline
from blah2_tpu.runtime.radar import RadarRuntime


def _cfg():
    return config_from_dict({
        "capture": {"fs": 40_000, "fc": 100_000_000, "type": "Synthetic"},
        "process": {
            "data": {"cpi": 0.1, "buffer": 8},
            "ambiguity": {"delayMin": -5, "delayMax": 40,
                          "dopplerMin": -50, "dopplerMax": 50},
            "clutter": {"enable": True, "delayMin": -5, "delayMax": 40},
            "detection": {"enable": True, "pfa": 1e-4, "nGuard": 1,
                          "nTrain": 4, "minDelay": 3, "minDoppler": 10,
                          "nCentroid": 4},
        },
    })


@pytest.fixture
def mesh():
    from blah2_tpu.parallel.mesh import make_radar_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    return make_radar_mesh(2, 4)


def test_mesh_runtime_emits_per_cpi_products(mesh):
    cfg = _cfg()
    rt = RadarRuntime(cfg, mesh=mesh)
    assert rt.cpi_batch == 2
    n = rt.n_samples

    rng = np.random.default_rng(5)
    xs, ys = [], []
    for _ in range(2):
        x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
            np.complex64)
        y = (2.0 * x + 0.05 * np.roll(x, 9)).astype(np.complex64)
        xs.append(x)
        ys.append(y)

    results = rt.process_cpi_batch(
        list(zip(xs, ys)), [1000, 1100])
    assert results is None  # deferred (production default): one batch behind
    results = rt._flush_pending_batch()
    assert len(results) == 2

    # Products must match the sharded pipeline called directly per window.
    ref_pipe = ShardedCpiPipeline(cfg, mesh)
    xj, yj = ref_pipe.shard_inputs(np.stack(xs), np.stack(ys))
    ref = ref_pipe(xj, yj)
    for i, emitted in enumerate(results):
        m = json.loads(emitted["map"])
        assert m["timestamp"] == [1000, 1100][i]
        got = np.asarray(m["data"], dtype=np.float64)
        want = np.asarray(ref.db_map)[i] - float(np.asarray(ref.noise_power)[i])
        # map JSON is dB-minus-noise rounded to 2 decimals
        np.testing.assert_allclose(got, want, atol=0.006)
        assert "detection" in emitted and "iqdata" in emitted


def test_mesh_runtime_loop_batches(mesh):
    cfg = _cfg()
    rt = RadarRuntime(cfg, mesh=mesh)
    n = rt.n_samples
    rng = np.random.default_rng(6)
    x = (rng.standard_normal(4 * n) + 1j * rng.standard_normal(4 * n)
         ).astype(np.complex64)
    rt.buffer1.push(x)
    rt.buffer2.push((2.0 * x).astype(np.complex64))

    seen = []
    rt._emit_orig = rt._emit

    def spy(product, payload, **kw):
        if product == "timestamp":
            seen.append(payload)
        rt._emit_orig(product, payload, **kw)

    rt._emit = spy
    rt.run(n_cpis=4, quiet=True)
    assert rt.n_cpis_done == 4
    assert len(seen) == 4  # one timestamp broadcast per CPI, batched 2+2


def test_mesh_transport_recycle_rebuilds_sharded(mesh):
    """recycle_transport on a mesh runtime must flush the deferred batch
    and rebuild the sharded pipeline on the fresh backend (the old Mesh
    binds dead device objects); the loop keeps producing."""
    import json

    cfg = _cfg()
    rt = RadarRuntime(cfg, mesh=mesh, staged_sample_every=0,
                      recycle_every_cpis=2)
    maps = []
    orig = rt._emit

    def spy(product, payload, **kw):
        if product == "map":
            maps.append(json.loads(payload))
        return orig(product, payload, **kw)

    rt._emit = spy
    n = cfg.n_samples
    rng = np.random.default_rng(5)
    for _ in range(4):
        x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
            np.complex64)
        rt.buffer1.push(x)
        rt.buffer2.push((2.0 * x).astype(np.complex64))
    old_sharded = rt.sharded
    rt.run(n_cpis=4, quiet=True)
    assert rt.sharded is not old_sharded  # rebuilt at the recycle point
    assert len(maps) == 4
    assert [m["timestamp"] for m in maps] == sorted(
        m["timestamp"] for m in maps)
