"""End-to-end runtime test: synthetic capture → CPI loop → API products."""

import json
import urllib.request

import numpy as np
import pytest

from blah2_tpu.config import load_config
from blah2_tpu.net.api import ApiServer
from blah2_tpu.runtime.radar import RadarRuntime

CONFIG = "config/config-synthetic.yml"


@pytest.fixture()
def synthetic_config():
    return load_config(CONFIG)


@pytest.fixture(scope="module")
def radar_products():
    cfg = load_config(CONFIG)
    # move ports to avoid collisions with any other instance
    cfg.network.api = 18300
    cfg.network.map = 18301
    cfg.network.detection = 18302
    cfg.network.track = 18303
    cfg.network.timestamp = 18400
    cfg.network.timing = 18401
    cfg.network.iqdata = 18402

    api = ApiServer(cfg)
    api.start(with_ingest=False)
    runtime = RadarRuntime(cfg, api_server=api)
    runtime.start_capture()
    runtime.run(n_cpis=3, quiet=True)
    # Determinism invariant: the synthetic source flow-controls
    # (push_pair_blocking), so the rings must never have overflowed and
    # the channels can never desynchronise — the run's products do not
    # depend on host load/scheduling. A nonzero counter here means the
    # pacing coupling regressed (the round-2 under-load flake).
    drops = (runtime.buffer1.dropped, runtime.buffer2.dropped)
    runtime.stop()

    def get(path):
        with urllib.request.urlopen(
            f"http://127.0.0.1:{cfg.network.api}{path}", timeout=5
        ) as r:
            return r.read().decode()

    products = {
        p: get(f"/api/{p}")
        for p in ("map", "detection", "tracker", "timestamp", "timing",
                  "iqdata", "config")
    }
    products["stash_map"] = get("/stash/map")
    products["stash_detection"] = get("/stash/detection")
    products["stash_timing"] = get("/stash/timing")
    products["stash_iqdata"] = get("/stash/iqdata")
    products["capture"] = get("/capture")
    api.stop()
    return cfg, products, drops


def test_no_ring_overflow_or_desync(radar_products):
    """The flow-controlled synthetic feed must never overflow the rings:
    drop counters are the desync invariant (asymmetric drops between the
    two rings would destroy channel alignment permanently)."""
    _, _, drops = radar_products
    assert drops == (0, 0)


def test_map_product(radar_products):
    cfg, p, _ = radar_products
    doc = json.loads(p["map"])
    assert doc["nRows"] > 0 and doc["nCols"] == 111
    assert len(doc["data"]) == doc["nRows"]
    # delay axis is in bistatic km after delay_bin_to_km
    assert doc["delay"][0] < 0 < doc["delay"][-1]
    assert doc["maxPower"] > 10  # the injected targets stand out


def test_detection_product(radar_products):
    cfg, p, _ = radar_products
    doc = json.loads(p["detection"])
    assert len(doc["delay"]) >= 1
    # detections reported in km: target at 40 bins ⇒ 40·(c/fs)/1000 ≈ 60 km
    km = 40 * 299792458 / cfg.capture.fs / 1000
    assert any(abs(d - km) < 5 for d in doc["delay"])


def test_tracker_product(radar_products):
    _, p, _ = radar_products
    doc = json.loads(p["tracker"])
    assert doc["n"] > 0
    assert "nActive" in doc and "data" in doc


def test_timing_and_timestamp(radar_products):
    _, p, _ = radar_products
    t = json.loads(p["timing"])
    assert t["nCpi"] == 3
    assert "cpi" in t and "ambiguity_processing" in t
    assert p["timestamp"].isdigit()


def test_iqdata_product(radar_products):
    _, p, _ = radar_products
    doc = json.loads(p["iqdata"])
    assert len(doc["spectrum"]) == len(doc["frequency"]) > 0


def test_config_endpoint(radar_products):
    cfg, p, _ = radar_products
    doc = json.loads(p["config"])
    assert doc["capture"]["fs"] == cfg.capture.fs


def test_stashes(radar_products):
    _, p, _ = radar_products
    maxhold = json.loads(p["stash_map"])
    assert maxhold["data"]
    det = json.loads(p["stash_detection"])
    assert len(det["delay"]) == len(det["timestamp"]) >= 1
    timing = json.loads(p["stash_timing"])
    assert len(timing["cpi"]) == 3
    iq = json.loads(p["stash_iqdata"])
    assert len(iq["spectrum"]) == 3  # 3 CPIs in the waterfall


def test_capture_toggle(radar_products):
    cfg, p, _ = radar_products
    assert p["capture"] == "false"


def test_replay_buffer1_no_deadlock(tmp_path):
    """Flow-control progress regression (r3): ``buffer: 1`` makes the ring
    exactly one CPI, and replay blocks exceed it. Two past deadlock modes:
    a fixed push quantum that can never fit, and feeding the rings
    sequentially (ring 1 fills and blocks while the consumer waits forever
    on untouched ring 2). push_pair_blocking must make progress with
    partial, interleaved pushes."""
    from blah2_tpu.capture.source import Source
    from blah2_tpu.config import config_from_dict

    fs, cpi = 200_000, 0.1
    n = int(fs * cpi)
    src = Source("RspDuo", fs, 204_640_000, path=str(tmp_path))
    fname = src.open_record_file()
    rng = np.random.default_rng(0)
    x = np.clip(rng.standard_normal(3 * n) * 300,
                -2047, 2047).astype(np.complex128)
    src.record(x, x)
    src.close_record_file()

    cfg = config_from_dict({
        "capture": {"fs": fs, "fc": 204_640_000,
                    "replay": {"state": True, "loop": True, "file": fname}},
        "process": {
            "data": {"cpi": cpi, "buffer": 1},
            "ambiguity": {"delayMin": -5, "delayMax": 40,
                          "dopplerMin": -100, "dopplerMax": 100},
            "clutter": {"enable": False},
            "detection": {"enable": False},
        },
    })
    rt = RadarRuntime(cfg)
    rt.start_capture()
    rt.run(n_cpis=4, quiet=True)
    rt.stop()
    assert rt.n_cpis_done == 4
    assert (rt.buffer1.dropped, rt.buffer2.dropped) == (0, 0)


class TestStagedTiming:
    def test_staged_timing_fills_all_reference_keys(self, synthetic_config):
        import json

        from blah2_tpu.runtime.radar import RadarRuntime

        rt = RadarRuntime(synthetic_config, staged_timing=True)
        rt.start_capture()
        try:
            rt.run(n_cpis=2, quiet=True)
        finally:
            rt.stop()
        doc = json.loads(rt.timing.to_json())
        # Reference stage names (`src/blah2.cpp:261-337`).
        for key in ("extract_buffer", "spectrum", "clutter_filter",
                    "ambiguity_processing", "detector", "tracker",
                    "output_radar_data", "cpi"):
            assert key in doc, key
            assert doc[key] >= 0.0

    def test_staged_matches_fused_products(self, synthetic_config):
        import numpy as np

        from blah2_tpu.dsp.pipeline import CpiPipeline
        from blah2_tpu.capture.synthetic import synthetic_cpi, TargetSpec

        cfg = synthetic_config
        pipe = CpiPipeline(cfg)
        x, y = synthetic_cpi(cfg.n_samples, cfg.capture.fs,
                             [TargetSpec(30, -50.0, 0.05)],
                             clutter_amplitude=2.0, noise_amplitude=1e-3,
                             seed=3)
        fused = pipe(x.astype(np.complex64), y.astype(np.complex64))
        staged = pipe.call_staged(x.astype(np.complex64),
                                  y.astype(np.complex64))
        np.testing.assert_allclose(np.asarray(fused.db_map),
                                   np.asarray(staged.db_map),
                                   rtol=0, atol=1e-3)
        np.testing.assert_array_equal(np.asarray(fused.detections.valid),
                                      np.asarray(staged.detections.valid))


def test_transport_recycle_mid_run(synthetic_config):
    """recycle_every_cpis tears the backend down between CPIs and the loop
    keeps producing identical-shape products afterwards (the RSS-bound
    mitigation for leaky remote transports, SOAK_r03)."""
    cfg = synthetic_config
    rt = RadarRuntime(cfg, staged_sample_every=0, recycle_every_cpis=2)
    maps = []
    orig = rt._emit

    def spy(product, payload, **kw):
        if product == "map":
            maps.append(json.loads(payload))
        return orig(product, payload, **kw)

    rt._emit = spy
    rt.start_capture()
    try:
        rt.run(n_cpis=5, quiet=True)
    finally:
        rt.stop()
    assert len(maps) == 5  # recycle flushes the deferred CPI, loses none
    shapes = {(m["nRows"], m["nCols"]) for m in maps}
    assert len(shapes) == 1
    stamps = [m["timestamp"] for m in maps]
    assert stamps == sorted(stamps)
