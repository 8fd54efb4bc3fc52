"""Chunked streaming ingest: the CPI crosses the host->device boundary as
fixed-size blocks shipped as capture delivers them (the analog of the
reference's capture thread t1 filling the rings concurrently with the
process thread t2, `src/blah2.cpp:137-139,245-260`), and the jitted program
concatenates on device. Must be bit-identical to the single-transfer path.
"""

import numpy as np
import pytest

from blah2_tpu.config import config_from_dict
from blah2_tpu.dsp.pipeline import CpiPipeline
from blah2_tpu.runtime.radar import RadarRuntime


def _cfg(overlap=0.0, detection=True):
    return config_from_dict({
        "capture": {"fs": 40_000, "fc": 100_000_000, "type": "Synthetic"},
        "process": {
            "data": {"cpi": 0.1, "buffer": 4, "overlap": overlap},
            "ambiguity": {"delayMin": -5, "delayMax": 40,
                          "dopplerMin": -50, "dopplerMax": 50},
            "clutter": {"enable": True, "delayMin": -5, "delayMax": 40},
            "detection": {"enable": detection, "pfa": 1e-4, "nGuard": 1,
                          "nTrain": 4, "minDelay": 3, "minDoppler": 10,
                          "nCentroid": 4},
        },
    })


def _chunk_col0(chunks):
    """First-plane values of possibly packed device chunks."""
    from blah2_tpu.ops.pack12 import unpack12_np

    cols = []
    for p in chunks:
        a = np.asarray(p)
        if a.dtype == np.uint8:  # packed-12-bit chunk (planar [re|im])
            v = unpack12_np(a, (a.size * 2) // 3)
            cols.append(v[: v.size // 2])
        else:
            cols.append(a[:, 0])
    return np.concatenate(cols)


def _iq(n, seed=0):
    rng = np.random.default_rng(seed)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64)
    y = (2.0 * x + 0.05 * np.roll(x, 11)).astype(np.complex64)
    return x, y


def test_call_chunks_matches_single_transfer():
    cfg = _cfg()
    pipe = CpiPipeline(cfg)
    n = cfg.n_samples
    x, y = _iq(n)
    ref = pipe(x, y)

    for n_chunks in (2, 4, 8):
        assert n % n_chunks == 0
        c = n // n_chunks
        xc = [pipe.to_planes(x[i * c:(i + 1) * c]) for i in range(n_chunks)]
        yc = [pipe.to_planes(y[i * c:(i + 1) * c]) for i in range(n_chunks)]
        out = pipe.call_chunks(xc, yc)
        np.testing.assert_array_equal(np.asarray(out.db_map),
                                      np.asarray(ref.db_map))
        np.testing.assert_array_equal(np.asarray(out.detections.valid),
                                      np.asarray(ref.detections.valid))
        np.testing.assert_array_equal(np.asarray(out.spectrum_db),
                                      np.asarray(ref.spectrum_db))


def test_runtime_chunked_matches_unchunked_products():
    cfg = _cfg()
    n = cfg.n_samples
    x, y = _iq(n, seed=3)

    rt_ref = RadarRuntime(cfg, ingest_chunks=1)
    ref = rt_ref.process_one_cpi(x, y, timestamp_ms=1234)

    rt = RadarRuntime(cfg, ingest_chunks=4)
    rt.buffer1.push(x)
    rt.buffer2.push(y)
    got = rt._extract_cpi_chunks(timeout=0.2)
    assert got is not None
    xc, yc = got
    assert len(xc) == 4 and len(yc) == 4
    out = rt.process_one_cpi_chunks(xc, yc, timestamp_ms=1234)
    assert out is None  # deferred fetch (production default): one behind
    out = rt._flush_pending()
    assert out["map"] == ref["map"]
    assert out["detection"] == ref["detection"]
    assert out["iqdata"] == ref["iqdata"]


def test_chunked_overlap_windows_slide():
    cfg = _cfg(overlap=0.5, detection=False)
    rt = RadarRuntime(cfg, ingest_chunks=4)
    n, adv = rt.n_samples, rt.advance
    assert adv == n // 2

    total = 4 * n
    ramp = (np.arange(total) + 0j).astype(np.complex64)
    rt.buffer1.push(ramp)
    rt.buffer2.push(ramp)

    starts = []
    for _ in range(3):
        got = rt._extract_cpi_chunks(timeout=0.2)
        assert got is not None
        xc, _ = got
        window = _chunk_col0(xc)
        assert window.shape == (n,)
        np.testing.assert_array_equal(window,
                                      np.arange(window[0], window[0] + n))
        starts.append(int(window[0]))
    assert starts == [0, adv, 2 * adv]


def test_chunked_timeout_keeps_partial_progress():
    cfg = _cfg(detection=False)
    rt = RadarRuntime(cfg, ingest_chunks=4)
    n = rt.n_samples
    c = n // 4
    ramp = (np.arange(2 * n) + 0j).astype(np.complex64)

    # Only half the window available: extraction times out but must keep
    # the popped chunks so no samples are lost.
    rt.buffer1.push(ramp[: 2 * c])
    rt.buffer2.push(ramp[: 2 * c])
    assert rt._extract_cpi_chunks(timeout=0.05) is None
    assert len(rt._pending_chunks) == 2

    rt.buffer1.push(ramp[2 * c: n])
    rt.buffer2.push(ramp[2 * c: n])
    got = rt._extract_cpi_chunks(timeout=0.2)
    assert got is not None
    xc, _ = got
    window = _chunk_col0(xc)
    np.testing.assert_array_equal(window, np.arange(n))


def test_chunked_overflow_resets_window():
    cfg = _cfg(overlap=0.5, detection=False)
    rt = RadarRuntime(cfg, ingest_chunks=4)
    n = rt.n_samples
    cap = rt.buffer1.capacity

    ramp = (np.arange(n) + 0j).astype(np.complex64)
    rt.buffer1.push(ramp)
    rt.buffer2.push(ramp)
    got = rt._extract_cpi_chunks(timeout=0.2)
    assert got is not None
    assert rt._retained_chunks  # overlap tail kept on device

    # Overflow the rings: the retained tail is no longer contiguous with
    # the next popped samples — the window must restart fresh.
    more = (np.arange(cap + n) + 5_000_000 + 0j).astype(np.complex64)
    rt.buffer1.push(more)
    rt.buffer2.push(more)
    assert rt.buffer1.dropped > 0
    got = rt._extract_cpi_chunks(timeout=0.2)
    assert got is not None
    xc, _ = got
    window = _chunk_col0(xc)
    # fresh contiguous window, not stitched across the seam
    np.testing.assert_array_equal(window,
                                  np.arange(window[0], window[0] + n))
    assert window[0] >= 5_000_000


def test_bad_chunk_geometry_rejected():
    cfg = _cfg()
    n = cfg.n_samples
    with pytest.raises(ValueError, match="divide"):
        RadarRuntime(cfg, ingest_chunks=7 if n % 7 else 11)


def test_integer_wire_dtype_products_match_float(tmp_path):
    """Replay streams carry exact int16 ADC counts, so shipping int16
    planes (half the f32 bytes) must produce identical products."""
    import numpy as np

    from blah2_tpu.capture.source import Source
    from blah2_tpu.capture.synthetic import TargetSpec, synthetic_cpi
    from blah2_tpu.config import config_from_dict
    from blah2_tpu.runtime.radar import RadarRuntime

    fs, cpi = 40_000, 0.2
    n = int(fs * cpi)
    x, y = synthetic_cpi(n, fs, [TargetSpec(12, 30.0, 0.05)],
                         clutter_amplitude=2.0, noise_amplitude=1e-3,
                         seed=4)
    src = Source("RspDuo", fs, 100e6, path=str(tmp_path))
    fname = src.open_record_file()
    src.record(x * 1000.0, y * 1000.0)
    src.close_record_file()

    def make_cfg():
        return config_from_dict({
            "capture": {"fs": fs, "fc": 100e6,
                        "replay": {"state": True, "loop": True,
                                   "file": fname}},
            "process": {
                "data": {"cpi": cpi, "buffer": 4},
                "ambiguity": {"delayMin": -5, "delayMax": 40,
                              "dopplerMin": -100, "dopplerMax": 100},
                "clutter": {"enable": True, "delayMin": -5, "delayMax": 20},
                "detection": {"enable": True, "pfa": 1e-5, "nGuard": 2,
                              "nTrain": 6, "minDelay": 5, "minDoppler": 10,
                              "nCentroid": 6},
            },
        })

    products = {}
    for label, force_float in (("wire", False), ("float", True)):
        rt = RadarRuntime(make_cfg(), staged_sample_every=0)
        if force_float:
            rt._wire_dtype = None
        else:
            assert rt._wire_dtype == np.int16
        captured = {}
        orig = rt._emit_products

        def cap(out, t0, _c=captured, _o=orig, **kw):
            e = _o(out, t0, **kw)
            _c.update(e)
            return e

        rt._emit_products = cap
        rt.start_capture()
        try:
            rt.run(n_cpis=1, quiet=True)
        finally:
            rt.stop()
        products[label] = captured

    import json

    m_wire = json.loads(products["wire"]["map"])
    m_float = json.loads(products["float"]["map"])
    assert m_wire["data"] == m_float["data"]
    d_wire = json.loads(products["wire"]["detection"])
    d_float = json.loads(products["float"]["detection"])
    for k in ("delay", "doppler", "snr"):
        assert d_wire[k] == d_float[k]


def test_pack12_chunks_products_match_float(tmp_path):
    """12-bit-range replay streams pack chunks to 25% fewer bytes; the
    products must be identical to the f32-plane path (unpack is exact)."""
    import json

    import numpy as np

    from blah2_tpu.capture.source import Source
    from blah2_tpu.capture.synthetic import TargetSpec, synthetic_cpi
    from blah2_tpu.config import config_from_dict
    from blah2_tpu.runtime.radar import RadarRuntime

    fs, cpi = 40_000, 0.2
    n = int(fs * cpi)
    x, y = synthetic_cpi(n, fs, [TargetSpec(12, 30.0, 0.05)],
                         clutter_amplitude=2.0, noise_amplitude=1e-3,
                         seed=4)
    src = Source("RspDuo", fs, 100e6, path=str(tmp_path))
    fname = src.open_record_file()
    # 12-bit ADC scaling: all counts within +/-2047.
    src.record(np.clip(x.real * 300, -2047, 2047) +
               1j * np.clip(x.imag * 300, -2047, 2047),
               np.clip(y.real * 300, -2047, 2047) +
               1j * np.clip(y.imag * 300, -2047, 2047))
    src.close_record_file()

    def make_cfg():
        return config_from_dict({
            "capture": {"fs": fs, "fc": 100e6,
                        "replay": {"state": True, "loop": True,
                                   "file": fname}},
            "process": {
                "data": {"cpi": cpi, "buffer": 4},
                "ambiguity": {"delayMin": -5, "delayMax": 40,
                              "dopplerMin": -100, "dopplerMax": 100},
                "clutter": {"enable": True, "delayMin": -5, "delayMax": 20},
                "detection": {"enable": True, "pfa": 1e-5, "nGuard": 2,
                              "nTrain": 6, "minDelay": 5, "minDoppler": 10,
                              "nCentroid": 6},
            },
        })

    products = {}
    for label, disable in (("packed", False), ("float", True)):
        rt = RadarRuntime(make_cfg(), staged_sample_every=0)
        if disable:
            rt._wire_dtype = None
            rt._pack12_ok = False
        captured = {}
        orig = rt._emit_products

        def cap(out, t0, _c=captured, _o=orig, **kw):
            e = _o(out, t0, **kw)
            _c.update(e)
            return e

        rt._emit_products = cap
        rt.start_capture()
        try:
            rt.run(n_cpis=1, quiet=True)
        finally:
            rt.stop()
        if not disable:
            # The packed path actually engaged (12-bit range held).
            assert rt._pack12_ok and rt._wire_dtype == np.int16
        products[label] = captured

    m_p = json.loads(products["packed"]["map"])
    m_f = json.loads(products["float"]["map"])
    assert m_p["data"] == m_f["data"]
    d_p = json.loads(products["packed"]["detection"])
    d_f = json.loads(products["float"]["detection"])
    for k in ("delay", "doppler", "snr"):
        assert d_p[k] == d_f[k]


def test_deferred_fetch_run_emits_every_cpi_in_order():
    """Production defer_fetch: run(n_cpis=N) must emit N product sets, one
    CPI behind during the loop with the last drained at the end, products
    in timestamp order, and each deferred timing doc carrying the explicit
    `latency` key (the deferral made visible) plus every reference key."""
    import json

    cfg = _cfg()
    rt = RadarRuntime(cfg, staged_sample_every=0)
    assert rt.defer_fetch and rt.ingest_chunks > 1
    n = cfg.n_samples
    emissions = []
    orig = rt._emit

    def spy(product, payload, **kw):
        emissions.append((product, payload))
        return orig(product, payload, **kw)

    rt._emit = spy
    for k in range(3):
        x, y = _iq(n, seed=10 + k)
        rt.buffer1.push(x)
        rt.buffer2.push(y)
    rt.run(n_cpis=3, quiet=True)

    stamps = [int(p) for prod, p in emissions if prod == "timestamp"]
    assert len(stamps) == 3
    assert stamps == sorted(stamps)
    maps = [json.loads(p) for prod, p in emissions if prod == "map"]
    assert [m["timestamp"] for m in maps] == stamps
    timings = [json.loads(p) for prod, p in emissions if prod == "timing"]
    assert len(timings) == 3 and timings[-1]["nCpi"] == 3
    for t in timings:
        for key in ("extract_buffer", "wire_transfer", "spectrum",
                    "clutter_filter", "ambiguity_processing", "detector",
                    "tracker", "output_radar_data", "latency", "cpi"):
            assert key in t, key
        assert t["latency"] >= 0.0


def test_deferred_fetch_products_match_synchronous():
    """Same bits either way: a deferred run's products equal a
    defer_fetch=False run's on identical input."""
    cfg = _cfg()
    n = cfg.n_samples
    x, y = _iq(n, seed=42)

    def products(defer):
        rt = RadarRuntime(cfg, staged_sample_every=0, defer_fetch=defer)
        rt.buffer1.push(x)
        rt.buffer2.push(y)
        got = rt._extract_cpi_chunks(timeout=0.5)
        assert got is not None
        out = rt.process_one_cpi_chunks(*got, timestamp_ms=99)
        if out is None:
            out = rt._flush_pending()
        return out

    a, b = products(True), products(False)
    assert a["map"] == b["map"]
    assert a["detection"] == b["detection"]
    assert a["iqdata"] == b["iqdata"]


def test_deferred_fetch_with_overlap_windows():
    """Deferred fetch must compose with sliding overlap windows: the
    retained device tail chunks belong to the NEXT window while the
    pending outputs belong to the previous — distinct state that must not
    interfere. 50% overlap, 4 CPIs: every emission present, in order."""
    import json

    cfg = _cfg(overlap=0.5)
    rt = RadarRuntime(cfg, staged_sample_every=0)
    assert rt.defer_fetch and rt.advance == cfg.n_samples // 2
    emissions = []
    orig = rt._emit

    def spy(product, payload, **kw):
        emissions.append((product, payload))
        return orig(product, payload, **kw)

    rt._emit = spy
    n = cfg.n_samples
    x, y = _iq(3 * n, seed=5)
    rt.buffer1.push(x)
    rt.buffer2.push(y)
    rt.run(n_cpis=4, quiet=True)
    maps = [json.loads(p) for prod, p in emissions if prod == "map"]
    assert len(maps) == 4
    stamps = [m["timestamp"] for m in maps]
    assert stamps == sorted(stamps)
