"""Data-model JSON wire contracts vs reference `src/data/*.cpp`."""

import json

import numpy as np

from blah2_tpu.data.ddmap import DelayDopplerMap
from blah2_tpu.data.detection import Detection
from blah2_tpu.data.timing import Timing
from blah2_tpu.data.track import TrackState, TrackStore
from blah2_tpu.utils import jsonfmt


def test_map_json_contract():
    z = np.array([[1.0 + 0j, 10.0 + 0j], [100.0 + 0j, 1.0 + 0j]])
    m = DelayDopplerMap(z, delay=[-1, 0], doppler=[-10.0, 10.0])
    m.set_metrics()
    doc = json.loads(m.to_json(1234))
    assert list(doc.keys()) == [
        "timestamp", "nRows", "nCols", "noisePower", "maxPower",
        "delay", "doppler", "data",
    ]
    assert doc["timestamp"] == 1234
    assert doc["nRows"] == 2 and doc["nCols"] == 2
    # noise = mean(0,10,20,0) = 7.5 dB; max = 20 - 7.5 = 12.5
    assert abs(doc["noisePower"] - 7.5) < 1e-9
    assert abs(doc["maxPower"] - 12.5) < 1e-9
    # data entries are dB minus noise
    assert abs(doc["data"][1][0] - 12.5) < 1e-9


def test_map_delay_km():
    z = np.ones((1, 2), dtype=complex)
    m = DelayDopplerMap(z, delay=[0, 1], doppler=[0.0])
    m.set_metrics()
    j = m.to_json(0)
    doc = json.loads(m.delay_bin_to_km(j, fs=2_000_000))
    # 1 bin at 2 MHz = (c/fs)/1000 km ≈ 0.15 km (`Map.cpp:166-185`)
    assert abs(doc["delay"][1] - 0.15) < 0.005


def test_map_from_db():
    db = np.array([[0.0, 10.0]])
    m = DelayDopplerMap(None, delay=[0, 1], doppler=[0.0], db_data=db)
    m.set_metrics()
    assert abs(m.noise_power - 5.0) < 1e-9
    assert abs(m.max_power - 5.0) < 1e-9


def test_detection_json():
    d = Detection([5, 10], [-20.0, 30.0], [12.345, 8.0])
    doc = json.loads(d.to_json(99))
    assert doc == {"timestamp": 99, "delay": [5.0, 10.0],
                   "doppler": [-20.0, 30.0], "snr": [12.35, 8.0]}
    km = json.loads(d.delay_bin_to_km(d.to_json(99), fs=2_000_000))
    assert abs(km["delay"][0] - 5 * 0.149896229) < 0.005


def test_save_append(tmp_path):
    path = str(tmp_path / "out.map")
    assert jsonfmt.append_json_array('{"a":1}', path)
    assert jsonfmt.append_json_array('{"b":2}', path)
    doc = json.loads(open(path).read())
    assert doc == [{"a": 1}, {"b": 2}]


def test_track_store_json():
    s = TrackStore()
    rec = s.add((10.0, -20.0, 12.0))
    assert rec.id == "0000"
    assert rec.state == TrackState.TENTATIVE
    # Tentative tracks are hidden from JSON (`Track.cpp:182`).
    doc = json.loads(s.to_json(5))
    assert doc["n"] == 1 and doc["nTentative"] == 1 and doc["data"] == []

    rec.states.append(TrackState.ASSOCIATED)
    rec.associate((10.5, -20.0, 12.0))
    doc = json.loads(s.to_json(6))
    assert doc["nAssociated"] == 1
    assert doc["data"][0]["id"] == "0000"
    assert doc["data"][0]["state"] == "ASSOCIATED"
    assert doc["data"][0]["delay"] == 10.5
    assert doc["data"][0]["associated_delay"] == [10.0, 10.5]


def test_track_promote():
    s = TrackStore()
    rec = s.add((1.0, 2.0, 3.0))
    for _ in range(4):
        rec.states.append(TrackState.ASSOCIATED)
    s.promote(rec, m=3, n=5)
    assert rec.state == TrackState.ACTIVE


def test_timing_json():
    t = Timing(1000)
    t.update(3500, [1.5, 2.5], ["spectrum", "cpi"])
    doc = json.loads(t.to_json())
    assert doc["timestamp"] == 3500
    assert doc["nCpi"] == 1
    assert abs(doc["uptime_s"] - 2.5) < 1e-9
    assert doc["spectrum"] == 1.5 and doc["cpi"] == 2.5
