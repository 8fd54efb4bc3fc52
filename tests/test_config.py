"""Config schema: reference YAML files load unchanged (`config/config.yml`)."""

import os

import pytest

from blah2_tpu.config import config_from_dict, load_config

REFERENCE_CONFIG_DIR = "/root/reference/config"

SAMPLE = {
    "capture": {
        "fs": 2_000_000,
        "fc": 204_640_000,
        "device": {"type": "RspDuo", "agcSetPoint": -20},
        "replay": {"state": True, "loop": False, "file": "/tmp/x.rspduo"},
    },
    "process": {
        "data": {"cpi": 0.5, "buffer": 2, "overlap": 0},
        "ambiguity": {"delayMin": -10, "delayMax": 300,
                      "dopplerMin": -300, "dopplerMax": 300},
        "clutter": {"enable": True, "delayMin": -10, "delayMax": 300},
        "detection": {"enable": True, "pfa": 1e-5, "nGuard": 2, "nTrain": 6,
                      "minDelay": 5, "minDoppler": 15, "nCentroid": 6},
        "tracker": {"enable": True, "initiate": {"M": 3, "N": 5, "maxAcc": 10},
                    "delete": 10, "smooth": "none"},
    },
    "network": {"ip": "0.0.0.0",
                "ports": {"api": 3000, "map": 3001, "detection": 3002,
                          "track": 3003, "timestamp": 4000, "timing": 4001,
                          "iqdata": 4002, "config": 4003}},
    "save": {"iq": True, "map": False, "detection": False, "timing": False,
             "path": "/tmp/save/"},
}


def test_from_dict():
    cfg = config_from_dict(SAMPLE)
    assert cfg.capture.fs == 2_000_000
    assert cfg.capture.device_type == "RspDuo"
    assert cfg.capture.replay.state and not cfg.capture.replay.loop
    assert cfg.process.data.cpi == 0.5
    assert cfg.process.ambiguity.delay_max == 300
    assert cfg.process.detection.pfa == 1e-5
    assert cfg.process.tracker.m == 3 and cfg.process.tracker.n == 5
    assert cfg.network.map == 3001
    assert cfg.n_samples == 1_000_000
    assert cfg.buffer_samples == 2_000_000


def test_defaults():
    cfg = config_from_dict({})
    assert cfg.capture.fs == 2_000_000
    assert cfg.process.data.cpi == 0.75
    assert cfg.n_samples == 1_500_000


def test_site_config_exercises_non_default_ports_truth_save():
    """`config/config-site.yml` is the production-site variant (analog of
    the reference's live-instance `config/radar4.yml`): every network port
    is non-default, ADS-B truth is enabled, saving is on to a non-default
    absolute path, and the tracker runs Kalman smoothing — so the shipped
    config set exercises the port/truth/save plumbing, not only defaults."""
    cfg = load_config(os.path.join(os.path.dirname(__file__), os.pardir,
                                   "config", "config-site.yml"))
    assert cfg.network.api == 3100
    assert cfg.network.map == 3101 and cfg.network.track == 3103
    assert cfg.network.timestamp == 4100 and cfg.network.iqdata == 4102
    assert (cfg.truth or {}).get("adsb", {}).get("enabled") is True
    assert cfg.save.iq and cfg.save.detection and cfg.save.timing
    assert not cfg.save.map
    assert cfg.save.path == "/blah2/save/"
    assert cfg.process.tracker.enable
    assert cfg.process.tracker.smooth == "kalman"
    assert cfg.process.data.cpi == 0.5 and cfg.process.data.buffer == 1.5


@pytest.mark.skipif(not os.path.isdir(REFERENCE_CONFIG_DIR),
                    reason="reference configs not mounted")
@pytest.mark.parametrize("name", ["config.yml", "config-usrp.yml",
                                  "config-hackrf.yml", "config-kraken.yml",
                                  "radar4.yml"])
def test_reference_configs_load(name):
    path = os.path.join(REFERENCE_CONFIG_DIR, name)
    if not os.path.exists(path):
        pytest.skip(f"{name} absent")
    cfg = load_config(path)
    assert cfg.capture.fs > 0
    assert cfg.process.ambiguity.delay_max > cfg.process.ambiguity.delay_min
    assert cfg.network.api == 3000
