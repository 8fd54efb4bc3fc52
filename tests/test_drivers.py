"""SDR driver configuration/validation parity
(`src/capture/{rspduo,usrp,hackrf,kraken}` semantics)."""

import pytest

from blah2_tpu.capture.capture import factory_source
from blah2_tpu.capture.drivers import (
    DriverUnavailable,
    HackRfSource,
    KrakenSource,
    RspDuoSource,
    UsrpSource,
)


class TestRspDuo:
    def test_fs_decimation_table(self):
        # RspDuo.cpp:53-60 — master clock 2 MHz, lower rates decimate.
        for fs, dec in [(2_000_000, 1), (1_000_000, 2), (500_000, 4),
                        (250_000, 8), (125_000, 16), (62_500, 32)]:
            src = RspDuoSource(fs, 204_640_000)
            assert src.n_decimation == dec

    def test_if_bandwidth_table(self):
        assert RspDuoSource(2_000_000, 2e8).if_bandwidth_khz == 1536
        assert RspDuoSource(1_000_000, 2e8).if_bandwidth_khz == 600
        assert RspDuoSource(500_000, 2e8).if_bandwidth_khz == 300
        assert RspDuoSource(62_500, 2e8).if_bandwidth_khz == 200

    def test_invalid_fs_rejected(self):
        with pytest.raises(ValueError, match="fs"):
            RspDuoSource(48_000, 2e8)

    @pytest.mark.parametrize("kw,val", [
        ("agc_set_point", 5), ("agc_set_point", -80),
        ("bandwidth_number", 7),
        ("gain_reduction", (10, 40)), ("gain_reduction", (40, 60)),
        ("lna_state", 0), ("lna_state", 10),
    ])
    def test_validation_rejects(self, kw, val):
        # RspDuo.cpp:364-448 ranges.
        with pytest.raises(ValueError):
            RspDuoSource(2_000_000, 2e8, **{kw: val})

    def test_fc_range(self):
        with pytest.raises(ValueError):
            RspDuoSource(2_000_000, 3e9)


class TestHackRf:
    def test_valid_gain_sets(self):
        # HackRf.cpp:18-40: LNA {0,8,..,40}, VGA {0,2,..,62}.
        src = HackRfSource(2_000_000, 2e8, serial=["a", "b"],
                           gain_lna=[0, 40], gain_vga=[0, 62])
        assert src.gain_lna == [0, 40]

    @pytest.mark.parametrize("lna,vga", [
        ([7, 8], [30, 30]), ([48, 8], [30, 30]),
        ([8, 8], [3, 30]), ([8, 8], [30, 64]),
    ])
    def test_invalid_gains_rejected(self, lna, vga):
        with pytest.raises(ValueError):
            HackRfSource(2_000_000, 2e8, serial=["a", "b"],
                         gain_lna=lna, gain_vga=vga)

    def test_two_serials_required(self):
        with pytest.raises(ValueError):
            HackRfSource(2_000_000, 2e8, serial=["only-one"])


class TestKraken:
    def test_gain_rounds_up(self):
        # Kraken.cpp:35-48 — round up to the next valid tuner gain.
        valid = [0, 9, 14, 27, 37, 77, 87, 125, 144, 157, 166, 197,
                 207, 229, 254, 280, 297, 328, 338, 364, 372, 386,
                 402, 421, 434, 439, 445, 480, 496]
        assert KrakenSource.round_gains([15.0], valid) == [157]
        assert KrakenSource.round_gains([0.0], valid) == [0]
        assert KrakenSource.round_gains([2.8], valid) == [37]

    def test_gain_clamps_to_max(self):
        assert KrakenSource.round_gains([99.0], [0, 100, 496]) == [496]


class TestFactory:
    def test_factory_builds_all_types(self):
        cases = {
            "RspDuo": {"agcSetPoint": -20, "bandwidthNumber": 5,
                       "gainReduction": [50, 45], "lnaState": 1,
                       "dabNotch": False, "rfNotch": False},
            "Usrp": {"address": "localhost", "subdev": "A:A A:B",
                     "antenna": ["RX2", "RX2"], "gain": [20.0, 20.0]},
            "HackRF": {"serial": ["x", "y"], "gain_lna": [32, 32],
                       "gain_vga": [30, 30], "amp_enable": [False, False]},
            "Kraken": {"gain": [15.0, 15.0]},
        }
        for t, cfg in cases.items():
            src = factory_source(t, 2_000_000, 204_640_000, cfg)
            assert src.type_name == t

    def test_config_variants_load(self):
        import glob
        import os

        from blah2_tpu.config import load_config

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        for path in glob.glob(os.path.join(repo, "config", "*.yml")):
            cfg = load_config(path)
            if cfg.capture.device_type in ("RspDuo", "Usrp", "HackRF",
                                           "Kraken"):
                src = factory_source(cfg.capture.device_type,
                                     cfg.capture.fs, cfg.capture.fc,
                                     cfg.capture.device)
                assert src.fs == cfg.capture.fs

    def test_no_hardware_raises_driver_unavailable(self):
        src = factory_source("RspDuo", 2_000_000, 2e8, {})
        with pytest.raises(DriverUnavailable):
            src.process(None, None)


class TestUsrp:
    def test_stream_settings(self):
        src = UsrpSource(2_000_000, 2e8)
        # Usrp.cpp:55,71-73: fc32 host format, timed start +50 ms.
        assert src.HOST_FORMAT == "fc32"
        assert src.STREAM_START_DELAY_S == 0.05

    def test_needs_two_channels(self):
        with pytest.raises(ValueError):
            UsrpSource(2_000_000, 2e8, antenna=["RX2"])
        with pytest.raises(ValueError):
            UsrpSource(2_000_000, 2e8, gain=[20.0])
