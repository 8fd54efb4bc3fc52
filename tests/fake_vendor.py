"""Fake vendor SDR runtimes for driver streaming tests.

Each fake stands in for a vendor C library behind
`blah2_tpu.capture.vendor.load_library`. The fakes are *ctypes-level*:
they receive the same ctypes objects a real library would (structs filled
through the declared layouts, byref pointers, CFUNCTYPE callback objects)
and invoke the registered stream callbacks through the real CFUNCTYPE
marshalling — so the driver's struct definitions, callback signatures, and
block conversion all execute exactly as they would against hardware.

Each fake also asserts the vendor call *protocol* (the order the reference
drivers establish: open→select→params→init→…→uninit→release→close for
sdrplay, etc.), turning the drivers' call sequences into tested contracts.
"""

from __future__ import annotations

import ctypes as C
import threading
import time

import numpy as np

from blah2_tpu.capture.vendor import sdrplay as S
from blah2_tpu.capture.vendor import hackrf as H
from blah2_tpu.capture.vendor import rtlsdr as R
from blah2_tpu.capture.synthetic import SyntheticSource, TargetSpec


def _ptr(obj, typ):
    """Cast a byref/pointer argument to POINTER(typ)."""
    return C.cast(obj, C.POINTER(typ))


class SceneStreamer:
    """Phase-continuous 2-channel scene scaled to ADC counts.

    Thread-safe: fakes that stream each channel from its own vendor
    thread (hackrf/rtlsdr) read through per-channel cursors over a shared
    lazily-generated block sequence, so both channels always see the same
    time window in order.
    """

    def __init__(self, fs, targets, clutter=2.0, noise=1e-3,
                 block_samples=12_500, scale=2000.0, seed=1,
                 n_consumers=2):
        self.src = SyntheticSource(
            fs, 100e6, [TargetSpec(*t) for t in targets],
            clutter_amplitude=clutter, noise_amplitude=noise,
            block_samples=block_samples, seed=seed)
        self.scale = scale
        self.n_consumers = n_consumers
        self._lock = threading.Lock()
        self._blocks = []       # window of count blocks (see _base)
        self._base = 0          # global index of _blocks[0]
        self._cursor = {}       # consumer key → next global block index

    def _counts(self, x, y):
        def to16(v):
            return np.clip(v * self.scale, -32768, 32767).astype(np.int16)

        return (to16(x.real), to16(x.imag)), (to16(y.real), to16(y.imag))

    def next_block_counts(self):
        """Single-consumer path (paired-callback fakes)."""
        with self._lock:
            x, y = self.src.next_block()
        return self._counts(x, y)

    def next_block_for(self, key):
        """Per-consumer cursor path (independent channel threads)."""
        with self._lock:
            idx = self._cursor.get(key, 0)
            while idx - self._base >= len(self._blocks):
                self._blocks.append(self._counts(*self.src.next_block()))
            self._cursor[key] = idx + 1
            block = self._blocks[idx - self._base]
            # Bound history: once every expected consumer has registered,
            # drop blocks every cursor has passed (a late-starting
            # consumer before that point must still see block 0).
            if len(self._cursor) >= self.n_consumers:
                low = min(self._cursor.values())
                if low > self._base:
                    del self._blocks[: low - self._base]
                    self._base = low
            return block


class FakeSdrplay:
    """sdrplay_api 3.15 fake: dual-tuner RSPduo streaming a synthetic
    scene through the registered StreamA/StreamB callbacks."""

    def __init__(self, scene: SceneStreamer, block_interval=0.05,
                 api_version=S.API_VERSION):
        self.scene = scene
        self.block_interval = block_interval
        self.api_version = api_version
        self.calls = []
        self.opened = False
        self.locked = False
        self.selected = False
        self.initialised = False
        self.updates = []
        self._thread = None
        self._params = S.DeviceParamsT()
        self._dev_params = S.DevParamsT()
        self._rx_a = S.RxChannelParamsT()
        self._rx_b = S.RxChannelParamsT()
        self._params.devParams = C.pointer(self._dev_params)
        self._params.rxChannelA = C.pointer(self._rx_a)
        self._params.rxChannelB = C.pointer(self._rx_b)

    # -- API surface -----------------------------------------------------------
    def sdrplay_api_Open(self):
        self.calls.append("Open")
        self.opened = True
        return S.Success

    def sdrplay_api_Close(self):
        self.calls.append("Close")
        self.opened = False
        return S.Success

    def sdrplay_api_ApiVersion(self, ver_ref):
        _ptr(ver_ref, C.c_float)[0] = self.api_version
        return S.Success

    def sdrplay_api_LockDeviceApi(self):
        assert self.opened, "LockDeviceApi before Open"
        self.locked = True
        return S.Success

    def sdrplay_api_UnlockDeviceApi(self):
        self.locked = False
        return S.Success

    def sdrplay_api_GetDevices(self, devs, ndev_ref, maxdevs):
        assert self.locked, "GetDevices outside device-API lock"
        devs[0].SerNo = b"FAKE0001"
        devs[0].DevNm = b"FakeRSPduo"
        devs[0].hwVer = S.RSPduo_HWVER
        devs[0].valid = 1
        devs[0].rspDuoSampleFreq = 0.0
        devs[0].dev = 0xD00D
        _ptr(ndev_ref, C.c_uint)[0] = 1
        return S.Success

    def sdrplay_api_SelectDevice(self, dev_ref):
        assert self.locked, "SelectDevice outside device-API lock"
        dev = _ptr(dev_ref, S.DeviceT).contents
        assert dev.tuner == S.Tuner_Both, "dual-tuner capture needs Tuner_Both"
        assert dev.rspDuoMode == S.RspDuoMode_Dual_Tuner
        self.selected = True
        self.calls.append("SelectDevice")
        return S.Success

    def sdrplay_api_ReleaseDevice(self, dev_ref):
        self.calls.append("ReleaseDevice")
        self.selected = False
        return S.Success

    def sdrplay_api_GetDeviceParams(self, dev_handle, params_ref):
        assert self.selected, "GetDeviceParams before SelectDevice"
        _ptr(params_ref, C.POINTER(S.DeviceParamsT))[0] = C.pointer(
            self._params)
        return S.Success

    def sdrplay_api_Init(self, dev_handle, cbfns_ref, ctx):
        assert self.selected and not self.initialised
        fns = _ptr(cbfns_ref, S.CallbackFnsT).contents
        self._cb_a = fns.StreamACbFn
        self._cb_b = fns.StreamBCbFn
        self._cb_ev = fns.EventCbFn
        self.initialised = True
        self.calls.append("Init")
        self._thread = threading.Thread(target=self._stream, daemon=True)
        self._thread.start()
        return S.Success

    def sdrplay_api_Uninit(self, dev_handle):
        self.initialised = False
        if self._thread is not None:
            self._thread.join(timeout=5.0)
        self.calls.append("Uninit")
        return S.Success

    def sdrplay_api_Update(self, dev_handle, tuner, reason, ext1):
        self.updates.append((int(tuner), int(reason)))
        return S.Success

    def sdrplay_api_GetErrorString(self, err):
        return b"fake error"

    # -- streaming -------------------------------------------------------------
    def _stream(self):
        def cshorts(a):
            return (C.c_short * len(a)).from_buffer_copy(a.tobytes())

        while self.initialised:
            (ai, aq), (bi, bq) = self.scene.next_block_counts()
            n = len(ai)
            params = S.StreamCbParamsT(numSamples=n)
            self._cb_a(cshorts(ai), cshorts(aq), C.byref(params), n, 0, None)
            if not self.initialised:
                break
            self._cb_b(cshorts(bi), cshorts(bq), C.byref(params), n, 0, None)
            time.sleep(self.block_interval)

    def fire_event(self, event_id, tuner, params_union):
        """Test hook: deliver an event through the registered callback."""
        self._cb_ev(event_id, tuner, C.byref(params_union), None)


class FakeHackrf:
    """libhackrf fake: two units, int8 IQ via rx_callback threads."""

    def __init__(self, scene: SceneStreamer, block_interval=0.05):
        self.scene = scene
        self.block_interval = block_interval
        self.calls = []
        self.configured = {}      # handle → dict of settings
        self.streaming = {}       # handle → thread
        self._running = {}
        self._list = H.HackrfDeviceList(devicecount=2)
        self._next_handle = 0xA000
        self._serial_to_handle = {}
        self._lock = threading.Lock()
        self._blocks = {}         # handle → queue of (i8, q8)

    def hackrf_init(self):
        self.calls.append("init")
        return H.HACKRF_SUCCESS

    def hackrf_exit(self):
        self.calls.append("exit")
        return H.HACKRF_SUCCESS

    def hackrf_device_list(self):
        return C.pointer(self._list)

    def hackrf_open_by_serial(self, serial, dev_ref):
        with self._lock:
            h = self._next_handle
            self._next_handle += 1
        self._serial_to_handle[serial] = h
        _ptr(dev_ref, C.c_void_p)[0] = h
        self.configured[h] = {"serial": serial}
        self.calls.append(("open", serial))
        return H.HACKRF_SUCCESS

    def _set(self, dev, key, value):
        self.configured[self._h(dev)][key] = value
        return H.HACKRF_SUCCESS

    @staticmethod
    def _h(dev):
        return dev if isinstance(dev, int) else dev.value

    def hackrf_set_freq(self, dev, fc):
        return self._set(dev, "freq", int(getattr(fc, "value", fc)))

    def hackrf_set_sample_rate(self, dev, fs):
        return self._set(dev, "rate", float(getattr(fs, "value", fs)))

    def hackrf_set_amp_enable(self, dev, v):
        return self._set(dev, "amp", int(getattr(v, "value", v)))

    def hackrf_set_lna_gain(self, dev, v):
        return self._set(dev, "lna", int(getattr(v, "value", v)))

    def hackrf_set_vga_gain(self, dev, v):
        return self._set(dev, "vga", int(getattr(v, "value", v)))

    def hackrf_set_hw_sync_mode(self, dev, v):
        return self._set(dev, "hw_sync", int(getattr(v, "value", v)))

    def hackrf_set_clkout_enable(self, dev, v):
        return self._set(dev, "clkout", int(getattr(v, "value", v)))

    def hackrf_start_rx(self, dev, callback, ctx):
        h = self._h(dev)
        self._running[h] = True
        # Reference channel streams ch1 (x), surveillance ch2 (y): the
        # driver starts the surveillance unit (serial index 1) first.
        is_surv = len(self.streaming) == 0
        t = threading.Thread(target=self._stream,
                             args=(h, callback, is_surv), daemon=True)
        self.streaming[h] = t
        t.start()
        return H.HACKRF_SUCCESS

    def hackrf_stop_rx(self, dev):
        self._running[self._h(dev)] = False
        return H.HACKRF_SUCCESS

    def hackrf_close(self, dev):
        self.calls.append(("close", self._h(dev)))
        return H.HACKRF_SUCCESS

    def _stream(self, handle, callback, is_surv):
        # int8 counts: rescale the int16 scene to 8 bits.
        while self._running.get(handle):
            (ai, aq), (bi, bq) = self.scene.next_block_for(handle)
            i8, q8 = ((bi, bq) if is_surv else (ai, aq))
            n = len(i8)
            inter = np.empty(2 * n, dtype=np.int8)
            inter[0::2] = np.clip(i8 // 16, -128, 127).astype(np.int8)
            inter[1::2] = np.clip(q8 // 16, -128, 127).astype(np.int8)
            buf = (C.c_int8 * (2 * n)).from_buffer_copy(inter.tobytes())
            tr = H.HackrfTransfer(
                device=handle, buffer=C.cast(buf, C.POINTER(C.c_int8)),
                buffer_length=2 * n, valid_length=2 * n, rx_ctx=None)
            callback(C.byref(tr))
            time.sleep(self.block_interval)


class FakeRtlsdr:
    """librtlsdr (kraken fork) fake: per-device blocking read_async."""

    VALID_GAINS = [0, 9, 14, 27, 37, 77, 87, 125, 144, 157, 166, 197,
                   207, 229, 254, 280, 297, 328, 338, 364, 372, 386,
                   402, 421, 434, 439, 445, 480, 496]

    def __init__(self, scene: SceneStreamer, block_interval=0.05):
        self.scene = scene
        self.block_interval = block_interval
        self.configured = {}
        self._cancel = {}
        self._n_opened = 0
        self._lock = threading.Lock()

    def rtlsdr_open(self, dev_ref, index):
        idx = int(getattr(index, "value", index))
        h = 0xC000 + idx
        _ptr(dev_ref, C.c_void_p)[0] = h
        self.configured.setdefault(h, {})["index"] = idx
        return 0

    def rtlsdr_close(self, dev):
        return 0

    @staticmethod
    def _h(dev):
        return dev if isinstance(dev, int) else dev.value

    def rtlsdr_get_tuner_gains(self, dev, out):
        if not out:
            return len(self.VALID_GAINS)
        arr = _ptr(out, C.c_int)
        for i, g in enumerate(self.VALID_GAINS):
            arr[i] = g
        return len(self.VALID_GAINS)

    def _set(self, dev, key, value):
        self.configured.setdefault(self._h(dev), {})[key] = \
            int(getattr(value, "value", value))
        return 0

    def rtlsdr_set_center_freq(self, dev, fc):
        return self._set(dev, "freq", fc)

    def rtlsdr_set_sample_rate(self, dev, fs):
        return self._set(dev, "rate", fs)

    def rtlsdr_set_dithering(self, dev, v):
        return self._set(dev, "dither", v)

    def rtlsdr_set_tuner_gain_mode(self, dev, v):
        return self._set(dev, "gain_mode", v)

    def rtlsdr_set_tuner_gain(self, dev, v):
        return self._set(dev, "gain", v)

    def rtlsdr_reset_buffer(self, dev):
        return self._set(dev, "reset", 1)

    def rtlsdr_cancel_async(self, dev):
        self._cancel[self._h(dev)] = True
        return 0

    def rtlsdr_read_async(self, dev, callback, ctx, buf_num, buf_len):
        h = self._h(dev)
        self._cancel[h] = False
        is_surv = self.configured[h]["index"] == 1
        while not self._cancel[h]:
            (ai, aq), (bi, bq) = self.scene.next_block_for(h)
            i8, q8 = ((bi, bq) if is_surv else (ai, aq))
            n = len(i8)
            # rtlsdr delivers offset-127 uint8; reference casts to int8.
            inter = np.empty(2 * n, dtype=np.uint8)
            inter[0::2] = (np.clip(i8 // 16, -128, 127) + 127).astype(
                np.uint8)
            inter[1::2] = (np.clip(q8 // 16, -128, 127) + 127).astype(
                np.uint8)
            buf = (C.c_ubyte * (2 * n)).from_buffer_copy(inter.tobytes())
            callback(buf, 2 * n, None)
            time.sleep(self.block_interval)
        return 0


class FakeUhd:
    """UHD C API fake: 2-channel fc32 recv loop."""

    def __init__(self, scene: SceneStreamer, block_interval=0.02,
                 samps_per_buff=8192):
        self.scene = scene
        self.block_interval = block_interval
        self.samps = samps_per_buff
        self.calls = []
        self.settings = {}
        self._streaming = False
        self._pending = None   # leftover (x, y) float arrays

    def uhd_usrp_make(self, h_ref, args):
        _ptr(h_ref, C.c_void_p)[0] = 0xE000
        self.settings["args"] = args
        return 0

    def uhd_usrp_free(self, h_ref):
        return 0

    def uhd_subdev_spec_make(self, h_ref, markup):
        _ptr(h_ref, C.c_void_p)[0] = 0xE001
        self.settings["subdev"] = markup
        return 0

    def uhd_usrp_set_rx_subdev_spec(self, h, spec, mboard):
        self.calls.append("subdev")
        return 0

    def uhd_usrp_set_rx_antenna(self, h, ant, chan):
        self.settings[f"antenna{getattr(chan, 'value', chan)}"] = ant
        return 0

    def uhd_usrp_set_rx_rate(self, h, rate, chan):
        self.settings[f"rate{getattr(chan, 'value', chan)}"] = \
            float(getattr(rate, "value", rate))
        return 0

    def uhd_usrp_set_rx_freq(self, h, req_ref, chan, res_ref):
        from blah2_tpu.capture.vendor import uhd as U

        req = _ptr(req_ref, U.TuneRequestT).contents
        res = _ptr(res_ref, U.TuneResultT).contents
        res.actual_rf_freq = req.target_freq
        self.settings[f"freq{getattr(chan, 'value', chan)}"] = \
            req.target_freq
        return 0

    def uhd_usrp_set_rx_gain(self, h, gain, chan, name):
        self.settings[f"gain{getattr(chan, 'value', chan)}"] = \
            float(getattr(gain, "value", gain))
        return 0

    def uhd_usrp_get_time_now(self, h, mboard, full_ref, frac_ref):
        _ptr(full_ref, C.c_int64)[0] = 100
        _ptr(frac_ref, C.c_double)[0] = 0.25
        return 0

    def uhd_rx_streamer_make(self, h_ref):
        _ptr(h_ref, C.c_void_p)[0] = 0xE002
        return 0

    def uhd_usrp_get_rx_stream(self, h, args_ref, streamer):
        from blah2_tpu.capture.vendor import uhd as U

        args = _ptr(args_ref, U.StreamArgsT).contents
        assert args.cpu_format == b"fc32"
        assert args.n_channels == 2
        self.calls.append("get_rx_stream")
        return 0

    def uhd_rx_streamer_max_num_samps(self, h, out_ref):
        _ptr(out_ref, C.c_size_t)[0] = self.samps
        return 0

    def uhd_rx_streamer_issue_stream_cmd(self, h, cmd_ref):
        from blah2_tpu.capture.vendor import uhd as U

        cmd = _ptr(cmd_ref, U.StreamCmdT).contents
        if cmd.stream_mode == U.STREAM_MODE_START_CONTINUOUS:
            assert not cmd.stream_now, "timed start expected (+50 ms)"
            assert cmd.time_spec_full_secs + cmd.time_spec_frac_secs > 100.25
            self._streaming = True
        else:
            self._streaming = False
        self.calls.append(("stream_cmd", int(cmd.stream_mode)))
        return 0

    def uhd_rx_metadata_make(self, h_ref):
        _ptr(h_ref, C.c_void_p)[0] = 0xE003
        return 0

    def uhd_rx_metadata_error_code(self, h, out_ref):
        _ptr(out_ref, C.c_int)[0] = 0
        return 0

    def uhd_rx_streamer_recv(self, h, buffs, samps_per_buff, meta_ref,
                             timeout, one_packet, received_ref):
        if not self._streaming:
            _ptr(received_ref, C.c_size_t)[0] = 0
            return 0
        want = int(getattr(samps_per_buff, "value", samps_per_buff))
        if self._pending is None or len(self._pending[0]) == 0:
            x, y = self.scene.src.next_block()
            self._pending = (x.astype(np.complex64) * self.scene.scale,
                             y.astype(np.complex64) * self.scene.scale)
        x, y = self._pending
        n = min(want, len(x))
        C.memmove(buffs[0], x[:n].tobytes(), n * 8)
        C.memmove(buffs[1], y[:n].tobytes(), n * 8)
        self._pending = (x[n:], y[n:])
        _ptr(received_ref, C.c_size_t)[0] = n
        time.sleep(self.block_interval)
        return 0
