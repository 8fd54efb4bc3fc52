"""Native host-runtime parity: C++ ring buffer / replay reader / TCP sender
(native/blah2_host.cpp via blah2_tpu.native) against the Python
implementations and the reference wire/record contracts."""

import json
import socketserver
import threading

import numpy as np
import pytest

from blah2_tpu import native
from blah2_tpu.data.iq import IqRingBuffer

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libblah2host.so not built")


def _iq(n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) * 100
            + 1j * rng.standard_normal(n) * 100).astype(np.complex64)


class TestNativeRing:
    def test_push_pop_roundtrip(self):
        ring = native.NativeIqRingBuffer(1000)
        block = _iq(700)
        ring.push(block)
        assert len(ring) == 700
        out = ring.pop(700, timeout=1.0)
        np.testing.assert_array_equal(out, block)
        assert len(ring) == 0

    def test_drop_oldest_on_overflow_matches_python(self):
        cap = 256
        nring = native.NativeIqRingBuffer(cap)
        pring = IqRingBuffer(cap)
        for seed in range(5):
            block = _iq(100, seed)
            nring.push(block)
            pring.push(block)
        a = nring.pop(cap, timeout=1.0)
        b = pring.pop(cap, timeout=1.0)
        np.testing.assert_array_equal(a, b)

    def test_oversize_block_keeps_newest(self):
        ring = native.NativeIqRingBuffer(100)
        block = _iq(250)
        ring.push(block)
        out = ring.pop(100, timeout=1.0)
        np.testing.assert_array_equal(out, block[-100:])

    def test_pop_timeout_returns_none(self):
        ring = native.NativeIqRingBuffer(100)
        assert ring.pop(10, timeout=0.05) is None

    def test_blocking_producer_consumer(self):
        ring = native.NativeIqRingBuffer(1 << 12)
        total = 1 << 14
        src = _iq(total)
        got = []

        def producer():
            for i in range(0, total, 512):
                assert ring.push_wait(src[i:i + 512], timeout=5.0)

        t = threading.Thread(target=producer)
        t.start()
        for _ in range(total // 1024):
            out = ring.pop(1024, timeout=5.0)
            assert out is not None
            got.append(out)
        t.join()
        np.testing.assert_array_equal(np.concatenate(got), src)

    def test_close_unblocks_pop(self):
        ring = native.NativeIqRingBuffer(100)
        done = threading.Event()

        def popper():
            assert ring.pop(50, timeout=10.0) is None
            done.set()

        t = threading.Thread(target=popper)
        t.start()
        ring.close()
        assert done.wait(2.0)
        t.join()


class TestNativeReplay:
    def test_reader_matches_numpy_decode(self, tmp_path):
        n = 5000
        quads = np.random.default_rng(1).integers(
            -3000, 3000, size=(n, 4), dtype=np.int16)
        f = tmp_path / "rec.rspduo.iq"
        quads.tofile(f)

        r = native.NativeReplayReader(str(f))
        ch1, ch2 = r.read(n + 100)
        assert len(ch1) == n
        np.testing.assert_array_equal(ch1.real, quads[:, 0].astype(np.float32))
        np.testing.assert_array_equal(ch1.imag, quads[:, 1].astype(np.float32))
        np.testing.assert_array_equal(ch2.real, quads[:, 2].astype(np.float32))
        np.testing.assert_array_equal(ch2.imag, quads[:, 3].astype(np.float32))
        # EOF then rewind
        a, _ = r.read(10)
        assert len(a) == 0
        r.rewind()
        a, _ = r.read(10)
        assert len(a) == 10
        r.close()

    def test_partial_trailing_quad_dropped(self, tmp_path):
        f = tmp_path / "trunc.rspduo.iq"
        data = np.arange(4 * 7 + 2, dtype=np.int16)  # 7 quads + 2 strays
        data.tofile(f)
        r = native.NativeReplayReader(str(f))
        ch1, _ = r.read(100)
        assert len(ch1) == 7
        r.close()

    def test_record_append_roundtrip(self, tmp_path):
        f = tmp_path / "out.rspduo.iq"
        ch1, ch2 = _iq(300, 2), _iq(300, 3)
        assert native.record_append(str(f), ch1, ch2)
        assert native.record_append(str(f), ch1, ch2)  # append twice
        r = native.NativeReplayReader(str(f))
        a, b = r.read(1000)
        assert len(a) == 600
        # int16 truncation matches C cast semantics
        np.testing.assert_array_equal(
            a[:300].real, ch1.real.astype(np.int16).astype(np.float32))
        np.testing.assert_array_equal(
            b[:300].imag, ch2.imag.astype(np.int16).astype(np.float32))
        r.close()


class TestNativeTcp:
    def test_chunked_send_reassembles(self):
        received = []
        done = threading.Event()

        class H(socketserver.BaseRequestHandler):
            def handle(self):
                buf = b""
                while True:
                    data = self.request.recv(4096)
                    if not data:
                        break
                    buf += data
                    if buf.endswith(b"}"):
                        received.append(buf.decode())
                        done.set()
                        return

        srv = socketserver.TCPServer(("127.0.0.1", 0), H)
        port = srv.server_address[1]
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            sender = native.NativeTcpSender("127.0.0.1", port)
            payload = json.dumps({"data": list(range(2000))})
            assert len(payload) > 4 * 1024  # forces >4 chunks
            assert sender.send_data(payload)
            assert done.wait(5.0)
            assert received[0] == payload
            sender.close()
        finally:
            srv.shutdown()
            srv.server_close()
