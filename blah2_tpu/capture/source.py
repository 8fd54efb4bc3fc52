"""Capture source abstraction and IQ recording.

Parity with reference `src/capture/Source.{h,cpp}`: an abstract device with
``start()/stop()/process()/replay()`` (`Source.h:54-71`) and timestamped
record files ``<path><YYYYmmdd-HHMMSS>.<type>.iq`` (`Source.cpp:25-63`).

Recordings use the reference's RspDuo interleaved int16 quad format
``i1,q1,i2,q2`` (`RspDuo.cpp:150-179`) — the golden-data/replay format —
regardless of source type, so recordings from any source replay everywhere.
"""

from __future__ import annotations

import os
import threading
import time
from typing import Optional

import numpy as np


class Source:
    #: Multiplier applied to samples before the int16-quad cast in
    #: :meth:`record`. Sources whose samples already are integer ADC
    #: counts (RspDuo shorts, HackRF/Kraken int8) keep 1.0; float-valued
    #: sources (USRP fc32 in [-1, 1], Synthetic unit-variance) must scale
    #: up or the unscaled cast quantises everything to {-1, 0, 1}.
    record_scale: float = 1.0

    def __init__(self, type_name: str, fs: float, fc: float,
                 path: Optional[str] = None):
        self.type_name = type_name
        self.fs = float(fs)
        self.fc = float(fc)
        self.path = path
        self.stopped = False
        self._record_file = None
        self._record_lock = threading.Lock()
        # Per-channel pending blocks for record_channel (devices whose two
        # channels stream from independent vendor threads).
        self._record_pending: list = [[], []]

    # -- lifecycle -----------------------------------------------------------
    def start(self) -> None:
        self.stopped = False

    def stop(self) -> None:
        self.stopped = True

    def kill(self) -> None:
        """SIGTERM-path graceful stop (`Source.cpp:65-75`)."""
        self.stop()
        self.close_record_file()

    def process(self, buffer1, buffer2) -> None:
        raise NotImplementedError

    def replay(self, buffer1, buffer2, file: str, loop: bool) -> None:
        raise NotImplementedError(f"{self.type_name} does not support replay")

    # -- recording -----------------------------------------------------------
    def open_record_file(self) -> Optional[str]:
        if not self.path:
            return None
        ts = time.strftime("%Y%m%d-%H%M%S")
        filename = os.path.join(
            self.path, f"{ts}.{self.type_name.lower()}.iq"
        )
        os.makedirs(self.path, exist_ok=True)
        with self._record_lock:
            if self._record_file is not None:
                self._record_file.close()
            self._record_file = open(filename, "ab")
            self._record_pending = [[], []]
        return filename

    def close_record_file(self) -> None:
        with self._record_lock:
            if self._record_file is not None:
                self._record_file.close()
                self._record_file = None
            # Unpaired per-channel tails must not leak into the next
            # recording session (record_channel).
            self._record_pending = [[], []]

    @property
    def recording(self) -> bool:
        return self._record_file is not None

    def _write_quads(self, ch1: np.ndarray, ch2: np.ndarray) -> None:
        """Append paired samples as interleaved int16 quads (record lock
        held). ``record_scale`` maps the source's sample range onto ADC
        counts before the cast."""
        n = min(len(ch1), len(ch2))
        s = self.record_scale

        def counts(v):
            return np.clip(v * s if s != 1.0 else v,
                           -32768, 32767).astype(np.int16)

        quads = np.empty((n, 4), dtype=np.int16)
        quads[:, 0] = counts(np.real(ch1[:n]))
        quads[:, 1] = counts(np.imag(ch1[:n]))
        quads[:, 2] = counts(np.real(ch2[:n]))
        quads[:, 3] = counts(np.imag(ch2[:n]))
        quads.tofile(self._record_file)

    def record(self, ch1: np.ndarray, ch2: np.ndarray) -> None:
        """Append a 2-channel block as interleaved int16 quads."""
        with self._record_lock:
            if self._record_file is None:
                return
            self._write_quads(ch1, ch2)

    def record_channel(self, idx: int, block: np.ndarray) -> None:
        """Record from per-channel vendor callbacks (HackRF/Kraken stream
        each channel from its own thread): blocks are buffered per channel
        and flushed as paired quads once both channels cover the samples.
        Pending blocks are dropped when recording is off so a toggle
        cannot pair stale history with fresh samples."""
        with self._record_lock:
            if self._record_file is None:
                if self._record_pending[0] or self._record_pending[1]:
                    self._record_pending = [[], []]
                return
            self._record_pending[idx].append(np.asarray(block))
            n = min(sum(len(b) for b in self._record_pending[0]),
                    sum(len(b) for b in self._record_pending[1]))
            if n == 0:
                return
            chans = []
            for c in (0, 1):
                cat = np.concatenate(self._record_pending[c])
                chans.append(cat[:n])
                rest = cat[n:]
                self._record_pending[c] = [rest] if len(rest) else []
            self._write_quads(chans[0], chans[1])


