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
    def __init__(self, type_name: str, fs: float, fc: float,
                 path: Optional[str] = None):
        self.type_name = type_name
        self.fs = float(fs)
        self.fc = float(fc)
        self.path = path
        self.stopped = False
        self._record_file = None
        self._record_lock = threading.Lock()

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
        return filename

    def close_record_file(self) -> None:
        with self._record_lock:
            if self._record_file is not None:
                self._record_file.close()
                self._record_file = None

    @property
    def recording(self) -> bool:
        return self._record_file is not None

    def record(self, ch1: np.ndarray, ch2: np.ndarray) -> None:
        """Append a 2-channel block as interleaved int16 quads."""
        with self._record_lock:
            if self._record_file is None:
                return
            n = min(len(ch1), len(ch2))
            quads = np.empty((n, 4), dtype=np.int16)
            quads[:, 0] = np.clip(np.real(ch1[:n]), -32768, 32767).astype(np.int16)
            quads[:, 1] = np.clip(np.imag(ch1[:n]), -32768, 32767).astype(np.int16)
            quads[:, 2] = np.clip(np.real(ch2[:n]), -32768, 32767).astype(np.int16)
            quads[:, 3] = np.clip(np.imag(ch2[:n]), -32768, 32767).astype(np.int16)
            quads.tofile(self._record_file)


