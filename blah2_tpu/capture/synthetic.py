"""Synthetic 2-channel IQ generation with injected targets.

The reference only sketches a functional-test tier (`test/README.md`, Types;
dirs anticipated by `CMakeLists.txt:27-29` but empty). This module provides it:
a reference channel of complex Gaussian noise and a surveillance channel
containing scaled/delayed/Doppler-shifted copies (targets), direct-path
clutter, and additive noise — targets at known delay/Doppler/SNR give golden
expectations for the ambiguity/CFAR/tracker chain.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import numpy as np

from blah2_tpu.capture.source import Source


@dataclasses.dataclass
class TargetSpec:
    delay_bins: int
    doppler_hz: float
    amplitude: float


def synthetic_cpi(
    n_samples: int,
    fs: float,
    targets: Sequence[TargetSpec] = (),
    clutter_amplitude: float = 0.0,
    noise_amplitude: float = 0.0,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Generate one CPI of (reference, surveillance) float64 complex samples.

    Surveillance: y[t] = Σ a·x[t−d]·exp(j2π f t/fs) + c·x[t] + noise.
    """
    rng = np.random.default_rng(seed)
    x = (rng.standard_normal(n_samples) + 1j * rng.standard_normal(n_samples)) / np.sqrt(2)
    y = np.zeros(n_samples, dtype=np.complex128)
    t = np.arange(n_samples, dtype=np.float64) / fs
    for tgt in targets:
        delayed = np.zeros_like(x)
        d = int(tgt.delay_bins)
        if d >= 0:
            delayed[d:] = x[: n_samples - d]
        else:
            delayed[:d] = x[-d:]
        y += tgt.amplitude * delayed * np.exp(2j * np.pi * tgt.doppler_hz * t)
    if clutter_amplitude:
        y += clutter_amplitude * x
    if noise_amplitude:
        y += noise_amplitude * (
            rng.standard_normal(n_samples) + 1j * rng.standard_normal(n_samples)
        ) / np.sqrt(2)
    return x, y


class SyntheticSource(Source):
    """Streaming capture source that emits synthetic CPIs continuously."""

    def __init__(
        self,
        fs: float,
        fc: float,
        targets: Sequence[TargetSpec] = (),
        clutter_amplitude: float = 0.0,
        noise_amplitude: float = 1e-3,
        block_samples: int = 65536,
        seed: int = 0,
        path: Optional[str] = None,
    ):
        super().__init__("Synthetic", fs, fc, path)
        self.targets = list(targets)
        self.clutter_amplitude = clutter_amplitude
        self.noise_amplitude = noise_amplitude
        self.block_samples = int(block_samples)
        self._seed = seed
        self._block_idx = 0

    def process(self, buffer1, buffer2) -> None:
        while not self.stopped:
            x, y = synthetic_cpi(
                self.block_samples,
                self.fs,
                self.targets,
                self.clutter_amplitude,
                self.noise_amplitude,
                seed=self._seed + self._block_idx,
            )
            self._block_idx += 1
            self.record(x, y)
            buffer1.push(x.astype(np.complex64))
            buffer2.push(y.astype(np.complex64))
