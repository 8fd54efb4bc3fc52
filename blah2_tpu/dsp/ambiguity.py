"""Cross-ambiguity function via the batches algorithm, TPU-native.

Algorithm (Principles of Modern Radar vol. II ch. 17, as in the reference
`src/process/ambiguity/Ambiguity.{h,cpp}`): split the CPI into
``n_doppler_bins`` pulses of ``n_corr`` samples; per pulse, cross-correlate
surveillance against reference over the delay window via FFTs; then FFT along
the pulse axis per delay column to resolve Doppler.

TPU-first design (vs the reference's two sequential per-pulse / per-column
loops, `Ambiguity.cpp:106-169`):
  - the per-pulse range stage is ONE batched FFT/IFFT over a
    ``(n_doppler_bins, nfft)`` array — XLA tiles it across the VPU;
  - the lag-window extraction is a roll + static slice (no gather);
  - the Doppler stage is a single complex matrix multiply with a precomputed
    (n_doppler_bins × n_doppler_bins) shifted-DFT matrix, which runs on the
    MXU and folds the reference's fftshift permutation (`Ambiguity.cpp:163-167`)
    into the operator for free. For the odd, often-prime pulse counts this
    beats Bluestein-based FFT. A pure-FFT path is kept for testing.

Derived-geometry parity (`Ambiguity.cpp:16-80`): n_delay_bins, doppler_middle,
n_doppler_bins from the Doppler-resolution walk, n_corr = n // n_doppler_bins,
cpi, Hamming-rounded nfft = 2·n_corr − 1. Golden constants for fs=2 MHz,
tCpi=0.5 s, delay −10..300, Doppler ±300: n_corr=3322, n_doppler_bins=301,
nfft=6643→6750 (`test/unit/process/ambiguity/TestAmbiguity.cpp:89-92,112-115`).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from blah2_tpu.dsp.hamming import next_hamming


class AmbiguityProcessor:
    def __init__(
        self,
        delay_min: int,
        delay_max: int,
        doppler_min: float,
        doppler_max: float,
        fs: int,
        n_samples: int,
        round_hamming: bool = True,
        dtype=jnp.complex64,
        doppler_via_matmul: bool = True,
    ):
        if delay_max < delay_min:
            # The reference leaves this case as an open question
            # (`Ambiguity.h:9` todo); we reject it.
            raise ValueError(f"delay_max ({delay_max}) < delay_min ({delay_min})")
        if doppler_max < doppler_min:
            raise ValueError(
                f"doppler_max ({doppler_max}) < doppler_min ({doppler_min})"
            )
        self.delay_min = int(delay_min)
        self.delay_max = int(delay_max)
        self.doppler_min = float(doppler_min)
        self.doppler_max = float(doppler_max)
        self.fs = int(fs)
        self.n_samples = int(n_samples)
        self.dtype = dtype
        self.real_dtype = jnp.float32 if dtype == jnp.complex64 else jnp.float64
        self.doppler_via_matmul = doppler_via_matmul

        self.n_delay_bins = self.delay_max - self.delay_min + 1
        self.doppler_middle = (self.doppler_min + self.doppler_max) / 2.0

        # Doppler bin count: symmetric walk at pre-CPI resolution fs/n.
        resolution = 1.0 / (float(self.n_samples) / float(self.fs))
        k = 1
        while self.doppler_middle + k * resolution <= self.doppler_max:
            k += 1
        half_bins = k - 1
        self.n_doppler_bins = 2 * half_bins + 1

        self.n_corr = self.n_samples // self.n_doppler_bins
        self.cpi = float(self.n_corr) * self.n_doppler_bins / self.fs
        self.doppler_resolution = 1.0 / self.cpi

        # Axes: delay in bins, Doppler in Hz at true-CPI resolution.
        self.delay_axis = np.arange(self.delay_min, self.delay_max + 1, dtype=np.int32)
        self.doppler_axis = self.doppler_middle + self.doppler_resolution * np.arange(
            -half_bins, half_bins + 1, dtype=np.float64
        )

        self.nfft = 2 * self.n_corr - 1
        if round_hamming:
            self.nfft = next_hamming(self.nfft)
        if self.n_delay_bins > self.nfft:
            raise ValueError(
                f"delay window [{self.delay_min}, {self.delay_max}] asks for "
                f"{self.n_delay_bins} lags but each of the "
                f"{self.n_doppler_bins} pulses has only n_corr="
                f"{self.n_corr} samples (nfft={self.nfft}): shrink the "
                f"delay range, the Doppler span, or raise fs*cpi "
                f"(previously this crashed downstream with a shape "
                f"mismatch)")
        # Compute size: any length >= 2*n_corr-1 yields identical lag values
        # (the correlation is linear once zero-padded past that), so pad
        # further to a TPU-fast size — without a large power-of-2 factor the
        # TPU FFT runs ~10x slower (see next_tpu_fft_size). self.nfft keeps
        # the reference's Hamming-rounded value (golden-constant parity,
        # TestAmbiguity.cpp:112-115).
        from blah2_tpu.dsp.hamming import next_tpu_fft_size

        self.nfft_compute = next_tpu_fft_size(self.nfft)

        # Shifted-DFT operator for the Doppler stage:
        # out[j] = FFT(col)[sigma(j)], sigma(j) = (j + nD//2 + 1) mod nD.
        nd = self.n_doppler_bins
        sigma = (np.arange(nd) + nd // 2 + 1) % nd
        self._sigma = sigma.astype(np.int32)
        p = np.arange(nd, dtype=np.float64)
        w = np.exp(-2j * np.pi * np.outer(sigma, p) / nd)
        self._doppler_dft = w.astype(np.dtype(dtype))

        # Doppler-middle pre-shift ramp (`Ambiguity.cpp:95-102`).
        if self.doppler_middle != 0.0:
            n_used = self.n_doppler_bins * self.n_corr
            ramp = np.exp(
                2j
                * np.pi
                * self.doppler_middle
                * (np.arange(n_used, dtype=np.float64) / self.fs)
            )
            self._ramp = ramp.astype(np.dtype(dtype))
        else:
            self._ramp = None

    @property
    def n_used_samples(self) -> int:
        return self.n_doppler_bins * self.n_corr

    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        """Compute the complex delay-Doppler map.

        Args:
          x: reference-channel CPI samples, shape (>= n_doppler_bins*n_corr,).
          y: surveillance-channel CPI samples, same shape.
        Returns:
          Complex map of shape (n_doppler_bins, n_delay_bins); rows = Doppler.
        """
        nd, nc, nfft = self.n_doppler_bins, self.n_corr, self.nfft_compute
        n_used = nd * nc

        x = x[:n_used].astype(self.dtype)
        y = y[:n_used].astype(self.dtype)
        if self._ramp is not None:
            x = x * self._ramp

        # Range stage: batched cross-correlation per pulse.
        xp = x.reshape(nd, nc)
        yp = y.reshape(nd, nc)
        xf = jnp.fft.fft(xp, n=nfft, axis=1)
        yf = jnp.fft.fft(yp, n=nfft, axis=1)
        z = jnp.fft.ifft(yf * jnp.conj(xf), axis=1)

        # Lag window: corr[j] = z[(delay_min + j) mod nfft]  (`Ambiguity.cpp:131-146`).
        c = jnp.roll(z, shift=-self.delay_min, axis=1)[:, : self.n_delay_bins]

        # Doppler stage: shifted DFT along the pulse axis.
        if self.doppler_via_matmul:
            return jnp.matmul(
                self._doppler_dft, c, preferred_element_type=self.dtype
            )
        f = jnp.fft.fft(c, axis=0)
        return jnp.take(f, self._sigma, axis=0)


def map_metrics(z: jnp.ndarray):
    """Map metrics in dB (parity: `src/data/Map.cpp:188-206`).

    Returns (db_map, noise_power, max_power) where noise_power is the mean of
    the dB map and max_power = max(0, max(db)) − noise_power (the reference's
    max accumulator starts at 0).
    """
    db = 10.0 * jnp.log10(jnp.abs(z))
    noise = jnp.mean(db)
    raw_max = jnp.maximum(0.0, jnp.max(db))
    return db, noise, raw_max - noise
