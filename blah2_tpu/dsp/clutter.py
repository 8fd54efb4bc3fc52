"""Wiener-Hopf FIR clutter canceller, TPU-native.

Cancels direct-path/clutter returns from the surveillance channel by solving
the Wiener-Hopf normal equations over clutter lags [delay_min, delay_max] and
subtracting the FIR-filtered reference from the surveillance signal.

Parity with reference `src/process/clutter/WienerHopf.{h,cpp}`:
  - n_bins = delay_max − delay_min (reference quirk: no +1, `WienerHopf.cpp:12`)
  - reference channel circularly shifted by delay_min (`WienerHopf.cpp:66`)
  - autocorrelation a and cross-correlation b via full-CPI FFTs
    (`WienerHopf.cpp:71-108`); Toeplitz matrix assembled Hermitian with the
    lower triangle conjugated (`WienerHopf.cpp:85-97`)
  - solve by Cholesky + triangular solves (`WienerHopf.cpp:111-122`); a failed
    factorization skips the filter for that CPI (caller contract
    `src/blah2.cpp:268-275`)
  - filter applied by FFT convolution and subtracted (`WienerHopf.cpp:125-160`)

TPU-first differences:
  - single jitted program, complex64 by default; failure is detected by a
    finite-check on the weights (Cholesky of a non-PD matrix yields NaN on
    TPU rather than raising) and resolved with a `jnp.where` — no host branch;
  - the convolution FFT length is Hamming-rounded: the reference uses
    n_bins + n + 1 points (`WienerHopf.cpp:29,127-145`) but any length
    ≥ n + n_bins − 1 yields the identical first n samples of the linear
    convolution, so we round up to a 5-smooth size for the TPU FFT;
  - optional diagonal loading stabilizes the f32 Cholesky (the reference
    documents instability at f64: `WienerHopf.h:7`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from blah2_tpu.dsp.hamming import next_tpu_fft_size
from blah2_tpu.ops.toeplitz import hermitian_toeplitz


class WienerHopfFilter:
    def __init__(
        self,
        delay_min: int,
        delay_max: int,
        n_samples: int,
        round_hamming: bool = True,
        diag_load: float = 0.0,
        dtype=jnp.complex64,
        mode: str = "circular",
    ):
        """``mode``: "circular" replicates the reference's circular
        correlations exactly; "linear" uses linear (zero-extended)
        correlations and shift — physically cleaner (the circular wrap is an
        artifact of the reference's full-CPI FFT method), differs by
        O(n_bins/n), and is what the sharded pipeline computes."""
        if mode not in ("circular", "linear"):
            raise ValueError(f"unknown clutter mode {mode!r}")
        self.mode = mode
        self.delay_min = int(delay_min)
        self.delay_max = int(delay_max)
        self.n_bins = self.delay_max - self.delay_min
        self.n_samples = int(n_samples)
        self.diag_load = float(diag_load)
        self.dtype = dtype
        self.real_dtype = jnp.float32 if dtype == jnp.complex64 else jnp.float64
        self.nfft_corr = next_tpu_fft_size(self.n_samples + self.n_bins)
        self._nfft_wrap = next_tpu_fft_size(2 * self.n_bins)

        min_conv = self.n_samples + self.n_bins - 1
        self.nfft_conv = next_tpu_fft_size(min_conv) if round_hamming else (
            self.n_bins + self.n_samples + 1
        )


    def __call__(self, x: jnp.ndarray, y: jnp.ndarray):
        """Filter one CPI.

        Args:
          x: reference channel, shape (n_samples,).
          y: surveillance channel, shape (n_samples,).
        Returns:
          (y_filtered, ok): filtered surveillance (original y when the solve
          failed) and a bool scalar success flag.
        """
        n = self.n_samples
        nb = self.n_bins
        x = x[:n].astype(self.dtype)
        y = y[:n].astype(self.dtype)

        if self.mode == "circular":
            # dataX[i] = x[(i - delay_min) mod n]  (`WienerHopf.cpp:66`)
            xs = jnp.roll(x, self.delay_min)
            # The reference computes circular correlations with size-n FFTs
            # (`WienerHopf.cpp:71-108`). An FFT at exactly n is catastrophically
            # slow on TPU when n lacks a large power-of-2 factor (fs·tCpi
            # usually does: 1.5M = 2⁵·3·5⁶ runs ~200 ms/FFT), so compute the
            # LINEAR correlations with padded TPU-fast FFTs and add the exact
            # circular wrap term — algebraically identical values:
            #   r_circ[l] = r_lin[l] + Σ_{j<l} u[j]·conj(v[n−l+j]),
            # and the wrap term is a tiny (nb-point) correlation of the head
            # of u against the tail of v.
            m = self.nfft_corr
            # Two separate m-point transforms: a batched (2, m) FFT pair
            # measured ~0.5 ms SLOWER than the separate calls on v5e
            # (probed round 4) — XLA's batched FFT does not win here.
            xf = jnp.fft.fft(xs, n=m)
            yf = jnp.fft.fft(y, n=m)
            a_lin = jnp.fft.ifft(xf * jnp.conj(xf))[:nb]
            b_lin = jnp.fft.ifft(yf * jnp.conj(xf))[:nb]

            mw = self._nfft_wrap
            tail_x = jnp.fft.fft(xs[n - nb:], n=mw)
            head_x = jnp.fft.fft(xs[:nb], n=mw)
            head_y = jnp.fft.fft(y[:nb], n=mw)
            # wrap[l] = cc[mw − nb + l], cc = ifft(head·conj(tail))
            cc_x = jnp.fft.ifft(head_x * jnp.conj(tail_x))
            cc_y = jnp.fft.ifft(head_y * jnp.conj(tail_x))
            wrap_x = cc_x[mw - nb : mw]
            wrap_y = cc_y[mw - nb : mw]
            a = jnp.conj(a_lin + wrap_x)
            b = b_lin + wrap_y
        else:
            # Linear shift with zero fill, linear correlations via a padded FFT.
            s = self.delay_min
            if s > 0:
                xs = jnp.concatenate([jnp.zeros(s, x.dtype), x[:-s]])
            elif s < 0:
                xs = jnp.concatenate([x[-s:], jnp.zeros(-s, x.dtype)])
            else:
                xs = x
            m = self.nfft_corr
            xf = jnp.fft.fft(xs, n=m)
            yf = jnp.fft.fft(y, n=m)
            a = jnp.conj(jnp.fft.ifft(xf * jnp.conj(xf))[:nb])
            b = jnp.fft.ifft(yf * jnp.conj(xf))[:nb]

        # Hermitian Toeplitz: A[i,j] = conj(a[i-j]) for i>j, a[j-i] otherwise
        # (`WienerHopf.cpp:85-97`); gather-free build — the index-matrix
        # gather was ~1.7 ms on v5e, 10x the Cholesky solve it feeds.
        mat = hermitian_toeplitz(a)
        if self.diag_load > 0.0:
            load = self.diag_load * jnp.real(a[0])
            mat = mat + load.astype(self.dtype) * jnp.eye(nb, dtype=self.dtype)

        # Cholesky solve; NaNs signal a non-PD matrix (reference skips the CPI).
        chol = jnp.linalg.cholesky(mat)
        w = jax.scipy.linalg.cho_solve((chol, True), b)
        ok = jnp.all(jnp.isfinite(w.real) & jnp.isfinite(w.imag))
        w = jnp.where(ok, w, jnp.zeros_like(w))

        # FIR apply: y <- y − (w * xs)[:n] by FFT convolution. When the
        # conv size matches the correlation size (the measured-fast table
        # usually lands both on the same length), reuse the
        # correlation-stage spectrum of xs and skip one full-length FFT.
        wf = jnp.fft.fft(w, n=self.nfft_conv)
        xcf = xf if self.nfft_conv == self.nfft_corr \
            else jnp.fft.fft(xs, n=self.nfft_conv)
        filt = jnp.fft.ifft(wf * xcf)[:n]
        y_clean = y - filt

        return jnp.where(ok, y_clean, y), ok
