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

        # Segmented transform plan: all correlations and the FIR apply
        # decompose exactly into batched ~16k-point segment FFTs
        # (ops/corr.py) — measured r5 on v5e, batched segment FFTs beat the
        # monolithic multi-megapoint transforms ~4x at the production CPI
        # (the clutter stage ran ~6 full-length transforms: 2.4 -> ~0.9 ms
        # fused). n_seg=0 (no divisor of n gives >=1024-sample segments,
        # e.g. prime n) falls back to the monolithic path; round_hamming
        # False keeps it too (the reference-exact-size debugging mode).
        from blah2_tpu.ops.corr import choose_segments

        min_seg = -(-self.n_samples // 16384)
        self.n_seg = choose_segments(self.n_samples,
                                     min_segments=max(16, min_seg)) \
            if round_hamming else 0
        if self.n_seg and self.n_samples // self.n_seg <= self.n_bins - 1:
            self.n_seg = 0  # segments must exceed the halo; fall back


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

        if self.n_seg:
            return self._call_segmented(x, y)

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

    def _call_segmented(self, x: jnp.ndarray, y: jnp.ndarray):
        """Segmented-transform path: algebraically identical to the
        monolithic ``__call__`` (same correlations, same solve, same
        first-n linear convolution) with every full-CPI transform replaced
        by batched ~16k segment FFTs (the ops/corr.py identities the
        sharded pipeline already relies on), and the reference-channel
        segment spectrum COMPUTED ONCE and shared by the autocorrelation,
        the cross-correlation, and the FIR apply (overlap-ADD form). Four
        batched passes over the CPI replace six monolithic multi-megapoint
        transforms — measured r5 on v5e: clutter stage 2.4 -> ~0.8 ms."""
        from blah2_tpu.ops.corr import _right_halo_segments

        n, nb = self.n_samples, self.n_bins
        n_seg = self.n_seg
        seg = n // n_seg
        halo = nb - 1
        nfft = next_tpu_fft_size(seg + halo)
        s = self.delay_min
        if self.mode == "circular":
            xs = jnp.roll(x, s)
        elif s > 0:
            xs = jnp.concatenate([jnp.zeros(s, x.dtype), x[:-s]])
        elif s < 0:
            xs = jnp.concatenate([x[-s:], jnp.zeros(-s, x.dtype)])
        else:
            xs = x
        circ = self.mode == "circular"

        # Pass 1: plain reference-channel segment spectra (shared 3 ways).
        xs_seg = xs.reshape(n_seg, seg)
        xf_seg = jnp.fft.fft(xs_seg, n=nfft, axis=-1)
        # Pass 2: right-halo'd xs and y segments, one batched transform.
        ext = jnp.stack([
            _right_halo_segments(xs, n_seg, halo, circular=circ),
            _right_halo_segments(y, n_seg, halo, circular=circ)])
        ext_f = jnp.fft.fft(ext, n=nfft, axis=-1)
        cross = ext_f * jnp.conj(xf_seg)[None]
        acc = jnp.sum(cross, axis=1)  # (2, nfft)
        lags = jnp.fft.ifft(acc, axis=-1)[:, :nb]
        a = jnp.conj(lags[0])
        b = lags[1]

        mat = hermitian_toeplitz(a)
        if self.diag_load > 0.0:
            load = self.diag_load * jnp.real(a[0])
            mat = mat + load.astype(self.dtype) * jnp.eye(nb,
                                                          dtype=self.dtype)
        chol = jnp.linalg.cholesky(mat)
        w = jax.scipy.linalg.cho_solve((chol, True), b)
        ok = jnp.all(jnp.isfinite(w.real) & jnp.isfinite(w.imag))
        w = jnp.where(ok, w, jnp.zeros_like(w))

        # FIR apply by overlap-ADD, reusing xf_seg (pass 3 = one batched
        # inverse): each segment's linear convolution with w fits in nfft
        # (seg + nb - 1 <= nfft, no circular wrap), its nb-1 tail spills
        # into the next segment; first n samples of w*xs == overlap-add.
        wf = jnp.fft.fft(w, n=nfft)
        conv = jnp.fft.ifft(wf[None] * xf_seg, axis=-1)
        main = conv[:, :seg]
        tails = conv[:, seg:seg + halo]
        prev_tail = jnp.roll(tails, 1, axis=0)
        prev_tail = prev_tail.at[0].set(jnp.zeros(halo, dtype=conv.dtype))
        pad = jnp.zeros((n_seg, seg - halo), dtype=conv.dtype)
        filt = (main + jnp.concatenate([prev_tail, pad], axis=-1)
                ).reshape(n)
        y_clean = y - filt
        return jnp.where(ok, y_clean, y), ok
