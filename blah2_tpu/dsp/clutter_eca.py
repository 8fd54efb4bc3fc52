"""Alternative clutter cancellers: ECA-B and frequency-domain block NLMS.

The reference ships exactly one canceller — the full-CPI Wiener-Hopf FIR
filter (`src/process/clutter/WienerHopf.{h,cpp}`) — and anticipates a
"comparison" test tier for alternative algorithm benchmarking that it never
implements (`test/README.md`; empty dirs wired in `CMakeLists.txt:27-29`).
This module provides that tier's subject matter: two cancellers from the
passive-radar literature that handle *time-varying* clutter, which a single
weight vector per CPI cannot (Colone et al., "A Multistage Processing
Algorithm for Disturbance Removal and Target Detection in Passive Bistatic
Radar", IEEE TAES 45(2), 2009 — the ECA/ECA-B family).

Both are TPU-first designs:

``EcaBFilter`` (ECA-Batches) splits the CPI into B segments and solves an
independent least-squares clutter projection per segment. On TPU the B
solves are one *batched* program: batched segment FFT correlations, a
batched Hermitian-Toeplitz assembly, one batched Cholesky (MXU), and a
batched FFT convolution subtract. B=1 degenerates to the Wiener-Hopf
filter in "linear" mode (same normal equations) — asserted by tests.

``NlmsClutterFilter`` is an overlap-save frequency-domain block NLMS
adaptive filter (multidelay FDAF). The per-block dependency is inherently
sequential, so it runs as a `lax.scan` over blocks whose per-step work is
a handful of fixed-size FFTs and elementwise updates; all input block FFTs
are precomputed in one batched FFT before the scan. Its value is tracking
continuously-varying clutter at O(n log n) with bounded state.

Divergences from the reference: these are additions, not translations; the
config keys ``process.clutter.filter: {wiener, eca-b, nlms}`` and
``nBatches`` extend the reference schema (which has only
enable/delayMin/delayMax, `config/config.yml:29-32`).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from blah2_tpu.dsp.hamming import next_tpu_fft_size


def _shift_linear(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """Zero-filled shift of the reference channel by ``s`` = delay_min
    (the linear counterpart of `WienerHopf.cpp:66`'s circular shift)."""
    if s > 0:
        return jnp.concatenate([jnp.zeros(s, x.dtype), x[:-s]])
    if s < 0:
        return jnp.concatenate([x[-s:], jnp.zeros(-s, x.dtype)])
    return x


class EcaBFilter:
    """Extensive Cancellation Algorithm, batches variant (delay-only).

    Same lag window contract as :class:`WienerHopfFilter`:
    ``n_bins = delay_max - delay_min`` taps applied to the reference
    channel shifted by ``delay_min``. One weight vector per segment
    instead of one per CPI.
    """

    def __init__(
        self,
        delay_min: int,
        delay_max: int,
        n_samples: int,
        n_batches: int = 8,
        diag_load: float = 1e-4,
        dtype=jnp.complex64,
    ):
        self.delay_min = int(delay_min)
        self.delay_max = int(delay_max)
        self.n_bins = self.delay_max - self.delay_min
        self.n_samples = int(n_samples)
        self.n_batches = int(n_batches)
        if self.n_batches < 1:
            raise ValueError("n_batches must be >= 1")
        self.diag_load = float(diag_load)
        self.dtype = dtype
        # Segment length: pad the CPI with zeros to B equal segments. The
        # pad only dilutes the last segment's correlation estimates.
        self.n_seg = -(-self.n_samples // self.n_batches)
        if self.n_seg <= 2 * self.n_bins:
            raise ValueError(
                f"segment length {self.n_seg} too short for {self.n_bins} "
                f"clutter lags; reduce n_batches")
        self.nfft_corr = next_tpu_fft_size(self.n_seg + self.n_bins)
        self.nfft_conv = next_tpu_fft_size(self.n_seg + self.n_bins - 1)

        nb = self.n_bins
        i = np.arange(nb)[:, None]
        j = np.arange(nb)[None, :]
        self._abs_d = np.abs(i - j).astype(np.int32)
        self._lower = np.asarray(i > j)

    def __call__(self, x: jnp.ndarray, y: jnp.ndarray):
        """Filter one CPI. Returns ``(y_filtered, ok)``.

        ``ok`` is True iff every segment's solve succeeded; a failed
        segment passes its slice of y through unfiltered (the per-segment
        analog of the reference's skip-this-CPI contract,
        `src/blah2.cpp:268-275`).
        """
        n, nb, B, ns = self.n_samples, self.n_bins, self.n_batches, self.n_seg
        x = x[:n].astype(self.dtype)
        y = y[:n].astype(self.dtype)
        xs = _shift_linear(x, self.delay_min)

        pad = B * ns - n
        xsb = jnp.pad(xs, (0, pad)).reshape(B, ns)
        yb = jnp.pad(y, (0, pad)).reshape(B, ns)

        # Per-segment linear auto/cross correlations over the lag window,
        # batched along the segment axis (one batched FFT each).
        m = self.nfft_corr
        xf = jnp.fft.fft(xsb, n=m, axis=-1)
        yf = jnp.fft.fft(yb, n=m, axis=-1)
        a = jnp.conj(jnp.fft.ifft(xf * jnp.conj(xf), axis=-1)[:, :nb])
        b = jnp.fft.ifft(yf * jnp.conj(xf), axis=-1)[:, :nb]

        # Batched Hermitian Toeplitz (B, nb, nb) + diagonal loading (the
        # per-segment estimates see B× fewer samples than the full-CPI
        # filter, so loading is on by default).
        av = a[:, self._abs_d]
        mat = jnp.where(self._lower[None], jnp.conj(av), av)
        load = (self.diag_load * jnp.real(a[:, 0]) + 1e-30).astype(self.dtype)
        mat = mat + load[:, None, None] * jnp.eye(nb, dtype=self.dtype)[None]

        # One batched Cholesky + triangular solves across all segments.
        chol = jnp.linalg.cholesky(mat)
        w = jax.scipy.linalg.cho_solve((chol, True), b[..., None])[..., 0]
        ok_seg = jnp.all(jnp.isfinite(w.real) & jnp.isfinite(w.imag), axis=-1)
        w = jnp.where(ok_seg[:, None], w, jnp.zeros_like(w))

        # Batched FFT convolution of each segment's weights with its
        # reference slice; clutter spanning a segment boundary is only
        # cancelled by the segment it starts in (standard ECA-B edge
        # behavior).
        mc = self.nfft_conv
        filt = jnp.fft.ifft(
            jnp.fft.fft(w, n=mc, axis=-1) * jnp.fft.fft(xsb, n=mc, axis=-1),
            axis=-1)[:, :ns]
        y_clean = (yb - filt).reshape(B * ns)[:n]
        return y_clean, jnp.all(ok_seg)


class NlmsClutterFilter:
    """Overlap-save frequency-domain block NLMS clutter canceller.

    ``n_taps`` time-domain taps applied to the reference channel shifted by
    ``delay_min`` (same window contract as the Wiener filter with
    ``n_taps = delay_max - delay_min``). Weights adapt once per block of
    ``n_taps`` samples with per-bin power normalization, so the canceller
    tracks clutter whose gain drifts within the CPI.
    """

    def __init__(
        self,
        delay_min: int,
        delay_max: int,
        n_samples: int,
        mu: float = 0.5,
        power_beta: float = 0.9,
        eps: float = 1e-6,
        constrain: bool = True,
        dtype=jnp.complex64,
    ):
        self.delay_min = int(delay_min)
        self.n_bins = int(delay_max) - int(delay_min)
        self.n_samples = int(n_samples)
        self.mu = float(mu)
        self.power_beta = float(power_beta)
        self.eps = float(eps)
        self.constrain = bool(constrain)
        self.dtype = dtype
        # Block length L = taps rounded up to a power of two; FFT size 2L.
        self.block = 1 << (self.n_bins - 1).bit_length()
        self.nfft = 2 * self.block
        self.n_blocks = -(-self.n_samples // self.block)

    def __call__(self, x: jnp.ndarray, y: jnp.ndarray):
        """Filter one CPI. Returns ``(y_filtered, ok)`` (ok is always True:
        NLMS has no matrix solve to fail)."""
        n, L, M, K = self.n_samples, self.block, self.nfft, self.n_blocks
        x = x[:n].astype(self.dtype)
        y = y[:n].astype(self.dtype)
        xs = _shift_linear(x, self.delay_min)

        pad = K * L - n
        # Overlap-save input blocks: block k sees samples [kL-L, kL+L).
        xs_pad = jnp.concatenate([jnp.zeros(L, xs.dtype),
                                  jnp.pad(xs, (0, pad))])
        idx = jnp.arange(K)[:, None] * L + jnp.arange(M)[None, :]
        X = jnp.fft.fft(xs_pad[idx], axis=-1)          # (K, M), batched
        yk = jnp.pad(y, (0, pad)).reshape(K, L)

        real = jnp.float32 if self.dtype == jnp.complex64 else jnp.float64
        w0 = jnp.zeros(M, self.dtype)
        p0 = jnp.full(M, self.eps, real)

        def step(carry, inp):
            w, p = carry
            Xk, yb = inp
            yhat = jnp.fft.ifft(w * Xk)[L:]            # valid half
            e = yb - yhat
            E = jnp.fft.fft(jnp.concatenate([jnp.zeros(L, e.dtype), e]))
            p = self.power_beta * p + (1.0 - self.power_beta) * \
                jnp.abs(Xk).astype(real) ** 2
            g = self.mu * jnp.conj(Xk) * E / (p + self.eps).astype(self.dtype)
            w = w + g
            if self.constrain:
                # Gradient constraint: keep w an L-tap causal filter.
                wt = jnp.fft.ifft(w).at[L:].set(0.0)
                w = jnp.fft.fft(wt)
            return (w, p), e

        (_, _), err = jax.lax.scan(step, (w0, p0), (X, yk))
        y_clean = err.reshape(K * L)[:n]
        return y_clean, jnp.asarray(True)


def make_clutter_filter(clutter_cfg, n_samples: int, dtype=jnp.complex64,
                        mode: str = "circular", diag_load: float = 0.0):
    """Factory keyed on ``process.clutter.filter``: "wiener" (reference
    algorithm, default), "eca-b", or "nlms"."""
    from blah2_tpu.dsp.clutter import WienerHopfFilter

    kind = getattr(clutter_cfg, "filter", "wiener") or "wiener"
    kind = kind.lower().replace("_", "-")
    if kind in ("wiener", "wiener-hopf", "wienerhopf"):
        return WienerHopfFilter(
            clutter_cfg.delay_min, clutter_cfg.delay_max, n_samples,
            diag_load=diag_load, dtype=dtype, mode=mode)
    if kind in ("eca-b", "ecab", "eca"):
        return EcaBFilter(
            clutter_cfg.delay_min, clutter_cfg.delay_max, n_samples,
            n_batches=getattr(clutter_cfg, "n_batches", 8), dtype=dtype)
    if kind == "nlms":
        return NlmsClutterFilter(
            clutter_cfg.delay_min, clutter_cfg.delay_max, n_samples,
            dtype=dtype)
    raise ValueError(f"unknown clutter filter {kind!r}")
