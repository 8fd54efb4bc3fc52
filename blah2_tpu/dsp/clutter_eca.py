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
independent least-squares clutter projection per segment. The solve is the
**exact covariance-method LS** (minimise ``‖y_seg − X_seg·w‖`` where
``X_seg[t,k] = x_shift[t₀+t−k]`` draws real cross-boundary history, with the
convention ``x = 0`` outside the CPI): the Gram matrix is assembled from a
batched FFT lag-correlation plus two tiny batched edge-correction matmuls
(``G = Toeplitz(r) + P^H·H − Q^H·T``), so it costs O(n log n) rather than the
O(n·nb²) of an explicit data matrix while matching it to machine precision.
A Toeplitz *approximation* (zero-padded per-segment correlations, as a naive
port of the reference's full-CPI method would do) loses 10-25 dB of
suppression on drifting clutter at small segments — measured during round 2.
On TPU the B solves are one batched program: batched FFT correlations,
(B, nb, nb) edge matmuls on the MXU, one batched Cholesky, and a batched FFT
convolution subtract over history-extended segments (overlap-save, so
clutter spanning a segment boundary is cancelled too).

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
from blah2_tpu.ops.toeplitz import toeplitz_ij, toeplitz_kj


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
    instead of one per CPI, each the **exact** covariance-method LS
    solution for its segment (see module docstring) — cross-boundary
    clutter history included, ``x_shift = 0`` outside the CPI.
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
        nb, L = self.n_bins, self.n_seg
        # Extended segment: nb−1 history + L body + nb−1 lookahead samples;
        # one FFT size serves both the lag correlations (needs ≥ len(ext))
        # and the weight convolution (needs ≥ len(ext) + nb − 1).
        self.n_ext = L + 2 * (nb - 1)
        self.nfft = next_tpu_fft_size(self.n_ext + nb)

        # Edge-window mask for the head/tail Gram corrections; the
        # head/tail/Toeplitz matrices themselves are built gather-free
        # from vector slices (ops.toeplitz — the index-matrix gathers
        # measured ~1.7 ms each on v5e).
        v = np.arange(nb)[:, None]
        k = np.arange(nb)[None, :]
        self._edge_mask = np.asarray(v < k)                         # [v<j]

    def __call__(self, x: jnp.ndarray, y: jnp.ndarray):
        """Filter one CPI. Returns ``(y_filtered, ok)``.

        ``ok`` is True iff every segment's solve succeeded; a failed
        segment passes its slice of y through unfiltered (the per-segment
        analog of the reference's skip-this-CPI contract,
        `src/blah2.cpp:268-275`).
        """
        n, nb, B, L = self.n_samples, self.n_bins, self.n_batches, self.n_seg
        x = x[:n].astype(self.dtype)
        y = y[:n].astype(self.dtype)
        xs = _shift_linear(x, self.delay_min)

        pad = B * L - n
        # History/lookahead-extended segments, built GATHER-FREE from the
        # (B, L) reshape with rolled neighbour slices (a (B, n_ext) index
        # -matrix gather measured ~20 ms on v5e at the production CPI —
        # the same pathology as the r4 Toeplitz index gather, at 3600x
        # the element count).
        seg = jnp.pad(xs, (0, pad)).reshape(B, L)              # (B, L)
        hist = jnp.roll(seg, 1, axis=0)[:, L - (nb - 1):]
        hist = hist.at[0].set(jnp.zeros(nb - 1, dtype=seg.dtype))
        ahead = jnp.roll(seg, -1, axis=0)[:, :nb - 1]
        ahead = ahead.at[B - 1].set(jnp.zeros(nb - 1, dtype=seg.dtype))
        ext = jnp.concatenate([hist, seg, ahead], axis=-1)     # (B, n_ext)
        yb = jnp.pad(y, (0, pad)).reshape(B, L)

        # Batched FFT lag-correlations. c_s[d] = Σ_w s[w]·conj(ext[w+d]):
        #   r_m  = c_seg[m + nb − 1]   (m ∈ (−nb, nb): Toeplitz baseline)
        #   b[k] = c_y[nb − 1 − k]     (exact X^H y, history included)
        m = self.nfft
        ext_f = jnp.fft.fft(ext, n=m, axis=-1)
        c_seg = jnp.conj(jnp.fft.ifft(
            ext_f * jnp.conj(jnp.fft.fft(seg, n=m, axis=-1)), axis=-1))
        c_y = jnp.conj(jnp.fft.ifft(
            ext_f * jnp.conj(jnp.fft.fft(yb, n=m, axis=-1)), axis=-1))
        r_full = c_seg[:, :2 * nb - 1]                         # (B, 2nb−1)
        b = c_y[:, :nb][:, ::-1]                               # b[k]=c_y[nb−1−k]

        # Exact Gram G = X^H X: Toeplitz baseline + edge corrections
        # G[k,j] = r[j−k] + (P^H H)[k,j] − (Q^H T)[k,j] where
        #   P[v,k] = xs[t₀+v−k],       H[v,j] = [v<j]·xs[t₀+v−j],
        #   Q[v,k] = xs[t₀+L−k+v],     T[v,j] = [v<j]·xs[t₀+L−j+v].
        # Verified against an explicit X^H X to machine precision.
        # P[v,k] = ext[nb−1+v−k], Q[v,k] = ext[nb−1+L+v−k],
        # G[v,k] = r_full[nb−1+k−v] — all Toeplitz from vector slices.
        # Q's corner (v,k)=(nb−1,0) indexes one past ext; its every
        # pairing in Q^H·T hits the [v<j] mask, so any value is exact —
        # pad a zero (the gather build clamped, equally arbitrary).
        P = toeplitz_ij(ext[:, :2 * nb - 1])                   # (B, nb, nb)
        Q = toeplitz_ij(jnp.pad(ext, ((0, 0), (0, 1)))[:, L:L + 2 * nb - 1])
        Hm = jnp.where(self._edge_mask[None], P, 0)
        Tm = jnp.where(self._edge_mask[None], Q, 0)
        G = toeplitz_kj(r_full)
        G = G + jnp.einsum("bvk,bvj->bkj", jnp.conj(P), Hm)
        G = G - jnp.einsum("bvk,bvj->bkj", jnp.conj(Q), Tm)
        load = (self.diag_load * jnp.real(r_full[:, nb - 1]) + 1e-30
                ).astype(self.dtype)
        G = G + load[:, None, None] * jnp.eye(nb, dtype=self.dtype)[None]

        # One batched Cholesky + triangular solves across all segments.
        chol = jnp.linalg.cholesky(G)
        w = jax.scipy.linalg.cho_solve((chol, True), b[..., None])[..., 0]
        ok_seg = jnp.all(jnp.isfinite(w.real) & jnp.isfinite(w.imag), axis=-1)
        w = jnp.where(ok_seg[:, None], w, jnp.zeros_like(w))

        # Batched FFT convolution of each segment's weights with its
        # history-extended reference block (overlap-save): valid outputs
        # start at lag nb−1, so cross-boundary clutter is cancelled too.
        filt = jnp.fft.ifft(
            jnp.fft.fft(w, n=m, axis=-1) * ext_f, axis=-1
        )[:, nb - 1:nb - 1 + L]
        y_clean = (yb - filt).reshape(B * L)[:n]
        return y_clean, jnp.all(ok_seg)


class NlmsClutterFilter:
    """Overlap-save frequency-domain block NLMS clutter canceller.

    ``n_taps`` time-domain taps applied to the reference channel shifted by
    ``delay_min`` (same window contract as the Wiener filter with
    ``n_taps = delay_max - delay_min``). Weights adapt once per block of
    ``n_taps`` samples with per-bin power normalization, so the canceller
    tracks clutter whose gain drifts within the CPI.

    ``mu`` sets the adaptation bandwidth (~``mu·fs/block/2π`` Hz): it must
    stay *below* the lowest target Doppler of interest, or the canceller
    tracks — and cancels — slow targets inside the clutter delay window.
    The 0.1 default keeps ~20 Hz bandwidth at the unit-test geometry while
    converging on stationary clutter within a fraction of a CPI; override
    via ``process.clutter.mu``.
    """

    def __init__(
        self,
        delay_min: int,
        delay_max: int,
        n_samples: int,
        mu: float = 0.1,
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
        # Overlap-save input blocks: block k sees samples [kL-L, kL+L),
        # built gather-free as [previous block | block] (an index-matrix
        # gather of K*2L elements is ~10-20 ms on v5e; see EcaBFilter).
        blocks = jnp.pad(xs, (0, pad)).reshape(K, L)
        prev = jnp.roll(blocks, 1, axis=0)
        prev = prev.at[0].set(jnp.zeros(L, dtype=blocks.dtype))
        X = jnp.fft.fft(jnp.concatenate([prev, blocks], axis=-1),
                        axis=-1)                        # (K, M), batched
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
        # Caller's diag_load wins when set; ECA-B otherwise defaults to
        # 1e-4 loading because its per-segment estimates see B× fewer
        # samples than the full-CPI Wiener filter.
        return EcaBFilter(
            clutter_cfg.delay_min, clutter_cfg.delay_max, n_samples,
            n_batches=getattr(clutter_cfg, "n_batches", 8),
            diag_load=diag_load if diag_load > 0.0 else 1e-4, dtype=dtype)
    if kind == "nlms":
        return NlmsClutterFilter(
            clutter_cfg.delay_min, clutter_cfg.delay_max, n_samples,
            mu=getattr(clutter_cfg, "mu", 0.1), dtype=dtype)
    raise ValueError(f"unknown clutter filter {kind!r}")
