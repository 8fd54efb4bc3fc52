"""Segmented (overlap-save) correlation and FIR ops.

These decompose the clutter filter's full-CPI circular correlations and FIR
convolution (reference: one giant FFT per product, `WienerHopf.cpp:71-160`)
into batched small FFTs over contiguous time segments plus a spectral
accumulation. Identities (validated in tests):

  ifft(fft(y)·conj(fft(x)))[k] = Σ_i y[(i+k) mod n]·conj(x[i])

so the lag-window correlation splits into per-segment sums with an
(n_lags−1)-sample *right* halo, and the causal FIR convolution splits with an
(n_lags−1)-sample *left* halo (zero before the start: linear convolution).

Why: (a) batches of ~16k-point FFTs beat one multi-megapoint FFT on TPU;
(b) the segment axis is exactly the CPI/time-axis sharding dimension — under
`jax.sharding` the per-segment partials reduce with one small all-reduce and
the halos become neighbour collective-permutes, which XLA inserts
automatically (SURVEY §2.5: the radar analog of sequence parallelism).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from blah2_tpu.dsp.hamming import next_tpu_fft_size


def choose_segments(n: int, min_segments: int = 16,
                    multiple_of: int = 1) -> int:
    """Pick a segment count: a multiple of ``multiple_of`` dividing ``n``,
    at least ``min_segments``, with segments no shorter than 1024 samples.
    Returns 0 if none exists."""
    best = 0
    k = multiple_of
    while k * 1024 <= n:
        if n % k == 0 and k >= min_segments:
            best = k
            break
        k += multiple_of
    return best


def _right_halo_segments(v: jnp.ndarray, n_seg: int, halo: int,
                         circular: bool = True) -> jnp.ndarray:
    """(…, n) → (…, n_seg, S+halo) with right halo.

    ``circular=True``: the last segment's halo wraps to the start (circular
    correlation). ``circular=False``: the last segment's halo is zero
    (linear correlation of the zero-extended signal).
    """
    s = v.shape[-1] // n_seg
    segs = v.reshape(v.shape[:-1] + (n_seg, s))
    nxt = jnp.roll(segs, -1, axis=-2)[..., :halo]
    if not circular:
        idx = jnp.arange(n_seg).reshape((1,) * (v.ndim - 1) + (n_seg, 1))
        nxt = jnp.where(idx == n_seg - 1, jnp.zeros_like(nxt), nxt)
    return jnp.concatenate([segs, nxt], axis=-1)


def _left_halo_segments_linear(v: jnp.ndarray, n_seg: int, halo: int) -> jnp.ndarray:
    """(…, n) → (…, n_seg, halo+S) with linear (zero-start) left halo."""
    s = v.shape[-1] // n_seg
    segs = v.reshape(v.shape[:-1] + (n_seg, s))
    prev = jnp.roll(segs, 1, axis=-2)[..., s - halo :]
    idx = jnp.arange(n_seg).reshape((1,) * (v.ndim - 1) + (n_seg, 1))
    prev = jnp.where(idx == 0, jnp.zeros_like(prev), prev)
    return jnp.concatenate([prev, segs], axis=-1)


def segmented_circular_corr(y: jnp.ndarray, x: jnp.ndarray, n_lags: int,
                            n_seg: int, circular: bool = True) -> jnp.ndarray:
    """corr[k] = Σ_i y[(i+k) mod n]·conj(x[i]) for k < n_lags.

    Equivalent to ``ifft(fft(y)·conj(fft(x)))[:n_lags]`` computed via
    ``n_seg`` batched FFTs with spectral accumulation. Works on (…, n).
    With ``circular=False`` the wrap-around terms are dropped — the LINEAR
    correlation of the zero-extended signals, i.e. the first ``n_lags``
    outputs of ``ifft(fft(y, m)·conj(fft(x, m)))`` for any m >= n+n_lags-1.
    """
    n = x.shape[-1]
    s = n // n_seg
    halo = n_lags - 1
    nfft = next_tpu_fft_size(s + halo)
    y_ext = _right_halo_segments(y, n_seg, halo, circular=circular)
    x_seg = x.reshape(x.shape[:-1] + (n_seg, s))
    spec = jnp.fft.fft(y_ext, n=nfft, axis=-1) * jnp.conj(
        jnp.fft.fft(x_seg, n=nfft, axis=-1)
    )
    acc = jnp.sum(spec, axis=-2)
    return jnp.fft.ifft(acc, axis=-1)[..., :n_lags]


def segmented_fir(w: jnp.ndarray, x: jnp.ndarray, n_seg: int) -> jnp.ndarray:
    """Causal FIR: out[i] = Σ_k w[k]·x[i−k] (zeros before start), length n.

    Overlap-save with a left halo; equivalent to the first n samples of the
    linear convolution w*x. w has shape (…, n_lags), x has shape (…, n).
    """
    n = x.shape[-1]
    n_lags = w.shape[-1]
    s = n // n_seg
    halo = n_lags - 1
    nfft = next_tpu_fft_size(s + halo)
    x_ext = _left_halo_segments_linear(x, n_seg, halo)
    wf = jnp.fft.fft(w, n=nfft, axis=-1)
    c = jnp.fft.ifft(
        jnp.fft.fft(x_ext, n=nfft, axis=-1) * wf[..., None, :], axis=-1
    )
    out = c[..., halo : halo + s]
    return out.reshape(x.shape[:-1] + (n,))
