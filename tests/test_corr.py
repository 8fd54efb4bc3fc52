"""Segmented correlation/FIR ops vs FFT identities."""

import jax.numpy as jnp
import numpy as np

from blah2_tpu.ops.corr import (
    choose_segments,
    segmented_circular_corr,
    segmented_fir,
)


def test_choose_segments():
    k = choose_segments(1_500_000, min_segments=16, multiple_of=8)
    assert k >= 16 and k % 8 == 0 and 1_500_000 % k == 0
    n = choose_segments(1 << 20, min_segments=16, multiple_of=4)
    assert n >= 16 and (1 << 20) % n == 0
    assert choose_segments(1031, min_segments=2, multiple_of=2) == 0  # prime


def test_circular_corr_matches_fft():
    rng = np.random.default_rng(0)
    n, nb = 4096, 37
    x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    y = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    want = np.fft.ifft(np.fft.fft(y) * np.conj(np.fft.fft(x)))[:nb]
    got = np.asarray(segmented_circular_corr(
        jnp.asarray(y), jnp.asarray(x), nb, n_seg=8))
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_circular_corr_batched():
    rng = np.random.default_rng(1)
    n, nb, b = 2048, 16, 3
    x = rng.standard_normal((b, n)) + 1j * rng.standard_normal((b, n))
    y = rng.standard_normal((b, n)) + 1j * rng.standard_normal((b, n))
    got = np.asarray(segmented_circular_corr(
        jnp.asarray(y), jnp.asarray(x), nb, n_seg=4))
    for i in range(b):
        want = np.fft.ifft(np.fft.fft(y[i]) * np.conj(np.fft.fft(x[i])))[:nb]
        np.testing.assert_allclose(got[i], want, rtol=1e-9, atol=1e-9)


def test_fir_matches_linear_convolution():
    rng = np.random.default_rng(2)
    n, nb = 4096, 33
    x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    w = rng.standard_normal(nb) + 1j * rng.standard_normal(nb)
    want = np.convolve(w, x)[:n]
    got = np.asarray(segmented_fir(jnp.asarray(w), jnp.asarray(x), n_seg=8))
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_fir_batched():
    rng = np.random.default_rng(3)
    n, nb, b = 1024, 9, 2
    x = rng.standard_normal((b, n)) + 1j * rng.standard_normal((b, n))
    w = rng.standard_normal((b, nb)) + 1j * rng.standard_normal((b, nb))
    got = np.asarray(segmented_fir(jnp.asarray(w), jnp.asarray(x), n_seg=4))
    for i in range(b):
        want = np.convolve(w[i], x[i])[:n]
        np.testing.assert_allclose(got[i], want, rtol=1e-9, atol=1e-9)
