"""Reference-semantics float64 numpy implementations for parity testing.

These follow the *algorithms* of the reference processors (cited per function)
in straightforward per-pulse / per-cell numpy, independently of the TPU
implementations in `blah2_tpu.dsp`, so the two can be cross-validated.
"""

from __future__ import annotations

import numpy as np

from blah2_tpu.dsp.hamming import next_hamming


def ambiguity_geometry(delay_min, delay_max, doppler_min, doppler_max, fs, n,
                       round_hamming=True):
    """Derived constants per `Ambiguity.cpp:16-80`."""
    n_delay_bins = delay_max - delay_min + 1
    middle = (doppler_min + doppler_max) / 2.0
    res = 1.0 / (float(n) / float(fs))
    i = 1
    count = 0
    while middle + i * res <= doppler_max:
        count += 1
        i += 1
    n_doppler_bins = 2 * count + 1
    n_corr = n // n_doppler_bins
    cpi = float(n_corr) * n_doppler_bins / fs
    nfft = 2 * n_corr - 1
    if round_hamming:
        nfft = next_hamming(nfft)
    return n_delay_bins, n_doppler_bins, n_corr, cpi, nfft, middle


def ambiguity_reference(x, y, delay_min, delay_max, doppler_min, doppler_max,
                        fs, n, round_hamming=True):
    """Per-pulse loop CAF following `Ambiguity.cpp:92-172`."""
    (n_delay, n_dop, n_corr, cpi, nfft, middle) = ambiguity_geometry(
        delay_min, delay_max, doppler_min, doppler_max, fs, n, round_hamming
    )
    x = np.asarray(x, dtype=np.complex128).copy()
    y = np.asarray(y, dtype=np.complex128)
    if middle != 0:
        idx = np.arange(len(x), dtype=np.float64)
        x = x * np.exp(2j * np.pi * middle * idx / fs)

    rows = np.zeros((n_dop, n_delay), dtype=np.complex128)
    for p in range(n_dop):
        xi = np.zeros(nfft, dtype=np.complex128)
        yi = np.zeros(nfft, dtype=np.complex128)
        xi[:n_corr] = x[p * n_corr : (p + 1) * n_corr]
        yi[:n_corr] = y[p * n_corr : (p + 1) * n_corr]
        z = np.fft.ifft(np.fft.fft(yi) * np.conj(np.fft.fft(xi)))
        for j in range(n_delay):
            rows[p, j] = z[(delay_min + j) % nfft]

    out = np.zeros_like(rows)
    for c in range(n_delay):
        f = np.fft.fft(rows[:, c])
        for j in range(n_dop):
            out[j, c] = f[(j + n_dop // 2 + 1) % n_dop]
    return out


def wiener_hopf_reference(x, y, delay_min, delay_max):
    """Wiener-Hopf clutter filter following `WienerHopf.cpp:58-163`.

    Returns (y_filtered, w). Uses the reference's exact FFT lengths.
    """
    x = np.asarray(x, dtype=np.complex128)
    y = np.asarray(y, dtype=np.complex128)
    n = len(x)
    nb = delay_max - delay_min

    xs = np.array([x[((i - delay_min) % n + n) % n] for i in range(n)])
    xf = np.fft.fft(xs)
    yf = np.fft.fft(y)

    a = np.conj(np.fft.ifft(xf * np.conj(xf))[:nb])
    b = np.fft.ifft(yf * np.conj(xf))[:nb]

    mat = np.zeros((nb, nb), dtype=np.complex128)
    for i in range(nb):
        for j in range(nb):
            mat[i, j] = np.conj(a[i - j]) if i > j else a[j - i]

    w = np.linalg.solve(mat, b)

    nfilt = nb + n + 1
    filt = np.fft.ifft(
        np.fft.fft(np.r_[w, np.zeros(nfilt - nb)])
        * np.fft.fft(np.r_[xs, np.zeros(nfilt - n)])
    )
    return y - filt[:n], w


def cfar_reference(z, delay_axis, doppler_axis, noise_power, pfa, n_guard,
                   n_train, min_delay, min_doppler):
    """Per-cell CA-CFAR following `CfarDetector1D.cpp:23-100`.

    Returns (delay, doppler, snr) lists in the reference's scan order.
    """
    z = np.asarray(z)
    n_rows, n_cols = z.shape
    out_delay, out_doppler, out_snr = [], [], []
    for i in range(n_rows):
        if abs(doppler_axis[i]) < min_doppler:
            continue
        row_sq = np.abs(z[i] * z[i])
        row_snr = 10.0 * np.log10(np.abs(z[i])) - noise_power
        for j in range(n_cols):
            if delay_axis[j] < min_delay:
                continue
            train = []
            for k in range(j - n_guard - n_train, j - n_guard):
                if 0 < k < n_cols:
                    train.append(k)
            for k in range(j + n_guard + 1, j + n_guard + n_train + 1):
                if 0 <= k < n_cols:
                    train.append(k)
            n_cells = len(train)
            alpha = n_cells * (pfa ** (-1.0 / n_cells) - 1.0)
            threshold = alpha * np.mean(row_sq[train])
            if row_sq[j] > threshold:
                out_delay.append(j + delay_axis[0])
                out_doppler.append(doppler_axis[i])
                out_snr.append(row_snr[j])
    return out_delay, out_doppler, out_snr


def os_cfar_reference(z, delay_axis, doppler_axis, noise_power, pfa,
                      n_guard, n_train, min_delay, min_doppler, rank=0.75,
                      alpha_fn=None):
    """Per-cell OS-CFAR oracle: same window geometry/quirks as
    `cfar_reference` but thresholding on the k-th smallest train power,
    k = ceil(rank·N). ``alpha_fn(pfa, n, k)`` supplies the threshold
    multiplier (validated independently by the Monte-Carlo Pfa test)."""
    if alpha_fn is None:
        from blah2_tpu.dsp.cfar import os_cfar_alpha as alpha_fn
    z = np.asarray(z)
    n_rows, n_cols = z.shape
    out_delay, out_doppler, out_snr = [], [], []
    for i in range(n_rows):
        if abs(doppler_axis[i]) < min_doppler:
            continue
        row_sq = np.abs(z[i] * z[i])
        row_snr = 10.0 * np.log10(np.abs(z[i])) - noise_power
        for j in range(n_cols):
            if delay_axis[j] < min_delay:
                continue
            train = []
            for k in range(j - n_guard - n_train, j - n_guard):
                if 0 < k < n_cols:
                    train.append(k)
            for k in range(j + n_guard + 1, j + n_guard + n_train + 1):
                if 0 <= k < n_cols:
                    train.append(k)
            n_cells = len(train)
            if n_cells == 0:
                continue
            kk = max(1, int(np.ceil(rank * n_cells)))
            kth = np.sort(row_sq[train])[kk - 1]
            threshold = alpha_fn(pfa, n_cells, kk) * kth
            if row_sq[j] > threshold:
                out_delay.append(j + delay_axis[0])
                out_doppler.append(doppler_axis[i])
                out_snr.append(row_snr[j])
    return out_delay, out_doppler, out_snr
