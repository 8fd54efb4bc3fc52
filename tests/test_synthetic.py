"""SyntheticSource stream-continuity regression tests.

The runtime assembles CPI windows from arbitrary contiguous runs of the
capture stream (ring overflow, overlap, chunked ingest all shift the
alignment), so the synthetic stream must be phase- and delay-continuous
across block boundaries. Round 1 generated each block independently
(Doppler phase restarted at t=0, delayed copies zeroed at block heads),
which decohered targets in any straddling CPI and surfaced as
order-dependent test_runtime failures.
"""

import numpy as np

from blah2_tpu.capture.synthetic import SyntheticSource, TargetSpec


def test_stream_continuous_across_blocks():
    fs = 200_000
    src = SyntheticSource(
        fs, 204.64e6,
        [TargetSpec(40, -77.0, 0.05), TargetSpec(85, 44.0, 0.03)],
        clutter_amplitude=2.0, noise_amplitude=1e-3,
        block_samples=30_000, seed=1)
    blocks = [src.next_block() for _ in range(3)]
    x = np.concatenate([b[0] for b in blocks])
    y = np.concatenate([b[1] for b in blocks])

    # The stream must equal the single-shot model built from the full x:
    # y[t] = clutter·x[t] + Σ a·x[t−d]·exp(j2π f t/fs) + noise.
    n = len(x)
    t = np.arange(n) / fs
    model = 2.0 * x
    for d, f, a in ((40, -77.0, 0.05), (85, 44.0, 0.03)):
        xd = np.zeros_like(x)
        xd[d:] = x[:-d]
        model += a * xd * np.exp(2j * np.pi * f * t)
    resid = y - model
    # Residual is only the 1e-3 noise — no boundary glitches.
    assert np.max(np.abs(resid)) < 0.01


def test_boundary_straddling_cpi_keeps_target_coherent():
    """A CPI window deliberately straddling a block boundary must yield the
    same target peak as an aligned one (Doppler coherence preserved)."""
    fs, n_cpi = 200_000, 20_000
    src = SyntheticSource(fs, 204.64e6, [TargetSpec(40, -77.0, 0.05)],
                          clutter_amplitude=0.0, noise_amplitude=1e-4,
                          block_samples=30_000, seed=1)
    b = [src.next_block() for _ in range(2)]
    x = np.concatenate([bb[0] for bb in b])
    y = np.concatenate([bb[1] for bb in b])

    def peak_power(x_w, y_w):
        # Narrowband matched check: correlate y against the delayed,
        # Doppler-compensated reference.
        t = np.arange(len(x_w)) / fs
        xd = np.zeros_like(x_w)
        xd[40:] = x_w[:-40]
        corr = np.vdot(xd * np.exp(2j * np.pi * -77.0 * t), y_w)
        return np.abs(corr) / np.sum(np.abs(xd) ** 2)

    aligned = peak_power(x[:n_cpi], y[:n_cpi])
    straddle = peak_power(x[20_000:40_000], y[20_000:40_000])
    # Both recover the target amplitude (0.05) within noise.
    assert abs(aligned - 0.05) < 0.005
    assert abs(straddle - 0.05) < 0.005
