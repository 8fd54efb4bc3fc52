"""Detection centroiding (duplicate suppression), TPU-native.

Keeps a detection iff no higher-SNR detection lies within a window of
±n_delay bins × ±(n_doppler · doppler_resolution) Hz — the reference's O(n²)
pairwise scan (`src/process/detection/Centroid.cpp:34-69`) expressed as one
masked (K × K) comparison over the fixed-capacity detection set.

Intentional divergence: the reference stores the window bounds in uint16,
so a detection with delay < n_delay wraps negative bounds around to ~65k and
silently never suppresses its neighbourhood (`Centroid.cpp:36-38`); we use
signed arithmetic. Window comparisons are strict (>, <) as in the reference.
"""

from __future__ import annotations

import jax.numpy as jnp

from blah2_tpu.dsp.cfar import CfarDetections


class CentroidFilter:
    def __init__(self, n_delay: int, n_doppler: int, doppler_resolution: float):
        self.n_delay = int(n_delay)
        self.n_doppler = int(n_doppler)
        self.doppler_resolution = float(doppler_resolution)

    def __call__(self, det: CfarDetections) -> CfarDetections:
        delay = det.delay
        doppler = det.doppler
        snr = det.snr
        valid = det.valid

        # Window centred on detection i ( (int)delay cast as in Centroid.cpp:36 ).
        d_int = jnp.floor(delay).astype(jnp.int32).astype(delay.dtype)
        d_lo = d_int - self.n_delay
        d_hi = d_int + self.n_delay
        f_half = self.n_doppler * self.doppler_resolution
        f_lo = doppler - f_half
        f_hi = doppler + f_half

        close = (
            (delay[None, :] > d_lo[:, None])
            & (delay[None, :] < d_hi[:, None])
            & (doppler[None, :] > f_lo[:, None])
            & (doppler[None, :] < f_hi[:, None])
        )
        not_self = ~jnp.eye(delay.shape[0], dtype=bool)
        beaten = close & not_self & valid[None, :] & (
            snr[:, None] < snr[None, :]
        )
        keep = valid & ~jnp.any(beaten, axis=1)
        return det._replace(valid=keep, count=jnp.sum(keep).astype(jnp.int32))
