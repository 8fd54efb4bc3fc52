"""Cell-averaging CFAR across delay, per Doppler row, TPU-native.

Parity with reference `src/process/detection/CfarDetector1D.{h,cpp}`:
  - CFAR runs across delay only, per Doppler row, to avoid training on the
    zero-Doppler clutter ridge (`CfarDetector1D.h:4`);
  - threshold α = N·(pfa^(−1/N) − 1) over the N valid train cells, with
    n_guard guard cells each side (`CfarDetector1D.cpp:57-83`); the train-cell
    count shrinks at map edges exactly as the reference's index clipping does
    (including the quirk that left-side train cells require k > 0, i.e.
    column 0 never trains, `CfarDetector1D.cpp:59-65`);
  - rows with |doppler| < min_doppler and cells with delay < min_delay are
    skipped (`CfarDetector1D.cpp:39-43,52-56`);
  - cell power is |z|² and reported SNR is 10·log10|z| − noisePower
    (`CfarDetector1D.cpp:47-48`).

TPU-first design: the per-cell loops become a handful of shifted-slice
accumulations over the whole map (one fused elementwise XLA program), and the
variable-length detection list becomes a fixed-capacity (max_detections)
index/mask extraction via `jnp.nonzero(..., size=)` in the reference's
row-major scan order — dynamic shapes never enter the jitted graph.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


class CfarDetections(NamedTuple):
    """Fixed-capacity detection set (invalid slots masked out)."""

    row: jnp.ndarray      # Doppler row index into the map, int32 (K,)
    col: jnp.ndarray      # delay column index into the map, int32 (K,)
    delay: jnp.ndarray    # delay in bins (col + delay_axis[0]), float32 (K,)
    doppler: jnp.ndarray  # Doppler in Hz, float32 (K,)
    snr: jnp.ndarray      # SNR in dB, float32 (K,)
    valid: jnp.ndarray    # bool (K,)
    count: jnp.ndarray    # total detections found (may exceed K), int32 scalar


def cfar_train_count(n_guard: int, n_train: int, n_cols: int) -> np.ndarray:
    """Per-column valid train-cell count N, shrunk at map edges exactly as
    the reference's index clipping does, including the k>0 left-train
    quirk (`CfarDetector1D.cpp:57-83`)."""
    g, t = int(n_guard), int(n_train)
    j = np.arange(n_cols)
    cnt = np.zeros(n_cols, dtype=np.int64)
    for o in range(g + 1, g + t + 1):
        cnt += (j - o > 0).astype(np.int64)   # k > 0 (reference quirk)
        cnt += (j + o < n_cols).astype(np.int64)
    return cnt


def cfar_threshold_scale(pfa: float, n_guard: int, n_train: int,
                         n_cols: int) -> np.ndarray:
    """Per-column CFAR threshold scale α/N (applied to the train *sum*).

    α = N·(pfa^(−1/N) − 1) with the per-column valid train-cell count N
    from :func:`cfar_train_count`; ∞ where no train cell exists.
    """
    cnt = cfar_train_count(n_guard, n_train, n_cols)
    with np.errstate(divide="ignore", invalid="ignore"):
        alpha = cnt * (float(pfa) ** (-1.0 / np.maximum(cnt, 1)) - 1.0)
    return np.where(cnt > 0, alpha / np.maximum(cnt, 1), np.inf)


def os_cfar_alpha(pfa: float, n: int, k: int) -> float:
    """OS-CFAR threshold multiplier α for train size ``n`` and order
    statistic rank ``k`` (1-indexed, k ≤ n).

    For an exponential (square-law-detected Rayleigh noise) background,
    Pfa(α) = ∏_{i=0}^{k−1} (n−i)/(n−i+α)  — monotone decreasing in α
    (Rohling 1983); solved here by bisection in log space.
    """
    if n <= 0:
        return float("inf")
    k = min(max(int(k), 1), int(n))
    i = np.arange(k, dtype=np.float64)
    log_pfa = np.log(float(pfa))

    def f(alpha: float) -> float:
        return float(np.sum(np.log(n - i) - np.log(n - i + alpha))) - log_pfa

    lo, hi = 0.0, 1.0
    while f(hi) > 0.0:
        hi *= 2.0
        if hi > 1e12:  # pfa ~ 0: unreachable threshold
            return float("inf")
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if f(mid) > 0.0:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


def extract_topk(flat_mask: jnp.ndarray, n_cols: int, max_detections: int):
    """Fixed-capacity index extraction in row-major scan order.

    top_k of (index where hit, else N) yields the first K hit indices —
    vmappable and TPU-friendly, unlike nonzero. Returns (row, col, valid,
    count)."""
    n_cells = flat_mask.shape[0]
    count = jnp.sum(flat_mask).astype(jnp.int32)
    score = jnp.where(flat_mask, jnp.arange(n_cells, dtype=jnp.int32),
                      n_cells)
    idx = -jax.lax.top_k(-score, max_detections)[0]
    valid = idx < n_cells
    idx = jnp.minimum(idx, n_cells - 1)
    row = (idx // n_cols).astype(jnp.int32)
    col = (idx % n_cols).astype(jnp.int32)
    return row, col, valid, count


class CfarDetector:
    def __init__(
        self,
        pfa: float,
        n_guard: int,
        n_train: int,
        min_delay: int,
        min_doppler: float,
        delay_axis: np.ndarray,
        doppler_axis: np.ndarray,
        max_detections: int = 128,
        real_dtype=jnp.float32,
    ):
        self.pfa = float(pfa)
        self.n_guard = int(n_guard)
        self.n_train = int(n_train)
        self.min_delay = int(min_delay)
        self.min_doppler = float(min_doppler)
        self.max_detections = int(max_detections)
        self.real_dtype = real_dtype

        delay_axis = np.asarray(delay_axis)
        doppler_axis = np.asarray(doppler_axis, dtype=np.float64)
        self.n_rows = len(doppler_axis)
        self.n_cols = len(delay_axis)

        self._row_ok = np.abs(doppler_axis) >= self.min_doppler
        self._col_ok = np.asarray(delay_axis >= self.min_delay)
        self._delay_axis = delay_axis.astype(np.float32)
        self._doppler_axis = doppler_axis.astype(np.float32)

        # alpha/cnt scales the train *sum* directly: threshold = alpha * sum/cnt.
        scale = cfar_threshold_scale(self.pfa, self.n_guard, self.n_train,
                                     self.n_cols)
        self._thresh_scale = scale.astype(np.dtype(real_dtype))

    def __call__(self, z: jnp.ndarray, noise_power: jnp.ndarray) -> CfarDetections:
        """Run CFAR on a complex delay-Doppler map.

        Args:
          z: complex map, shape (n_rows, n_cols).
          noise_power: scalar map noise power in dB.
        Returns:
          CfarDetections with at most ``max_detections`` entries.
        """
        g, t = self.n_guard, self.n_train
        nr, nc = self.n_rows, self.n_cols
        maxo = g + t

        mag = jnp.abs(z).astype(self.real_dtype)
        power = mag * mag
        snr_db = 10.0 * jnp.log10(mag) - noise_power.astype(self.real_dtype)

        # Train sums via shifted slices of zero-padded maps.
        p_left = power.at[:, 0].set(0.0)  # left train cells require k > 0
        pl = jnp.pad(p_left, ((0, 0), (maxo, 0)))
        pr = jnp.pad(power, ((0, 0), (0, maxo)))
        train = jnp.zeros_like(power)
        for o in range(g + 1, maxo + 1):
            train = train + pl[:, maxo - o : maxo - o + nc]
            train = train + pr[:, o : o + nc]

        threshold = self._thresh_scale[None, :] * train
        detect = (
            (power > threshold)
            & self._row_ok[:, None]
            & self._col_ok[None, :]
        )

        # Fixed-capacity extraction in the reference's row-major scan order.
        row, col, valid, count = extract_topk(
            detect.reshape(-1), nc, self.max_detections)
        return CfarDetections(
            row=row,
            col=col,
            delay=jnp.asarray(self._delay_axis)[col],
            doppler=jnp.asarray(self._doppler_axis)[row],
            snr=snr_db[row, col],
            valid=valid,
            count=count,
        )


class OsCfarDetector:
    """Ordered-statistics CFAR across delay, per Doppler row.

    A comparison-tier alternative to the reference's cell-averaging
    detector (the reference ships only CA, `CfarDetector1D.cpp`; its test
    taxonomy anticipates algorithm comparison, `test/README.md`): the
    threshold is α · (k-th smallest train-cell power) instead of
    α · mean, making the detector robust to interfering targets inside
    the train window — a multi-target masking failure mode of CA-CFAR.
    Rank k = ⌈rank·N⌉ (Rohling's 3/4 by default), α solved per edge-shrunk
    train count from the exact exponential-background Pfa product
    (:func:`os_cfar_alpha`).

    TPU-first design: the per-cell train windows are the same shifted
    slices as the CA detector, but *stacked* on a small trailing axis
    (2·n_train entries) and sorted there — XLA unrolls the tiny sort into
    a vectorized sorting network, so the whole map thresholds in one
    fused program. Geometry masks (min_delay/min_doppler), the k>0
    left-train quirk, SNR definition, and the fixed-capacity extraction
    match the CA detector exactly, so the two are drop-in comparable.
    """

    def __init__(
        self,
        pfa: float,
        n_guard: int,
        n_train: int,
        min_delay: int,
        min_doppler: float,
        delay_axis: np.ndarray,
        doppler_axis: np.ndarray,
        max_detections: int = 128,
        rank: float = 0.75,
        real_dtype=jnp.float32,
    ):
        self.pfa = float(pfa)
        self.n_guard = int(n_guard)
        self.n_train = int(n_train)
        self.min_delay = int(min_delay)
        self.min_doppler = float(min_doppler)
        self.max_detections = int(max_detections)
        self.rank = float(rank)
        if not 0.0 < self.rank <= 1.0:
            raise ValueError(f"OS-CFAR rank must be in (0, 1], got {rank}")
        self.real_dtype = real_dtype

        delay_axis = np.asarray(delay_axis)
        doppler_axis = np.asarray(doppler_axis, dtype=np.float64)
        self.n_rows = len(doppler_axis)
        self.n_cols = len(delay_axis)

        self._row_ok = np.abs(doppler_axis) >= self.min_doppler
        self._col_ok = np.asarray(delay_axis >= self.min_delay)
        self._delay_axis = delay_axis.astype(np.float32)
        self._doppler_axis = doppler_axis.astype(np.float32)

        cnt = cfar_train_count(self.n_guard, self.n_train, self.n_cols)
        # Out-of-map train cells are padded +inf and sort to the end, so
        # the k-th smallest of the window IS the k-th smallest of the
        # valid cells; k and α follow each column's shrunk count.
        k = np.maximum(1, np.ceil(self.rank * cnt)).astype(np.int64)
        self._k_idx = np.minimum(k - 1, 2 * self.n_train - 1).astype(np.int32)
        self._alpha = np.asarray(
            [os_cfar_alpha(self.pfa, int(n), int(kk))
             for n, kk in zip(cnt, k)], dtype=np.dtype(real_dtype))

    def __call__(self, z: jnp.ndarray,
                 noise_power: jnp.ndarray) -> CfarDetections:
        """Run OS-CFAR on a complex delay-Doppler map (same contract as
        :class:`CfarDetector`)."""
        g, t = self.n_guard, self.n_train
        nr, nc = self.n_rows, self.n_cols
        maxo = g + t
        inf = jnp.asarray(np.inf, self.real_dtype)

        mag = jnp.abs(z).astype(self.real_dtype)
        power = mag * mag
        snr_db = 10.0 * jnp.log10(mag) - noise_power.astype(self.real_dtype)

        # Train windows as a stacked (nr, nc, 2t) tensor of shifted
        # slices; +inf marks out-of-map cells and the k>0 quirk cell.
        p_left = power.at[:, 0].set(inf)
        pl = jnp.pad(p_left, ((0, 0), (maxo, 0)), constant_values=np.inf)
        pr = jnp.pad(power, ((0, 0), (0, maxo)), constant_values=np.inf)
        windows = []
        for o in range(g + 1, maxo + 1):
            windows.append(pl[:, maxo - o: maxo - o + nc])
            windows.append(pr[:, o: o + nc])
        train = jnp.sort(jnp.stack(windows, axis=-1), axis=-1)
        kth = jnp.take_along_axis(
            train, jnp.asarray(self._k_idx)[None, :, None], axis=-1)[..., 0]

        threshold = jnp.asarray(self._alpha)[None, :] * kth
        detect = (
            (power > threshold)
            & jnp.isfinite(threshold)
            & self._row_ok[:, None]
            & self._col_ok[None, :]
        )

        row, col, valid, count = extract_topk(
            detect.reshape(-1), nc, self.max_detections)
        return CfarDetections(
            row=row,
            col=col,
            delay=jnp.asarray(self._delay_axis)[col],
            doppler=jnp.asarray(self._doppler_axis)[row],
            snr=snr_db[row, col],
            valid=valid,
            count=count,
        )


def make_cfar(det_cfg, delay_axis, doppler_axis, max_detections: int = 128,
              real_dtype=jnp.float32):
    """CFAR factory by config: ``process.detection.cfar`` ∈ {"ca", "os"}
    ("ca" is the reference algorithm)."""
    kind = (getattr(det_cfg, "cfar", "ca") or "ca").lower()
    common = dict(
        pfa=det_cfg.pfa, n_guard=det_cfg.n_guard, n_train=det_cfg.n_train,
        min_delay=det_cfg.min_delay, min_doppler=det_cfg.min_doppler,
        delay_axis=delay_axis, doppler_axis=doppler_axis,
        max_detections=max_detections, real_dtype=real_dtype)
    if kind in ("os", "os-cfar", "oscfar"):
        return OsCfarDetector(rank=getattr(det_cfg, "os_rank", 0.75),
                              **common)
    if kind in ("ca", "ca-cfar", "cacfar"):
        return CfarDetector(**common)
    raise ValueError(f"unknown process.detection.cfar: {kind!r}")
