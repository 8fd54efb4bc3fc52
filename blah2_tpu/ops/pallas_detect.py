"""Fused Pallas TPU kernel: map metrics + CA-CFAR + centroid suppression.

One VMEM-resident pass over the delay-Doppler map replaces four separately
scheduled stages of the XLA path (`dsp.ambiguity.map_metrics`,
`dsp.cfar.CfarDetector`, `dsp.centroid.CentroidFilter` — reference
`src/data/Map.cpp:188-206`, `src/process/detection/CfarDetector1D.cpp:23-100`,
`src/process/detection/Centroid.cpp:19-73`). The map (n_doppler × n_delay,
~0.5 MB f32 at the default 301×411 geometry) fits comfortably in VMEM, so the
kernel loads the power surface once and produces, without touching HBM in
between:

  - the dB map (10·log10|z|, computed as 5·log10(power));
  - noisePower = mean(dB) and rawMax = max(0, max(dB)) (`Map.cpp:188-206`);
  - the CFAR hit mask: train sums over ``n_train`` cells with ``n_guard``
    guards each side as shifted-slice accumulations, per-column threshold
    scale α/N precomputed on host (`CfarDetector1D.cpp:57-83`, including the
    reference's k>0 left-train quirk via a col-0-zeroed copy of the power
    surface);
  - centroid duplicate suppression as a separable rectangular window max:
    a hit survives iff no other hit within ±(n_centroid−1) delay bins ×
    ±K Doppler rows has strictly greater power — exactly the reference's
    strict-inequality pairwise scan (`Centroid.cpp:34-69`) evaluated on the
    map grid (SNR is monotonic in cell power).

Grid-vs-list equivalence: the XLA path centroids the *extracted* (capacity-
capped) detection list; this kernel centroids all hit cells. The two agree
whenever the hit count fits the capacity (the normal regime — capacity
overflow drops information in both paths).

The kernel is shape-specialised at trace time (all window extents are Python
constants) and uses only full-array VPU ops + static concatenations, so
Mosaic keeps every intermediate in VMEM/registers. On non-TPU backends it
runs in interpreter mode (used by the CPU test suite for parity checks).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blah2_tpu.dsp.cfar import (CfarDetections, cfar_threshold_scale,
                                extract_topk)


class DetectKernelOutputs(NamedTuple):
    db: jnp.ndarray        # (nr, nc) f32 absolute dB map
    keep: jnp.ndarray      # (nr, nc) f32 {0,1}: CFAR hit surviving centroid
    noise: jnp.ndarray     # (1, 1) f32 mean dB
    rawmax: jnp.ndarray    # (1, 1) f32 max(0, max dB)


def _shift_cols(v: jnp.ndarray, o: int, fill: float) -> jnp.ndarray:
    """v shifted so out[:, j] = v[:, j+o], filled at the open edge."""
    if o == 0:
        return v
    pad = jnp.full((v.shape[0], abs(o)), fill, v.dtype)
    if o > 0:
        return jnp.concatenate([v[:, o:], pad], axis=1)
    return jnp.concatenate([pad, v[:, :o]], axis=1)


def _shift_rows(v: jnp.ndarray, o: int, fill: float) -> jnp.ndarray:
    """v shifted so out[i, :] = v[i+o, :], filled at the open edge."""
    if o == 0:
        return v
    pad = jnp.full((abs(o), v.shape[1]), fill, v.dtype)
    if o > 0:
        return jnp.concatenate([v[o:, :], pad], axis=0)
    return jnp.concatenate([pad, v[:o, :]], axis=0)


def _detect_kernel(
    # refs
    pwr_ref, scale_ref, cell_ok_ref,
    db_ref, keep_ref, noise_ref, rawmax_ref,
    *,
    n_guard: int, n_train: int, win_cols: int, win_rows: int, n_cells: int,
):
    pwr = pwr_ref[:]                       # (nr, nc) f32 |z|²
    # dB map + metrics (Map.cpp:188-206). 5·log10(p) = 10·log10(sqrt(p)).
    db = 5.0 * jnp.log10(pwr)
    db_ref[:] = db
    noise = jnp.sum(db) * (1.0 / n_cells)
    noise_ref[0, 0] = noise
    rawmax_ref[0, 0] = jnp.maximum(0.0, jnp.max(db))

    # CA-CFAR train sums as shifted-slice accumulations. Left train cells
    # require k > 0 (reference quirk, CfarDetector1D.cpp:59-65): zero col 0.
    pwr_l = jnp.concatenate(
        [jnp.zeros((pwr.shape[0], 1), pwr.dtype), pwr[:, 1:]], axis=1
    )
    train = jnp.zeros_like(pwr)
    for o in range(n_guard + 1, n_guard + n_train + 1):
        train = train + _shift_cols(pwr_l, -o, 0.0)   # left cells j−o
        train = train + _shift_cols(pwr, o, 0.0)      # right cells j+o
    hit = (pwr > scale_ref[:] * train) & (cell_ok_ref[:] > 0.0)

    # Centroid: separable window max of hit power (strict-inequality
    # semantics — a tie never suppresses, so survive iff own power equals
    # the window max). Power is ≥ 0, so 0 is the identity fill.
    m = jnp.where(hit, pwr, 0.0)
    rowmax = m
    for o in range(1, win_rows + 1):
        rowmax = jnp.maximum(rowmax, _shift_rows(m, o, 0.0))
        rowmax = jnp.maximum(rowmax, _shift_rows(m, -o, 0.0))
    wmax = rowmax
    for o in range(1, win_cols + 1):
        wmax = jnp.maximum(wmax, _shift_cols(rowmax, o, 0.0))
        wmax = jnp.maximum(wmax, _shift_cols(rowmax, -o, 0.0))
    keep = hit & (pwr >= wmax)
    keep_ref[:] = keep.astype(jnp.float32)


class FusedDetector:
    """Drop-in replacement for metrics + CFAR + centroid on the CPI map.

    Produces the same ``(db, noise, max_power)`` triple as
    :func:`blah2_tpu.dsp.ambiguity.map_metrics` and the same
    :class:`CfarDetections` as ``CentroidFilter(CfarDetector(...))`` (when the
    hit count fits ``max_detections``); peak interpolation then runs on the
    extracted list exactly as in the XLA path.
    """

    def __init__(
        self,
        pfa: float,
        n_guard: int,
        n_train: int,
        min_delay: int,
        min_doppler: float,
        n_centroid_delay: int,
        n_centroid_doppler: int,
        centroid_doppler_resolution: float,  # Hz window half-step (1/tCpi cfg)
        delay_axis: np.ndarray,
        doppler_axis: np.ndarray,
        max_detections: int = 128,
        interpret: str | bool = "auto",
    ):
        delay_axis = np.asarray(delay_axis)
        doppler_axis = np.asarray(doppler_axis, dtype=np.float64)
        self.n_rows = nr = len(doppler_axis)
        self.n_cols = nc = len(delay_axis)
        self.max_detections = int(max_detections)
        if interpret == "auto":
            interpret = jax.default_backend() != "tpu"
        self.interpret = bool(interpret)

        g, t = int(n_guard), int(n_train)
        # (1, nc): broadcast over rows inside the kernel — nr× less VMEM
        # than a materialized full map of the per-column constant.
        self._scale = cfar_threshold_scale(pfa, g, t, nc).astype(
            np.float32)[None, :]

        row_ok = np.abs(doppler_axis) >= float(min_doppler)
        col_ok = delay_axis >= int(min_delay)
        self._cell_ok = (
            row_ok[:, None] & col_ok[None, :]
        ).astype(np.float32)

        # Centroid window half-extents on the map grid. Delay values are
        # integer bins, so strict |Δdelay| < n_delay ⇒ |Δcol| ≤ n_delay−1.
        # Doppler: strict |Δrow|·res_map < n_doppler·res_cfg.
        self.win_cols = max(0, int(n_centroid_delay) - 1)
        res_map = float(doppler_axis[1] - doppler_axis[0]) if nr > 1 else 1.0
        bound = float(n_centroid_doppler) * float(centroid_doppler_resolution)
        self.win_rows = max(0, int(np.ceil(bound / res_map - 1e-9)) - 1)

        self._delay_f32 = delay_axis.astype(np.float32)
        self._doppler_f32 = doppler_axis.astype(np.float32)

        kern = functools.partial(
            _detect_kernel,
            n_guard=g, n_train=t,
            win_cols=self.win_cols, win_rows=self.win_rows,
            n_cells=nr * nc,
        )
        f32 = jnp.float32
        self._call = pl.pallas_call(
            kern,
            out_shape=(
                jax.ShapeDtypeStruct((nr, nc), f32),   # db
                jax.ShapeDtypeStruct((nr, nc), f32),   # keep
                jax.ShapeDtypeStruct((1, 1), f32),     # noise
                jax.ShapeDtypeStruct((1, 1), f32),     # rawmax
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),  # scalar
                pl.BlockSpec(memory_space=pltpu.SMEM),  # scalar
            ),
            interpret=self.interpret,
        )

    @classmethod
    def from_config(cls, proc, ambiguity, max_detections: int = 128,
                    interpret: "str | bool" = "auto") -> "FusedDetector":
        """Build from a ``config.process`` section and an
        :class:`AmbiguityProcessor` (single source of truth for the window
        semantics shared by the single-chip and sharded pipelines)."""
        det = proc.detection
        return cls(
            det.pfa, det.n_guard, det.n_train, det.min_delay,
            det.min_doppler, det.n_centroid, det.n_centroid,
            # Centroid Doppler window uses the *configured* CPI (1/tCpi),
            # as in `src/blah2.cpp:186`.
            1.0 / proc.data.cpi,
            ambiguity.delay_axis, ambiguity.doppler_axis,
            max_detections=max_detections, interpret=interpret,
        )

    def __call__(self, z: jnp.ndarray):
        """z: complex (nr, nc) ambiguity map.

        Returns ``(db, noise, max_power, detections)`` — the fused
        equivalent of ``map_metrics(z)`` + CFAR + centroid.
        """
        zr, zi = jnp.real(z), jnp.imag(z)
        pwr = (zr * zr + zi * zi).astype(jnp.float32)
        db, keep, noise, rawmax = self._call(
            pwr, jnp.asarray(self._scale), jnp.asarray(self._cell_ok)
        )
        noise = noise[0, 0]
        max_power = rawmax[0, 0] - noise

        # Fixed-capacity extraction in row-major scan order (dsp.cfar).
        row, col, valid, count = extract_topk(
            keep.reshape(-1) > 0.0, self.n_cols, self.max_detections)
        det = CfarDetections(
            row=row,
            col=col,
            delay=jnp.asarray(self._delay_f32)[col],
            doppler=jnp.asarray(self._doppler_f32)[row],
            snr=db[row, col] - noise,
            valid=valid,
            count=count,
        )
        return db, noise, max_power, det
