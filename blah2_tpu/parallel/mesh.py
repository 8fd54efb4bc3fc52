"""Device-mesh construction for the radar pipeline.

Mesh axes (SURVEY §2.5 — the reference is a single-process two-thread
pipeline; these are the TPU-native parallelism axes that replace it):

  - ``cpi``  — data parallelism over CPI blocks: independent CPIs processed
    by independent device groups (the radar analog of batch/DP).
  - ``pulse`` — model/sequence parallelism *within* one CPI: the CPI's time
    axis is sharded in contiguous pulse blocks; the range stage is local,
    the Doppler stage contracts over the sharded pulse axis (all-reduce on
    ICI), and the clutter filter's segmented correlations reduce partials
    the same way (the analog of sequence parallelism / Ulysses axis swap).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh


def make_radar_mesh(
    n_cpi: Optional[int] = None,
    n_pulse: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (cpi, pulse) mesh over the available devices.

    Defaults: all devices on the pulse axis (maximum per-CPI speedup) unless
    ``n_cpi`` is given.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_cpi is None and n_pulse is None:
        n_cpi, n_pulse = 1, n
    elif n_cpi is None:
        n_cpi = n // n_pulse
    elif n_pulse is None:
        n_pulse = n // n_cpi
    if n_cpi * n_pulse != n:
        raise ValueError(f"mesh {n_cpi}x{n_pulse} != {n} devices")
    # Auto axis types: shardings are declared with with_sharding_constraint
    # and XLA/GSPMD propagates + inserts collectives.
    auto = jax.sharding.AxisType.Auto
    return jax.make_mesh((n_cpi, n_pulse), ("cpi", "pulse"),
                         axis_types=(auto, auto), devices=devices)
