"""Scaling harness: sharded-pipeline samples/s across mesh sizes.

SURVEY §7.5 / BASELINE north star: ≥80 % samples/s scaling efficiency at ≥2
hosts. This runs the full sharded CPI pipeline (clutter + ambiguity +
detection, `blah2_tpu.parallel.sharded`) over growing device meshes and
prints one JSON line per mesh shape with throughput and efficiency relative
to the smallest swept size (the 1-device run unless --sizes starts higher;
the line's efficiency_baseline_devices field records which).

Axes (SURVEY §2.5):
  --mode dp     scale the `cpi` axis (CPI-batch data parallelism)
  --mode sp     scale the `pulse` axis (intra-CPI sequence parallelism:
                overlap-save halo exchange + psum Doppler reduction)
  --mode both   a balanced (cpi × pulse) factorisation per size

On a real multi-chip TPU slice this measures ICI-scaled throughput. With
--virtual N it builds an N-device CPU mesh instead — that validates the
*collectives and sharding* at any size, but the virtual devices share one
host's cores, so efficiency numbers there reflect the host, not the
design. For defensible efficiency numbers WITHOUT a real slice use
`tools/scaling_projection.py --measure` (SCALING_r04.json): measured
per-rank compute + HLO-audited collective bytes + stated ICI assumptions
— it replaced the virtual sweeps as the scaling artifact in round 4.

Examples:
  python bench_scaling.py --virtual 8 --mode both
  python bench_scaling.py --mode dp          # on a real slice
"""

from __future__ import annotations

import argparse
import json
import os
import time


def _balanced(n: int):
    """(cpi, pulse) factorisation closest to square with cpi ≥ pulse."""
    best = (n, 1)
    k = 1
    while k * k <= n:
        if n % k == 0:
            best = (n // k, k)
        k += 1
    return best


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--virtual", type=int, default=0,
                    help="force an N-device virtual CPU mesh")
    ap.add_argument("--mode", choices=("dp", "sp", "both"), default="both")
    ap.add_argument("--sizes", type=int, nargs="*", default=None,
                    help="device counts to sweep (default: 1,2,4,.. up to "
                         "available)")
    ap.add_argument("--fs", type=int, default=2_000_000)
    ap.add_argument("--cpi", type=float, default=0.1)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--cpis-per-step", type=int, default=None,
                    help="CPI batch per step (default: the cpi-axis size)")
    args = ap.parse_args()

    if args.virtual:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags +
                f" --xla_force_host_platform_device_count={args.virtual}"
            ).strip()
    import jax

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from blah2_tpu.config import config_from_dict
    from blah2_tpu.parallel.mesh import make_radar_mesh
    from blah2_tpu.parallel.sharded import ShardedCpiPipeline

    n_avail = len(jax.devices())
    sizes = args.sizes
    if not sizes:
        sizes, s = [], 1
        while s <= n_avail:
            sizes.append(s)
            s *= 2

    cfg = config_from_dict({
        "capture": {"fs": args.fs, "fc": 204_640_000},
        "process": {
            "data": {"cpi": args.cpi, "buffer": 2},
            "ambiguity": {"delayMin": -10, "delayMax": 400,
                          "dopplerMin": -200, "dopplerMax": 200},
            "clutter": {"enable": True, "delayMin": -10, "delayMax": 400},
            "detection": {"enable": True, "pfa": 1e-5, "nGuard": 2,
                          "nTrain": 6, "minDelay": 5, "minDoppler": 15,
                          "nCentroid": 6},
        },
    })
    n = cfg.n_samples
    rng = np.random.default_rng(0)

    base_sps = None
    for nd in sizes:
        if args.mode == "dp":
            shape = (nd, 1)
        elif args.mode == "sp":
            shape = (1, nd)
        else:
            shape = _balanced(nd)
        mesh = make_radar_mesh(*shape, devices=jax.devices()[:nd])
        pipe = ShardedCpiPipeline(cfg, mesh)
        b = args.cpis_per_step or max(1, shape[0])
        b = -(-b // shape[0]) * shape[0]

        xb = (rng.standard_normal((b, n)) +
              1j * rng.standard_normal((b, n))).astype(np.complex64)
        yb = (2.0 * xb + 0.1 * np.roll(xb, 31, axis=1)).astype(np.complex64)
        xs, ys = pipe.shard_inputs(xb, yb)

        out = pipe(xs, ys)
        jax.block_until_ready(out.db_map)  # compile + warm
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            out = pipe(xs, ys)
            jax.block_until_ready(out.db_map)
            times.append(time.perf_counter() - t0)
        times.sort()
        dt = times[len(times) // 2]
        sps = b * n / dt
        if base_sps is None:
            # per-device baseline at the SMALLEST SWEPT size — equals the
            # 1-device baseline only when the sweep starts at 1 device
            base_devices = nd
            base_sps = sps / nd
        eff = sps / (base_sps * nd)
        print(json.dumps({
            "metric": "sharded_cpi_throughput",
            "devices": nd,
            "mesh": {"cpi": shape[0], "pulse": shape[1]},
            "cpis_per_step": b,
            "value": round(sps / 1e6, 3),
            "unit": "Msamples/s",
            "scaling_efficiency": round(eff, 3),
            "efficiency_baseline_devices": base_devices,
            "step_ms_median": round(1e3 * dt, 2),
            "platform": jax.default_backend(),
        }), flush=True)


if __name__ == "__main__":
    main()
