"""Data-resident per-stage compute probe (production geometry).

bench.py reports one fused data-resident number (~53 ms/CPI on the
tunneled v5e); this probe splits it per stage WITHOUT the staged-mark
round trips contaminating each stage (the runtime's staged sample pays a
~20-30 ms dispatch+fetch per mark on the tunnel): it dispatches N
back-to-back async executions per stage — they queue serially on the
device stream — and forces only the last with a tiny fetch, so
per-execution cost ≈ (wall − one round trip) / N. The null-program round
trip is measured the same way and subtracted.

Run on the real chip (takes ~1-2 min warm):

    python tools/probe_stage_compute.py [N]

Output: one JSON line with per-stage ms, the fused program, and the
identity round trip. Guides kernel optimization toward the
direct-attach ceiling (SURVEY §6: the pipeline is compute-bound at
~34-53 ms/CPI once the wire is PCIe).
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys
import time

import numpy as np


def _time_queued(fn, args, force_leaf, n_rep: int) -> float:
    """Median-of-3 of: dispatch n_rep async executions, force the last."""
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(n_rep):
            out = fn(*args)
        np.asarray(force_leaf(out))
        best.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(best))


def main() -> None:
    n_rep = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    import jax
    import jax.numpy as jnp

    from blah2_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    from __graft_entry__ import _default_config
    from blah2_tpu.dsp.pipeline import CpiPipeline

    cfg = _default_config()
    p = CpiPipeline(cfg)
    n = cfg.n_samples
    rng = np.random.default_rng(0)

    def planes():
        c = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
             ).astype(np.complex64)
        return jax.device_put(p.to_planes(c, p._plane_dtype))

    xp, yp = planes(), planes()
    np.asarray(jnp.ravel(xp)[:1])  # inputs resident

    null = jax.jit(lambda v: v + 1.0)
    _ = np.asarray(null(jnp.zeros(8, jnp.float32)))  # compile

    # Warm every stage (compiles load from the persistent cache).
    spec = p.stage_spectrum(xp)
    xc, yc, ok = p.stage_clutter(xp, yp)
    z, db, noise, mp = p.stage_ambiguity(xc, yc)
    det = p.stage_detect(z, db, noise)
    fused = p._fn(xp, yp)
    jax.block_until_ready((spec, ok, noise, det.count, fused.noise_power))
    np.asarray(fused.noise_power)

    rt = _time_queued(null, (jnp.zeros(8, jnp.float32),), lambda o: o[:1], 1)
    res = {
        "n_rep": n_rep,
        "round_trip_ms": round(rt, 2),
        "stages_ms": {},
    }

    def per_exec(wall_ms):
        return round(max(0.0, (wall_ms - rt)) / n_rep, 2)

    res["stages_ms"]["spectrum"] = per_exec(_time_queued(
        p.stage_spectrum, (xp,), lambda o: o[:1], n_rep))
    res["stages_ms"]["clutter_filter"] = per_exec(_time_queued(
        p.stage_clutter, (xp, yp), lambda o: o[2], n_rep))
    res["stages_ms"]["ambiguity_processing"] = per_exec(_time_queued(
        p.stage_ambiguity, (xc, yc), lambda o: o[2], n_rep))
    res["stages_ms"]["detector"] = per_exec(_time_queued(
        p.stage_detect, (z, db, noise), lambda o: o.count, n_rep))
    res["fused_ms"] = per_exec(_time_queued(
        p._fn, (xp, yp), lambda o: o.noise_power, n_rep))
    res["stage_sum_ms"] = round(sum(res["stages_ms"].values()), 2)
    res["geometry"] = {
        "n_samples": n, "nfft": p.ambiguity.nfft,
        "nfft_compute": p.ambiguity.nfft_compute,
        "n_doppler": p.ambiguity.n_doppler_bins,
        "n_delay": p.ambiguity.n_delay_bins,
    }
    res["device"] = str(jax.devices()[0])
    print(json.dumps(res))


if __name__ == "__main__":
    main()
