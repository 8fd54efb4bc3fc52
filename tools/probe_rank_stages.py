"""Per-stage split of the scaling proxy's anomalous P=8 point.

SCALING_r05 calibration: per-rank fused times fit t(P) = a/P + b at
P in {1,2,4,16} but P=8 (n=187500) reads ~+1.2 ms above the fit, in both
r4 and r5 — structural, not tenancy. probe_fft_pair.py already cleared
the correlation FFT size (10240 vs 10368 equal). This probe compiles the
four STAGE programs at the P=4 / P=8 / P=16 proxy geometries and times
each with the queued rt-subtracted protocol, so the anomaly lands on a
named stage.

Run on the chip (detached — fresh stage compiles at 3 geometries):

    python tools/probe_rank_stages.py

Prints one JSON line.
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from blah2_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    from __graft_entry__ import _default_config
    from blah2_tpu.dsp.pipeline import CpiPipeline

    null = jax.jit(lambda v: v + 1.0)
    z8 = jnp.zeros(8, jnp.float32)
    np.asarray(null(z8))

    def null_rt() -> float:
        t0 = time.perf_counter()
        np.asarray(null(z8)[:1])
        return (time.perf_counter() - t0) * 1e3

    def queued(fn, args, force, n_rep=12):
        best = []
        for _ in range(3):
            rt = null_rt()
            t0 = time.perf_counter()
            o = None
            for _ in range(n_rep):
                o = fn(*args)
            np.asarray(force(o))
            best.append(max(0.0, (time.perf_counter() - t0) * 1e3 - rt)
                        / n_rep)
        return round(float(np.median(best)), 3)

    base = _default_config()
    fs, cpi = base.capture.fs, base.process.data.cpi
    rng = np.random.default_rng(0)
    out = {"per_p": {}}
    for P in (4, 8, 16):
        cfg = _default_config(fs=fs, cpi=cpi / P)
        p = CpiPipeline(cfg, clutter_mode="linear")
        n = cfg.n_samples

        def planes():
            c = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
                 ).astype(np.complex64)
            return jax.device_put(p.to_planes(c, p._plane_dtype))

        xp, yp = planes(), planes()
        np.asarray(jnp.ravel(xp)[:1])
        # Warm all stage programs + fused.
        spec = p.stage_spectrum(xp)
        xc, yc, ok = p.stage_clutter(xp, yp)
        z, db, noise, mp = p.stage_ambiguity(xc, yc)
        det = p.stage_detect(z, db, noise)
        fused = p._fn(xp, yp)
        jax.block_until_ready((spec, ok, noise, det.count,
                               fused.noise_power))
        np.asarray(fused.noise_power)
        row = {
            "n": n,
            "n_doppler": p.ambiguity.n_doppler_bins,
            "n_spectrum": p.spectrum.n_spectrum,
            "spectrum": queued(p.stage_spectrum, (xp,), lambda o: o[:1]),
            "clutter_filter": queued(p.stage_clutter, (xp, yp),
                                     lambda o: o[2]),
            "ambiguity_processing": queued(p.stage_ambiguity, (xc, yc),
                                           lambda o: o[2]),
            "detector": queued(p.stage_detect, (z, db, noise),
                               lambda o: o.count),
            "fused": queued(p._fn, (xp, yp), lambda o: o.noise_power),
        }
        row["stage_sum"] = round(row["spectrum"] + row["clutter_filter"] +
                                 row["ambiguity_processing"] +
                                 row["detector"], 3)
        out["per_p"][P] = row
        print(f"P={P}: {json.dumps(row)}", flush=True)
    out["device"] = str(jax.devices()[0])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
