"""Pre-warm the persistent XLA compile cache with every production program.

Over the tunneled TPU transport a fresh compile of the fused pipeline takes
minutes and the four staged-timing programs >10 minutes total — far beyond
the reference watchdog's 60 s staleness bound. The persistent compile cache
(/tmp/blah2_tpu_jax_cache) makes recompiles near-instant, so this tool is
run ONCE (detached) per deployment/geometry to absorb the cost off-line:

    setsid python tools/warm_staged_cache.py > /tmp/warm_cache.log 2>&1 &

It compiles, for the default production geometry (and any config passed
with -c): the fused plane pipeline, the packed-quad12 pipeline, the chunked
ingest program, and the four staged-timing programs for every wire dtype
the runtime can flip through (int32 unpacked chunks, int16/int8/f32
planes). After this, `RadarRuntime(staged_sample_every=16)` warms from
cache in seconds and /api/timing carries real per-stage device times
(`src/blah2.cpp:261-345` contract) with no stream stall.
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", "-c", default=None,
                    help="YAML config (default: production geometry)")
    args = ap.parse_args()

    import jax

    from blah2_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    if args.config:
        from blah2_tpu.config import load_config

        cfg = load_config(args.config)
    else:
        from __graft_entry__ import _default_config

        cfg = _default_config()

    from blah2_tpu.dsp.pipeline import CpiPipeline
    from blah2_tpu.ops.pack12 import pack12_planes, pack12_quads

    pipe = CpiPipeline(cfg)
    n = cfg.n_samples
    print(f"device: {jax.devices()[0]}  n={n}", flush=True)

    def step(name, fn):
        t0 = time.perf_counter()
        fn()
        print(f"  {name}: {time.perf_counter() - t0:.1f}s", flush=True)

    i16 = np.zeros((n, 2), dtype=np.int16)
    quads = np.zeros((n, 4), dtype=np.int16)

    # Fused programs (the hot path).
    step("fused f32 planes", lambda: np.asarray(
        pipe._fn(np.zeros((n, 2), np.float32),
                 np.zeros((n, 2), np.float32)).noise_power))
    step("fused int16 planes", lambda: np.asarray(
        pipe._fn(i16, i16).noise_power))
    step("fused quad12", lambda: np.asarray(
        pipe.call_quad12(pack12_quads(quads)).noise_power))

    # Chunked-ingest program (production default geometry: 8 chunks).
    B = 8
    if n % B == 0:
        c = n // B
        chunks = [jax.device_put(pack12_planes(np.zeros((c, 2), np.int16)))
                  for _ in range(B)]
        step("chunked quad12 x8", lambda: np.asarray(
            pipe.call_chunks(chunks, chunks).noise_power))

    # Staged-timing programs for every wire dtype the runtime can flip to.
    for dt in (np.int32, np.int16, np.int8, np.float32):
        xp = np.zeros((n, 2), dtype=dt)

        def staged(xp=xp):
            spec = pipe.stage_spectrum(xp)
            xc, yc, ok = pipe.stage_clutter(xp, xp)
            z, db, noise, mp = pipe.stage_ambiguity(xc, yc)
            det = pipe.stage_detect(z, db, noise)
            if pipe.sub_spectra_fn is not None:
                jax.block_until_ready(pipe.sub_spectra_fn(xp))
            jax.block_until_ready((spec, ok, noise, det.count))

        step(f"staged x4 ({np.dtype(dt).name} planes)", staged)

    print("warm_staged_cache: done", flush=True)


if __name__ == "__main__":
    main()
