"""Characterize the host->device transport on the tunneled TPU chip.

Measures the cost components that make up a streamed CPI (VERDICT r2 #5:
~60 ms/CPI of unexplained dispatch overhead between the 227.85 ms best
group and the ~164 ms wire floor):

  - null round trip: dispatch+fetch of a trivial jitted scalar program
    (the fixed per-call cost of the transport);
  - device_put dispatch time (how long the call itself blocks) and
    completion time, per payload size and chunk count;
  - transfer/compute overlap: device_put issued while a long compute is
    in flight vs issued on an idle device;
  - wire formats: packed-12 (9 MB) vs int16 quads (12 MB) vs f32 planes
    (24 MB) for the same CPI.

Writes one JSON document to stdout. Run detached on the TPU
(`setsid python tools/probe_tunnel.py > /tmp/probe.log 2>&1 &`) — whole
minutes get throttled ~20x by tunnel co-tenants, so every sample is
repeated across spread-out rounds and the minimum is reported.
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import numpy as np


def _best(samples):
    return round(1e3 * min(samples), 2)


def main() -> None:
    import os

    import jax
    import jax.numpy as jnp

    from blah2_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    n = 1_500_000
    rng = np.random.default_rng(0)
    i16 = rng.integers(-2048, 2048, size=(n, 4)).astype(np.int16)
    from blah2_tpu.ops.pack12 import pack12
    p12 = pack12(i16)
    f32 = rng.standard_normal((n, 4)).astype(np.float32)

    @jax.jit
    def null_prog(a):
        return a + 1.0

    @jax.jit
    def reduce_i16(a):
        return jnp.sum(a.astype(jnp.float32))

    @jax.jit
    def reduce_u8(a):
        return jnp.sum(a.astype(jnp.float32))

    @jax.jit
    def heavy(a):
        # ~50 ms-class MXU compute on resident data to overlap against
        # (matmul chain: TPU-friendly shapes; avoid exotic FFT sizes whose
        # remote compile takes tens of minutes).
        b = a.astype(jnp.bfloat16).reshape(-1)[: 2048 * 2048]
        m = b.reshape(2048, 2048)
        m = m @ m.T
        for _ in range(100):
            m = m @ m * 1e-3
        return jnp.sum(m.astype(jnp.float32))

    scalar = jnp.float32(1.0)
    np.asarray(null_prog(scalar))  # compile
    hv = jax.device_put(i16)
    jax.block_until_ready(hv)
    np.asarray(heavy(hv))          # compile
    np.asarray(reduce_i16(hv))
    pv = jax.device_put(p12)
    np.asarray(reduce_u8(pv))

    R = 5           # rounds, spread over minutes
    COOLDOWN = 10.0
    res: dict = {"device": str(dev), "rounds": R}
    samples: dict = {}

    def rec(key, dt):
        samples.setdefault(key, []).append(dt)

    for r in range(R):
        # 1. null round trip (dispatch + scalar fetch)
        t0 = time.perf_counter()
        np.asarray(null_prog(scalar))
        rec("null_round_trip", time.perf_counter() - t0)

        # 2. device_put dispatch vs completion, one-shot per format
        for name, payload, red in (("put_p12_9MB", p12, reduce_u8),
                                   ("put_i16_12MB", i16, reduce_i16),
                                   ("put_f32_24MB", f32, None)):
            t0 = time.perf_counter()
            d = jax.device_put(payload)
            rec(name + "_dispatch", time.perf_counter() - t0)
            # Completion: force with a tiny program fetch (block_until_ready
            # returns early on this transport).
            if red is not None:
                np.asarray(red(d))
            else:
                np.asarray(jnp.sum(d[:8, 0]))
            rec(name + "_complete", time.perf_counter() - t0)
            del d

        # 3. chunked vs one-shot: same 12 MB as 1/2/4/8 puts
        for n_chunks in (2, 4, 8):
            c = n // n_chunks
            t0 = time.perf_counter()
            ds = [jax.device_put(i16[j * c:(j + 1) * c])
                  for j in range(n_chunks)]
            rec(f"put_i16_12MB_{n_chunks}chunks_dispatch",
                time.perf_counter() - t0)
            np.asarray(reduce_i16(jnp.concatenate(ds, axis=0)))
            rec(f"put_i16_12MB_{n_chunks}chunks_complete",
                time.perf_counter() - t0)
            del ds

        # 4. overlap: put while a heavy compute is in flight
        o = heavy(hv)                      # dispatched async
        t0 = time.perf_counter()
        d = jax.device_put(p12)
        rec("put_p12_during_compute_dispatch", time.perf_counter() - t0)
        np.asarray(reduce_u8(d))
        rec("put_p12_during_compute_complete", time.perf_counter() - t0)
        np.asarray(o)
        del d, o

        # 5. compute-only (resident) for the round's tenancy level
        t0 = time.perf_counter()
        np.asarray(heavy(hv))
        rec("heavy_compute_resident", time.perf_counter() - t0)

        if r < R - 1:
            time.sleep(COOLDOWN)
        print(f"round {r} done", flush=True)

    res["ms_best"] = {k: _best(v) for k, v in samples.items()}
    res["ms_all"] = {k: [round(1e3 * s, 2) for s in v]
                     for k, v in samples.items()}
    print(json.dumps(res))


if __name__ == "__main__":
    main()
