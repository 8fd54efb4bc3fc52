"""Targeted FFT-size attribution probe.

Two questions, both raised in round 5:

1. r4's non-monotone scaling calibration: the P=8 per-rank proxy compiled
   its correlation FFTs at 10368 (= 2^7*3^4, the strictly-greater bump of
   an already-fast 10240 = 2^11*5). Measure BOTH sizes at exactly that
   geometry (batch of 37 rows) to attribute the regression to the size,
   not the batch shrink.

2. The checked-in fft_table_v5e.json has three ~0 ms entries (512000,
   786432, 2048000) recorded against a single upfront round-trip baseline
   (advisor r4 finding): re-measure them with adjacent baselines to
   confirm they are genuinely fast (they gate next_tpu_fft_size table
   overrides).

Run on the chip (~2 min warm):  python tools/probe_fft_pair.py
Prints one JSON line (saved into PROBE_ENTRY_r05.json's campaign).
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

    null = jax.jit(lambda v: v + 1.0)
    z8 = jnp.zeros(8, jnp.float32)
    np.asarray(null(z8))

    def null_rt() -> float:
        t0 = time.perf_counter()
        np.asarray(null(z8)[:1])
        return (time.perf_counter() - t0) * 1e3

    rng = np.random.default_rng(0)

    def queued_ms(fn, args, force, n_rep=12):
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

    res = {"batch37_pair_ms": {}, "table_suspects_ms": {}}

    # 1. The P=8 ambiguity geometry: 37 pulses, forward+inverse pair at
    # each candidate nfft (the shape the fused program actually runs).
    batch = jax.device_put(
        rng.standard_normal((37, 5067, 2)).astype(np.float32))
    jax.block_until_ready(batch)
    for size in (10240, 10368):
        fn = jax.jit(lambda a, s=size: jnp.sum(jnp.abs(jnp.fft.ifft(
            jnp.fft.fft(jax.lax.complex(a[..., 0], a[..., 1]), n=s,
                        axis=-1), axis=-1)) ** 2))
        np.asarray(fn(batch))  # compile
        res["batch37_pair_ms"][str(size)] = queued_ms(
            fn, (batch,), lambda o: o)

    # 2. Suspect table entries (single c64 FFT, the survey's measurement).
    for size in (512_000, 786_432, 2_048_000):
        x = jax.device_put(rng.standard_normal(size).astype(np.float32))
        jax.block_until_ready(x)
        fn = jax.jit(lambda a: jnp.abs(jnp.fft.fft(jax.lax.complex(a, a))))
        np.asarray(fn(x)[:1])
        res["table_suspects_ms"][str(size)] = queued_ms(
            fn, (x,), lambda o: o[:1], n_rep=8)

    res["device"] = str(jax.devices()[0])
    res["round_trip_ms"] = round(null_rt(), 2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
