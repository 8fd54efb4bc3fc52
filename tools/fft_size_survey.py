"""Measure TPU FFT runtime at candidate sizes and bake a fast-size table.

Why: XLA's TPU FFT cost is wildly non-monotonic in length — measured on
this v5e: 1536000-pt 0.44 ms but 768000-pt 4.7 ms, 786432-pt ~0.05 ms but
1572864-pt 2.8 ms. All of those are 5-smooth AND divisible by 128, so no
static factor rule separates fast from slow; the only robust policy is to
measure. This tool times candidate sizes around the lengths the framework
actually uses (full-CPI clutter correlation/convolution sizes for the
shipped configs and per-rank shard geometries) and writes
``blah2_tpu/dsp/fft_table_v5e.json``; ``next_tpu_fft_size`` then prefers a
measured-fast size when one covers the request (see dsp/hamming.py).

Per target the candidates are scanned ascending and the scan stops at the
first size meeting the fast threshold — compiles dominate the cost over a
remote transport, and one fast size per target range is all the lookup
needs (plus every already-measured slow size recorded, so the table keeps
the evidence).

Run on the chip (detached; ~10-20 min cold cache):
    python tools/fft_size_survey.py
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import numpy as np

# Full-CPI FFT lengths in play: n + n_lags for the shipped configs
# (fs=2 MHz x tCpi {0.75, 0.5} => 1.5M/1M) and the pulse-shard proxy
# geometries (n/P), plus headroom targets.
TARGETS = [187_910, 375_410, 500_410, 750_410, 1_000_410, 1_500_410,
           2_000_410]
OVERHEAD = 1.35          # max padding beyond the target worth measuring
FAST_MS_ABS = 0.8        # a size at/below this is "fast enough", stop scan


def main() -> None:
    import jax
    import jax.numpy as jnp

    from blah2_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    from blah2_tpu.dsp.hamming import is_hamming

    null = jax.jit(lambda v: v + 1.0)
    np.asarray(null(jnp.zeros(8, jnp.float32)))

    def timed(fn, args, reps=8):
        best = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = None
            for _ in range(reps):
                out = fn(*args)
            np.asarray(out[:1])
            best.append((time.perf_counter() - t0) * 1e3)
        return float(np.median(best))

    zeros8 = jnp.zeros(8, jnp.float32)
    np.asarray(null(zeros8))
    print(f"null round trip {timed(null, (zeros8,), 1):.2f} ms", flush=True)

    rng = np.random.default_rng(0)
    measured: dict = {}
    suspect: list = []

    def measure(m: int) -> float:
        # The tunnel is multi-tenant: a single upfront round-trip baseline
        # can come from a throttled minute and zero out later measurements.
        # Re-measure the null round trip ADJACENT to each size, and treat a
        # clamped-to-zero result as suspect: retry, then fall back to the
        # unsubtracted per-rep time (overstates, so a genuinely slow size can
        # never be recorded as fast by a bad baseline).
        if m in measured:
            return measured[m]
        x = jax.device_put(rng.standard_normal(m).astype(np.float32))
        f = jax.jit(lambda a: jnp.abs(jnp.fft.fft(jax.lax.complex(a, a))))
        np.asarray(f(x)[:1])  # compile
        ms = None
        for _attempt in range(3):
            rt = timed(null, (zeros8,), 1)
            t = timed(f, (x,))
            if t > rt:
                ms = (t - rt) / 8
                break
        if ms is None:
            ms = t / 8  # baseline never resolved: keep the raw (conservative) time
            suspect.append(m)
            print(f"  {m}: SUSPECT (timed <= round trip after retries), "
                  f"recording raw {ms:.3f} ms", flush=True)
        measured[m] = round(ms, 3)
        print(f"  {m}: {measured[m]} ms", flush=True)
        return measured[m]

    for target in TARGETS:
        print(f"target {target}:", flush=True)
        cands = [m for m in range(((target // 128) + 1) * 128,
                                  int(target * OVERHEAD), 128)
                 if is_hamming(m)]
        for m in cands:
            if measure(m) <= FAST_MS_ABS:
                break

    out = {
        "device": str(jax.devices()[0]),
        "what": "measured single-FFT (c64) runtime per length, ms; "
                "queued-execution protocol, tunnel round trip excluded",
        "fast_threshold_ms": FAST_MS_ABS,
        "sizes_ms": {str(k): v for k, v in sorted(measured.items())},
        "suspect_sizes": sorted(suspect),
    }
    path = _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        "blah2_tpu", "dsp", "fft_table_v5e.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"written": path, "n_measured": len(measured)}))


if __name__ == "__main__":
    main()
