"""A/B the streamed-CPI protocol: same-thread puts vs a background putter.

The r2 bench wall (227.85 ms best group) sits ~60 ms above the ~164 ms
wire floor (9 MB packed @ ~55 MB/s). Hypothesis (VERDICT r2 #5): the
device_put call serialises the payload into the tunnel socket on the
calling thread, so the per-CPI wall is put + dispatch + (partially ridden)
fetch round trips, serialised. A dedicated putter thread keeps the socket
busy continuously while the main thread dispatches compute and forces the
deferred fetch — wall should drop toward max(wire, compute).

Arms, interleaved within the same minutes (tenancy-controlled):
  A: r2 protocol — put(k+1); compute(k); fetch(k−1) on one thread
  B: putter thread — puts run one CPI ahead on their own thread
  C: putter thread, two ahead (deeper pipeline)

Prints one JSON line. Run detached; single TPU job at a time.
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import queue
import threading
import time

import numpy as np


def main() -> None:
    import jax

    from blah2_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    from __graft_entry__ import _default_config
    from blah2_tpu.dsp.pipeline import CpiPipeline
    from blah2_tpu.ops.pack12 import MAX12, MIN12, pack12_quads

    cfg = _default_config()
    n, fs = cfg.n_samples, cfg.capture.fs
    pipe = CpiPipeline(cfg)

    rng = np.random.default_rng(0)
    n_buf = 8
    bufs = []
    for _ in range(n_buf):
        x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
            np.complex64)
        y = (0.1 * np.roll(x, 37) + 2.0 * x).astype(np.complex64)

        def planes_i12(v):
            p = pipe.to_planes(v) * 400.0
            return np.clip(p, MIN12, MAX12).astype(np.int16)
        bufs.append(pack12_quads(np.ascontiguousarray(
            np.concatenate([planes_i12(x), planes_i12(y)], axis=1))))

    print("warmup (compile)...", flush=True)
    np.asarray(pipe.call_quad12(bufs[0]).noise_power)
    np.asarray(pipe.call_quad12(bufs[1]).noise_power)
    print("warm", flush=True)

    N_CPIS = 6

    def arm_same_thread() -> float:
        cur = jax.device_put(bufs[0])
        jax.block_until_ready(cur)
        pending = None
        t0 = time.perf_counter()
        for k in range(N_CPIS):
            nxt = jax.device_put(bufs[(k + 1) % n_buf])
            o = pipe._fn_quad12(cur)
            if pending is not None:
                np.asarray(pending.noise_power)
            pending = o
            cur = nxt
        np.asarray(pending.noise_power)
        return (time.perf_counter() - t0) / N_CPIS

    def arm_putter(depth: int) -> float:
        q: queue.Queue = queue.Queue(maxsize=depth)
        stop = object()

        def putter():
            for k in range(1, N_CPIS + 1):
                q.put(jax.device_put(bufs[k % n_buf]))
            q.put(stop)

        cur = jax.device_put(bufs[0])
        jax.block_until_ready(cur)
        th = threading.Thread(target=putter, daemon=True)
        pending = None
        t0 = time.perf_counter()
        th.start()
        for k in range(N_CPIS):
            o = pipe._fn_quad12(cur)
            if pending is not None:
                np.asarray(pending.noise_power)
            pending = o
            cur = q.get()
            if cur is stop:
                break
        np.asarray(pending.noise_power)
        th.join()
        return (time.perf_counter() - t0) / N_CPIS

    arms = {"same_thread": arm_same_thread,
            "putter_1ahead": lambda: arm_putter(1),
            "putter_2ahead": lambda: arm_putter(2)}
    results = {k: [] for k in arms}
    rounds = 4
    for r in range(rounds):
        for name, fn in arms.items():
            results[name].append(round(1e3 * fn(), 2))
        print(f"round {r}: " + " ".join(
            f"{k}={results[k][-1]}ms" for k in arms), flush=True)
        if r < rounds - 1:
            time.sleep(10.0)

    best = {k: min(v) for k, v in results.items()}
    print(json.dumps({
        "metric": "put_protocol_ab_ms_per_cpi",
        "best": best,
        "all": results,
        "winner": min(best, key=best.get),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
