"""Benchmark: sustained 2-channel CPI processing throughput on one chip.

Baseline (BASELINE.md): the reference's real-time criterion is 2 Msample/s
2-channel processing (RspDuo fs=2 MHz) with per-CPI wall time < tCpi
(`src/blah2.cpp:334-338`). We run the full fused CPI pipeline — Wiener-Hopf
clutter cancellation over 410 lags, batches-algorithm ambiguity to a
301×411 delay-Doppler map, CA-CFAR + centroid + interpolation — on
1.5 Msample CPIs (default config.yml geometry: fs=2 MHz, tCpi=0.75 s).

Protocol: steady-state double-buffered streaming, the production runtime's
ingest design (and the analog of the reference's capture thread t1 filling
the ring while thread t2 processes, `src/blah2.cpp:137-139,245-361`): the
host->device transfer of CPI k+1 is dispatched asynchronously while CPI k
computes, so the per-CPI wall at saturation is max(transfer, compute) + sync.
Each group streams 6 CPIs of fresh data back-to-back and is scored by its
mean per-CPI wall; the headline is the best group. Groups are spread over
~2.5 min with cooldowns because the chip sits behind a shared multi-tenant
tunnel: whole-minute windows get throttled ~20x by co-tenants' traffic, so a
single group can measure someone else's burst, not this program. Detail
fields expose every group plus the data-resident compute time so the split
is auditable.

vs_baseline = achieved Msamples/s ÷ 2.0 (the reference's real-time rate).

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import os

    import jax

    # Persistent compile cache: remote TPU compilation of the full pipeline
    # takes minutes; cache it across bench runs.
    from blah2_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    from __graft_entry__ import _default_config
    from blah2_tpu.dsp.pipeline import CpiPipeline

    cfg = _default_config()
    n = cfg.n_samples
    fs = cfg.capture.fs

    pipe = CpiPipeline(cfg)

    from blah2_tpu.ops.pack12 import MAX12, MIN12, pack12_quads

    rng = np.random.default_rng(0)
    n_buf = 8
    bufs = []
    for k in range(n_buf):
        x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
            np.complex64
        )
        y = (0.1 * np.roll(x, 37) * np.exp(2j * np.pi * 60.0 *
                                           np.arange(n) / fs)
             + 2.0 * x
             + 1e-3 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
             ).astype(np.complex64)
        # Packed 12-bit quads [i1,q1,i2,q2] per CPI (ops.pack12): the
        # RSPduo front-end digitises at 12 bits, so this is the lossless
        # minimal wire format — 6 bytes/sample vs 8 for int16 quads and 16
        # for f32 planes; one transfer for both channels; unpack fuses
        # into the device program. Scale the unit-variance scene to the
        # 12-bit ADC range (clipping tails exactly as the ADC would).
        def planes_i12(v):
            p = pipe.to_planes(v) * 400.0
            return np.clip(p, MIN12, MAX12).astype(np.int16)
        quads = np.ascontiguousarray(
            np.concatenate([planes_i12(x), planes_i12(y)], axis=1))
        bufs.append(pack12_quads(quads))

    # Warmup (compile both the transfer path and the compute program).
    out = pipe.call_quad12(bufs[0])
    np.asarray(out.noise_power)
    out = pipe.call_quad12(bufs[1])
    np.asarray(out.noise_power)

    def stream_group(n_cpis: int) -> float:
        """Stream n_cpis CPIs double-buffered; return mean per-CPI wall (s).

        The device_put of CPI k+1 is dispatched (async) before CPI k's
        compute is forced, so transfer and compute overlap exactly as in
        the production runtime's chunked-ingest feeder. The scalar fetch
        that forces completion (np.asarray — block_until_ready returns
        before execution finishes on some remote TPU transports, which
        would time only async dispatch) is deferred by ONE CPI: CPI k−1's
        products are forced after CPI k's transfer+compute are dispatched,
        so the fetch round trip rides the in-flight transfer instead of
        serialising after it (measured ~¾ of the fixed ~28 ms round trip
        back, interleaved A/B on the chip). Products are still fetched
        every CPI — one behind, the throughput-for-latency trade already
        made by mesh mode. The final pending fetch drains inside the
        timed window, so the group mean hides nothing.
        """
        cur = jax.device_put(bufs[0])
        jax.block_until_ready(cur)
        pending = None
        t0 = time.perf_counter()
        for k in range(n_cpis):
            nxt = jax.device_put(bufs[(k + 1) % n_buf])
            o = pipe._fn_quad12(cur)
            if pending is not None:
                np.asarray(pending.noise_power)
            pending = o
            cur = nxt
        np.asarray(pending.noise_power)
        return (time.perf_counter() - t0) / n_cpis, pending

    # Compute-only reference point (data resident on device) — steady and
    # unaffected by tunnel tenancy; reported in detail for the transfer/
    # compute split.
    qd = jax.device_put(bufs[0])
    jax.block_until_ready(qd)
    comp = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(pipe._fn_quad12(qd).noise_power)
        comp.append(time.perf_counter() - t0)
    comp.sort()
    compute_ms = 1e3 * comp[len(comp) // 2]

    # Device-resident saturation throughput: the chip's true capability
    # with the tunnel out of the equation. Single timed calls still carry
    # the ~24-28 ms fixed dispatch+fetch round trip (PROBE_STAGE_r03), so
    # dispatch a queue of async calls over resident buffers and force only
    # the last — the steady-state per-CPI compute is wall/N. The dispatch
    # RPCs themselves ride the shared tunnel, so one trial in a throttled
    # minute reads high (or, via its inflated adjacent baseline, low);
    # trials run inside the spread-out group loop below and the MEDIAN of
    # the positive corrected trials is the capability number (min() would
    # prefer the baseline-corrupted ones). MFU is estimated from
    # XLA's own cost analysis against the v5e bf16 MXU peak (197 TFLOP/s;
    # the pipeline is FFT/f32-dominated, so this is a deliberately
    # conservative denominator).
    dev_bufs = [jax.device_put(b) for b in bufs]
    jax.block_until_ready(dev_bufs)
    # Depth must put the queue wall well above the round trip's THROTTLE
    # VARIANCE (25-100 ms minute to minute), not just its floor: at depth
    # 16 x 2.4 ms the wall was ~40 ms and a throttled adjacent baseline
    # produced negative/halved trials (r5).
    n_queue = 64
    out_q = pipe._fn_quad12(dev_bufs[0])  # warm
    np.asarray(out_q.noise_power)

    # The queued wall includes exactly ONE fixed dispatch+fetch round trip
    # (the final force) — at depth 16 that is ~1.5 ms/CPI of pure
    # transport, which is precisely the r4 "5.24 vs 3.72 ms" gap between
    # this loop and the rt-subtracting stage probe
    # (tools/probe_stage_compute.py). Measure the null round trip adjacent
    # to each trial and subtract it, keeping the raw wall in detail.
    import jax.numpy as _jnp

    _null = jax.jit(lambda v: v + 1.0)
    np.asarray(_null(_jnp.zeros(8, _jnp.float32)))  # compile

    def _null_rt_s() -> float:
        # Min of 3: the fixed dispatch+fetch floor. A single sample can
        # land on a co-tenant burst and overshoot the whole queue wall.
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(_null(_jnp.zeros(8, _jnp.float32))[:1])
            best = min(best, time.perf_counter() - t0)
        return best

    def dev_queue_s() -> tuple:
        rt_s = _null_rt_s()
        t0 = time.perf_counter()
        o = None
        for k in range(n_queue):
            o = pipe._fn_quad12(dev_bufs[k % n_buf])
        np.asarray(o.noise_power)
        wall = time.perf_counter() - t0
        return (wall - rt_s) / n_queue, wall / n_queue

    # In-run wire floor: a raw timed put of one CPI's packed payload,
    # measured next to each group, so wall can be audited against the
    # line rate of the minutes the bench actually ran in. The transport
    # is async-put + ~29 ms fixed round trip + bytes/line-rate
    # (docs/tunnel_transport.md; PROBE_r03.json) — the r2 "dispatch gap"
    # was an estimated-floor artifact, not recoverable overhead.
    import jax.numpy as jnp

    tiny = jax.jit(lambda a: jnp.sum(a[:64].astype(jnp.int32)))
    np.asarray(tiny(qd))  # compile

    def wire_floor() -> float:
        t0 = time.perf_counter()
        d = jax.device_put(bufs[2])
        np.asarray(tiny(d))
        return time.perf_counter() - t0

    groups = []
    floors = []
    dev_trials = []
    out = None
    n_groups = 6
    for g in range(n_groups):
        floors.append(wire_floor())
        dev_trials.append(dev_queue_s())
        per_cpi, out = stream_group(6)
        groups.append(per_cpi)
        if g < n_groups - 1:
            time.sleep(12.0)

    # A throttled minute can inflate the adjacent null baseline past the
    # queue wall and drive a trial's corrected value toward 0; min() would
    # prefer exactly those corrupted trials (observed: a 0.42 ms trial in
    # a [3.5, 3.8] field). Median of the positive corrected trials; the
    # raw statistic is taken over the SAME trials so the reported
    # round-trip share is coherent (and never negative). If every trial
    # is baseline-corrupted, fall back to the raw median (a conservative
    # upper bound) and flag it.
    _kept = [(t, raw) for t, raw in dev_trials if t > 0]
    dev_suspect = not _kept
    if _kept:
        _kept.sort()
        dev_cpi_s, dev_cpi_raw_s = _kept[len(_kept) // 2]
    else:
        dev_cpi_raw_s = float(np.median([raw for _, raw in dev_trials]))
        dev_cpi_s = dev_cpi_raw_s
    flops_per_cpi = None
    mfu_pct = None
    try:
        ca = pipe._fn_quad12.lower(dev_bufs[0]).compile().cost_analysis()
        if ca and ca.get("flops"):
            flops_per_cpi = float(ca["flops"])
            mfu_pct = 100.0 * flops_per_cpi / dev_cpi_s / 197e12
    except Exception:
        pass
    device_resident = {
        "cpi_ms": round(1e3 * dev_cpi_s, 2),
        "cpi_ms_incl_round_trip": round(1e3 * dev_cpi_raw_s, 2),
        "round_trip_share_ms": round(1e3 * (dev_cpi_raw_s - dev_cpi_s), 2),
        "suspect_all_trials_baseline_corrupted": dev_suspect,
        "cpi_ms_trials": [round(1e3 * t, 2) for t, _ in dev_trials],
        "msamples_per_s": round(n / dev_cpi_s / 1e6, 1),
        "vs_realtime_rate": round(n / dev_cpi_s / 2e6, 1),
        "flops_per_cpi": flops_per_cpi,
        "mfu_pct_vs_bf16_peak": (None if mfu_pct is None
                                 else round(mfu_pct, 2)),
        "queue_depth": n_queue,
    }

    dt = min(groups)
    msps = n / dt / 1e6
    result = {
        "metric": "cpi_pipeline_throughput_2ch",
        "value": round(msps, 3),
        "unit": "Msamples/s",
        "vs_baseline": round(msps / 2.0, 3),
        "detail": {
            "n_samples_per_cpi": n,
            "protocol": "packed-12bit quads, double-buffered streaming with "
                        "one-CPI-deferred product fetch, best of "
                        f"{n_groups} groups x 6 CPIs (multi-tenant tunnel)",
            "cpi_wall_ms_best_group": round(1e3 * dt, 2),
            "cpi_wall_ms_groups": [round(1e3 * g, 2) for g in groups],
            "wire_floor_ms_groups": [round(1e3 * f, 2) for f in floors],
            "wire_bytes_per_cpi": int(bufs[0].nbytes),
            "compute_ms_data_resident": round(compute_ms, 2),
            "device_resident_throughput": device_resident,
            "realtime_budget_ms": round(1e3 * n / fs, 2),
            "map_shape": [pipe.ambiguity.n_doppler_bins,
                          pipe.ambiguity.n_delay_bins],
            "device": str(jax.devices()[0]),
            "detections_last": int(out.detections.count),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
