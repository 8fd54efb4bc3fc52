"""Production-runtime soak: N CPIs end-to-end with stability monitoring.

The reference deployment runs for days under a watchdog whose staleness
bound is 60 s (`script/blah2_rspduo_restart.bash:8-11`); the benches only
prove tens of CPIs. This soak runs the real `RadarRuntime` loop — looped
replay → rings → chunked packed-12 ingest → fused pipeline (staged
timing sampling live) → tracker → JSON → API — for ``--cpis`` CPIs
(default 60) and records per-window:

  - CPI wall (the reference's real-time criterion), max product gap
    (watchdog staleness proxy),
  - process RSS (leak detection: last-window median vs first-window
    median),
  - ring drop counters (flow-control health).

Exit code 1 if any CPI breaches the real-time budget's watchdog bound
(60 s), RSS grows more than 10% window-over-run, or drops occur after
warmup. Prints one JSON line.

    python tools/soak_runtime.py --cpis 60
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return float(line.split()[1]) / 1024.0
    return 0.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpis", type=int, default=60)
    ap.add_argument("--recycle-every", type=int, default=0, metavar="N",
                    help="recycle the device transport every N CPIs "
                         "(RadarRuntime.recycle_transport — bounds the "
                         "tunnel transport client's native per-RPC RSS "
                         "retention, SOAK_r03; 0 disables)")
    ap.add_argument("--gc-every-window", action="store_true",
                    help="gc.collect() after each window (leak triage: "
                         "discriminates cycle-held buffers from native "
                         "transport-client growth)")
    ap.add_argument("--fs", type=int, default=None,
                    help="override sample rate (CPU smoke testing)")
    ap.add_argument("--cpi", type=float, default=None)
    args = ap.parse_args()

    from blah2_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    import bench_runtime as br

    if args.fs:
        br._GEOMETRY["fs"] = args.fs
    if args.cpi:
        br._GEOMETRY["cpi"] = args.cpi

    cfg0 = br._config()
    budget_ms = 1e3 * cfg0.n_samples / cfg0.capture.fs
    fname = br._make_scene(cfg0)
    cfg, api, rt, timings = br._build_runtime(fname, 18799, 16, True)
    rt.recycle_every_cpis = max(0, args.recycle_every)

    rt._start_staged_warmup()
    t = rt._staged_warmup_thread
    if t is not None:
        t.join(timeout=1500.0)

    n_warm = 3
    window = 10
    windows = []
    rt.start_capture()
    t0 = time.perf_counter()
    try:
        rt.run(n_cpis=n_warm, quiet=True)
        done = n_warm
        while done < n_warm + args.cpis:
            step = min(window, n_warm + args.cpis - done)
            t_w = time.perf_counter()
            rt.run(n_cpis=done + step, quiet=True)
            done += step
            if args.gc_every_window:
                import gc

                gc.collect()
            seg = timings[done - step:done]
            cpi_ms = sorted(d["cpi"] for d in seg)
            windows.append({
                "cpi_ms_median": round(cpi_ms[len(cpi_ms) // 2], 1),
                "cpi_ms_max": round(max(cpi_ms), 1),
                "wall_s": round(time.perf_counter() - t_w, 1),
                "rss_mb": round(_rss_mb(), 1),
                "drops": [int(getattr(rt.buffer1, "dropped", 0)),
                          int(getattr(rt.buffer2, "dropped", 0))],
            })
            print(json.dumps(windows[-1]), flush=True)
    finally:
        rt.stop()
        api.stop()
    wall_total = time.perf_counter() - t0

    steady = timings[n_warm:]
    cpi_ms = sorted(d["cpi"] for d in steady)
    rss = [w["rss_mb"] for w in windows]
    drops_end = windows[-1]["drops"] if windows else []
    fails = []
    if max(cpi_ms) > 60_000.0:
        fails.append("watchdog: a CPI exceeded the 60 s staleness bound")
    if len(rss) >= 2 and rss[-1] > rss[0] * 1.10:
        fails.append(f"rss grew {rss[0]} -> {rss[-1]} MB (>10%)")
    if any(d > 0 for d in drops_end):
        fails.append(f"ring drops after warmup: {drops_end}")

    print(json.dumps({
        "metric": "runtime_soak",
        "value": round(cpi_ms[len(cpi_ms) // 2], 1),
        "unit": "ms/CPI median over soak",
        "vs_baseline": round(budget_ms / cpi_ms[len(cpi_ms) // 2], 3),
        "detail": {
            "n_cpis": len(steady),
            "wall_total_s": round(wall_total, 1),
            "cpi_ms_p90": round(cpi_ms[int(len(cpi_ms) * 0.9)], 1),
            "cpi_ms_max": round(max(cpi_ms), 1),
            "rss_mb_first_window": rss[0] if rss else None,
            "rss_mb_last_window": rss[-1] if rss else None,
            "drops": drops_end,
            "windows": windows,
            "failures": fails,
        },
    }))
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
