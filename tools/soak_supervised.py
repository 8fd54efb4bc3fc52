"""Supervised bounded-lifetime soak: restart cycles under the watchdog bound.

SOAK_r04 diagnosed the tunnel transport's ~8.7 MB/CPI native RSS
retention and showed transport recycling makes it worse; the stated
production mitigation — bounded process lifetime + restart policy — was
never demonstrated (VERDICT r4 weak #4 / next #2). This tool demonstrates
it, honoring the reference's restart contract
(`script/blah2_rspduo_restart.bash:6-17`: the watchdog restarts the
processor when the map product goes stale > 60 s, while the API container
stays up):

  - ONE standalone API process (TCP ingest + stash) stays up for the
    whole soak — 3-process-topology parity, products and stashes survive
    radar restarts;
  - the radar runs as a sequence of bounded-lifetime CLI processes
    (`--cpis N` each, TCP egress, persistent compile cache), the
    supervisor relaunching after each clean exit;
  - the supervisor samples each worker's RSS from /proc (the sawtooth)
    and polls /api/timestamp to measure every product gap, including the
    inter-restart gaps.

Failure criteria (empty ``failures`` == demonstrated):
  - any product gap >= 60 s (the deployed watchdog's staleness bound),
  - any RSS sample >= the stated cap (default 2800 MB: ~1.7 GB process
    baseline + ~8.7 MB/CPI retention x cycle length + margin),
  - a worker exiting non-zero, or fewer total CPIs than requested.

Run on the chip (detached; ~10-20 min):

    python tools/soak_supervised.py --cycles 4 --cpis-per-cycle 80

Prints one JSON line (saved as SOAK_r05.json).
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import subprocess
import threading
import time
import urllib.request

REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))


def _rss_mb(pid: int) -> float:
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return float(line.split()[1]) / 1024.0
    except OSError:
        pass
    return 0.0


class TimestampWatcher(threading.Thread):
    """Polls /api/timestamp; records the wall time of every change."""

    def __init__(self, url: str, interval: float = 0.5):
        super().__init__(daemon=True)
        self.url = url
        self.interval = interval
        self.events: list = []  # (wall_s, timestamp_value)
        self._stop = threading.Event()
        self._last = None

    def run(self):
        while not self._stop.is_set():
            try:
                with urllib.request.urlopen(self.url, timeout=2) as r:
                    ts = r.read().decode().strip()
                if ts and ts != self._last:
                    self._last = ts
                    self.events.append((time.perf_counter(), ts))
            except Exception:
                pass
            self._stop.wait(self.interval)

    def stop(self):
        self._stop.set()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cycles", type=int, default=4)
    ap.add_argument("--cpis-per-cycle", type=int, default=80)
    ap.add_argument("--rss-cap-mb", type=float, default=2800.0)
    ap.add_argument("--api-port", type=int, default=18810)
    ap.add_argument("--fs", type=int, default=None,
                    help="override sample rate (CPU smoke testing)")
    ap.add_argument("--cpi", type=float, default=None)
    ap.add_argument("--platform", default=None,
                    help="forwarded to the worker CLI (CPU smoke)")
    ap.add_argument("--out", default=None, help="also write JSON here")
    args = ap.parse_args()

    import bench_runtime as br

    if args.fs:
        br._GEOMETRY["fs"] = args.fs
    if args.cpi:
        br._GEOMETRY["cpi"] = args.cpi
    cfg0 = br._config()
    budget_ms = 1e3 * cfg0.n_samples / cfg0.capture.fs
    scene = br._make_scene(cfg0)

    # One config file for both processes (the reference pattern: one
    # YAML, two consumers). Non-default ports so a dev API can coexist.
    import yaml

    base = args.api_port
    cfg_doc = {
        "capture": {"fs": cfg0.capture.fs, "fc": cfg0.capture.fc,
                    "device": {"type": "RspDuo"},
                    "replay": {"state": True, "loop": True, "file": scene}},
        "process": {
            "data": {"cpi": cfg0.process.data.cpi, "buffer": 2},
            "ambiguity": {"delayMin": cfg0.process.ambiguity.delay_min,
                          "delayMax": cfg0.process.ambiguity.delay_max,
                          "dopplerMin": cfg0.process.ambiguity.doppler_min,
                          "dopplerMax": cfg0.process.ambiguity.doppler_max},
            "clutter": {"enable": True,
                        "delayMin": cfg0.process.clutter.delay_min,
                        "delayMax": cfg0.process.clutter.delay_max},
            "detection": {"enable": True, "pfa": 1e-5, "nGuard": 2,
                          "nTrain": 10, "minDelay": 5, "minDoppler": 15,
                          "nCentroid": 16},
            "tracker": {"enable": True,
                        "initiate": {"M": 3, "N": 5, "maxAcc": 2.0},
                        "delete": 8, "smooth": "none"},
        },
        "network": {"ip": "127.0.0.1",
                    "ports": {"api": base, "map": base + 1,
                              "detection": base + 2, "track": base + 3,
                              "timestamp": base + 4, "timing": base + 5,
                              "iqdata": base + 6, "config": base + 7}},
    }
    cfg_path = _os.path.join(_os.path.dirname(scene), "soak_config.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg_doc, f)

    env = dict(_os.environ)

    api = subprocess.Popen(
        [_sys.executable, "-m", "blah2_tpu.net.api", "-c", cfg_path],
        cwd=REPO, env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.STDOUT)
    time.sleep(1.0)

    watcher = TimestampWatcher(
        f"http://127.0.0.1:{base}/api/timestamp", interval=0.2)
    watcher.start()

    worker_cmd = [_sys.executable, "-m", "blah2_tpu.runtime.cli",
                  "-c", cfg_path, "--no-api", "--tcp-egress",
                  "--cpis", str(args.cpis_per_cycle),
                  "--staged-sample-every", "0", "--quiet"]
    if args.platform:
        worker_cmd += ["--platform", args.platform]

    cycles = []
    fails = []
    t_soak0 = time.perf_counter()
    try:
        for c in range(args.cycles):
            t_c0 = time.perf_counter()
            w = subprocess.Popen(worker_cmd, cwd=REPO, env=env,
                                 stdout=subprocess.DEVNULL,
                                 stderr=subprocess.STDOUT)
            rss = []
            while w.poll() is None:
                v = _rss_mb(w.pid)
                if v > 10.0:  # skip the pre-exec/early-spawn window
                    rss.append(v)
                time.sleep(2.0)
            rc = w.returncode
            n_events_now = len(watcher.events)
            cycles.append({
                "cycle": c,
                "exit_code": rc,
                "wall_s": round(time.perf_counter() - t_c0, 1),
                "rss_mb_first": round(rss[0], 1) if rss else None,
                "rss_mb_max": round(max(rss), 1) if rss else None,
                "rss_mb_last": round(rss[-1], 1) if rss else None,
                "products_seen_so_far": n_events_now,
            })
            print(json.dumps(cycles[-1]), flush=True)
            if rc != 0:
                fails.append(f"cycle {c}: worker exited {rc}")
                break
    finally:
        watcher.stop()
        api.terminate()
        try:
            api.wait(timeout=15)
        except subprocess.TimeoutExpired:
            api.kill()
    wall_total = time.perf_counter() - t_soak0

    events = watcher.events
    gaps = [events[i][0] - events[i - 1][0] for i in range(1, len(events))]
    max_gap = max(gaps) if gaps else None
    # Restart gaps: the largest gap within each cycle boundary region.
    boundaries = []
    seen = 0
    for cyc in cycles[:-1]:
        seen = cyc["products_seen_so_far"]
        if 0 < seen < len(events):
            boundaries.append(round(events[seen][0] - events[seen - 1][0],
                                    1))

    # CPIs processed = cycles x cpis_per_cycle, guaranteed by each
    # worker's clean exit (`--cpis N` + exit 0); the watcher only OBSERVES
    # timestamp changes at its poll rate, so its event count is a lower
    # bound used for gap measurement and API-continuity, not a CPI count.
    n_products = len(events)
    cpis_done = sum(args.cpis_per_cycle for c in cycles
                    if c["exit_code"] == 0)
    rss_max = max((c["rss_mb_max"] or 0) for c in cycles) if cycles else 0
    if max_gap is not None and max_gap >= 60.0:
        fails.append(f"product gap {max_gap:.1f} s >= watchdog 60 s bound")
    if rss_max >= args.rss_cap_mb:
        fails.append(f"rss {rss_max} MB >= cap {args.rss_cap_mb} MB")
    if n_products < len(cycles):
        fails.append("API saw fewer product updates than cycles "
                     f"({n_products} < {len(cycles)})")

    result = {
        "metric": "supervised_restart_soak",
        "value": cpis_done,
        "unit": "CPIs across restart cycles",
        "vs_baseline": round((max_gap or 0.0) / 60.0, 3),
        "detail": {
            "what": "bounded-lifetime mitigation for the tunnel "
                    "transport's native RSS retention: radar restarts "
                    f"every {args.cpis_per_cycle} CPIs; the standalone "
                    "API (3-proc topology) holds products/stashes across "
                    "restarts; gap criterion = the deployed watchdog's "
                    "60 s staleness bound "
                    "(deploy/watchdog.bash, script parity "
                    "blah2_rspduo_restart.bash:6-17)",
            "cycles": cycles,
            "n_cycles": len(cycles),
            "cpis_per_cycle": args.cpis_per_cycle,
            "n_cpis_processed": cpis_done,
            "n_product_updates_observed": n_products,
            "realtime_budget_ms": round(budget_ms, 1),
            "product_gap_s_max": round(max_gap, 1) if max_gap else None,
            "inter_restart_gaps_s": boundaries,
            "rss_cap_mb": args.rss_cap_mb,
            "rss_mb_max_observed": rss_max,
            "rss_sawtooth_first_per_cycle":
                [c["rss_mb_first"] for c in cycles],
            "rss_sawtooth_last_per_cycle":
                [c["rss_mb_last"] for c in cycles],
            "wall_total_s": round(wall_total, 1),
            "failures": fails,
        },
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
