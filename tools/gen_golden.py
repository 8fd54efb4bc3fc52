"""Regenerate the frozen in-tree golden parity artifacts (tests/golden/).

The reference pins parity to a real recording with in-tree constants
(`test/unit/process/ambiguity/TestAmbiguity.cpp:147-178`, golden file
`20231214-230611.rspduo`). This repo's live-oracle tests
(tests/test_oracle.py) are stronger in coverage but need g++ and the
mounted reference tree; this tool freezes their evidence so the repo
carries self-contained golden numbers that survive losing the mount:

  tests/golden/golden_scene.rspduo.iq   canonical int16-quad recording
  tests/golden/oracle_map.npy           reference complex map (float64)
  tests/golden/golden.json              noise/max power, CFAR cells,
                                        centroid + interpolate lists,
                                        reference track tables, metadata

tests/test_golden_parity.py asserts against these WITHOUT g++ or
/root/reference. Rerun this tool (needs both) only when the canonical
scene or the oracle protocol changes:

    python tools/gen_golden.py
"""

from __future__ import annotations

import json
import os as _os
import shutil
import struct
import subprocess
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
ORACLE_DIR = _os.path.join(REPO, "tests", "oracle")
GOLDEN_DIR = _os.path.join(REPO, "tests", "golden")

# The canonical scene — identical to tests/test_oracle.py's SCENE so the
# live-oracle tier regenerates exactly what this freezes.
FS = 200_000
CPI_S = 0.1
SCENE = dict(targets=[(40, -77.0, 0.05), (61, 112.0, 0.03)],
             clutter=3.0, noise=1e-3, seed=20240817)
AMB = dict(delay_min=-10, delay_max=100, doppler_min=-200, doppler_max=200)
CLUTTER = dict(delay_min=-10, delay_max=100)
DET = dict(pfa=1e-5, n_guard=2, n_train=6, min_delay=5, min_doppler=15.0,
           n_centroid=6)

# Track scenarios mirrored from tests/test_oracle.py::TestOracleTracker.
TRACKER = dict(m=3, n=5, n_delete=4, cpi=0.5, max_acc=2.0,
               range_res=1500.0, lam=1.5)
TRACK_SCENARIOS = {
    "far_from_origin": [(1000 + k, [(40.0, 20.0, 15.0)]) for k in range(8)],
    "near_origin": [(1000 + k, [(0.3, 1.0, 15.0)]) for k in range(8)],
}


def _read_oracle_full(path):
    with open(path, "rb") as f:
        rows, cols = struct.unpack("<ii", f.read(8))
        cmap = np.fromfile(f, dtype=np.complex128,
                           count=rows * cols).reshape(rows, cols)
        noise, maxp = struct.unpack("<dd", f.read(16))
        ok, = struct.unpack("<i", f.read(4))

        def det_block():
            n, = struct.unpack("<i", f.read(4))
            return np.fromfile(f, dtype=np.float64,
                               count=3 * n).reshape(n, 3)

        det, cent, interp = det_block(), det_block(), det_block()
    return dict(rows=rows, cols=cols, cmap=cmap, noise=noise, maxp=maxp,
                ok=ok, det=det, cent=cent, interp=interp)


def _run_ref_tracker(aux_bin, cpis):
    lines = []
    for ts, dets in cpis:
        lines.append(f"T {ts}")
        for d, f, s in dets:
            lines.append(f"D {d} {f} {s}")
        lines.append("E")
    t = TRACKER
    r = subprocess.run(
        [aux_bin, "track", str(t["m"]), str(t["n"]), str(t["n_delete"]),
         str(t["cpi"]), str(t["max_acc"]), str(t["range_res"]),
         str(t["lam"])],
        input="\n".join(lines) + "\n", capture_output=True, text=True,
        timeout=60, check=True)
    tables, cur = [], None
    for line in r.stdout.splitlines():
        tok = line.split()
        if tok[0] == "N":
            cur = []
            tables.append(cur)
        else:
            cur.append(dict(state=tok[1], delay=float(tok[2]),
                            doppler=float(tok[3]), acc=float(tok[4]),
                            n_inactive=int(tok[5])))
    return tables


def main() -> None:
    if shutil.which("g++") is None or not _os.path.isdir("/root/reference/src"):
        raise SystemExit("gen_golden needs g++ and the mounted reference")
    subprocess.run(["make", "-C", ORACLE_DIR], check=True,
                   capture_output=True, text=True)
    oracle_bin = _os.path.join(ORACLE_DIR, "oracle")
    aux_bin = _os.path.join(ORACLE_DIR, "aux_harness")
    _os.makedirs(GOLDEN_DIR, exist_ok=True)

    # 1. The canonical recording, through the real record path.
    from blah2_tpu.capture.source import Source
    from blah2_tpu.capture.synthetic import TargetSpec, synthetic_cpi

    n = int(FS * CPI_S)
    x, y = synthetic_cpi(
        n, FS, [TargetSpec(*t) for t in SCENE["targets"]],
        clutter_amplitude=SCENE["clutter"], noise_amplitude=SCENE["noise"],
        seed=SCENE["seed"])
    src = Source("RspDuo", FS, 204_640_000, path=GOLDEN_DIR)
    tmp_name = src.open_record_file()
    src.record(x * 4000.0, y * 4000.0)
    src.close_record_file()
    iq_path = _os.path.join(GOLDEN_DIR, "golden_scene.rspduo.iq")
    _os.replace(tmp_name, iq_path)

    # 2. Reference products on it.
    out_bin = _os.path.join(GOLDEN_DIR, "_oracle_out.bin")
    subprocess.run(
        [oracle_bin, iq_path, out_bin, str(FS), str(CPI_S),
         str(AMB["delay_min"]), str(AMB["delay_max"]),
         str(AMB["doppler_min"]), str(AMB["doppler_max"]),
         "1", str(CLUTTER["delay_min"]), str(CLUTTER["delay_max"]),
         str(DET["pfa"]), str(DET["n_guard"]), str(DET["n_train"]),
         str(DET["min_delay"]), str(DET["min_doppler"]),
         str(DET["n_centroid"])],
        check=True, capture_output=True, text=True, timeout=600)
    full = _read_oracle_full(out_bin)
    _os.remove(out_bin)
    np.save(_os.path.join(GOLDEN_DIR, "oracle_map.npy"), full["cmap"])

    # 3. Reference tracker life cycles.
    tracks = {name: _run_ref_tracker(aux_bin, cpis)
              for name, cpis in TRACK_SCENARIOS.items()}

    doc = {
        "what": "oracle-produced golden constants for the canonical scene; "
                "regenerate with tools/gen_golden.py (needs g++ + "
                "/root/reference)",
        "scene": {"fs": FS, "cpi_s": CPI_S, **SCENE},
        "ambiguity": AMB, "clutter": CLUTTER, "detection": DET,
        "rows": full["rows"], "cols": full["cols"],
        "noise_power_db": full["noise"], "max_power_db": full["maxp"],
        "clutter_ok": int(full["ok"]),
        "cfar_cells": full["det"].tolist(),
        "centroided": full["cent"].tolist(),
        "interpolated": full["interp"].tolist(),
        "tracker": {"params": TRACKER,
                    "scenarios": {k: [(ts, d) for ts, d in v]
                                  for k, v in TRACK_SCENARIOS.items()},
                    "reference_tables": tracks},
    }
    path = _os.path.join(GOLDEN_DIR, "golden.json")
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"written": path, "iq": iq_path,
                      "n_cfar": len(doc["cfar_cells"]),
                      "n_interp": len(doc["interpolated"]),
                      "noise": doc["noise_power_db"],
                      "maxp": doc["max_power_db"]}))


if __name__ == "__main__":
    main()
