"""Regenerate tests/web/fixtures/ — real product documents for the
renderer-execution tests.

Runs the full synthetic app (CPU) and captures the JSON bodies the web
console actually fetches (/api/map, /api/detection, /stash/detection,
/stash/iqdata, /stash/timing, /api/config), so the renderer smoke
(tests/web/renderer_smoke.mjs, also run in CI) draws against genuine
contract documents rather than hand-written approximations.

    python tools/gen_web_fixtures.py
"""

from __future__ import annotations

import json
import os as _os
import subprocess
import sys as _sys
import time
import urllib.request

REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
FIXTURES = _os.path.join(REPO, "tests", "web", "fixtures")

ENDPOINTS = {
    "map": "/api/map",
    "detection": "/api/detection",
    "stash_detection": "/stash/detection",
    "stash_iqdata": "/stash/iqdata",
    "stash_timing": "/stash/timing",
    "config": "/api/config",
}


def main() -> None:
    env = dict(_os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu")
    p = subprocess.Popen(
        [_sys.executable, "-m", "blah2_tpu.runtime.cli",
         "-c", _os.path.join(REPO, "config", "config-synthetic.yml")],
        env=env, cwd=REPO,
        stdout=subprocess.DEVNULL, stderr=subprocess.STDOUT)
    _os.makedirs(FIXTURES, exist_ok=True)
    try:
        docs = {}
        deadline = time.time() + 300
        while time.time() < deadline and len(docs) < len(ENDPOINTS):
            for name, path in ENDPOINTS.items():
                if name in docs:
                    continue
                try:
                    with urllib.request.urlopen(
                            f"http://127.0.0.1:3000{path}", timeout=2) as r:
                        body = r.read().decode()
                    doc = json.loads(body)
                except Exception:
                    continue
                # Wait for stashes to hold a few CPIs so the pages draw
                # real series, and for at least one detection.
                if name.startswith("stash_") and isinstance(doc, dict):
                    ts = doc.get("timestamp") or []
                    if len(ts) < 3:
                        continue
                if name == "detection" and not (doc.get("delay") or []):
                    continue
                docs[name] = body
            time.sleep(0.5)
        missing = sorted(set(ENDPOINTS) - set(docs))
        if missing:
            raise SystemExit(f"timed out waiting for products: {missing}")
    finally:
        p.terminate()
        try:
            p.wait(timeout=30)
        except subprocess.TimeoutExpired:
            p.kill()
    for name, body in docs.items():
        with open(_os.path.join(FIXTURES, f"{name}.json"), "w") as f:
            f.write(body)
    sizes = {n: len(b) for n, b in docs.items()}
    print(json.dumps({"written": FIXTURES, "bytes": sizes}))


if __name__ == "__main__":
    main()
