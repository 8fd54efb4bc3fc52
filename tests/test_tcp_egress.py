"""TCP-egress topology e2e: radar process → six TCP streams → standalone API.

The reference's 3-container topology wires the C++ processor to the Node API
over localhost TCP (`src/blah2.cpp:101-112`, `api/server.js:123-213`). Here
the standalone API entry point (``python -m blah2_tpu.net.api``) runs as a
real subprocess with the six ingest listeners open, while the radar runtime
runs with ``use_tcp_egress`` and no in-process API — the exact wiring of
``deploy/docker-compose-3proc.yml``.
"""

import json
import os
import subprocess
import sys
import time
import urllib.request

import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG = os.path.join(REPO, "config", "config-synthetic.yml")

PORTS = {"api": 18600, "map": 18601, "detection": 18602, "track": 18603,
         "timestamp": 18700, "timing": 18701, "iqdata": 18702,
         "config": 18703}


@pytest.fixture(scope="module")
def tcp_topology(tmp_path_factory):
    """Start the standalone API subprocess, run the radar with TCP egress,
    return the REST products."""
    tmp = tmp_path_factory.mktemp("egress")
    with open(CONFIG) as f:
        raw = yaml.safe_load(f)
    raw["network"]["ports"] = dict(PORTS)
    cfg_path = tmp / "config.yml"
    cfg_path.write_text(yaml.safe_dump(raw))

    proc = subprocess.Popen(
        [sys.executable, "-m", "blah2_tpu.net.api", "-c", str(cfg_path)],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )

    def get(path, timeout=5):
        with urllib.request.urlopen(
                f"http://127.0.0.1:{PORTS['api']}{path}", timeout=timeout
        ) as r:
            return r.read().decode()

    try:
        # Wait for the API to come up.
        deadline = time.monotonic() + 20
        while True:
            try:
                get("/api/timestamp", timeout=1)
                break
            except Exception:
                if time.monotonic() > deadline:
                    raise RuntimeError("standalone API never came up")
                if proc.poll() is not None:
                    out = proc.stdout.read().decode()
                    raise RuntimeError(f"API process exited: {out}")
                time.sleep(0.2)

        from blah2_tpu.config import load_config
        from blah2_tpu.runtime.radar import RadarRuntime

        cfg = load_config(str(cfg_path))
        runtime = RadarRuntime(cfg, api_server=None, use_tcp_egress=True)
        runtime.start_capture()
        runtime.run(n_cpis=2, quiet=True)
        runtime.stop()

        # The TCP publishes are synchronous, but the ingest handler swaps
        # the product in on its own thread — poll briefly for the map.
        deadline = time.monotonic() + 10
        while not get("/api/map"):
            if time.monotonic() > deadline:
                break
            time.sleep(0.1)

        products = {p: get(f"/api/{p}")
                    for p in ("map", "detection", "tracker", "timestamp",
                              "timing", "iqdata")}
        yield products
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait()


def test_products_cross_tcp(tcp_topology):
    p = tcp_topology
    doc = json.loads(p["map"])
    assert doc["nRows"] > 0 and len(doc["data"]) == doc["nRows"]
    assert doc["maxPower"] > 10
    det = json.loads(p["detection"])
    assert len(det["delay"]) >= 1
    assert p["timestamp"].strip().isdigit()
    t = json.loads(p["timing"])
    assert t["nCpi"] == 2 and "ambiguity_processing" in t
    iq = json.loads(p["iqdata"])
    assert len(iq["spectrum"]) > 0
    trk = json.loads(p["tracker"])
    assert "n" in trk and "data" in trk


def test_ingest_splits_coalesced_documents():
    """Two products coalesced into one recv must publish as two documents
    (the reference's Node listener concatenates them — a product-corrupting
    framing race not worth replicating, `api/server.js:123-136`). Also
    covers a '}' inside a JSON string and a document split mid-send."""
    import socket
    import threading

    from blah2_tpu.net.api import ApiState, _IngestServer

    state = ApiState()
    srv = _IngestServer(("127.0.0.1", 0), "map", state)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()

    def wait_until(pred, timeout=5.0):
        deadline = time.monotonic() + timeout
        while not pred():
            if time.monotonic() > deadline:
                return False
            time.sleep(0.01)
        return True

    try:
        docs = [json.dumps({"timestamp": i, "note": "brace } in string",
                            "data": [[float(i)]]}) for i in (1, 2, 3)]
        s = socket.create_connection(("127.0.0.1", port), timeout=5)
        # Coalesced: two complete documents in one send.
        s.sendall((docs[0] + docs[1]).encode())
        assert wait_until(lambda: state.get("map") == docs[1])
        assert len(state.maxhold._maps) == 2
        # Split: a document delivered across two sends, the first ending
        # with '}' (inside a string — must keep buffering, not publish).
        cut = docs[2].index("}") + 1
        s.sendall(docs[2][:cut].encode())
        time.sleep(0.1)
        s.sendall(docs[2][cut:].encode())
        assert wait_until(lambda: state.get("map") == docs[2])
        assert len(state.maxhold._maps) == 3
        s.close()
    finally:
        srv.shutdown()
        srv.server_close()


def test_ingest_resyncs_after_poisoned_prefix(monkeypatch):
    """A malformed document at the buffer head must not wedge the
    connection forever: junk before a document start is skipped
    immediately, and an unparseable '{...'-head is dropped to the next
    document once the buffer exceeds the resync bound."""
    import socket
    import threading

    from blah2_tpu.net.api import ApiState, _IngestHandler, _IngestServer

    monkeypatch.setattr(_IngestHandler, "MAX_BUF", 64)
    state = ApiState()
    srv = _IngestServer(("127.0.0.1", 0), "detection", state)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()

    def wait_value(want, timeout=5.0):
        deadline = time.monotonic() + timeout
        while state.get("detection") != want:
            if time.monotonic() > deadline:
                return False
            time.sleep(0.01)
        return True

    try:
        s = socket.create_connection(("127.0.0.1", port), timeout=5)
        good1 = json.dumps({"timestamp": 1, "delay": [1.0]})
        # Junk prefix before a document start: skipped immediately.
        s.sendall((")))junk" + good1).encode())
        assert wait_value(good1)
        # Poisoned head: '{'-leading but never parseable; once the buffer
        # grows past MAX_BUF the head is dropped and the stream recovers.
        s.sendall(b'{"bad": }')
        good2 = json.dumps({"timestamp": 2, "delay": [2.0],
                            "pad": "x" * 80})
        s.sendall(good2.encode())
        assert wait_value(good2)
        s.close()
    finally:
        srv.shutdown()
        srv.server_close()


def test_ingest_resync_is_one_pass_despite_embedded_braces(monkeypatch):
    """Recovery from a poisoned head whose string literals contain many
    '{' characters must complete in ONE resync pass: stepping one brace
    per MAX_BUF refill would cost a full buffer of data per embedded
    brace before the stream recovered (advisor finding, r4)."""
    import socket
    import threading

    from blah2_tpu.net.api import ApiState, _IngestHandler, _IngestServer

    monkeypatch.setattr(_IngestHandler, "MAX_BUF", 64)
    state = ApiState()
    srv = _IngestServer(("127.0.0.1", 0), "detection", state)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()

    def wait_value(want, timeout=5.0):
        deadline = time.monotonic() + timeout
        while state.get("detection") != want:
            if time.monotonic() > deadline:
                return False
            time.sleep(0.01)
        return True

    try:
        s = socket.create_connection(("127.0.0.1", port), timeout=5)
        # Unterminated string with 12 embedded '{' — never parseable.
        poisoned = '{"bad": "' + "{" * 12 + "x"
        good = json.dumps({"timestamp": 7, "delay": [7.0], "pad": "y" * 80})
        # One send that takes the buffer past MAX_BUF: the good document
        # must publish without any further data arriving (the old
        # brace-at-a-time resync would need ~12 more MAX_BUF refills).
        s.sendall((poisoned + good).encode())
        assert wait_value(good)
        s.close()
    finally:
        srv.shutdown()
        srv.server_close()


def test_standalone_api_serves_config_and_web(tcp_topology):
    def get(path):
        with urllib.request.urlopen(
                f"http://127.0.0.1:{PORTS['api']}{path}", timeout=5) as r:
            return r.read().decode()

    doc = json.loads(get("/api/config"))
    assert doc["capture"]["fs"] == 200000
    # The standalone API serves the web console by default (3-container
    # parity: the reference's httpd container, `docker-compose.yml:33-43`).
    assert "<html" in get("/").lower()
