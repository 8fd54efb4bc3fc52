"""Web frontend serving: static pages from the API server's web root.

The reference serves `html/` via a separate httpd container
(`docker-compose.yml:33-43`); our ApiServer can serve the `web/` tree
directly so a single process provides radar + API + frontend.
"""

import json
import os
import urllib.request

import pytest

from blah2_tpu.config import config_from_dict
from blah2_tpu.net.api import ApiServer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WEB = os.path.join(REPO, "web")


@pytest.fixture()
def server():
    cfg = config_from_dict({
        "capture": {"fs": 200_000, "fc": 204_640_000},
        "network": {"ip": "127.0.0.1",
                    "ports": {"api": 0, "map": 0, "detection": 0,
                              "track": 0, "timestamp": 0, "timing": 0,
                              "iqdata": 0}},
    })
    srv = ApiServer(cfg, web_root=WEB)
    srv.start(with_ingest=False)
    port = srv._servers[0].server_address[1]
    yield srv, port
    srv.stop()


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
        return r.status, r.headers.get("Content-Type"), r.read()


PAGES = [
    "/", "/controller/", "/display/map/", "/display/maxhold/",
    "/display/detection/delay/", "/display/detection/doppler/",
    "/display/detection/delay-doppler/", "/display/spectrum/",
    "/display/timing/",
]


def test_all_pages_serve(server):
    _, port = server
    for page in PAGES:
        status, ctype, body = _get(port, page)
        assert status == 200
        assert "text/html" in ctype
        assert b"<!DOCTYPE html>" in body


def test_assets_serve_with_types(server):
    _, port = server
    status, ctype, _ = _get(port, "/lib/style.css")
    assert status == 200 and "text/css" in ctype
    status, ctype, body = _get(port, "/lib/plot.js")
    assert status == 200 and "javascript" in ctype
    assert b"heatmapLayer" in body


def test_plot_lib_has_zoom_pan(server):
    """Map zoom/pan interaction parity with the Plotly frontend
    (`html/js/plot_map.js:56-110` gets zoom/pan/reset as Plotly defaults):
    the canvas lib must ship wheel zoom, drag pan and double-click reset,
    and the map/detection pages must load it."""
    _, port = server
    _, _, body = _get(port, "/lib/plot.js")
    for feature in (b'addEventListener("wheel"',
                    b'addEventListener("mousedown"',
                    b'addEventListener("dblclick"',
                    b"resetView", b"_zoomAbout"):
        assert feature in body, feature
    for page in ("/display/map/", "/display/detection/delay-doppler/"):
        _, _, html = _get(port, page)
        assert b"/lib/plot.js" in html


def test_traversal_rejected(server):
    _, port = server
    import urllib.error
    for path in ("/../etc/passwd", "/%2e%2e/%2e%2e/etc/passwd"):
        try:
            status, _, body = _get(port, path)
        except urllib.error.HTTPError as e:
            status, body = e.code, e.read()
        assert status == 404
        assert b"root:" not in body


def test_api_routes_still_work(server):
    srv, port = server
    payload = {"timestamp": 1, "nRows": 1, "nCols": 2, "noisePower": 0.0,
               "maxPower": 1.0, "delay": [0, 1], "doppler": [0],
               "data": [[1.0, 2.0]]}
    srv.publish("map", json.dumps(payload))
    status, ctype, body = _get(port, "/api/map")
    assert status == 200
    assert json.loads(body) == payload
