"""Web chat app (chat_gradio.py equivalent) endpoint tests."""
import json
import urllib.error
import urllib.request

import numpy as np
import pytest

from egoscaler_tpu.vis.chat_web import ChatWebServer


@pytest.fixture()
def server():
    pts = np.random.default_rng(0).normal(size=(500, 3)).astype(np.float32)
    cols = np.random.default_rng(1).random((500, 3)).astype(np.float32)
    srv = ChatWebServer(
        respond=lambda q: f"echo: {q}", points=pts, colors=cols
    ).start()
    yield srv
    srv.stop()


def _url(server, path):
    host, port = server.address
    return f"http://{host}:{port}{path}"


def test_page_serves(server):
    with urllib.request.urlopen(_url(server, "/")) as r:
        body = r.read().decode()
    assert r.status == 200
    assert "api/chat" in body and "canvas" in body


def test_points_endpoint(server):
    with urllib.request.urlopen(_url(server, "/api/points")) as r:
        data = json.loads(r.read())
    import base64

    pts = np.frombuffer(base64.b64decode(data["points"]), np.float32)
    cols = np.frombuffer(base64.b64decode(data["colors"]), np.uint8)
    assert pts.shape[0] == 500 * 3
    assert cols.shape[0] == 500 * 3
    # normalized for the viewer: centered, max-abs <= 1
    assert abs(pts.reshape(-1, 3).mean(0)).max() < 0.2
    assert np.abs(pts).max() <= 1.0 + 1e-5


def test_chat_roundtrip(server):
    req = urllib.request.Request(
        _url(server, "/api/chat"),
        data=json.dumps({"question": "what is this?"}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as r:
        out = json.loads(r.read())
    assert out["answer"] == "echo: what is this?"


def test_chat_empty_question_errors(server):
    req = urllib.request.Request(
        _url(server, "/api/chat"),
        data=json.dumps({"question": ""}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 500
    assert "error" in json.loads(e.value.read())


def test_unknown_path_404(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(_url(server, "/nope"))
    assert e.value.code == 404
