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


def test_concurrent_engine_backend():
    """serialize=False + EngineWorker: parallel HTTP clients share the
    continuous-batching engine and all get well-formed answers."""
    import threading

    import jax

    from egoscaler_tpu.configs import PointLLMConfig
    from egoscaler_tpu.models.chat import build_chat_prompt_ids
    from egoscaler_tpu.models.pointllm import GenerateConfig, TrajPointLLM
    from egoscaler_tpu.serving import ServingEngine
    from egoscaler_tpu.serving.frontend import EngineWorker
    from egoscaler_tpu.training.dataset import HashTextTokenizer

    cfg = PointLLMConfig().tiny()
    model = TrajPointLLM(cfg)
    tok = HashTextTokenizer()
    dummy_ids, _ = build_chat_prompt_ids(cfg, "hi", tok)
    rng = np.random.default_rng(2)
    pc = rng.normal(size=(cfg.point_bert.npoints, 6)).astype(np.float32)
    import jax.numpy as jnp

    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(dummy_ids), jnp.asarray(pc[None])
    )
    eng = ServingEngine(
        model, params, num_slots=2, prompt_len=dummy_ids.shape[1],
        gen=GenerateConfig(max_new_tokens=8, do_sample=False), chunk=4,
    )
    worker = EngineWorker(eng)

    def respond(question: str) -> str:
        ids, mask = build_chat_prompt_ids(cfg, question, tok)
        toks = worker.submit_and_wait(ids[0], mask[0], pc, timeout=300.0)
        return f"<{len(toks)} tokens>"

    pts = pc[:, :3]
    srv = ChatWebServer(respond, pts, serialize=False).start()
    try:
        answers = [None] * 4
        errs = []

        def call(i):
            try:
                req = urllib.request.Request(
                    _url(srv, "/api/chat"),
                    data=json.dumps({"question": f"q{i}"}).encode(),
                    headers={"Content-Type": "application/json"},
                )
                with urllib.request.urlopen(req) as r:
                    answers[i] = json.loads(r.read())["answer"]
            except Exception as e:  # surfaced below
                errs.append((i, e))

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs, errs
        assert all(a == "<8 tokens>" for a in answers), answers
    finally:
        srv.stop()
        worker.stop()
