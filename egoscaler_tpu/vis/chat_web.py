"""Web chat app for PointLLM — the `chat_gradio` equivalent.

The reference serves a gradio app with a 3D point-cloud panel and a chat
box over PointLLM (models/pointllm/pointllm/eval/chat_gradio.py:1-394).
TPU pod hosts are headless and this image is zero-egress, so the rebuild
is dependency-free: a stdlib `http.server` backend plus one
self-contained HTML page (canvas orbit point-cloud viewer + chat panel).
The model backend is any `respond(question: str) -> str` callable —
`models/chat.chat_once` in production, a stub in tests.

Endpoints:
  GET  /            the chat page
  GET  /api/points  {"points": b64 f32 (N,3), "colors": b64 u8 (N,3)}
  POST /api/chat    {"question": str} -> {"answer": str}

Run: python -m egoscaler_tpu.vis.chat_web --point_cloud pc.npy --port 7810
"""
from __future__ import annotations

import argparse
import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional, Tuple

import numpy as np

_PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>{title}</title><style>
body {{ margin:0; display:flex; height:100vh; background:#101014;
       color:#e8e8ef; font:14px system-ui, sans-serif; }}
#view {{ flex:1.3; position:relative; }}
canvas {{ width:100%; height:100%; display:block; }}
#chat {{ flex:1; display:flex; flex-direction:column;
        border-left:1px solid #2a2a33; }}
#log {{ flex:1; overflow-y:auto; padding:14px; }}
.msg {{ margin:6px 0; padding:8px 11px; border-radius:9px;
       white-space:pre-wrap; max-width:85%; }}
.user {{ background:#2b4b6f; margin-left:auto; }}
.bot  {{ background:#23232c; margin-right:auto; }}
#bar {{ display:flex; border-top:1px solid #2a2a33; }}
#q {{ flex:1; background:#16161c; color:#e8e8ef; border:0; padding:12px;
     font:inherit; outline:none; }}
#send {{ background:#2b4b6f; color:#fff; border:0; padding:0 18px;
        cursor:pointer; }}
#hint {{ position:absolute; left:10px; bottom:8px; color:#888;
        font-size:12px; }}
</style></head><body>
<div id="view"><canvas id="cv"></canvas>
  <div id="hint">drag = orbit &middot; wheel = zoom</div></div>
<div id="chat">
  <div id="log"><div class="msg bot">Ask me about this point cloud.</div></div>
  <div id="bar"><input id="q" placeholder="e.g. What object is this?"
    autofocus><button id="send">Send</button></div>
</div>
<script>
const cv = document.getElementById('cv'), ctx = cv.getContext('2d');
let P = new Float32Array(0), C = new Uint8Array(0), N = 0;
let yaw = 0.6, pitch = 0.4, dist = 2.6, cx = 0, cy = 0, cz = 0;
function b64f32(s) {{ const b = atob(s), a = new Uint8Array(b.length);
  for (let i = 0; i < b.length; i++) a[i] = b.charCodeAt(i);
  return new Float32Array(a.buffer); }}
function b64u8(s) {{ const b = atob(s), a = new Uint8Array(b.length);
  for (let i = 0; i < b.length; i++) a[i] = b.charCodeAt(i); return a; }}
function render() {{
  const w = cv.width = cv.clientWidth, h = cv.height = cv.clientHeight;
  ctx.fillStyle = '#101014'; ctx.fillRect(0, 0, w, h);
  const sy = Math.sin(yaw), cyw = Math.cos(yaw);
  const sp = Math.sin(pitch), cp = Math.cos(pitch);
  const f = 0.9 * Math.min(w, h);
  for (let i = 0; i < N; i++) {{
    let x = P[3*i] - cx, y = P[3*i+1] - cy, z = P[3*i+2] - cz;
    let xr = cyw*x + sy*z, zr = -sy*x + cyw*z;
    let yr = cp*y - sp*zr;  zr = sp*y + cp*zr + dist;
    if (zr <= 0.05) continue;
    const u = w/2 + f*xr/zr, v = h/2 + f*yr/zr;
    if (u < 0 || u >= w || v < 0 || v >= h) continue;
    ctx.fillStyle = `rgb(${{C[3*i]}},${{C[3*i+1]}},${{C[3*i+2]}})`;
    ctx.fillRect(u, v, 2, 2);
  }}
}}
let drag = null;
cv.addEventListener('mousedown', e => drag = [e.clientX, e.clientY]);
addEventListener('mouseup', () => drag = null);
addEventListener('mousemove', e => {{ if (!drag) return;
  yaw += (e.clientX - drag[0]) * 0.008;
  pitch += (e.clientY - drag[1]) * 0.008; drag = [e.clientX, e.clientY];
  render(); }});
cv.addEventListener('wheel', e => {{ dist *= Math.exp(e.deltaY * 0.001);
  render(); e.preventDefault(); }});
addEventListener('resize', render);
fetch('/api/points').then(r => r.json()).then(d => {{
  P = b64f32(d.points); C = b64u8(d.colors); N = P.length / 3 | 0;
  let mx = 0, my = 0, mz = 0;
  for (let i = 0; i < N; i++) {{ mx += P[3*i]; my += P[3*i+1]; mz += P[3*i+2]; }}
  if (N) {{ cx = mx/N; cy = my/N; cz = mz/N; }}
  render(); window.__chat_ready = {{ n_points: N }};
}});
const log = document.getElementById('log'), q = document.getElementById('q');
function add(cls, text) {{ const d = document.createElement('div');
  d.className = 'msg ' + cls; d.textContent = text; log.appendChild(d);
  log.scrollTop = log.scrollHeight; return d; }}
async function send() {{
  const text = q.value.trim(); if (!text) return;
  q.value = ''; add('user', text);
  const wait = add('bot', '\\u2026');
  try {{
    const r = await fetch('/api/chat', {{ method: 'POST',
      headers: {{'Content-Type': 'application/json'}},
      body: JSON.stringify({{question: text}}) }});
    const d = await r.json();
    wait.textContent = d.answer !== undefined ? d.answer : ('error: ' + d.error);
  }} catch (err) {{ wait.textContent = 'error: ' + err; }}
}}
document.getElementById('send').addEventListener('click', send);
q.addEventListener('keydown', e => {{ if (e.key === 'Enter') send(); }});
</script></body></html>
"""


def _b64(arr: np.ndarray) -> str:
    return base64.b64encode(np.ascontiguousarray(arr).tobytes()).decode()


class ChatWebServer:
    """Threaded HTTP server bundling the page, the cloud, and a backend.

    `respond` runs on the request thread; by default requests are
    serialized with a lock because generation holds the single TPU chip
    (CLAUDE.md: one TPU process/program at a time).  Pass
    ``serialize=False`` when `respond` is itself concurrency-safe —
    e.g. serving.frontend.EngineWorker.submit_and_wait, where
    concurrent requests SHARE the continuous-batching decode ticks
    instead of queueing.
    """

    def __init__(
        self,
        respond: Callable[[str], str],
        points: np.ndarray,
        colors: Optional[np.ndarray] = None,
        title: str = "PointLLM chat",
        max_points: int = 150_000,
        host: str = "127.0.0.1",
        port: int = 0,
        serialize: bool = True,
    ):
        points = np.asarray(points, np.float32).reshape(-1, 3)
        if colors is None:
            colors = np.full_like(points, 0.7)
        colors = np.asarray(colors)
        if colors.dtype != np.uint8:
            colors = (np.clip(colors, 0.0, 1.0) * 255).astype(np.uint8)
        colors = colors.reshape(-1, 3)
        if len(points) > max_points:
            sel = np.random.default_rng(0).choice(
                len(points), max_points, replace=False
            )
            points, colors = points[sel], colors[sel]
        scale = float(np.abs(points - points.mean(0)).max() or 1.0)
        self._points_json = json.dumps(
            {"points": _b64((points - points.mean(0)) / scale),
             "colors": _b64(colors)}
        ).encode()
        self._page = _PAGE.format(title=title).encode()
        self._respond = respond
        self._lock = threading.Lock() if serialize else None

        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code: int, ctype: str, body: bytes):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path in ("/", "/index.html"):
                    self._send(200, "text/html; charset=utf-8", outer._page)
                elif self.path == "/api/points":
                    self._send(200, "application/json", outer._points_json)
                else:
                    self._send(404, "text/plain", b"not found")

            def do_POST(self):
                if self.path != "/api/chat":
                    self._send(404, "text/plain", b"not found")
                    return
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    req = json.loads(self.rfile.read(n) or b"{}")
                    question = str(req.get("question", "")).strip()
                    if not question:
                        raise ValueError("empty question")
                    if outer._lock is not None:
                        with outer._lock:
                            answer = outer._respond(question)
                    else:
                        answer = outer._respond(question)
                    body = json.dumps({"answer": answer}).encode()
                    self._send(200, "application/json", body)
                except Exception as e:  # surface errors to the page
                    body = json.dumps({"error": str(e)}).encode()
                    self._send(500, "application/json", body)

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread: Optional[threading.Thread] = None

    @property
    def address(self) -> Tuple[str, int]:
        return self._httpd.server_address[:2]

    def start(self) -> "ChatWebServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self):
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--point_cloud", required=True, help=".npy (N, 6) xyzrgb")
    p.add_argument("--model_size", default="tiny")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--port", type=int, default=7810)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--slots", type=int, default=0,
                   help="> 0: serve through the continuous-batching "
                        "engine with this many concurrent decode slots "
                        "(serving/engine.py) instead of a global lock")
    p.add_argument("--max_new_tokens", type=int, default=128)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from egoscaler_tpu.configs import PointLLMConfig
    from egoscaler_tpu.models.chat import build_chat_prompt_ids, chat_once
    from egoscaler_tpu.models.pointllm import TrajPointLLM
    from egoscaler_tpu.training.dataset import HashTextTokenizer

    cfg = PointLLMConfig()
    cfg = cfg.tiny() if args.model_size == "tiny" else cfg
    model = TrajPointLLM(cfg, remat=False)
    pc = np.load(args.point_cloud).astype(np.float32)
    dummy_ids, _ = build_chat_prompt_ids(cfg, "hi", HashTextTokenizer())
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(dummy_ids),
        jnp.asarray(pc[None, : cfg.point_bert.npoints, :]),
    )
    if args.checkpoint:
        from egoscaler_tpu.models.convert import (
            convert_pointllm,
            load_torch_file,
        )

        params = convert_pointllm(load_torch_file(args.checkpoint), cfg)

    decode_fn = lambda t: f"<tokens {t.tolist()[:16]}...>"  # noqa: E731

    if args.slots > 0:
        # concurrent path: HTTP threads share the engine's decode ticks
        from egoscaler_tpu.models.pointllm import GenerateConfig
        from egoscaler_tpu.serving import ServingEngine
        from egoscaler_tpu.serving.frontend import EngineWorker

        from egoscaler_tpu.models.pointbert import pc_norm

        npts = cfg.point_bert.npoints
        pc_n = np.asarray(pc_norm(jnp.asarray(pc)), np.float32)
        sel = np.random.default_rng(0).choice(
            pc_n.shape[0], npts, replace=pc_n.shape[0] < npts
        )
        pc_model = pc_n[sel]
        eng = ServingEngine(
            model, params, num_slots=args.slots,
            prompt_len=dummy_ids.shape[1],
            gen=GenerateConfig(max_new_tokens=args.max_new_tokens),
        )
        eng.warmup()
        worker = EngineWorker(eng)
        tok = HashTextTokenizer()

        def respond(question: str) -> str:
            ids, mask = build_chat_prompt_ids(cfg, question, tok)
            toks = worker.submit_and_wait(
                ids[0], mask[0], pc_model, timeout=600.0
            )
            return decode_fn(toks)

        serialize = False
    else:
        def respond(question: str) -> str:
            return chat_once(model, params, pc, question,
                             decode_fn=decode_fn)

        serialize = True

    colors = pc[:, 3:6] if pc.shape[1] >= 6 else None
    server = ChatWebServer(
        respond, pc[:, :3], colors, host=args.host, port=args.port,
        serialize=serialize,
    )
    server.start()
    host, port = server.address
    print(f"[chat_web] serving on http://{host}:{port}")
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        server.stop()


if __name__ == "__main__":
    main()
