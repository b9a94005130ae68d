"""Interactive web GUI backend.

Same protocol as the reference's Flask app (reference gui.py:14-45):
  GET  /                   -> the annotation UI page
  POST /execute_function   -> {"variable1": meta_prompt} runs one generation
                              with a random seed, returns {"result": path}
  GET  /static/output.png  -> the last generated image
  every response carries Cache-Control: no-store

Implemented on the stdlib http.server (Flask is not available in this
environment); single-threaded by design — the reference's Flask debug server
mutated unguarded global state per request (SURVEY.md §5 'race detection'),
whereas here each request builds its own immutable config/spec.
"""
from __future__ import annotations

import json
import random
import shutil
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer
from pathlib import Path

WEB_DIR = Path(__file__).parent / "web"


def run_server(config, pipe, host: str = "127.0.0.1", port: int = 5000, once: bool = False):
    from guided_attention_tpu.annotation import parse_prompt
    from guided_attention_tpu.frontends import cli as cli_mod

    static_dir = config.output_path / "static"
    static_dir.mkdir(parents=True, exist_ok=True)
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.send_header("Cache-Control", "no-store")
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):
            pass

        def do_GET(self):
            if self.path in ("/", "/index.html"):
                page = (WEB_DIR / "ui.html").read_bytes()
                self._send(200, page, "text/html; charset=utf-8")
            elif self.path.startswith("/static/output.png"):
                p = static_dir / "output.png"
                if p.exists():
                    self._send(200, p.read_bytes(), "image/png")
                else:
                    self._send(404, b"no output yet", "text/plain")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            if self.path != "/execute_function":
                self._send(404, b"not found", "text/plain")
                return
            try:
                # request validation only: bad JSON / malformed meta-prompt
                # (e.g. unbalanced bracket) -> JSON 400 the UI can show.
                # Faults past this boundary are SERVER errors (500 below) —
                # a mid-generation ValueError is not the client's fault.
                length = int(self.headers.get("Content-Length", "0"))
                payload = json.loads(self.rfile.read(length) or b"{}")
                meta_prompt = payload.get("variable1", "")
                parse_prompt(meta_prompt, pipe.registry.as_dict())
            except (ValueError, KeyError, TypeError) as e:
                self._send(400, json.dumps({"error": str(e)}).encode(),
                           "application/json")
                return
            try:
                with lock:
                    config.meta_prompt = meta_prompt
                    config.seeds = [int(random.randrange(4294967294))]  # gui.py:29
                    config.interactive = True
                    image_path = cli_mod.execute(config, pipe)
                    shutil.copyfile(str(image_path), static_dir / "output.png")
            except Exception as e:  # noqa: BLE001 — server-side failure,
                # never a dropped connection
                self._send(500,
                           json.dumps({"error": f"{type(e).__name__}: {e}"}).encode(),
                           "application/json")
                return
            body = json.dumps({"result": str(image_path)}).encode()
            self._send(200, body, "application/json")

    server = HTTPServer((host, port), Handler)
    print(f"guided-attention web UI on http://{host}:{port}")
    if once:
        server.handle_request()
    else:
        server.serve_forever()
    return server
