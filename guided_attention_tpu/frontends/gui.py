"""Interactive web GUI backend.

Same protocol as the reference's Flask app (reference gui.py:14-45):
  GET  /                   -> the annotation UI page
  POST /execute_function   -> {"variable1": meta_prompt} runs one generation
                              with a random seed, returns {"result": path}
  GET  /static/output.png  -> the last generated image
  every response carries Cache-Control: no-store

Implemented on the stdlib ThreadingHTTPServer (Flask is not available in
this environment). Unlike the reference — whose Flask debug server mutates
unguarded global state per request (SURVEY.md §5 'race detection') — each
request builds its own immutable spec, and generation goes through the SAME
micro-batching engine as the production server (frontends/server.py): two
browser users submitting concurrently coalesce into ONE sharded batch
program instead of serializing whole generations behind a lock. Artifact
writing (the reference's per-seed output block) stays behind a lock — the
matplotlib figure manager and the diag-decode jit cache are not
thread-safe.
"""
from __future__ import annotations

import json
import random
import shutil
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

WEB_DIR = Path(__file__).parent / "web"


def _config_knobs(config, base_hp):
    """RunConfig -> engine-submittable generation knobs (mirrors
    cli.execute's run_kwargs; capture_diagnostics on for artifact parity)."""
    return dict(
        num_inference_steps=config.n_inference_steps,
        guidance_scale=config.guidance_scale,
        max_iter_to_alter=config.max_iter_to_alter,
        attention_res=config.attention_res,
        run_standard_sd=config.run_standard_sd,
        hp=base_hp,
        scale_factor=config.scale_factor,
        scale_range=config.scale_range,
        smooth_attentions=config.smooth_attentions,
        sigma=config.sigma,
        kernel_size=config.kernel_size,
        sd_2_1=config.sd_2_1,
        only_update_on_threshold_steps=config.only_update_on_threshold_steps,
        sub_prompt_avg_within=config.sub_prompt_avg_within,
        skip_inert_guidance_passes=config.skip_inert_guidance_passes,
        diagnostic_level=config.diagnostic_level,
        capture_eval_maps=config.save_all_maps,
        capture_eval_latents=config.diagnostic_level > 0,
        eta=config.eta,
        capture_diagnostics=True,
        # level-0 artifact writing only reads the heavy per-step stacks at
        # steps [0,1,2] — trim them before the pull (frontends/server.py
        # does the same; save_individual_ca_maps needs full latent_in)
        trim_heavy_diags=config.diagnostic_level == 0
        and not config.save_individual_ca_maps,
    )


def run_server(
    config,
    pipe,
    host: str = "127.0.0.1",
    port: int = 5000,
    once: bool = False,
    engine=None,
    max_wait_ms: float = 150.0,
):
    """Serve the interactive UI. ``engine`` injects a shared BatchingEngine
    (tests / co-hosting with the production server); otherwise one is
    created with the default buckets."""
    from guided_attention_tpu.annotation import parse_prompt
    from guided_attention_tpu.config import HyperParams
    from guided_attention_tpu.frontends.server import BatchingEngine, OverloadedError
    from guided_attention_tpu.runtime.artifacts import write_run_artifacts

    if engine is None:
        engine = BatchingEngine(pipe, max_wait_ms=max_wait_ms)
    static_dir = config.output_path / "static"
    static_dir.mkdir(parents=True, exist_ok=True)
    artifact_lock = threading.Lock()

    # precedence parity with the CLI sweep (reference run.py:75-79 +
    # shared_state.py:21): the base hp state's thresholds override RunConfig
    # defaults unless --thresholds was explicit
    base_hp = HyperParams()
    if getattr(config, "_thresholds_explicit", False):
        base_hp = base_hp.replace(thresholds=dict(config.thresholds))

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
                seed = int(random.randrange(4294967294))  # reference gui.py:29
                ticket = engine.submit(
                    meta_prompt, seed=seed, **_config_knobs(config, base_hp)
                )
                out = ticket.result(timeout=600)
                with artifact_lock:
                    _, image_path, _ = write_run_artifacts(
                        pipe,
                        out,
                        output_path=config.output_path,
                        seed=seed,
                        hp=base_hp,
                        meta_prompt=meta_prompt,
                        interactive=True,
                        annotate=config.annotate,
                        save_cross_attention_maps=config.save_cross_attention_maps,
                        diagnostic_level=config.diagnostic_level,
                        save_all_maps=config.save_all_maps,
                        save_individual_ca_maps_flag=config.save_individual_ca_maps,
                    )
                    shutil.copyfile(str(image_path), static_dir / "output.png")
            except OverloadedError as e:
                self._send(503, json.dumps({"error": str(e)}).encode(),
                           "application/json")
                return
            except Exception as e:  # noqa: BLE001 — server-side failure,
                # never a dropped connection
                self._send(500,
                           json.dumps({"error": f"{type(e).__name__}: {e}"}).encode(),
                           "application/json")
                return
            body = json.dumps({"result": str(image_path)}).encode()
            self._send(200, body, "application/json")

    server = ThreadingHTTPServer((host, port), Handler)
    print(f"guided-attention web UI on http://{host}:{port}")
    if once:
        server.handle_request()
    else:
        server.serve_forever()
    return server
