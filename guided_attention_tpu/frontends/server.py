"""Production serving frontend: a micro-batching HTTP inference server.

No reference counterpart: the reference's interactive backend (reference
gui.py:14-45) handles ONE request at a time and mutates global shared_state
per request. TPU-native serving inverts that: concurrent requests are
coalesced into one sharded batch program (runner.dispatch_batch over the
device mesh, parallel/batch.py) so the chip always sees the amortized
batch-8 path (docs/PERF.md: 1.70 s/image single -> 1.41 s/image batched).

Design:
- **Submit-time prepare.** Each request is parsed/validated on arrival
  (prompt grammar, spec build, CLIP embedding via the runner's _prepare
  cache); malformed requests fail fast with a per-request error instead of
  poisoning a batch.
- **Compatibility grouping.** Requests are batchable when every generation
  knob except the prompt matches AND their specs share static structure
  (same sub-prompt group count / custom-loss bindings) — the multi-prompt
  batch constraint (runner._stack_specs). The group key is derived from
  PrepareOptions' own field list, so a new knob cannot silently be ignored.
- **Batch-size buckets.** Every distinct vmap batch size compiles its own
  XLA program, so group sizes are rounded UP to a configured bucket
  (default 1/2/4/8) and padded by repeating the last request; padded
  outputs are dropped. A steady-state server therefore runs from a handful
  of warm executables instead of recompiling per load level.
- **Depth-2 pipelining.** The batcher dispatches group i+1 before pulling
  group i's results (PendingBatch holds device futures), overlapping the
  host tail with device compute — the same pattern as the CLI sweep.

HTTP protocol (stdlib ThreadingHTTPServer; handler threads block on the
batcher, the batcher owns all device dispatch):
  POST /generate {"meta_prompt": "...", "seed"?: int, <generation knobs>,
                  "hp"?: {<curated HyperParams>},
                  "save_artifacts"?: bool, "annotate"?: bool}
       -> {"seed", "prompt", "width", "height", "image_png_b64",
           "artifacts_path"?}
       400 invalid request | 503 queue full (load shed) | 504 timeout
  GET  /healthz  -> {"ok", "device", "model"}
  GET  /stats    -> batching counters (requests, batches, sizes, padding,
                    shed) + e2e latency percentiles (p50/p95/max)

Run:  python -m guided_attention_tpu.frontends.server --model sd15 --port 8100
"""
from __future__ import annotations

import base64
import dataclasses
import io
import itertools
import json
import random
import threading
import time
from collections import deque
from typing import Any, Dict, List, Optional, Tuple

from guided_attention_tpu.config import HyperParams
from guided_attention_tpu.runner import (
    GuidedAttentionPipeline,
    PipelineOutput,
    PrepareOptions,
)

# Request knobs the server accepts, by construction: every PrepareOptions
# field except the prompt-carriers and host-object fields (those are
# API-level, not JSON-serializable). "hp" IS accepted, as a nested object
# restricted to _HP_HTTP_FIELDS (coerced by _coerce_hp below).
_KNOB_FIELDS = tuple(
    f.name
    for f in dataclasses.fields(PrepareOptions)
    if f.name not in ("meta_prompt", "prompt", "annotations")
)

# Curated HyperParams surface over HTTP (VERDICT r3 item 4; the reference's
# override-grid knobs, utils/shared_state.py:21-36). Deliberately excluded:
# meta_prompt (the top-level field is the prompt channel), thresholds (the
# top-level "thresholds" knob already overrides hp.thresholds,
# runner._prepare_uncached), and optimize_deep_latent (experimental
# deep-feature mode; API/CLI only). (name, type, (lo, hi)) — bools reject
# int 0/1 so a client typo like "strict": "true" fails loudly.
_HP_HTTP_FIELDS: Dict[str, Tuple[type, Tuple[float, float]]] = {
    "strict": (bool, (0, 1)),
    "use_optimizer": (bool, (0, 1)),
    "recurse_steps": (int, (1, 100)),
    "recurse_until": (int, (-1, 10_000)),
    "paint_with_words_stop": (int, (0, 10_000)),
    "inside_loss_scale": (float, (0.0, 1e6)),
    "outside_loss_scale": (float, (0.0, 1e6)),
    "shrink_factor": (float, (0.0, 0.99)),
    "bb_center_weight": (float, (0.0, 1e6)),
    "paint_with_words_weight": (float, (0.0, 1e6)),
    "keyword_max_loss_scale": (float, (0.0, 1e6)),
}


def _coerce_hp(obj: Any) -> HyperParams:
    """JSON object -> validated HyperParams (unknown/ill-typed/out-of-range
    fields are per-request errors, HTTP 400)."""
    if not isinstance(obj, dict):
        raise RequestError(f"hp must be a JSON object, got {type(obj).__name__}")
    unknown = set(obj) - set(_HP_HTTP_FIELDS)
    if unknown:
        raise RequestError(
            f"unknown hp field(s): {sorted(unknown)}; allowed: {sorted(_HP_HTTP_FIELDS)}"
        )
    out: Dict[str, Any] = {}
    for name, value in obj.items():
        typ, (lo, hi) = _HP_HTTP_FIELDS[name]
        if typ is bool:
            if not isinstance(value, bool):
                raise RequestError(f"hp.{name} must be a JSON boolean, got {value!r}")
            out[name] = value
            continue
        if isinstance(value, bool) or not isinstance(value, (int, float)):
            raise RequestError(f"hp.{name} must be a number, got {value!r}")
        if typ is int and not float(value).is_integer():
            raise RequestError(f"hp.{name} must be an integer, got {value!r}")
        value = typ(value)
        if not (lo <= value <= hi):
            raise RequestError(f"hp.{name} must be in [{lo}, {hi}], got {value}")
        out[name] = value
    return HyperParams(**out)


class RequestError(ValueError):
    """A per-request validation error (HTTP 400)."""


class OverloadedError(RuntimeError):
    """Queue depth limit hit — load is shed instead of queued (HTTP 503).

    An unbounded queue converts overload into minutes of per-request
    latency; bounding it keeps tail latency ~= max_queue x batch time and
    lets upstream load balancers react."""


@dataclasses.dataclass
class ServeTicket:
    """Future for one submitted request; fulfilled by the batcher thread."""

    meta_prompt: str
    seed: int
    knobs: Dict[str, Any]
    group_key: Any
    _event: threading.Event = dataclasses.field(default_factory=threading.Event)
    _output: Optional[PipelineOutput] = None
    _error: Optional[BaseException] = None
    submitted_at: float = dataclasses.field(default_factory=time.monotonic)

    def result(self, timeout: Optional[float] = None) -> PipelineOutput:
        if not self._event.wait(timeout):
            raise TimeoutError("generation did not complete in time")
        if self._error is not None:
            raise self._error
        assert self._output is not None
        return self._output


class BatchingEngine:
    """Coalesces concurrent generation requests into sharded batch programs.

    Thread model: any number of producer threads call ``submit``; ONE
    batcher thread owns every device dispatch (the runner's program caches
    are plain dicts — single-writer keeps them race-free). ``_pipe_lock``
    additionally serializes submit-time prepares against in-flight
    dispatches; the blocking device->host pull never holds it.
    """

    def __init__(
        self,
        pipe: GuidedAttentionPipeline,
        max_wait_ms: float = 100.0,
        buckets: Tuple[int, ...] = (1, 2, 4, 8),
        mesh=None,
        max_queue: int = 64,
        _start_thread: bool = True,
    ):
        self.pipe = pipe
        self.max_wait_s = max_wait_ms / 1000.0
        self.buckets = tuple(sorted(set(int(b) for b in buckets)))
        if not self.buckets or self.buckets[0] < 1:
            raise ValueError(f"invalid batch buckets: {buckets}")
        self.mesh = mesh
        if mesh is not None:
            # the batch axis shards over "data": every dispatched (bucketed)
            # batch must divide evenly across it
            data = dict(mesh.shape).get("data", 1)
            bad = [b for b in self.buckets if b % data]
            if bad:
                raise ValueError(
                    f"buckets {bad} not divisible by the mesh data axis ({data})"
                )
        self.max_batch = self.buckets[-1]
        self.max_queue = int(max_queue)

        self._queue: deque[ServeTicket] = deque()
        self._cv = threading.Condition()
        self._pipe_lock = threading.Lock()
        self._in_prepare = 0  # admitted, still in submit-time prepare
        self._stop = False
        self._latencies: deque[float] = deque(maxlen=256)  # completed e2e, s
        self.stats: Dict[str, Any] = {
            "requests": 0,
            "errors": 0,
            "shed": 0,  # rejected by the queue depth limit (503s)
            "batches": 0,
            "samples": 0,
            "padded_samples": 0,
            "batch_sizes": {},  # dispatched (bucketed) size -> count
            "last_batch_s": None,
        }
        self._thread = threading.Thread(target=self._loop, name="ga-batcher", daemon=True)
        if _start_thread:  # tests fill the queue deterministically first
            self._thread.start()

    # ------------------------------------------------------------- submit
    def submit(self, meta_prompt: str, seed: Optional[int] = None, **knobs) -> ServeTicket:
        """Validate, prepare (spec + CLIP embed, cached), and enqueue."""
        t_submit = time.monotonic()  # BEFORE the prepare/_pipe_lock wait:
        # that wait is part of client-visible latency, /stats must see it
        # pull-time knob, not a PrepareOptions field (runner.dispatch_batch
        # kwarg); it still must split batches — a batch is trimmed whole
        trim = bool(knobs.pop("trim_heavy_diags", False))
        unknown = set(knobs) - set(_KNOB_FIELDS)
        if unknown:
            raise RequestError(f"unknown field(s): {sorted(unknown)}")
        if knobs.get("hp") is not None and not isinstance(knobs["hp"], HyperParams):
            # HTTP clients send a JSON object (coerced by _coerce_hp in the
            # handler); direct API callers must pass a HyperParams
            raise RequestError(
                f"hp must be a HyperParams, got {type(knobs['hp']).__name__}"
            )
        if not isinstance(meta_prompt, str) or not meta_prompt.strip():
            raise RequestError("meta_prompt must be a non-empty string")
        if seed is None:
            seed = random.randrange(4294967294)  # reference gui.py:29
        knobs.setdefault("capture_diagnostics", False)  # serving: image path

        # Admission control BEFORE prepare: prepare contends on _pipe_lock
        # with in-flight dispatches (a cold-compile dispatch holds it for
        # tens of seconds), so requests waiting on that lock are load too —
        # an overloaded 503 must return immediately, not after the wait.
        with self._cv:
            if self._stop:
                raise RuntimeError("engine is shut down")
            if len(self._queue) + self._in_prepare >= self.max_queue:
                self.stats["shed"] += 1
                raise OverloadedError(
                    f"queue full ({self.max_queue} requests waiting) — retry later"
                )
            self._in_prepare += 1

        try:
            opts = PrepareOptions(meta_prompt=meta_prompt, **knobs)
            with self._pipe_lock:
                try:
                    prepared = self.pipe._prepare(opts)
                except RequestError:
                    raise
                except (ValueError, TypeError, KeyError) as e:
                    # parse/spec/tokenize/knob errors: the REQUEST is bad -> 400.
                    # Anything else (device/tunnel RuntimeError, OOM during the
                    # CLIP forward) propagates as a server-side fault — clients
                    # and load balancers must see 5xx, not a non-retryable 400.
                    raise RequestError(f"invalid request: {e}") from e
            spec = prepared[3]
            # batchable iff every non-prompt knob matches AND the spec's
            # static structure matches (runner._stack_specs constraint).
            # cache_key is derived from PrepareOptions' field list -> new
            # knobs can't leak.
            key_opts = dataclasses.replace(opts, meta_prompt="")
            group_key = (
                key_opts.cache_key(self.pipe._registry_version),
                spec.n_groups,
                spec.custom_group,
                spec.custom_losses,
                trim,
            )
            if trim:
                knobs["trim_heavy_diags"] = True  # -> dispatch_batch kwarg
            ticket = ServeTicket(
                meta_prompt=meta_prompt, seed=int(seed), knobs=knobs,
                group_key=group_key, submitted_at=t_submit,
            )
        except BaseException:
            with self._cv:
                self._in_prepare -= 1
            raise

        with self._cv:
            self._in_prepare -= 1  # the admitted slot becomes the queue slot
            if self._stop:
                raise RuntimeError("engine is shut down")
            self._queue.append(ticket)
            self.stats["requests"] += 1
            self._cv.notify_all()
        return ticket

    def snapshot(self) -> Dict[str, Any]:
        """Stats + derived latency percentiles (last 256 completed requests)."""
        with self._cv:
            snap = dict(self.stats, queued=len(self._queue), preparing=self._in_prepare)
            snap["batch_sizes"] = dict(self.stats["batch_sizes"])  # not shared
            lats = sorted(self._latencies)
        if lats:
            snap["latency_s"] = {
                "p50": round(lats[len(lats) // 2], 3),
                "p95": round(lats[min(len(lats) - 1, int(len(lats) * 0.95))], 3),
                "max": round(lats[-1], 3),
            }
        return snap

    def close(self, timeout: float = 600.0) -> None:
        """Drain the queue, deliver everything in flight, stop the thread.

        The default timeout accommodates a shutdown that overlaps a cold
        batch compile (~210 s on the remote TPU, docs/PERF.md) — a legit
        in-flight dispatch, not a hang."""
        with self._cv:
            self._stop = True
            self._cv.notify_all()
        if self._thread.ident is None:  # never started (_start_thread=False):
            return  # nothing to drain, and join() would raise
        self._thread.join(timeout)
        if self._thread.is_alive():  # loud: a silent zombie batcher would
            # race the next engine over the shared pipeline's program caches
            raise RuntimeError(
                f"batcher did not drain within {timeout}s (mid-compile?); "
                "in-flight requests are still running"
            )

    # ------------------------------------------------------------ batcher
    def _pop_first(self, block: bool) -> Optional[ServeTicket]:
        with self._cv:
            while not self._queue:
                if self._stop or not block:
                    return None
                self._cv.wait(timeout=0.1)
            return self._queue.popleft()

    # Cap on how far group formation may extend past max_wait_s while a
    # batch occupies the device (see _inflight_deadline): bounds the
    # fragmentation-vs-latency trade after an outlier batch duration (a
    # cold compile reads as a 200+ s "batch").
    _MAX_BUSY_EXTEND_S = 15.0

    def _inflight_deadline(self, pending) -> Optional[float]:
        """While a batch is ON THE DEVICE, forming the next group early buys
        nothing — the chip cannot start it, and every request that arrives
        meanwhile is forfeited to padding (measured: closed-loop clients
        writing artifacts desync and fragment groups, docs/SERVING.md
        round 5). Estimate the in-flight batch's completion from the last
        observed batch duration and let _gather keep collecting until ~80%
        of it has elapsed (the final ~20% still overlaps the ~100 ms
        dispatch/upload host tail, preserving the depth-2 pipelining win)."""
        if pending is None:
            return None
        last = self.stats.get("last_batch_s")
        if not last:
            return None
        _group, _pb, t0 = pending
        return t0 + min(0.8 * last, self._MAX_BUSY_EXTEND_S)

    def _gather(self, first: ServeTicket, extend_until: Optional[float] = None) -> List[ServeTicket]:
        """Collect same-key requests for up to max_wait_s — longer while the
        device is known-busy (extend_until) — early-exiting when a full
        bucket is reached. Other-key requests stay queued in order."""
        group = [first]
        deadline = time.monotonic() + self.max_wait_s
        if extend_until is not None and extend_until > deadline:
            deadline = extend_until
        with self._cv:
            while len(group) < self.max_batch:
                for t in list(self._queue):
                    if t.group_key == first.group_key:
                        self._queue.remove(t)
                        group.append(t)
                        if len(group) >= self.max_batch:
                            break
                if len(group) >= self.max_batch:
                    break
                remaining = deadline - time.monotonic()
                if remaining <= 0 or self._stop:
                    break
                self._cv.wait(timeout=remaining)
        return group

    def _dispatch(self, group: List[ServeTicket]):
        seeds = [t.seed for t in group]
        prompts = [t.meta_prompt for t in group]
        bucket = next(b for b in self.buckets if b >= len(group))
        pad = bucket - len(group)
        seeds = seeds + [seeds[-1]] * pad
        prompts = prompts + [prompts[-1]] * pad
        kwargs = dict(group[0].knobs)
        if self.mesh is not None:
            kwargs["mesh"] = self.mesh
        if all(p == prompts[0] for p in prompts):
            pb = self.pipe.dispatch_batch(seeds, meta_prompt=prompts[0], **kwargs)
        else:
            pb = self.pipe.dispatch_batch(seeds, meta_prompts=prompts, **kwargs)
        with self._cv:  # snapshot()/handlers read stats concurrently
            self.stats["batches"] += 1
            self.stats["samples"] += bucket
            self.stats["padded_samples"] += pad
            sizes = self.stats["batch_sizes"]
            sizes[bucket] = sizes.get(bucket, 0) + 1
        return pb

    def _loop(self) -> None:
        pending: Optional[Tuple[List[ServeTicket], Any, float]] = None
        while True:
            first = self._pop_first(block=pending is None)
            if first is None:
                if pending is not None:
                    self._deliver_outputs(*pending)
                    pending = None
                    continue
                if self._stop:
                    with self._cv:
                        if not self._queue:
                            break
                    continue
                continue
            group = self._gather(first, extend_until=self._inflight_deadline(pending))
            t0 = time.monotonic()
            try:
                with self._pipe_lock:
                    pb = self._dispatch(group)
            except BaseException as e:  # noqa: BLE001
                with self._cv:
                    self.stats["errors"] += len(group)
                for t in group:
                    t._error = e
                    t._event.set()
                continue
            if pending is not None:
                self._deliver_outputs(*pending)
            pending = (group, pb, t0)
        if pending is not None:
            self._deliver_outputs(*pending)

    def _deliver_outputs(self, group: List[ServeTicket], pending, t0: float) -> None:
        try:
            outputs = pending.result()  # the one blocking device->host pull
        except BaseException as e:  # noqa: BLE001 — fail the group, not the server
            with self._cv:
                self.stats["errors"] += len(group)
            for t in group:
                t._error = e
                t._event.set()
            return
        now = time.monotonic()
        with self._cv:  # snapshot() iterates _latencies concurrently
            self.stats["last_batch_s"] = round(now - t0, 3)
            for t in group:
                self._latencies.append(now - t.submitted_at)
        for t, out in zip(group, outputs):  # padded outputs are dropped
            t._output = out
            t._event.set()


# ----------------------------------------------------------------- HTTP
def _coerce_knobs(payload: Dict[str, Any]) -> Dict[str, Any]:
    """JSON -> PrepareOptions field types (thresholds keys, tuples, hp)."""
    knobs = dict(payload)
    if isinstance(knobs.get("thresholds"), dict):
        knobs["thresholds"] = {int(k): float(v) for k, v in knobs["thresholds"].items()}
    if isinstance(knobs.get("scale_range"), list):
        knobs["scale_range"] = tuple(float(v) for v in knobs["scale_range"])
    if knobs.get("hp") is not None:
        knobs["hp"] = _coerce_hp(knobs["hp"])
    return knobs


def _png_bytes(images) -> bytes:
    from guided_attention_tpu.runtime.artifacts import to_pil

    buf = io.BytesIO()
    # zlib level 1: ~3-4x faster than PIL's default 6 for ~25% larger
    # payload — handler-thread CPU is the scarce resource under load
    # (docs/SERVING.md round-5 decomposition), not localhost bandwidth
    to_pil(images[0]).save(buf, format="PNG", compress_level=1)
    return buf.getvalue()


def make_server(engine: BatchingEngine, host: str = "127.0.0.1", port: int = 8100,
                request_timeout_s: float = 600.0, artifact_dir=None):
    """Build (not start) the ThreadingHTTPServer around a BatchingEngine.

    ``artifact_dir`` enables per-request full artifact trees (the
    reference's per-seed output block): a request passing
    ``"save_artifacts": true`` gets the final image + run log + attention
    maps + x0 preds written under that directory (written by the handler
    thread after delivery — the batcher never blocks on PNG IO) and an
    ``artifacts_path`` field in the response."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from pathlib import Path

    import jax

    # per-request artifact namespace: concurrent requests may share
    # (meta_prompt, seed) — client-chosen — and would otherwise write the
    # identical tree from separate handler threads (next() on itertools.count
    # is atomic under the GIL). The counter resumes past any trees already on
    # disk so a restarted server never clobbers the previous run's artifacts.
    start_id = 0
    if artifact_dir is not None:
        existing = [
            int(p.name[3:]) for p in Path(artifact_dir).glob("req[0-9]*")
            if p.name[3:].isdigit()
        ]
        start_id = max(existing, default=-1) + 1
    req_ids = itertools.count(start_id)
    # write_run_artifacts at diagnostic_level > 0 drives non-thread-safe
    # state (pyplot's global figure manager, the pipeline's lazily-built
    # diag-decode jit cache) — those requests serialize. Level-0 writes are
    # concurrency-safe (per-instance native PNG writer pool, PIL, and an
    # already-compiled decode jit — compiled jax functions are thread-safe
    # to CALL) and run in parallel: serializing them idled the device
    # ~0.9 s per request under saturation (scripts/perf_server.py
    # --artifacts measurements, docs/SERVING.md "Artifact IO under load").
    artifact_lock = threading.Lock()

    # The parallel level-0 path must never hit a COLD x0-decode jit compile
    # from several handler threads at once (jit compilation of the same
    # signature is not a safe concurrent entry point, and a ~15 s compile
    # would stall every concurrent writer): compile each decode batch shape
    # lazily-but-LOCKED on its first artifact request. --warmup pre-warms
    # the common batch-3 shape; requests with num_inference_steps < 3
    # produce batch-1/2 decodes and are covered here too.
    warmed_decode_shapes: set = set()
    decode_warm_lock = threading.Lock()

    def _ensure_x0_decode_compiled(n_steps: int) -> None:
        import jax.numpy as jnp
        import numpy as np

        b = min(3, max(1, n_steps))  # write_x0_preds decodes steps [0,1,2]
        if b in warmed_decode_shapes:
            return
        with decode_warm_lock:
            if b in warmed_decode_shapes:
                return
            cfg = engine.pipe.sd.config
            z = jnp.zeros(
                (b, cfg.latent_size, cfg.latent_size, cfg.unet.in_channels),
                jnp.float16,  # StepDiag.x0_pred stacks f16 — same jit key
            )
            np.asarray(engine.pipe.sd.decode_latents(z))
            warmed_decode_shapes.add(b)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            pass

        def _send_json(self, code: int, obj: Dict[str, Any]) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.send_header("Cache-Control", "no-store")
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send_json(200, {
                    "ok": True,
                    "device": str(jax.devices()[0]),
                    "model": engine.pipe.sd.config.name,
                })
            elif self.path == "/stats":
                self._send_json(200, engine.snapshot())
            else:
                self._send_json(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/generate":
                self._send_json(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                payload = json.loads(self.rfile.read(length) or b"{}")
                if not isinstance(payload, dict):
                    raise RequestError("request body must be a JSON object")
                meta_prompt = payload.pop("meta_prompt", "")
                seed = payload.pop("seed", None)
                save_artifacts = bool(payload.pop("save_artifacts", False))
                annotate = bool(payload.pop("annotate", False))
                if save_artifacts:
                    if artifact_dir is None:
                        raise RequestError(
                            "save_artifacts requires the server to run with --artifact_dir"
                        )
                    # artifact parity (maps, x0 preds, log) needs the
                    # diagnostics captured in the scan outputs — force it,
                    # overriding an explicit client false (the writer indexes
                    # real per-token diags; the minimal placeholder would
                    # crash it after a full generation)
                    payload["capture_diagnostics"] = True
                    if int(payload.get("diagnostic_level", 0)) == 0:
                        # level 0 only reads x0_pred/latent_in at steps
                        # [0,1,2] — trim the [S] stacks before the pull
                        # (~60% of the per-image diagnostic transfer on
                        # remote-attached TPUs, docs/SERVING.md)
                        payload["trim_heavy_diags"] = True
                    if int(payload.get("diagnostic_level", 0)) > 0:
                        # per-SUBiteration pred_pre_optim snapshots (reference
                        # pipeline:517-535) need the per-slot latent capture —
                        # mirror the CLI's wiring (cli.run_kwargs) so the
                        # served artifact tree matches the CLI tree
                        payload["capture_eval_latents"] = True
                ticket = engine.submit(meta_prompt, seed=seed, **_coerce_knobs(payload))
            except (OverloadedError, RuntimeError) as e:
                # RuntimeError: engine shut down mid-request, or a device/
                # tunnel fault during the submit-time prepare — retryable
                self._send_json(503, {"error": str(e)})
                return
            except (RequestError, TypeError, ValueError, json.JSONDecodeError) as e:
                self._send_json(400, {"error": str(e)})
                return
            except Exception as e:  # noqa: BLE001 — any other server-side
                # fault: a 5xx, never a connection drop or a client-error code
                self._send_json(500, {"error": f"{type(e).__name__}: {e}"})
                return
            try:
                out = ticket.result(timeout=request_timeout_s)
            except TimeoutError as e:
                self._send_json(504, {"error": str(e)})
                return
            except Exception as e:  # noqa: BLE001 — batch execution failure
                self._send_json(500, {"error": f"{type(e).__name__}: {e}"})
                return
            resp = {
                "seed": ticket.seed,
                "prompt": out.prompt,
                "width": int(out.images.shape[2]),
                "height": int(out.images.shape[1]),
                "image_png_b64": base64.b64encode(_png_bytes(out.images)).decode(),
            }
            if save_artifacts:
                from guided_attention_tpu.runtime.artifacts import write_run_artifacts

                # reconstruct the hp the runner derived for this request
                # (request hp or defaults, + thresholds override,
                # runner._prepare_uncached)
                hp = ticket.knobs.get("hp") or HyperParams()
                if ticket.knobs.get("thresholds") is not None:
                    hp = hp.replace(thresholds=ticket.knobs["thresholds"])
                try:
                    import contextlib

                    diag = int(ticket.knobs.get("diagnostic_level", 0))
                    if diag == 0:
                        # parallel path: guarantee the x0-decode jit for this
                        # request's batch shape is compiled before any
                        # unlocked write uses it (no-op when already warm)
                        _ensure_x0_decode_compiled(
                            int(ticket.knobs.get("num_inference_steps", 50))
                        )
                    lock_ctx = artifact_lock if diag > 0 else contextlib.nullcontext()
                    with lock_ctx:
                        _, image_path, _ = write_run_artifacts(
                            engine.pipe,
                            out,
                            output_path=Path(artifact_dir) / f"req{next(req_ids):06d}",
                            seed=ticket.seed,
                            hp=hp,
                            meta_prompt=ticket.meta_prompt,
                            annotate=annotate,
                            diagnostic_level=int(ticket.knobs.get("diagnostic_level", 0)),
                        )
                    resp["artifacts_path"] = str(image_path)
                except Exception as e:  # noqa: BLE001 — the generation itself
                    # succeeded; deliver the image rather than dropping the
                    # connection over an artifact-IO failure
                    resp["artifacts_error"] = f"{type(e).__name__}: {e}"
            self._send_json(200, resp)

    return ThreadingHTTPServer((host, port), Handler)


def main(argv: Optional[List[str]] = None) -> None:
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="sd15", help="sd14/sd15/sd21/micro")
    p.add_argument("--model_path", default=None, help="local checkpoint dir (random init if omitted)")
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8100)
    p.add_argument("--max_wait_ms", type=float, default=100.0)
    p.add_argument("--max_queue", type=int, default=64,
                   help="queue depth limit; excess requests get HTTP 503 (load shedding)")
    p.add_argument("--artifact_dir", default=None,
                   help="enable per-request artifact trees (request field save_artifacts)")
    p.add_argument("--buckets", default="1,2,4,8", help="allowed batch sizes, comma-separated")
    p.add_argument("--mesh_shape", type=json.loads, default=None,
                   help='device mesh, e.g. \'{"data": 2, "tensor": 2}\'; '
                        "default: data parallelism sized per batch. Every "
                        "bucket must divide by the data axis.")
    p.add_argument("--warmup", action="store_true",
                   help="pre-compile the default-knob program at every bucket size before serving")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from guided_attention_tpu.models.bundle import StableDiffusion

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    sd = StableDiffusion.create(args.model, dtype=dtype, checkpoint_dir=args.model_path)
    pipe = GuidedAttentionPipeline(sd)
    buckets = tuple(int(b) for b in args.buckets.split(","))
    mesh = None
    if args.mesh_shape:
        from guided_attention_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.mesh_shape)
    engine = BatchingEngine(pipe, max_wait_ms=args.max_wait_ms, buckets=buckets,
                            mesh=mesh, max_queue=args.max_queue)

    if args.warmup:
        # compile BOTH program variants per bucket: shared-prompt and
        # multi-prompt batches are distinct executables (per_prompt is in
        # the runner's batch-program cache key) — a serve-time cold compile
        # would stall every concurrent submit behind the pipeline lock
        wp = "a [robot:.6,.3,.4,.55] and a [vase:0,.3,.4,.55]"
        wp2 = "a [robot:0,.1,.45,.5] and a [vase:.55,.4,.4,.5]"
        # save_artifacts requests run a THIRD program family (diagnostics
        # captured + heavy stacks trimmed) — warm it per bucket when the
        # server can serve artifacts, or the first artifact client per
        # bucket pays a cold batch compile
        variants = [("", {})]
        if args.artifact_dir:
            variants.append(
                ("+diag", dict(capture_diagnostics=True, trim_heavy_diags=True))
            )
        for b in buckets:
            for label, prompts in (
                ("same-prompt", [wp] * b),
                ("multi-prompt", [(wp if i % 2 else wp2) for i in range(b)]),
            ):
                if label == "multi-prompt" and b == 1:
                    continue  # a 1-batch is always same-prompt
                for vlabel, vknobs in variants:
                    t0 = time.monotonic()
                    tickets = [
                        engine.submit(p, seed=i, **vknobs)
                        for i, p in enumerate(prompts)
                    ]
                    for t in tickets:
                        t.result()
                    print(f"warmup bucket {b} ({label}{vlabel}): {time.monotonic() - t0:.1f} s")
        if args.artifact_dir:
            # the first save_artifacts request otherwise pays the x0-decode
            # jit compile (~15 s measured) INSIDE the artifact lock, stalling
            # every concurrent artifact writer behind it
            import numpy as np

            t0 = time.monotonic()
            s_lat = sd.config.latent_size
            z = jnp.zeros((3, s_lat, s_lat, sd.config.unet.in_channels), jnp.float16)
            np.asarray(sd.decode_latents(z))
            print(f"warmup x0 decode: {time.monotonic() - t0:.1f} s")

    server = make_server(engine, host=args.host, port=args.port,
                         artifact_dir=args.artifact_dir)
    print(f"guided-attention inference server on http://{args.host}:{args.port} "
          f"(buckets {buckets}, wait {args.max_wait_ms:.0f} ms)")
    try:
        server.serve_forever()
    finally:
        engine.close()


if __name__ == "__main__":
    main()
