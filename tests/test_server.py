"""Serving frontend: micro-batching engine + HTTP protocol on the micro model.

The engine must (1) coalesce compatible concurrent requests into ONE sharded
batch program, (2) keep incompatible knobs/spec-structures in separate
batches, (3) pad to bucket sizes and drop padded outputs, and (4) match the
direct runner.generate_batch results exactly (same program, same seeds).
"""
import base64
import json
import threading

import numpy as np
import pytest
import jax.numpy as jnp

from guided_attention_tpu.frontends.server import (
    BatchingEngine,
    OverloadedError,
    RequestError,
    make_server,
)
from guided_attention_tpu.models.bundle import StableDiffusion
from guided_attention_tpu.runner import GuidedAttentionPipeline

PROMPT = "a [robot:.6,.3,.4,.55] and a [vase:0,.3,.4,.55]"
PROMPT2 = "a [cat:.6,.3,.4,.55] and a [bowl:0,.3,.4,.55]"
KNOBS = dict(num_inference_steps=2, max_iter_to_alter=1, thresholds={0: 0.1})


@pytest.fixture(scope="module")
def pipe():
    sd = StableDiffusion.create("micro", dtype=jnp.float32)
    return GuidedAttentionPipeline(sd)


@pytest.fixture()
def engine(pipe):
    eng = BatchingEngine(pipe, max_wait_ms=3000.0, buckets=(1, 2, 4))
    yield eng
    eng.close()


def test_coalesces_compatible_requests_and_pads(pipe, engine):
    # 3 compatible requests (2 distinct prompts) -> ONE bucket-4 batch, 1 pad
    tickets = [
        engine.submit(PROMPT, seed=1, **KNOBS),
        engine.submit(PROMPT, seed=2, **KNOBS),
        engine.submit(PROMPT2, seed=3, **KNOBS),
    ]
    outs = [t.result(timeout=600) for t in tickets]
    assert engine.stats["batches"] == 1
    assert engine.stats["batch_sizes"] == {4: 1}
    assert engine.stats["padded_samples"] == 1
    assert engine.stats["requests"] == 3 and engine.stats["errors"] == 0

    for out, t in zip(outs, tickets):
        assert out.images is not None and out.images.shape[0] == 1
        assert np.isfinite(out.images).all()
        assert out.prompt.startswith("a ")
    # multi-prompt: prompt 3's parse differs and so must its image
    assert outs[2].prompt != outs[0].prompt
    assert not np.allclose(outs[2].images, outs[0].images)
    # same knobs+seed through the direct batch API gives identical pixels
    direct = pipe.generate_batch(
        [1, 2, 3, 3],
        meta_prompts=[PROMPT, PROMPT, PROMPT2, PROMPT2],
        capture_diagnostics=False,
        **KNOBS,
    )
    for out, ref in zip(outs, direct):
        np.testing.assert_allclose(out.images, ref.images, atol=1e-6)


def test_incompatible_knobs_split_batches(engine):
    t1 = engine.submit(PROMPT, seed=1, **KNOBS)
    t2 = engine.submit(PROMPT, seed=2, guidance_scale=3.0, **KNOBS)
    # different spec STRUCTURE (1 group vs 2) must also split
    t3 = engine.submit("a [robot:.6,.3,.4,.55] alone", seed=3, **KNOBS)
    for t in (t1, t2, t3):
        t.result(timeout=600)
    assert engine.stats["batches"] == 3
    assert engine.stats["batch_sizes"].get(1) == 3


def test_submit_validation(engine):
    with pytest.raises(RequestError, match="unknown field"):
        engine.submit(PROMPT, seed=1, not_a_knob=True)
    with pytest.raises(RequestError, match="non-empty"):
        engine.submit("   ")
    with pytest.raises(RequestError, match="invalid request"):
        # type-invalid knob -> _prepare raises -> per-request 400, not a
        # poisoned batch (malformed ANNOTATIONS degrade to plain text by
        # reference grammar parity, annotation.py, so they aren't errors)
        engine.submit(PROMPT, seed=1, num_inference_steps="nope")
    assert engine.stats["requests"] == 0  # nothing reached the queue


def test_load_shedding(pipe):
    # batcher not started: the queue fills deterministically
    eng = BatchingEngine(pipe, max_queue=2, _start_thread=False)
    eng.submit(PROMPT, seed=1, **KNOBS)
    eng.submit(PROMPT, seed=2, **KNOBS)
    with pytest.raises(OverloadedError, match="queue full"):
        eng.submit(PROMPT, seed=3, **KNOBS)
    assert eng.stats["shed"] == 1 and eng.stats["requests"] == 2
    # draining: starting the batcher delivers the two queued tickets
    eng._thread.start()
    eng.close(timeout=600)
    snap = eng.snapshot()
    assert snap["queued"] == 0 and snap["batches"] >= 1
    assert "latency_s" in snap and snap["latency_s"]["p95"] >= snap["latency_s"]["p50"] > 0


def test_batch_failure_isolated(pipe, engine):
    # an injected dispatch failure (device fault, OOM, ...) must fail the
    # affected group's tickets and leave the batcher serving — failure
    # detection the reference's one-request GUI backend has no analogue of
    real = pipe.dispatch_batch
    calls = {"n": 0}

    def boom(*a, **k):
        calls["n"] += 1
        raise RuntimeError("injected device failure")

    pipe.dispatch_batch = boom
    try:
        t = engine.submit(PROMPT, seed=1, **KNOBS)
        with pytest.raises(RuntimeError, match="injected"):
            t.result(timeout=60)
    finally:
        pipe.dispatch_batch = real
    assert engine.stats["errors"] == 1
    assert calls["n"] == 1
    # the engine survives: the next request completes normally
    out = engine.submit(PROMPT, seed=2, **KNOBS).result(timeout=600)
    assert out.images is not None and np.isfinite(out.images).all()


def test_serving_over_dp_tp_mesh(pipe):
    # serving composes with sharding: batches dispatch over a 2x2 dp x tp
    # mesh (batch sharded over "data", UNet projections over "tensor")
    from guided_attention_tpu.parallel.mesh import make_mesh

    mesh = make_mesh({"data": 2, "tensor": 2})
    with pytest.raises(ValueError, match="not divisible"):
        BatchingEngine(pipe, buckets=(1, 2), mesh=mesh, _start_thread=False)
    eng = BatchingEngine(pipe, max_wait_ms=3000.0, buckets=(2, 4), mesh=mesh)
    try:
        tickets = [
            eng.submit(PROMPT, seed=1, **KNOBS),
            eng.submit(PROMPT2, seed=2, **KNOBS),
            eng.submit(PROMPT, seed=3, **KNOBS),
        ]
        outs = [t.result(timeout=600) for t in tickets]
    finally:
        eng.close()
    assert eng.stats["batch_sizes"] == {4: 1}
    for out in outs:
        assert out.images is not None and np.isfinite(out.images).all()


def test_inflight_deadline_logic(pipe):
    """Busy-aware group formation (docs/SERVING.md round 5): _gather may
    extend only while a batch is in flight AND a duration estimate exists,
    to ~80% of that estimate, capped at _MAX_BUSY_EXTEND_S past the
    in-flight batch's dispatch time (a cold-compile outlier must not stall
    formation)."""
    import time as _time

    eng = BatchingEngine(pipe, _start_thread=False)
    try:
        t0 = _time.monotonic()
        fake_pending = ([], object(), t0)
        # no in-flight batch -> no extension
        assert eng._inflight_deadline(None) is None
        # in-flight but no duration estimate yet -> no extension
        eng.stats["last_batch_s"] = None
        assert eng._inflight_deadline(fake_pending) is None
        # normal case: 80% of the last batch duration
        eng.stats["last_batch_s"] = 10.0
        dl = eng._inflight_deadline(fake_pending)
        assert abs(dl - (t0 + 8.0)) < 1e-6
        # outlier (cold compile read as a 200 s batch): capped
        eng.stats["last_batch_s"] = 200.0
        dl = eng._inflight_deadline(fake_pending)
        assert abs(dl - (t0 + eng._MAX_BUSY_EXTEND_S)) < 1e-6
        # _gather honors the later of (max_wait, extend_until): with an
        # already-expired extension it returns after max_wait as before
        eng.submit(PROMPT, seed=1, **KNOBS)
        first = eng._pop_first(block=False)  # the loop pops before gathering
        g = eng._gather(first, extend_until=_time.monotonic() - 1.0)
        assert g == [first]
    finally:
        eng.close()


def test_close_unstarted_engine(pipe):
    # _start_thread=False (deterministic queue fill) + close() must shut
    # down cleanly instead of raising from Thread.join on an unstarted thread
    BatchingEngine(pipe, _start_thread=False).close()


def test_submit_classifies_server_faults(pipe, engine, monkeypatch):
    # a device/tunnel fault during the submit-time prepare is a SERVER-side
    # failure: it must propagate (handler -> 5xx), not be wrapped into the
    # non-retryable RequestError (400)
    def tunnel_down(opts):
        raise RuntimeError("tunnel dropped")

    monkeypatch.setattr(engine.pipe, "_prepare", tunnel_down)
    with pytest.raises(RuntimeError, match="tunnel dropped"):
        engine.submit(PROMPT, seed=1, **KNOBS)

    # validation faults stay client errors
    def bad_request(opts):
        raise ValueError("no such word")

    monkeypatch.setattr(engine.pipe, "_prepare", bad_request)
    with pytest.raises(RequestError, match="no such word"):
        engine.submit(PROMPT, seed=1, **KNOBS)

    # either way the admission slot is released (no _in_prepare leak)
    assert engine.snapshot()["preparing"] == 0


def test_http_error_classification_and_capture_forcing(pipe, tmp_path, monkeypatch):
    """HTTP layer behaviors that need no generation: (1) save_artifacts
    forces capture_diagnostics AND (at diagnostic_level>0)
    capture_eval_latents so the served artifact tree matches the CLI tree;
    (2) an unexpected submit fault maps to 500, never a dropped connection."""
    import http.client

    eng = BatchingEngine(pipe, _start_thread=False)
    captured = {}

    class FakeTicket:
        seed = 1
        meta_prompt = PROMPT
        knobs = {}

        def result(self, timeout=None):
            raise TimeoutError("no batcher in this test")

    def fake_submit(meta_prompt, seed=None, **knobs):
        captured.clear()
        captured.update(knobs)
        return FakeTicket()

    monkeypatch.setattr(eng, "submit", fake_submit)
    server = make_server(eng, host="127.0.0.1", port=0, artifact_dir=tmp_path)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("POST", "/generate", body=json.dumps(dict(
            meta_prompt=PROMPT, seed=1, save_artifacts=True,
            capture_diagnostics=False, diagnostic_level=1)),
            headers={"Content-Type": "application/json"})
        assert conn.getresponse().status == 504  # FakeTicket's timeout
        assert captured["capture_diagnostics"] is True
        assert captured["capture_eval_latents"] is True
        # diag > 0 reads per-step latents — the heavy stacks must NOT trim
        assert "trim_heavy_diags" not in captured

        # diagnostic_level 0 (default): heavy stacks trim before the pull
        conn1b = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn1b.request("POST", "/generate", body=json.dumps(dict(
            meta_prompt=PROMPT, seed=1, save_artifacts=True)),
            headers={"Content-Type": "application/json"})
        assert conn1b.getresponse().status == 504
        assert captured["trim_heavy_diags"] is True
        assert captured["capture_diagnostics"] is True

        class Weird(Exception):
            pass

        def exploding_submit(meta_prompt, seed=None, **knobs):
            raise Weird("boom")

        monkeypatch.setattr(eng, "submit", exploding_submit)
        conn2 = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn2.request("POST", "/generate",
                      body=json.dumps(dict(meta_prompt=PROMPT, seed=1)),
                      headers={"Content-Type": "application/json"})
        resp = conn2.getresponse()
        assert resp.status == 500
        assert "Weird" in json.loads(resp.read())["error"]
    finally:
        server.shutdown()
        server.server_close()
        eng.close()


def test_http_roundtrip(engine, tmp_path):
    import http.client

    server = make_server(engine, host="127.0.0.1", port=0, artifact_dir=tmp_path)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("GET", "/healthz")
        health = json.loads(conn.getresponse().read())
        assert health["ok"] is True and health["model"] == "micro"

        body = json.dumps(dict(meta_prompt=PROMPT, seed=11,
                               thresholds={"0": 0.1}, num_inference_steps=2,
                               max_iter_to_alter=1))
        conn2 = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        conn2.request("POST", "/generate", body=body,
                      headers={"Content-Type": "application/json"})
        resp = conn2.getresponse()
        assert resp.status == 200
        out = json.loads(resp.read())
        assert out["seed"] == 11 and out["prompt"].startswith("a ")
        png = base64.b64decode(out["image_png_b64"])
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        assert out["width"] > 0 and out["height"] > 0

        conn3 = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn3.request("POST", "/generate", body=json.dumps({"meta_prompt": ""}),
                      headers={"Content-Type": "application/json"})
        assert conn3.getresponse().status == 400

        conn4 = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn4.request("GET", "/stats")
        stats = json.loads(conn4.getresponse().read())
        assert stats["requests"] >= 1 and stats["batches"] >= 1
        assert "latency_s" in stats

        # per-request artifact tree (save_artifacts + --artifact_dir)
        body2 = json.dumps(dict(meta_prompt=PROMPT, seed=12, save_artifacts=True,
                                thresholds={"0": 0.1}, num_inference_steps=2,
                                max_iter_to_alter=1))
        conn5 = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        conn5.request("POST", "/generate", body=body2,
                      headers={"Content-Type": "application/json"})
        resp5 = conn5.getresponse()
        assert resp5.status == 200
        out5 = json.loads(resp5.read())
        from pathlib import Path

        img_path = Path(out5["artifacts_path"])
        assert img_path.exists()
        run_dir = img_path.parent
        assert list(run_dir.glob("12*.txt")), "run log missing"
        step_dir = run_dir / "12"
        assert list(step_dir.glob("_attnmap_*")), "attention maps missing"

        # a repeat of the SAME (prompt, seed) lands in its own per-request
        # namespace — concurrent identical requests must not clobber each
        # other's trees
        conn6 = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        conn6.request("POST", "/generate", body=body2,
                      headers={"Content-Type": "application/json"})
        resp6 = conn6.getresponse()
        assert resp6.status == 200
        out6 = json.loads(resp6.read())
        assert out6["artifacts_path"] != out5["artifacts_path"]
        assert Path(out6["artifacts_path"]).exists()

        # an explicit capture_diagnostics: false is overridden — the artifact
        # writer needs real per-token diags; honoring the false would crash
        # AFTER the full generation
        body3 = json.dumps(dict(meta_prompt=PROMPT, seed=13, save_artifacts=True,
                                capture_diagnostics=False,
                                thresholds={"0": 0.1}, num_inference_steps=2,
                                max_iter_to_alter=1))
        conn7 = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        conn7.request("POST", "/generate", body=body3,
                      headers={"Content-Type": "application/json"})
        resp7 = conn7.getresponse()
        assert resp7.status == 200
        out7 = json.loads(resp7.read())
        assert "artifacts_error" not in out7
        assert Path(out7["artifacts_path"]).exists()
    finally:
        server.shutdown()
        server.server_close()

    # a RESTARTED server on the same --artifact_dir resumes the request-id
    # namespace past the trees already on disk instead of clobbering them
    existing = {p.name for p in tmp_path.glob("req*")}
    assert existing  # the first server wrote some
    server2 = make_server(engine, host="127.0.0.1", port=0, artifact_dir=tmp_path)
    port2 = server2.server_address[1]
    threading.Thread(target=server2.serve_forever, daemon=True).start()
    try:
        import http.client

        conn = http.client.HTTPConnection("127.0.0.1", port2, timeout=600)
        conn.request("POST", "/generate", body=json.dumps(
            dict(meta_prompt=PROMPT, seed=12, save_artifacts=True,
                 thresholds={"0": 0.1}, num_inference_steps=2,
                 max_iter_to_alter=1)),
            headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 200
        out = json.loads(resp.read())
        from pathlib import Path

        req_dir = Path(out["artifacts_path"])
        while req_dir.parent != tmp_path:
            req_dir = req_dir.parent
        assert req_dir.name not in existing
    finally:
        server2.shutdown()
        server2.server_close()


# ---- HyperParams over HTTP (VERDICT r3 item 4) ----
def test_coerce_hp_validation():
    from guided_attention_tpu.config import HyperParams
    from guided_attention_tpu.frontends.server import _coerce_hp

    hp = _coerce_hp(dict(strict=True, recurse_steps=1, recurse_until=5,
                         bb_center_weight=0.1, paint_with_words_stop=3,
                         paint_with_words_weight=2.0, use_optimizer=True,
                         keyword_max_loss_scale=0.5, inside_loss_scale=0.3,
                         outside_loss_scale=0.4, shrink_factor=0.1))
    assert isinstance(hp, HyperParams)
    assert hp.strict is True and hp.recurse_steps == 1 and hp.use_optimizer is True
    assert hp.thresholds == {0: 1.0}  # untouched default

    # integer-valued floats are fine for int fields; JSON has no int/float split
    assert _coerce_hp({"recurse_steps": 2.0}).recurse_steps == 2

    with pytest.raises(RequestError, match="unknown hp"):
        _coerce_hp({"thresholds": {0: 1.0}})  # thresholds: top-level knob only
    with pytest.raises(RequestError, match="unknown hp"):
        _coerce_hp({"optimize_deep_latent": True})  # deliberately not served
    with pytest.raises(RequestError, match="JSON object"):
        _coerce_hp([1, 2])
    with pytest.raises(RequestError, match="boolean"):
        _coerce_hp({"strict": 1})
    with pytest.raises(RequestError, match="number"):
        _coerce_hp({"recurse_steps": True})
    with pytest.raises(RequestError, match="integer"):
        _coerce_hp({"recurse_steps": 1.5})
    with pytest.raises(RequestError, match=r"in \[1, 100\]"):
        _coerce_hp({"recurse_steps": 0})
    with pytest.raises(RequestError, match="must be a number"):
        _coerce_hp({"bb_center_weight": "big"})
    with pytest.raises(RequestError):
        _coerce_hp({"shrink_factor": 1.0})


def test_hp_in_group_key_and_submit_type_check(pipe):
    from guided_attention_tpu.config import HyperParams

    eng = BatchingEngine(pipe, _start_thread=False)
    try:
        hp1 = HyperParams(recurse_steps=1)
        t_default = eng.submit(PROMPT, seed=1, **KNOBS)
        t_hp_a = eng.submit(PROMPT, seed=2, hp=hp1, **KNOBS)
        t_hp_b = eng.submit(PROMPT, seed=3, hp=HyperParams(recurse_steps=1), **KNOBS)
        # equal hp coalesces; different hp must split (hp is in cache_key)
        assert t_hp_a.group_key == t_hp_b.group_key
        assert t_default.group_key != t_hp_a.group_key

        with pytest.raises(RequestError, match="hp must be a HyperParams"):
            eng.submit(PROMPT, seed=4, hp={"recurse_steps": 1}, **KNOBS)
    finally:
        eng.close()


def test_hp_over_http(engine, pipe):
    """A request with "hp" generates (200) with the hp actually applied
    (pixels equal the direct runner call with the same HyperParams), and
    invalid hp is a 400, not a batch poison."""
    import http.client

    server = make_server(engine, host="127.0.0.1", port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        body = json.dumps(dict(meta_prompt=PROMPT, seed=21,
                               hp={"recurse_steps": 1},
                               thresholds={"0": 0.1}, num_inference_steps=2,
                               max_iter_to_alter=1))
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        conn.request("POST", "/generate", body=body,
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 200
        out = json.loads(resp.read())
        png = base64.b64decode(out["image_png_b64"])
        assert png[:8] == b"\x89PNG\r\n\x1a\n"

        from guided_attention_tpu.config import HyperParams

        direct = pipe.generate_batch(
            [21], meta_prompt=PROMPT, hp=HyperParams(recurse_steps=1),
            capture_diagnostics=False, **KNOBS,
        )[0]
        from guided_attention_tpu.runtime.artifacts import to_pil
        import io

        import numpy as np
        from PIL import Image

        # compare decoded PIXELS, not encoded bytes: the server encodes at
        # zlib level 1 (speed over size, server._png_bytes) while a default
        # PIL save uses level 6 — same image, different byte streams
        served = np.asarray(Image.open(io.BytesIO(png)).convert("RGB"))
        want = np.asarray(to_pil(direct.images[0]).convert("RGB"))
        assert np.array_equal(served, want)

        for bad in ({"nope": 1}, {"recurse_steps": 0}, {"strict": "yes"}, 7):
            c = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
            c.request("POST", "/generate",
                      body=json.dumps(dict(meta_prompt=PROMPT, seed=1, hp=bad)),
                      headers={"Content-Type": "application/json"})
            r = c.getresponse()
            assert r.status == 400, (bad, r.status)
            assert "hp" in json.loads(r.read())["error"]
    finally:
        server.shutdown()
        server.server_close()


def test_concurrent_artifact_requests(engine, tmp_path):
    """VERDICT r3 weak #7: concurrent save_artifacts requests — handler
    threads write full artifact trees under the artifact lock without
    cross-request clobbering, and artifact IO failures never corrupt
    another request's response."""
    import http.client
    from pathlib import Path

    server = make_server(engine, host="127.0.0.1", port=0, artifact_dir=tmp_path)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    results = {}

    def post(tag, seed):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=900)
        conn.request(
            "POST", "/generate",
            body=json.dumps(dict(
                meta_prompt=PROMPT, seed=seed, save_artifacts=True,
                thresholds={"0": 0.1}, num_inference_steps=2,
                max_iter_to_alter=1,
            )),
            headers={"Content-Type": "application/json"},
        )
        r = conn.getresponse()
        results[tag] = (r.status, json.loads(r.read()))

    threads = [threading.Thread(target=post, args=(i, 30 + i)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=900)
    try:
        paths = set()
        for tag, (status, body) in results.items():
            assert status == 200, (tag, body)
            assert "artifacts_path" in body, body
            p = Path(body["artifacts_path"])
            assert p.exists()
            run_dir = p.parent
            seed = body["seed"]
            assert list(run_dir.glob(f"{seed}*.txt")), "run log missing"
            paths.add(str(p))
        # three requests -> three DISTINCT req{N} namespaces
        assert len(paths) == 3
        req_dirs = {Path(p).parts[-3] for p in paths}
        assert len(req_dirs) == 3, req_dirs
    finally:
        server.shutdown()
        server.server_close()
