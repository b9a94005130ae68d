"""Execute scripts/reference_trace.py END-TO-END without diffusers.

VERDICT r4 next #2: the reference-side parity tracer had never actually run
anywhere — its hook installation (pga.aggregate_attention /
GuidedAttention._compute_loss / helpers.log_latent_stats patches,
reference_trace.py:139-196) and slot-assembly logic (:227-254) are exactly
the code that would break silently against the real reference on the day
checkpoints arrive. This test runs ``reference_trace.main()`` against
tests/fake_reference/ — a diffusers-free shim whose GuidedAttention replays
a synthetic trajectory through the reference's exact hook call pattern —
and compares the produced npz against an INDEPENDENTLY computed expectation.
It fails if the hook patching, the one-record-per-fresh-eval gating, the
last-recursion-wins grouping, the slot assembly, or the npz schema drifts.
"""
import json
import os
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
FAKE = Path(__file__).resolve().parent / "fake_reference"

S, MAX_REC, MAX_EV, R, K, H = 3, 2, 4, 16, 77, 8
R_SUB = 12  # reference_trace default --r_sub


def _make_trajectory(path: Path) -> dict:
    rng = np.random.RandomState(7)
    n_rec = np.array([2, 1, 1], np.int64)
    # step 0: recursion 0 runs 4 evals (eval0 + 2 refinement + final),
    #         recursion 1 runs 3 (eval0 + 1 refinement + final) — the LAST
    #         recursion's group must win;
    # step 1: a single eval (threshold met instantly -> slot 0 only);
    # step 2: no guidance evals at all (latent stats still recorded).
    n_evals = np.zeros((S, MAX_REC), np.int64)
    n_evals[0, 0], n_evals[0, 1] = 4, 3
    n_evals[1, 0] = 1
    raw_maps = rng.randn(S, MAX_REC, MAX_EV, R, R, K).astype(np.float32) * 0.02
    losses = rng.rand(S, MAX_REC, MAX_EV).astype(np.float32) + 0.1
    unscaled = np.zeros((S, MAX_REC, MAX_EV, K), np.float32)
    # two bound tokens (indices 2 and 5), like a two-object prompt
    unscaled[..., 2] = rng.rand(S, MAX_REC, MAX_EV) + 0.01
    unscaled[..., 5] = rng.rand(S, MAX_REC, MAX_EV) + 0.01
    latents = rng.randn(S, MAX_REC, 1, 4, H, H).astype(np.float32)
    arrs = dict(n_rec=n_rec, n_evals=n_evals, raw_maps=raw_maps,
                losses=losses, unscaled=unscaled, latents=latents)
    np.savez(path, **arrs)
    return arrs


def _resoftmax(raw: np.ndarray) -> np.ndarray:
    """Independent re-implementation of the reference's x100 re-softmax over
    token slice [1:-1] (reference pipeline:216-218) — deliberately NOT
    calling reference_trace.resoftmax_probs."""
    out = np.zeros_like(raw, dtype=np.float32)
    x = raw[:, :, 1:-1].astype(np.float64) * 100.0
    e = np.exp(x - x.max(-1, keepdims=True))
    out[:, :, 1:-1] = (e / e.sum(-1, keepdims=True)).astype(np.float32)
    return out


def _expected(arrs: dict) -> dict:
    """Independent slot assembly: what the npz must contain for the synthetic
    trajectory (mirrors the documented schema, not reference_trace's code)."""
    total_loss = np.zeros(S, np.float32)
    eval_unscaled = np.zeros((S, R_SUB, K), np.float32)
    eval_mask = np.zeros((S, R_SUB), bool)
    eval_maps = np.zeros((S, R_SUB, R, R, K), np.float16)
    lmean = np.zeros((S, 4), np.float32)
    lstd = np.zeros((S, 4), np.float32)
    lp99 = np.zeros((S, 4), np.float32)
    for s in range(S):
        last_rec = int(arrs["n_rec"][s]) - 1
        lat = arrs["latents"][s, last_rec]
        absl = np.abs(lat)
        lmean[s] = lat.mean(axis=(0, 2, 3))
        lstd[s] = absl.std(axis=(0, 2, 3))
        lp99[s] = np.quantile(absl[0].reshape(4, -1), 0.99, axis=1)
        E = int(arrs["n_evals"][s, last_rec])
        if not E:
            continue
        total_loss[s] = arrs["losses"][s, last_rec, E - 1]
        for j in range(E):
            slot = 0 if j == 0 else (R_SUB - 1 if j == E - 1 else j)
            eval_unscaled[s, slot] = arrs["unscaled"][s, last_rec, j]
            eval_mask[s, slot] = True
            eval_maps[s, slot] = _resoftmax(
                arrs["raw_maps"][s, last_rec, j]
            ).astype(np.float16)
    return dict(total_loss=total_loss, eval_unscaled=eval_unscaled,
                eval_mask=eval_mask, eval_maps=eval_maps, latent_mean=lmean,
                latent_std=lstd, latent_p99=lp99)


_FAKE_MODULES = ("config", "run", "utils", "utils.shared_state",
                 "utils.helpers", "utils.ptp_utils",
                 "pipeline_guided_attention")


@pytest.fixture
def clean_fake_imports():
    saved = {m: sys.modules.pop(m) for m in _FAKE_MODULES if m in sys.modules}
    saved_path = list(sys.path)
    yield
    for m in _FAKE_MODULES:
        sys.modules.pop(m, None)
    sys.path[:] = saved_path
    sys.modules.update(saved)


def test_reference_trace_end_to_end(tmp_path, clean_fake_imports, monkeypatch):
    sys.path.insert(0, str(REPO / "scripts"))
    import reference_trace

    traj_path = tmp_path / "traj.npz"
    arrs = _make_trajectory(traj_path)
    monkeypatch.setenv("GA_FAKE_TRAJ", str(traj_path))

    # initial latents in the JAX-side NHWC layout: reference_trace must
    # convert to NCHW and hand them to the pipeline
    init_nhwc = np.random.RandomState(3).randn(1, H, H, 4).astype(np.float32)
    init_path = tmp_path / "init.npy"
    np.save(init_path, init_nhwc)

    out_path = tmp_path / "ref_trace.npz"
    rc = reference_trace.main([
        "--repo", str(FAKE),
        "--model_path", "fake/sd",
        "--meta_prompt", "a [robot:.6,.3,.4,.55] and a [vase:0,.3,.4,.55]",
        "--seed", "28", "--steps", str(S),
        "--latents", str(init_path),
        "--out", str(out_path),
        "--device", "cpu",
    ])
    assert rc == 0

    import pipeline_guided_attention as fake_pga

    # the init latents reached the pipeline, converted NHWC -> NCHW
    got_init = fake_pga.received["latents"]
    np.testing.assert_allclose(
        got_init, np.transpose(init_nhwc, (0, 3, 1, 2)), rtol=0, atol=0
    )
    # the full reference keyword surface was forwarded
    kw = fake_pga.received["kwargs"]
    assert kw["prompt"] == "a robot and a vase"
    assert kw["thresholds"] == {0: 1.0}  # grid-state override (run.py:75-79)
    assert kw["guidance_scale"] == 7.5

    f = np.load(out_path, allow_pickle=False)
    # ---- schema: exact key set, dtypes, shapes ----
    assert set(f.files) == {
        "total_loss", "eval_unscaled", "eval_mask", "eval_maps",
        "latent_mean", "latent_std", "latent_p99", "init_latents",
        "final_latents", "meta",
    }
    assert f["total_loss"].shape == (S,) and f["total_loss"].dtype == np.float32
    assert f["eval_unscaled"].shape == (S, R_SUB, K)
    assert f["eval_mask"].shape == (S, R_SUB) and f["eval_mask"].dtype == bool
    assert f["eval_maps"].shape == (S, R_SUB, R, R, K)
    assert f["eval_maps"].dtype == np.float16
    assert f["latent_mean"].shape == (S, 4)
    assert f["init_latents"].shape == (H, H, 4)
    assert f["final_latents"].shape == (H, H, 4)
    meta = json.loads(str(f["meta"]))
    assert meta["side"] == "torch" and meta["steps"] == S

    # ---- content vs the independent expectation ----
    exp = _expected(arrs)
    np.testing.assert_array_equal(f["eval_mask"], exp["eval_mask"])
    np.testing.assert_allclose(f["total_loss"], exp["total_loss"], rtol=1e-6)
    np.testing.assert_allclose(
        f["eval_unscaled"], exp["eval_unscaled"], rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(f["eval_maps"], np.float32),
        np.asarray(exp["eval_maps"], np.float32),
        rtol=0, atol=2e-3,  # both sides quantize through f16
    )
    for key in ("latent_mean", "latent_std", "latent_p99"):
        np.testing.assert_allclose(f[key], exp[key], rtol=1e-5, atol=1e-7)
    # final latents = last log_latent_stats latent of the last step, NHWC
    want_final = np.transpose(arrs["latents"][2, 0], (0, 2, 3, 1))[0]
    np.testing.assert_allclose(f["final_latents"], want_final, rtol=1e-6)
    np.testing.assert_array_equal(f["init_latents"], init_nhwc[0])

    # ---- the produced npz round-trips through the compare tool ----
    expected_npz = tmp_path / "expected.npz"
    np.savez(expected_npz, init_latents=init_nhwc[0],
             final_latents=want_final, meta=json.dumps({"side": "test"}),
             **exp)
    import parity_trace

    assert parity_trace.main([
        "compare", str(out_path), str(expected_npz),
    ]) == 0
    # and a corrupted slot assembly is CAUGHT by the compare
    bad = dict(exp)
    bad_mask = exp["eval_mask"].copy()
    bad_mask[0, 2] = ~bad_mask[0, 2]
    bad = {**exp, "eval_mask": bad_mask}
    bad_npz = tmp_path / "bad.npz"
    np.savez(bad_npz, init_latents=init_nhwc[0], final_latents=want_final,
             meta=json.dumps({"side": "test"}), **bad)
    assert parity_trace.main(["compare", str(out_path), str(bad_npz)]) == 1
