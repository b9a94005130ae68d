"""Parity-trace harness self-tests (scripts/parity_trace.py).

The real-weights comparison against the torch reference needs a local SD
checkpoint (none in this sandbox); these tests pin the repo side: the trace
schema, repo-vs-repo bit-exactness, latent-layout normalization, and the
compare tool's pass/fail behavior. Reference protocol: docs/MIGRATION.md
"Parity tracing"."""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir, "scripts"))
import parity_trace  # noqa: E402


def test_norm_latents_layouts():
    nhwc = np.random.default_rng(0).normal(size=(1, 8, 8, 4)).astype(np.float32)
    nchw = np.transpose(nhwc, (0, 3, 1, 2))
    assert np.array_equal(parity_trace._norm_latents(nhwc), nhwc)
    assert np.array_equal(parity_trace._norm_latents(nchw), nhwc)
    with pytest.raises(ValueError):
        parity_trace._norm_latents(np.zeros((1, 3, 8, 8), np.float32))
    with pytest.raises(ValueError):
        parity_trace._norm_latents(np.zeros((2, 4, 8, 8), np.float32))


def test_parse_thresholds():
    assert parity_trace.parse_thresholds("") is None
    assert parity_trace.parse_thresholds("0:1.0") == {0: 1.0}
    assert parity_trace.parse_thresholds("0:0.1,3:0.8") == {0: 0.1, 3: 0.8}


@pytest.fixture(scope="module")
def trace_npz(tmp_path_factory):
    d = tmp_path_factory.mktemp("ptrace")
    out = str(d / "t1.npz")
    rc = parity_trace.main(
        [
            "trace", "--model", "micro", "--steps", "2", "--seed", "28",
            "--thresholds", "0:0.5", "--out", out,
            "--save_latents", str(d / "init.npy"),
        ]
    )
    assert rc == 0
    return out


def test_trace_schema(trace_npz):
    f = np.load(trace_npz)
    meta = json.loads(str(f["meta"]))
    assert meta["side"] == "jax" and meta["steps"] == 2
    S = 2
    assert f["total_loss"].shape == (S,)
    assert f["eval_mask"].shape[0] == S and f["eval_mask"].dtype == bool
    R_sub = f["eval_mask"].shape[1]
    assert f["eval_unscaled"].shape == (S, R_sub, 77)
    assert f["eval_maps"].shape[:2] == (S, R_sub) and f["eval_maps"].shape[-1] == 77
    assert f["latent_mean"].shape == (S, 4)
    assert f["final_latents"].shape[-1] == 4
    # step 0 guided with threshold 0.5: eval0 ran, loss nonzero
    assert f["eval_mask"][0, 0]
    assert f["total_loss"][0] != 0.0
    # map slots that ran hold probability-ish mass (re-softmaxed over tokens)
    m = f["eval_maps"][0, 0].astype(np.float32)
    assert np.all(m >= 0) and abs(float(m.sum(-1).mean()) - 1.0) < 1e-2


def test_compare_self_bitexact_and_tamper_fails(trace_npz, tmp_path, capsys):
    assert parity_trace.main(["compare", trace_npz, trace_npz, "--rtol", "0", "--atol", "0"]) == 0
    assert "PARITY: PASS" in capsys.readouterr().out

    f = dict(np.load(trace_npz))
    f["total_loss"] = f["total_loss"] + 0.1
    bad = str(tmp_path / "bad.npz")
    np.savez(bad, **f)
    assert parity_trace.main(["compare", trace_npz, bad, "--rtol", "1e-3", "--atol", "1e-4"]) == 1
    out = capsys.readouterr().out
    assert "FAIL total_loss" in out and "PARITY: FAIL" in out


def test_resoftmax_matches_repo():
    """The reference-side tracer's re-softmax (scripts/reference_trace.py
    resoftmax_probs — the math the torch hooks apply to raw aggregated
    maps) must equal the repo's masked softmax (guidance/losses.py
    compute_token_stats, pipeline:216-218 parity) so trace comparisons
    compare like with like."""
    import jax
    import jax.numpy as jnp

    import reference_trace

    rng = np.random.default_rng(7)
    raw = rng.random((16, 16, 77)).astype(np.float32) * 0.1

    for last in (-1, 9):  # sd15 slice [1:-1]; sd21-style [1:last_eot]
        got = reference_trace.resoftmax_probs(raw, last)
        valid = np.zeros(77, bool)
        valid[1:last] = True
        logits = jnp.where(valid[None, None, :], jnp.asarray(raw) * 100.0, -jnp.inf)
        want = np.asarray(jax.nn.softmax(logits, axis=-1))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)
        assert (got[:, :, ~valid] == 0).all()
