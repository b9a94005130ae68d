"""Mid-run checkpoint/resume (runtime/checkpoint.py): exact resume of an
interrupted generation — the aux subsystem the reference lacks (SURVEY.md §5:
a crashed reference run regenerates from scratch; determinism via seeded
generators, reference run.py:106, is its only substitute)."""
import numpy as np
import pytest
import jax.numpy as jnp

from guided_attention_tpu.models.bundle import StableDiffusion
from guided_attention_tpu.runner import GuidedAttentionPipeline
from guided_attention_tpu.runtime import checkpoint as ckpt

META = "a [robot:.6,.3,.4,.55] and a [vase:0,.3,.4,.55]"
KW = dict(meta_prompt=META, num_inference_steps=4, thresholds={0: 0.5})


@pytest.fixture(scope="module")
def pipe():
    sd = StableDiffusion.create("micro", dtype=jnp.float32)
    return GuidedAttentionPipeline(sd)


@pytest.fixture(scope="module")
def baseline(pipe):
    return pipe(seed=7, **KW)


def test_segment_bounds():
    assert ckpt.segment_bounds(0, 10, 4) == [(0, 4), (4, 8), (8, 10)]
    # resume from an off-grid step realigns to the global grid so the
    # original run's compiled segments are reused
    assert ckpt.segment_bounds(3, 10, 4) == [(3, 4), (4, 8), (8, 10)]
    assert ckpt.segment_bounds(0, 4, 10) == [(0, 4)]
    with pytest.raises(ValueError):
        ckpt.segment_bounds(0, 4, 0)


def test_segmented_matches_uninterrupted(pipe, baseline, tmp_path):
    out = pipe.generate_resumable(seed=7, checkpoint_every=2, state_dir=str(tmp_path), **KW)
    assert out.resumed_from_step == 0
    np.testing.assert_allclose(out.latents, baseline.latents, atol=1e-5)
    np.testing.assert_allclose(
        out.diagnostics.total_loss, baseline.diagnostics.total_loss, atol=1e-5
    )
    assert out.diagnostics.total_loss.shape[0] == 4
    assert not list(tmp_path.glob("genstate_*"))  # cleared on success
    # the segment start is a TRACED argument: ONE compiled program serves
    # both length-2 segments (and any future resume point on the grid)
    seg_keys = [k for k in pipe._generate_cache if k[-1] == ("segment", 2)]
    assert len(seg_keys) == 1


def test_crash_resume_exact(pipe, baseline, tmp_path):
    calls = []

    def boom(step_done, total):
        calls.append(step_done)
        if step_done == 2:
            raise KeyboardInterrupt  # simulated preemption after segment 1

    with pytest.raises(KeyboardInterrupt):
        pipe.generate_resumable(
            seed=7, checkpoint_every=2, state_dir=str(tmp_path), on_segment=boom, **KW
        )
    assert calls == [2]
    assert list(tmp_path.glob("genstate_*"))  # state persisted before the crash

    resumed_calls = []
    out = pipe.generate_resumable(
        seed=7,
        checkpoint_every=2,
        state_dir=str(tmp_path),
        on_segment=lambda b, s: resumed_calls.append(b),
        **KW,
    )
    assert out.resumed_from_step == 2
    assert resumed_calls == [4]  # only the remaining segment ran
    np.testing.assert_allclose(out.latents, baseline.latents, atol=1e-5)
    # diagnostics cover the FULL run (restored prefix + resumed suffix)
    assert out.diagnostics.total_loss.shape[0] == 4
    np.testing.assert_allclose(
        out.diagnostics.total_loss, baseline.diagnostics.total_loss, atol=1e-5
    )
    assert out.images.shape == (1, 128, 128, 3)


def test_resume_exact_with_stochastic_eta(pipe, tmp_path):
    # eta>0 adds DDIM variance noise each step; resume stays exact because
    # the eta/renoise streams fold the ABSOLUTE step into a carried key that
    # never advances (pipeline.py eta_key_for) — a relative-step or
    # split-per-segment scheme would diverge here
    kw = dict(KW, eta=1.0)
    base = pipe(seed=11, **kw)

    def boom(step_done, total):
        if step_done == 2:
            raise KeyboardInterrupt

    with pytest.raises(KeyboardInterrupt):
        pipe.generate_resumable(
            seed=11, checkpoint_every=2, state_dir=str(tmp_path), on_segment=boom, **kw
        )
    out = pipe.generate_resumable(
        seed=11, checkpoint_every=2, state_dir=str(tmp_path), **kw
    )
    assert out.resumed_from_step == 2
    np.testing.assert_allclose(out.latents, base.latents, atol=1e-5)


def test_batch_resumable_matches_batch(pipe, tmp_path):
    # the sharded batch engine checkpoints/resumes too (whole-batch state)
    seeds = [3, 4]
    base = pipe.generate_batch(seeds, **KW)
    calls = []

    def boom(step_done, total):
        calls.append(step_done)
        if step_done == 2:
            raise KeyboardInterrupt

    with pytest.raises(KeyboardInterrupt):
        pipe.generate_batch_resumable(
            seeds, checkpoint_every=2, state_dir=str(tmp_path), on_segment=boom, **KW
        )
    outs = pipe.generate_batch_resumable(
        seeds, checkpoint_every=2, state_dir=str(tmp_path), **KW
    )
    assert outs[0].resumed_from_step == 2
    for o, r in zip(outs, base):
        np.testing.assert_allclose(o.latents, r.latents, atol=1e-5)
        np.testing.assert_allclose(
            o.diagnostics.total_loss, r.diagnostics.total_loss, atol=1e-5
        )
        assert o.images.shape == r.images.shape
    assert not list(tmp_path.glob("genstate_*"))  # cleared on success


def _diag(steps: int, val: float, batch=None):
    """Minimal StepDiag pytree with a leading step axis (or [B, steps])."""
    import dataclasses as dc

    from guided_attention_tpu.pipeline import StepDiag

    shape = (steps, 2) if batch is None else (batch, steps, 2)
    return StepDiag(**{
        f.name: np.full(shape, val, np.float32) for f in dc.fields(StepDiag)
    })


def test_latest_state_stitches_segment_chain(tmp_path):
    # state files carry ONLY their segment's diags (linear checkpoint
    # volume); latest_state glues the chain back together
    lat = np.zeros((4, 4, 2), np.float32)
    ckpt.save_state(tmp_path, "id", 2, lat, _diag(2, 0.0), seg_start=0)
    ckpt.save_state(tmp_path, "id", 4, lat + 1, _diag(2, 1.0), seg_start=2)
    step, lat_out, diags = ckpt.latest_state(tmp_path, "id")
    assert step == 4
    np.testing.assert_array_equal(lat_out, lat + 1)
    assert diags.total_loss.shape == (4, 2)
    np.testing.assert_array_equal(diags.total_loss[:, 0], [0, 0, 1, 1])

    # batched diags stitch along axis 1
    ckpt.save_state(tmp_path, "b", 2, lat, _diag(2, 0.0, batch=3), seg_start=0)
    ckpt.save_state(tmp_path, "b", 4, lat, _diag(2, 1.0, batch=3), seg_start=2)
    _, _, bdiags = ckpt.latest_state(tmp_path, "b", axis=1)
    assert bdiags.total_loss.shape == (3, 4, 2)


def test_latest_state_orders_steps_numerically(tmp_path):
    # chain stitching walks files in NUMERIC step order: "10002" sorts
    # lexicographically before "9998" but must extend the chain after it
    lat = np.zeros((4, 4, 2), np.float32)
    ckpt.save_state(tmp_path, "id", 9998, lat, _diag(2, 0.0), seg_start=0)
    ckpt.save_state(tmp_path, "id", 10002, lat + 1, _diag(2, 1.0), seg_start=9998)
    step, lat_out, diags = ckpt.latest_state(tmp_path, "id")
    assert step == 10002
    np.testing.assert_array_equal(lat_out, lat + 1)
    assert diags.total_loss.shape == (4, 2)


def test_latest_state_survives_torn_and_mismatched_files(tmp_path):
    from flax import serialization

    lat = np.zeros((4, 4, 2), np.float32)
    ckpt.save_state(tmp_path, "id", 2, lat, _diag(2, 0.0), seg_start=0)
    ckpt.save_state(tmp_path, "id", 4, lat + 1, _diag(2, 1.0), seg_start=2)
    # torn tail file: unreadable bytes must not block resume from step 4
    ckpt._path(tmp_path, "id", 6).write_bytes(b"torn")
    # parseable but schema-mismatched diags (e.g. written by an older
    # StepDiag) must be skipped, not crash resume
    ckpt._path(tmp_path, "id", 8).write_bytes(
        serialization.msgpack_serialize({
            "identity": "id", "step": 8, "seg_start": 4,
            "latents": lat, "diags": {"bogus": np.zeros(3)},
        })
    )
    step, lat_out, diags = ckpt.latest_state(tmp_path, "id")
    assert step == 4
    assert diags.total_loss.shape == (4, 2)

    # a fresh seg_start=0 file supersedes older partial chains
    ckpt.save_state(tmp_path, "id", 3, lat + 2, _diag(3, 2.0), seg_start=0)
    step, lat_out, diags = ckpt.latest_state(tmp_path, "id")
    # files walk in step order: the step-3 restart is then EXTENDED by the
    # on-grid step-4 file only if seg_start matches (it doesn't: 2 != 3)
    assert step == 3
    np.testing.assert_array_equal(lat_out, lat + 2)
    np.testing.assert_array_equal(diags.total_loss[:, 0], [2, 2, 2])


def test_identity_guards_resume(pipe, tmp_path):
    pipe.generate_resumable(
        seed=7, checkpoint_every=2, state_dir=str(tmp_path), keep_state=True, decode=False, **KW
    )
    assert list(tmp_path.glob("genstate_*"))
    # a different seed is a different run identity -> fresh start, and its
    # cleanup must not touch the other run's state
    out = pipe.generate_resumable(
        seed=8, checkpoint_every=2, state_dir=str(tmp_path), decode=False, **KW
    )
    assert out.resumed_from_step == 0
    assert list(tmp_path.glob("genstate_*"))
    # same config+seed resumes from the completed state: no segments re-run
    out2 = pipe.generate_resumable(
        seed=7,
        checkpoint_every=2,
        state_dir=str(tmp_path),
        decode=False,
        keep_state=True,
        on_segment=lambda b, s: pytest.fail("complete run must not re-run segments"),
        **KW,
    )
    assert out2.resumed_from_step == 4
    assert out2.diagnostics.total_loss.shape[0] == 4
