"""End-to-end guided generation on a random-init micro model
(SURVEY.md §4: 'integration without weights' — shapes, determinism, and that
guidance strictly reduces the loss)."""
import numpy as np
import pytest
import jax.numpy as jnp

from guided_attention_tpu.models.bundle import StableDiffusion
from guided_attention_tpu.runner import GuidedAttentionPipeline

META = "a [robot:.6,.3,.4,.55] and a [vase:0,.3,.4,.55]"


@pytest.fixture(scope="module")
def pipe():
    sd = StableDiffusion.create("micro", dtype=jnp.float32)
    return GuidedAttentionPipeline(sd)


@pytest.fixture(scope="module")
def guided_out(pipe):
    return pipe(meta_prompt=META, seed=1, num_inference_steps=4, thresholds={0: 0.5})


def test_degenerate_knobs_rejected_with_clear_errors(pipe):
    """Garbage knobs must fail fast at prepare with a ValueError (HTTP 400
    through the serving frontends) — probed failure modes they replace:
    steps=0 ZeroDivisionError mid-schedule, sigma=0 an all-NaN smoothing
    kernel silently poisoning the outputs, attention_res=7 an obscure
    trace-time concatenate error."""
    with pytest.raises(ValueError, match="num_inference_steps"):
        pipe(meta_prompt=META, seed=1, num_inference_steps=0)
    with pytest.raises(ValueError, match="sigma"):
        pipe(meta_prompt=META, seed=1, num_inference_steps=2, sigma=0.0)
    with pytest.raises(ValueError, match="sigma"):
        # JSON clients can send run_standard_sd as the int 0 (falsy but not
        # the literal False) — the guided-mode sigma guard must still fire
        pipe(meta_prompt=META, seed=1, num_inference_steps=2, sigma=0.0,
             run_standard_sd=0)
    with pytest.raises(ValueError, match="kernel_size"):
        pipe(meta_prompt=META, seed=1, num_inference_steps=2, kernel_size=0)
    with pytest.raises(ValueError, match="attention_res"):
        pipe(meta_prompt=META, seed=1, num_inference_steps=2, attention_res=7)
    # bound comes from THIS model's latent resolution (micro: 16), not a
    # hardcoded SD 64 — 32 is valid for SD1.5 but not here
    with pytest.raises(ValueError, match="attention_res"):
        pipe(meta_prompt=META, seed=1, num_inference_steps=2, attention_res=32)
    # a huge steps value is a prepare-time DoS (schedule/diag arrays are
    # allocated proportional to it under the pipeline lock) — bounded above
    with pytest.raises(ValueError, match="num_inference_steps"):
        pipe(meta_prompt=META, seed=1, num_inference_steps=10**9)
    with pytest.raises(ValueError, match="finite"):
        pipe(meta_prompt=META, seed=1, num_inference_steps=2,
             scale_factor=float("nan"))
    # sigma is irrelevant when the run never smooths: standard SD must NOT
    # be rejected over a knob it doesn't use (a sweep's control arm)
    out = pipe(meta_prompt="a dog", seed=1, num_inference_steps=2,
               run_standard_sd=True, sigma=0.0,
               decode=False, capture_diagnostics=False)
    assert np.isfinite(out.latents).all()


def test_standard_sd_shapes_and_finite(pipe):
    out = pipe(meta_prompt="a dog and a cat", seed=1, num_inference_steps=4, run_standard_sd=True)
    assert out.images.shape == (1, 128, 128, 3)
    assert np.isfinite(out.latents).all()
    assert 0.0 <= out.images.min() and out.images.max() <= 1.0


def test_guided_refinement_runs_on_threshold_step(guided_out):
    d = guided_out.diagnostics
    # step 0 has the only threshold: refinement + recursion happen there only
    assert d.refine_iters[0] > 0
    assert d.did_update[0]
    assert d.recursions[0] == 3  # hp default recurse_steps
    assert not d.did_update[1:].any()
    assert (d.refine_iters[1:] == 0).all()
    assert (d.recursions[1:] == 1).all()


def test_refinement_reduces_loss(guided_out):
    d = guided_out.diagnostics
    # per-eval per-token unscaled losses at step 0: first vs final slot
    buf, mask = d.eval_unscaled[0], d.eval_mask[0]
    assert mask[0] and mask[-1]
    first = buf[0].sum()
    last = buf[-1].sum()
    assert last < first


def test_deterministic_and_seed_sensitivity(pipe, guided_out):
    out_b = pipe(meta_prompt=META, seed=1, num_inference_steps=4, thresholds={0: 0.5})
    assert np.array_equal(guided_out.latents, out_b.latents)
    out_c = pipe(meta_prompt=META, seed=2, num_inference_steps=4, thresholds={0: 0.5})
    assert not np.array_equal(guided_out.latents, out_c.latents)


def test_fused_matches_unfused_path(pipe, guided_out):
    """The fused program (decode inside, runner._get_fused) and the non-fused
    path (decode=False) share _derive_seed, so same-seed latents must match
    exactly — pins the two PRNG/init derivations together."""
    out = pipe(meta_prompt=META, seed=1, num_inference_steps=4, thresholds={0: 0.5}, decode=False)
    assert out.images is None
    assert np.array_equal(out.latents, guided_out.latents)


def test_gui_range_seed(pipe, guided_out):
    """Seeds up to 2^32-2 (the reference GUI draws randrange(4294967294),
    gui.py:29) must not overflow the jitted int32 seed argument."""
    out = pipe(meta_prompt=META, seed=2**32 - 3, num_inference_steps=4, thresholds={0: 0.5})
    assert np.isfinite(out.latents).all()
    assert not np.array_equal(out.latents, guided_out.latents)


def test_guidance_changes_output_vs_standard(pipe, guided_out):
    std = pipe(meta_prompt=META, seed=1, num_inference_steps=4, run_standard_sd=True)
    assert not np.array_equal(guided_out.latents, std.latents)


def test_diag_shapes(guided_out):
    d = guided_out.diagnostics
    S = 4
    assert d.total_loss.shape == (S,)
    assert d.maps.shape == (S, 16, 16, 77)
    assert d.x0_pred.shape[0] == S
    assert d.latent_p99.shape == (S, 4)
    assert d.group_unscaled.shape[0] == S


def test_inert_steps_skip_guidance_forwards(guided_out):
    d = guided_out.diagnostics
    # steps 1..3 are not threshold steps with only_update_on_threshold_steps:
    # the guidance forward is skipped entirely (loss identically 0, no evals)
    assert (d.total_loss[1:] == 0).all()
    assert not d.eval_mask[1:].any()


def test_bfloat16_compute_path():
    """Regression: bf16 latents must survive refinement/recursion carries
    (dtype promotion in the update once broke while_loop typing)."""
    sd = StableDiffusion.create("micro", dtype=jnp.bfloat16)
    p = GuidedAttentionPipeline(sd)
    out = p(meta_prompt="a [dog:.2,.3] x", seed=3, num_inference_steps=3, thresholds={0: 0.5})
    assert np.isfinite(out.latents.astype(np.float32)).all()
    assert out.diagnostics.refine_iters[0] > 0


def test_deep_latent_optimization_mode(pipe):
    """optimize_deep_latent steers via the UNet bottleneck (reference
    shared_state.optimizeDeepLatent + pipeline:693-706): runs, refines, and
    produces a different image than latent-space optimization."""
    from guided_attention_tpu.config import HyperParams

    hp_deep = HyperParams(optimize_deep_latent=True, thresholds={0: 0.5}, recurse_steps=1)
    out_deep = pipe(meta_prompt="a [dog:.2,.3] x", seed=5, num_inference_steps=3, hp=hp_deep)
    assert np.isfinite(out_deep.latents).all()
    assert out_deep.diagnostics.refine_iters[0] > 0
    hp_norm = HyperParams(thresholds={0: 0.5}, recurse_steps=1)
    out_norm = pipe(meta_prompt="a [dog:.2,.3] x", seed=5, num_inference_steps=3, hp=hp_norm)
    assert not np.array_equal(out_deep.latents, out_norm.latents)


def test_paint_with_words_changes_output(pipe):
    """paint_with_words biases cross-attn scores for steps < stop
    (reference ptp_utils.py:97-146)."""
    from guided_attention_tpu.config import HyperParams

    hp_off = HyperParams(thresholds={0: 0.5}, recurse_steps=1)
    hp_on = hp_off.replace(paint_with_words_stop=2, paint_with_words_weight=1.0)
    meta = "a [robot:.6,.3,.4,.55] x"
    out_off = pipe(meta_prompt=meta, seed=4, num_inference_steps=3, hp=hp_off)
    out_on = pipe(meta_prompt=meta, seed=4, num_inference_steps=3, hp=hp_on)
    assert np.isfinite(out_on.latents).all()
    assert not np.array_equal(out_on.latents, out_off.latents)
    # spec carries pww masks only when enabled
    assert out_on.spec.pww_masks and not out_off.spec.pww_masks


def test_use_optimizer_refinement(pipe):
    """SGD+momentum refinement variant (reference pipeline:495-497)."""
    from guided_attention_tpu.config import HyperParams

    hp = HyperParams(thresholds={0: 0.3}, recurse_steps=1, use_optimizer=True)
    out = pipe(meta_prompt="a [dog:.2,.3] x", seed=6, num_inference_steps=2, hp=hp)
    assert out.diagnostics.refine_iters[0] > 0
    assert np.isfinite(out.latents).all()


def test_custom_loss_through_pipeline(pipe):
    """[CustomLoss:toLeftOf ...] contributes a group and drives refinement."""
    out = pipe(
        meta_prompt="a cat and a vase [CustomLoss:toLeftOf (cat,vase)]",
        seed=7,
        num_inference_steps=2,
        thresholds={0: 1e-6},  # force refinement attempt on the custom group
    )
    assert out.spec.custom_group >= 0
    d = out.diagnostics
    assert d.eval_mask[0].sum() >= 1
    assert np.isfinite(out.latents).all()


def test_custom_loss_specs_isolated_across_prompts(pipe):
    """Regression: bind() used to mutate the SHARED registry loss object, so
    building a spec for prompt B corrupted the cached spec for prompt A
    (same token-index object aliased into both)."""
    a = "a cat and a vase [CustomLoss:toLeftOf (cat,vase)]"
    b = "a cat and a vase [CustomLoss:toLeftOf (vase,cat)]"  # same text, swapped loss
    kw = dict(seed=9, num_inference_steps=2, thresholds={0: 1e-6})
    out_a1 = pipe(meta_prompt=a, **kw)
    out_b = pipe(meta_prompt=b, **kw)
    out_a2 = pipe(meta_prompt=a, **kw)  # hits the _prepare cache
    assert not np.array_equal(out_a1.latents, out_b.latents)
    assert np.array_equal(out_a1.latents, out_a2.latents), (
        "cached spec for prompt A was corrupted by binding prompt B"
    )
    la = out_a1.spec.custom_losses[0][1]
    lb = out_b.spec.custom_losses[0][1]
    assert la.static_state() != lb.static_state()


def test_capture_eval_maps(pipe):
    """Per-refinement-slot map capture (reference dumps a PNG per token per
    loss evaluation, pipeline:237-246)."""
    out = pipe(
        meta_prompt="a [dog:.2,.3] x",
        seed=8,
        num_inference_steps=2,
        thresholds={0: 0.3},
        capture_eval_maps=True,
    )
    d = out.diagnostics
    assert d.eval_maps.shape[1:] == (12, 16, 16, 77)
    # slots recorded where eval_mask is set, and they differ across slots
    i = 0
    slots = np.where(d.eval_mask[i])[0]
    assert len(slots) >= 2
    m0 = d.eval_maps[i, slots[0]].astype(np.float32)
    m1 = d.eval_maps[i, slots[-1]].astype(np.float32)
    assert m0.max() > 0 and m1.max() > 0
    assert not np.array_equal(m0, m1)
    # default runs keep the dummy shape
    out2 = pipe(meta_prompt="a [dog:.2,.3] x", seed=8, num_inference_steps=2, thresholds={0: 0.3})
    assert out2.diagnostics.eval_maps.shape[1:] == (1, 1, 1, 1)


def test_attention_res_32_end_to_end():
    """attention_res=32 through spec, capture, losses, and the guided scan
    (the reference stores maps up to 32^2 pixels, ptp_utils.py:228, but its
    loss loops hardcode 16 — here the whole path generalizes)."""
    import dataclasses

    from guided_attention_tpu.models.configs import micro_config

    cfg = micro_config()
    cfg = dataclasses.replace(
        cfg,
        unet=dataclasses.replace(cfg.unet, sample_size=32),
        latent_size=32,
        image_size=256,
    )
    sd = StableDiffusion.from_config(cfg)
    pipe32 = GuidedAttentionPipeline(sd)
    out = pipe32(
        meta_prompt=META,
        seed=1,
        num_inference_steps=2,
        attention_res=32,
        thresholds={0: 0.5},
        decode=False,
    )
    d = out.diagnostics
    assert d.maps.shape == (2, 32, 32, 77)
    assert d.refine_iters[0] > 0
    assert np.isfinite(out.latents).all()
    assert out.spec.inside_mask.shape[1:] == (32, 32)


def test_eta_knob_end_to_end(pipe):
    """eta threads through runner -> GenStatics -> ddim_step: eta>0 changes
    the trajectory (stochastic variance added), stays finite/deterministic
    per seed, and eta=0 keeps the default program (same cached statics)."""
    kw = dict(meta_prompt="a dog and a cat", seed=3, num_inference_steps=4, run_standard_sd=True)
    base = pipe(**kw)
    zero = pipe(**kw, eta=0.0)
    np.testing.assert_array_equal(base.latents, zero.latents)
    stoch = pipe(**kw, eta=1.0)
    assert np.isfinite(stoch.latents).all()
    assert not np.array_equal(base.latents, stoch.latents)
    stoch2 = pipe(**kw, eta=1.0)
    np.testing.assert_array_equal(stoch.latents, stoch2.latents)


def test_capture_eval_latents_per_subiter(pipe):
    """Per-refinement-slot latents feed per-SUBiter pred_pre_optim artifacts
    (reference saves one per subiteration at diag>0, pipeline:517-535).

    recurse_steps=1 pins the slot-0 == step-entry identity; with recursion,
    the captured buffers come from the LAST executed re-noise pass (whose
    working latents went through renoise), matching which eval results the
    reference's final recursion leaves behind."""
    from guided_attention_tpu.config import HyperParams

    out = pipe(
        meta_prompt=META, seed=1, num_inference_steps=2, thresholds={0: 0.5},
        hp=HyperParams(recurse_steps=1), capture_eval_latents=True,
    )
    d = out.diagnostics
    assert d.eval_latents.shape == (2, 12, 16, 16, 4)  # [S, R_sub, h, w, C]
    slots = np.nonzero(d.eval_mask[0])[0]
    assert len(slots) >= 2  # eval0 + at least one refinement/final slot
    # slot 0 is eval0: its latent IS the step-entry latent (normal mode)
    np.testing.assert_array_equal(
        d.eval_latents[0, 0], d.latent_in[0].astype(np.float16)
    )
    # refinement updated the latent between slots
    assert not np.array_equal(d.eval_latents[0, slots[0]], d.eval_latents[0, slots[-1]])
    # default: unit placeholder (no buffer cost)
    out2 = pipe(meta_prompt=META, seed=1, num_inference_steps=2, thresholds={0: 0.5})
    assert out2.diagnostics.eval_latents.shape[1:] == (1, 1, 1, 1)


def test_dispatch_matches_call(pipe):
    """The async dispatch/result split is semantically identical to __call__
    (it only defers the device->host pull)."""
    kw = dict(meta_prompt=META, seed=4, num_inference_steps=2, thresholds={0: 0.5})
    # issue two dispatches back-to-back before pulling either (the CLI's
    # depth-2 pipelined sweep shape)
    p1 = pipe.dispatch(**kw)
    p2 = pipe.dispatch(meta_prompt=META, seed=5, num_inference_steps=2, thresholds={0: 0.5})
    out1, out2 = p1.result(), p2.result()
    serial = pipe(**kw)
    np.testing.assert_array_equal(out1.latents, serial.latents)
    np.testing.assert_array_equal(out1.images, serial.images)
    assert not np.array_equal(out1.latents, out2.latents)


def test_remat_guidance_eval_matches(pipe):
    """jax.checkpoint on the guidance eval changes memory scheduling only —
    the recomputed forward is the same math, so the trajectory matches."""
    kw = dict(meta_prompt=META, seed=6, num_inference_steps=2, thresholds={0: 0.5})
    base = pipe(**kw)
    remat = pipe(**kw, remat_guidance_eval=True)
    np.testing.assert_allclose(remat.latents, base.latents, atol=1e-4)


def test_n_evals_counter(guided_out):
    """StepDiag.n_evals counts every guidance fwd+bwd, cumulative over
    re-noise recursions (feeds runtime/flops.generation_flops — the MFU
    numerator must not undercount eval0/final or earlier recursions)."""
    d = guided_out.diagnostics
    # last recursion alone ran eval0 + refine_iters + final
    assert d.n_evals[0] >= d.refine_iters[0] + 2
    # 3 recursions ran; each executed at least one eval
    assert d.n_evals[0] >= d.recursions[0]
    assert (d.n_evals[1:] == 0).all()  # steps 1+ are inert under {0: thr}
