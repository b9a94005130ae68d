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
