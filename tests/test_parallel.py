"""Sharded multi-seed batch engine on the 8-device CPU mesh."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from guided_attention_tpu.models.bundle import StableDiffusion
from guided_attention_tpu.parallel.mesh import make_mesh, param_shardings, DEFAULT_TP_RULES
from guided_attention_tpu.runner import GuidedAttentionPipeline


@pytest.fixture(scope="module")
def pipe():
    sd = StableDiffusion.create("micro", dtype=jnp.float32)
    return GuidedAttentionPipeline(sd)


def test_mesh_and_tp_rules(pipe):
    mesh = make_mesh({"data": 4, "tensor": 2})
    assert mesh.shape == {"data": 4, "tensor": 2}
    sh = param_shardings(pipe.sd.params["unet"], mesh, DEFAULT_TP_RULES)
    # a qkv projection is tensor-sharded, a conv kernel replicated
    flat = jax.tree_util.tree_leaves_with_path(sh)
    qkv = [s for p, s in flat if "attn1" in str(p) and "to_q" in str(p)]
    conv = [s for p, s in flat if "conv1" in str(p)]
    assert qkv and any("tensor" in str(s.spec) for s in qkv)
    assert conv and all(s.spec == jax.sharding.PartitionSpec() for s in conv)


def test_batch_matches_single_standard_sd(pipe):
    mesh = make_mesh({"data": 4})
    outs = pipe.generate_batch(
        [1, 2, 3, 4], meta_prompt="a dog", mesh=mesh, num_inference_steps=2, run_standard_sd=True
    )
    assert len(outs) == 4
    # decode is ONE batched dispatch; each output still carries [1,H,W,3]
    for o in outs:
        assert o.images.shape == (1, 128, 128, 3)
        assert np.isfinite(o.images).all()
    assert not np.array_equal(outs[0].images, outs[1].images)
    single = pipe(meta_prompt="a dog", seed=1, num_inference_steps=2, run_standard_sd=True)
    np.testing.assert_allclose(outs[0].latents, single.latents, atol=1e-4)
    assert not np.array_equal(outs[0].latents, outs[1].latents)


def test_multihost_helpers_single_process():
    """Single-process semantics of the multi-host wrappers (the multi-process
    side is jax.distributed + process_allgather, exercised only on real
    pods; here we pin the no-op contracts and the sharded-array path)."""
    from guided_attention_tpu.parallel import multihost

    multihost.initialize(None, None, None)  # must not touch jax.distributed
    multihost.initialize("127.0.0.1:1234", 1, 0)  # num_processes<=1: no-op
    assert multihost.is_primary()
    assert multihost.local_batch_slice(8) == slice(0, 8)

    mesh = make_mesh({"data": 8})
    x = jnp.arange(16.0).reshape(8, 2)
    sharded = jax.device_put(x, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data")))
    np.testing.assert_array_equal(multihost.to_host(sharded), np.asarray(x))


@pytest.mark.parametrize("shape", [{"data": 2, "tensor": 2}, {"data": 2, "tensor": 4}], ids=["tp2", "tp4"])
def test_batch_guided_over_dp_tp_mesh(pipe, shape):
    mesh = make_mesh(shape)
    outs = pipe.generate_batch(
        [5, 6], meta_prompt="a [dog:.2,.3] x", mesh=mesh, num_inference_steps=2, thresholds={0: 0.5}
    )
    for o in outs:
        assert np.isfinite(o.latents).all()
        assert o.diagnostics.refine_iters[0] > 0  # guidance ran per sample
    assert not np.array_equal(outs[0].latents, outs[1].latents)


def test_tp_matches_single_device_standard_sd(pipe):
    """Tensor-parallel equivalence, not just finiteness (round-2 verdict):
    the Megatron TP rules must reproduce the single-device result."""
    single = pipe(meta_prompt="a dog", seed=9, num_inference_steps=2, run_standard_sd=True)
    tp = pipe.generate_batch(
        [9], meta_prompt="a dog", mesh=make_mesh({"data": 1, "tensor": 2}),
        num_inference_steps=2, run_standard_sd=True,
    )
    np.testing.assert_allclose(tp[0].latents, single.latents, atol=1e-4)


def test_tp_matches_dp_guided(pipe):
    """Guided 2-step trajectory under tp2 vs the dp-only batch engine.
    Guidance amplifies float-level reduction-order differences through the
    threshold branches, hence the looser tolerance."""
    kw = dict(meta_prompt="a [dog:.2,.3] x", num_inference_steps=2, thresholds={0: 0.5})
    dp = pipe.generate_batch([5], mesh=make_mesh({"data": 1}), **kw)
    tp = pipe.generate_batch([5], mesh=make_mesh({"data": 1, "tensor": 2}), **kw)
    assert tp[0].diagnostics.refine_iters[0] > 0
    np.testing.assert_allclose(tp[0].latents, dp[0].latents, atol=5e-3)


def test_multi_prompt_batch_matches_singles(pipe):
    """BASELINE config 5 'multi-prompt generation': per-sample prompts in one
    sharded program; each sample must match its own single-sample run."""
    mesh = make_mesh({"data": 4})
    prompts = ["a dog", "a dog", "a cat", "a cat"]
    outs = pipe.generate_batch(
        [1, 2, 1, 2], meta_prompts=prompts, mesh=mesh,
        num_inference_steps=2, run_standard_sd=True,
    )
    assert [o.prompt for o in outs] == prompts
    single_dog = pipe(meta_prompt="a dog", seed=1, num_inference_steps=2, run_standard_sd=True)
    single_cat = pipe(meta_prompt="a cat", seed=1, num_inference_steps=2, run_standard_sd=True)
    np.testing.assert_allclose(outs[0].latents, single_dog.latents, atol=1e-4)
    np.testing.assert_allclose(outs[2].latents, single_cat.latents, atol=1e-4)
    # same seed, different prompt -> different image
    assert not np.array_equal(outs[0].latents, outs[2].latents)
    # same prompt, different seed -> different image
    assert not np.array_equal(outs[0].latents, outs[1].latents)


def test_multi_prompt_batch_guided(pipe):
    """Guided multi-prompt: per-prompt specs (different BOX geometry) steer
    each sample independently inside the one compiled program."""
    mesh = make_mesh({"data": 2})
    outs = pipe.generate_batch(
        [5, 5],
        meta_prompts=["a [dog:.1,.1,.3,.3] x", "a [dog:.6,.6,.3,.3] x"],
        mesh=mesh, num_inference_steps=2, thresholds={0: 0.5},
    )
    for o in outs:
        assert np.isfinite(o.latents).all()
        assert o.diagnostics.refine_iters[0] > 0
    # same seed, different target geometry -> different trajectories
    assert not np.array_equal(outs[0].latents, outs[1].latents)
    # per-output metadata is per-prompt
    assert outs[0].annotations[0].target != outs[1].annotations[0].target


def test_dispatch_batch_pipelines(pipe):
    """Depth-2 batch pipelining: two chunks issued before either is pulled
    must equal the blocking generate_batch results (the sharded in-mesh VAE
    decode and the single batched pull happen in PendingBatch.result())."""
    mesh = make_mesh({"data": 2})
    kw = dict(meta_prompt="a dog", mesh=mesh, num_inference_steps=2, run_standard_sd=True)
    ref = pipe.generate_batch([1, 2], **kw) + pipe.generate_batch([3, 4], **kw)
    p1 = pipe.dispatch_batch([1, 2], **kw)
    p2 = pipe.dispatch_batch([3, 4], **kw)
    outs = p1.result() + p2.result()
    for o, r in zip(outs, ref):
        np.testing.assert_array_equal(np.asarray(o.latents), np.asarray(r.latents))
        np.testing.assert_array_equal(o.images, r.images)


def test_multi_prompt_batch_misuse_errors(pipe):
    with pytest.raises(TypeError):
        pipe.generate_batch([1], meta_prompt="a dog", meta_prompts=["a dog"])
    with pytest.raises(ValueError):
        pipe.generate_batch([1, 2], meta_prompts=["a dog"])
    with pytest.raises(ValueError):  # group-structure mismatch: 1 vs 2 groups
        pipe.generate_batch(
            [1, 2],
            meta_prompts=["a [dog:.2,.3] x", "a [dog:.2,.3] and a [cat:.6,.6] x"],
            num_inference_steps=2,
        )


def test_multi_prompt_batch_custom_losses(pipe):
    """Identical custom-loss bindings across prompts batch fine (the bound
    instances are per-spec deepcopies compared by CustomLossBase.__eq__ /
    static_state, custom.py:51); differing bound args are rejected."""
    mp1 = "a [cat:.1,.3,.3,.4] and a [dog:.6,.3,.3,.4] [CustomLoss:toLeftOf (cat,dog)]"
    mp2 = "a [cat:.2,.4,.3,.4] and a [dog:.5,.2,.3,.4] [CustomLoss:toLeftOf (cat,dog)]"
    outs = pipe.generate_batch(
        [1, 2], meta_prompts=[mp1, mp2],
        num_inference_steps=2, max_iter_to_alter=1, thresholds={0: 0.1},
        capture_diagnostics=False, decode=False,
    )
    assert all(np.isfinite(o.latents).all() for o in outs)
    # reversed operand order -> different bound token indices -> rejected
    mp3 = "a [cat:.1,.3,.3,.4] and a [dog:.6,.3,.3,.4] [CustomLoss:toLeftOf (dog,cat)]"
    with pytest.raises(ValueError, match="custom-loss bindings"):
        pipe.generate_batch(
            [1, 2], meta_prompts=[mp1, mp3],
            num_inference_steps=2, max_iter_to_alter=1, thresholds={0: 0.1},
            capture_diagnostics=False, decode=False,
        )


def test_multi_prompt_stack_cache(pipe):
    """Repeated prompt sets reuse the stacked (spec, emb) device arrays —
    the ~10 eager jnp.stack dispatches cost a tunnel roundtrip each on
    remote TPUs, so a server or chunked sweep must pay them once."""
    prompts = ["a [dog:.1,.1,.3,.3] x", "a [dog:.6,.6,.3,.3] x"]
    kw = dict(num_inference_steps=2, thresholds={0: 0.5},
              capture_diagnostics=False, decode=False)
    pipe._stack_cache.clear()
    first = pipe.generate_batch([5, 6], meta_prompts=prompts, **kw)
    assert len(pipe._stack_cache) == 1
    key = next(iter(pipe._stack_cache))
    spec_obj = pipe._stack_cache[key][0]
    second = pipe.generate_batch([5, 6], meta_prompts=prompts, **kw)
    assert pipe._stack_cache[key][0] is spec_obj  # reused, not rebuilt
    for a, b in zip(first, second):
        np.testing.assert_array_equal(np.asarray(a.latents), np.asarray(b.latents))
