"""Model-variant coverage + torch golden parity (SURVEY.md §4)."""
import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp


def test_sd21_style_unet_path():
    """Exercise the SD2.1 architecture branches: linear projection
    transformers, per-block head counts, EOT-normalized guidance spec."""
    from guided_attention_tpu.models.clip import CLIPTextConfig, CLIPTextModel
    from guided_attention_tpu.models.unet import UNet2DCondition, UNetConfig

    cfg = UNetConfig(
        sample_size=16,
        block_out_channels=(32, 64, 64, 64),
        layers_per_block=1,
        cross_attention_dim=64,
        num_heads=(1, 2, 2, 2),  # per-block heads like SD2.1
        use_linear_projection=True,
        norm_num_groups=8,
        dtype=jnp.float32,
    )
    unet = UNet2DCondition(cfg)
    lat = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 77, 64))
    params = jax.jit(unet.init)(jax.random.PRNGKey(2), lat, jnp.int32(0), ctx)["params"]
    eps, aux = unet.apply(
        {"params": params}, lat, jnp.int32(500), ctx, capture=frozenset({("cross", 16)})
    )
    assert eps.shape == lat.shape
    assert len(aux["maps"]["up_cross"]) > 0
    # linear projection params exist (proj_in is a Dense kernel, 2-D)
    t2d = params["down_blocks_0_attentions_0"]
    assert t2d["proj_in"]["kernel"].ndim == 2

    # gelu text encoder variant
    clip = CLIPTextModel(
        CLIPTextConfig(hidden_size=64, num_layers=2, num_heads=2, intermediate_size=128, hidden_act="gelu")
    )
    ids = jnp.zeros((1, 77), jnp.int32)
    p = jax.jit(clip.init)(jax.random.PRNGKey(3), ids)["params"]
    h = clip.apply({"params": p}, ids)
    assert h.shape == (1, 77, 64)


def test_normalize_eot_valid_mask():
    """SD2.1 slices tokens [1:eot] instead of [1:-1] (pipeline:209-217)."""
    from guided_attention_tpu.annotation import parse_prompt
    from guided_attention_tpu.config import HyperParams
    from guided_attention_tpu.guidance.spec import build_guidance_spec
    from guided_attention_tpu.models.tokenizer import SimpleTokenizer

    tok = SimpleTokenizer()
    prompt, info, _ = parse_prompt("a [rat:.5,.5] runs")
    n_real = len(tok.encode(prompt))  # bos + 3 + eos = 5
    spec_sd1 = build_guidance_spec(tok, prompt, info, HyperParams(), normalize_eot=False)
    spec_sd2 = build_guidance_spec(tok, prompt, info, HyperParams(), normalize_eot=True)
    v1 = np.asarray(spec_sd1.valid_text)
    v2 = np.asarray(spec_sd2.valid_text)
    assert v1.sum() == 75  # [1:76]
    assert v2.sum() == n_real - 2  # [1:eot]
    assert not v2[n_real - 1]


def test_gaussian_smoothing_matches_torch_reference():
    """Golden parity vs a torch re-implementation of the reference's
    GaussianSmoothing module (gaussian_smoothing.py:21-71) with the
    reflect-pad call pattern (pipeline:251-254)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from guided_attention_tpu.guidance.smoothing import smooth_maps

    k, sigma = 3, 0.5
    grid = torch.arange(k, dtype=torch.float32)
    mean = (k - 1) / 2
    k1 = 1 / (sigma * np.sqrt(2 * np.pi)) * torch.exp(-(((grid - mean) / (2 * sigma)) ** 2))
    kernel = torch.outer(k1, k1)
    kernel = kernel / kernel.sum()
    weight = kernel.view(1, 1, k, k)

    rng = np.random.default_rng(0)
    img = rng.random((16, 16)).astype(np.float32)
    t = torch.from_numpy(img)[None, None]
    t = F.pad(t, (1, 1, 1, 1), mode="reflect")
    want = F.conv2d(t, weight).squeeze().numpy()

    got = np.asarray(smooth_maps(jnp.asarray(img)[None]))[0]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_timestep_embedding_matches_diffusers_formula():
    """Sinusoidal embedding vs a direct numpy port of diffusers'
    get_timestep_embedding(flip_sin_to_cos=True, shift=0)."""
    from guided_attention_tpu.models.unet import timestep_embedding

    dim, t = 32, 981
    half = dim // 2
    exponent = -np.log(10000.0) * np.arange(half) / half
    emb = t * np.exp(exponent)
    want = np.concatenate([np.cos(emb), np.sin(emb)])
    got = np.asarray(timestep_embedding(jnp.asarray([t]), dim))[0]
    # fp32 sin/cos at phases up to ~981 rad vs numpy f64
    np.testing.assert_allclose(got, want, atol=1e-4)
