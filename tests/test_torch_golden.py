"""Torch golden parity for the weight-conversion path (SURVEY.md §4).

Synthesizes a complete diffusers-format micro checkpoint ON DISK with the
REAL Stable Diffusion key names — including the awkward ones: UNet
``ff.net.0.proj`` / ``downsamplers.0.conv`` / ``time_embedding.linear_1``,
legacy diffusers-0.12 VAE attention names ``query/key/value/proj_attn/norm``
(the reference pins diffusers 0.12, environment/requirements.txt:7), CLIP
``text_model.encoder.layers.*`` + the ``position_ids`` buffer — then loads it
through ``StableDiffusion.create(checkpoint_dir=...)`` (the reference loads
these components via diffusers from_pretrained, reference run.py:18-29) and
golden-compares FULL component forwards (UNet, CLIP text encoder, VAE
decoder + encoder) against hand-rolled torch mirrors of the diffusers
modules run from the same tensors.
"""
import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from guided_attention_tpu.models.configs import micro_config  # noqa: E402

CFG = micro_config()
GEN = torch.Generator().manual_seed(0)


def _t(*shape):
    return (torch.randn(*shape, generator=GEN) * 0.05).float()


# ---------------------------------------------------------------------------
# checkpoint synthesis: real diffusers key names, torch tensor layouts
# ---------------------------------------------------------------------------

def _conv(sd, p, cout, cin, k=3):
    sd[f"{p}.weight"] = _t(cout, cin, k, k)
    sd[f"{p}.bias"] = _t(cout)


def _lin(sd, p, cout, cin, bias=True):
    sd[f"{p}.weight"] = _t(cout, cin)
    if bias:
        sd[f"{p}.bias"] = _t(cout)


def _norm(sd, p, c):
    sd[f"{p}.weight"] = 1.0 + _t(c)
    sd[f"{p}.bias"] = _t(c)


def _resnet(sd, p, cin, cout, temb_dim=None):
    _norm(sd, f"{p}.norm1", cin)
    _conv(sd, f"{p}.conv1", cout, cin)
    if temb_dim is not None:
        _lin(sd, f"{p}.time_emb_proj", cout, temb_dim)
    _norm(sd, f"{p}.norm2", cout)
    _conv(sd, f"{p}.conv2", cout, cout)
    if cin != cout:
        _conv(sd, f"{p}.conv_shortcut", cout, cin, k=1)


def _transformer(sd, p, c, ctx_dim, linear=False):
    _norm(sd, f"{p}.norm", c)
    if linear:  # SD2.1: use_linear_projection stores proj_in/out as Linear
        _lin(sd, f"{p}.proj_in", c, c)
    else:
        _conv(sd, f"{p}.proj_in", c, c, k=1)
    tb = f"{p}.transformer_blocks.0"
    for ln in ("norm1", "norm2", "norm3"):
        _norm(sd, f"{tb}.{ln}", c)
    for attn, kdim in (("attn1", c), ("attn2", ctx_dim)):
        _lin(sd, f"{tb}.{attn}.to_q", c, c, bias=False)
        _lin(sd, f"{tb}.{attn}.to_k", c, kdim, bias=False)
        _lin(sd, f"{tb}.{attn}.to_v", c, kdim, bias=False)
        _lin(sd, f"{tb}.{attn}.to_out.0", c, c)
    _lin(sd, f"{tb}.ff.net.0.proj", c * 8, c)
    _lin(sd, f"{tb}.ff.net.2", c, c * 4)
    if linear:
        _lin(sd, f"{p}.proj_out", c, c)
    else:
        _conv(sd, f"{p}.proj_out", c, c, k=1)


def make_unet_sd(linear=False):
    u = CFG.unet
    blocks, lpb, groups = u.block_out_channels, u.layers_per_block, u.norm_num_groups
    temb_dim = blocks[0] * 4
    sd = {}
    _lin(sd, "time_embedding.linear_1", temb_dim, blocks[0])
    _lin(sd, "time_embedding.linear_2", temb_dim, temb_dim)
    _conv(sd, "conv_in", blocks[0], u.in_channels)
    ch = blocks[0]
    skips = [ch]
    for i, out_ch in enumerate(blocks):
        for j in range(lpb):
            _resnet(sd, f"down_blocks.{i}.resnets.{j}", ch, out_ch, temb_dim)
            ch = out_ch
            if u.attn_down[i]:
                _transformer(sd, f"down_blocks.{i}.attentions.{j}", ch, u.cross_attention_dim, linear)
            skips.append(ch)
        if i != len(blocks) - 1:
            _conv(sd, f"down_blocks.{i}.downsamplers.0.conv", ch, ch)
            skips.append(ch)
    _resnet(sd, "mid_block.resnets.0", ch, ch, temb_dim)
    _transformer(sd, "mid_block.attentions.0", ch, u.cross_attention_dim, linear)
    _resnet(sd, "mid_block.resnets.1", ch, ch, temb_dim)
    rev_ch = list(reversed(blocks))
    rev_attn = list(reversed(u.attn_down))
    for i in range(len(blocks)):
        out_ch = rev_ch[i]
        for j in range(lpb + 1):
            _resnet(sd, f"up_blocks.{i}.resnets.{j}", ch + skips.pop(), out_ch, temb_dim)
            ch = out_ch
            if rev_attn[i]:
                _transformer(sd, f"up_blocks.{i}.attentions.{j}", ch, u.cross_attention_dim, linear)
        if i != len(blocks) - 1:
            _conv(sd, f"up_blocks.{i}.upsamplers.0.conv", ch, ch)
    _norm(sd, "conv_norm_out", ch)
    _conv(sd, "conv_out", u.out_channels, ch)
    return sd


def make_vae_sd():
    """Legacy (diffusers<=0.12) attention naming throughout."""
    v = CFG.vae
    blocks, lpb = v.block_out_channels, v.layers_per_block
    sd = {}
    # encoder
    _conv(sd, "encoder.conv_in", blocks[0], v.in_channels)
    ch = blocks[0]
    for i, out_ch in enumerate(blocks):
        for j in range(lpb):
            _resnet(sd, f"encoder.down_blocks.{i}.resnets.{j}", ch, out_ch)
            ch = out_ch
        if i != len(blocks) - 1:
            _conv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv", ch, ch)
    for pre in ("encoder", "decoder"):
        c = blocks[-1]
        _resnet(sd, f"{pre}.mid_block.resnets.0", c, c)
        a = f"{pre}.mid_block.attentions.0"
        _norm(sd, f"{a}.norm", c)  # legacy name for group_norm
        for leaf in ("query", "key", "value", "proj_attn"):
            _lin(sd, f"{a}.{leaf}", c, c)
        _resnet(sd, f"{pre}.mid_block.resnets.1", c, c)
    _norm(sd, "encoder.conv_norm_out", ch)
    _conv(sd, "encoder.conv_out", v.latent_channels * 2, ch)
    _conv(sd, "quant_conv", v.latent_channels * 2, v.latent_channels * 2, k=1)
    _conv(sd, "post_quant_conv", v.latent_channels, v.latent_channels, k=1)
    # decoder
    rev = list(reversed(blocks))
    _conv(sd, "decoder.conv_in", rev[0], v.latent_channels)
    ch = rev[0]
    for i, out_ch in enumerate(rev):
        for j in range(lpb + 1):
            _resnet(sd, f"decoder.up_blocks.{i}.resnets.{j}", ch, out_ch)
            ch = out_ch
        if i != len(rev) - 1:
            _conv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv", ch, ch)
    _norm(sd, "decoder.conv_norm_out", ch)
    _conv(sd, "decoder.conv_out", v.out_channels, ch)
    return sd


def make_clip_sd():
    c = CFG.clip
    sd = {}
    sd["text_model.embeddings.token_embedding.weight"] = _t(c.vocab_size, c.hidden_size)
    sd["text_model.embeddings.position_embedding.weight"] = _t(
        c.max_position_embeddings, c.hidden_size
    )
    # buffer present in real checkpoints; must be tolerated, not mapped
    sd["text_model.embeddings.position_ids"] = torch.arange(c.max_position_embeddings)[None]
    for l in range(c.num_layers):
        p = f"text_model.encoder.layers.{l}"
        _norm(sd, f"{p}.layer_norm1", c.hidden_size)
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _lin(sd, f"{p}.self_attn.{proj}", c.hidden_size, c.hidden_size)
        _norm(sd, f"{p}.layer_norm2", c.hidden_size)
        _lin(sd, f"{p}.mlp.fc1", c.intermediate_size, c.hidden_size)
        _lin(sd, f"{p}.mlp.fc2", c.hidden_size, c.intermediate_size)
    _norm(sd, "text_model.final_layer_norm", c.hidden_size)
    return sd


# ---------------------------------------------------------------------------
# hand-rolled torch mirrors of the diffusers module forwards (NCHW)
# ---------------------------------------------------------------------------

def t_gn(sd, p, x, groups, eps):
    return F.group_norm(x, groups, sd[f"{p}.weight"], sd[f"{p}.bias"], eps)


def t_conv(sd, p, x, stride=1, pad=1):
    return F.conv2d(x, sd[f"{p}.weight"], sd[f"{p}.bias"], stride=stride, padding=pad)


def t_lin(sd, p, x):
    return F.linear(x, sd[f"{p}.weight"], sd.get(f"{p}.bias"))


def t_ln(sd, p, x, eps=1e-5):
    return F.layer_norm(x, (x.shape[-1],), sd[f"{p}.weight"], sd[f"{p}.bias"], eps)


def t_resnet(sd, p, x, temb, groups, eps):
    h = t_conv(sd, f"{p}.conv1", F.silu(t_gn(sd, f"{p}.norm1", x, groups, eps)))
    if temb is not None:
        h = h + t_lin(sd, f"{p}.time_emb_proj", F.silu(temb))[:, :, None, None]
    h = t_conv(sd, f"{p}.conv2", F.silu(t_gn(sd, f"{p}.norm2", h, groups, eps)))
    if f"{p}.conv_shortcut.weight" in sd:
        x = t_conv(sd, f"{p}.conv_shortcut", x, pad=0)
    return x + h


def t_mha(sd, p, x, ctx, heads):
    q, k, v = t_lin(sd, f"{p}.to_q", x), t_lin(sd, f"{p}.to_k", ctx), t_lin(sd, f"{p}.to_v", ctx)
    B, N, C = q.shape
    hd = C // heads

    def sh(t):
        return t.view(B, -1, heads, hd).transpose(1, 2)

    probs = torch.softmax(sh(q) @ sh(k).transpose(-1, -2) / math.sqrt(hd), dim=-1)
    out = (probs @ sh(v)).transpose(1, 2).reshape(B, N, C)
    return t_lin(sd, f"{p}.to_out.0", out)


def t_transformer(sd, p, x, ctx, heads, groups):
    B, C, H, W = x.shape
    res = x
    h = t_conv(sd, f"{p}.proj_in", t_gn(sd, f"{p}.norm", x, groups, 1e-6), pad=0)
    h = h.permute(0, 2, 3, 1).reshape(B, H * W, C)
    tb = f"{p}.transformer_blocks.0"
    hn = t_ln(sd, f"{tb}.norm1", h)
    h = h + t_mha(sd, f"{tb}.attn1", hn, hn, heads)
    h = h + t_mha(sd, f"{tb}.attn2", t_ln(sd, f"{tb}.norm2", h), ctx, heads)
    a, g = t_lin(sd, f"{tb}.ff.net.0.proj", t_ln(sd, f"{tb}.norm3", h)).chunk(2, -1)
    h = h + t_lin(sd, f"{tb}.ff.net.2", a * F.gelu(g))
    h = h.reshape(B, H, W, C).permute(0, 3, 1, 2)
    return t_conv(sd, f"{p}.proj_out", h, pad=0) + res


def t_timestep_embedding(t, dim):
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half
    emb = t.float()[:, None] * torch.exp(exponent)[None]
    return torch.cat([torch.cos(emb), torch.sin(emb)], dim=-1)  # flip_sin_to_cos


def t_unet(sd, x, t, ctx):
    u = CFG.unet
    blocks, lpb, groups = u.block_out_channels, u.layers_per_block, u.norm_num_groups
    temb = t_timestep_embedding(t, blocks[0])
    temb = t_lin(sd, "time_embedding.linear_2", F.silu(t_lin(sd, "time_embedding.linear_1", temb)))
    h = t_conv(sd, "conv_in", x)
    skips = [h]
    for i in range(len(blocks)):
        for j in range(lpb):
            h = t_resnet(sd, f"down_blocks.{i}.resnets.{j}", h, temb, groups, 1e-5)
            if u.attn_down[i]:
                h = t_transformer(sd, f"down_blocks.{i}.attentions.{j}", h, ctx, u.num_heads[i], groups)
            skips.append(h)
        if i != len(blocks) - 1:
            h = t_conv(sd, f"down_blocks.{i}.downsamplers.0.conv", h, stride=2)
            skips.append(h)
    h = t_resnet(sd, "mid_block.resnets.0", h, temb, groups, 1e-5)
    h = t_transformer(sd, "mid_block.attentions.0", h, ctx, u.num_heads[-1], groups)
    h = t_resnet(sd, "mid_block.resnets.1", h, temb, groups, 1e-5)
    rev_attn = list(reversed(u.attn_down))
    rev_heads = list(reversed(u.num_heads))
    for i in range(len(blocks)):
        for j in range(lpb + 1):
            h = torch.cat([h, skips.pop()], dim=1)
            h = t_resnet(sd, f"up_blocks.{i}.resnets.{j}", h, temb, groups, 1e-5)
            if rev_attn[i]:
                h = t_transformer(sd, f"up_blocks.{i}.attentions.{j}", h, ctx, rev_heads[i], groups)
        if i != len(blocks) - 1:
            h = F.interpolate(h, scale_factor=2, mode="nearest")
            h = t_conv(sd, f"up_blocks.{i}.upsamplers.0.conv", h)
    h = F.silu(t_gn(sd, "conv_norm_out", h, groups, 1e-5))
    return t_conv(sd, "conv_out", h)


def t_vae_attn(sd, p, x, groups):
    B, C, H, W = x.shape
    h = t_gn(sd, f"{p}.norm", x, groups, 1e-6)
    h = h.reshape(B, C, H * W).transpose(1, 2)
    q, k, v = t_lin(sd, f"{p}.query", h), t_lin(sd, f"{p}.key", h), t_lin(sd, f"{p}.value", h)
    probs = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(C), dim=-1)
    h = t_lin(sd, f"{p}.proj_attn", probs @ v)
    return x + h.transpose(1, 2).reshape(B, C, H, W)


def t_vae_decoder(sd, z):
    v = CFG.vae
    groups = v.norm_num_groups
    rev = list(reversed(v.block_out_channels))
    h = t_conv(sd, "post_quant_conv", z, pad=0)
    h = t_conv(sd, "decoder.conv_in", h)
    h = t_resnet(sd, "decoder.mid_block.resnets.0", h, None, groups, 1e-6)
    h = t_vae_attn(sd, "decoder.mid_block.attentions.0", h, groups)
    h = t_resnet(sd, "decoder.mid_block.resnets.1", h, None, groups, 1e-6)
    for i in range(len(rev)):
        for j in range(v.layers_per_block + 1):
            h = t_resnet(sd, f"decoder.up_blocks.{i}.resnets.{j}", h, None, groups, 1e-6)
        if i != len(rev) - 1:
            h = F.interpolate(h, scale_factor=2, mode="nearest")
            h = t_conv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv", h)
    h = F.silu(t_gn(sd, "decoder.conv_norm_out", h, groups, 1e-6))
    return t_conv(sd, "decoder.conv_out", h)


def t_vae_encoder(sd, x):
    v = CFG.vae
    groups = v.norm_num_groups
    h = t_conv(sd, "encoder.conv_in", x)
    for i in range(len(v.block_out_channels)):
        for j in range(v.layers_per_block):
            h = t_resnet(sd, f"encoder.down_blocks.{i}.resnets.{j}", h, None, groups, 1e-6)
        if i != len(v.block_out_channels) - 1:
            h = F.pad(h, (0, 1, 0, 1))  # diffusers asymmetric downsample pad
            h = t_conv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv", h, stride=2, pad=0)
    h = t_resnet(sd, "encoder.mid_block.resnets.0", h, None, groups, 1e-6)
    h = t_vae_attn(sd, "encoder.mid_block.attentions.0", h, groups)
    h = t_resnet(sd, "encoder.mid_block.resnets.1", h, None, groups, 1e-6)
    h = F.silu(t_gn(sd, "encoder.conv_norm_out", h, groups, 1e-6))
    h = t_conv(sd, "encoder.conv_out", h)
    return t_conv(sd, "quant_conv", h, pad=0)


def t_clip(sd, ids):
    c = CFG.clip
    n = ids.shape[-1]
    x = F.embedding(ids, sd["text_model.embeddings.token_embedding.weight"])
    x = x + sd["text_model.embeddings.position_embedding.weight"][:n][None]
    causal = torch.triu(torch.full((n, n), float("-inf")), diagonal=1)
    hd = c.hidden_size // c.num_heads
    for l in range(c.num_layers):
        p = f"text_model.encoder.layers.{l}"
        h = t_ln(sd, f"{p}.layer_norm1", x)
        B, N, C = h.shape

        def sh(t):
            return t.view(B, N, c.num_heads, hd).transpose(1, 2)

        q = sh(t_lin(sd, f"{p}.self_attn.q_proj", h)) * hd**-0.5
        k = sh(t_lin(sd, f"{p}.self_attn.k_proj", h))
        v = sh(t_lin(sd, f"{p}.self_attn.v_proj", h))
        probs = torch.softmax(q @ k.transpose(-1, -2) + causal[None, None], dim=-1)
        attn = (probs @ v).transpose(1, 2).reshape(B, N, C)
        x = x + t_lin(sd, f"{p}.self_attn.out_proj", attn)
        h = t_ln(sd, f"{p}.layer_norm2", x)
        h = t_lin(sd, f"{p}.mlp.fc1", h)
        h = h * torch.sigmoid(1.702 * h)  # quick_gelu
        x = x + t_lin(sd, f"{p}.mlp.fc2", h)
    return t_ln(sd, "text_model.final_layer_norm", x)


# ---------------------------------------------------------------------------
# the test
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    root = tmp_path_factory.mktemp("sd_ckpt")
    sds = {"unet": make_unet_sd(), "vae": make_vae_sd(), "text_encoder": make_clip_sd()}
    for sub, sd in sds.items():
        d = root / sub
        d.mkdir()
        fname = "diffusion_pytorch_model.bin" if sub != "text_encoder" else "pytorch_model.bin"
        torch.save(sd, d / fname)

    from guided_attention_tpu.models.bundle import StableDiffusion

    bundle = StableDiffusion.create("micro", dtype=jnp.float32, checkpoint_dir=str(root))
    return bundle, sds


def test_unet_forward_matches_torch(converted):
    bundle, sds = converted
    sd = sds["unet"]
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 4, 16, 16)).astype(np.float32)
    ctx = rng.standard_normal((1, 77, CFG.unet.cross_attention_dim)).astype(np.float32)
    t = 501
    want = t_unet(sd, torch.from_numpy(x), torch.tensor([t]), torch.from_numpy(ctx)).numpy()
    got, _ = bundle.unet.apply(
        {"params": bundle.params["unet"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.int32(t),
        jnp.asarray(ctx),
    )
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_clip_forward_matches_torch(converted):
    bundle, sds = converted
    sd = sds["text_encoder"]
    rng = np.random.default_rng(1)
    ids = rng.integers(0, CFG.clip.vocab_size, size=(2, 77))
    want = t_clip(sd, torch.from_numpy(ids)).numpy()
    got = np.asarray(
        bundle.text_encoder.apply({"params": bundle.params["text_encoder"]}, jnp.asarray(ids, jnp.int32))
    )
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_vae_decoder_matches_torch(converted):
    bundle, sds = converted
    sd = sds["vae"]
    rng = np.random.default_rng(2)
    z = rng.standard_normal((1, 4, 8, 8)).astype(np.float32)
    want = t_vae_decoder(sd, torch.from_numpy(z)).numpy()
    from guided_attention_tpu.models.vae import AutoencoderKL

    got = bundle.vae.apply(
        {"params": bundle.params["vae"]},
        jnp.asarray(z.transpose(0, 2, 3, 1)),
        method=AutoencoderKL.decode,
    )
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_safetensors_load_path(converted, tmp_path):
    """The safetensors branch of _load_state_dict yields the same params as
    the torch.bin branch (safetensors is the preferred format on disk)."""
    safetensors = pytest.importorskip("safetensors")
    from safetensors.numpy import save_file

    bundle, sds = converted
    sd = {k: v.numpy() for k, v in sds["unet"].items()}
    d = tmp_path / "unet"
    d.mkdir()
    save_file(sd, d / "diffusion_pytorch_model.safetensors")

    from guided_attention_tpu.models.convert import load_component_params

    params = load_component_params(str(tmp_path), "unet", bundle.params["unet"])
    got = jax.tree_util.tree_leaves(params)
    want = jax.tree_util.tree_leaves(bundle.params["unet"])
    assert all(np.array_equal(a, b) for a, b in zip(got, want))


def test_convert_cli_to_native_checkpoint(converted, tmp_path_factory, tmp_path):
    """python -m guided_attention_tpu.models.convert <hf> <out> writes a
    native msgpack checkpoint that loads back identical params."""
    bundle, _sds = converted
    # the module-scoped fixture wrote the checkpoint under tmp_path_factory;
    # recover it from any component subfolder's parent
    import glob
    from pathlib import Path

    hits = glob.glob(str(tmp_path_factory.getbasetemp() / "sd_ckpt*" / "unet"))
    assert hits
    hf_dir = str(Path(hits[0]).parent)

    from guided_attention_tpu.models import convert as convert_mod
    from guided_attention_tpu.models.bundle import StableDiffusion
    from guided_attention_tpu.models.io import is_native_checkpoint

    out_dir = tmp_path / "native"
    convert_mod.main([hf_dir, str(out_dir), "--model", "micro", "--dtype", "float32"])
    assert is_native_checkpoint(str(out_dir))
    reloaded = StableDiffusion.create("micro", dtype=jnp.float32, checkpoint_dir=str(out_dir))
    a = jax.tree_util.tree_leaves(bundle.params)
    b = jax.tree_util.tree_leaves(reloaded.params)
    assert all(np.array_equal(x, y) for x, y in zip(a, b))


def test_vae_encoder_matches_torch(converted):
    bundle, sds = converted
    sd = sds["vae"]
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    want = t_vae_encoder(sd, torch.from_numpy(x)).numpy()
    from guided_attention_tpu.models.vae import AutoencoderKL

    mean, logvar = bundle.vae.apply(
        {"params": bundle.params["vae"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        method=AutoencoderKL.encode,
    )
    got = np.concatenate(
        [np.asarray(mean).transpose(0, 3, 1, 2), np.asarray(logvar).transpose(0, 3, 1, 2)], axis=1
    )
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_sd21_linear_projection_conversion():
    """SD2.1's use_linear_projection stores Transformer2D proj_in/proj_out as
    Linear [out, in] instead of 1x1 Conv [out, in, 1, 1]; the converter must
    map both layouts (reference --sd_2_1, run.py:21-29)."""
    import dataclasses

    import jax

    from guided_attention_tpu.models.convert import convert_state_dict
    from guided_attention_tpu.models.unet import UNet2DCondition

    ucfg = dataclasses.replace(CFG.unet, use_linear_projection=True)
    unet = UNet2DCondition(ucfg)
    latents = jnp.zeros((1, ucfg.sample_size, ucfg.sample_size, ucfg.in_channels))
    ctx = jnp.zeros((1, 77, ucfg.cross_attention_dim))
    params = jax.jit(unet.init)(jax.random.PRNGKey(0), latents, jnp.int32(0), ctx)["params"]

    sd = {k: v.numpy() for k, v in make_unet_sd(linear=True).items()}
    got = convert_state_dict(sd, params, "unet")

    w = sd["down_blocks.0.attentions.0.proj_in.weight"]  # [out, in]
    k = np.asarray(got["down_blocks_0_attentions_0"]["proj_in"]["kernel"])
    assert k.shape == (w.shape[1], w.shape[0])
    np.testing.assert_allclose(k, w.T, rtol=1e-6)
    # forward runs at converted weights
    eps, _ = jax.jit(lambda p, x, c: unet.apply({"params": p}, x, jnp.int32(3), c))(
        got, latents, ctx
    )
    assert np.isfinite(np.asarray(eps)).all()
