"""Flax AutoencoderKL (Stable Diffusion VAE), decoder + encoder.

The reference uses diffusers' AutoencoderKL only to decode final/diagnostic
latents (reference pipeline_guided_attention.py:1060, 1114-1123). We
implement both directions from scratch: the decoder is on the hot path of
every generation and of per-step x0-pred diagnostics; the encoder completes
the component inventory (img2img-style entry points).

Architecture (SD v1/v2 share it): block_out_channels (128, 256, 512, 512),
layers_per_block 2, GroupNorm(32, eps 1e-6), single-head mid attention,
scaling_factor 0.18215.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215
    dtype: Any = jnp.float32


class VAEResnet(nn.Module):
    out_channels: int
    groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = nn.GroupNorm(self.groups, epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = nn.GroupNorm(self.groups, epsilon=1e-6, dtype=jnp.float32, name="norm2")(h)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class VAEAttention(nn.Module):
    """Single-head spatial self-attention in the VAE mid block."""

    channels: int
    groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, hgt, wdt, c = x.shape
        h = nn.GroupNorm(self.groups, epsilon=1e-6, dtype=jnp.float32, name="group_norm")(x)
        h = h.reshape(b, hgt * wdt, c).astype(self.dtype)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(h)
        scores = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(jnp.float32(c))
        probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        h = jnp.einsum("bqk,bkc->bqc", probs, v, preferred_element_type=jnp.float32).astype(self.dtype)
        h = nn.Dense(c, dtype=self.dtype, name="to_out_0")(h)
        return x + h.reshape(b, hgt, wdt, c)


class Decoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        dtype = cfg.dtype
        ch = list(reversed(cfg.block_out_channels))  # (512, 512, 256, 128)
        h = nn.Conv(ch[0], (3, 3), padding=1, dtype=dtype, name="conv_in")(z.astype(dtype))
        h = VAEResnet(ch[0], cfg.norm_num_groups, dtype, name="mid_block_resnets_0")(h)
        h = VAEAttention(ch[0], cfg.norm_num_groups, dtype, name="mid_block_attentions_0")(h)
        h = VAEResnet(ch[0], cfg.norm_num_groups, dtype, name="mid_block_resnets_1")(h)
        for i, out_ch in enumerate(ch):
            for j in range(cfg.layers_per_block + 1):
                h = VAEResnet(out_ch, cfg.norm_num_groups, dtype, name=f"up_blocks_{i}_resnets_{j}")(h)
            if i != len(ch) - 1:
                b, hh, ww, c = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, c), method="nearest")
                h = nn.Conv(out_ch, (3, 3), padding=1, dtype=dtype, name=f"up_blocks_{i}_upsamplers_0_conv")(h)
        h = nn.GroupNorm(cfg.norm_num_groups, epsilon=1e-6, dtype=jnp.float32, name="conv_norm_out")(h)
        h = nn.silu(h).astype(dtype)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=dtype, name="conv_out")(h)


class Encoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        dtype = cfg.dtype
        ch = cfg.block_out_channels
        h = nn.Conv(ch[0], (3, 3), padding=1, dtype=dtype, name="conv_in")(x.astype(dtype))
        for i, out_ch in enumerate(ch):
            for j in range(cfg.layers_per_block):
                h = VAEResnet(out_ch, cfg.norm_num_groups, dtype, name=f"down_blocks_{i}_resnets_{j}")(h)
            if i != len(ch) - 1:
                # diffusers pads asymmetrically ((0,1),(0,1)) before stride-2
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(
                    out_ch, (3, 3), strides=(2, 2), padding="VALID", dtype=dtype,
                    name=f"down_blocks_{i}_downsamplers_0_conv",
                )(h)
        h = VAEResnet(ch[-1], cfg.norm_num_groups, dtype, name="mid_block_resnets_0")(h)
        h = VAEAttention(ch[-1], cfg.norm_num_groups, dtype, name="mid_block_attentions_0")(h)
        h = VAEResnet(ch[-1], cfg.norm_num_groups, dtype, name="mid_block_resnets_1")(h)
        h = nn.GroupNorm(cfg.norm_num_groups, epsilon=1e-6, dtype=jnp.float32, name="conv_norm_out")(h)
        h = nn.silu(h).astype(dtype)
        return nn.Conv(cfg.latent_channels * 2, (3, 3), padding=1, dtype=dtype, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    """decode(z) and encode(x); NHWC throughout."""

    config: VAEConfig

    def setup(self):
        cfg = self.config
        self.decoder = Decoder(cfg, name="decoder")
        self.encoder = Encoder(cfg, name="encoder")
        self.post_quant_conv = nn.Conv(
            cfg.latent_channels, (1, 1), dtype=cfg.dtype, name="post_quant_conv"
        )
        self.quant_conv = nn.Conv(
            cfg.latent_channels * 2, (1, 1), dtype=cfg.dtype, name="quant_conv"
        )

    def decode(self, z):
        """z: unscaled latents [B, h, w, 4] -> image [B, 8h, 8w, 3] in [-1, 1]."""
        return self.decoder(self.post_quant_conv(z.astype(self.config.dtype)))

    def encode(self, x):
        """image [-1,1] -> (mean, logvar) of the latent posterior."""
        h = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(h, 2, axis=-1)
        return mean, logvar

    def __call__(self, z):
        return self.decode(z)


def latents_to_images(decoded: jax.Array) -> jax.Array:
    """[-1,1] NHWC -> [0,1] float images (reference decode_latents postproc)."""
    return jnp.clip(decoded / 2.0 + 0.5, 0.0, 1.0)
