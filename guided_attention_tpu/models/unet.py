"""Flax UNet2DCondition with pure-output attention-map capture.

A from-scratch TPU-native UNet matching the Stable Diffusion 1.x / 2.1
architectures (the reference drives diffusers' UNet2DConditionModel through
a re-implemented forward, reference pipeline_guided_attention.py:583-743).
Differences by design:

  * ``apply`` returns ``(noise_pred, aux)`` where ``aux["maps"]`` holds the
    head-averaged cross/self attention probability maps for every layer
    selected by the static ``capture`` spec — the functional replacement for
    register_attention_control + AttentionStore (reference
    utils/ptp_utils.py:149-175, 219-270).
  * ``aux["deep"]`` is the bottleneck residual (down_block_res_samples[-1]);
    passing ``deep_inject`` replaces it, enabling deep-feature-space
    optimization (reference pipeline_guided_attention.py:693-706).
  * paint-with-words score biasing enters as precomputed masks + a per-step
    gate scalar (reference ptp_utils.py:97-146 builds the mask per call in
    Python loops).

Param-tree naming mirrors diffusers checkpoint paths (list containers
flattened as ``name_{i}``) so weight conversion is mechanical.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, FrozenSet, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from guided_attention_tpu.ops.attention import attention

# (kind, resolution) pairs, kind in {"cross", "self"}
CaptureSpec = FrozenSet[Tuple[str, int]]
EMPTY_CAPTURE: CaptureSpec = frozenset()


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    sample_size: int = 64
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    # number of attention heads per block level (SD1.x: 8 everywhere;
    # SD2.1: (5, 10, 20, 20) i.e. head_dim 64)
    num_heads: Tuple[int, ...] = (8, 8, 8, 8)
    # which down-block levels have cross-attention (SD: first 3 of 4)
    attn_down: Tuple[bool, ...] = (True, True, True, False)
    use_linear_projection: bool = False
    norm_num_groups: int = 32
    flip_sin_to_cos: bool = True
    freq_shift: int = 0
    # Pallas flash attention for long self-attention sequences
    use_flash_attention: bool = False
    flash_min_seq: int = 2048
    # flash backward query-block: 128 is ~8% faster per guidance fwd+bwd and
    # fits VMEM in the single-sample program; the batch engine's vmap adds a
    # grid dim that overflows at 128, so parallel/batch.py overrides to 64
    flash_bwd_block: int = 128
    dtype: Any = jnp.float32
    # dtype for GroupNorm/LayerNorm compute. fp32 is the conservative
    # default; bf16 removes the up/down-casts around every norm (the
    # reference's fp16 mode runs torch norms in fp16, README.md:33)
    norm_dtype: Any = jnp.float32


def timestep_embedding(t: jax.Array, dim: int, flip_sin_to_cos: bool = True, freq_shift: int = 0):
    """Sinusoidal timestep embedding (diffusers get_timestep_embedding)."""
    half = dim // 2
    exponent = -jnp.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / (half - freq_shift)
    emb = jnp.asarray(t, jnp.float32)[..., None] * jnp.exp(exponent)[None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    return jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)


class TimestepEmbedding(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, emb):
        emb = nn.Dense(self.dim, dtype=self.dtype, name="linear_1")(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(self.dim, dtype=self.dtype, name="linear_2")(emb)
        return emb


class ResnetBlock2D(nn.Module):
    out_channels: int
    groups: int = 32
    eps: float = 1e-5
    dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        in_channels = x.shape[-1]
        h = nn.GroupNorm(self.groups, epsilon=self.eps, dtype=self.norm_dtype, name="norm1")(x)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(nn.silu(temb))
        h = h + t[:, None, None, :]
        h = nn.GroupNorm(self.groups, epsilon=self.eps, dtype=self.norm_dtype, name="norm2")(h)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class CrossAttention(nn.Module):
    query_dim: int
    heads: int
    dim_head: int
    dtype: Any = jnp.float32
    use_flash: bool = False
    flash_bwd_block: int = 128

    @nn.compact
    def __call__(self, x, context=None, capture=False, capture_perhead=False, pww_mask=None, pww_gate=None):
        inner = self.heads * self.dim_head
        ctx = x if context is None else context
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)
        out, pooled = attention(
            q,
            k,
            v,
            self.heads,
            capture=capture,
            capture_perhead=capture_perhead,
            pww_mask=pww_mask,
            pww_gate=pww_gate,
            use_flash=self.use_flash,
            flash_bwd_block=self.flash_bwd_block,
        )
        out = nn.Dense(self.query_dim, dtype=self.dtype, name="to_out_0")(out)
        return out, pooled


class FeedForward(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # GEGLU (diffusers): proj to 8*dim, split, x * gelu(gate)
        h = nn.Dense(self.dim * 8, dtype=self.dtype, name="net_0_proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gate, approximate=False)  # diffusers GEGLU uses exact gelu
        return nn.Dense(self.dim, dtype=self.dtype, name="net_2")(h)


class BasicTransformerBlock(nn.Module):
    dim: int
    heads: int
    dim_head: int
    dtype: Any = jnp.float32
    use_flash_self: bool = False
    use_flash_cross: bool = False
    norm_dtype: Any = jnp.float32
    flash_bwd_block: int = 128

    @nn.compact
    def __call__(self, x, context, capture_self=False, capture_cross=False, capture_cross_perhead=False, pww_mask=None, pww_gate=None):
        h, self_map = CrossAttention(
            self.dim, self.heads, self.dim_head, self.dtype, use_flash=self.use_flash_self,
            flash_bwd_block=self.flash_bwd_block, name="attn1"
        )(nn.LayerNorm(dtype=self.norm_dtype, name="norm1")(x).astype(self.dtype), None, capture=capture_self)
        x = x + h
        h, cross_map = CrossAttention(
            self.dim, self.heads, self.dim_head, self.dtype, use_flash=self.use_flash_cross,
            flash_bwd_block=self.flash_bwd_block, name="attn2"
        )(
            nn.LayerNorm(dtype=self.norm_dtype, name="norm2")(x).astype(self.dtype),
            context,
            capture=capture_cross,
            capture_perhead=capture_cross_perhead,
            pww_mask=pww_mask,
            pww_gate=pww_gate,
        )
        x = x + h
        x = x + FeedForward(self.dim, self.dtype, name="ff")(
            nn.LayerNorm(dtype=self.norm_dtype, name="norm3")(x).astype(self.dtype)
        )
        return x, self_map, cross_map


class Transformer2D(nn.Module):
    """Spatial transformer: GN -> proj_in -> blocks -> proj_out -> +residual."""

    heads: int
    dim_head: int
    use_linear_projection: bool = False
    groups: int = 32
    dtype: Any = jnp.float32
    use_flash_self: bool = False
    use_flash_cross: bool = False
    norm_dtype: Any = jnp.float32
    flash_bwd_block: int = 128

    @nn.compact
    def __call__(self, x, context, capture: CaptureSpec, pww=None, pww_gate=None):
        b, hgt, wdt, c = x.shape
        res = hgt
        inner = self.heads * self.dim_head
        capture_self = ("self", res) in capture
        capture_cross = ("cross", res) in capture
        capture_cross_ph = ("cross_perhead", res) in capture
        pww_mask = pww.get(res) if pww else None

        residual = x
        h = nn.GroupNorm(self.groups, epsilon=1e-6, dtype=self.norm_dtype, name="norm")(x).astype(self.dtype)
        if self.use_linear_projection:
            h = h.reshape(b, hgt * wdt, c)
            h = nn.Dense(inner, dtype=self.dtype, name="proj_in")(h)
        else:
            h = nn.Conv(inner, (1, 1), dtype=self.dtype, name="proj_in")(h)
            h = h.reshape(b, hgt * wdt, inner)
        h, self_map, cross_map = BasicTransformerBlock(
            inner,
            self.heads,
            self.dim_head,
            self.dtype,
            self.use_flash_self,
            self.use_flash_cross,
            self.norm_dtype,
            self.flash_bwd_block,
            name="transformer_blocks_0",
        )(h, context, capture_self, capture_cross, capture_cross_ph, pww_mask, pww_gate)
        if self.use_linear_projection:
            h = nn.Dense(c, dtype=self.dtype, name="proj_out")(h)
            h = h.reshape(b, hgt, wdt, c)
        else:
            h = h.reshape(b, hgt, wdt, inner)
            h = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(h)
        return h + residual, self_map, cross_map


class Downsample2D(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.channels, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype, name="conv")(x)


class Upsample2D(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


class UNet2DCondition(nn.Module):
    """SD UNet. Input NHWC latents [B, H, W, 4]; returns (eps, aux)."""

    config: UNetConfig

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,  # [B, H, W, C_in]
        timestep: jax.Array,  # scalar or [B]
        encoder_hidden_states: jax.Array,  # [B, K, ctx_dim]
        capture: CaptureSpec = EMPTY_CAPTURE,
        pww: Optional[Dict[int, jax.Array]] = None,
        pww_gate: Optional[jax.Array] = None,
        deep_inject: Optional[jax.Array] = None,
        deep_inject_gate: Optional[jax.Array] = None,
    ):
        cfg = self.config
        dtype = cfg.dtype
        maps: Dict[str, List[jax.Array]] = {
            f"{place}_{kind}": []
            for place in ("down", "mid", "up")
            for kind in ("cross", "self", "cross_perhead")
        }

        def collect(place, self_map, cross_map):
            if self_map is not None:
                maps[f"{place}_self"].append(self_map)
            if cross_map is not None:
                # per-head diagnostics come through un-pooled as [B, H, Q, K]
                key = "cross_perhead" if cross_map.ndim == 4 else "cross"
                maps[f"{place}_{key}"].append(cross_map)

        b = sample.shape[0]
        t = jnp.broadcast_to(jnp.asarray(timestep), (b,))
        temb = timestep_embedding(t, cfg.block_out_channels[0], cfg.flip_sin_to_cos, cfg.freq_shift)
        temb = TimestepEmbedding(cfg.block_out_channels[0] * 4, dtype, name="time_embedding")(
            temb.astype(dtype)
        )
        ctx = encoder_hidden_states.astype(dtype)

        sample = sample.astype(dtype)
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=dtype, name="conv_in")(sample)

        n_blocks = len(cfg.block_out_channels)
        res_samples = [h]
        # --- down ---
        for i, out_ch in enumerate(cfg.block_out_channels):
            has_attn = cfg.attn_down[i]
            for j in range(cfg.layers_per_block):
                h = ResnetBlock2D(out_ch, cfg.norm_num_groups, dtype=dtype, norm_dtype=cfg.norm_dtype, name=f"down_blocks_{i}_resnets_{j}")(h, temb)
                if has_attn:
                    h, sm, cm = Transformer2D(
                        cfg.num_heads[i],
                        out_ch // cfg.num_heads[i],
                        cfg.use_linear_projection,
                        cfg.norm_num_groups,
                        dtype,
                        cfg.use_flash_attention and (h.shape[1] * h.shape[2]) >= cfg.flash_min_seq,
                        cfg.use_flash_attention,
                        norm_dtype=cfg.norm_dtype,
                        flash_bwd_block=cfg.flash_bwd_block,
                        name=f"down_blocks_{i}_attentions_{j}",
                    )(h, ctx, capture, pww, pww_gate)
                    collect("down", sm, cm)
                res_samples.append(h)
            if i != n_blocks - 1:
                h = Downsample2D(out_ch, dtype, name=f"down_blocks_{i}_downsamplers_0")(h)
                res_samples.append(h)

        # --- deep-feature capture / injection (reference pipeline:693-706) ---
        deep = res_samples[-1]
        if deep_inject is not None:
            inj = deep_inject.astype(dtype)
            if inj.shape[0] != b:
                inj = jnp.broadcast_to(inj, (b,) + inj.shape[1:])
            if deep_inject_gate is not None:
                # traced on/off switch so one compiled forward serves both
                # the injecting and non-injecting CFG pass (the alternative,
                # lax.cond over two UNet instances, doubles the executable)
                inj = jnp.where(deep_inject_gate, inj, deep)
            res_samples[-1] = inj

        # --- mid ---
        mid_ch = cfg.block_out_channels[-1]
        h = ResnetBlock2D(mid_ch, cfg.norm_num_groups, dtype=dtype, norm_dtype=cfg.norm_dtype, name="mid_block_resnets_0")(h, temb)
        h, sm, cm = Transformer2D(
            cfg.num_heads[-1],
            mid_ch // cfg.num_heads[-1],
            cfg.use_linear_projection,
            cfg.norm_num_groups,
            dtype,
            False,
            cfg.use_flash_attention,
            norm_dtype=cfg.norm_dtype,
            flash_bwd_block=cfg.flash_bwd_block,
                        name="mid_block_attentions_0",
        )(h, ctx, capture, pww, pww_gate)
        collect("mid", sm, cm)
        h = ResnetBlock2D(mid_ch, cfg.norm_num_groups, dtype=dtype, norm_dtype=cfg.norm_dtype, name="mid_block_resnets_1")(h, temb)

        # --- up ---
        rev_ch = list(reversed(cfg.block_out_channels))
        rev_attn = list(reversed(cfg.attn_down))
        rev_heads = list(reversed(cfg.num_heads))
        for i in range(n_blocks):
            out_ch = rev_ch[i]
            has_attn = rev_attn[i]
            for j in range(cfg.layers_per_block + 1):
                skip = res_samples.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResnetBlock2D(out_ch, cfg.norm_num_groups, dtype=dtype, norm_dtype=cfg.norm_dtype, name=f"up_blocks_{i}_resnets_{j}")(h, temb)
                if has_attn:
                    h, sm, cm = Transformer2D(
                        rev_heads[i],
                        out_ch // rev_heads[i],
                        cfg.use_linear_projection,
                        cfg.norm_num_groups,
                        dtype,
                        cfg.use_flash_attention and (h.shape[1] * h.shape[2]) >= cfg.flash_min_seq,
                        cfg.use_flash_attention,
                        norm_dtype=cfg.norm_dtype,
                        flash_bwd_block=cfg.flash_bwd_block,
                        name=f"up_blocks_{i}_attentions_{j}",
                    )(h, ctx, capture, pww, pww_gate)
                    collect("up", sm, cm)
            if i != n_blocks - 1:
                h = Upsample2D(out_ch, dtype, name=f"up_blocks_{i}_upsamplers_0")(h)

        h = nn.GroupNorm(cfg.norm_num_groups, epsilon=1e-5, dtype=cfg.norm_dtype, name="conv_norm_out")(h)
        h = nn.silu(h).astype(dtype)
        h = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=dtype, name="conv_out")(h)

        aux = {"maps": maps, "deep": deep}
        return h, aux
