"""Flax CLIP text encoder (SD 1.x ViT-L/14 and SD 2.1 OpenCLIP ViT-H variants).

The reference calls transformers' CLIPTextModel (reference
pipeline_guided_attention.py:131-135). We implement the text transformer from
scratch: token+position embeddings, pre-LN blocks with causal attention, and
a final LayerNorm. SD1.x uses quick_gelu, hidden 768, 12 layers, 12 heads;
SD2.1 uses gelu, hidden 1024, 23 layers, 16 heads (the checkpoint is already
truncated to the penultimate layer).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 77
    hidden_act: str = "quick_gelu"  # "gelu" for SD2.1
    layer_norm_eps: float = 1e-5
    dtype: Any = jnp.float32


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    return lambda x: nn.gelu(x, approximate=False)


class CLIPAttention(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, x, causal_mask):
        c = self.cfg
        d = c.hidden_size
        hd = d // c.num_heads
        q = nn.Dense(d, dtype=c.dtype, name="q_proj")(x) * (hd**-0.5)
        k = nn.Dense(d, dtype=c.dtype, name="k_proj")(x)
        v = nn.Dense(d, dtype=c.dtype, name="v_proj")(x)
        b, n, _ = x.shape
        q = q.reshape(b, n, c.num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, n, c.num_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, n, c.num_heads, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        scores = scores + causal_mask[None, None]
        probs = jax.nn.softmax(scores, axis=-1).astype(c.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, d).astype(c.dtype)
        return nn.Dense(d, dtype=c.dtype, name="out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, x, causal_mask):
        c = self.cfg
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32, name="layer_norm1")(x).astype(c.dtype)
        x = x + CLIPAttention(c, name="self_attn")(h, causal_mask)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32, name="layer_norm2")(x).astype(c.dtype)
        h = nn.Dense(c.intermediate_size, dtype=c.dtype, name="mlp_fc1")(h)
        h = _act(c.hidden_act)(h)
        h = nn.Dense(c.hidden_size, dtype=c.dtype, name="mlp_fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    """input_ids [B, 77] -> last_hidden_state [B, 77, hidden]."""

    config: CLIPTextConfig

    @nn.compact
    def __call__(self, input_ids: jax.Array) -> jax.Array:
        c = self.config
        n = input_ids.shape[-1]
        tok = nn.Embed(c.vocab_size, c.hidden_size, dtype=c.dtype, name="token_embedding")(input_ids)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (c.max_position_embeddings, c.hidden_size),
        )
        x = tok + pos[None, :n].astype(c.dtype)
        causal = jnp.triu(jnp.full((n, n), -jnp.inf, jnp.float32), k=1)
        for i in range(c.num_layers):
            x = CLIPEncoderLayer(c, name=f"layers_{i}")(x, causal)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32, name="final_layer_norm")(x)
        return x.astype(c.dtype)
