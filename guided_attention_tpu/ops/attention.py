"""Attention with pure-output map capture and paint-with-words biasing.

This is the TPU-native replacement for the reference's monkey-patched
AttendExciteCrossAttnProcessor + AttentionStore (reference
utils/ptp_utils.py:59-146, 219-270): instead of mutating a global store from
inside the module, the attention op *returns* the head-averaged probability
map alongside the hidden states, and the UNet threads those maps up as a
pure output pytree.

Score math parity (ptp_utils.py:97-146):
  * scores = scale * q @ k^T, computed in fp32 (upcast_attention always
    accumulates fp32 on the MXU via preferred_element_type).
  * paint-with-words: scores += mask * 0.4 * max(scores) * log(1+sigma_t)
    for cross-attention while step < paint_with_words_stop; the mask is
    precomputed in GuidanceSpec, and the (gate * log1p(sigma)) scalar is a
    per-step input so the whole thing stays inside the scanned graph.
  * probs = softmax(scores) in fp32, cast back to the compute dtype for the
    probs @ v matmul; the captured map stays fp32.

The fused Pallas flash-attention path for long self-attention lives in
ops/flash_attention.py and is selected by `attention()` when capture is off
and the sequence is long.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def split_heads(x: jax.Array, heads: int) -> jax.Array:
    b, n, c = x.shape
    return x.reshape(b, n, heads, c // heads).transpose(0, 2, 1, 3)


def merge_heads(x: jax.Array) -> jax.Array:
    b, h, n, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * d)


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    heads: int,
    *,
    capture: bool = False,
    capture_perhead: bool = False,
    pww_mask: Optional[jax.Array] = None,
    pww_gate: Optional[jax.Array] = None,
    use_flash: bool = False,
    flash_bwd_block: int = 128,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Multi-head attention over [B, N, C] projections.

    Args:
      q: [B, Nq, C]; k, v: [B, Nk, C] (C = heads * head_dim).
      capture: also return the head-mean probability map [B, Nq, Nk] (fp32).
      capture_perhead: return the un-pooled probs [B, H, Nq, Nk] instead
        (diagnostics: per-head map dumps, reference pipeline:319-336).
      pww_mask: [Nq, Nk] paint-with-words additive mask (or None).
      pww_gate: scalar = step_gate * log(1 + sigma_t) (or None).
      use_flash: allow the Pallas flash kernel (self-attention fast path;
        ignored when capture or pww are active, which need materialized
        scores).

    Returns:
      (out [B, Nq, C] in q.dtype, probs map fp32 or None)
    """
    capture = capture or capture_perhead
    dtype = q.dtype
    b, nq, c = q.shape
    head_dim = c // heads
    scale = 1.0 / (head_dim**0.5)

    if use_flash and pww_mask is None and not capture_perhead:
        # the self-attention kernel assumes tile-aligned KV (no key mask);
        # self-attn always satisfies it, short cross KV (77) falls through
        if not capture and k.shape[1] == nq:
            from guided_attention_tpu.ops.flash_attention import flash_attention

            out = flash_attention(
                split_heads(q, heads),
                split_heads(k, heads),
                split_heads(v, heads),
                scale,
                block_q_bwd=flash_bwd_block,
            )
            return merge_heads(out).astype(dtype), None
        if capture and k.shape[1] != nq:  # cross-attention with fused map side-output
            from guided_attention_tpu.ops.flash_attention import cross_attention_with_map

            out, pooled = cross_attention_with_map(
                split_heads(q, heads), split_heads(k, heads), split_heads(v, heads), scale
            )
            return merge_heads(out).astype(dtype), pooled

    qh = split_heads(q, heads)
    kh = split_heads(k, heads)
    vh = split_heads(v, heads)

    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32
    ) * jnp.float32(scale)

    if pww_mask is not None and pww_gate is not None:
        # reference ptp_utils.py:137-138: global max over the score tensor
        bias = pww_mask.astype(jnp.float32)[None, None] * (
            0.4 * jnp.max(scores) * pww_gate.astype(jnp.float32)
        )
        scores = scores + bias

    probs = jax.nn.softmax(scores, axis=-1)
    if capture_perhead:
        pooled = probs  # [B, H, Nq, Nk] fp32
    elif capture:
        pooled = jnp.mean(probs, axis=1)  # [B, Nq, Nk] fp32
    else:
        pooled = None

    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(dtype), vh, preferred_element_type=jnp.float32
    ).astype(dtype)
    return merge_heads(out), pooled
