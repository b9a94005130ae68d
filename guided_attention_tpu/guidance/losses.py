"""The vectorized guidance loss engine.

Replaces the reference's per-token Python loops over 16x16 grids
(reference pipeline_guided_attention.py:201-296, utils/helpers.py:215-277,
run.py:217-225) with masked array ops over all 77 token slots at once —
fully traceable, differentiable, and fused by XLA into the UNet backward.

Loss formulas (reference parity):
  * re-softmax: token maps x100, softmax over the valid token slots
    (pipeline:217-219) — implemented as a masked softmax so indices never
    shift (the reference drops BOS and re-indexes; we mask instead).
  * COOR centering: 1*|col - x*R|/(R-1) + 4*|row - y*R|/(R-1)
    (pipeline:390-395) with (col,row) the attention-mass centroid sampled at
    cell centers (+0.5) (pipeline:257-268).
  * BOX (default, non-strict): inside = 1 - mass_inside, outside =
    mass_outside (helpers.py:265-277), scaled inside*0.2 + outside*0.2*3
    (pipeline:426-427) plus bb_center_weight * centering(box center)
    (pipeline:430-434).
  * BOX strict: per-pixel hinge vs 1/num_inside with distance-based weight
    maps (helpers.py:250-264); weight maps precomputed in GuidanceSpec.
  * KEYWORD: Attend-and-Excite max-attention excitation
    max(0, 1 - max_attn) * keyword_max_loss_scale (the reference computes
    max_attn but never uses it, pipeline:255,291 — scale 0.0 = parity).
  * custom plugin losses summed into their own group (pipeline:286-289,
    446-450).
  * grouping: sum (or mean if sub_prompt_avg_within) per sub-prompt, then sum
    across sub-prompts (pipeline:358-387).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from guided_attention_tpu.annotation import AnnotationType
from guided_attention_tpu.config import HyperParams
from guided_attention_tpu.guidance.smoothing import smooth_maps
from guided_attention_tpu.guidance.spec import GuidanceSpec


@struct.dataclass
class TokenStats:
    """Per-token statistics computed from the aggregated attention maps."""

    probs: jnp.ndarray  # f32[R,R,K] — re-softmaxed maps (unsmoothed)
    smoothed: jnp.ndarray  # f32[R,R,K] — smoothed maps used for losses
    max_attn: jnp.ndarray  # f32[K]
    col: jnp.ndarray  # f32[K] — attention centroid x (cell units)
    row: jnp.ndarray  # f32[K] — attention centroid y
    inside_loss: jnp.ndarray  # f32[K]
    outside_loss: jnp.ndarray  # f32[K]
    custom_loss: jnp.ndarray  # f32[] — summed plugin losses


def compute_token_stats(
    maps: jnp.ndarray,
    spec: GuidanceSpec,
    hp: HyperParams,
    smooth_attentions: bool = True,
    sigma: float = 0.5,
    kernel_size: int = 3,
) -> TokenStats:
    """maps: f32[R,R,K] aggregated cross-attention probabilities."""
    maps = maps.astype(jnp.float32)
    R = maps.shape[0]
    K = maps.shape[-1]

    # x100 re-softmax over valid token slots (pipeline:217-219).
    logits = jnp.where(spec.valid_text[None, None, :], maps * 100.0, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1)

    if smooth_attentions:
        # [K,R,R] depthwise blur, reflect pad (pipeline:251-254)
        sm = smooth_maps(jnp.moveaxis(probs, -1, 0), kernel_size, sigma)
        smoothed = jnp.moveaxis(sm, 0, -1)
    else:
        smoothed = probs

    max_attn = jnp.max(smoothed, axis=(0, 1))

    # Mass-normalize each token map, centroid at cell centers (pipeline:263-268).
    # Double-where safe division: invalid token slots have zero mass, and a
    # tiny floor alone NaNs the VJP (d(x/m)/dm divides by m**2, which
    # underflows fp32 for m ~ 1e-20).
    mass = jnp.sum(smoothed, axis=(0, 1), keepdims=True)
    mass_ok = mass > 1e-12
    norm = jnp.where(mass_ok, smoothed / jnp.where(mass_ok, mass, 1.0), 0.0)
    jj = jnp.arange(R, dtype=jnp.float32) + 0.5  # x / col
    ii = jnp.arange(R, dtype=jnp.float32) + 0.5  # y / row
    col = jnp.einsum("hwk,w->k", norm, jj)
    row = jnp.einsum("hwk,h->k", norm, ii)

    inside = jnp.moveaxis(spec.inside_mask, 0, -1)  # [R,R,K]
    if hp.strict:
        # strict per-pixel hinges (helpers.py:250-264)
        w_in = jnp.moveaxis(spec.w_in, 0, -1)
        w_out = jnp.moveaxis(spec.w_out, 0, -1)
        at_most = spec.at_most[None, None, :]
        inside_loss = jnp.sum(w_in * 2.0 * jnp.maximum(0.0, at_most - norm), axis=(0, 1))
        outside_loss = jnp.sum(w_out * jnp.maximum(0.0, norm), axis=(0, 1))
    else:
        # attention-mass variant (helpers.py:265-277)
        mass_in = jnp.sum(norm * inside, axis=(0, 1))
        mass_out = jnp.sum(norm * (1.0 - inside), axis=(0, 1))
        inside_loss = 1.0 - mass_in
        outside_loss = mass_out

    # Plugin losses see the (unsmoothed) re-softmaxed maps, invalid slots
    # zeroed — the analogue of the reference's attention_for_text slice
    # (pipeline:286-289) but in original token coordinates.
    custom_total = jnp.zeros((), jnp.float32)
    for (_name, fn, args) in spec.custom_losses:
        custom_total = custom_total + jnp.reshape(fn.calc_loss(probs, spec, args), ())

    return TokenStats(
        probs=probs,
        smoothed=smoothed,
        max_attn=max_attn,
        col=col,
        row=row,
        inside_loss=inside_loss,
        outside_loss=outside_loss,
        custom_loss=custom_total,
    )


def _centering_loss(col, row, xy, R: int):
    """1*|col - x*R|/(R-1) + 4*|row - y*R|/(R-1) (pipeline:390-395)."""
    part1 = 1.0 * jnp.abs(col - xy[..., 0] * R) / (R - 1)
    part2 = 4.0 * jnp.abs(row - xy[..., 1] * R) / (R - 1)
    return part1 + part2


def per_token_losses(
    stats: TokenStats, spec: GuidanceSpec, hp: HyperParams
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scaled + unscaled per-token losses, zero for unbound slots.

    (pipeline:398-451 per-token branches, vectorized.)
    """
    R = spec.attention_res
    is_coor = (spec.ann_type == int(AnnotationType.COOR)) & spec.token_mask
    is_box = (spec.ann_type == int(AnnotationType.BOX)) & spec.token_mask
    is_kw = (spec.ann_type == int(AnnotationType.KEYWORD)) & spec.token_mask

    centering = _centering_loss(stats.col, stats.row, spec.center_xy, R)

    coor_loss = centering
    box_unscaled = stats.inside_loss + stats.outside_loss
    box_loss = (
        hp.inside_loss_scale * stats.inside_loss
        + hp.outside_loss_scale * stats.outside_loss * 3.0
        + hp.bb_center_weight * centering
    )
    kw_loss = hp.keyword_max_loss_scale * jnp.maximum(0.0, 1.0 - stats.max_attn)

    scaled = (
        jnp.where(is_coor, coor_loss, 0.0)
        + jnp.where(is_box, box_loss, 0.0)
        + jnp.where(is_kw, kw_loss, 0.0)
    )
    unscaled = (
        jnp.where(is_coor, coor_loss, 0.0)
        + jnp.where(is_box, box_unscaled, 0.0)
        + jnp.where(is_kw, kw_loss, 0.0)
    )
    return scaled, unscaled


def group_by_subprompt(
    per_token: jnp.ndarray, spec: GuidanceSpec, hp: HyperParams, custom: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Aggregate per-token losses into per-sub-prompt groups.

    Returns (group_sums f32[n_groups], group_counts f32[n_groups],
    group_valid bool[n_groups]). (pipeline:358-387)
    """
    n = spec.n_groups
    gid = jnp.where(spec.token_mask, spec.subprompt_id, n)  # park unbound at n
    sums = jax.ops.segment_sum(per_token, gid, num_segments=n + 1)[:n]
    counts = jax.ops.segment_sum(
        jnp.ones_like(per_token), gid, num_segments=n + 1
    )[:n]
    group_valid = counts > 0
    if spec.custom_group >= 0:
        sums = sums.at[spec.custom_group].add(custom)
        counts = counts.at[spec.custom_group].add(1.0)
        group_valid = group_valid.at[spec.custom_group].set(True)
    return sums, counts, group_valid


def compute_loss(
    stats: TokenStats,
    spec: GuidanceSpec,
    hp: HyperParams,
    sub_prompt_avg_within: bool = False,
):
    """Total loss + per-group scaled/unscaled losses.

    Returns (total, groups_scaled, groups_unscaled, group_valid).
    """
    scaled, unscaled = per_token_losses(stats, spec, hp)
    gs, cs, valid = group_by_subprompt(scaled, spec, hp, stats.custom_loss)
    gu, cu, _ = group_by_subprompt(unscaled, spec, hp, stats.custom_loss)
    if sub_prompt_avg_within:
        gs = jnp.where(valid, gs / jnp.maximum(cs, 1.0), 0.0)
        gu = jnp.where(valid, gu / jnp.maximum(cu, 1.0), 0.0)
    total = jnp.sum(jnp.where(valid, gs, 0.0))
    return total, gs, gu, valid


def meets_threshold(
    groups_unscaled: jnp.ndarray, group_valid: jnp.ndarray, threshold
) -> jnp.ndarray:
    """True iff every valid group's unscaled loss is <= threshold
    (pipeline:1074-1088: returns False iff any group loss > thresh)."""
    return jnp.all(jnp.where(group_valid, groups_unscaled <= threshold, True))
