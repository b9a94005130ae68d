"""GuidanceSpec: the static, precomputed description of a guided run.

This replaces the reference's mutable ``shared_state`` module + ``token_dict``
(reference utils/shared_state.py, run.py:81-91) with an immutable pytree of
fixed-shape arrays so the whole guided denoising loop can be traced once.
All annotation targets (crosshair points, boxes), token bindings, bounding-box
weight maps (reference utils/helpers.py:215-246 Python loops — vectorized
here), and paint-with-words masks (reference utils/ptp_utils.py:113-132) are
precomputed host-side into arrays indexed by token slot [0..76].
"""
from __future__ import annotations

import copy
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp
from flax import struct

from guided_attention_tpu.annotation import Annotation, AnnotationType, Rect
from guided_attention_tpu.config import HyperParams

ANN_NONE = -1
MAX_TOKENS = 77  # CLIP context length


@struct.dataclass
class GuidanceSpec:
    """Fixed-shape arrays describing all annotations for one prompt.

    K = text context length (77). R = attention_res (default 16).
    """

    token_mask: jnp.ndarray  # bool[K]  — tokens bound to an annotation
    ann_type: jnp.ndarray  # int32[K] — AnnotationType or ANN_NONE
    center_xy: jnp.ndarray  # f32[K,2] — centering target (COOR xy / BOX center)
    subprompt_id: jnp.ndarray  # int32[K] — group id, -1 if unbound
    valid_text: jnp.ndarray  # bool[K]  — tokens kept by the re-softmax slice
    inside_mask: jnp.ndarray  # f32[K,R,R] — 1 inside the (shrunk) box
    w_in: jnp.ndarray  # f32[K,R,R] — normalized strict inside weights
    w_out: jnp.ndarray  # f32[K,R,R] — normalized strict outside weights
    at_most: jnp.ndarray  # f32[K]   — 1/num_inside per BOX token
    # paint-with-words: res -> f32[res*res, K] additive score mask
    pww_masks: Dict[int, jnp.ndarray]
    # --- static (non-pytree) fields ---
    n_groups: int = struct.field(pytree_node=False, default=1)
    custom_group: int = struct.field(pytree_node=False, default=-1)
    attention_res: int = struct.field(pytree_node=False, default=16)
    # tuple of (loss_fn, args) — loss_fn(maps, spec, args) -> scalar; traced.
    custom_losses: Tuple[Any, ...] = struct.field(pytree_node=False, default=())
    # host-side metadata (token slot -> word) for logging/visualization
    words: Tuple[Tuple[int, str], ...] = struct.field(pytree_node=False, default=())
    # subprompt strings in group-id order (custom group excluded)
    subprompts: Tuple[str, ...] = struct.field(pytree_node=False, default=())


def _inside_box_grid(rect: Rect, res: int, shrink_factor: float) -> np.ndarray:
    """Boolean [res,res] grid of cells inside the shrunk box.

    Cell centers sampled at +0.5 (reference utils/helpers.py:164-173,
    sample_center=True).
    """
    r = rect.of_size(res)
    jj, ii = np.meshgrid(np.arange(res), np.arange(res))  # jj = x/col, ii = y/row
    cx = jj + 0.5
    cy = ii + 0.5
    ox = shrink_factor * r.width
    oy = shrink_factor * r.height
    return (
        (cx >= r.x + ox)
        & (cx <= r.x + r.width - ox)
        & (cy >= r.y + oy)
        & (cy <= r.y + r.height - oy)
    )


def _box_weight_maps(
    rect: Rect, res: int, shrink_factor: float
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, float]:
    """Vectorized port of calculate_bounding_box_losses' weight build
    (reference utils/helpers.py:215-246).

    Returns (inside_mask, w_in, w_out, at_most): weights normalized within
    their region; outside weights are the constant 1 normalized
    (helpers.py:208-209 returns 1.0 for every outside distance).
    """
    r = rect.of_size(res)
    inside = _inside_box_grid(rect, res, shrink_factor)
    jj, ii = np.meshgrid(np.arange(res), np.arange(res))
    cx = jj + 0.5
    cy = ii + 0.5
    rcx, rcy = r.center()
    # normalized distance from box center: 0 at center, 1 at corner
    # (helpers.py:175-185). Clamp the denominators: a degenerate zero-width/
    # height box otherwise divides by zero, and when its edge lands exactly
    # on a cell center the 0/0 = NaN cell IS inside the mask and silently
    # NaN-poisons the whole run (the reference divides by zero identically).
    # For the degenerate box the distance term is undefined anyway; the
    # clamp yields a huge finite c_dist -> the minimum interp weight.
    c_dist = np.sqrt(
        (2.0 * (rcx - cx) / max(r.width, 1e-6)) ** 2
        + (2.0 * (rcy - cy) / max(r.height, 1e-6)) ** 2
    ) / np.sqrt(2.0)
    w_inside = np.interp(c_dist, [0.0, 0.333, 0.666, 1.0], [3.0, 2.5, 1.0, 0.2])
    weights = np.where(inside, w_inside, 1.0)
    num_inside = int(inside.sum())
    sum_inside = weights[inside].sum() if num_inside else 1.0
    sum_outside = weights[~inside].sum() if num_inside < res * res else 1.0
    w_in = np.where(inside, weights / sum_inside, 0.0)
    w_out = np.where(~inside, weights / sum_outside, 0.0)
    at_most = 1.0 / num_inside if num_inside else 0.0
    return inside.astype(np.float32), w_in.astype(np.float32), w_out.astype(np.float32), at_most


def find_token_span(full_ids: Sequence[int], sub_ids: Sequence[int]) -> Optional[List[int]]:
    """First index span of ``sub_ids`` inside ``full_ids`` (reference run.py:69-73)."""
    n = len(sub_ids)
    for i in range(0, len(full_ids) - n + 1):
        if list(full_ids[i : i + n]) == list(sub_ids):
            return list(range(i, i + n))
    return None


def build_guidance_spec(
    tokenizer,
    prompt: str,
    meta_info: Sequence[Annotation],
    hp: HyperParams,
    custom_losses: Optional[Dict[str, Tuple[Any, str]]] = None,
    attention_res: int = 16,
    normalize_eot: bool = False,
    pww_resolutions: Sequence[int] = (8, 16, 32, 64),
    max_tokens: int = MAX_TOKENS,
) -> GuidanceSpec:
    """Bind annotations to token slots and precompute all loss geometry.

    ``tokenizer`` must provide ``encode(text) -> List[int]`` including
    BOS/EOS (see models/tokenizer.py). Token binding matches the reference's
    parseMetaPrompt (run.py:81-91): each annotation's sub-prompt is tokenized
    without BOS/EOS and matched against the full tokenized prompt; every
    matched slot inherits the annotation (later annotations overwrite).
    """
    custom_losses = custom_losses or {}
    full_ids = list(tokenizer.encode(prompt))
    K = max_tokens
    R = attention_res

    token_mask = np.zeros(K, dtype=bool)
    ann_type = np.full(K, ANN_NONE, dtype=np.int32)
    center_xy = np.zeros((K, 2), dtype=np.float32)
    subprompt_id = np.full(K, -1, dtype=np.int32)
    inside_mask = np.zeros((K, R, R), dtype=np.float32)
    w_in = np.zeros((K, R, R), dtype=np.float32)
    w_out = np.zeros((K, R, R), dtype=np.float32)
    at_most = np.zeros(K, dtype=np.float32)

    groups: List[str] = []
    words: List[Tuple[int, str]] = []

    for ann in meta_info:
        sub_ids = tokenizer.encode(ann.subprompt)[1:-1]
        span = find_token_span(full_ids, sub_ids)
        if span is None:
            continue
        if ann.subprompt not in groups:
            groups.append(ann.subprompt)
        gid = groups.index(ann.subprompt)
        for idx in span:
            if idx >= K:
                continue
            token_mask[idx] = True
            ann_type[idx] = int(ann.kind)
            subprompt_id[idx] = gid
            words.append((idx, tokenizer.decode([full_ids[idx]])))
            if ann.kind == AnnotationType.COOR:
                center_xy[idx] = np.asarray(ann.target, dtype=np.float32)
            elif ann.kind == AnnotationType.BOX:
                rect: Rect = ann.target
                center_xy[idx] = np.asarray(rect.center(), dtype=np.float32)
                m, wi, wo, am = _box_weight_maps(rect, R, hp.shrink_factor)
                inside_mask[idx] = m
                w_in[idx] = wi
                w_out[idx] = wo
                at_most[idx] = am

    # Valid-token mask for the x100 re-softmax (reference pipeline:209-219):
    # SD1.x slices [1:-1] of the 77 slots; SD2.1 slices [1:eot_idx].
    valid_text = np.zeros(K, dtype=bool)
    last_idx = (len(full_ids) - 1) if normalize_eot else (K - 1)
    valid_text[1:last_idx] = True

    # Paint-with-words additive masks (reference ptp_utils.py:113-132):
    # weight w inside each BOX token's (shrunk) box at every cross-attn res.
    pww_masks: Dict[int, jnp.ndarray] = {}
    if hp.paint_with_words_stop > 0:
        for res in pww_resolutions:
            pww_masks[res] = np.zeros((res * res, K), dtype=np.float32)
        for ann in meta_info:
            if ann.kind != AnnotationType.BOX:
                continue
            sub_ids = tokenizer.encode(ann.subprompt)[1:-1]
            span = find_token_span(full_ids, sub_ids)
            if span is None:
                continue
            for res in pww_resolutions:
                grid = _inside_box_grid(ann.target, res, hp.shrink_factor)
                flat = grid.reshape(-1).astype(np.float32) * hp.paint_with_words_weight
                for idx in span:
                    if idx < K:
                        pww_masks[res][:, idx] = flat

    # bind a per-spec COPY: bind() mutates the loss object, and the registry
    # instance is shared across prompts — binding it in place would corrupt
    # the custom_losses baked into previously built (and cached) specs
    custom_items = []
    for name, (obj, args) in custom_losses.items():
        bound = copy.deepcopy(obj)
        bound.bind(tokenizer, prompt, args)
        custom_items.append((name, bound, args))
    custom_items = tuple(custom_items)
    n_groups = len(groups) + (1 if custom_items else 0)
    custom_group = len(groups) if custom_items else -1

    return GuidanceSpec(
        token_mask=jnp.asarray(token_mask),
        ann_type=jnp.asarray(ann_type),
        center_xy=jnp.asarray(center_xy),
        subprompt_id=jnp.asarray(subprompt_id),
        valid_text=jnp.asarray(valid_text),
        inside_mask=jnp.asarray(inside_mask),
        w_in=jnp.asarray(w_in),
        w_out=jnp.asarray(w_out),
        at_most=jnp.asarray(at_most),
        pww_masks={k: jnp.asarray(v) for k, v in pww_masks.items()},
        n_groups=max(n_groups, 1),
        custom_group=custom_group,
        attention_res=R,
        custom_losses=custom_items,
        words=tuple(words),
        subprompts=tuple(groups),
    )
