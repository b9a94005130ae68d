"""Custom-loss plugin API.

Port of the reference's CustomLossBase ABC + registry (reference
run.py:148-232), re-designed for JAX: ``calc_loss`` is *traced* into the
compiled guidance graph, so anything that depends on the tokenizer (token
index lookup) happens once, host-side, in ``bind`` — the reference instead
re-tokenized inside every loss evaluation (run.py:162-167).

``calc_loss(maps, spec, args)`` receives the x100-re-softmaxed cross-attention
maps as f32[R,R,77] in **original token coordinates** (invalid slots zeroed);
the reference passed the BOS-stripped slice so its indices were shifted by -1
(pipeline_guided_attention.py:286-289) — ``find_indices_for_sub_prompt`` here
returns unshifted indices and the two conventions agree functionally.
"""
from __future__ import annotations

import abc
import ast
from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp

from guided_attention_tpu.guidance.spec import find_token_span


class CustomLossBase(abc.ABC):
    """Base class for user-registered guidance losses (reference run.py:148-173).

    Loss objects live in a GuidanceSpec *static* field, so jit's cache
    compares them by __eq__/__hash__ — which here reflect ``static_state()``
    (everything bind() bakes into the trace). Without this, re-binding the
    shared registry instance for a new prompt would silently reuse the
    previous prompt's traced token indices.
    """

    @abc.abstractmethod
    def calc_loss(self, cross_attention_maps, spec, text_args: str):
        """Return a scalar jnp loss. Traced — use only JAX ops on the maps."""

    def subprompts_of_interest(self, text_args: str) -> List[str]:
        """Sub-prompts whose maps should be tracked (KEYWORD annotations)."""
        return []

    def bind(self, tokenizer, prompt: str, text_args: str) -> None:
        """Host-side hook: resolve token indices etc. before tracing."""

    def static_state(self) -> tuple:
        """Everything bind() bakes into the traced graph; part of the jit key."""
        return ()

    def __eq__(self, other):
        return type(self) is type(other) and self.static_state() == other.static_state()

    def __hash__(self):
        return hash((type(self).__name__, self.static_state()))

    # --- convenience helpers (reference run.py:158-173) ---
    def parse_text_args(self, text_args: str):
        return ast.literal_eval(text_args)

    def find_indices_for_sub_prompt(self, tokenizer, prompt: str, sub_prompt: str):
        full = tokenizer.encode(prompt)[1:-1]
        sub = tokenizer.encode(sub_prompt)[1:-1]
        span = find_token_span(full, sub)
        if span is None:
            return None
        return [i + 1 for i in span]  # original coords (BOS at 0)

    def get_map_for_token(self, maps, token_index: int, pixel_wise_normalization: bool = True):
        m = maps[:, :, token_index]
        if pixel_wise_normalization:
            s = jnp.sum(m)
            ok = s > 1e-12
            m = jnp.where(ok, m / jnp.where(ok, s, 1.0), 0.0)
        return m


class ToLeftOf(CustomLossBase):
    """'[CustomLoss:toLeftOf (cat,vase)]' — keep subprompt A left of B.

    Hinge on the gap between the attention-weighted x-centers of the two
    sub-prompts: loss = 9 * max(0, (cx_left + 0.2*W - cx_right) / W)
    (reference run.py:177-225; the reference divides the right centroid
    accumulation by len(left_side_indices) — run.py:196 — which we correct
    to len(right_side_indices); identical whenever both sub-prompts tokenize
    to the same length).
    """

    def __init__(self):
        self._left: Optional[Sequence[int]] = None
        self._right: Optional[Sequence[int]] = None

    def _quote_items_in_tuple(self, text_args: str) -> str:
        items = text_args.strip("()").split(",")
        return "(" + ",".join(f"'{i.strip()}'" for i in items) + ")"

    def subprompts_of_interest(self, text_args: str) -> List[str]:
        return list(self.parse_text_args(self._quote_items_in_tuple(text_args)))

    def bind(self, tokenizer, prompt: str, text_args: str) -> None:
        left_sub, right_sub = self.subprompts_of_interest(text_args)
        self._left = tuple(self.find_indices_for_sub_prompt(tokenizer, prompt, left_sub) or ())
        self._right = tuple(self.find_indices_for_sub_prompt(tokenizer, prompt, right_sub) or ())

    def static_state(self) -> tuple:
        return (self._left, self._right)

    def calc_loss(self, maps, spec, text_args: str):
        if not self._left or not self._right:
            return jnp.zeros((), jnp.float32)
        R = maps.shape[1]
        jj = jnp.arange(R, dtype=jnp.float32) + 0.5

        def x_center(indices):
            c = jnp.zeros((), jnp.float32)
            for i in indices:
                m = self.get_map_for_token(maps, i, True)
                c = c + jnp.einsum("hw,w->", m, jj) / len(indices)
            return c

        gap = 0.2 * R
        loss = (x_center(self._left) + gap - x_center(self._right)) / R
        return jnp.maximum(loss * 9.0, 0.0)


class CustomLossRegistry:
    """Name -> loss object registry (reference run.py:229-232)."""

    def __init__(self):
        self._losses: Dict[str, CustomLossBase] = {}

    def register(self, name: str, loss: CustomLossBase) -> None:
        self._losses[name] = loss

    def __contains__(self, name: str) -> bool:
        return name in self._losses

    def __getitem__(self, name: str) -> CustomLossBase:
        return self._losses[name]

    def as_dict(self) -> Dict[str, CustomLossBase]:
        return dict(self._losses)


def default_registry() -> CustomLossRegistry:
    reg = CustomLossRegistry()
    reg.register("toLeftOf", ToLeftOf())
    return reg
