"""Mid-run generation checkpoint/resume.

The reference has no checkpoint/resume story: a crashed run regenerates
from scratch and seeded determinism is the only substitute (SURVEY.md §5;
reference run.py:106, pipeline_guided_attention.py:919-921). Here a
generation can persist its progress every N steps and resume EXACTLY:
``pipeline.build_generate_raw(segment_len=L)`` scans L steps from a TRACED
start step (one compiled program serves every segment of length L), and
every in-scan PRNG stream derives from ``fold_in(run_key, absolute_step)``,
so re-running steps [k, S) from the step-k latents reproduces the
uninterrupted run bit-for-bit (tests/test_checkpoint.py pins this).

State format: one msgpack file per segment boundary (atomic tmp+rename)
holding the absolute step reached, the latents entering that step, the
diagnostics for THAT SEGMENT ONLY (total checkpoint volume stays linear in
run length; ``latest_state`` stitches the segment chain back together), and
an identity hash of (options, seed, model) — resume refuses state written
by a different run configuration and falls back to a fresh start.
"""
from __future__ import annotations

import dataclasses
import hashlib
import os
from pathlib import Path
from typing import Any, List, Optional, Tuple

import numpy as np
from flax import serialization

from guided_attention_tpu.pipeline import StepDiag

_PREFIX = "genstate_"


def run_identity(*parts: str) -> str:
    """Stable identity of one resumable run (options repr + seed + model)."""
    h = hashlib.sha256()
    for p in parts:
        h.update(p.encode())
        h.update(b"\x00")
    return h.hexdigest()[:16]


def _path(state_dir: str, identity: str, step: int) -> Path:
    return Path(state_dir) / f"{_PREFIX}{identity}_{step:04d}.msgpack"


def save_state(
    state_dir: str,
    identity: str,
    step: int,
    latents: np.ndarray,
    diags: Any,
    seg_start: int = 0,
) -> Path:
    """Persist progress through step ``step`` (exclusive): the latents
    entering ``step`` and the diagnostics for steps [``seg_start``,
    ``step``) only. Atomic: a crash mid-write never corrupts an existing
    state file."""
    d = Path(state_dir)
    d.mkdir(parents=True, exist_ok=True)
    payload = {
        "identity": identity,
        "step": step,
        "seg_start": seg_start,
        "latents": np.asarray(latents),
        "diags": serialization.to_state_dict(diags),
    }
    dst = _path(state_dir, identity, step)
    # per-process tmp name: in a multi-host run every host writes the same
    # (identical, post-allgather) state; unique tmps keep concurrent writers
    # on a SHARED state dir from corrupting each other's in-flight file —
    # the final os.replace is atomic and last-writer-wins on equal bytes
    tmp = dst.with_suffix(f".tmp{os.getpid()}")
    tmp.write_bytes(serialization.msgpack_serialize(payload))
    os.replace(tmp, dst)
    return dst


def _run_files(state_dir: str, identity: str) -> List[Path]:
    d = Path(state_dir)
    if not d.is_dir():
        return []

    def step_of(p: Path) -> int:
        # numeric, not lexicographic: the zero-pad is cosmetic and runs past
        # 9999 steps must still walk the chain in step order
        suffix = p.stem.rsplit("_", 1)[-1]
        return int(suffix) if suffix.isdigit() else -1

    return sorted(d.glob(f"{_PREFIX}{identity}_*.msgpack"), key=step_of)


def latest_state(
    state_dir: str, identity: str, axis: int = 0
) -> Optional[Tuple[int, np.ndarray, Any]]:
    """Newest resumable state for this run: walks the per-segment files in
    step order, stitching the longest contiguous chain (each file's
    ``seg_start`` must equal the previous file's ``step``; a file with
    ``seg_start`` 0 begins a fresh chain, superseding older partial runs).
    Returns (step reached, latents entering it, diagnostics for [0, step))
    or None. Unreadable/mismatched files break the chain but never crash —
    a torn tail file cannot block resume from an older boundary. ``axis``
    is the diagnostics step axis (0 single-sample, 1 batched)."""
    chain_step, chain_lat, chain_diags = 0, None, []
    for f in _run_files(state_dir, identity):
        try:
            payload = serialization.msgpack_restore(f.read_bytes())
            if payload.get("identity") != identity:
                continue
            # structural mismatch (e.g. a StepDiag schema from an older code
            # version) must also skip, not crash — same fallback contract
            seg_start = int(payload.get("seg_start", 0))
            step = int(payload["step"])
            diags = _restore_diags(payload["diags"])
            lat = payload["latents"]
        except Exception:
            continue
        if seg_start == 0:
            chain_step, chain_lat, chain_diags = step, lat, [diags]
        elif seg_start == chain_step:
            chain_step, chain_lat = step, lat
            chain_diags.append(diags)
        # else: orphaned segment from a different grid — skip
    if chain_lat is None:
        return None
    return chain_step, chain_lat, concat_diags(chain_diags, axis=axis)


def clear_state(state_dir: str, identity: str) -> None:
    """Remove a completed run's state files."""
    for f in _run_files(state_dir, identity):
        f.unlink(missing_ok=True)


def _restore_diags(state: dict) -> StepDiag:
    """Rebuild the StepDiag pytree from its serialized state dict."""
    return StepDiag(**{k: state[k] for k in state})


def concat_diags(segments: List[Any], axis: int = 0) -> Any:
    """Concatenate per-segment StepDiag pytrees along the step axis (0 for
    single-sample diags, 1 for batched [B, steps, ...] diags) back into one
    full-run diagnostics tree."""
    if len(segments) == 1:
        return segments[0]
    import jax

    return jax.tree_util.tree_map(lambda *xs: np.concatenate(xs, axis=axis), *segments)


def segment_bounds(start: int, total: int, every: int) -> List[Tuple[int, int]]:
    """Segment [start, total) at multiples of ``every`` — boundaries stay on
    the global grid so a resumed run reuses the same compiled segment
    programs as the original."""
    if every <= 0:
        raise ValueError("checkpoint_every must be >= 1")
    cuts = sorted({start, total} | {b for b in range(0, total, every) if start < b < total})
    return list(zip(cuts[:-1], cuts[1:]))
