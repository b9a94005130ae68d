"""Device mesh + sharding rules.

The reference has no parallelism at all — seeds iterate in a serial Python
loop on one GPU (reference run.py:97-98; SURVEY.md §2.3). Here scale comes
from `jax.sharding`:

  * **data** axis: each device generates independent samples (seeds and/or
    prompts) — guidance losses are per-sample, so this is pure data
    parallelism over ICI with zero algorithmic communication.
  * **tensor** axis: Megatron-style sharding of the UNet transformer
    projections (qkv/out column/row, GEGLU in/out) — XLA GSPMD inserts the
    all-reduces. Convolutions and norms stay replicated at SD scale; the
    rules table is extensible by regex.

Sequence/pipeline/expert parallelism are intentionally absent: attention
here is <=4096 query px x 77 keys and the model is a single UNet — there is
nothing for sp/pp/ep to shard (SURVEY.md §5 'long-context: not applicable').
"""
from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Dict[str, int]] = None, devices=None) -> Mesh:
    """Build a mesh, defaulting to pure data parallelism over all devices."""
    devices = devices if devices is not None else jax.devices()
    if not shape:
        shape = {"data": len(devices)}
    names = tuple(shape.keys())
    dims = tuple(shape.values())
    arr = np.asarray(devices[: int(np.prod(dims))]).reshape(dims)
    return Mesh(arr, names)


# (regex over '/'-joined param path, PartitionSpec) — first match wins.
DEFAULT_TP_RULES: Tuple[Tuple[str, P], ...] = (
    (r".*/attn[12]/to_[qkv]/kernel$", P(None, "tensor")),
    (r".*/attn[12]/to_out_0/kernel$", P("tensor", None)),
    (r".*/attn[12]/to_out_0/bias$", P(None)),
    (r".*/ff/net_0_proj/kernel$", P(None, "tensor")),
    (r".*/ff/net_0_proj/bias$", P("tensor")),
    (r".*/ff/net_2/kernel$", P("tensor", None)),
)


def _spec_for(path: str, rules, mesh: Mesh) -> P:
    if "tensor" in mesh.axis_names and mesh.shape.get("tensor", 1) > 1:
        for pat, spec in rules:
            if re.match(pat, path):
                return spec
    return P()  # replicated


def param_shardings(params, mesh: Mesh, rules=DEFAULT_TP_RULES):
    """NamedSharding pytree for a param tree under the given mesh."""

    def walk(tree, prefix):
        if isinstance(tree, dict):
            return {k: walk(v, prefix + "/" + k) for k, v in tree.items()}
        return NamedSharding(mesh, _spec_for(prefix, rules, mesh))

    return walk(params, "")


def shard_params(params, mesh: Mesh, rules=DEFAULT_TP_RULES):
    """Place a param tree onto the mesh per the TP rules (replicating the
    rest)."""
    shardings = param_shardings(params, mesh, rules)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
