"""Native checkpoint save/load for converted parameters.

Converting an HF/diffusers torch checkpoint (models/convert.py) is paid
once; afterwards the flax param trees round-trip through msgpack so model
startup is a straight mmap-read (the reference re-downloads/loads through
diffusers' from_pretrained every process, reference run.py:28).
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Dict

from flax import serialization

COMPONENTS = ("unet", "text_encoder", "vae")


def save_params(ckpt_dir: str, params: Dict[str, Any]) -> None:
    d = Path(ckpt_dir)
    d.mkdir(parents=True, exist_ok=True)
    for name, tree in params.items():
        (d / f"{name}.msgpack").write_bytes(serialization.to_bytes(tree))


def load_params(ckpt_dir: str, template: Dict[str, Any]) -> Dict[str, Any]:
    d = Path(ckpt_dir)
    out = {}
    for name, tree in template.items():
        p = d / f"{name}.msgpack"
        out[name] = serialization.from_bytes(tree, p.read_bytes())
    return out


def is_native_checkpoint(path: str) -> bool:
    return os.path.isdir(path) and any(
        os.path.exists(os.path.join(path, f"{c}.msgpack")) for c in COMPONENTS
    )
