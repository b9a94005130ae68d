"""HF/diffusers checkpoint -> Flax parameter conversion.

Loads a locally available diffusers-format Stable Diffusion checkpoint
directory (safetensors preferred, torch .bin fallback) and maps every tensor
into this framework's Flax param trees. Matching is by *normalized joined
name*: both the torch key and each flax param path are flattened to a single
underscore-joined string (digits merged into their container name), which
makes the mapping independent of where module nesting boundaries fall.

Transposition rules:
  torch Linear  [out, in]        -> kernel [in, out]
  torch Conv2d  [out, in, kh, kw]-> kernel [kh, kw, in, out]
  torch Norm    weight/bias      -> scale/bias
  torch Embed   weight           -> embedding

The reference fetches weights with from_pretrained over the network
(reference run.py:28); here loading is explicit and offline.
"""
from __future__ import annotations

import os
import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def _load_state_dict(dirpath: str) -> Dict[str, np.ndarray]:
    """Load all tensors in a diffusers component dir as numpy."""
    for fname in (
        "diffusion_pytorch_model.safetensors",
        "model.safetensors",
        "pytorch_model.safetensors",
    ):
        p = os.path.join(dirpath, fname)
        if os.path.exists(p):
            from safetensors.numpy import load_file

            return load_file(p)
    for fname in ("diffusion_pytorch_model.bin", "pytorch_model.bin"):
        p = os.path.join(dirpath, fname)
        if os.path.exists(p):
            import torch

            sd = torch.load(p, map_location="cpu", weights_only=True)
            return {k: v.float().numpy() for k, v in sd.items()}
    raise FileNotFoundError(f"no model weights found under {dirpath}")


def _merge_digits(key: str) -> str:
    """'down_blocks.0.resnets.1.conv1.weight' -> 'down_blocks_0_resnets_1_conv1_weight'."""
    return key.replace(".", "_")


# CLIP text encoder: flax tree is flat under the model root, the torch keys
# carry text_model.encoder.layers / text_model.embeddings wrappers
_TEXT_STRIPS = ("text_model.", "encoder.", "embeddings.")
# legacy diffusers<=0.12 VAE AttentionBlock naming (the reference pins 0.12,
# environment/requirements.txt:7) -> modern to_q/to_k/to_v/to_out.0/group_norm.
# Applied on the DOTTED key ('.' is a regex word boundary; after merging,
# '_' would defeat \b) and only for the vae component: the UNet's
# Transformer2D legitimately owns a GroupNorm named plain 'norm'.
_LEGACY_VAE_RENAMES = (
    (re.compile(r"\bquery\b"), "to_q"),
    (re.compile(r"\bkey\b"), "to_k"),
    (re.compile(r"\bvalue\b"), "to_v"),
    (re.compile(r"\bproj_attn\b"), "to_out_0"),
    (re.compile(r"\bnorm\b"), "group_norm"),
)


def _normalize_torch_key(key: str, component: str) -> str:
    k = key
    if component == "text_encoder":
        for pref in _TEXT_STRIPS:
            k = k.replace(pref, "")
    elif component == "vae":
        for pat, rep in _LEGACY_VAE_RENAMES:
            k = pat.sub(rep, k)
    return _merge_digits(k)


def _flatten(tree, prefix=()) -> List[Tuple[Tuple[str, ...], Any]]:
    out = []
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.extend(_flatten(v, prefix + (k,)))
    else:
        out.append((prefix, tree))
    return out


def _convert_tensor(t: np.ndarray, flax_leaf: str, flax_shape) -> np.ndarray:
    if flax_leaf == "kernel":
        if t.ndim == 2:
            t = t.T
        elif t.ndim == 4:
            t = t.transpose(2, 3, 1, 0)
    if tuple(t.shape) != tuple(flax_shape):
        # e.g. VAE attention projections stored as [C, C, 1, 1] conv in old
        # checkpoints but Dense here
        t = t.reshape(flax_shape)
    return t


def convert_state_dict(
    torch_sd: Dict[str, np.ndarray], flax_params: Dict[str, Any], component: str
) -> Dict[str, Any]:
    """Map a torch state dict onto the structure of ``flax_params``.

    Raises with a near-miss listing if any flax param is left unfilled.
    """
    flat = _flatten(flax_params)
    # index: normalized joined name -> path
    index: Dict[str, Tuple[str, ...]] = {}
    for path, leaf in flat:
        index["_".join(path)] = path

    out: Dict[str, Any] = jax.tree_util.tree_map(lambda x: None, flax_params)
    leaf_map = {"weight": ("kernel", "scale", "embedding"), "bias": ("bias",)}
    unmatched = []
    for tkey, tval in torch_sd.items():
        if tkey.endswith("position_ids"):  # transformers buffer, not a param
            continue
        norm = _normalize_torch_key(tkey, component)
        parts = norm.rsplit("_", 1)
        base, tleaf = (parts[0], parts[1]) if len(parts) == 2 else ("", parts[0])
        candidates = [base + "_" + fl for fl in leaf_map.get(tleaf, ())]
        candidates.append(norm)  # raw params like position_embedding
        if tleaf == "weight":
            candidates.append(base)  # raw param named without leaf
        path = next((index[c] for c in candidates if c in index), None)
        if path is None:
            unmatched.append(tkey)
            continue
        # fetch target shape
        node = flax_params
        for p in path:
            node = node[p]
        tgt = out
        for p in path[:-1]:
            tgt = tgt[p]
        tgt[path[-1]] = jnp.asarray(_convert_tensor(tval, path[-1], node.shape), node.dtype)

    missing = ["/".join(p) for p, v in _flatten(out) if v is None]
    if missing:
        raise ValueError(
            f"{component}: {len(missing)} flax params unfilled, e.g. {missing[:8]}; "
            f"{len(unmatched)} torch keys unmatched, e.g. {unmatched[:8]}"
        )
    return out


def load_component_params(
    checkpoint_dir: str, subfolder: str, flax_params: Dict[str, Any]
) -> Dict[str, Any]:
    sd = _load_state_dict(os.path.join(checkpoint_dir, subfolder))
    return convert_state_dict(sd, flax_params, subfolder)


def main(argv=None):
    """Offline converter CLI: diffusers checkpoint dir -> native msgpack.

    Usage: python -m guided_attention_tpu.models.convert <hf_dir> <out_dir>
           [--model sd15|sd21] [--dtype bfloat16|float32]

    Afterwards `StableDiffusion.create(model, checkpoint_dir=<out_dir>)`
    starts from a straight mmap-read instead of re-converting (the reference
    pays diffusers from_pretrained on every process, reference run.py:28).
    """
    import argparse

    import jax.numpy as jnp

    parser = argparse.ArgumentParser(description=main.__doc__)
    parser.add_argument("hf_dir", help="diffusers-format checkpoint directory")
    parser.add_argument("out_dir", help="output directory for native msgpack params")
    parser.add_argument("--model", default="sd15", choices=["sd15", "sd14", "sd21", "micro"])
    parser.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    args = parser.parse_args(argv)

    from guided_attention_tpu.models.bundle import StableDiffusion
    from guided_attention_tpu.models.io import save_params

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    bundle = StableDiffusion.create(args.model, dtype=dtype, checkpoint_dir=args.hf_dir)
    save_params(args.out_dir, bundle.params)
    # carry the tokenizer along so the converted dir is a full drop-in
    # (otherwise load_tokenizer silently falls back to SimpleTokenizer)
    tok_src = os.path.join(args.hf_dir, "tokenizer")
    if os.path.isdir(tok_src):
        import shutil

        shutil.copytree(tok_src, os.path.join(args.out_dir, "tokenizer"), dirs_exist_ok=True)
    n = len(jax.tree_util.tree_leaves(bundle.params))
    print(f"converted {n} tensors -> {args.out_dir}")


if __name__ == "__main__":
    main()
