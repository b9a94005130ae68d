"""Sharded multi-seed / multi-prompt batch generation.

Replaces the reference's serial seed x hyperparameter Python loop
(reference run.py:97-98) with one compiled program: the single-sample
generate fn (pipeline.build_generate_raw) is vmapped over the batch and
jitted with the batch axis sharded over the mesh's "data" axis; UNet
params follow the TP rules over "tensor" (parallel/mesh.py). XLA GSPMD
inserts all collectives; there is no hand-written communication because the
algorithm needs none across samples (SURVEY.md §2.3).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from guided_attention_tpu.config import HyperParams
from guided_attention_tpu.parallel.mesh import DEFAULT_TP_RULES, param_shardings
from guided_attention_tpu.pipeline import GenStatics, build_generate_raw


def _vmap_safe_bundle(sd):
    """vmap adds a grid dimension to the Pallas flash kernels; the backward's
    128 query block then overflows the ~16 MB scoped VMEM by ~0.1 MB at
    batch 4. Rebuild the bundle with the 64 block (params are unaffected)."""
    if not sd.config.unet.use_flash_attention or sd.config.unet.flash_bwd_block <= 64:
        return sd
    from guided_attention_tpu.models.unet import UNet2DCondition

    ucfg = dataclasses.replace(sd.config.unet, flash_bwd_block=64)
    cfg = dataclasses.replace(sd.config, unet=ucfg)
    return dataclasses.replace(sd, config=cfg, unet=UNet2DCondition(ucfg))


def build_batch_generate(
    sd,
    statics: GenStatics,
    hp: HyperParams,
    mesh: Mesh,
    per_prompt_emb: bool = False,
    per_prompt_spec: bool = False,
    tp_rules=DEFAULT_TP_RULES,
    segment_len=None,
):
    """Returns ``generate(params, emb, latents0, spec, sched, arrays, keys)``
    over a leading batch axis on latents0/keys (and emb/spec when the
    per_prompt_* flags are set — specs must share their static structure,
    i.e. the same number of sub-prompt groups and custom losses).

    ``segment_len=L`` makes it scan only the L steps [start, start+L) with a
    trailing TRACED ``start`` argument (shared by the whole batch) — the
    checkpoint/resume building block (runtime/checkpoint.py). Multi-process:
    ``start`` is glued as a replicated global scalar alongside the other
    args (every host passes the same value — segment bounds are derived
    from the shared run config).
    """
    raw = build_generate_raw(_vmap_safe_bundle(sd), statics, hp, segment_len=segment_len)
    seg_extra = () if segment_len is None else (None,)
    vmapped = jax.vmap(
        raw,
        in_axes=(
            None,  # params
            0 if per_prompt_emb else None,
            0,  # latents0
            0 if per_prompt_spec else None,
            None,  # sched
            None,  # arrays
            0,  # keys
        )
        + seg_extra,  # start: one scalar for the whole batch
    )

    data = P("data")
    replicated = NamedSharding(mesh, P())
    batched = NamedSharding(mesh, data)

    def arg_shardings(params):
        return (
            param_shardings(params, mesh, tp_rules),
            batched if per_prompt_emb else replicated,
            batched,
            batched if per_prompt_spec else replicated,
            replicated,
            replicated,
            batched,
        ) + ((replicated,) if segment_len is not None else ())

    def make(params):
        return jax.jit(
            vmapped,
            in_shardings=arg_shardings(params),
            out_shardings=(batched, batched),
            donate_argnums=(2,),
        )

    # in_shardings depend on the param tree's paths/shapes, so the jit
    # instance is cached per tree structure (not per bundle identity — a
    # swapped sd.params tree must not silently reuse stale shardings)
    cache = {}

    def _params_key(params):
        flat, treedef = jax.tree_util.tree_flatten(params)
        return (treedef, tuple((tuple(l.shape), str(l.dtype)) for l in flat))

    def _to_global(params, emb, latents0, spec, sched, arrays, keys, *start):
        """Multi-process: build global arrays from host-local values.

        Every process passes identical replicated args (params/sched/arrays/
        start — same seeds and config everywhere) and its OWN slice of the
        batched args (latents0/keys, and emb/spec in per-prompt mode, sliced
        by process index), glued into one global array over the mesh
        (multihost_utils)."""
        import numpy as np
        from jax.experimental import multihost_utils as mh

        from guided_attention_tpu.parallel.multihost import local_batch_slice

        # Replicated params are glued with the TP partition specs, which is
        # only correct while every 'tensor'-axis group lives on ONE process
        # (otherwise each host's full param would be treated as a local
        # shard and build an oversized global array). Data-axis-only
        # multi-host is the supported layout; fail loudly on anything else.
        if mesh.shape.get("tensor", 1) > 1:
            t_ax = mesh.axis_names.index("tensor")
            rows = np.moveaxis(mesh.devices, t_ax, -1).reshape(-1, mesh.shape["tensor"])
            for row in rows:
                if len({d.process_index for d in row}) != 1:
                    raise ValueError(
                        "multi-process generate_batch requires the 'tensor' mesh axis "
                        "to be process-local (shard 'data' across hosts, 'tensor' "
                        "within a host)"
                    )

        sl = local_batch_slice(latents0.shape[0])
        params_spec = jax.tree_util.tree_map(
            lambda s: s.spec, param_shardings(params, mesh, tp_rules)
        )
        params = mh.host_local_array_to_global_array(params, mesh, params_spec)
        rep, bat = P(), P("data")

        def batched_local(tree):
            # per-prompt args carry the FULL batch on every host; glue this
            # host's slice, like latents0/keys
            return jax.tree_util.tree_map(lambda x: np.asarray(x)[sl], tree)

        if per_prompt_emb:
            emb = mh.host_local_array_to_global_array(batched_local(emb), mesh, bat)
        else:
            emb = mh.host_local_array_to_global_array(emb, mesh, rep)
        if per_prompt_spec:
            spec = mh.host_local_array_to_global_array(batched_local(spec), mesh, bat)
        else:
            spec = mh.host_local_array_to_global_array(spec, mesh, rep)
        sched = mh.host_local_array_to_global_array(sched, mesh, rep)
        arrays = mh.host_local_array_to_global_array(arrays, mesh, rep)
        latents0 = mh.host_local_array_to_global_array(np.asarray(latents0)[sl], mesh, bat)
        keys = mh.host_local_array_to_global_array(np.asarray(keys)[sl], mesh, bat)
        start = tuple(
            mh.host_local_array_to_global_array(np.asarray(s), mesh, rep) for s in start
        )
        return (params, emb, latents0, spec, sched, arrays, keys) + start

    def jit_for(params):
        """The underlying jitted callable for this param tree (exposed for
        AOT introspection: scripts/profile_guided.dump_fused_hlo lowers it
        to dump the batch program's optimized HLO)."""
        key = _params_key(params)
        if key not in cache:
            cache[key] = make(params)
        return cache[key]

    def generate(params, emb, latents0, spec, sched, arrays, keys, *start):
        fn = jit_for(params)
        if jax.process_count() > 1:
            params, emb, latents0, spec, sched, arrays, keys, *start = _to_global(
                params, emb, latents0, spec, sched, arrays, keys, *start
            )
        return fn(params, emb, latents0, spec, sched, arrays, keys, *start)

    generate.jit_for = jit_for
    return generate
