"""CLI entry + orchestration (the reference's run.py, re-designed).

Every RunConfig field is a --flag (the reference uses pyrallis,
run.py:235-236; here a dataclass-driven argparse so no extra deps). The
execute loop iterates seeds x hyperparameter states (reference run.py:93-135)
but each state's batch of seeds can run as ONE sharded program over the
device mesh instead of a serial loop.

Usage:
  python -m guided_attention_tpu.frontends.cli --meta_prompt "a [robot:.6,.3,.4,.55] and a [vase:0,.3,.4,.55]" --seeds 28 42
"""
from __future__ import annotations

import argparse
import dataclasses
import json
from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np

from guided_attention_tpu.config import HyperParams, RunConfig, get_hyperparam_states
from guided_attention_tpu.guidance.custom import default_registry
from guided_attention_tpu.parallel.multihost import initialize as multihost_initialize, is_primary
from guided_attention_tpu.runtime.artifacts import (
    annotate_image,
    image_grid,
    to_pil,
    write_run_artifacts,
)


def _add_dataclass_args(parser: argparse.ArgumentParser, cls) -> None:
    for f in dataclasses.fields(cls):
        if f.name in ("prompt",):
            continue
        default = f.default if f.default is not dataclasses.MISSING else None
        if f.default_factory is not dataclasses.MISSING:  # type: ignore
            default = f.default_factory()  # type: ignore
        arg = f"--{f.name}"
        if f.type in ("bool", bool):
            parser.add_argument(arg, type=lambda s: s.lower() in ("1", "true", "yes"), default=default)
        elif f.type in ("int", int, "Optional[int]"):
            parser.add_argument(arg, type=int, default=default)
        elif f.type in ("float", float, "Optional[float]"):
            parser.add_argument(arg, type=float, default=default)
        elif f.name == "seeds":
            parser.add_argument(arg, type=int, nargs="+", default=default)
        elif f.name == "meta_prompts":
            parser.add_argument(arg, type=str, nargs="+", default=default)
        elif f.name in ("thresholds", "mesh_shape", "hyperparam_iterations"):
            parser.add_argument(arg, type=json.loads, default=default)
        elif f.name == "scale_range":
            parser.add_argument(arg, type=float, nargs=2, default=default)
        else:
            parser.add_argument(arg, type=str, default=default)


def parse_args(argv: Optional[List[str]] = None) -> RunConfig:
    parser = argparse.ArgumentParser(description=__doc__)
    _add_dataclass_args(parser, RunConfig)
    ns = parser.parse_args(argv)
    kwargs = {f.name: getattr(ns, f.name) for f in dataclasses.fields(RunConfig) if hasattr(ns, f.name)}
    if isinstance(kwargs.get("thresholds"), dict):
        kwargs["thresholds"] = {int(k): float(v) for k, v in kwargs["thresholds"].items()}
    if isinstance(kwargs.get("output_path"), str):
        kwargs["output_path"] = Path(kwargs["output_path"])
    if isinstance(kwargs.get("scale_range"), list):
        kwargs["scale_range"] = tuple(kwargs["scale_range"])
    config = RunConfig(**kwargs)
    argv_list = argv if argv is not None else list(__import__("sys").argv[1:])
    config._thresholds_explicit = "--thresholds" in argv_list
    return config


def setup(config: RunConfig):
    """Load the model + build the pipeline (reference run.py:139-145)."""
    from guided_attention_tpu.runner import pipeline_from_config

    pipe = pipeline_from_config(config)
    return pipe


def get_indices_to_alter(pipe, prompt: str) -> List[int]:
    """Interactive token-index picker (reference run.py:32-41; note the
    reference defines this but never calls it — kept for API parity)."""
    import pprint

    ids = pipe.sd.tokenizer.encode(prompt)
    token_idx_to_word = {
        idx: pipe.sd.tokenizer.decode([t]) for idx, t in enumerate(ids) if 0 < idx < len(ids) - 1
    }
    pprint.pprint(token_idx_to_word)
    token_indices = input("Comma-separated indices of tokens to alter (e.g. 2,5): ")
    token_indices = [int(i) for i in token_indices.split(",")]
    print(f"Altering tokens: {[token_idx_to_word[i] for i in token_indices]}")
    return token_indices


def state_prompts(config: RunConfig, hp: HyperParams) -> List[str]:
    """Meta-prompts for one sweep state. Precedence parity (reference
    run.py:75-79): a state's meta_prompt override outranks config-level
    prompts (including --meta_prompts); otherwise the CLI grid of
    --meta_prompts (or the single --meta_prompt) applies."""
    if hp.meta_prompt:
        return [hp.meta_prompt]
    return list(config.meta_prompts) if config.meta_prompts else [config.meta_prompt]


def plan_batch_chunks(config: RunConfig, states: List[HyperParams]):
    """The batched sweep's work plan: per sweep state, the (prompt x seed)
    grid chunked into batch_size slices. Returns [(hp, [(meta_prompt, seed),
    ...])] in execution order — pure so the grid/precedence logic is testable
    without compiling a pipeline."""
    chunks = []
    for hp in states:
        pairs = [(mp, s) for mp in state_prompts(config, hp) for s in config.seeds]
        for lo in range(0, len(pairs), config.batch_size):
            chunks.append((hp, pairs[lo : lo + config.batch_size]))
    return chunks


def execute(config: RunConfig, pipe, hyperparam_iterations: Optional[List[Dict[str, Any]]] = None):
    """Seeds x hyperparameter sweep with artifact output
    (reference run.py:93-135)."""
    config.ensure_output_dir()
    if hyperparam_iterations is None:
        hyperparam_iterations = config.hyperparam_iterations
    # Precedence parity (reference run.py:75-79 + shared_state.py:21): the
    # sweep base state's thresholds ({0: 1.0}) override RunConfig's default
    # thresholds; an explicitly provided --thresholds replaces the base.
    base_hp = HyperParams()
    if getattr(config, "_thresholds_explicit", False):
        base_hp = base_hp.replace(thresholds=dict(config.thresholds))
    images = []
    image_path = None

    # level-0 sweeps only read the heavy per-step diag stacks at steps
    # [0,1,2] (x0 preds) — slice them on device before the pull, like the
    # serving/GUI frontends (save_individual_ca_maps needs full latent_in).
    # Applied at the dispatch sites only: the resumable paths persist
    # full-run state and their kwargs feed PrepareOptions directly.
    trim = config.diagnostic_level == 0 and not config.save_individual_ca_maps

    def run_kwargs(hp):
        return dict(
            num_inference_steps=config.n_inference_steps,
            guidance_scale=config.guidance_scale,
            max_iter_to_alter=config.max_iter_to_alter,
            attention_res=config.attention_res,
            run_standard_sd=config.run_standard_sd,
            hp=hp,
            scale_factor=config.scale_factor,
            scale_range=config.scale_range,
            smooth_attentions=config.smooth_attentions,
            sigma=config.sigma,
            kernel_size=config.kernel_size,
            sd_2_1=config.sd_2_1,
            only_update_on_threshold_steps=config.only_update_on_threshold_steps,
            sub_prompt_avg_within=config.sub_prompt_avg_within,
            skip_inert_guidance_passes=config.skip_inert_guidance_passes,
            diagnostic_level=config.diagnostic_level,
            capture_eval_maps=config.save_all_maps,
            # per-subiter pred_pre_optim snapshots (reference pipeline:517-535)
            capture_eval_latents=config.diagnostic_level > 0,
            eta=config.eta,
        )

    # Gather (seed, hyperparam-state, output) work items. With batch_size > 1
    # the per-state seed batch runs as ONE sharded program over the device
    # mesh (the reference loops seeds serially, run.py:97-98).
    # --mesh_shape (e.g. '{"data": 2, "tensor": 2}') selects the mesh
    # explicitly; default is pure data parallelism sized to the batch. An
    # explicit mesh routes even batch_size=1 runs through the batch engine
    # (a {"data":1,"tensor":2} request is legitimate single-sample TP — the
    # single-stream paths cannot shard), and chunks pad up to the data axis
    # (repeating the last sample, padded outputs dropped) so a trailing
    # partial chunk can't crash pjit's divisibility check mid-sweep.
    mesh = None
    data_ax = 1
    if config.mesh_shape:
        from guided_attention_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(config.mesh_shape)
        data_ax = dict(mesh.shape).get("data", 1)

    def pad_chunk(chunk):
        return chunk + [chunk[-1]] * ((-len(chunk)) % data_ax)

    work = []
    if config.batch_size > 1 or mesh is not None:
        # (prompt x seed) grid per sweep state, chunked into sharded batches;
        # with multiple prompts each batch is a MULTI-PROMPT program (BASELINE
        # config 5) — per-sample specs/embeddings, one compile. Chunks
        # pipeline at depth 2 (dispatch chunk i+1 before pulling chunk i),
        # overlapping the host tail with device compute like the single path.
        chunks = plan_batch_chunks(config, get_hyperparam_states(base_hp, hyperparam_iterations))

        if config.checkpoint_every > 0:
            # resumable sharded batches: each chunk persists whole-batch
            # state every N steps (runner.generate_batch_resumable). Serial
            # by nature — checkpoint writes order the stream, so chunks do
            # not pipeline here.
            state_dir = str(config.state_dir or (config.output_path / "state"))
            for hp, chunk in chunks:
                padded = pad_chunk(chunk)
                chunk_seeds = [s for _, s in padded]
                chunk_prompts = [mp for mp, _ in padded]
                print(
                    f"Seeds (sharded batch, resumable every "
                    f"{config.checkpoint_every} steps): {chunk_seeds}"
                )
                prompt_kw = (
                    dict(meta_prompt=chunk_prompts[0])
                    if len(set(chunk_prompts)) == 1
                    else dict(meta_prompts=chunk_prompts)
                )
                outs = pipe.generate_batch_resumable(
                    chunk_seeds,
                    checkpoint_every=config.checkpoint_every,
                    state_dir=state_dir,
                    mesh=mesh,
                    **prompt_kw,
                    **run_kwargs(hp),
                )
                if outs and outs[0].resumed_from_step:
                    print(f"  resumed from step {outs[0].resumed_from_step}")
                # zip against the UNpadded chunk: padded outputs are dropped
                work.extend((s, hp, mp, o) for (mp, s), o in zip(chunk, outs))
            chunks = []

        def drain_batch(item):
            hp, chunk, pb = item
            work.extend((s, hp, mp, o) for (mp, s), o in zip(chunk, pb.result()))

        pending = None
        for hp, chunk in chunks:
            padded = pad_chunk(chunk)
            chunk_seeds = [s for _, s in padded]
            chunk_prompts = [mp for mp, _ in padded]
            print(f"Seeds (sharded batch): {chunk_seeds}")
            if len(set(chunk_prompts)) == 1:
                pb = pipe.dispatch_batch(
                    chunk_seeds, meta_prompt=chunk_prompts[0], mesh=mesh,
                    trim_heavy_diags=trim, **run_kwargs(hp)
                )
            else:
                pb = pipe.dispatch_batch(
                    chunk_seeds, meta_prompts=chunk_prompts, mesh=mesh,
                    trim_heavy_diags=trim, **run_kwargs(hp)
                )
            if pending is not None:
                drain_batch(pending)
            pending = (hp, chunk, pb)
        if pending is not None:
            drain_batch(pending)
    elif config.checkpoint_every > 0:
        # resumable sweep: persist generation state every N steps so a
        # preempted/crashed run re-invoked with the same flags continues
        # exactly where it stopped (runtime/checkpoint.py). Serial by
        # nature — checkpoint writes order the stream.
        state_dir = str(config.state_dir or (config.output_path / "state"))
        for seed in config.seeds:
            for hp in get_hyperparam_states(base_hp, hyperparam_iterations):
                for mp in state_prompts(config, hp):
                    print(f"Seed: {seed} (resumable, every {config.checkpoint_every} steps)")
                    out = pipe.generate_resumable(
                        seed=seed,
                        checkpoint_every=config.checkpoint_every,
                        state_dir=state_dir,
                        meta_prompt=mp,
                        **run_kwargs(hp),
                    )
                    if out.resumed_from_step:
                        print(f"  resumed from step {out.resumed_from_step}")
                    work.append((seed, hp, mp, out))
    else:
        # depth-2 pipelined sweep: dispatch run i+1 BEFORE pulling run i's
        # results — JAX arrays are futures, so seed i's host tail (dispatch +
        # device->host transfer, ~0.1-0.2 s on remote TPUs) overlaps seed
        # i+1's device compute. Semantically identical to the serial loop.
        runs = [
            (mp, seed, hp)
            for seed in config.seeds
            for hp in get_hyperparam_states(base_hp, hyperparam_iterations)
            for mp in state_prompts(config, hp)
        ]
        def drain(item):
            s, h, mp, p = item
            work.append((s, h, mp, p.result()))

        pending = None
        for meta_prompt, seed, hp in runs:
            print(f"Seed: {seed}")
            nxt = (seed, hp, meta_prompt, pipe.dispatch(meta_prompt=meta_prompt, seed=seed, trim_heavy_diags=trim, **run_kwargs(hp)))
            if pending is not None:
                drain(pending)
            pending = nxt
        if pending is not None:
            drain(pending)

    if not work:  # empty --seeds: nothing generated, nothing to grid
        return None
    if not is_primary():  # multi-host: artifacts are host 0's job
        return None

    for seed, hp, meta_prompt, out in work:
        img, image_path, writer = write_run_artifacts(
            pipe,
            out,
            output_path=config.output_path,
            seed=seed,
            hp=hp,
            meta_prompt=meta_prompt,
            interactive=config.interactive,
            annotate=config.annotate,
            save_cross_attention_maps=config.save_cross_attention_maps,
            diagnostic_level=config.diagnostic_level,
            save_all_maps=config.save_all_maps,
            save_individual_ca_maps_flag=config.save_individual_ca_maps,
        )
        images.append(img)

    grid = image_grid(images)
    if not config.interactive:
        # parity: the reference annotates the grid with whatever annotations
        # the LAST run left in shared_state (run.py:132-133)
        annotate_image(grid, out.annotations, size=grid.size[0])
    grid.save(config.output_path / f"{writer.clean}.png")
    return image_path


def main(argv: Optional[List[str]] = None):
    config = parse_args(argv)
    # multi-host: must happen before any backend touch (no-op single-host)
    multihost_initialize(config.coordinator_address, config.num_processes, config.process_id)
    pipe = setup(config)
    # default custom-loss registrations happen in the pipeline's registry
    if config.interactive:
        from guided_attention_tpu.frontends.gui import run_server

        run_server(config, pipe)
    elif config.profile_dir:
        import jax

        with jax.profiler.trace(str(config.profile_dir)):
            execute(config, pipe)
        print(f"profiler trace written to {config.profile_dir}")
    else:
        execute(config, pipe)


if __name__ == "__main__":
    main()
