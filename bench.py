"""Benchmark: guided 512x512 50-step SD1.5 generation, single chip.

Prints ONE JSON line to stdout: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is relative to the driver-set north star of 4 s/image on v5e-4
(BASELINE.json): vs_baseline = 4.0 / measured_sec_per_image (>1 beats it).

CONTRACT ORDERING (round-4 hardening): the stdout line is printed and
flushed IMMEDIATELY after the 5-rep single-sample measurement — before any
optional extras — so a slow tunnel episode during the sweep/batch sections
can no longer erase the round's official number (round 3's driver bench
timed out at rc=124 with parsed=null for exactly that reason). All extras
report on stderr only, and are skipped entirely once the wall-clock budget
(BENCH_BUDGET_S, default 300 s measured from after the headline) is spent.

Weights are random-init (no network egress for checkpoints); the compute is
identical to real SD1.5, so the timing is the true workload. Token binding
uses the hash-based SimpleTokenizer (models/tokenizer.py) — compute-identical
to real BPE, but every word maps to one token; multi-BPE-token binding is
covered by tests/test_transformers_golden.py, not here. The run uses
the reference's effective default hyperparameters (thresholds {0: 1.0},
recurse 3 until step 14, <=10 refinement iters, CFG 7.5 — reference
utils/shared_state.py:21, config.py:17-23) on the README two-object
meta-prompt.
"""
from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), ".jax_cache"))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

META_PROMPT = "a [robot:.6,.3,.4,.55] and a [blue vase:0,.3,.4,.55]"
BASELINE_SEC = 4.0
# extras budget, measured from the moment the headline is printed; the
# headline itself has no budget (it IS the contract)
EXTRAS_BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "300"))


def _stderr_info(info):
    print(json.dumps(info), file=sys.stderr, flush=True)


def main():
    t_start = time.time()
    quick = "--quick" in sys.argv
    model = "micro" if quick else "sd15"
    steps = 4 if quick else 50

    from guided_attention_tpu.models.bundle import StableDiffusion
    from guided_attention_tpu.runner import GuidedAttentionPipeline

    t0 = time.time()
    sd = StableDiffusion.create(model, dtype=jnp.float32 if quick else jnp.bfloat16)
    pipe = GuidedAttentionPipeline(sd)
    build_s = time.time() - t0

    def run(seed):
        return pipe(
            meta_prompt=META_PROMPT,
            seed=seed,
            num_inference_steps=steps,
            decode=True,
            # image-only path: per-step diagnostic tensors collapse to unit
            # placeholders so the scan output (and host transfer over the
            # remote tunnel) is a few KB instead of ~5 MB per image
            capture_diagnostics=False,
        )

    t0 = time.time()
    # warmup seed differs from every timed seed: the tunnel caches identical
    # executions, which would let times[0] read artificially fast
    out = run(99)
    warm_s = time.time() - t0

    # min over repetitions: the remote-tunnel host adds multi-second jitter
    # (observed 2.4-4.9 s for identical code across runs)
    times, runs = [], []
    for i, seed in enumerate((28, 42, 7, 3, 11)):
        t0 = time.time()
        out = run(seed)
        times.append(time.time() - t0)
        runs.append(out)
    sec = min(times)

    # Sanity-check the min-time run BEFORE printing the contract line: a
    # broken run (missing or NaN images) must not emit an official-looking
    # headline number. Cheap: images are already host numpy (pulled by the
    # timing loop), so these add zero tunnel roundtrips.
    import numpy as _np

    out = runs[times.index(sec)]
    assert out.images is not None and out.images.shape[-1] == 3
    # images are u8-quantized (finite by construction); the NaN-poisoning
    # signal lives in the float latents, also already host-side
    assert _np.isfinite(_np.asarray(out.latents, _np.float32)).all(), (
        "non-finite latents in benched run"
    )
    assert out.images.std() > 0, "degenerate (constant) benched image"

    # ---- CONTRACT LINE: print + flush NOW, before any optional extras ----
    metric = (
        "sec/image (SMOKE: micro model, 4 steps)"
        if quick
        else "sec/image (512x512, 50-step DDIM + guidance, SD1.5)"
    )
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(sec, 3),
                "unit": "s",
                "vs_baseline": round(BASELINE_SEC / sec, 3),
            }
        ),
        flush=True,
    )
    t_headline = time.time()

    # MFU numerator and denominator must come from the SAME run: eval counts
    # are seed-dependent (the refinement while_loop exits on threshold)
    d = out.diagnostics

    # MFU: analytic executed-FLOPs from this run's own control-flow counters
    # (runtime/flops.py, validated vs XLA cost_analysis in tests/test_flops.py)
    from guided_attention_tpu.runtime.flops import (
        V5E_BF16_PEAK_FLOPS, generation_flops, mfu, unet_forward_flops,
    )

    gen_fl = generation_flops(pipe.sd.config.unet, d, steps)
    info = {
        "build_s": round(build_s, 1),
        "warmup_s": round(warm_s, 1),
        "times": [round(t, 3) for t in times],
        "refine_iters_step0": int(d.refine_iters[0]),
        "recursions_step0": int(d.recursions[0]),
        "unet_fwd_gflops": round(unet_forward_flops(pipe.sd.config.unet) / 1e9, 1),
        "generation_tflops": round(gen_fl / 1e12, 2),
        "mfu_pct_vs_v5e_peak": round(100 * mfu(gen_fl, sec, V5E_BF16_PEAK_FLOPS), 1),
        "device": str(jax.devices()[0]),
        "total_s": round(time.time() - t_start, 1),
    }
    # flush the core info line before any extra that might stall
    _stderr_info(info)

    def budget_left():
        return EXTRAS_BUDGET_S - (time.time() - t_headline)

    # pipelined seed sweep: issue run i+1 BEFORE pulling run i (JAX arrays
    # are futures) — the sustained s/image a CLI sweep actually achieves,
    # with the host tail (dispatch + pull) overlapped with device compute
    if budget_left() > 0:
        try:
            def dispatch(seed):
                return pipe.dispatch(
                    meta_prompt=META_PROMPT, seed=seed, num_inference_steps=steps,
                    decode=True, capture_diagnostics=False,
                )

            sweep_seeds = (101, 102, 103, 104, 105)
            t0 = time.time()
            pending = dispatch(sweep_seeds[0])
            for s in sweep_seeds[1:]:
                nxt = dispatch(s)
                pending.result()
                pending = nxt
            pending.result()
            info["sweep_s_per_image"] = round((time.time() - t0) / len(sweep_seeds), 3)
        except Exception as e:  # noqa: BLE001 — throughput info is best-effort
            info["sweep_error"] = repr(e)[:200]
    else:
        info["sweep_skipped"] = "budget"

    # batch-8 amortized throughput (the number that projects to the v5e-4
    # target; PERF.md seed-batch table) — best-effort, budget-gated: the
    # batch compile + 3 executions ride the same tunnel with documented
    # multi-second-to-26.9-s/image episodes
    if not quick and "--single-only" not in sys.argv and budget_left() > 30:
        try:
            bseeds = list(range(201, 209))
            pipe.generate_batch(  # warmup/compile
                bseeds, meta_prompt=META_PROMPT, num_inference_steps=steps,
                capture_diagnostics=False,
            )
            # min over reps: a single timed call can absorb a multi-second
            # tunnel episode (observed 26.9 s/image once vs 1.44 steady)
            bt = []
            for rep in (50, 75):
                if budget_left() < 0:
                    break
                t0 = time.time()
                outs = pipe.generate_batch(
                    [s + rep for s in bseeds], meta_prompt=META_PROMPT,
                    num_inference_steps=steps, capture_diagnostics=False,
                )
                assert outs[0].images is not None
                bt.append((time.time() - t0) / len(bseeds))
            if bt:
                info["batch8_s_per_image"] = round(min(bt), 3)
            # sustained chunked throughput: depth-2 pipelined dispatch_batch
            # (the CLI batch-sweep path; same compiled programs as above)
            if budget_left() > 0:
                t0 = time.time()
                pend = pipe.dispatch_batch(
                    [s + 100 for s in bseeds], meta_prompt=META_PROMPT,
                    num_inference_steps=steps, capture_diagnostics=False,
                )
                nxt = pipe.dispatch_batch(
                    [s + 150 for s in bseeds], meta_prompt=META_PROMPT,
                    num_inference_steps=steps, capture_diagnostics=False,
                )
                pend.result()
                nxt.result()
                info["batch8_pipelined_s_per_image"] = round(
                    (time.time() - t0) / (2 * len(bseeds)), 3
                )
        except Exception as e:  # noqa: BLE001 — throughput info is best-effort
            info["batch8_error"] = repr(e)[:200]
    elif not quick and "--single-only" not in sys.argv:
        info["batch8_skipped"] = "budget"

    info["total_s"] = round(time.time() - t_start, 1)
    _stderr_info(info)


if __name__ == "__main__":
    main()
