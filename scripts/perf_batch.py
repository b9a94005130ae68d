"""Amortized sec/image for the sharded/vmapped seed-batch engine on the
current device set (BASELINE.json config 5: '8 seeds/batch multi-prompt
generation'). On one chip the batch rides vmap; on a mesh it shards over
the data axis.

  python scripts/perf_batch.py [--remat] [batch_size ...]   (default: 4 8)

--remat: jax.checkpoint the guidance eval (recompute its forward in the
backward) — the HBM-pressure experiment for batch >= 16.
--multi: alternate two meta-prompts across the batch (per-sample specs +
embeddings in the one compiled program — BASELINE config 5's multi-prompt
generation at SD scale).
--pipelined: measure a depth-2 pipelined sweep of 3 consecutive chunks
(dispatch_batch chunk i+1 before pulling chunk i — the CLI batch path),
the sustained s/image a chunked seed sweep actually achieves.
"""
from __future__ import annotations

import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

META = "a [robot:.6,.3,.4,.55] and a [blue vase:0,.3,.4,.55]"
META2 = "a [robot:0,.1,.45,.5] and a [blue vase:.55,.4,.4,.5]"


def main():
    args = sys.argv[1:]
    remat = "--remat" in args
    multi = "--multi" in args
    pipelined = "--pipelined" in args
    model = "sd15"
    if "--model" in args:
        i = args.index("--model")
        model = args[i + 1]
        del args[i : i + 2]
    sizes = [int(a) for a in args if not a.startswith("--")] or [4, 8]

    from guided_attention_tpu.models.bundle import StableDiffusion
    from guided_attention_tpu.runner import GuidedAttentionPipeline

    t0 = time.time()
    sd = StableDiffusion.create(model, dtype=jnp.bfloat16)
    pipe = GuidedAttentionPipeline(sd)
    print(f"build {model} {time.time()-t0:.1f}s", file=sys.stderr)

    for B in sizes:
        try:
            kw = dict(capture_diagnostics=False, remat_guidance_eval=remat)
            if model == "sd21":
                kw["sd_2_1"] = True  # EOT-normalized spec (reference --sd_2_1)
            if multi:
                kw["meta_prompts"] = [META, META2] * (B // 2) + [META] * (B % 2)
            else:
                kw["meta_prompt"] = META
            t0 = time.time()
            pipe.generate_batch(list(range(100, 100 + B)), **kw)
            warm = time.time() - t0
            times = []
            for rep in range(3):
                seeds = list(range(200 + rep * B, 200 + (rep + 1) * B))
                t0 = time.time()
                outs = pipe.generate_batch(seeds, **kw)
                times.append(time.time() - t0)
            best = min(times)
            assert outs[0].images is not None
            tag = (" [remat]" if remat else "") + (" [multi-prompt]" if multi else "")
            print(
                f"batch {B}{tag}: {best/B:.3f} s/image amortized "
                f"({best:.2f} s/batch, warmup {warm:.1f}s, walls {[round(t,2) for t in times]})"
            )
            if pipelined:
                n_chunks = 3
                t0 = time.time()
                pending = pipe.dispatch_batch(list(range(300, 300 + B)), **kw)
                for c in range(1, n_chunks):
                    nxt = pipe.dispatch_batch(list(range(300 + c * B, 300 + (c + 1) * B)), **kw)
                    pending.result()
                    pending = nxt
                pending.result()
                sustained = (time.time() - t0) / (n_chunks * B)
                print(f"batch {B}{tag} pipelined x{n_chunks}: {sustained:.3f} s/image sustained")
        except Exception as e:
            print(f"batch {B}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
