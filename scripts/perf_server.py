"""Sustained serving throughput through the micro-batching engine on the
current device (the production path: frontends/server.BatchingEngine).

Measures s/image for a saturated closed-loop client population — N client
threads each keep one request in flight until the budget is spent — at a
few concurrency levels. At concurrency >= 8 the engine should coalesce to
bucket-8 batches and sustain the pipelined batch-8 number (docs/PERF.md:
1.41 s/image); low concurrency degrades gracefully to smaller buckets.

  python scripts/perf_server.py [--requests N] [--concurrency C ...]
"""
from __future__ import annotations

import os
import sys
import threading
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


def run_load(engine, n_requests: int, concurrency: int, artifact_dir=None) -> float:
    """Closed loop: `concurrency` clients, one request in flight each.

    ``artifact_dir`` emulates the HTTP handler's save_artifacts path
    (VERDICT r3 weak #7 — does artifact disk IO back up the handler
    threads?): each client, after its pull, writes the full reference
    artifact tree under the same lock discipline as frontends/server.py."""
    import itertools

    import numpy as np

    seeds = iter(range(1, n_requests + 1))
    lock = threading.Lock()
    done = []
    req_ids = itertools.count()
    knobs = {}
    if artifact_dir is not None:
        from pathlib import Path

        from guided_attention_tpu.config import HyperParams
        from guided_attention_tpu.runtime.artifacts import write_run_artifacts

        # mirror the HTTP handler: diagnostics on, heavy per-step stacks
        # trimmed to the always_save_iter steps before the pull; level-0
        # writes run CONCURRENTLY (no artifact lock) — serializing them
        # idled the device under the closed loop. Pre-warm the x0-decode
        # jit (the server's --warmup does the same) so the first write
        # doesn't compile inside the timed region.
        knobs = dict(capture_diagnostics=True, trim_heavy_diags=True)
        sd = engine.pipe.sd
        z = jnp.zeros(
            (3, sd.config.latent_size, sd.config.latent_size, sd.config.unet.in_channels),
            jnp.float16,
        )
        np.asarray(sd.decode_latents(z))

    def client(i):
        while True:
            with lock:
                seed = next(seeds, None)
            if seed is None:
                return
            prompt = META if seed % 2 else META2  # mixed-prompt traffic
            out = engine.submit(prompt, seed=seed, **knobs).result(timeout=1200)
            assert out.images is not None
            if artifact_dir is not None:
                write_run_artifacts(
                    engine.pipe, out,
                    output_path=Path(artifact_dir) / f"req{next(req_ids):06d}",
                    seed=seed, hp=HyperParams(), meta_prompt=prompt,
                )
            done.append(seed)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(concurrency)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.time() - t0
    assert len(done) == n_requests
    return dt / n_requests


def main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--requests", type=int, default=24, help="requests per load level")
    ap.add_argument("--artifacts", default=None, metavar="DIR",
                    help="also measure each level with full artifact trees written to DIR")
    ap.add_argument("--buckets", default="4,8",
                    help="engine batch buckets (comma-separated); a smaller "
                    "set compiles fewer programs — use '8' for a pure "
                    "saturation measurement on a cold compile cache")
    ap.add_argument("concurrency", type=int, nargs="*", default=[8, 4],
                    help="closed-loop client counts to measure")
    args = ap.parse_args()
    n_requests, concurrencies = args.requests, args.concurrency
    buckets = tuple(int(b) for b in args.buckets.split(","))

    from guided_attention_tpu.frontends.server import BatchingEngine
    from guided_attention_tpu.models.bundle import StableDiffusion
    from guided_attention_tpu.runner import GuidedAttentionPipeline

    t0 = time.time()
    sd = StableDiffusion.create("sd15", dtype=jnp.bfloat16)
    pipe = GuidedAttentionPipeline(sd)
    print(f"build {time.time()-t0:.1f}s  device {jax.devices()[0]}", file=sys.stderr)

    # production config for steady >=4-concurrent traffic: min bucket 4 so a
    # straggler group never compiles a cold batch-1/2 program mid-serve
    engine = BatchingEngine(pipe, max_wait_ms=150.0, buckets=buckets)
    # warmup: compile every program the load can hit — both buckets, in BOTH
    # variants (shared-prompt for padded straggler groups, multi-prompt for
    # mixed traffic; per_prompt is in the runner's batch-program cache key)
    for n in buckets:
        for label, mk in (("same", lambda i: META), ("mixed", lambda i: META if i % 2 else META2)):
            t0 = time.time()
            warm = [engine.submit(mk(i), seed=1000 * n + i) for i in range(n)]
            for t in warm:
                t.result(timeout=3600)
            print(f"warmup bucket {n} ({label}): {time.time()-t0:.1f}s", file=sys.stderr)

    for c in concurrencies:
        before = dict(engine.stats["batch_sizes"])
        pad_before = engine.stats["padded_samples"]
        s_per_img = run_load(engine, n_requests, c)
        after = engine.stats["batch_sizes"]
        used = {k: after.get(k, 0) - before.get(k, 0) for k in after if after.get(k, 0) != before.get(k, 0)}
        print(f"concurrency {c:2d}: {s_per_img:.3f} s/image sustained "
              f"({n_requests} reqs, buckets used {used}, "
              f"padded {engine.stats['padded_samples'] - pad_before})")
        if args.artifacts:
            # capture_diagnostics=True is a different compiled program per
            # (bucket, prompt-variant) — warm ALL of them before timing.
            # The closed loop's staggered resubmits form PARTIAL groups, so
            # smaller buckets get hit too; an unwarmed bucket put a cold
            # ~60-90 s batch compile inside the timed loop (the round-4
            # artifact-probe mystery: 7.2 s/image that was really 2 s/image
            # plus one compile).
            for b in engine.buckets:
                for mk in (lambda i: META, lambda i: META if i % 2 else META2):
                    warm = [engine.submit(mk(i), seed=5000 + 100 * b + i,
                                          capture_diagnostics=True,
                                          trim_heavy_diags=True)
                            for i in range(b)]
                    for t in warm:
                        t.result(timeout=3600)
            before_a = dict(engine.stats["batch_sizes"])
            s_art = run_load(engine, n_requests, c, artifact_dir=args.artifacts)
            after_a = engine.stats["batch_sizes"]
            used_a = {k: after_a.get(k, 0) - before_a.get(k, 0)
                      for k in after_a if after_a.get(k, 0) != before_a.get(k, 0)}
            print(f"concurrency {c:2d}: {s_art:.3f} s/image with full artifact trees "
                  f"(+{100 * (s_art - s_per_img) / s_per_img:.1f}%, buckets {used_a})")
    engine.close()


if __name__ == "__main__":
    main()
