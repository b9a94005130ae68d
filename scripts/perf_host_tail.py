"""Split the single-call host tail (VERDICT r5 #7): dispatch RTT vs pull.

The fused generate program runs ~1.49 s on-device (PERF.md trace) but a
single pipe() call walls ~1.6 s — where do the ~110 ms go? This measures,
over several alternated reps (the tunnel caches identical executions —
seeds vary):

  * t_dispatch: dispatch() return latency (prepare cache hit + jit call
    issue over the tunnel)
  * t_result:  result() wall (device compute + the one batched pull)
  * pull-size sensitivity: decode=True (u8 image, ~786 KB) vs decode=False
    (latents only, ~130 KB f32) — if the tail is roundtrips (not bytes),
    these cost the same
  * RTT floor: device_get of a scalar already on device
  * bandwidth floor: device_get of an 8 MB device array

Usage: python scripts/perf_host_tail.py [--steps 50] [--reps 4] [--quick]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

META_PROMPT = "a [robot:.6,.3,.4,.55] and a [blue vase:0,.3,.4,.55]"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from guided_attention_tpu.models.bundle import StableDiffusion
    from guided_attention_tpu.runner import GuidedAttentionPipeline

    sd = StableDiffusion.create(
        "micro" if args.quick else "sd15",
        dtype=jnp.float32 if args.quick else jnp.bfloat16,
    )
    pipe = GuidedAttentionPipeline(sd)

    def one(seed, decode):
        t0 = time.monotonic()
        pend = pipe.dispatch(
            meta_prompt=META_PROMPT, seed=seed, num_inference_steps=args.steps,
            decode=decode, capture_diagnostics=False,
        )
        t_disp = time.monotonic() - t0
        t1 = time.monotonic()
        out = pend.result()
        t_res = time.monotonic() - t1
        assert (out.images is not None) == decode
        return t_disp, t_res

    print("warmup (compile both decode variants)...", file=sys.stderr)
    one(90, True)
    one(91, False)

    # RTT floor: pull a scalar that is already on device
    dev_scalar = jax.device_put(jnp.float32(1.0)) + 0
    np.asarray(dev_scalar)  # materialize
    rtts = []
    for _ in range(6):
        t0 = time.monotonic()
        jax.device_get(dev_scalar)
        rtts.append(time.monotonic() - t0)
    # bandwidth floor: pull 8 MB
    big = jax.device_put(jnp.zeros((4, 1024, 1024), jnp.uint16)) + 0
    np.asarray(big)
    bws = []
    for _ in range(3):
        t0 = time.monotonic()
        jax.device_get(big)
        bws.append(time.monotonic() - t0)
    bw_mbps = big.nbytes / 1e6 / min(bws)

    rows = []
    for rep in range(args.reps):
        for decode in (True, False):
            seed = 1000 + rep * 2 + int(decode)
            t_disp, t_res = one(seed, decode)
            rows.append((decode, t_disp, t_res))
            print(
                f"rep {rep} decode={int(decode)}: dispatch {t_disp*1e3:7.1f} ms"
                f"  result {t_res*1e3:8.1f} ms  wall {(t_disp+t_res)*1e3:8.1f} ms"
            )

    def med(xs):
        xs = sorted(xs)
        return xs[len(xs) // 2]

    d_disp = med([r[1] for r in rows])
    res_img = med([r[2] for r in rows if r[0]])
    res_lat = med([r[2] for r in rows if not r[0]])
    print(f"\nmedian dispatch latency : {d_disp*1e3:7.1f} ms")
    print(f"median result(), decode : {res_img*1e3:7.1f} ms  (u8 image pull)")
    print(f"median result(), latents: {res_lat*1e3:7.1f} ms  (latents-only pull)")
    print(f"pull-size delta         : {(res_img-res_lat)*1e3:7.1f} ms (bytes cost)")
    print(f"scalar device_get RTT   : {min(rtts)*1e3:7.1f} ms (floor, min of 6)")
    print(f"8 MB pull bandwidth     : {bw_mbps:7.1f} MB/s "
          f"(min {min(bws)*1e3:.0f} ms)")
    print(
        "\nhost tail ~= dispatch + (result - device_compute); compare wall vs "
        "the 1491 ms module time from the round-5 trace (docs/PERF.md)."
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
