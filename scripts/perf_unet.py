"""Time the SD1.5 UNet batch-2 CFG forward on the TPU.

Chains N forwards inside one jitted lax.scan so the measurement is pure
device time (per-call dispatch over the remote tunnel is ~60 ms and the
tunnel caches identical executions; a scan with a carried latent defeats
both). Compare attention variants:

  python scripts/perf_unet.py            # flash self-attention (default cfg)
  python scripts/perf_unet.py --noflash  # einsum everywhere
  python scripts/perf_unet.py --norm_bf16
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
)

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

N = 20


def main():
    from guided_attention_tpu.models.bundle import StableDiffusion
    from guided_attention_tpu.models.unet import UNet2DCondition

    t0 = time.time()
    sd = StableDiffusion.create("sd15", dtype=jnp.bfloat16)
    print(f"build {time.time()-t0:.1f}s", file=sys.stderr)

    ucfg = sd.config.unet
    if "--noflash" in sys.argv:
        ucfg = dataclasses.replace(ucfg, use_flash_attention=False)
    if "--norm_bf16" in sys.argv:
        ucfg = dataclasses.replace(ucfg, norm_dtype=jnp.bfloat16)
    if "--flash_all" in sys.argv:  # flash at every self-attn resolution
        ucfg = dataclasses.replace(ucfg, flash_min_seq=256)
    if "--upsample_repeat" in sys.argv:
        # nearest-neighbor 2x upsample as broadcast+reshape (jnp.repeat)
        # instead of jax.image.resize's gather — feeds the 32/64-res convs
        import jax.image as jimage

        _orig_resize = jimage.resize

        def resize_repeat(x, shape, method="nearest", **kw):
            if method == "nearest" and len(shape) == 4 and shape[1] == 2 * x.shape[1]:
                return x.repeat(2, axis=1).repeat(2, axis=2)
            return _orig_resize(x, shape, method, **kw)

        jimage.resize = resize_repeat
    if "--fused_cross" in sys.argv:
        # route non-captured long-seq cross-attn (the CFG pass) through the
        # fused Pallas kernel, discarding its map side-output
        import guided_attention_tpu.models.unet as unet_mod
        from guided_attention_tpu.ops.attention import attention as orig_attn
        from guided_attention_tpu.ops.flash_attention import cross_attention_with_map
        from guided_attention_tpu.ops.attention import merge_heads, split_heads

        def patched(q, k, v, heads, **kw):
            nq, nk = q.shape[1], k.shape[1]
            if (
                not kw.get("capture")
                and not kw.get("capture_perhead")
                and kw.get("pww_mask") is None
                and nk != nq
                and nq >= 2048
            ):
                d = q.shape[-1] // heads
                out, _ = cross_attention_with_map(
                    split_heads(q, heads), split_heads(k, heads), split_heads(v, heads), 1.0 / d**0.5
                )
                return merge_heads(out).astype(q.dtype), None
            return orig_attn(q, k, v, heads, **kw)

        unet_mod.attention = patched

    bwd_mode = "--bwd" in sys.argv
    if "--bwd64" in sys.argv:
        # measure the batch-engine block (the single-sample default is the
        # ~8%-faster 128, UNetConfig.flash_bwd_block)
        ucfg = dataclasses.replace(ucfg, flash_bwd_block=64)
        bwd_mode = True
    if "--bwd_block" in sys.argv:  # e.g. --bwd_block 256
        blk = int(sys.argv[sys.argv.index("--bwd_block") + 1])
        ucfg = dataclasses.replace(ucfg, flash_bwd_block=blk)
        bwd_mode = True
    unet = UNet2DCondition(ucfg)
    params = sd.params["unet"]

    B = 1 if bwd_mode else 2
    ctx = jax.random.normal(jax.random.PRNGKey(1), (B, 77, 768), jnp.bfloat16)

    if bwd_mode:
        # step-0 unit cost: grad-enabled cond-only forward with map capture
        # (the guidance eval, pipeline.py guidance_eval)
        cap = frozenset({("cross", 16)})

        def chain(p, x, c):
            def loss(xx, i):
                eps, aux = unet.apply({"params": p}, xx, jnp.int32(500) - i, c, capture=cap)
                maps = sum(jnp.sum(m) for k in aux["maps"] for m in aux["maps"][k])
                return jnp.mean(eps.astype(jnp.float32)) + 0.001 * maps

            def body(h, i):
                l, g = jax.value_and_grad(loss)(h, i)
                return (h - 0.001 * g).astype(h.dtype), l

            out, _ = jax.lax.scan(body, x, jnp.arange(N, dtype=jnp.int32))
            return out
    else:

        def chain(p, x, c):
            def body(h, i):
                eps, _ = unet.apply({"params": p}, h, jnp.int32(500) - i, c)
                return eps.astype(h.dtype), ()

            out, _ = jax.lax.scan(body, x, jnp.arange(N, dtype=jnp.int32))
            return out

    fwd = jax.jit(chain)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, 64, 64, 4), jnp.bfloat16)

    t0 = time.time()
    jax.device_get(fwd(params, x, ctx))
    print(f"compile+first {time.time()-t0:.1f}s", file=sys.stderr)

    # block_until_ready does NOT block over the axon tunnel; force a
    # device->host pull (65 KB, ~30 ms) to end the timing
    xs = jax.device_get(
        jax.jit(lambda k: jax.random.normal(k, (5, B, 64, 64, 4), jnp.bfloat16))(
            jax.random.PRNGKey(2)
        )
    )
    times = []
    for i in range(5):
        xi = jnp.asarray(xs[i])  # vary inputs: the tunnel caches identical runs
        t0 = time.time()
        jax.device_get(fwd(params, xi, ctx))
        times.append(time.time() - t0)
    best = min(times)
    tag = " ".join(a for a in sys.argv[1:]) or "default"
    kind = "fwd+bwd (batch-1 guidance eval)" if bwd_mode else "fwd (batch-2 CFG)"
    print(f"[{tag}] {best*1000/N:.2f} ms/{kind}, wall {[round(t,3) for t in times]}")


if __name__ == "__main__":
    main()
