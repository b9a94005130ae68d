"""Numerics check of the Pallas kernels on the REAL TPU (the unit tests run
them in interpreter mode on CPU; this validates the Mosaic-compiled code
paths): flash self-attention and fused cross-attention-with-map, forward and
grads, against the einsum reference at workload shapes.

  python scripts/check_kernels_tpu.py
"""
from __future__ import annotations

import os
import sys

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])


def ref_attn(q, k, v, scale):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    return o.astype(q.dtype), jnp.mean(p, axis=1)


def main():
    from guided_attention_tpu.ops.flash_attention import (
        cross_attention_with_map,
        flash_attention,
    )

    rng = jax.random.PRNGKey(0)
    failures = 0

    # --- flash self-attention: SD1.5 (D=40) and SD2.1 (D=64) shapes ---
    for (b, h, n, d), bwd_block in [
        ((2, 8, 4096, 40), 128),
        ((1, 8, 4096, 40), 64),
        ((2, 5, 4096, 64), 128),  # SD2.1 head_dim 64
    ]:
        ks = jax.random.split(jax.random.fold_in(rng, n + d + bwd_block), 3)
        q, k, v = (jax.random.normal(kk, (b, h, n, d), jnp.bfloat16) for kk in ks)
        scale = 1.0 / d**0.5

        def loss_flash(q, k, v):
            return jnp.sum(flash_attention(q, k, v, scale, block_q_bwd=bwd_block).astype(jnp.float32) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(ref_attn(q, k, v, scale)[0].astype(jnp.float32) ** 2)

        o1 = jax.jit(lambda q, k, v: flash_attention(q, k, v, scale))(q, k, v)
        o2 = jax.jit(lambda q, k, v: ref_attn(q, k, v, scale)[0])(q, k, v)
        g1 = jax.jit(jax.grad(loss_flash, (0, 1, 2)))(q, k, v)
        g2 = jax.jit(jax.grad(loss_ref, (0, 1, 2)))(q, k, v)
        o1, o2, g1, g2 = jax.device_get((o1, o2, g1, g2))
        eo = float(np.max(np.abs(o1.astype(np.float32) - o2.astype(np.float32))))
        eg = max(
            float(np.max(np.abs(a.astype(np.float32) - b2.astype(np.float32))))
            for a, b2 in zip(g1, g2)
        )
        ok = eo < 0.02 and eg < 1.0  # bf16 inputs; grads accumulate over N=4096
        failures += not ok
        print(f"flash self-attn {b}x{h}x{n}x{d} bwd_block={bwd_block}: "
              f"max|dO|={eo:.4f} max|dG|={eg:.4f} {'OK' if ok else 'FAIL'}")

    # --- fused cross-attention with map (B=1, H=8, Nq=256, K=77, D=40) ---
    for nq in (256, 1024):
        ks = jax.random.split(jax.random.fold_in(rng, nq), 3)
        q = jax.random.normal(ks[0], (1, 8, nq, 40), jnp.bfloat16)
        k = jax.random.normal(ks[1], (1, 8, 77, 40), jnp.bfloat16)
        v = jax.random.normal(ks[2], (1, 8, 77, 40), jnp.bfloat16)
        scale = 1.0 / 40**0.5

        def loss_fused(q, k, v):
            o, m = cross_attention_with_map(q, k, v, scale)
            return jnp.sum(o.astype(jnp.float32) ** 2) + jnp.sum(m**2)

        def loss_ref2(q, k, v):
            o, m = ref_attn(q, k, v, scale)
            return jnp.sum(o.astype(jnp.float32) ** 2) + jnp.sum(m**2)

        (o1, m1) = jax.jit(lambda q, k, v: cross_attention_with_map(q, k, v, scale))(q, k, v)
        (o2, m2) = jax.jit(lambda q, k, v: ref_attn(q, k, v, scale))(q, k, v)
        g1 = jax.jit(jax.grad(loss_fused, (0, 1, 2)))(q, k, v)
        g2 = jax.jit(jax.grad(loss_ref2, (0, 1, 2)))(q, k, v)
        o1, o2, m1, m2, g1, g2 = jax.device_get((o1, o2, m1, m2, g1, g2))
        eo = float(np.max(np.abs(o1.astype(np.float32) - o2.astype(np.float32))))
        em = float(np.max(np.abs(m1 - m2)))
        eg = max(
            float(np.max(np.abs(a.astype(np.float32) - b2.astype(np.float32))))
            for a, b2 in zip(g1, g2)
        )
        ok = eo < 0.02 and em < 1e-3 and eg < 0.5
        failures += not ok
        print(f"fused cross-attn Nq={nq}: max|dO|={eo:.4f} max|dMap|={em:.6f} "
              f"max|dG|={eg:.4f} {'OK' if ok else 'FAIL'}")

    print("ALL OK" if failures == 0 else f"{failures} FAILURES")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
