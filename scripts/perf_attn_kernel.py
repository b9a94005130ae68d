"""Microbenchmark flash self-attention kernel variants on the real TPU.

Driven by the round-4 profile (docs/PERF.md "Trace-verified breakdown"):
attn1 custom-calls are 385 ms of the 1574 ms device time — CFG fwd
[16,4096,40] 1.02 ms/call, guidance-eval bwd [8,4096,40] 1.15 ms/call —
at ~21% MFU vs the ~31% head-dim-40 MXU ceiling. Variants tried here:

  fwd: V1  ones-column trick: l = p @ [v | 1] on the MXU (kills the
           [BLK,N] sum pass AND the [BLK,N] divide pass; the extra column
           is free — 40-wide and 41-wide both pad to the 128-lane tile)
       V2  V1 + probs cast to bf16 before PV
  bwd: W1  bf16 probs/ds for the dk/dv/dq matmuls (f32 matmuls on the MXU
           pay a multi-pass penalty; accumulation stays f32 via
           preferred_element_type)
       W2  W1 + block_q_bwd sweep

Timing: varying inputs per rep (the tunnel caches identical executions),
single device_get at the end (block_until_ready does not block over the
axon tunnel).
"""
from __future__ import annotations

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from guided_attention_tpu.ops.flash_attention import _cdiv, _flash_bh, _self_bwd

REPS = 30


def timeit(fn, args, flops):
    """Time ``fn(*args)`` on-device: N executions inside ONE jitted
    fori_loop (per-iteration input perturbation defeats loop-invariant
    hoisting), seeded per call (the tunnel caches identical executions).
    The constant dispatch+pull tunnel overhead (~20-40 ms/call) is
    cancelled by differencing an N-iteration and a 3N-iteration loop."""

    def make(iters):
        def loop(j, *a):
            q = a[0]

            def body(i, acc):
                qi = q * (1.0 + 1e-6 * (j + i).astype(q.dtype))
                out = fn(qi, *a[1:])
                return acc + sum(
                    jnp.sum(l[0, 0].astype(jnp.float32)) for l in jax.tree_util.tree_leaves(out)
                )

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        return jax.jit(loop)

    f1, f3 = make(REPS), make(3 * REPS)
    jax.device_get((f1(jnp.int32(0), *args), f3(jnp.int32(0), *args)))  # compile
    t0 = time.time()
    jax.device_get(f1(jnp.int32(1), *args))
    t1 = time.time()
    jax.device_get(f3(jnp.int32(2), *args))
    t2 = time.time()
    dt = ((t2 - t1) - (t1 - t0)) / (2 * REPS)
    return dt, flops / dt / 1e12


# ---------------- fwd variants ----------------
def _fwd_kernel_v1(q_ref, k_ref, v1_ref, o_ref, *, scale, bf16_p):
    q = q_ref[0]
    k = k_ref[0]
    v1 = v1_ref[0]  # [N, D+pad] with ones in column D
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    if bf16_p:
        p = p.astype(jnp.bfloat16)
    ol = jax.lax.dot_general(p, v1, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    d = o_ref.shape[-1]
    o = ol[:, :d] / ol[:, d:d + 1]
    o_ref[0] = o.astype(o_ref.dtype)


def fwd_v1(q, k, v, scale, block_q, bf16_p=False):
    bh, n, d = q.shape
    # ones column at D; pad width to the next 128-lane tile boundary is
    # implicit, but Pallas wants a concrete minor size — use d+8 (sublane pad)
    dpad = d + 8
    v1 = jnp.concatenate(
        [v, jnp.ones((bh, n, 1), v.dtype), jnp.zeros((bh, n, dpad - d - 1), v.dtype)], axis=-1
    )
    grid = (bh, _cdiv(n, block_q))
    return pl.pallas_call(
        functools.partial(_fwd_kernel_v1, scale=scale, bf16_p=bf16_p),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, dpad), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
    )(q, k, v1)


# ---------------- bwd variant: bf16 matmul operands ----------------
def _bwd_kernel_w1(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *, scale):
    iq = pl.program_id(1)

    @pl.when(iq == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = p / l
    pb = p.astype(jnp.bfloat16)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    delta = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = (p * (dp - delta) * scale).astype(jnp.bfloat16)
    dq_ref[0] = jnp.dot(ds, k, preferred_element_type=jnp.float32).astype(dq_ref.dtype)
    dk_ref[0] += jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dv_ref[0] += jax.lax.dot_general(pb, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def bwd_w1(q, k, v, do, scale, block_q):
    bh, n, d = q.shape
    grid = (bh, _cdiv(n, block_q))
    return pl.pallas_call(
        functools.partial(_bwd_kernel_w1, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, jnp.float32),
            jax.ShapeDtypeStruct(v.shape, jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
    )(q, k, v, do)


def main():
    key = jax.random.PRNGKey(0)
    for bh, n, d in ((16, 4096, 40), (8, 4096, 40)):
        fl_fwd = 2 * 2 * bh * n * n * d
        print(f"\n==== [{bh},{n},{d}] fwd ({fl_fwd/1e9:.1f} GFLOP) ====")
        args = tuple(
            jax.random.normal(jax.random.fold_in(key, j), (bh, n, d), jnp.bfloat16)
            for j in range(3)
        )

        for blk in (256, 512, 1024):
            f = jax.jit(lambda q, k, v, blk=blk: _flash_bh(q, k, v, d**-0.5, blk, 64))
            dt, tf = timeit(f, args, fl_fwd)
            print(f"current  blk={blk:4d}: {dt*1e3:7.3f} ms  {tf:5.1f} TF/s ({100*tf/197:.1f}%)")
        for blk in (256, 512, 1024):
            for bf16_p in (False, True):
                f = jax.jit(
                    lambda q, k, v, blk=blk, bp=bf16_p: fwd_v1(q, k, v, d**-0.5, blk, bp)
                )
                dt, tf = timeit(f, args, fl_fwd)
                print(f"v1 ones  blk={blk:4d} bf16_p={int(bf16_p)}: {dt*1e3:7.3f} ms  {tf:5.1f} TF/s ({100*tf/197:.1f}%)")

        # numerics vs current
        q, k, v = args
        ref = _flash_bh(q, k, v, d**-0.5, 512, 64)
        got = fwd_v1(q, k, v, d**-0.5, 512, True)
        err = jax.device_get(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
        print(f"v1 bf16_p max |diff| vs current: {err:.2e}")

    bh, n, d = 8, 4096, 40
    fl_bwd = 5 * 2 * bh * n * n * d
    print(f"\n==== [{bh},{n},{d}] bwd ({fl_bwd/1e9:.1f} GFLOP) ====")
    args4 = tuple(
        jax.random.normal(jax.random.fold_in(key, 991 + j), (bh, n, d), jnp.bfloat16)
        for j in range(4)
    )
    for blk in (64, 128, 256, 512):
        f = lambda q, k, v, do, blk=blk: _self_bwd(d**-0.5, blk, (q, k, v), do)
        try:
            dt, tf = timeit(f, args4, fl_bwd)
            print(f"current  blk={blk:4d}: {dt*1e3:7.3f} ms  {tf:5.1f} TF/s ({100*tf/197:.1f}%)")
        except Exception as e:
            print(f"current  blk={blk:4d}: FAILED {repr(e)[:120]}")
    for blk in (64, 128, 256, 512):
        f = lambda q, k, v, do, blk=blk: bwd_w1(q, k, v, do, d**-0.5, blk)
        try:
            dt, tf = timeit(f, args4, fl_bwd)
            print(f"w1 bf16  blk={blk:4d}: {dt*1e3:7.3f} ms  {tf:5.1f} TF/s ({100*tf/197:.1f}%)")
        except Exception as e:
            print(f"w1 bf16  blk={blk:4d}: FAILED {repr(e)[:120]}")

    q, k, v, do = args4
    ref = _self_bwd(d**-0.5, 64, (q, k, v), do)
    got = bwd_w1(q, k, v, do, d**-0.5, 64)
    for name, a, b in zip("dq dk dv".split(), ref, got):
        err = jax.device_get(
            jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
            / (jnp.max(jnp.abs(a.astype(jnp.float32))) + 1e-9)
        )
        print(f"w1 {name} max rel diff vs current: {err:.2e}")


if __name__ == "__main__":
    main()
