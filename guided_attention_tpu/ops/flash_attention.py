"""Pallas TPU attention kernels.

Two kernels tuned for this workload's shapes (SD UNet at 512px: self-attn
N in {4096, 1024}, head_dim in {40, 80, 160}; cross-attn K = 77 text keys):

  * ``flash_attention``: self-attention without materializing the N x N
    score matrix in HBM. Because K/V for one (batch, head) fit comfortably
    in VMEM at these sizes (4096 x 160 fp32 = 2.6 MB), the kernel streams
    query blocks against the *whole* K/V — one softmax pass, no online
    max/sum bookkeeping. Custom VJP recomputes scores per query block and
    accumulates dK/dV across sequential grid steps in the output block.

  * ``cross_attention_with_map``: fused cross-attention that additionally
    emits the head-averaged probability map [B, Nq, K] as a second output —
    the kernel-level replacement for the reference's processor that
    materializes probs to report them to the AttentionStore
    (reference utils/ptp_utils.py:82-92). Keys are padded to the 128-lane
    tile and masked inside the kernel.

Both kernels accumulate in fp32 on the MXU (preferred_element_type) and are
differentiable via custom VJPs, since the guidance path takes jax.grad of a
loss of (outputs, maps) w.r.t. the latent.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# Set True to run kernels through the Pallas interpreter (CPU tests).
INTERPRET = False


# ---------------------------------------------------------------------------
# Self-attention (full-KV-in-VMEM "lazy flash")
# ---------------------------------------------------------------------------


def _self_fwd_kernel(q_ref, k_ref, v1_ref, o_ref, *, scale: float):
    # q: [BLKQ, D]; k: [N, D]; v1: [N, D+pad] with a ones column at D.
    #
    # VPU-pass-minimized softmax (round-4 chip microbench,
    # scripts/perf_attn_kernel.py: 1.02 -> 0.74 ms on [16,4096,40], -27%;
    # 0.50 -> 0.29 ms on [8,4096,40]):
    #   * scale folds into the [BLKQ, D] q block instead of a full
    #     [BLKQ, N] f32 multiply on the scores;
    #   * the softmax denominator comes from the PV matmul itself — V is
    #     augmented with a ones column, so l = (p @ v1)[:, D] rides the MXU
    #     for free (40-wide and 48-wide both pad to the same 128-lane tile)
    #     and BOTH the [BLKQ, N] sum pass and the [BLKQ, N] divide pass
    #     disappear; the divide shrinks to [BLKQ, D];
    #   * dividing the f32-accumulated PV output (instead of normalizing p
    #     before the bf16 cast) also tightens numerics slightly.
    q = q_ref[0]
    k = k_ref[0]
    v1 = v1_ref[0]
    qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
    s = jax.lax.dot_general(
        qs, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BLKQ, N]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m).astype(v1.dtype)
    ol = jnp.dot(p, v1, preferred_element_type=jnp.float32)  # [BLKQ, D+pad]
    d = o_ref.shape[-1]
    o_ref[0] = (ol[:, :d] / ol[:, d : d + 1]).astype(o_ref.dtype)


def _self_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *, scale: float):
    iq = pl.program_id(1)

    @pl.when(iq == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = p / l  # [BLKQ, N]

    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BLKQ, N]
    delta = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = p * (dp - delta) * scale  # [BLKQ, N]

    dq_ref[0] = jnp.dot(
        ds.astype(q.dtype), k, preferred_element_type=jnp.float32
    ).astype(dq_ref.dtype)
    dk_ref[0] += jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dk_ref.dtype)
    dv_ref[0] += jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dv_ref.dtype)


def _self_fwd(q, k, v, scale: float, block_q: int):
    bh, n, d = q.shape
    grid = (bh, _cdiv(n, block_q))
    # ones column for the in-matmul softmax sum; d+8 keeps an 8-aligned
    # minor size (both 40 and 48 pad to one 128-lane tile — the extra MXU
    # columns are free)
    dpad = d + 8
    v1 = jnp.concatenate(
        [v, jnp.ones((bh, n, 1), v.dtype), jnp.zeros((bh, n, dpad - d - 1), v.dtype)],
        axis=-1,
    )
    out = pl.pallas_call(
        functools.partial(_self_fwd_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, dpad), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )(q, k, v1)
    return out


def _self_bwd(scale: float, block_q: int, res, do):
    q, k, v = res
    bh, n, d = q.shape
    grid = (bh, _cdiv(n, block_q))
    dq, dk, dv = pl.pallas_call(
        functools.partial(_self_bwd_kernel, scale=scale),
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
        interpret=INTERPRET,
    )(q, k, v, do)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_bh(q, k, v, scale: float, block_q: int, block_q_bwd: int):
    return _self_fwd(q, k, v, scale, block_q)


def _flash_bh_fwd(q, k, v, scale, block_q, block_q_bwd):
    return _self_fwd(q, k, v, scale, block_q), (q, k, v)


def _flash_bh_bwd(scale, block_q, block_q_bwd, res, do):
    return _self_bwd(scale, block_q_bwd, res, do)


_flash_bh.defvjp(_flash_bh_fwd, _flash_bh_bwd)


def flash_attention(
    q, k, v, scale: Optional[float] = None, block_q: int = 512, block_q_bwd: int = 64
):
    """Self-attention over [B, H, N, D] without HBM score materialization.

    Differentiable (custom VJP). The backward uses a smaller query block —
    it keeps three fp32 [block, N] intermediates live (p, dp, ds) plus the
    fp32 dK/dV accumulators, and must fit the ~16 MB VMEM budget. 64 leaves
    headroom for the extra grid dim Pallas adds when the caller vmaps the
    whole program (the sharded batch engine); 128 overflowed scoped VMEM by
    ~0.1 MB there.
    """
    b, h, n, d = q.shape
    if scale is None:
        scale = 1.0 / (d**0.5)
    block_q = min(block_q, n)
    block_q_bwd = min(block_q_bwd, n)
    qf = q.reshape(b * h, n, d)
    kf = k.reshape(b * h, n, d)
    vf = v.reshape(b * h, n, d)
    out = _flash_bh(qf, kf, vf, float(scale), int(block_q), int(block_q_bwd))
    return out.reshape(b, h, n, d)


# ---------------------------------------------------------------------------
# Cross-attention with pooled-map side output
# ---------------------------------------------------------------------------


def _cross_fwd_kernel(q_ref, k_ref, v_ref, o_ref, map_ref, *, scale, kv_len, heads):
    # grid: (B, NQ, H) — heads iterate INNERMOST so the map output block
    # (bb, i) is revisited consecutively while the head accumulation runs
    # (non-consecutive output-block revisits are not supported on TPU).
    h = pl.program_id(2)
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [BLKQ, KPAD]
    kpad = s.shape[-1]
    mask = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) < kv_len
    s = jnp.where(mask, s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)  # [BLKQ, KPAD]
    o_ref[0, 0] = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32).astype(
        o_ref.dtype
    )

    @pl.when(h == 0)
    def _init():
        map_ref[0] = jnp.zeros_like(map_ref[0])

    map_ref[0] += (p / heads).astype(map_ref.dtype)


def _cross_attention_fwd_impl(q, k, v, scale: float, kv_len: int, block_q: int):
    b, h, nq, d = q.shape
    kpad = k.shape[2]
    grid = (b, _cdiv(nq, block_q), h)
    out, pooled = pl.pallas_call(
        functools.partial(_cross_fwd_kernel, scale=scale, kv_len=kv_len, heads=float(h)),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((b, nq, kpad), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bb, i, hh: (bb, hh, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kpad, d), lambda bb, i, hh: (bb, hh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kpad, d), lambda bb, i, hh: (bb, hh, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_q, d), lambda bb, i, hh: (bb, hh, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, kpad), lambda bb, i, hh: (bb, i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=INTERPRET,
    )(q, k, v)
    return out, pooled


def cross_attention_with_map(q, k, v, scale: Optional[float] = None, block_q: int = 512):
    """Fused cross-attention emitting the head-averaged probability map.

    q: [B, H, Nq, D]; k, v: [B, H, K, D] (K = 77 text keys, padded to the
    128 lane tile inside). Returns (out [B, H, Nq, D], map [B, Nq, K] fp32).
    Differentiable in q/k/v (maps included) via a recomputing VJP expressed
    with jnp ops — the backward of this small-K attention is MXU-trivial.
    """
    b, h, nq, d = q.shape
    kv_len = k.shape[2]
    if scale is None:
        scale = 1.0 / (d**0.5)
    block_q = min(block_q, nq)
    kpad = max(128, _cdiv(kv_len, 128) * 128)
    pad = kpad - kv_len
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
    out, pooled = _cross_with_map(q, kp, vp, float(scale), int(kv_len), int(block_q))
    return out, pooled[:, :, :kv_len]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _cross_with_map(q, kp, vp, scale, kv_len, block_q):
    return _cross_attention_fwd_impl(q, kp, vp, scale, kv_len, block_q)


def _cross_with_map_fwd(q, kp, vp, scale, kv_len, block_q):
    return _cross_attention_fwd_impl(q, kp, vp, scale, kv_len, block_q), (q, kp, vp)


def _cross_with_map_bwd(scale, kv_len, block_q, res, grads):
    """Recompute-probs backward in plain XLA: K is tiny, so the full probs
    tensor for the backward fits easily and XLA fuses it."""
    q, kp, vp = res
    do, dmap = grads
    b, h, nq, d = q.shape
    kpad = kp.shape[2]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, kp, preferred_element_type=jnp.float32) * scale
    mask = (jnp.arange(kpad) < kv_len)[None, None, None, :]
    s = jnp.where(mask, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)  # [B,H,Q,KPAD]
    do32 = do.astype(jnp.float32)
    dp = jnp.einsum("bhqd,bhkd->bhqk", do32, vp.astype(jnp.float32))
    # map output: pooled = mean_h p  -> dL/dp += dmap / H
    if dmap is not None:
        dp = dp + (dmap.astype(jnp.float32) / h)[:, None, :, :]
    delta = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = p * (dp - delta) * scale
    ds = jnp.where(mask, ds, 0.0)
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, kp.astype(jnp.float32)).astype(q.dtype)
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q.astype(jnp.float32)).astype(kp.dtype)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, do32).astype(vp.dtype)
    return dq, dk, dv


_cross_with_map.defvjp(_cross_with_map_fwd, _cross_with_map_bwd)
