"""Analytic FLOP counts for the UNet forward — MFU accounting.

Counts matmul/conv multiply-accumulates (2 FLOPs each) by walking the same
block structure as models/unet.UNet2DCondition (norms, activations, and
softmax are omitted: <1% of total at SD scale). Used by bench.py and
docs/PERF.md to report model FLOPs utilization (MFU) against the chip's
peak; the reference publishes no throughput numbers at all (SURVEY.md §6).

Validated against XLA's compiled cost_analysis in tests/test_flops.py.
"""
from __future__ import annotations

from guided_attention_tpu.models.unet import UNetConfig

# v5e (lite) peak dense throughput, per chip
V5E_BF16_PEAK_FLOPS = 197e12


def _conv(h: int, w: int, cin: int, cout: int, k: int = 3) -> float:
    return 2.0 * k * k * cin * cout * h * w


def _dense(tokens: int, cin: int, cout: int) -> float:
    return 2.0 * tokens * cin * cout


def _attention(q_len: int, kv_len: int, inner: int, query_dim: int, ctx_dim: int) -> float:
    f = _dense(q_len, query_dim, inner)  # to_q
    f += 2 * _dense(kv_len, ctx_dim, inner)  # to_k, to_v
    f += 2.0 * q_len * kv_len * inner  # q @ k^T
    f += 2.0 * q_len * kv_len * inner  # probs @ v
    f += _dense(q_len, inner, query_dim)  # to_out
    return f


def _transformer2d(res: int, ch: int, heads: int, dim_head: int, ctx_len: int, ctx_dim: int) -> float:
    n = res * res
    inner = heads * dim_head
    f = _dense(n, ch, inner) + _dense(n, inner, ch)  # proj_in / proj_out (1x1 or linear)
    f += _attention(n, n, inner, inner, inner)  # attn1 (self)
    f += _attention(n, ctx_len, inner, inner, ctx_dim)  # attn2 (cross)
    # GEGLU feed-forward: dim -> 8*dim proj, (4*dim) -> dim out
    f += _dense(n, inner, inner * 8) + _dense(n, inner * 4, inner)
    return f


def _resnet(res: int, cin: int, cout: int, temb_dim: int) -> float:
    f = _conv(res, res, cin, cout, 3) + _conv(res, res, cout, cout, 3)
    f += _dense(1, temb_dim, cout)
    if cin != cout:
        f += _conv(res, res, cin, cout, 1)
    return f


def unet_forward_flops(cfg: UNetConfig, batch: int = 1, ctx_len: int = 77,
                       truncate_at_res: int | None = None) -> float:
    """Analytic FLOPs of ONE UNet forward at the config's sample_size.

    Mirrors UNet2DCondition.__call__'s channel/resolution bookkeeping
    (models/unet.py:269-398) including skip-concat channel growth in the up
    path. ``truncate_at_res`` stops after the last attention up-block at
    that resolution (the guidance eval's dead-code-eliminated tail, see
    unet_eval_flops).
    """
    chs = cfg.block_out_channels
    n_blocks = len(chs)
    temb_dim = chs[0] * 4
    res = cfg.sample_size
    f = 0.0

    # time embedding MLP (per batch element, counted once below via batch mult)
    f += _dense(1, chs[0], temb_dim) + _dense(1, temb_dim, temb_dim)
    f += _conv(res, res, cfg.in_channels, chs[0], 3)  # conv_in

    skip_chs = [chs[0]]  # res_samples channel trace
    cur = chs[0]
    # --- down ---
    for i, out_ch in enumerate(chs):
        for _ in range(cfg.layers_per_block):
            f += _resnet(res, cur, out_ch, temb_dim)
            cur = out_ch
            if cfg.attn_down[i]:
                f += _transformer2d(
                    res, cur, cfg.num_heads[i], cur // cfg.num_heads[i],
                    ctx_len, cfg.cross_attention_dim,
                )
            skip_chs.append(cur)
        if i != n_blocks - 1:
            f += _conv(res // 2, res // 2, out_ch, out_ch, 3)  # downsample
            res //= 2
            skip_chs.append(out_ch)

    # --- mid ---
    mid = chs[-1]
    f += _resnet(res, cur, mid, temb_dim)
    f += _transformer2d(res, mid, cfg.num_heads[-1], mid // cfg.num_heads[-1], ctx_len, cfg.cross_attention_dim)
    f += _resnet(res, mid, mid, temb_dim)
    cur = mid

    # --- up ---
    rev_ch = list(reversed(chs))
    rev_attn = list(reversed(cfg.attn_down))
    rev_heads = list(reversed(cfg.num_heads))
    for i in range(n_blocks):
        out_ch = rev_ch[i]
        for _ in range(cfg.layers_per_block + 1):
            skip = skip_chs.pop()
            f += _resnet(res, cur + skip, out_ch, temb_dim)
            cur = out_ch
            if rev_attn[i]:
                f += _transformer2d(
                    res, cur, rev_heads[i], cur // rev_heads[i],
                    ctx_len, cfg.cross_attention_dim,
                )
        if rev_attn[i] and res == truncate_at_res:
            return f * batch  # last captured layer reached; tail is DCE'd
        if i != n_blocks - 1:
            res *= 2
            f += _conv(res, res, out_ch, out_ch, 3)  # upsample conv

    f += _conv(res, res, cur, cfg.out_channels, 3)  # conv_out
    return f * batch


def unet_eval_flops(cfg: UNetConfig, capture_res: int = 16, batch: int = 1, ctx_len: int = 77) -> float:
    """FLOPs of one guidance-eval forward: the UNet truncated after the last
    up-block at ``capture_res``.

    The eval's loss depends only on the captured cross maps, so XLA
    dead-code-eliminates everything past the last capture layer (the
    higher-res up blocks + conv_out) from the compiled fwd+bwd
    (docs/PERF.md 'guidance evals are cheaper than a full forward').
    """
    return unet_forward_flops(cfg, batch=batch, ctx_len=ctx_len, truncate_at_res=capture_res)


def generation_flops(cfg: UNetConfig, diags, num_steps: int, cfg_batch: int = 2,
                     capture_res: int = 16) -> float:
    """Total executed UNet FLOPs of one guided generation, from the run's
    own control-flow counters (StepDiag): ``n_evals`` guidance evals per
    step (the exact in-loop count, cumulative over re-noise recursions —
    each a cond-only TRUNCATED fwd+bwd, ~= 3x the truncated forward by the
    standard backprop 2x rule; the tail past the last captured map is
    dead-code-eliminated) + one full CFG pass per executed recursion.
    CLIP/VAE are omitted (<1% of a 50-step generation).
    """
    import numpy as np

    fwd = unet_forward_flops(cfg, batch=1)
    ev = unet_eval_flops(cfg, capture_res, batch=1)
    total = 0.0
    n_evals = np.asarray(diags.n_evals)
    recur = np.asarray(diags.recursions)
    for i in range(num_steps):
        r = max(int(recur[i]), 1)
        total += int(n_evals[i]) * 3.0 * ev + r * cfg_batch * fwd
    return total


def mfu(flops: float, seconds: float, peak: float = V5E_BF16_PEAK_FLOPS) -> float:
    return flops / seconds / peak
