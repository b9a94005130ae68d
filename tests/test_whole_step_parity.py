"""Whole-step numerical parity golden (SURVEY.md §4 'numerical parity').

One composed test: synthetic aggregated attention maps + a multi-annotation
spec -> an independent torch port of the reference's loss pipeline
(reference pipeline_guided_attention.py:201-470: x100 re-softmax, Gaussian
smoothing, mass-normalize, centroid, COOR centering, BOX inside/outside in
both strict and mass variants, bb_center_weight, sub-prompt grouping,
meets_threshold incl. the i==-1 last-threshold rule at pipeline:1083) —
written with the reference's Python loops, NOT with this repo's vectorized
code — compared against compute_token_stats + compute_loss + jax.grad to
1e-5. The gradient wrt the maps is the exact quantity _update_latent chains
through the UNet (pipeline:455-470), so matching it pins the L4 semantics
end-to-end.
"""
import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from guided_attention_tpu.annotation import AnnotationType, parse_prompt  # noqa: E402
from guided_attention_tpu.config import HyperParams  # noqa: E402
from guided_attention_tpu.guidance.losses import (  # noqa: E402
    compute_loss,
    compute_token_stats,
    meets_threshold,
)
from guided_attention_tpu.guidance.spec import build_guidance_spec  # noqa: E402
from guided_attention_tpu.models.tokenizer import SimpleTokenizer  # noqa: E402

R = 16
META = "a [robot:.6,.3,.4,.55] and a [blue vase:0,.3,.4,.55] by a [cat:.2,.8]"


# ---------------------------------------------------------------------------
# torch port of the reference, loops and all
# ---------------------------------------------------------------------------

def ref_smooth(image, kernel_size=3, sigma=0.5):
    """gaussian_smoothing.py:28-49 kernel + reflect-pad call (pipeline:251-254)."""
    grid = torch.arange(kernel_size, dtype=torch.float64)
    mean = (kernel_size - 1) / 2
    k1 = (
        1.0
        / (sigma * math.sqrt(2 * math.pi))
        * torch.exp(-(((grid - mean) / (2 * sigma)) ** 2))
    )
    kernel = torch.outer(k1, k1)
    kernel = (kernel / kernel.sum()).to(torch.float32)
    x = F.pad(image[None, None], (1, 1, 1, 1), mode="reflect")
    return F.conv2d(x, kernel.view(1, 1, kernel_size, kernel_size))[0, 0]


def ref_inside_box(jj, ii, r, shrink):
    """helpers.py:164-173 (sample_center=True)."""
    cx, cy = jj + 0.5, ii + 0.5
    ox, oy = shrink * r.width, shrink * r.height
    return (r.x + ox) <= cx <= (r.x + r.width - ox) and (r.y + oy) <= cy <= (r.y + r.height - oy)


def ref_bbox_losses(r, image_normalized, hp):
    """helpers.py:215-277, loop for loop."""
    weights = torch.ones(R, R)
    for ii in range(R):
        for jj in range(R):
            if ref_inside_box(jj, ii, r, hp.shrink_factor):
                cx, cy = jj + 0.5, ii + 0.5
                rcx, rcy = r.center()
                c_dist = math.sqrt(
                    (2 * (rcx - cx) / r.width) ** 2 + (2 * (rcy - cy) / r.height) ** 2
                ) / math.sqrt(2)
                weights[ii, jj] = float(
                    np.interp(c_dist, [0, 0.333, 0.666, 1.0], [3, 2.5, 1, 0.2])
                )
            else:
                weights[ii, jj] = 1.0
    num_inside = sum_inside = num_outside = sum_outside = 0.0
    for ii in range(R):
        for jj in range(R):
            if ref_inside_box(jj, ii, r, hp.shrink_factor):
                sum_inside += float(weights[ii, jj])
                num_inside += 1
            else:
                sum_outside += float(weights[ii, jj])
                num_outside += 1
    for ii in range(R):
        for jj in range(R):
            if ref_inside_box(jj, ii, r, hp.shrink_factor):
                weights[ii, jj] /= sum_inside
            else:
                weights[ii, jj] /= sum_outside
    if hp.strict:
        at_most = 1.0 / num_inside
        loss_inside = torch.zeros(())
        loss_outside = torch.zeros(())
        zero = torch.zeros(())
        for ii in range(R):
            for jj in range(R):
                if ref_inside_box(jj, ii, r, hp.shrink_factor):
                    loss_inside = loss_inside + weights[ii, jj] * 2.0 * torch.max(
                        zero, at_most - image_normalized[ii, jj]
                    )
                else:
                    loss_outside = loss_outside + weights[ii, jj] * torch.max(
                        zero, image_normalized[ii, jj]
                    )
        return loss_inside, loss_outside
    attn_in = torch.zeros(())
    attn_out = torch.zeros(())
    for ii in range(R):
        for jj in range(R):
            if ref_inside_box(jj, ii, r, hp.shrink_factor):
                attn_in = attn_in + image_normalized[ii, jj]
            else:
                attn_out = attn_out + image_normalized[ii, jj]
    return 1.0 - attn_in, attn_out


def ref_centering_loss(col, row, center):
    """pipeline:390-395."""
    part1 = 1.0 * (col - center[0] * 16).abs() / 15.0
    part2 = 4.0 * (row - center[1] * 16).abs() / 15.0
    return torch.clamp(part1, min=0.0) + torch.clamp(part2, min=0.0)


def ref_whole_step(maps, token_dict, hp, sub_prompt_avg_within=False):
    """pipeline:201-296 (_compute_max_attention_per_index) +
    :398-451 (_compute_loss) + :358-387 (group_losses_by_sumprompt)."""
    attention_for_text = torch.softmax(maps[:, :, 1:-1] * 100.0, dim=-1)
    losses = []
    unscaled_losses = []
    for tok_idx, info in token_dict.items():
        i = tok_idx - 1  # shift: BOS dropped (pipeline:228)
        image = attention_for_text[:, :, i]
        image = ref_smooth(image)
        image_normalized = image / image.sum()
        col = torch.zeros(())
        row = torch.zeros(())
        for ii in range(R):
            for jj in range(R):
                col = col + (jj + 0.5) * image_normalized[ii][jj]
                row = row + (ii + 0.5) * image_normalized[ii][jj]
        if info["loss_type"] == AnnotationType.COOR:
            loss_item = ref_centering_loss(col, row, info["loss"])
            losses.append((tok_idx, info["subprompt"], loss_item))
            unscaled_losses.append((tok_idx, info["subprompt"], loss_item))
        else:  # BOX
            rect = info["loss"]
            inside_u, outside_u = ref_bbox_losses(rect.of_size(16.0), image_normalized, hp)
            unscaled_item = inside_u + outside_u
            loss_item = (
                hp.inside_loss_scale * inside_u + hp.outside_loss_scale * outside_u * 3.0
            )
            if hp.bb_center_weight > 0:
                loss_item = loss_item + hp.bb_center_weight * ref_centering_loss(
                    col, row, rect.center()
                )
            losses.append((tok_idx, info["subprompt"], loss_item))
            unscaled_losses.append((tok_idx, info["subprompt"], unscaled_item))

    def group(items):
        by_sub = {}
        for _tok, sub, val in items:
            by_sub.setdefault(sub, []).append(val)
        total = torch.zeros(())
        finals = {}
        for sub, vals in by_sub.items():
            t = torch.zeros(())
            for v in vals:
                t = t + (v / len(vals) if sub_prompt_avg_within else v)
            total = total + t
            finals[sub] = t
        return total, finals

    total, _ = group(losses)
    _, unscaled_by_sub = group(unscaled_losses)
    return total, unscaled_by_sub


def ref_meets_threshold(i, thresholds, unscaled_by_sub):
    """pipeline:1074-1088."""
    if (i not in thresholds and i != -1) or len(thresholds) == 0:
        return True
    thresh = list(thresholds.values())[-1] if i == -1 else thresholds[i]
    for _sub, val in unscaled_by_sub.items():
        if float(val) > thresh:
            return False
    return True


# ---------------------------------------------------------------------------

def build_token_dict(tok, prompt, annotations):
    """reference parseMetaPrompt (run.py:81-91), independent loop scan."""
    full = tok.encode(prompt)
    token_dict = {}
    for ann in annotations:
        sub = tok.encode(ann.subprompt)[1:-1]
        for s in range(len(full) - len(sub) + 1):
            if full[s : s + len(sub)] == sub:
                for idx in range(s, s + len(sub)):
                    token_dict[idx] = {
                        "loss_type": ann.kind,
                        "loss": ann.target,
                        "subprompt": ann.subprompt,
                    }
                break
    return token_dict


@pytest.mark.parametrize(
    "strict,avg_within",
    [(False, False), (True, False), (False, True)],
    ids=["mass", "strict", "avg-within"],
)
def test_whole_step_loss_and_grad_parity(strict, avg_within):
    tok = SimpleTokenizer()
    prompt, annotations, _ = parse_prompt(META)
    hp = HyperParams(strict=strict)
    spec = build_guidance_spec(tok, prompt, annotations, hp)
    token_dict = build_token_dict(tok, prompt, annotations)
    assert len(token_dict) == 4  # robot, blue, vase, cat

    rng = np.random.default_rng(7)
    logits = rng.standard_normal((R, R, 77)).astype(np.float32) * 0.5
    maps_np = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)

    # reference port
    maps_t = torch.from_numpy(maps_np).requires_grad_(True)
    want_total, want_unscaled = ref_whole_step(maps_t, token_dict, hp, avg_within)
    (want_grad,) = torch.autograd.grad(want_total, [maps_t])

    # this framework: loss + grad wrt the same maps
    def loss_fn(m):
        stats = compute_token_stats(m, spec, hp, True, 0.5, 3)
        total, _gs, gu, valid = compute_loss(stats, spec, hp, avg_within)
        return total, (gu, valid)

    (got_total, (gu, valid)), got_grad = jax.value_and_grad(loss_fn, has_aux=True)(
        jnp.asarray(maps_np)
    )

    np.testing.assert_allclose(
        float(got_total), float(want_total.detach()), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got_grad), want_grad.numpy(), rtol=1e-4, atol=1e-6
    )

    # per-group unscaled losses in spec group order
    gu_np = np.asarray(gu)
    for gid, sub in enumerate(spec.subprompts):
        np.testing.assert_allclose(
            gu_np[gid], float(want_unscaled[sub].detach()), rtol=1e-5, atol=1e-6
        )

    # threshold parity: step-indexed gate + the i==-1 last-threshold rule
    thresholds = {0: 0.1, 3: 0.8}
    for i, thresh in ((0, 0.1), (3, 0.8), (-1, 0.8)):
        want = ref_meets_threshold(i, thresholds, want_unscaled)
        got = bool(meets_threshold(gu, valid, thresh))
        assert got == want, (i, thresh)
    # step not in thresholds: the scan encodes it as an inf threshold
    assert ref_meets_threshold(7, thresholds, want_unscaled) is True
    assert bool(meets_threshold(gu, valid, float("inf")))


# ---------------------------------------------------------------------------
# VERDICT r4 next #5: numeric pins for the use_optimizer / deep-latent /
# paint-with-words paths — the three whose reference semantics are subtlest.
# ---------------------------------------------------------------------------

def test_use_optimizer_sgd_parity():
    """The refinement loop's SGD+momentum rule (pipeline.sgd_momentum_update,
    used verbatim inside guided_update's while_loop) vs the reference's
    ``torch.optim.SGD([latents], lr=step_size/2.5, momentum=0.8)``
    (reference pipeline_guided_attention.py:495-497, 549-553), stepped over
    a STATE-DEPENDENT gradient sequence so momentum-buffer sequencing
    errors compound and get caught."""
    from guided_attention_tpu.pipeline import sgd_momentum_update

    rng = np.random.default_rng(11)
    v0 = rng.standard_normal((2, 4, 4)).astype(np.float32)
    A = rng.standard_normal((2, 4, 4)).astype(np.float32) * 0.3
    step_size = 17.3  # scale_factor * sqrt(scale_range[0]) scale

    def grad_of(v):  # synthetic state-dependent gradient
        return 0.05 * v * v + A

    # torch reference: optimizer holds the tensor, grads assigned externally
    p = torch.from_numpy(v0.copy()).requires_grad_(True)
    opt = torch.optim.SGD([p], lr=step_size / 2.5, momentum=0.8)
    for _ in range(6):
        opt.zero_grad()
        p.grad = torch.from_numpy(grad_of(p.detach().numpy()))
        opt.step()

    # this framework's rule, iterated identically
    v = jnp.asarray(v0)
    vel = jnp.zeros_like(v)
    for _ in range(6):
        v, vel = sgd_momentum_update(v, jnp.asarray(grad_of(np.asarray(v))), vel, step_size)

    np.testing.assert_allclose(np.asarray(v), p.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_plain_update_and_deep_scale_parity():
    """pipeline.plain_update vs the reference's _update_latent
    (pipeline:455-470): latent mode ``v - step*grad`` gated on loss != 0
    (pipeline:551-553), deep mode ``v - step*grad*200`` (the x200 at
    pipeline:464 — guided_update passes lr = step_size*200)."""
    from guided_attention_tpu.pipeline import plain_update

    rng = np.random.default_rng(5)
    v = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    g = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    step = 14.1

    # reference latent mode
    want = v - step * g
    got = plain_update(jnp.asarray(v), jnp.asarray(g), step, jnp.asarray(1.0))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)

    # loss == 0 -> no update (reference `elif loss != 0:` pipeline:551)
    got0 = plain_update(jnp.asarray(v), jnp.asarray(g), step, jnp.asarray(0.0))
    np.testing.assert_array_equal(np.asarray(got0), v)

    # deep mode: reference deepFeatures -= step * grad * 200 (pipeline:459-463)
    want_deep = v - step * g * 200.0
    got_deep = plain_update(jnp.asarray(v), jnp.asarray(g), step * 200.0, jnp.asarray(1.0))
    np.testing.assert_allclose(np.asarray(got_deep), want_deep, rtol=1e-6)


def test_deep_mode_sgd_deviation():
    """The DOCUMENTED deviation (pipeline.py guided_update comment): with
    use_optimizer + optimize_deep_latent combined, the reference's SGD holds
    [latents] (pipeline:497), so refinement steps move the LATENTS through
    skip-connection grads while deepFeatures only move at the final :1003
    plain update; this framework's optimizer drives the declared variable
    (the deep features). Simulated on a toy bilinear loss: assert (a) the
    two behaviors numerically DIVERGE, and (b) this framework's trajectory
    equals SGD-on-deep exactly."""
    from guided_attention_tpu.pipeline import plain_update, sgd_momentum_update

    rng = np.random.default_rng(23)
    lat0 = rng.standard_normal((6,)).astype(np.float32)
    deep0 = rng.standard_normal((6,)).astype(np.float32)
    W = rng.standard_normal((6, 6)).astype(np.float32) * 0.2
    step = 3.0

    def loss_t(lat, deep):  # toy differentiable in both variables
        return (lat * (torch.from_numpy(W) @ deep)).sum() + 0.1 * (deep**2).sum()

    # -- reference behavior: SGD([latents]); deep frozen during refinement --
    lat_t = torch.from_numpy(lat0.copy()).requires_grad_(True)
    deep_t = torch.from_numpy(deep0.copy()).requires_grad_(True)
    opt = torch.optim.SGD([lat_t], lr=step / 2.5, momentum=0.8)
    for _ in range(3):
        opt.zero_grad()
        if deep_t.grad is not None:
            deep_t.grad = None
        loss_t(lat_t, deep_t).backward()
        opt.step()
    # final plain update moves deepFeatures x200 (pipeline:459-464, 1003)
    loss = loss_t(lat_t, deep_t)
    (gd,) = torch.autograd.grad(loss, [deep_t])
    ref_deep = (deep_t - step * 200.0 * gd).detach().numpy()
    ref_lat = lat_t.detach().numpy()

    # -- this framework: SGD drives the deep features; latents fixed --
    def grads(lat, deep):
        lt = torch.from_numpy(np.asarray(lat)).requires_grad_(True)
        dt = torch.from_numpy(np.asarray(deep)).requires_grad_(True)
        gl, gd = torch.autograd.grad(loss_t(lt, dt), [lt, dt])
        return gl.numpy(), gd.numpy()

    deep_j = jnp.asarray(deep0)
    vel = jnp.zeros_like(deep_j)
    lr = step * 200.0  # guided_update: lr = step_size * 200 in deep mode
    for _ in range(3):
        _gl, gd_j = grads(lat0, deep_j)
        deep_j, vel = sgd_momentum_update(deep_j, jnp.asarray(gd_j), vel, lr)
    _gl, gd_j = grads(lat0, deep_j)
    deep_j = plain_update(deep_j, jnp.asarray(gd_j), lr, jnp.asarray(1.0))

    # (a) expected DIFFERENCE from the reference's accidental behavior
    assert not np.allclose(np.asarray(deep_j), ref_deep, atol=1e-4)
    assert not np.allclose(lat0, ref_lat, atol=1e-6)  # reference moved latents

    # (b) and an independent torch SGD-on-deep replay matches this framework
    deep_v = torch.from_numpy(deep0.copy()).requires_grad_(True)
    lat_v = torch.from_numpy(lat0.copy())
    opt2 = torch.optim.SGD([deep_v], lr=lr / 2.5, momentum=0.8)
    for _ in range(3):
        opt2.zero_grad()
        loss_t(lat_v, deep_v).backward()
        opt2.step()
    (gd2,) = torch.autograd.grad(loss_t(lat_v, deep_v), [deep_v])
    want = (deep_v - lr * gd2).detach().numpy()
    np.testing.assert_allclose(np.asarray(deep_j), want, rtol=1e-5, atol=1e-6)


def ref_pww_mask(token_dict, hw, hp, K=77):
    """Reference paint-with-words mask build (ptp_utils.py:113-132), loops
    and all: weight w inside each BOX token's shrunk rect (helpers.inside_box
    applies sample_center +0.5 and the shrink_factor offsets)."""
    mask = torch.zeros((hw, hw, K))
    w = hp.paint_with_words_weight
    for tok, info in token_dict.items():
        if info["loss_type"] != AnnotationType.BOX:
            continue
        r = info["loss"].of_size(hw)
        ox, oy = hp.shrink_factor * r.width, hp.shrink_factor * r.height
        for ii in range(hw):
            for jj in range(hw):
                cx, cy = jj + 0.5, ii + 0.5
                if (r.x + ox) <= cx <= (r.x + r.width - ox) and (r.y + oy) <= cy <= (r.y + r.height - oy):
                    mask[ii][jj][tok] = w
    return mask.reshape(hw * hw, K)


def test_paint_with_words_score_bias_parity():
    """ops/attention.py's pww bias vs a torch loop-port of the reference's
    processor (ptp_utils.py:97-146): scores = scale*q@k^T;
    scores += mask * 0.4 * scores.max() * log(1+sigma_t); probs = softmax.
    Compared through the REAL attention() entry point (captured probs and
    output hidden states), with the mask coming from the spec's precomputed
    pww_masks — so mask build, gate scalar, and bias application are all
    pinned at once."""
    from guided_attention_tpu.ops.attention import attention

    tok = SimpleTokenizer()
    prompt, annotations, _ = parse_prompt(META)
    hp = HyperParams(paint_with_words_stop=5, paint_with_words_weight=1.3)
    spec = build_guidance_spec(tok, prompt, annotations, hp)
    token_dict = build_token_dict(tok, prompt, annotations)

    hw, heads, dim, K = 16, 4, 40, 77
    nq = hw * hw
    rng = np.random.default_rng(3)
    q = rng.standard_normal((1, nq, heads * dim)).astype(np.float32)
    k = rng.standard_normal((1, K, heads * dim)).astype(np.float32)
    v = rng.standard_normal((1, K, heads * dim)).astype(np.float32)
    sigma_t = 0.73
    gate = float(np.log1p(sigma_t))  # step < stop -> gate = log(1+sigma)

    # torch reference port (per-head scores, the reference's global max)
    scale = 1.0 / math.sqrt(dim)
    qh = torch.from_numpy(q).reshape(1, nq, heads, dim).permute(0, 2, 1, 3)
    kh = torch.from_numpy(k).reshape(1, K, heads, dim).permute(0, 2, 1, 3)
    vh = torch.from_numpy(v).reshape(1, K, heads, dim).permute(0, 2, 1, 3)
    scores = torch.einsum("bhqd,bhkd->bhqk", qh, kh) * scale
    mask = ref_pww_mask(token_dict, hw, hp)  # [nq, K]
    scores = scores + mask[None, None] * 0.4 * scores.max() * math.log(1 + sigma_t)
    probs = torch.softmax(scores, dim=-1)
    want_pooled = probs.mean(dim=1)[0].numpy()
    want_out = (
        torch.einsum("bhqk,bhkd->bhqd", probs, vh)
        .permute(0, 2, 1, 3)
        .reshape(1, nq, heads * dim)[0]
        .numpy()
    )

    # spec's precomputed mask equals the reference's loop-built mask
    np.testing.assert_allclose(
        np.asarray(spec.pww_masks[hw]), mask.numpy(), rtol=0, atol=0
    )

    out, pooled = attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), heads,
        capture=True, pww_mask=spec.pww_masks[hw], pww_gate=jnp.float32(gate),
    )
    np.testing.assert_allclose(np.asarray(pooled)[0], want_pooled, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out)[0], want_out, rtol=1e-4, atol=1e-5)

    # gate == 0 (step >= stop) -> bias is a no-op: matches unbiased attention
    out0, pooled0 = attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), heads,
        capture=True, pww_mask=spec.pww_masks[hw], pww_gate=jnp.float32(0.0),
    )
    out_plain, pooled_plain = attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), heads, capture=True,
    )
    np.testing.assert_allclose(np.asarray(pooled0), np.asarray(pooled_plain), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out_plain), rtol=1e-6)


def test_pww_gate_schedule_parity():
    """StepArrays.pww_gates vs the reference's gate: bias active iff
    cur_time_step_iter < paint_with_words_stop, scaled by log(1 + sigma_t)
    with sigma = sqrt((1-acum)/acum) at t_i (ptp_utils.py:113-115, 137-138;
    shared_state.get_sigma :26-27; pipeline:887-890)."""
    from guided_attention_tpu.pipeline import GenStatics, make_step_arrays
    from guided_attention_tpu.schedulers.ddim import make_ddim_schedule

    S = 10
    hp = HyperParams(paint_with_words_stop=4)
    sched = make_ddim_schedule(S)
    arrays = make_step_arrays(GenStatics(num_steps=S), hp, sched, 20.0, (1.0, 0.5))
    sig = np.asarray(sched.sigmas)
    for i in range(S):
        want = math.log(1 + float(sig[i])) if i < 4 else 0.0
        np.testing.assert_allclose(float(arrays.pww_gates[i]), want, rtol=1e-6)
