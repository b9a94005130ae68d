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
