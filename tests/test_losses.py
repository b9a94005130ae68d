"""Loss-engine parity vs literal numpy ports of the reference's Python-loop
formulas (reference utils/helpers.py:158-277, pipeline:201-296, 358-451)."""
import numpy as np
import jax.numpy as jnp
import pytest

from guided_attention_tpu.annotation import Rect, parse_prompt
from guided_attention_tpu.config import HyperParams
from guided_attention_tpu.guidance.losses import (
    compute_loss,
    compute_token_stats,
    meets_threshold,
)
from guided_attention_tpu.guidance.spec import build_guidance_spec, _box_weight_maps
from guided_attention_tpu.models.tokenizer import SimpleTokenizer

TOK = SimpleTokenizer()
HP = HyperParams()


# ---- literal loop ports of the reference bounding-box helpers ----

def ref_inside_box(cur_x, cur_y, rect, shrink):
    cur_x += 0.5
    cur_y += 0.5
    ox = shrink * rect.width
    oy = shrink * rect.height
    return (rect.x + ox) <= cur_x <= (rect.x + rect.width - ox) and (
        rect.y + oy
    ) <= cur_y <= (rect.y + rect.height - oy)


def ref_weight_maps(rect16, shrink):
    """utils/helpers.py:215-246 as written."""
    weights = np.ones((16, 16))
    for ii in range(16):
        for jj in range(16):
            if ref_inside_box(jj, ii, rect16, shrink):
                cx, cy = rect16.center()
                c_dist = (
                    np.sqrt(
                        (2 * (cx - (jj + 0.5)) / rect16.width) ** 2
                        + (2 * (cy - (ii + 0.5)) / rect16.height) ** 2
                    )
                    / np.sqrt(2)
                )
                weights[ii, jj] = np.interp(c_dist, [0, 0.333, 0.666, 1.0], [3, 2.5, 1, 0.2])
            else:
                weights[ii, jj] = 1.0
    inside = np.array(
        [[ref_inside_box(jj, ii, rect16, shrink) for jj in range(16)] for ii in range(16)]
    )
    sum_in = weights[inside].sum()
    sum_out = weights[~inside].sum()
    w = weights.copy()
    w[inside] /= sum_in
    w[~inside] /= sum_out
    return inside, w


def ref_bbox_losses(rect16, img, shrink, strict):
    inside, w = ref_weight_maps(rect16, shrink)
    num_inside = inside.sum()
    if strict:
        at_most = 1.0 / num_inside
        li = sum(
            w[ii, jj] * 2.0 * max(0.0, at_most - img[ii, jj])
            for ii in range(16)
            for jj in range(16)
            if inside[ii, jj]
        )
        lo = sum(
            w[ii, jj] * max(0.0, img[ii, jj])
            for ii in range(16)
            for jj in range(16)
            if not inside[ii, jj]
        )
        return li, lo
    si = img[inside].sum()
    so = img[~inside].sum()
    return 1.0 - si, so


def make_spec(meta_prompt, hp=HP, **kw):
    prompt, info, custom = parse_prompt(meta_prompt)
    return prompt, build_guidance_spec(TOK, prompt, info, hp, custom, **kw)


def test_box_weight_maps_match_reference_loops():
    rect = Rect(0.1, 0.25, 0.5, 0.4, 1.0)
    inside, w_in, w_out, at_most = _box_weight_maps(rect, 16, 0.15)
    ref_inside, ref_w = ref_weight_maps(rect.of_size(16), 0.15)
    np.testing.assert_array_equal(inside.astype(bool), ref_inside)
    np.testing.assert_allclose(np.where(ref_inside, ref_w, 0), w_in, rtol=1e-5)
    np.testing.assert_allclose(np.where(~ref_inside, ref_w, 0), w_out, rtol=1e-5)
    assert at_most == pytest.approx(1.0 / ref_inside.sum())


@pytest.mark.parametrize("strict", [False, True])
def test_bbox_losses_match_reference(strict):
    hp = HP.replace(strict=strict, bb_center_weight=0.0)
    prompt, spec = make_spec("a [robot:.1,.25,.5,.4] here", hp)
    rng = np.random.default_rng(1)
    maps = rng.random((16, 16, 77)).astype(np.float32) * 0.05
    stats = compute_token_stats(jnp.asarray(maps), spec, hp, smooth_attentions=False)
    # token slot for "robot" = index 2 (bos, a, robot, ...)
    idx = 2
    img = np.asarray(stats.probs)[:, :, idx]
    img = img / img.sum()
    li, lo = ref_bbox_losses(Rect(0.1, 0.25, 0.5, 0.4).of_size(16), img, 0.15, strict)
    assert float(stats.inside_loss[idx]) == pytest.approx(float(li), rel=1e-4)
    assert float(stats.outside_loss[idx]) == pytest.approx(float(lo), rel=1e-4)


def test_resoftmax_matches_slice_then_softmax():
    _, spec = make_spec("a [rat:.5,.5] runs")
    rng = np.random.default_rng(2)
    maps = rng.random((16, 16, 77)).astype(np.float32) * 0.05
    stats = compute_token_stats(jnp.asarray(maps), spec, HP, smooth_attentions=False)
    # reference slices [:, :, 1:-1] then softmaxes (pipeline:217-219)
    sl = maps[:, :, 1:76] * 100.0
    ref = np.exp(sl - sl.max(-1, keepdims=True))
    ref = ref / ref.sum(-1, keepdims=True)
    got = np.asarray(stats.probs)
    np.testing.assert_allclose(got[:, :, 1:76], ref, rtol=1e-4, atol=1e-6)
    assert got[:, :, 0].max() == 0.0 and got[:, :, 76].max() == 0.0


def test_centroid_matches_loop():
    _, spec = make_spec("a [rat:.5,.5] runs")
    rng = np.random.default_rng(3)
    maps = rng.random((16, 16, 77)).astype(np.float32) * 0.05
    stats = compute_token_stats(jnp.asarray(maps), spec, HP, smooth_attentions=True)
    idx = 2
    img = np.asarray(stats.smoothed)[:, :, idx]
    norm = img / img.sum()
    col = sum((jj + 0.5) * norm[ii, jj] for ii in range(16) for jj in range(16))
    row = sum((ii + 0.5) * norm[ii, jj] for ii in range(16) for jj in range(16))
    assert float(stats.col[idx]) == pytest.approx(col, rel=1e-4)
    assert float(stats.row[idx]) == pytest.approx(row, rel=1e-4)


def test_coor_loss_formula():
    hp = HP
    prompt, spec = make_spec("a [rat:.5,.25] runs", hp)
    rng = np.random.default_rng(4)
    maps = rng.random((16, 16, 77)).astype(np.float32) * 0.05
    stats = compute_token_stats(jnp.asarray(maps), spec, hp)
    total, gs, gu, valid = compute_loss(stats, spec, hp)
    idx = 2
    col, row = float(stats.col[idx]), float(stats.row[idx])
    want = 1.0 * abs(col - 0.5 * 16) / 15.0 + 4.0 * abs(row - 0.25 * 16) / 15.0
    assert float(total) == pytest.approx(want, rel=1e-4)
    assert int(np.sum(np.asarray(valid))) == 1


def test_multitoken_subprompt_groups_sum_and_avg():
    hp = HP
    prompt, spec = make_spec("a [blue vase:0,.3,.4,.55] x", hp)
    assert spec.n_groups == 1
    # two bound tokens, same group
    mask = np.asarray(spec.token_mask)
    assert mask.sum() == 2
    rng = np.random.default_rng(5)
    maps = rng.random((16, 16, 77)).astype(np.float32) * 0.05
    stats = compute_token_stats(jnp.asarray(maps), spec, hp)
    t_sum, gs, gu, valid = compute_loss(stats, spec, hp, sub_prompt_avg_within=False)
    t_avg, gsa, _, _ = compute_loss(stats, spec, hp, sub_prompt_avg_within=True)
    assert float(t_avg) == pytest.approx(float(t_sum) / 2.0, rel=1e-5)


def test_meets_threshold_semantics():
    gu = jnp.asarray([0.5, 2.0, 0.0])
    valid = jnp.asarray([True, False, True])
    assert bool(meets_threshold(gu, valid, 1.0))  # invalid group ignored
    assert not bool(meets_threshold(gu, jnp.asarray([True, True, True]), 1.0))
    assert bool(meets_threshold(gu, jnp.asarray([True, True, True]), jnp.inf))


def test_keyword_tokens_no_loss_by_default():
    from guided_attention_tpu.guidance.custom import default_registry

    reg = default_registry()
    prompt, info, custom = parse_prompt("a cat and a vase [CustomLoss:toLeftOf (cat,vase)]", reg.as_dict())
    spec = build_guidance_spec(TOK, prompt, info, HP, custom)
    assert spec.custom_group >= 0
    rng = np.random.default_rng(6)
    maps = rng.random((16, 16, 77)).astype(np.float32) * 0.05
    stats = compute_token_stats(jnp.asarray(maps), spec, HP)
    total, gs, gu, valid = compute_loss(stats, spec, HP)
    # keyword per-token losses are zero; only the custom loss contributes
    assert float(total) == pytest.approx(float(stats.custom_loss), abs=1e-6)


def test_to_left_of_direction():
    """Mass on the left for 'cat' and right for 'vase' -> zero loss; swapped -> positive."""
    from guided_attention_tpu.guidance.custom import default_registry

    reg = default_registry()
    prompt, info, custom = parse_prompt("a cat and a vase [CustomLoss:toLeftOf (cat,vase)]", reg.as_dict())
    spec = build_guidance_spec(TOK, prompt, info, HP, custom)
    maps = np.full((16, 16, 77), 1e-4, np.float32)
    cat_idx, vase_idx = 2, 5  # bos a cat and a vase
    maps[:, :3, cat_idx] = 0.05  # cat mass on far left
    maps[:, 13:, vase_idx] = 0.05  # vase mass on far right
    stats = compute_token_stats(jnp.asarray(maps), spec, HP)
    assert float(stats.custom_loss) == 0.0
    maps2 = np.full((16, 16, 77), 1e-4, np.float32)
    maps2[:, 13:, cat_idx] = 0.05
    maps2[:, :3, vase_idx] = 0.05
    stats2 = compute_token_stats(jnp.asarray(maps2), spec, HP)
    assert float(stats2.custom_loss) > 0.0


def test_grad_through_loss_is_finite():
    """Regression: masked-softmax + mass normalization must not NaN the VJP
    (fp32 underflow of mass**2 for empty token slots)."""
    import jax

    _, spec = make_spec("a [robot:.6,.3,.4,.55] and a [blue vase:0,.3,.4,.55]")

    def loss_fn(z):
        maps = jax.nn.softmax(z, axis=-1)
        stats = compute_token_stats(maps, spec, HP)
        total, *_ = compute_loss(stats, spec, HP)
        return total

    z = jax.random.normal(jax.random.PRNGKey(0), (16, 16, 77)) * 0.01
    l0 = float(loss_fn(z))
    g = jax.grad(loss_fn)(z)
    assert bool(jnp.isfinite(g).all())
    # descent on the synthetic maps must strictly reduce the loss
    for _ in range(20):
        z = z - 20.0 * jax.grad(loss_fn)(z)
    assert float(loss_fn(z)) < l0


def test_custom_loss_rebind_changes_jit_key():
    """Regression: re-binding the shared registry loss object for a new
    prompt must change the spec's static identity so jit retraces (the
    bound token indices are baked into the traced graph)."""
    import jax
    from guided_attention_tpu.guidance.custom import default_registry

    reg = default_registry()
    p1, i1, c1 = parse_prompt("a cat and a vase [CustomLoss:toLeftOf (cat,vase)]", reg.as_dict())
    spec1 = build_guidance_spec(TOK, p1, i1, HP, c1)
    state1 = spec1.custom_losses[0][1].static_state()
    p2, i2, c2 = parse_prompt("a vase and a cat [CustomLoss:toLeftOf (cat,vase)]", reg.as_dict())
    spec2 = build_guidance_spec(TOK, p2, i2, HP, c2)
    state2 = spec2.custom_losses[0][1].static_state()
    assert state1 != state2  # indices moved

    # the traced fn must see fresh indices: trace twice via jit and compare
    calls = []

    def f(maps, spec):
        calls.append(1)
        stats = compute_token_stats(maps, spec, HP)
        return stats.custom_loss

    jf = jax.jit(f, static_argnums=())
    maps = jnp.asarray(np.full((16, 16, 77), 1e-4, np.float32))
    # rebuild spec1's binding (registry object currently holds spec2's state)
    p1b, i1b, c1b = parse_prompt("a cat and a vase [CustomLoss:toLeftOf (cat,vase)]", reg.as_dict())
    spec1b = build_guidance_spec(TOK, p1b, i1b, HP, c1b)
    _ = jf(maps, spec1b)
    n1 = len(calls)
    p2b, i2b, c2b = parse_prompt("a vase and a cat [CustomLoss:toLeftOf (cat,vase)]", reg.as_dict())
    spec2b = build_guidance_spec(TOK, p2b, i2b, HP, c2b)
    _ = jf(maps, spec2b)
    assert len(calls) == n1 + 1, "jit must retrace when bound indices change"
