"""PrepareOptions: the single source of truth for generation knobs.

The prepare cache returns device-resident (spec, statics, sched, arrays,
emb) for a repeated config; a knob missing from the cache key would silently
serve stale state for calls that differ only in that knob (the round-2
verdict's generate_batch complaint, generalized). cache_key is derived from
the dataclass field list itself, and this test proves every field
participates — including any field added later.
"""
import dataclasses

import pytest

from guided_attention_tpu.annotation import Annotation, AnnotationType, Rect
from guided_attention_tpu.config import HyperParams
from guided_attention_tpu.runner import PrepareOptions


@pytest.fixture(scope="module")
def pipe():
    import jax.numpy as jnp

    from guided_attention_tpu.models.bundle import StableDiffusion
    from guided_attention_tpu.runner import GuidedAttentionPipeline

    return GuidedAttentionPipeline(StableDiffusion.create("micro", dtype=jnp.float32))



def _altered(field, value):
    """A value for `field` guaranteed to differ from the default in cache-key
    space."""
    if field.name == "hp":
        return HyperParams(recurse_steps=7)
    if field.name == "thresholds":
        return {3: 0.7}
    if field.name == "scale_range":
        return (2.0, 1.5)
    if isinstance(value, bool):
        return not value
    if isinstance(value, int):
        return value + 1
    if isinstance(value, float):
        return value + 0.25
    if isinstance(value, str) or value is None:
        return (value or "") + "x"
    raise AssertionError(f"add an alteration rule for new field {field.name!r}")


def test_cache_key_covers_every_field():
    base = PrepareOptions(meta_prompt="a [x:.1,.1,.2,.2]")
    k0 = base.cache_key(0)
    assert k0 == PrepareOptions(meta_prompt="a [x:.1,.1,.2,.2]").cache_key(0)
    for f in dataclasses.fields(PrepareOptions):
        if f.name == "annotations":
            alt = dataclasses.replace(
                base, annotations=[Annotation("x", AnnotationType.COOR, (0.1, 0.2))]
            )
        else:
            alt = dataclasses.replace(base, **{f.name: _altered(f, getattr(base, f.name))})
        assert alt.cache_key(0) != k0, f"cache_key ignores field {f.name!r}"
    assert base.cache_key(1) != k0  # registry bumps invalidate bound specs


def test_explicit_annotations_key_by_value():
    """Caller-supplied annotations are frozen dataclasses: identical VALUES
    from distinct objects must produce the same cache key (the API path,
    e.g. the GUI builder bypassing meta-prompt strings, would otherwise
    re-prepare + re-encode on every call), while different values — and
    mutated-then-reused mutable targets — produce different keys."""
    def anns():
        return [
            Annotation("robot", AnnotationType.BOX, Rect(0.6, 0.3, 0.4, 0.55)),
            Annotation("vase", AnnotationType.COOR, (0.1, 0.2)),
            Annotation("sky", AnnotationType.KEYWORD, None),
        ]

    a = PrepareOptions(prompt="a robot and a vase", annotations=anns())
    b = PrepareOptions(prompt="a robot and a vase", annotations=anns())
    assert a.cache_key(0) is not None
    assert a.cache_key(0) == b.cache_key(0)

    moved = [Annotation("robot", AnnotationType.BOX, Rect(0.1, 0.3, 0.4, 0.55))]
    c = PrepareOptions(prompt="a robot and a vase", annotations=moved)
    assert c.cache_key(0) != a.cache_key(0)

    # a mutable target is snapshotted by value: mutation changes the key
    tgt = [0.1, 0.2]
    d = PrepareOptions(prompt="a robot", annotations=[Annotation("robot", AnnotationType.COOR, tgt)])
    k_before = d.cache_key(0)
    assert k_before is not None
    tgt[0] = 0.9
    assert d.cache_key(0) != k_before

    # unrecognized target type -> uncacheable, not a crash
    weird = [Annotation("robot", AnnotationType.COOR, object())]
    assert PrepareOptions(prompt="a robot", annotations=weird).cache_key(0) is None


def test_explicit_annotations_hit_prepare_cache(pipe):
    """Two identical annotations=[...] calls run _prepare_uncached once."""
    calls = {"n": 0}
    orig = pipe._prepare_uncached

    def counting(opts):
        calls["n"] += 1
        return orig(opts)

    pipe._prepare_uncached = counting
    try:
        kw = dict(
            prompt="a dog by a tree",
            num_inference_steps=2,
            thresholds={0: 0.5},
            max_iter_to_alter=1,
            decode=False,
            capture_diagnostics=False,
        )
        pipe.dispatch(
            seed=1,
            annotations=[Annotation("dog", AnnotationType.COOR, (0.2, 0.3))],
            **kw,
        ).result()
        first = calls["n"]
        pipe.dispatch(
            seed=2,
            annotations=[Annotation("dog", AnnotationType.COOR, (0.2, 0.3))],
            **kw,
        ).result()
        assert calls["n"] == first, "identical annotations re-prepared"
    finally:
        pipe._prepare_uncached = orig


def test_unknown_knob_rejected():
    with pytest.raises(TypeError):
        PrepareOptions(bogus_knob=1)


def test_from_locals_requires_every_field():
    ns = {f.name: getattr(PrepareOptions(), f.name) for f in dataclasses.fields(PrepareOptions)}
    assert PrepareOptions.from_locals({**ns, "self": None, "seed": 3}) == PrepareOptions()
    with pytest.raises(KeyError):  # public-signature drift fails loudly
        PrepareOptions.from_locals({k: v for k, v in ns.items() if k != "eta"})


def test_trim_plan_keep_sets():
    """_trim_plan must return EXACTLY the steps whose scan iteration can run
    a guidance eval (pipeline.guidance_gates): trimming any step that could
    eval would drop real artifact content; keeping extra steps only wastes
    transfer."""
    from guided_attention_tpu.pipeline import GenStatics
    from guided_attention_tpu.runner import _trim_plan

    S = 10
    st = GenStatics(num_steps=S, max_iter_to_alter=4)
    assert _trim_plan(st, HyperParams(thresholds={0: 1.0})) == (0,)
    assert _trim_plan(st, HyperParams(thresholds={0: 0.1, 3: 0.8})) == (0, 3)
    # out-of-range threshold steps are ignored (make_step_arrays parity)
    assert _trim_plan(st, HyperParams(thresholds={0: 0.1, 99: 0.8})) == (0,)
    # alter-window steps eval too when only_update_on_threshold_steps is off
    st_all = dataclasses.replace(st, only_update_on_threshold_steps=False)
    assert _trim_plan(st_all, HyperParams(thresholds={0: 1.0, 6: 0.5})) == (0, 1, 2, 3, 6)
    # standard SD: no evals anywhere
    assert _trim_plan(dataclasses.replace(st, run_standard_sd=True), HyperParams()) == ()
    # skip_inert off: every step runs an eval -> no trim possible
    assert _trim_plan(
        dataclasses.replace(st, skip_inert_guidance_passes=False), HyperParams()
    ) is None


def test_trim_heavy_diags(pipe):
    """Pull-time trimming of the heavy per-step diagnostic stacks
    (dispatch(trim_heavy_diags=True)): x0_pred/latent_in keep only the
    always_save_iter prefix [0,1,2], everything else stays full, and the
    artifact writer still produces its tree from the trimmed output."""
    import numpy as np

    kw = dict(meta_prompt="a [dog:.2,.3] x", num_inference_steps=4,
              thresholds={0: 0.5}, max_iter_to_alter=1)
    out = pipe.dispatch(seed=3, trim_heavy_diags=True, **kw).result()
    d = out.diagnostics
    assert d.x0_pred.shape[0] == 3 and d.latent_in.shape[0] == 3
    assert d.maps.shape[0] == 4 and d.total_loss.shape[0] == 4
    full = pipe.dispatch(seed=3, **kw).result()
    np.testing.assert_array_equal(d.x0_pred, full.diagnostics.x0_pred[:3])
    # maps/eval_unscaled ride the device->host pull gathered down to the
    # eval-step set ({0} for thresholds {0: .5}) and scatter back to full
    # shape CONTENT-EXACTLY (non-eval steps are zeros by construction)
    np.testing.assert_array_equal(d.maps, full.diagnostics.maps)
    np.testing.assert_array_equal(d.eval_unscaled, full.diagnostics.eval_unscaled)
    assert np.asarray(d.maps[0]).any()  # the eval step's map is real content
    assert not np.asarray(d.maps[1:]).any()  # non-eval steps are zeros

    # a later-step threshold keeps ITS step too (the keep-set is exact)
    kw2 = dict(kw, thresholds={0: 0.5, 2: 0.7})
    t2 = pipe.dispatch(seed=3, trim_heavy_diags=True, **kw2).result()
    f2 = pipe.dispatch(seed=3, **kw2).result()
    np.testing.assert_array_equal(t2.diagnostics.maps, f2.diagnostics.maps)
    assert np.asarray(t2.diagnostics.maps[2]).any()

    # placeholders (capture_diagnostics=False) pass through untrimmed
    mini = pipe.dispatch(seed=3, capture_diagnostics=False,
                         trim_heavy_diags=True, **kw).result()
    assert mini.diagnostics.x0_pred.shape == (4, 1, 1, 1)

    # batch path trims per sample
    bouts = pipe.dispatch_batch([1, 2], trim_heavy_diags=True, **kw).result()
    assert all(o.diagnostics.x0_pred.shape[0] == 3 for o in bouts)

    # the artifact tree still writes from a trimmed output
    from pathlib import Path
    import tempfile

    from guided_attention_tpu.config import HyperParams
    from guided_attention_tpu.runtime.artifacts import write_run_artifacts

    with tempfile.TemporaryDirectory() as td:
        _, path, _ = write_run_artifacts(
            pipe, out, output_path=Path(td), seed=3, hp=HyperParams(),
            meta_prompt=kw["meta_prompt"],
        )
        assert Path(path).exists()
        run_dir = Path(path).parent
        preds = list((run_dir / "3").glob("*_pred*.png"))
        assert len(preds) == 3, preds
