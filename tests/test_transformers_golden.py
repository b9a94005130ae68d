"""Goldens against the REAL installed libraries (transformers 4.x).

Round-2 verdict: every CLIP golden compared against a torch mirror written
by the same author (tests/test_torch_golden.py) — correlated-error risk on
exactly the bits the reference gets from the library for free (the reference
uses transformers.CLIPTextModel directly, reference
pipeline_guided_attention.py:131-135, and transformers.CLIPTokenizer via
from_pretrained, reference run.py:28). Here:

  * a random-init ``transformers.CLIPTextModel`` (no network: built from a
    CLIPTextConfig) is converted through ``convert_state_dict`` and its
    ``last_hidden_state`` compared against our Flax forward, for BOTH the
    quick_gelu (SD1.x) and gelu (SD2.1) activation variants;
  * a synthesized tiny vocab.json/merges.txt pair is loaded through the
    installed ``transformers.CLIPTokenizer`` and drives token binding
    (``find_token_span`` / ``build_guidance_spec`` /
    ``find_indices_for_sub_prompt``) on words that split into MULTIPLE BPE
    tokens, including the ``</w>``-suffix discrimination the reference's
    index binding relies on (reference run.py:69-91).
"""
import json
import string

import numpy as np
import pytest
import jax
import jax.numpy as jnp

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

from guided_attention_tpu.annotation import Annotation, AnnotationType, Rect
from guided_attention_tpu.config import HyperParams
from guided_attention_tpu.guidance.spec import build_guidance_spec, find_token_span
from guided_attention_tpu.models.clip import CLIPTextConfig, CLIPTextModel
from guided_attention_tpu.models.convert import convert_state_dict
from guided_attention_tpu.models.tokenizer import load_tokenizer, pad_ids


# ---------------------------------------------------------------------------
# CLIPTextModel forward golden vs the installed transformers library
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("act", ["quick_gelu", "gelu"], ids=["sd1x", "sd21"])
def test_clip_forward_matches_transformers(act):
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=1000,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        max_position_embeddings=77,
        hidden_act=act,
    )
    torch.manual_seed(0 if act == "quick_gelu" else 1)
    hf = transformers.CLIPTextModel(hf_cfg).eval()

    cfg = CLIPTextConfig(
        vocab_size=1000,
        hidden_size=64,
        num_layers=2,
        num_heads=4,
        intermediate_size=128,
        hidden_act=act,
    )
    model = CLIPTextModel(cfg)
    ids = np.zeros((2, 77), np.int64)
    rng = np.random.default_rng(7)
    ids[:, 0] = 998  # BOS-ish
    ids[:, 1:9] = rng.integers(2, 900, (2, 8))
    ids[:, 9:] = 999  # EOS padding — exercised slots, like real prompts
    flax_init = model.init(jax.random.PRNGKey(0), jnp.asarray(ids, jnp.int32))["params"]

    torch_sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = convert_state_dict(torch_sd, flax_init, "text_encoder")

    ours = np.asarray(model.apply({"params": params}, jnp.asarray(ids, jnp.int32)))
    with torch.no_grad():
        theirs = hf(input_ids=torch.from_numpy(ids)).last_hidden_state.numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5, rtol=1e-5)


# ---------------------------------------------------------------------------
# Real-BPE token binding through the installed CLIPTokenizer
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def bpe_dir(tmp_path_factory):
    """Tiny CLIP-BPE vocab where 'cat'/'vase' merge to single tokens while
    'dog' stays 3 BPE tokens ('d','o','g</w>') — the multi-BPE-word shape the
    reference's binding must handle (run.py:69-91)."""
    d = tmp_path_factory.mktemp("bpe")
    letters = list(string.ascii_lowercase)
    toks = (
        ["<|startoftext|>", "<|endoftext|>"]
        + letters
        + [c + "</w>" for c in letters]
        + ["ca", "cat</w>", "va", "vas", "vase</w>"]
    )
    vocab = {t: i for i, t in enumerate(dict.fromkeys(toks))}
    merges = ["#version: 0.2", "c a", "ca t</w>", "v a", "va s", "vas e</w>"]
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("\n".join(merges) + "\n")
    tok = transformers.CLIPTokenizer(str(d / "vocab.json"), str(d / "merges.txt"))
    tok.save_pretrained(str(d / "tokenizer"))
    return d


@pytest.fixture(scope="module")
def bpe_tok(bpe_dir):
    tok = load_tokenizer(str(bpe_dir))
    assert type(tok).__name__ == "CLIPTokenizer"  # not the SimpleTokenizer fallback
    return tok


def test_multi_bpe_word_span(bpe_tok):
    full = bpe_tok.encode("a cat and a dog")
    sub = bpe_tok.encode("dog")[1:-1]
    assert len(sub) == 3  # d, o, g</w>
    span = find_token_span(full, sub)
    assert span is not None and len(span) == 3
    assert [full[i] for i in span] == sub


def test_eot_suffix_discrimination(bpe_tok):
    """'do' tokenizes to ('d','o</w>'); the </w> suffix must keep it from
    matching inside 'dog' ('d','o','g</w>') but match a real 'do' word."""
    sub = bpe_tok.encode("do")[1:-1]
    assert find_token_span(bpe_tok.encode("a dog runs"), sub) is None
    full = bpe_tok.encode("just do it")
    span = find_token_span(full, sub)
    assert span is not None and [full[i] for i in span] == sub


def test_guidance_spec_binds_multi_bpe_tokens(bpe_tok):
    hp = HyperParams()
    anns = [
        Annotation("dog", AnnotationType.BOX, Rect(0.1, 0.1, 0.5, 0.5, 1.0)),
        Annotation("cat", AnnotationType.COOR, (0.7, 0.3)),
    ]
    spec = build_guidance_spec(bpe_tok, "a cat and a dog", anns, hp)
    mask = np.asarray(spec.token_mask)
    sub_dog = bpe_tok.encode("dog")[1:-1]
    full = bpe_tok.encode("a cat and a dog")
    dog_span = find_token_span(full, sub_dog)
    cat_span = find_token_span(full, bpe_tok.encode("cat")[1:-1])
    assert len(dog_span) == 3 and len(cat_span) == 1
    # every BPE token of the annotated word is bound; nothing else is
    assert set(np.nonzero(mask)[0]) == set(dog_span) | set(cat_span)
    # all of dog's BPE tokens share one sub-prompt group with BOX geometry
    gids = np.asarray(spec.subprompt_id)[dog_span]
    assert len(set(gids.tolist())) == 1 and gids[0] >= 0
    types = np.asarray(spec.ann_type)
    assert all(types[i] == int(AnnotationType.BOX) for i in dog_span)
    assert types[cat_span[0]] == int(AnnotationType.COOR)
    assert np.asarray(spec.inside_mask)[dog_span[0]].sum() > 0


def test_find_indices_for_sub_prompt_real_bpe(bpe_tok):
    """The custom-loss helper resolves multi-BPE sub-prompts to original
    (BOS-at-0) coordinates (reference run.py:162-167)."""
    from guided_attention_tpu.guidance.custom import ToLeftOf

    loss = ToLeftOf()
    prompt = "a cat and a dog"
    idx = loss.find_indices_for_sub_prompt(bpe_tok, prompt, "dog")
    full = bpe_tok.encode(prompt)
    assert idx is not None and len(idx) == 3
    assert [full[i] for i in idx] == bpe_tok.encode("dog")[1:-1]
    loss.bind(bpe_tok, prompt, "(cat,dog)")
    assert len(loss._left) == 1 and len(loss._right) == 3


def test_pad_ids_uses_tokenizer_pad(bpe_tok):
    ids = pad_ids(bpe_tok, "a cat")
    assert len(ids) == 77
    assert ids[0] == bpe_tok.bos_token_id
    assert ids[-1] == bpe_tok.pad_token_id
