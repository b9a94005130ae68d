"""Parser grammar parity tests (reference utils/helpers.py:41-114 edge cases)."""
import pytest

from guided_attention_tpu.annotation import (
    AnnotationType,
    Rect,
    find_matching_bracket,
    parse_prompt,
    meta_prompt_clean,
)
from guided_attention_tpu.guidance.custom import default_registry


def test_plain_prompt_passthrough():
    p, info, cl = parse_prompt("a dog and a cat")
    assert p == "a dog and a cat"
    assert info == [] and cl == {}


def test_coor_annotation():
    p, info, _ = parse_prompt("a [rat:.1,.25] runs")
    assert p == "a rat runs"
    assert len(info) == 1
    assert info[0].subprompt == "rat"
    assert info[0].kind == AnnotationType.COOR
    assert info[0].target == (0.1, 0.25)


def test_box_annotation_multiword_token():
    p, info, _ = parse_prompt("a [robot:.6,.3,.4,.55] and a [blue vase:0,.3,.4,.55]")
    assert p == "a robot and a blue vase"
    assert [a.kind for a in info] == [AnnotationType.BOX, AnnotationType.BOX]
    r = info[1].target
    assert isinstance(r, Rect)
    assert (r.x, r.y, r.width, r.height, r.size) == (0.0, 0.3, 0.4, 0.55, 1.0)
    assert info[1].subprompt == "blue vase"


def test_malformed_annotation_is_skipped():
    # 3 numbers: neither COOR nor BOX (helpers.py:103-104) — word still added
    p, info, _ = parse_prompt("a [rat:1,2,3] runs")
    assert p == "a rat runs"
    assert info == []


def test_unbalanced_bracket_raises():
    # documented deviation: the reference's parse loop never shrinks `rest`
    # on an unbalanced '[' and hangs forever (helpers.py:41-56 returns -1,
    # the slice rest[0:] is a no-op); we raise so a malformed request is a
    # fast error (HTTP 400 in the server) instead of a wedged process
    with pytest.raises(ValueError, match="unbalanced"):
        parse_prompt("a [unclosed:0.1")
    with pytest.raises(ValueError, match="unbalanced"):
        parse_prompt("a [nested [deeper:.1,.2] x")


def test_custom_loss_annotation_elides_word_and_adds_keywords():
    reg = default_registry()
    p, info, cl = parse_prompt(
        "a cat and a vase [CustomLoss:toLeftOf (cat,vase)]", reg.as_dict()
    )
    assert p == "a cat and a vase "  # plain-word tokens keep their separator
    assert "toLeftOf" in cl
    assert cl["toLeftOf"][1] == "(cat,vase)"
    kws = [a for a in info if a.kind == AnnotationType.KEYWORD]
    assert [a.subprompt for a in kws] == ["cat", "vase"]


def test_custom_loss_not_last():
    # The reference assumed CustomLoss is the final annotation; we delimit by
    # the bracket so trailing words survive.
    reg = default_registry()
    p, info, cl = parse_prompt(
        "a cat [CustomLoss:toLeftOf (cat,vase)] and a vase", reg.as_dict()
    )
    assert p == "a cat and a vase"
    assert cl["toLeftOf"][1] == "(cat,vase)"


def test_unknown_custom_loss_raises():
    with pytest.raises(KeyError):
        parse_prompt("x [CustomLoss:nope (a,b)]", {})


def test_nested_brackets():
    assert find_matching_bracket("[a[b]c]") == 6
    assert find_matching_bracket("[abc") == -1


def test_rect_of_size():
    r = Rect(0.5, 0.25, 0.5, 0.5, 1.0).of_size(16)
    assert (r.x, r.y, r.width, r.height, r.size) == (8.0, 4.0, 8.0, 8.0, 16)
    assert r.center() == (12.0, 8.0)
    assert r.right == 16.0 and r.bottom == 12.0


def test_meta_prompt_clean():
    assert meta_prompt_clean("a [x:.1,.2]") == "a _x__1,_2_"
    assert meta_prompt_clean("abcdefgh", interactive=True) == "abcde"


def test_leading_and_double_spaces():
    # plain words keep their trailing separator, as in the reference
    # (helpers.py:111-113 slices token = rest[0:space_index+1])
    p, info, _ = parse_prompt("  a   [rat:.1,.2]   and ")
    assert p == "a rat and "
    assert len(info) == 1


# ---- adversarial-input termination fuzz ----
# The round-trip fuzz below covers WELL-FORMED prompts; this covers garbage.
# Property: parse_prompt either returns or raises (ValueError/KeyError)
# QUICKLY on ANY byte soup — never hangs (the reference's loop spins forever
# on an unbalanced '[', helpers.py:41-56 + the non-shrinking rest slice) and
# never dies with an unexpected exception type.

def test_parse_prompt_terminates_on_garbage():
    import random
    import threading

    rng = random.Random(1234)
    alphabet = list("ab []:,.01") + ["[x:", ":.1,.2]", "CustomLoss", "]"]
    cases = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 40)))
        for _ in range(400)
    ] + ["[", "]", "[:", "[]", "[:]", "a [b:", "a ]b[ c", "[[[:", "[a:1,2"]
    for s in cases:
        box = {}

        def run(s=s):
            try:
                box["out"] = parse_prompt(s)
            except (ValueError, KeyError) as e:  # malformed: fine
                box["err"] = e
            except BaseException as e:  # noqa: BLE001
                box["bad"] = e

        t = threading.Thread(target=run, daemon=True)
        t.start()
        t.join(10)
        assert not t.is_alive(), f"parse_prompt hung on {s!r}"
        assert "bad" not in box, f"unexpected {type(box['bad']).__name__} on {s!r}: {box['bad']}"


# ---- randomized grammar round-trip (property test) ----
# Builds meta-prompts from known structure, parses them, and checks the
# parse AND the downstream token binding (build_guidance_spec) recover the
# exact ground truth. Complements the hand-picked edge cases above with
# breadth over token arity / annotation mix / coordinate formats
# (reference grammar: utils/helpers.py:59-114; binding: run.py:81-91).

def _random_meta_prompt(rng):
    vocab = ["cat", "dog", "robot", "vase", "park", "tiny", "red", "boat",
             "lamp", "fox", "tree", "moon", "chair", "bird", "cup", "hat"]
    rng.shuffle(vocab)
    vocab = iter(vocab)
    parts, expected_words, expected_anns = [], [], []
    n_units = rng.randint(2, 6)
    for _ in range(n_units):
        kind = rng.choice(["word", "coor", "box", "box"])
        token = next(vocab)
        if kind != "word" and rng.random() < 0.4:
            token = f"{token} {next(vocab)}"  # multi-word sub-prompt
        if kind == "word":
            parts.append(token)
            expected_words.append(token)
        elif kind == "coor":
            x, y = round(rng.random(), 2), round(rng.random(), 2)
            # mix ".5"-style and "0.5"-style fractions like the web UI
            fmt = (lambda v: f"{v:.2f}".lstrip("0") or "0") if rng.random() < 0.5 else str
            parts.append(f"[{token}:{fmt(x)},{fmt(y)}]")
            expected_words.append(token)
            expected_anns.append((token, AnnotationType.COOR, (x, y)))
        else:
            x, y = round(rng.random() * 0.5, 2), round(rng.random() * 0.5, 2)
            w, h = round(0.1 + rng.random() * 0.4, 2), round(0.1 + rng.random() * 0.4, 2)
            parts.append(f"[{token}:{x},{y},{w},{h}]")
            expected_words.append(token)
            expected_anns.append((token, AnnotationType.BOX, (x, y, w, h)))
    return " ".join(parts), " ".join(expected_words), expected_anns


@pytest.mark.parametrize("seed", range(25))
def test_grammar_roundtrip_fuzz(seed):
    import random

    import numpy as np

    from guided_attention_tpu.config import HyperParams
    from guided_attention_tpu.guidance.spec import build_guidance_spec, find_token_span
    from guided_attention_tpu.models.tokenizer import SimpleTokenizer

    rng = random.Random(seed)
    meta, want_prompt, want_anns = _random_meta_prompt(rng)
    prompt, meta_info, custom = parse_prompt(meta)
    assert prompt == want_prompt
    assert custom == {}
    assert len(meta_info) == len(want_anns)
    for ann, (token, kind, geo) in zip(meta_info, want_anns):
        assert ann.subprompt == token and ann.kind == kind
        if kind == AnnotationType.COOR:
            assert ann.target == pytest.approx(geo)
        else:
            r = ann.target
            assert (r.x, r.y, r.width, r.height) == pytest.approx(geo)

    tok = SimpleTokenizer()
    spec = build_guidance_spec(tok, prompt, meta_info, HyperParams())
    full_ids = tok.encode(prompt)
    ann_type = np.asarray(spec.ann_type)
    token_mask = np.asarray(spec.token_mask)
    center = np.asarray(spec.center_xy)
    bound = set()
    for token, kind, geo in want_anns:
        span = find_token_span(full_ids, tok.encode(token)[1:-1])
        assert span is not None  # every sub-prompt must bind
        for idx in span:
            bound.add(idx)
            assert token_mask[idx]
            assert ann_type[idx] == int(kind)
            if kind == AnnotationType.COOR:
                assert center[idx] == pytest.approx(geo, abs=1e-6)
            else:
                x, y, w, h = geo
                assert center[idx] == pytest.approx((x + w / 2, y + h / 2), abs=1e-6)
    # no stray slots bound beyond the annotated spans
    assert set(np.nonzero(token_mask)[0].tolist()) == bound
