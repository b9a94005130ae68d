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
