"""Unit tests for the profiler's optimized-HLO fusion join
(scripts/profile_guided.py) — the machinery that turned the r4 trace's
64.8% opaque `%fusion.N` pool into 98.6% named attribution (docs/PERF.md
round 5). Pure text parsing: no JAX, no chip."""
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import profile_guided as pg  # noqa: E402

HLO = """\
HloModule jit_fused, entry_computation_layout={...}

%fused_computation.1 (param_0.1: bf16[2,64,64,320]) -> bf16[2,64,64,320] {
  %param_0.1 = bf16[2,64,64,320]{3,2,1,0:T(8,128)(2,1)} parameter(0)
  %convolution.7 = bf16[2,64,64,320]{3,2,1,0:T(8,128)(2,1)} convolution(%param_0.1, %param_0.1), window={size=3x3}, dim_labels=b01f_01io->b01f
  ROOT %add.3 = bf16[2,64,64,320]{3,2,1,0:T(8,128)(2,1)} add(%convolution.7, %param_0.1)
}

%fused_computation.2 (param_0.2: f32[8,2,8,1024]) -> f32[8,2,8,1024] {
  %param_0.2 = f32[8,2,8,1024]{3,2,1,0:T(8,128)} parameter(0)
  %exp.1 = f32[8,2,8,1024]{3,2,1,0:T(8,128)} exponential(%param_0.2)
  ROOT %reduce.9 = f32[8,2,8,1024]{3,2,1,0:T(8,128)} reduce(%exp.1, %exp.1), dimensions={3}, to_apply=%sum
}

%fused_computation.3 (param_0.3: f32[16]) -> f32[16] {
  %param_0.3 = f32[16]{0} parameter(0)
  ROOT %copy.5 = f32[16]{0} copy(%param_0.3)
}

%fused_computation.4 (param_0.4: f32[16]) -> f32[16] {
  %param_0.4 = f32[16]{0} parameter(0)
  ROOT %multiply.2 = f32[16]{0} multiply(%param_0.4, %param_0.4)
}

ENTRY %main (p: bf16[2,64,64,320]) -> bf16[2,64,64,320] {
  %p = bf16[2,64,64,320]{3,2,1,0:T(8,128)(2,1)} parameter(0)
  %my_named_fusion.11 = bf16[2,64,64,320]{3,2,1,0:T(8,128)(2,1)} fusion(%p), kind=kOutput, calls=%fused_computation.1
  %fusion.12 = f32[8,2,8,1024]{3,2,1,0:T(8,128)} fusion(%p), kind=kLoop, calls=%fused_computation.2
  %fusion.13 = f32[16]{0} fusion(%p), kind=kLoop, calls=%fused_computation.3
  %fusion.14 = f32[16]{0} fusion(%p), kind=kLoop, calls=%fused_computation.4
  ROOT %t = bf16[2,64,64,320]{3,2,1,0:T(8,128)(2,1)} copy(%my_named_fusion.11)
}
"""


@pytest.fixture()
def hlo_classes(tmp_path):
    p = tmp_path / "module.hlo.txt"
    p.write_text(HLO)
    return pg.parse_hlo_fusion_classes(str(p))


def test_parse_classes_and_call_sites(hlo_classes):
    classes, instr_to_comp = hlo_classes
    assert classes["fused_computation.1"][0] == "conv"
    assert classes["fused_computation.2"][0] == "reduce"
    assert classes["fused_computation.3"][0] == "data-movement"
    assert classes["fused_computation.4"][0] == "elementwise"
    # the conv detail line carries the conv's output shape for reporting
    assert "convolution" in classes["fused_computation.1"][1]
    # fusion INSTRUCTION -> called computation (the fallback join)
    assert instr_to_comp["my_named_fusion.11"] == "fused_computation.1"
    assert instr_to_comp["fusion.12"] == "fused_computation.2"


def test_event_category_join(hlo_classes):
    # event text carries calls= -> direct join
    ev = ("%fusion.12 = f32[8,2,8,1024]{3,2,1,0} fusion(%p), kind=kLoop, "
          "calls=%fused_computation.2")
    assert pg._category(ev, hlo_classes) == "fusion:reduce"
    # event text WITHOUT calls= -> joined through the instruction name
    ev2 = "%my_named_fusion.11 = bf16[2,64,64,320]{3,2,1,0} fusion(%p), kind=kOutput"
    assert pg._category(ev2, hlo_classes) == "fusion:conv"
    # unknown fusion stays visibly unjoined rather than silently binned
    ev3 = "%fusion.999 = f32[2]{0} fusion(%p), kind=kLoop"
    assert pg._category(ev3, hlo_classes) == "fusion:unjoined"
    # non-fusion opcodes keep their own families (never operand text)
    assert pg._category(
        "%attn1.5 = bf16[8,4096,40]{2,1,0} custom-call(%a), custom_call_target=\"tpu_custom_call\"",
        hlo_classes,
    ) == "custom-call (pallas)"
    assert pg._category(
        "%convolution.9 = bf16[2,8,8,128]{3,2,1,0} convolution(%a, %b), window={size=3x3}",
        hlo_classes,
    ) == "convolution (named)"
    assert pg._category("%copy.77 = f32[4]{0} copy(%x)", hlo_classes) == "copy/layout"


def test_classify_opcode_priority():
    # FLOPs dominance: a conv fusion is conv no matter the elementwise tail
    assert pg._classify_opcodes(["add", "convolution", "multiply"]) == "conv"
    assert pg._classify_opcodes(["add", "dot"]) == "matmul"
    assert pg._classify_opcodes(["exponential", "reduce"]) == "reduce"
    assert pg._classify_opcodes(["copy", "transpose", "parameter"]) == "data-movement"
    assert pg._classify_opcodes(["add", "parameter"]) == "elementwise"
    assert pg._classify_opcodes(["rng-bit-generator", "add"]) == "rng"
