"""Roofline modeling parsers (tools/conv_bw_study.py).

These pure functions turn profiler ``long_name`` HLO text into physical
HBM byte counts; the SDXL bound defense (tools/sdxl_study.py roofline
stage) rests on the tile-padding arithmetic, so pin it down — in
particular the C=64-on-128-lanes case that doubles the physical size of
the SDXL encoder's first-stage activations.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from conv_bw_study import event_model, hbm_bytes, parse_operands  # noqa: E402


def test_bf16_lane_padding_doubles_c64():
    # bf16 [16,400,280,64] with C minormost: 64 pads to 128 lanes; the
    # (2,1) packing makes the bf16 sublane quantum 16, N=16 already aligned.
    phys = hbm_bytes("bf16", [16, 400, 280, 64], "3,0,2,1:T(8,128)(2,1)")
    logical = 16 * 400 * 280 * 64 * 2
    assert phys == 2 * logical


def test_f32_aligned_no_padding():
    phys = hbm_bytes("f32", [16, 64], "1,0:T(8,128)")
    assert phys == 16 * 128 * 4  # 64 lanes pad to 128; 16 rows already 8-aligned


def test_sublane_padding_f32():
    # minor dim 128 fills lanes; second-minor 3 pads to 8 sublanes
    assert hbm_bytes("f32", [3, 128], "1,0:T(8,128)") == 8 * 128 * 4


def test_vmem_operand_excluded():
    assert hbm_bytes("f32", [16, 64], "1,0:T(8,128)S(1)") == 0
    # S(0) is HBM, stays counted
    assert hbm_bytes("f32", [16, 64], "1,0:T(8,128)S(0)") > 0


def test_untiled_falls_back_to_logical():
    assert hbm_bytes("bf16", [5, 7], "1,0") == 5 * 7 * 2


def test_parse_operands_output_then_inputs():
    ln = ("%fusion.1 = bf16[16,400,280,64]{3,0,2,1:T(8,128)(2,1)} "
          "fusion(f32[64]{0:T(128)} %a, bf16[3,3,64,64]{3,2,1,0:T(8,128)(2,1)S(1)} %w)")
    shapes = parse_operands(ln)
    assert len(shapes) == 3
    assert shapes[0][0] == "bf16" and shapes[0][1] == [16, 400, 280, 64]
    assert shapes[1][0] == "f32" and shapes[1][1] == [64]
    # the S(1) weight operand parses but hbm_bytes zeroes it
    assert hbm_bytes(*shapes[2]) == 0


def test_event_model_scales_by_occurrences_and_bounds():
    # an op inside a chunk scan: 8 occurrences over 4 traced steps = 2/step
    ln = "%f = bf16[16,400,280,64]{3,0,2,1:T(8,128)(2,1)} fusion()"
    phys_one = hbm_bytes("bf16", [16, 400, 280, 64], "3,0,2,1:T(8,128)(2,1)")
    v = {"long_name": ln, "occurrences": 8, "flops": 0,
         "dur": 4 * 2e-3, "bytes": 123}
    row = event_model(v, steps=4)
    assert row["hbm_bytes"] == phys_one * 2
    assert row["bound"] == "hbm"
    assert abs(row["t_ms_per_step"] - 2.0) < 1e-9
    # model bw time = phys / 819 GB/s
    assert abs(row["t_bw_model_ms"] - phys_one * 2 / 819e9 * 1e3) < 1e-9

    # heavy flops flip the bound to mxu
    v_mxu = dict(v, flops=4 * 10**12)
    assert event_model(v_mxu, steps=4)["bound"] == "mxu"
