"""Quantization-tier accuracy gate (VERDICT r3 #6): the int8-dynamic
serving default must stay >= 40 dB PSNR of the bf16 output on the shared
synthetic-checkpoint trajectory, and the int4-WO tier (the 13B enabler)
must stay within its documented band. Runs the same tool the bench
artifact records (``tools/check_quant_psnr.py``)."""

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


@pytest.mark.golden
def test_quant_tiers_psnr(tmp_path):
    import check_quant_psnr

    out = tmp_path / "gate.json"
    rc = check_quant_psnr.run(steps=4, preset="smoke", json_out=str(out))
    res = json.loads(out.read_text())
    assert rc == 0, res
    assert res["pass"] is True
    assert res["int8_dynamic_psnr_db"] >= 40.0, res
    # int4-WO is documented, not gated — but a collapse below 25 dB
    # would mean the nibble-packing or scales broke outright
    assert res["int4_wo_psnr_db"] >= 25.0, res


@pytest.mark.golden
def test_mixed_int4_tier_gate(tmp_path):
    """The mixed int4 tier (the 13B/14B flagship tier since r5) must hold
    the same 40 dB bar as the int8 serving default (VERDICT r4 #3)."""
    import check_quant_psnr

    out = tmp_path / "gate.json"
    rc = check_quant_psnr.run(steps=4, preset="smoke", json_out=str(out))
    res = json.loads(out.read_text())
    assert rc == 0, res
    assert res["int4_mixed_psnr_db"] >= 40.0, res
    # and strictly better than the per-channel int4 it replaced
    assert res["int4_mixed_psnr_db"] > res["int4_wo_psnr_db"], res


@pytest.mark.golden
def test_teacache_tiers_psnr(tmp_path):
    """Serving-tier fidelity gate (VERDICT r4 #2): every TeaCache /
    bounded / stacked tier the bench can emit must hold its pinned
    decoded-PSNR threshold vs the exact trajectory. Runs the same tool
    that records TEACACHE_GATE.json for the bench tail; 12 steps keeps
    the suite cost bounded while exercising real skip schedules."""
    import check_teacache_psnr

    out = tmp_path / "tc_gate.json"
    rc = check_teacache_psnr.run(steps=12, json_out=str(out))
    res = json.loads(out.read_text())
    assert rc == 0, res
    assert res["pass"] is True
    tiers = res["tiers"]
    assert tiers["bounded40"]["pass"], tiers
    for name, row in tiers.items():
        if "threshold_db" in row:
            assert row["psnr_db"] >= row["threshold_db"], (name, row)
    # the skip schedules must actually skip (not degenerate to exact)
    assert tiers["teacache1.75"]["steps_computed"] < 12, tiers
