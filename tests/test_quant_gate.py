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
