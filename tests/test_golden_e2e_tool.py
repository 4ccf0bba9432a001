"""Plumbing test for tools/check_golden_e2e.py (VERDICT r1 item 6).

Real checkpoints are not downloadable offline; this builds the same tiny
synthetic checkpoint the model-zoo integration test uses and runs the
harness end-to-end: dual load (our converters + the exec'd reference
torch modules), identical smoke denoise trajectory, dual decode, PSNR
report. With the SAME weights on both sides the PSNR must clear the
40 dB acceptance target — proving the harness itself is sound.
"""

import json
import os
import sys

import pytest

from ltx_video_gpupoor_tpu.core import checkpoint as ckpt
from tests.test_model_zoo_integration import (
    TF_CFG_DICT,
    VAE_CFG_DICT,
    _transformer_sd,
    _vae_sd,
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def synthetic_ckpt_dir(tmp_path_factory):
    d = TF_CFG_DICT["num_attention_heads"] * TF_CFG_DICT["attention_head_dim"]
    path = tmp_path_factory.mktemp("golden_ckpts")
    combined = dict(_transformer_sd(d, 4 * d, TF_CFG_DICT))
    combined.update(_vae_sd())
    ckpt.save_safetensors(
        str(path / "ltxv_0.9.7_13B_dev_bf16.safetensors"), combined,
        config={"transformer": TF_CFG_DICT, "vae": VAE_CFG_DICT},
    )
    return str(path)


def test_absent_checkpoints_degrade_gracefully(tmp_path, capsys):
    from tools import check_golden_e2e as tool

    out = str(tmp_path / "res.json")
    rc = tool.run(ckpt_dir=str(tmp_path / "empty"), json_out=out)
    assert rc == 0
    res = json.load(open(out))
    assert res["status"] == "checkpoints_absent"


def test_harness_runs_and_passes_on_identical_weights(
    synthetic_ckpt_dir, tmp_path
):
    from tools import check_golden_e2e as tool

    out = str(tmp_path / "res.json")
    # synthetic VAE: patch 4 + one compress_all -> spatial /8, temporal /2
    rc = tool.run(
        ckpt_dir=synthetic_ckpt_dir, steps=2,
        height=32, width=32, frames=5, json_out=out,
    )
    res = json.load(open(out))
    assert res["status"] == "ran", res
    assert res["pass"], res  # same weights both sides -> > 40 dB
    assert res["frame_psnr_db_min"] > 40.0
    assert rc == 0
