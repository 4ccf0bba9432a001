"""End-to-end checkpoint path: synthesize tiny safetensors files in the
reference's on-disk conventions (torch layouts + metadata config + quanto
int8 variant + LoRA), load them through model_zoo, and generate."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ltx_video_gpupoor_tpu.core import checkpoint as ckpt
from ltx_video_gpupoor_tpu.serving import model_zoo

TF_CFG_DICT = {
    "num_attention_heads": 2,
    "attention_head_dim": 8,
    "in_channels": 8,
    "out_channels": 8,
    "num_layers": 2,
    "cross_attention_dim": 16,
    "caption_channels": 16,
}

VAE_CFG_DICT = {
    "_class_name": "CausalVideoAutoencoder",
    "dims": 3,
    "latent_channels": 8,
    "blocks": [["res_x", 1], ["compress_all", 1]],
    "base_channels": 8,
    "norm_num_groups": 4,
    "patch_size": 4,
    "norm_layer": "pixel_norm",
    "latent_log_var": "uniform",
    "use_quant_conv": False,
    "causal_decoder": False,
}


def _rand(*shape):
    return np.random.RandomState(sum(shape)).randn(*shape).astype(
        np.float32
    ) * 0.05


def _transformer_sd(d, ffn, cfg):
    sd = {
        "patchify_proj.weight": _rand(d, cfg["in_channels"]),
        "patchify_proj.bias": _rand(d),
        "adaln_single.emb.timestep_embedder.linear_1.weight": _rand(d, 256),
        "adaln_single.emb.timestep_embedder.linear_1.bias": _rand(d),
        "adaln_single.emb.timestep_embedder.linear_2.weight": _rand(d, d),
        "adaln_single.emb.timestep_embedder.linear_2.bias": _rand(d),
        "adaln_single.linear.weight": _rand(6 * d, d),
        "adaln_single.linear.bias": _rand(6 * d),
        "caption_projection.linear_1.weight": _rand(d, cfg["caption_channels"]),
        "caption_projection.linear_1.bias": _rand(d),
        "caption_projection.linear_2.weight": _rand(d, d),
        "caption_projection.linear_2.bias": _rand(d),
        "scale_shift_table": _rand(2, d),
        "proj_out.weight": _rand(cfg["out_channels"], d),
        "proj_out.bias": _rand(cfg["out_channels"]),
    }
    for i in range(cfg["num_layers"]):
        pre = f"transformer_blocks.{i}"
        sd[f"{pre}.scale_shift_table"] = _rand(6, d)
        for a in ("attn1", "attn2"):
            for l in ("to_q", "to_k", "to_v"):
                sd[f"{pre}.{a}.{l}.weight"] = _rand(d, d)
                sd[f"{pre}.{a}.{l}.bias"] = _rand(d)
            sd[f"{pre}.{a}.to_out.0.weight"] = _rand(d, d)
            sd[f"{pre}.{a}.to_out.0.bias"] = _rand(d)
            sd[f"{pre}.{a}.q_norm.weight"] = np.ones(d, np.float32)
            sd[f"{pre}.{a}.k_norm.weight"] = np.ones(d, np.float32)
        sd[f"{pre}.ff.net.0.proj.weight"] = _rand(4 * d, d)
        sd[f"{pre}.ff.net.0.proj.bias"] = _rand(4 * d)
        sd[f"{pre}.ff.net.2.weight"] = _rand(d, 4 * d)
        sd[f"{pre}.ff.net.2.bias"] = _rand(d)
    return sd


def _vae_sd():
    """Tiny VAE in reference naming, built by reversing our converter's
    layout transposes on a random init."""
    from ltx_video_gpupoor_tpu.models.ltx import vae as ltx_vae

    cfg = ltx_vae.VAEConfig.from_dict(VAE_CFG_DICT)
    params = ltx_vae.init_params(jax.random.key(7), cfg)

    def conv_sd(prefix, p):
        return {
            f"{prefix}.conv.weight": np.transpose(
                np.asarray(p["kernel"], np.float32), (4, 3, 0, 1, 2)
            ),
            f"{prefix}.conv.bias": np.asarray(p["bias"], np.float32),
        }

    def resnet_sd(prefix, p):
        out = {}
        out.update(conv_sd(prefix + ".conv1", p["conv1"]))
        out.update(conv_sd(prefix + ".conv2", p["conv2"]))
        return out

    sd = {}
    enc, dec = params["encoder"], params["decoder"]
    sd.update(conv_sd("encoder.conv_in", enc["conv_in"]))
    sd.update(conv_sd("encoder.conv_out", enc["conv_out"]))
    sd.update(resnet_sd("encoder.down_blocks.0.res_blocks.0",
                        enc["down_blocks"][0]["res_blocks"][0]))
    sd.update(conv_sd("encoder.down_blocks.1", enc["down_blocks"][1]))
    sd.update(conv_sd("decoder.conv_in", dec["conv_in"]))
    sd.update(conv_sd("decoder.conv_out", dec["conv_out"]))
    sd.update(conv_sd("decoder.up_blocks.0.conv",
                      dec["up_blocks"][0]["conv"]))
    sd.update(resnet_sd("decoder.up_blocks.1.res_blocks.0",
                        dec["up_blocks"][1]["res_blocks"][0]))
    sd["per_channel_statistics.std-of-means"] = np.ones(8, np.float32)
    sd["per_channel_statistics.mean-of-means"] = np.zeros(8, np.float32)
    return sd


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    d = TF_CFG_DICT["num_attention_heads"] * TF_CFG_DICT["attention_head_dim"]
    path = tmp_path_factory.mktemp("ckpts")
    tf_sd = _transformer_sd(d, 4 * d, TF_CFG_DICT)
    vae_sd = _vae_sd()
    combined = dict(tf_sd)
    combined.update(vae_sd)
    ckpt.save_safetensors(
        str(path / "ltxv_0.9.7_13B_dev_bf16.safetensors"), combined,
        config={"transformer": TF_CFG_DICT, "vae": VAE_CFG_DICT},
    )
    return str(path)


def test_load_and_generate_from_checkpoint(ckpt_dir):
    model = model_zoo.load_ltxv_model(
        "ltxv_0.9.7_13B_dev_bf16.safetensors",
        model_mode="ltxv_13B",
        ckpt_dir=ckpt_dir,
        upsampler_filename="missing.safetensors",
    )
    gen = model.generator
    # pipeline config defaults to dev multi-scale; without an upsampler we
    # drop to the base pipeline config
    gen.pipeline_config = model_zoo.load_ltx_pipeline_config(
        "ltxv-2b-0.9.6-distilled"
    )
    d = TF_CFG_DICT["caption_channels"]
    emb = jax.random.normal(jax.random.key(0), (2, 8, d))
    mask = jnp.ones((2, 8), jnp.int32)
    frames = gen.generate(
        emb, mask, height=64, width=64, frame_num=9,
        sampling_steps=2, seed=1,
    )
    assert frames.shape == (9, 64, 64, 3)
    assert np.isfinite(np.asarray(frames)).all()


def test_quantized_checkpoint_roundtrip_loads(ckpt_dir, tmp_path):
    # export the transformer as a quanto int8 file, then load through the
    # dequant path
    tensors, config = ckpt.load_safetensors(
        os.path.join(ckpt_dir, "ltxv_0.9.7_13B_dev_bf16.safetensors")
    )
    qsd = {}
    for k, v in tensors.items():
        if k.endswith(".weight") and v.ndim == 2:
            from ltx_video_gpupoor_tpu.ops.quant import quantize_weights

            q = quantize_weights(jnp.asarray(v.T))  # [in, out] quant
            qsd[k + "._data"] = np.asarray(q.w_int8).T  # back to [out, in]
            qsd[k + "._scale"] = np.asarray(q.scale)[:, None]
            continue
        qsd[k] = v
    p = str(tmp_path / "ltxv_0.9.7_13B_dev_quanto_bf16_int8.safetensors")
    ckpt.save_safetensors(p, qsd, config=config)
    tensors2, _ = ckpt.load_safetensors(p)
    deq = ckpt.dequantize_quanto(tensors2)
    assert "patchify_proj.weight" in deq
    orig = tensors["patchify_proj.weight"]
    got = deq["patchify_proj.weight"]
    assert np.abs(got - orig).max() / (np.abs(orig).max() + 1e-9) < 0.02


def test_lora_filename_requires_dev_base(ckpt_dir):
    """A 'lora' model filename names a LoRA-ONLY checkpoint; the loader
    must look for the dev int8 base (``inference.py:449-452``) and error
    clearly when it is absent — not KeyError parsing the LoRA file as a
    full model."""
    with pytest.raises(FileNotFoundError, match="dev_quanto_bf16_int8"):
        model_zoo.load_ltxv_model(
            "ltxv_0.9.7_13B_distilled_lora128_bf16.safetensors",
            ckpt_dir=ckpt_dir,
        )


def test_lora_checkpoint_merges_over_dev_base(ckpt_dir, tmp_path):
    import shutil

    d = TF_CFG_DICT["num_attention_heads"] * TF_CFG_DICT["attention_head_dim"]
    ck = tmp_path / "ck"
    ck.mkdir()
    shutil.copy(
        os.path.join(ckpt_dir, "ltxv_0.9.7_13B_dev_bf16.safetensors"),
        ck / "ltxv_0.9.7_13B_dev_quanto_bf16_int8.safetensors",
    )
    rank = 2
    down = _rand(rank, d)
    up = np.ones((d, rank), np.float32)
    ckpt.save_safetensors(
        str(ck / "ltxv_0.9.7_13B_distilled_lora128_bf16.safetensors"),
        {
            "transformer_blocks.0.attn1.to_q.lora_A.weight": down,
            "transformer_blocks.0.attn1.to_q.lora_B.weight": up,
        },
    )
    base = model_zoo.load_ltxv_model(
        "ltxv_0.9.7_13B_dev_bf16.safetensors", model_mode="ltxv_13B",
        ckpt_dir=ckpt_dir, upsampler_filename="missing.safetensors",
    )
    merged = model_zoo.load_ltxv_model(
        "ltxv_0.9.7_13B_distilled_lora128_bf16.safetensors",
        ckpt_dir=str(ck), upsampler_filename="missing.safetensors",
    )
    bq = np.asarray(
        base.generator.pipeline.transformer_params
        ["blocks"]["attn1"]["to_q"]["kernel"][0]
    )
    mq = np.asarray(
        merged.generator.pipeline.transformer_params
        ["blocks"]["attn1"]["to_q"]["kernel"][0]
    )
    assert np.abs(mq - bq).max() > 1e-6  # the merge changed block 0
