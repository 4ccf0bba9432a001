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


# ---------------------------------------------------------------------------
# Round-4 layout dress rehearsals (VERDICT r3 #7): synthesize checkpoints
# in the EXACT published multi-file layouts and prove model_zoo assembles
# every one of them.
# ---------------------------------------------------------------------------


def test_finetune_def_filename_resolution():
    """``inference.py:131-135``: a registered finetune def's URLs take
    precedence over the signature catalogue."""
    model_zoo.register_finetune(
        "my_finetune",
        {"URLs": ["https://host/repo/resolve/main/ltxv_myft_bf16.safetensors"]},
    )
    try:
        assert (model_zoo.get_model_filename("my_finetune")
                == "ckpts/ltxv_myft_bf16.safetensors")
    finally:
        model_zoo.FINETUNES.pop("my_finetune", None)
    with pytest.raises(ValueError):
        model_zoo.register_finetune("bad", {})


def _quanto_export(tf_sd):
    """Re-encode 2-D weights in quanto's on-disk int8 convention
    (``_data``/``_scale`` pairs, [out, in] layout)."""
    from ltx_video_gpupoor_tpu.ops.quant import quantize_weights

    qsd = {}
    for k, v in tf_sd.items():
        if k.endswith(".weight") and v.ndim == 2:
            q = quantize_weights(jnp.asarray(v.T))
            qsd[k + "._data"] = np.asarray(q.w_int8).T
            qsd[k + "._scale"] = np.asarray(q.scale)[:, None]
        else:
            qsd[k] = v
    return qsd


def _tiny_upsampler_file(path):
    """Spatial upscaler in the published single-file convention: the
    reference LatentUpsampler state dict + from_config metadata
    (``ltx_video/models/autoencoders/latent_upsampler.py:122-177``)."""
    import torch

    from tests.test_latent_upsampler_golden import _load_ref

    ns = _load_ref()
    torch.manual_seed(0)
    ref = ns["LatentUpsampler"](
        in_channels=VAE_CFG_DICT["latent_channels"], mid_channels=32,
        num_blocks_per_stage=1, dims=2, spatial_upsample=True,
        temporal_upsample=False,
    ).eval().float()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    ckpt.save_safetensors(path, sd, config={
        "in_channels": VAE_CFG_DICT["latent_channels"], "mid_channels": 32,
        "num_blocks_per_stage": 1, "dims": 2, "spatial_upsample": True,
        "temporal_upsample": False,
    })


def _tiny_t5_hf_file(path, quanto=False):
    """T5-XXL-style encoder file in HF naming (the published
    ``T5_xxl_1.1/T5_xxl_1.1_enc_bf16.safetensors`` layout)."""
    from ltx_video_gpupoor_tpu.models import t5 as jt5

    cfg = jt5.T5Config(
        vocab_size=64, dim=16, dim_attn=16, dim_ffn=32, num_heads=2,
        num_layers=2, num_buckets=8, shared_pos=True,
    )
    sd = {
        "shared.weight": _rand(64, 16),
        "encoder.final_layer_norm.weight": _rand(16),
        "encoder.block.0.layer.0.SelfAttention.relative_attention_bias"
        ".weight": _rand(8, 2),
    }
    for i in range(2):
        pre = f"encoder.block.{i}"
        sd[f"{pre}.layer.0.layer_norm.weight"] = _rand(16)
        sd[f"{pre}.layer.1.layer_norm.weight"] = _rand(16)
        for l in ("q", "k", "v", "o"):
            sd[f"{pre}.layer.0.SelfAttention.{l}.weight"] = _rand(16, 16)
        sd[f"{pre}.layer.1.DenseReluDense.wi_0.weight"] = _rand(32, 16)
        sd[f"{pre}.layer.1.DenseReluDense.wi_1.weight"] = _rand(32, 16)
        sd[f"{pre}.layer.1.DenseReluDense.wo.weight"] = _rand(16, 32)
    if quanto:
        sd = _quanto_export(sd)
    ckpt.save_safetensors(path, sd)
    return cfg


def test_published_dev_multifile_layout(tmp_path):
    """The dev-mode published layout (``inference.py:392-439``): separate
    VAE file + quanto-int8 transformer + spatial upscaler + T5 subdir —
    all assembled into a multiscale-capable model."""
    ck = tmp_path / "ckpts"
    (ck / "T5_xxl_1.1").mkdir(parents=True)
    d = TF_CFG_DICT["num_attention_heads"] * TF_CFG_DICT["attention_head_dim"]
    tf_sd = _quanto_export(_transformer_sd(d, 4 * d, TF_CFG_DICT))
    ckpt.save_safetensors(
        str(ck / "ltxv_0.9.7_13B_dev_quanto_bf16_int8.safetensors"),
        tf_sd, config={"transformer": TF_CFG_DICT},
    )
    ckpt.save_safetensors(
        str(ck / "ltxv_0.9.7_VAE.safetensors"), _vae_sd(),
        config={"vae": VAE_CFG_DICT},
    )
    _tiny_upsampler_file(str(ck / "ltxv_0.9.7_spatial_upscaler.safetensors"))
    t5_cfg = _tiny_t5_hf_file(
        str(ck / "T5_xxl_1.1" / "T5_xxl_1.1_enc_bf16.safetensors")
    )

    model = model_zoo.load_ltxv_model(
        "ltxv_0.9.7_13B_dev_quanto_bf16_int8.safetensors",
        model_mode="ltxv_13B",
        ckpt_dir=str(ck),
        text_encoder_filename="T5_xxl_1.1/T5_xxl_1.1_enc_bf16.safetensors",
        t5_cfg=t5_cfg,
    )
    gen = model.generator
    assert gen.multiscale is not None, "spatial upscaler not assembled"
    assert gen.pipeline.t5_params is not None, "T5 subdir file not loaded"
    # quanto transformer dequantized into the param tree
    q = np.asarray(
        gen.pipeline.transformer_params["blocks"]["attn1"]["to_q"]
        ["kernel"][0]
    )
    assert np.isfinite(q).all() and np.abs(q).max() > 0


def _tiny_wan_spec():
    return {
        "model_type": "t2v", "dim": 16, "ffn_dim": 32, "freq_dim": 8,
        "num_heads": 2, "num_layers": 2, "in_dim": 4,
        "vae_stride": (4, 8, 8),
    }


def _wan_model_sd(cfg_dim=16, ffn=32, layers=2, in_dim=4, freq_dim=8,
                  text_dim=4096, out_dim=4, i2v=False):
    """Wan transformer state dict in the reference module naming
    (``wan/modules/model.py``)."""
    d = cfg_dim
    sd = {
        "patch_embedding.weight": _rand(d, in_dim, 1, 2, 2),
        "patch_embedding.bias": _rand(d),
        "text_embedding.0.weight": _rand(d, text_dim),
        "text_embedding.0.bias": _rand(d),
        "text_embedding.2.weight": _rand(d, d),
        "text_embedding.2.bias": _rand(d),
        "time_embedding.0.weight": _rand(d, freq_dim),
        "time_embedding.0.bias": _rand(d),
        "time_embedding.2.weight": _rand(d, d),
        "time_embedding.2.bias": _rand(d),
        "time_projection.1.weight": _rand(6 * d, d),
        "time_projection.1.bias": _rand(6 * d),
        "head.head.weight": _rand(4 * out_dim, d),
        "head.head.bias": _rand(4 * out_dim),
        "head.modulation": _rand(1, 2, d),
    }
    if i2v:
        sd.update({
            "img_emb.proj.0.weight": _rand(1280),
            "img_emb.proj.0.bias": _rand(1280),
            "img_emb.proj.1.weight": _rand(1280, 1280),
            "img_emb.proj.1.bias": _rand(1280),
            "img_emb.proj.3.weight": _rand(d, 1280),
            "img_emb.proj.3.bias": _rand(d),
            "img_emb.proj.4.weight": _rand(d),
            "img_emb.proj.4.bias": _rand(d),
        })
    for i in range(layers):
        pre = f"blocks.{i}"
        sd[f"{pre}.modulation"] = _rand(1, 6, d)
        for a, img in (("self_attn", False), ("cross_attn", i2v)):
            for l in ("q", "k", "v", "o"):
                sd[f"{pre}.{a}.{l}.weight"] = _rand(d, d)
                sd[f"{pre}.{a}.{l}.bias"] = _rand(d)
            sd[f"{pre}.{a}.norm_q.weight"] = _rand(d)
            sd[f"{pre}.{a}.norm_k.weight"] = _rand(d)
            if img:
                sd[f"{pre}.{a}.k_img.weight"] = _rand(d, d)
                sd[f"{pre}.{a}.k_img.bias"] = _rand(d)
                sd[f"{pre}.{a}.v_img.weight"] = _rand(d, d)
                sd[f"{pre}.{a}.v_img.bias"] = _rand(d)
                sd[f"{pre}.{a}.norm_k_img.weight"] = _rand(d)
        sd[f"{pre}.norm3.weight"] = _rand(d)
        sd[f"{pre}.norm3.bias"] = _rand(d)
        sd[f"{pre}.ffn.0.weight"] = _rand(ffn, d)
        sd[f"{pre}.ffn.0.bias"] = _rand(ffn)
        sd[f"{pre}.ffn.2.weight"] = _rand(d, ffn)
        sd[f"{pre}.ffn.2.bias"] = _rand(d)
    return sd


def _tiny_wan_vae_file(path):
    """``Wan2.1_VAE.safetensors`` in the reference WanVAE_ naming, tiny
    dims (the golden-test torch reference is the naming oracle)."""
    import torch

    from ltx_video_gpupoor_tpu.models.wan import vae as wvae
    from tests.test_wan_vae import _load_ref

    cfg = wvae.WanVAEConfig(
        dim=16, z_dim=4, dim_mult=(1, 2, 2), num_res_blocks=1,
        attn_scales=(), temperal_downsample=(False, True),
    )
    ns = _load_ref()
    torch.manual_seed(0)
    ref = ns["WanVAE_"](
        dim=cfg.dim, z_dim=cfg.z_dim, dim_mult=list(cfg.dim_mult),
        num_res_blocks=cfg.num_res_blocks, attn_scales=[],
        temperal_downsample=list(cfg.temperal_downsample), dropout=0.0,
    ).eval().float()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    ckpt.save_safetensors(path, sd)
    return cfg


def _tiny_umt5_wan_file(path, quanto=False):
    """``models_t5_umt5-xxl-enc-bf16.safetensors`` layout: Wan-style
    UMT5 naming (per-layer positional embeddings)."""
    from ltx_video_gpupoor_tpu.models import t5 as jt5

    cfg = jt5.T5Config(
        vocab_size=64, dim=16, dim_attn=16, dim_ffn=32, num_heads=2,
        num_layers=2, num_buckets=8, shared_pos=False,
    )
    sd = {"token_embedding.weight": _rand(64, 16), "norm.weight": _rand(16)}
    for i in range(2):
        pre = f"blocks.{i}"
        sd[f"{pre}.norm1.weight"] = _rand(16)
        sd[f"{pre}.norm2.weight"] = _rand(16)
        for l in ("q", "k", "v", "o"):
            sd[f"{pre}.attn.{l}.weight"] = _rand(16, 16)
        sd[f"{pre}.ffn.gate.0.weight"] = _rand(32, 16)
        sd[f"{pre}.ffn.fc1.weight"] = _rand(32, 16)
        sd[f"{pre}.ffn.fc2.weight"] = _rand(16, 32)
        sd[f"{pre}.pos_embedding.embedding.weight"] = _rand(8, 2)
    if quanto:
        sd = _quanto_export(sd)
    ckpt.save_safetensors(path, sd)
    return cfg


@pytest.mark.golden
def test_published_wan_t2v_dir_layout(tmp_path):
    """Wan 1.3B/14B dir layout (``wan/configs/wan_t2v_*.py`` +
    ``text2video.py:47-95``): transformer + Wan2.1_VAE + UMT5 enc file,
    assembled via load_wan_model. The 14B dir differs only in dims, so
    the tiny spec rehearses both."""
    ck = tmp_path / "wan"
    ck.mkdir()
    spec = _tiny_wan_spec()
    ckpt.save_safetensors(
        str(ck / "wan2.1_text2video_1.3B_bf16.safetensors"),
        _wan_model_sd(),
    )
    vae_cfg = _tiny_wan_vae_file(str(ck / "Wan2.1_VAE.safetensors"))
    t5_cfg = _tiny_umt5_wan_file(
        str(ck / "models_t5_umt5-xxl-enc-quanto_int8.safetensors"),
        quanto=True,
    )

    pipe = model_zoo.load_wan_model(
        "wan2.1_text2video_1.3B_bf16.safetensors",
        ckpt_dir=str(ck),
        text_encoder_filename=(
            "models_t5_umt5-xxl-enc-quanto_int8.safetensors"),
        spec=spec, vae_cfg=vae_cfg, t5_cfg=t5_cfg,
    )
    assert pipe.t5_params is not None
    assert pipe.model_params is not None and pipe.vae_params is not None


@pytest.mark.golden
def test_published_wan_i2v_dir_layout(tmp_path):
    """Wan i2v dir layout adds the CLIP file under xlm-roberta-large/
    (``wan/configs/wan_i2v_14B.py:18``)."""
    import torch

    from ltx_video_gpupoor_tpu.models.wan import clip as jclip
    from tests.test_clip import _load_ref as _load_clip_ref

    ck = tmp_path / "wan_i2v"
    (ck / "xlm-roberta-large").mkdir(parents=True)
    spec = dict(_tiny_wan_spec(), model_type="i2v", in_dim=8)
    ckpt.save_safetensors(
        str(ck / "wan2.1_image2video_14B_quanto_int8.safetensors"),
        _wan_model_sd(in_dim=8, i2v=True),
    )
    vae_cfg = _tiny_wan_vae_file(str(ck / "Wan2.1_VAE.safetensors"))

    clip_cfg = jclip.CLIPVisionConfig(
        image_size=28, patch_size=14, dim=32, mlp_ratio=2, num_heads=2,
        num_layers=3, activation="gelu",
    )
    ns = _load_clip_ref()
    torch.manual_seed(0)
    ref = ns["VisionTransformer"](
        image_size=28, patch_size=14, dim=32, mlp_ratio=2, out_dim=16,
        num_heads=2, num_layers=3, pool_type="token", pre_norm=True,
        post_norm=False, activation="gelu",
    ).eval().float()
    clip_sd = {"visual." + k: v.numpy() for k, v in ref.state_dict().items()}
    ckpt.save_safetensors(
        str(ck / "xlm-roberta-large" /
            "models_clip_open-clip-xlm-roberta-large-vit-huge-14-bf16"
            ".safetensors"),
        clip_sd,
    )

    pipe = model_zoo.load_wan_model(
        "wan2.1_image2video_14B_quanto_int8.safetensors",
        ckpt_dir=str(ck),
        clip_filename=(
            "xlm-roberta-large/models_clip_open-clip-xlm-roberta-large-"
            "vit-huge-14-bf16.safetensors"),
        spec=spec, vae_cfg=vae_cfg, clip_cfg=clip_cfg,
    )
    assert pipe.clip_params is not None
