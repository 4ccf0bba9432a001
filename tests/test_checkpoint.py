"""Checkpoint conversion tests: synthetic state dicts in the reference's
naming produce param trees structurally identical to init_params output."""

import chex
import jax
import jax.numpy as jnp
import numpy as np

from ltx_video_gpupoor_tpu.core import checkpoint as ckpt
from ltx_video_gpupoor_tpu.models import t5 as jt5
from ltx_video_gpupoor_tpu.models.ltx import vae as ltx_vae
from ltx_video_gpupoor_tpu.models.ltx.transformer3d import (
    LTXTransformerConfig,
    init_params as tf_init,
)


def _rand(*shape):
    return np.random.RandomState(0).randn(*shape).astype(np.float32)


def test_convert_ltx_transformer_structure():
    cfg = LTXTransformerConfig(
        num_attention_heads=2, attention_head_dim=8, in_channels=4,
        out_channels=4, num_layers=2, cross_attention_dim=16,
        caption_channels=12,
    )
    d = cfg.inner_dim
    sd = {
        "patchify_proj.weight": _rand(d, cfg.in_channels),
        "patchify_proj.bias": _rand(d),
        "adaln_single.emb.timestep_embedder.linear_1.weight": _rand(d, 256),
        "adaln_single.emb.timestep_embedder.linear_1.bias": _rand(d),
        "adaln_single.emb.timestep_embedder.linear_2.weight": _rand(d, d),
        "adaln_single.emb.timestep_embedder.linear_2.bias": _rand(d),
        "adaln_single.linear.weight": _rand(6 * d, d),
        "adaln_single.linear.bias": _rand(6 * d),
        "caption_projection.linear_1.weight": _rand(d, cfg.caption_channels),
        "caption_projection.linear_1.bias": _rand(d),
        "caption_projection.linear_2.weight": _rand(d, d),
        "caption_projection.linear_2.bias": _rand(d),
        "scale_shift_table": _rand(2, d),
        "proj_out.weight": _rand(cfg.out_channels, d),
        "proj_out.bias": _rand(cfg.out_channels),
    }
    for i in range(cfg.num_layers):
        pre = f"transformer_blocks.{i}"
        sd[f"{pre}.scale_shift_table"] = _rand(6, d)
        for a in ("attn1", "attn2"):
            for l in ("to_q", "to_k", "to_v"):
                sd[f"{pre}.{a}.{l}.weight"] = _rand(d, d)
                sd[f"{pre}.{a}.{l}.bias"] = _rand(d)
            sd[f"{pre}.{a}.to_out.0.weight"] = _rand(d, d)
            sd[f"{pre}.{a}.to_out.0.bias"] = _rand(d)
            sd[f"{pre}.{a}.q_norm.weight"] = _rand(d)
            sd[f"{pre}.{a}.k_norm.weight"] = _rand(d)
        sd[f"{pre}.ff.net.0.proj.weight"] = _rand(cfg.ffn_dim, d)
        sd[f"{pre}.ff.net.0.proj.bias"] = _rand(cfg.ffn_dim)
        sd[f"{pre}.ff.net.2.weight"] = _rand(d, cfg.ffn_dim)
        sd[f"{pre}.ff.net.2.bias"] = _rand(d)

    params = ckpt.convert_ltx_transformer(sd, cfg.num_layers)
    expected = tf_init(jax.random.key(0), cfg)
    chex.assert_trees_all_equal_shapes(params, expected)
    # linear transpose sanity: kernel[i, o] == torch weight[o, i]
    np.testing.assert_allclose(
        np.asarray(params["proj_out"]["kernel"], np.float32),
        sd["proj_out.weight"].T,
        atol=1e-2,
    )


def test_convert_t5_wan_naming():
    cfg = jt5.T5Config(
        vocab_size=50, dim=16, dim_attn=16, dim_ffn=32, num_heads=2,
        num_layers=2, num_buckets=8, shared_pos=False,
    )
    sd = {"token_embedding.weight": _rand(50, 16), "norm.weight": _rand(16)}
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
    params = ckpt.convert_t5_encoder(sd, 2, shared_pos=False)
    expected = jt5.init_params(jax.random.key(0), cfg)
    chex.assert_trees_all_equal_shapes(params, expected)
    out = jt5.encode(
        params, cfg, jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 4), jnp.int32)
    )
    assert np.isfinite(np.asarray(out)).all()


def test_convert_t5_hf_naming():
    cfg = jt5.T5Config(
        vocab_size=50, dim=16, dim_attn=16, dim_ffn=32, num_heads=2,
        num_layers=2, num_buckets=8, shared_pos=True,
    )
    sd = {
        "shared.weight": _rand(50, 16),
        "encoder.final_layer_norm.weight": _rand(16),
        "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight":
            _rand(8, 2),
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
    params = ckpt.convert_t5_encoder(sd, 2, shared_pos=True)
    expected = jt5.init_params(jax.random.key(0), cfg)
    chex.assert_trees_all_equal_shapes(params, expected)


def test_convert_ltx_vae_structure():
    cfg = ltx_vae.VAEConfig.from_dict({
        "_class_name": "CausalVideoAutoencoder",
        "dims": 3,
        "latent_channels": 8,
        "blocks": [["res_x", 1], ["compress_all", 1], ["res_x_y", 1],
                   ["res_x", 1]],
        "base_channels": 8,
        "norm_num_groups": 4,
        "patch_size": 2,
        "norm_layer": "pixel_norm",
        "latent_log_var": "uniform",
        "use_quant_conv": False,
        "causal_decoder": False,
    })
    expected = ltx_vae.init_params(jax.random.key(0), cfg)

    def conv_sd(prefix, p):
        return {
            f"{prefix}.conv.weight": np.transpose(
                np.asarray(p["kernel"], np.float32), (4, 3, 0, 1, 2)
            ),
            f"{prefix}.conv.bias": np.asarray(p["bias"], np.float32),
        }

    sd = {}
    sd.update(conv_sd("encoder.conv_in", expected["encoder"]["conv_in"]))
    sd.update(conv_sd("encoder.conv_out", expected["encoder"]["conv_out"]))
    sd.update(conv_sd("decoder.conv_in", expected["decoder"]["conv_in"]))
    sd.update(conv_sd("decoder.conv_out", expected["decoder"]["conv_out"]))

    def resnet_sd(prefix, p):
        out = {}
        out.update(conv_sd(prefix + ".conv1", p["conv1"]))
        out.update(conv_sd(prefix + ".conv2", p["conv2"]))
        if "conv_shortcut" in p:
            out[prefix + ".conv_shortcut.weight"] = np.asarray(
                p["conv_shortcut"]["kernel"][0, 0, 0].T, np.float32
            )
            out[prefix + ".conv_shortcut.bias"] = np.asarray(
                p["conv_shortcut"]["bias"], np.float32
            )
            out[prefix + ".norm3.weight"] = np.asarray(
                p["norm3"]["weight"], np.float32
            )
            out[prefix + ".norm3.bias"] = np.asarray(
                p["norm3"]["bias"], np.float32
            )
        return out

    # encoder blocks: res_x (mid), compress_all (conv), res_x_y, res_x
    sd.update(resnet_sd("encoder.down_blocks.0.res_blocks.0",
                        expected["encoder"]["down_blocks"][0]["res_blocks"][0]))
    sd.update(conv_sd("encoder.down_blocks.1",
                      expected["encoder"]["down_blocks"][1]))
    sd.update(resnet_sd("encoder.down_blocks.2",
                        expected["encoder"]["down_blocks"][2]))
    sd.update(resnet_sd("encoder.down_blocks.3.res_blocks.0",
                        expected["encoder"]["down_blocks"][3]["res_blocks"][0]))
    # decoder blocks (reversed plan): res_x, res_x_y, compress_all, res_x
    sd.update(resnet_sd("decoder.up_blocks.0.res_blocks.0",
                        expected["decoder"]["up_blocks"][0]["res_blocks"][0]))
    sd.update(resnet_sd("decoder.up_blocks.1",
                        expected["decoder"]["up_blocks"][1]))
    sd.update(conv_sd("decoder.up_blocks.2.conv",
                      expected["decoder"]["up_blocks"][2]["conv"]))
    sd.update(resnet_sd("decoder.up_blocks.3.res_blocks.0",
                        expected["decoder"]["up_blocks"][3]["res_blocks"][0]))
    sd["per_channel_statistics.std-of-means"] = np.ones(8, np.float32)

    params = ckpt.convert_ltx_vae(sd, cfg)
    chex.assert_trees_all_equal_shapes(params, expected)
    # numerics survive the roundtrip
    media = jnp.ones((1, 1, 8, 8, 3))
    e1 = ltx_vae.encode(
        jax.tree.map(lambda x: x.astype(jnp.float32), params), cfg, media
    )
    assert np.isfinite(np.asarray(e1)).all()

    # diffusers-format stats keys (latents_std / latents_mean,
    # ``diffusers_config_mapping.py:172-173``) map to the same statistics
    # — dropping them would silently skip latent (un)normalization
    del sd["per_channel_statistics.std-of-means"]
    sd["latents_std"] = np.full(8, 2.0, np.float32)
    sd["latents_mean"] = np.full(8, 0.5, np.float32)
    p2 = ckpt.convert_ltx_vae(sd, cfg)
    np.testing.assert_allclose(
        np.asarray(p2["per_channel_statistics"]["std_of_means"]), 2.0
    )
    np.testing.assert_allclose(
        np.asarray(p2["per_channel_statistics"]["mean_of_means"]), 0.5
    )


def test_dequantize_quanto():
    sd = {
        "layer.weight._data": np.array([[10, -20]], np.int8),
        "layer.weight._scale": np.array([[0.5]], np.float32),
        "other.weight": np.ones((2, 2), np.float32),
    }
    out = ckpt.dequantize_quanto(sd)
    np.testing.assert_allclose(out["layer.weight"], [[5.0, -10.0]])
    assert "other.weight" in out


def test_convert_wan_model_structure():
    from ltx_video_gpupoor_tpu.models.wan.model import (
        WanConfig,
        init_params as wan_init,
    )

    cfg = WanConfig(
        model_type="i2v", patch_size=(1, 2, 2), text_len=8, in_dim=6,
        dim=16, ffn_dim=32, freq_dim=8, text_dim=12, out_dim=4,
        num_heads=2, num_layers=2,
    )
    d = cfg.dim
    sd = {
        "patch_embedding.weight": _rand(d, cfg.in_dim, 1, 2, 2),
        "patch_embedding.bias": _rand(d),
        "text_embedding.0.weight": _rand(d, cfg.text_dim),
        "text_embedding.0.bias": _rand(d),
        "text_embedding.2.weight": _rand(d, d),
        "text_embedding.2.bias": _rand(d),
        "time_embedding.0.weight": _rand(d, cfg.freq_dim),
        "time_embedding.0.bias": _rand(d),
        "time_embedding.2.weight": _rand(d, d),
        "time_embedding.2.bias": _rand(d),
        "time_projection.1.weight": _rand(6 * d, d),
        "time_projection.1.bias": _rand(6 * d),
        "head.head.weight": _rand(4 * cfg.out_dim, d),
        "head.head.bias": _rand(4 * cfg.out_dim),
        "head.modulation": _rand(1, 2, d),
        "img_emb.proj.0.weight": _rand(1280),
        "img_emb.proj.0.bias": _rand(1280),
        "img_emb.proj.1.weight": _rand(1280, 1280),
        "img_emb.proj.1.bias": _rand(1280),
        "img_emb.proj.3.weight": _rand(d, 1280),
        "img_emb.proj.3.bias": _rand(d),
        "img_emb.proj.4.weight": _rand(d),
        "img_emb.proj.4.bias": _rand(d),
    }
    for i in range(cfg.num_layers):
        pre = f"blocks.{i}"
        sd[f"{pre}.modulation"] = _rand(1, 6, d)
        for a, img in (("self_attn", False), ("cross_attn", True)):
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
        sd[f"{pre}.ffn.0.weight"] = _rand(cfg.ffn_dim, d)
        sd[f"{pre}.ffn.0.bias"] = _rand(cfg.ffn_dim)
        sd[f"{pre}.ffn.2.weight"] = _rand(d, cfg.ffn_dim)
        sd[f"{pre}.ffn.2.bias"] = _rand(d)

    params = ckpt.convert_wan_model(sd, cfg)
    expected = wan_init(jax.random.key(0), cfg)
    chex.assert_trees_all_equal_shapes(params, expected)


def test_flatten_recurses_into_list_subtrees():
    """The VAE/VACE converters build list-of-dict subtrees; flatten-based
    helpers (cast/quantize/save) previously treated them as opaque
    leaves and silently skipped every parameter inside."""
    from ltx_video_gpupoor_tpu.core.params import (
        cast_params, flatten, unflatten,
    )

    tree = {
        "up_blocks": [
            {"res_blocks": [{"conv1": {"kernel": jnp.ones((2, 2))}}]},
            {"conv": {"kernel": jnp.ones((2, 2))}},
        ],
        "head": {"kernel": jnp.ones((2, 2))},
    }
    flat = flatten(tree)
    assert "up_blocks.0.res_blocks.0.conv1.kernel" in flat
    rebuilt = unflatten(flat)
    assert isinstance(rebuilt["up_blocks"], list)
    out = cast_params(tree, jnp.bfloat16)
    assert (
        out["up_blocks"][0]["res_blocks"][0]["conv1"]["kernel"].dtype
        == jnp.bfloat16
    )
    from ltx_video_gpupoor_tpu.ops.quant import quantize_params

    q = quantize_params(
        {"b": [{"lin": {"kernel": jnp.ones((16, 8))}}]}, mode="wo"
    )
    assert "w_int8" in q["b"][0]["lin"]


def test_diffusers_vae_config_translated():
    """A diffusers-format VAE config in the checkpoint metadata must be
    translated to the native block-plan config (feeding it raw would
    silently build the wrong architecture)."""
    from ltx_video_gpupoor_tpu.core.diffusers_compat import (
        DIFFUSERS_VAE_CONFIG,
        maybe_translate_config,
    )

    out = maybe_translate_config(dict(DIFFUSERS_VAE_CONFIG))
    assert out is not None and "blocks" in out
    assert out["norm_layer"] == "pixel_norm"
    # mutation must not corrupt the module constants
    out["blocks"].append(["res_x", 1])
    out2 = maybe_translate_config(dict(DIFFUSERS_VAE_CONFIG))
    assert len(out2["blocks"]) == len(out["blocks"]) - 1
    # native configs pass through untouched
    native = {"_class_name": "CausalVideoAutoencoder", "blocks": []}
    assert maybe_translate_config(native) is native
