"""Checkpoint IO: safetensors -> parameter pytrees.

Keeps the reference's on-disk conventions so its checkpoints load directly:
- single-file safetensors with a JSON ``config`` entry in the metadata
  (``/root/reference/ltx_video/models/transformers/transformer3d.py:313-326``,
  ``causal_video_autoencoder.py:103-115``);
- diffusers key renames (``/root/reference/ltx_video/utils/
  diffusers_config_mapping.py``: TRANSFORMER_KEYS_RENAME_DICT,
  VAE_KEYS_RENAME_DICT);
- quantized-variant filename convention ``*_quanto_{bf16,fp16}_int8
  .safetensors`` (``/root/reference/inference.py:96-100, 159-173``) — quanto
  int8 tensors ship as ``{name}._data`` (int8) + ``{name}._scale``;
- per-channel latent statistics ``per_channel_statistics.std-of-means`` /
  ``mean-of-means`` buffers.

Torch linear weights ``[out, in]`` transpose to ``[in, out]`` kernels;
torch conv3d weights ``[out, in, kt, kh, kw]`` transpose to
``[kt, kh, kw, in, out]``.
"""

from __future__ import annotations

import json
import re
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import params as P


def load_safetensors(path: str) -> tuple[dict[str, np.ndarray], dict]:
    """Load tensors (numpy, bf16 via ml_dtypes) + parsed metadata config."""
    from safetensors import safe_open

    tensors: dict[str, np.ndarray] = {}
    with safe_open(path, framework="np") as f:
        meta = f.metadata() or {}
        for k in f.keys():
            tensors[k] = f.get_tensor(k)
    config = {}
    if "config" in meta:
        try:
            config = json.loads(meta["config"])
        except json.JSONDecodeError:
            config = {}
    return tensors, config


def save_safetensors(
    path: str, tensors: dict[str, np.ndarray], config: Optional[dict] = None
) -> None:
    """Single-file safetensors with embedded JSON config metadata
    (the reference's checkpoint convention — SURVEY §5 checkpointing)."""
    from safetensors.numpy import save_file

    meta = {"config": json.dumps(config)} if config is not None else None
    # safetensors' numpy writer silently serializes the raw buffer of
    # NON-contiguous arrays with the wrong strides (observed corrupting
    # transposed views) — force contiguity first.
    tensors = {k: np.ascontiguousarray(v) for k, v in tensors.items()}
    save_file(tensors, path, metadata=meta)


def save_quantized_model(
    path: str,
    params: dict,
    config: Optional[dict] = None,
    dtype_tag: str = "bf16",
) -> str:
    """Export a param tree as a quanto-style int8 checkpoint
    (``*_quanto_{bf16,fp16}_int8.safetensors`` — parity with
    ``save_quantized_model``, ``/root/reference/wan/utils/utils.py:340-356``).

    2-D/3-D float kernels are written as ``{name}._data`` int8 +
    ``{name}._scale``; everything else passes through."""
    from ..ops.quant import quantize_weights

    flat = P.flatten(params)
    out: dict[str, np.ndarray] = {}
    for key, value in flat.items():
        arr = np.asarray(value)
        if (
            key.endswith(".kernel")
            and np.issubdtype(arr.dtype, np.floating)
            and arr.ndim in (2, 3)
        ):
            if arr.ndim == 3:
                qs = [quantize_weights(jnp.asarray(a)) for a in arr]
                out[key + "._data"] = np.stack(
                    [np.asarray(q.w_int8) for q in qs]
                )
                out[key + "._scale"] = np.stack(
                    [np.asarray(q.scale) for q in qs]
                )
            else:
                q = quantize_weights(jnp.asarray(arr))
                out[key + "._data"] = np.asarray(q.w_int8)
                out[key + "._scale"] = np.asarray(q.scale)
        else:
            if arr.dtype == jnp.bfloat16:
                arr = arr.astype(np.float32)
            out[key] = arr
    if not path.endswith(".safetensors"):
        path = f"{path}_quanto_{dtype_tag}_int8.safetensors"
    save_safetensors(path, out, config)
    return path


def dequantize_quanto(tensors: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Fold quanto int8 weight pairs ``x._data`` (int8) / ``x._scale`` back
    into float weights. (A weight-only int8 fast path keeps them separate —
    see ops/quant.py; this helper is the always-correct fallback.)"""
    out: dict[str, np.ndarray] = {}
    for k, v in tensors.items():
        if k.endswith("._data"):
            base = k[: -len("._data")]
            scale = tensors.get(base + "._scale")
            if scale is None:
                out[k] = v
                continue
            s = scale.astype(np.float32)
            if v.ndim == s.ndim + 1:
                # [in, out] kernel w/ per-out scale (or stacked [L, in, out])
                s = s[..., None, :]
            w = v.astype(np.float32) * s
            if base.endswith((".weight", ".kernel")):
                out[base] = w
            else:
                out[base + ".weight"] = w
        elif k.endswith("._scale"):
            continue
        else:
            out[k] = v
    return out


def _t(w: np.ndarray) -> np.ndarray:
    """torch linear [out, in] -> kernel [in, out]."""
    return np.ascontiguousarray(w.T)


def _tconv(w: np.ndarray) -> np.ndarray:
    """torch conv3d [out, in, kt, kh, kw] -> [kt, kh, kw, in, out]."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 4, 1, 0)))


def _jx(x: np.ndarray, dtype=None) -> jax.Array:
    arr = jnp.asarray(x)
    return arr.astype(dtype) if dtype is not None else arr


# ---------------------------------------------------------------------------
# LTX Transformer3D
# ---------------------------------------------------------------------------

# diffusers-format checkpoints use these names
# (TRANSFORMER_KEYS_RENAME_DICT, diffusers_config_mapping.py:141-146)
_TRANSFORMER_RENAMES = {
    "proj_in": "patchify_proj",
    "time_embed": "adaln_single",
    "norm_q": "q_norm",
    "norm_k": "k_norm",
}


def convert_ltx_transformer(
    sd: dict[str, np.ndarray], num_layers: int, dtype=jnp.bfloat16
) -> dict:
    """State dict (reference naming) -> transformer3d param tree."""
    renamed = {}
    for k, v in sd.items():
        for a, b in _TRANSFORMER_RENAMES.items():
            k = k.replace(a, b)
        renamed[k] = v
    sd = renamed

    def lin(prefix, transpose=True, d=dtype):
        p = {"kernel": _jx(_t(sd[prefix + ".weight"]) if transpose
                           else sd[prefix + ".weight"], d)}
        if prefix + ".bias" in sd:
            p["bias"] = _jx(sd[prefix + ".bias"], d)
        return p

    def maybe_norm(prefix, d=jnp.float32):
        if prefix + ".weight" in sd:
            return {"weight": _jx(sd[prefix + ".weight"], d)}
        return None

    blocks = []
    for i in range(num_layers):
        pre = f"transformer_blocks.{i}"
        b = {
            "scale_shift_table": _jx(sd[f"{pre}.scale_shift_table"], jnp.float32),
            "attn1": {
                "to_q": lin(f"{pre}.attn1.to_q"),
                "to_k": lin(f"{pre}.attn1.to_k"),
                "to_v": lin(f"{pre}.attn1.to_v"),
                "to_out": lin(f"{pre}.attn1.to_out.0"),
            },
            "attn2": {
                "to_q": lin(f"{pre}.attn2.to_q"),
                "to_k": lin(f"{pre}.attn2.to_k"),
                "to_v": lin(f"{pre}.attn2.to_v"),
                "to_out": lin(f"{pre}.attn2.to_out.0"),
            },
            "ff": {
                # "gelu-approximate" ckpts: net.0.proj single linear;
                # "geglu": net.0.proj holds [2*ffn] fused proj
                "proj_in": lin(f"{pre}.ff.net.0.proj"),
                "proj_out": lin(f"{pre}.ff.net.2"),
            },
        }
        for attn in ("attn1", "attn2"):
            qn = maybe_norm(f"{pre}.{attn}.q_norm")
            kn = maybe_norm(f"{pre}.{attn}.k_norm")
            if qn:
                b[attn]["q_norm"] = qn
            if kn:
                b[attn]["k_norm"] = kn
        blocks.append(b)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    params = {
        "patchify_proj": lin("patchify_proj"),
        "adaln": {
            "emb_linear_1": lin("adaln_single.emb.timestep_embedder.linear_1",
                                d=jnp.float32),
            "emb_linear_2": lin("adaln_single.emb.timestep_embedder.linear_2",
                                d=jnp.float32),
            "linear": lin("adaln_single.linear", d=jnp.float32),
        },
        "caption_projection": {
            "linear_1": lin("caption_projection.linear_1"),
            "linear_2": lin("caption_projection.linear_2"),
        },
        "blocks": stacked,
        "scale_shift_table": _jx(sd["scale_shift_table"], jnp.float32),
        "proj_out": lin("proj_out"),
    }
    return params


# ---------------------------------------------------------------------------
# LTX causal VAE
# ---------------------------------------------------------------------------

# VAE_KEYS_RENAME_DICT (diffusers_config_mapping.py:149-174) — applied in
# order, longest-prefix first, for diffusers-format VAE checkpoints.
_VAE_RENAMES = [
    ("decoder.up_blocks.3.conv_in", "decoder.up_blocks.7"),
    ("decoder.up_blocks.3.upsamplers.0", "decoder.up_blocks.8"),
    ("decoder.up_blocks.3", "decoder.up_blocks.9"),
    ("decoder.up_blocks.2.upsamplers.0", "decoder.up_blocks.5"),
    ("decoder.up_blocks.2.conv_in", "decoder.up_blocks.4"),
    ("decoder.up_blocks.2", "decoder.up_blocks.6"),
    ("decoder.up_blocks.1.upsamplers.0", "decoder.up_blocks.2"),
    ("decoder.up_blocks.1", "decoder.up_blocks.3"),
    ("decoder.up_blocks.0", "decoder.up_blocks.1"),
    ("decoder.mid_block", "decoder.up_blocks.0"),
    ("encoder.down_blocks.3", "encoder.down_blocks.8"),
    ("encoder.down_blocks.2.downsamplers.0", "encoder.down_blocks.7"),
    ("encoder.down_blocks.2", "encoder.down_blocks.6"),
    ("encoder.down_blocks.1.downsamplers.0", "encoder.down_blocks.4"),
    ("encoder.down_blocks.1.conv_out", "encoder.down_blocks.5"),
    ("encoder.down_blocks.1", "encoder.down_blocks.3"),
    ("encoder.down_blocks.0.conv_out", "encoder.down_blocks.2"),
    ("encoder.down_blocks.0.downsamplers.0", "encoder.down_blocks.1"),
    ("encoder.down_blocks.0", "encoder.down_blocks.0"),
    ("encoder.mid_block", "encoder.down_blocks.9"),
    ("conv_shortcut.conv", "conv_shortcut"),
    ("resnets", "res_blocks"),
    ("norm3.norm", "norm3"),  # ours stores norm3 directly
    ("downsamplers.0", "downsample"),
    ("upsamplers.0", "upsample"),
]


def _apply_vae_renames(key: str) -> str:
    for a, b in _VAE_RENAMES:
        if key.startswith(a):
            key = b + key[len(a):]
    key = key.replace(".resnets.", ".res_blocks.")
    return key


def convert_ltx_vae(
    sd: dict[str, np.ndarray],
    cfg,  # models.ltx.vae.VAEConfig
    dtype=jnp.bfloat16,
) -> dict:
    """State dict -> VAE param tree, following the block plan of ``cfg``."""
    from ..models.ltx.vae import _decoder_plan, _encoder_plan

    sd = {k.removeprefix("vae."): v for k, v in sd.items()}
    # the rename table targets diffusers-format checkpoints (mid_block /
    # downsamplers / resnets naming); native-format keys pass through
    is_diffusers = any(
        ".mid_block." in k or "downsamplers" in k or "upsamplers" in k
        or ".resnets." in k for k in sd
    )
    if is_diffusers:
        sd = {_apply_vae_renames(k): v for k, v in sd.items()}

    def conv(prefix, d=dtype):
        # reference CausalConv3d nests the torch conv as ".conv"
        for cand in (prefix + ".conv.weight", prefix + ".weight"):
            if cand in sd:
                w = sd[cand]
                break
        else:
            raise KeyError(prefix)
        bias_key = cand.replace("weight", "bias")
        p = {}
        if w.ndim == 5:
            p["kernel"] = _jx(_tconv(w), d)
        elif w.ndim == 2:  # make_linear_nd stored as 1x1x1 conv or linear
            p["kernel"] = _jx(_t(w)[None, None, None], d)
        else:
            raise ValueError(f"unexpected conv weight ndim {w.ndim} at {prefix}")
        if bias_key in sd:
            p["bias"] = _jx(sd[bias_key], d)
        return p

    def norm(prefix, d=jnp.float32):
        # the reference's custom LayerNorm wraps nn.LayerNorm as ``.norm``
        # (causal_video_autoencoder.py LayerNorm class), so native-format
        # keys are e.g. ``norm3.norm.weight``
        if prefix + ".norm.weight" in sd:
            prefix = prefix + ".norm"
        p = {}
        if prefix + ".weight" in sd:
            p["weight"] = _jx(sd[prefix + ".weight"], d)
        if prefix + ".bias" in sd:
            p["bias"] = _jx(sd[prefix + ".bias"], d)
        return p

    def linear(prefix, d=jnp.float32):
        p = {"kernel": _jx(_t(sd[prefix + ".weight"]), d)}
        if prefix + ".bias" in sd:
            p["bias"] = _jx(sd[prefix + ".bias"], d)
        return p

    def resnet(prefix, has_shortcut):
        p = {
            "norm1": norm(prefix + ".norm1"),
            "conv1": conv(prefix + ".conv1"),
            "norm2": norm(prefix + ".norm2"),
            "conv2": conv(prefix + ".conv2"),
        }
        if has_shortcut or (prefix + ".conv_shortcut.weight" in sd) or (
            prefix + ".conv_shortcut.conv.weight" in sd
        ):
            w = sd.get(prefix + ".conv_shortcut.weight",
                       sd.get(prefix + ".conv_shortcut.conv.weight"))
            if w is not None:
                if w.ndim == 5:
                    p["conv_shortcut"] = conv(prefix + ".conv_shortcut")
                else:
                    p["conv_shortcut"] = {
                        "kernel": _jx(_t(w)[None, None, None], dtype)
                    }
                    bk = prefix + ".conv_shortcut.bias"
                    if bk in sd:
                        p["conv_shortcut"]["bias"] = _jx(sd[bk], dtype)
                n3 = norm(prefix + ".norm3")
                if n3:
                    p["norm3"] = n3
        for scale_name in ("per_channel_scale1", "per_channel_scale2"):
            k = f"{prefix}.{scale_name}"
            if k in sd:
                p[scale_name] = _jx(sd[k].reshape(-1), jnp.float32)
        if prefix + ".scale_shift_table" in sd:
            p["scale_shift_table"] = _jx(
                sd[prefix + ".scale_shift_table"], jnp.float32
            )
        return p

    def timestep_embedder(prefix):
        return {
            "linear_1": linear(prefix + ".timestep_embedder.linear_1"),
            "linear_2": linear(prefix + ".timestep_embedder.linear_2"),
        }

    def midblock(prefix, num_layers, attn=False):
        p: dict[str, Any] = {
            "res_blocks": [
                resnet(f"{prefix}.res_blocks.{i}", False)
                for i in range(num_layers)
            ]
        }
        if f"{prefix}.time_embedder.timestep_embedder.linear_1.weight" in sd:
            p["time_embedder"] = timestep_embedder(f"{prefix}.time_embedder")
        if attn:
            p["attention_blocks"] = []
            for i in range(num_layers):
                a = f"{prefix}.attention_blocks.{i}"
                p["attention_blocks"].append({
                    "to_q": linear(a + ".to_q", dtype),
                    "to_k": linear(a + ".to_k", dtype),
                    "to_v": linear(a + ".to_v", dtype),
                    "to_out": linear(a + ".to_out.0", dtype),
                    "q_norm": {"weight": _jx(sd[a + ".q_norm.weight"],
                                             jnp.float32)},
                    "k_norm": {"weight": _jx(sd[a + ".k_norm.weight"],
                                             jnp.float32)},
                })
        return p

    enc: dict[str, Any] = {
        "conv_in": conv("encoder.conv_in"),
        "down_blocks": [],
        "conv_norm_out": norm("encoder.conv_norm_out"),
        "conv_out": conv("encoder.conv_out"),
    }
    for i, (name, bp, cin, cout) in enumerate(_encoder_plan(cfg)):
        pre = f"encoder.down_blocks.{i}"
        if name == "res_x":
            enc["down_blocks"].append(midblock(pre, bp["num_layers"]))
        elif name == "res_x_y":
            enc["down_blocks"].append(resnet(pre, cin != cout))
        elif name in ("compress_all_res", "compress_space_res",
                      "compress_time_res"):
            enc["down_blocks"].append({"conv": conv(pre + ".conv")})
        else:
            enc["down_blocks"].append(conv(pre))

    _, dec_plan = _decoder_plan(cfg)
    dec: dict[str, Any] = {
        "conv_in": conv("decoder.conv_in"),
        "up_blocks": [],
        "conv_norm_out": norm("decoder.conv_norm_out"),
        "conv_out": conv("decoder.conv_out"),
    }
    for i, (name, bp, cin, cout) in enumerate(dec_plan):
        pre = f"decoder.up_blocks.{i}"
        if name in ("res_x", "attn_res_x"):
            dec["up_blocks"].append(
                midblock(pre, bp["num_layers"], attn=(name == "attn_res_x"))
            )
        elif name == "res_x_y":
            dec["up_blocks"].append(resnet(pre, cin != cout))
        else:
            dec["up_blocks"].append({"conv": conv(pre + ".conv")})
    if "decoder.timestep_scale_multiplier" in sd:
        dec["timestep_scale_multiplier"] = _jx(
            sd["decoder.timestep_scale_multiplier"], jnp.float32
        )
    if "decoder.last_time_embedder.timestep_embedder.linear_1.weight" in sd:
        dec["last_time_embedder"] = timestep_embedder(
            "decoder.last_time_embedder"
        )
        dec["last_scale_shift_table"] = _jx(
            sd["decoder.last_scale_shift_table"], jnp.float32
        )

    params: dict[str, Any] = {"encoder": enc, "decoder": dec}
    for qc in ("quant_conv", "post_quant_conv"):
        if qc + ".weight" in sd:
            w = sd[qc + ".weight"]
            params[qc] = {
                "kernel": _jx(
                    _tconv(w) if w.ndim == 5 else _t(w)[None, None, None], dtype
                ),
                "bias": _jx(sd[qc + ".bias"], dtype),
            }
    stats = {}
    for ours, names in (
        # diffusers-format checkpoints store the stats as latents_std /
        # latents_mean (``diffusers_config_mapping.py:172-173``) — losing
        # them would silently skip latent (un)normalization entirely
        ("std_of_means",
         ("per_channel_statistics.std-of-means", "latents_std")),
        ("mean_of_means",
         ("per_channel_statistics.mean-of-means", "latents_mean")),
    ):
        for theirs in names:
            if theirs in sd:
                stats[ours] = _jx(sd[theirs], jnp.float32)
                break
    if "std_of_means" in stats:
        stats.setdefault(
            "mean_of_means", jnp.zeros_like(stats["std_of_means"])
        )
        params["per_channel_statistics"] = stats
    return params


def convert_legacy_vae(
    sd: dict[str, np.ndarray],
    cfg,  # models.ltx.video_autoencoder.LegacyVAEConfig
    dtype=jnp.float32,
) -> dict:
    """Legacy (pre-causal) video-VAE state dict -> param tree
    (``/root/reference/ltx_video/models/autoencoders/video_autoencoder.py``
    naming: ``encoder.down_blocks.N.res_blocks.M``, ``.downsample.conv``,
    ``mid_block.res_blocks``, ``decoder.up_blocks.N.upsample.conv``)."""
    sd = {k.removeprefix("vae."): v for k, v in sd.items()}

    def conv(prefix, d=dtype):
        # plain Conv3d / Conv2d, or DualConv3d (weight1/weight2)
        if prefix + ".weight1" in sd:
            p = {
                "kernel1": _jx(_tconv(sd[prefix + ".weight1"]), d),
                "kernel2": _jx(_tconv(sd[prefix + ".weight2"]), d),
            }
            if prefix + ".bias1" in sd:
                p["bias1"] = _jx(sd[prefix + ".bias1"], d)
            if prefix + ".bias2" in sd:
                p["bias2"] = _jx(sd[prefix + ".bias2"], d)
            return p
        w = sd[prefix + ".weight"]
        if w.ndim == 5:
            kernel = _tconv(w)
        elif w.ndim == 4:  # Conv2d [out, in, kh, kw] -> [kh, kw, in, out]
            kernel = np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))
        else:
            raise ValueError(f"unexpected conv ndim {w.ndim} at {prefix}")
        p = {"kernel": _jx(kernel, d)}
        if prefix + ".bias" in sd:
            p["bias"] = _jx(sd[prefix + ".bias"], d)
        return p

    def lin1x1(prefix, d=dtype):
        # make_linear_nd 1x1(x1) conv -> dense [in, out] matrix
        w = sd[prefix + ".weight"]
        p = {"kernel": _jx(_t(w.reshape(w.shape[0], w.shape[1])), d)}
        if prefix + ".bias" in sd:
            p["bias"] = _jx(sd[prefix + ".bias"], d)
        return p

    def norm(prefix):
        return {
            "weight": _jx(sd[prefix + ".weight"], jnp.float32),
            "bias": _jx(sd[prefix + ".bias"], jnp.float32),
        }

    def resnet(prefix):
        p = {"conv1": conv(prefix + ".conv1"), "conv2": conv(prefix + ".conv2")}
        if prefix + ".norm1.weight" in sd:
            p["norm1"] = norm(prefix + ".norm1")
            p["norm2"] = norm(prefix + ".norm2")
        if prefix + ".conv_shortcut.weight" in sd:
            p["conv_shortcut"] = lin1x1(prefix + ".conv_shortcut")
        return p

    def res_list(prefix):
        out, j = [], 0
        while any(k.startswith(f"{prefix}.res_blocks.{j}.") for k in sd):
            out.append(resnet(f"{prefix}.res_blocks.{j}"))
            j += 1
        return out

    def half(side, stage_key, updown):
        p = {
            "conv_in": conv(f"{side}.conv_in"),
            "conv_out": conv(f"{side}.conv_out"),
            "mid_block": {"res_blocks": res_list(f"{side}.mid_block")},
            stage_key: [],
        }
        if f"{side}.conv_norm_out.weight" in sd:
            p["conv_norm_out"] = norm(f"{side}.conv_norm_out")
        i = 0
        while any(k.startswith(f"{side}.{stage_key}.{i}.") for k in sd):
            stage = {"res_blocks": res_list(f"{side}.{stage_key}.{i}")}
            if f"{side}.{stage_key}.{i}.{updown}.conv.weight" in sd or \
                    f"{side}.{stage_key}.{i}.{updown}.conv.weight1" in sd:
                stage[updown] = conv(f"{side}.{stage_key}.{i}.{updown}.conv")
            p[stage_key].append(stage)
            i += 1
        return p

    params = {
        "encoder": half("encoder", "down_blocks", "downsample"),
        "decoder": half("decoder", "up_blocks", "upsample"),
    }
    if "quant_conv.weight" in sd:
        params["quant_conv"] = lin1x1("quant_conv")
    if "post_quant_conv.weight" in sd:
        params["post_quant_conv"] = lin1x1("post_quant_conv")
    stats = {}
    for ours, names in (
        ("std_of_means",
         ("per_channel_statistics.std-of-means", "latents_std")),
        ("mean_of_means",
         ("per_channel_statistics.mean-of-means", "latents_mean")),
    ):
        for theirs in names:
            if theirs in sd:
                stats[ours] = _jx(sd[theirs], jnp.float32)
                break
    if stats:
        params["per_channel_statistics"] = stats
    return params


# ---------------------------------------------------------------------------
# Wan VAE
# ---------------------------------------------------------------------------

def convert_wan_vae(sd: dict[str, np.ndarray], cfg, dtype=jnp.float32) -> dict:
    """Wan VAE state dict (``/root/reference/wan/modules/vae.py`` naming:
    ``encoder.downsamples.N.residual.{0,2,3,6}``, ``resample.1``,
    ``time_conv``, ``middle.{0,1,2}``, ``head.{0,2}``) -> param tree."""
    from ..models.wan.vae import _decoder_structure, _encoder_structure

    def conv3(prefix):
        p = {"kernel": _jx(_tconv(sd[prefix + ".weight"]), dtype)}
        if prefix + ".bias" in sd:
            p["bias"] = _jx(sd[prefix + ".bias"], dtype)
        return p

    def conv2(prefix):
        w = sd[prefix + ".weight"]
        return {
            "kernel": _jx(np.transpose(w, (2, 3, 1, 0)), dtype),
            "bias": _jx(sd[prefix + ".bias"], dtype),
        }

    def norm(prefix):
        p = {"gamma": _jx(sd[prefix + ".gamma"].reshape(-1), jnp.float32)}
        if prefix + ".bias" in sd:
            p["bias"] = _jx(sd[prefix + ".bias"].reshape(-1), jnp.float32)
        return p

    def res(prefix):
        p = {
            "norm1": norm(prefix + ".residual.0"),
            "conv1": conv3(prefix + ".residual.2"),
            "norm2": norm(prefix + ".residual.3"),
            "conv2": conv3(prefix + ".residual.6"),
        }
        if prefix + ".shortcut.weight" in sd:
            p["shortcut"] = conv3(prefix + ".shortcut")
        return p

    def attn(prefix):
        return {
            "norm": norm(prefix + ".norm"),
            "to_qkv": conv2(prefix + ".to_qkv"),
            "proj": conv2(prefix + ".proj"),
        }

    def stage_blocks(structure, prefix):
        blocks = []
        for i, (kind, cin, cout, _) in enumerate(structure):
            pre = f"{prefix}.{i}"
            if kind == "res":
                blocks.append(res(pre))
            elif kind == "attn":
                blocks.append(attn(pre))
            elif kind in ("downsample2d", "upsample2d"):
                blocks.append(conv2(pre + ".resample.1"))
            else:  # *sample3d
                blocks.append({
                    "resample": conv2(pre + ".resample.1"),
                    "time_conv": conv3(pre + ".time_conv"),
                })
        return blocks

    enc_struct, _ = _encoder_structure(cfg)
    dec_struct, _ = _decoder_structure(cfg)
    return {
        "encoder": {
            "conv1": conv3("encoder.conv1"),
            "downsamples": stage_blocks(enc_struct, "encoder.downsamples"),
            "middle": [
                res("encoder.middle.0"),
                attn("encoder.middle.1"),
                res("encoder.middle.2"),
            ],
            "head_norm": norm("encoder.head.0"),
            "head_conv": conv3("encoder.head.2"),
        },
        "conv1": conv3("conv1"),
        "conv2": conv3("conv2"),
        "decoder": {
            "conv1": conv3("decoder.conv1"),
            "middle": [
                res("decoder.middle.0"),
                attn("decoder.middle.1"),
                res("decoder.middle.2"),
            ],
            "upsamples": stage_blocks(dec_struct, "decoder.upsamples"),
            "head_norm": norm("decoder.head.0"),
            "head_conv": conv3("decoder.head.2"),
        },
    }


# ---------------------------------------------------------------------------
# WanModel DiT
# ---------------------------------------------------------------------------

def convert_wan_model(
    sd: dict[str, np.ndarray], cfg, dtype=jnp.bfloat16
) -> dict:
    """Wan state dict (``/root/reference/wan/modules/model.py`` naming:
    ``blocks.N.self_attn.q``, ``ffn.0/ffn.2``, ``modulation``,
    ``patch_embedding`` Conv3d, ``img_emb.proj.{0,1,3,4}``, vace blocks)
    -> WanModel param tree (``models/wan/model.py``)."""

    def lin(prefix, d=dtype):
        p = {"kernel": _jx(_t(sd[prefix + ".weight"]), d)}
        if prefix + ".bias" in sd:
            p["bias"] = _jx(sd[prefix + ".bias"], d)
        return p

    def norm_w(prefix, bias=False):
        p = {"weight": _jx(sd[prefix + ".weight"], jnp.float32)}
        if bias and prefix + ".bias" in sd:
            p["bias"] = _jx(sd[prefix + ".bias"], jnp.float32)
        return p

    def attn(prefix, img=False):
        p = {
            "q": lin(prefix + ".q"), "k": lin(prefix + ".k"),
            "v": lin(prefix + ".v"), "o": lin(prefix + ".o"),
            "norm_q": norm_w(prefix + ".norm_q"),
            "norm_k": norm_w(prefix + ".norm_k"),
        }
        if img and prefix + ".k_img.weight" in sd:
            p["k_img"] = lin(prefix + ".k_img")
            p["v_img"] = lin(prefix + ".v_img")
            p["norm_k_img"] = norm_w(prefix + ".norm_k_img")
        return p

    def block(prefix, vace=False):
        p = {
            "modulation": _jx(sd[prefix + ".modulation"], jnp.float32),
            "self_attn": attn(prefix + ".self_attn"),
            "cross_attn": attn(prefix + ".cross_attn", img=True),
            "ffn": {
                "fc1": lin(prefix + ".ffn.0"),
                "fc2": lin(prefix + ".ffn.2"),
            },
        }
        if prefix + ".norm3.weight" in sd:
            p["norm3"] = norm_w(prefix + ".norm3", bias=True)
        if prefix + ".cam_encoder.weight" in sd:
            p["cam_encoder"] = lin(prefix + ".cam_encoder", jnp.float32)
            p["projector"] = lin(prefix + ".projector", jnp.float32)
        if vace:
            p["after_proj"] = lin(prefix + ".after_proj", jnp.float32)
            if prefix + ".before_proj.weight" in sd:
                p["before_proj"] = lin(prefix + ".before_proj", jnp.float32)
        return p

    blocks = [block(f"blocks.{i}") for i in range(cfg.num_layers)]
    # heterogenous block extras (cam encoders) appear on every block or none
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    params: dict[str, Any] = {
        "patch_embedding": {
            "kernel": _jx(_tconv(sd["patch_embedding.weight"]), jnp.float32),
            "bias": _jx(sd["patch_embedding.bias"], jnp.float32),
        },
        "text_embedding": {
            "fc1": lin("text_embedding.0"),
            "fc2": lin("text_embedding.2"),
        },
        "time_embedding": {
            "fc1": lin("time_embedding.0", jnp.float32),
            "fc2": lin("time_embedding.2", jnp.float32),
        },
        "time_projection": lin("time_projection.1", jnp.float32),
        "blocks": stacked,
        "head": {
            "modulation": _jx(sd["head.modulation"], jnp.float32),
            "head": lin("head.head", jnp.float32),
        },
    }
    if "img_emb.proj.0.weight" in sd:
        params["img_emb"] = {
            "norm_in": norm_w("img_emb.proj.0", bias=True),
            "fc1": lin("img_emb.proj.1"),
            "fc2": lin("img_emb.proj.3"),
            "norm_out": norm_w("img_emb.proj.4", bias=True),
        }
    if "fps_embedding.weight" in sd:
        params["fps_embedding"] = _jx(sd["fps_embedding.weight"], jnp.float32)
        params["fps_projection"] = {
            "fc1": lin("fps_projection.0", jnp.float32),
            "fc2": lin("fps_projection.2", jnp.float32),
        }
    if "vace_patch_embedding.weight" in sd:
        params["vace_patch_embedding"] = {
            "kernel": _jx(
                _tconv(sd["vace_patch_embedding.weight"]), jnp.float32
            ),
            "bias": _jx(sd["vace_patch_embedding.bias"], jnp.float32),
        }
        n_vace = 0
        while f"vace_blocks.{n_vace}.after_proj.weight" in sd:
            n_vace += 1
        params["vace_blocks"] = [
            block(f"vace_blocks.{i}", vace=True) for i in range(n_vace)
        ]
    return params


# ---------------------------------------------------------------------------
# CLIP vision tower (Wan i2v)
# ---------------------------------------------------------------------------

def convert_clip_vision(
    sd: dict[str, np.ndarray], num_layers: int, dtype=jnp.bfloat16
) -> dict:
    """open-clip / Wan ``visual.*`` state dict -> vision param tree
    (``/root/reference/wan/modules/clip.py`` naming)."""
    if any(k.startswith("visual.") for k in sd):
        sd = {k[len("visual."):]: v for k, v in sd.items()
              if k.startswith("visual.")}

    def lin(prefix, d=dtype):
        p = {"kernel": _jx(_t(sd[prefix + ".weight"]), d)}
        if prefix + ".bias" in sd:
            p["bias"] = _jx(sd[prefix + ".bias"], d)
        return p

    def norm(prefix):
        return {
            "weight": _jx(sd[prefix + ".weight"], jnp.float32),
            "bias": _jx(sd[prefix + ".bias"], jnp.float32),
        }

    blocks = []
    for i in range(num_layers):
        pre = f"transformer.{i}"
        blocks.append({
            "norm1": norm(pre + ".norm1"),
            "attn": {
                "to_qkv": lin(pre + ".attn.to_qkv"),
                "proj": lin(pre + ".attn.proj"),
            },
            "norm2": norm(pre + ".norm2"),
            "mlp": {
                "fc1": lin(pre + ".mlp.0"),
                "fc2": lin(pre + ".mlp.2"),
            },
        })
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    w = sd["patch_embedding.weight"]  # [D, 3, p, p]
    return {
        "patch_embedding": {
            "kernel": _jx(np.transpose(w, (2, 3, 1, 0)), dtype)
        },
        "cls_embedding": _jx(sd["cls_embedding"], dtype),
        "pos_embedding": _jx(sd["pos_embedding"], dtype),
        "pre_norm": norm("pre_norm"),
        "blocks": stacked,
    }


# ---------------------------------------------------------------------------
# T5 / UMT5
# ---------------------------------------------------------------------------

def convert_t5_encoder(
    sd: dict[str, np.ndarray], num_layers: int, shared_pos: bool,
    dtype=jnp.bfloat16,
) -> dict:
    """Wan-style UMT5 naming (``blocks.N.attn.q.weight``) or HF-transformers
    T5 naming (``encoder.block.N.layer.0.SelfAttention.q.weight``)."""
    hf = any(k.startswith("encoder.block.") for k in sd)

    def lin(key):
        return {"kernel": _jx(_t(sd[key]), dtype)}

    blocks = []
    for i in range(num_layers):
        if hf:
            pre = f"encoder.block.{i}"
            b = {
                "norm1": {"weight": _jx(
                    sd[f"{pre}.layer.0.layer_norm.weight"], jnp.float32)},
                "attn": {
                    "q": lin(f"{pre}.layer.0.SelfAttention.q.weight"),
                    "k": lin(f"{pre}.layer.0.SelfAttention.k.weight"),
                    "v": lin(f"{pre}.layer.0.SelfAttention.v.weight"),
                    "o": lin(f"{pre}.layer.0.SelfAttention.o.weight"),
                },
                "norm2": {"weight": _jx(
                    sd[f"{pre}.layer.1.layer_norm.weight"], jnp.float32)},
                "ffn": {
                    "gate": lin(f"{pre}.layer.1.DenseReluDense.wi_0.weight"),
                    "fc1": lin(f"{pre}.layer.1.DenseReluDense.wi_1.weight"),
                    "fc2": lin(f"{pre}.layer.1.DenseReluDense.wo.weight"),
                },
            }
            rel = f"{pre}.layer.0.SelfAttention.relative_attention_bias.weight"
            if not shared_pos and rel in sd:
                b["pos_embedding"] = _jx(sd[rel], jnp.float32)
        else:
            pre = f"blocks.{i}"
            b = {
                "norm1": {"weight": _jx(sd[f"{pre}.norm1.weight"], jnp.float32)},
                "attn": {
                    "q": lin(f"{pre}.attn.q.weight"),
                    "k": lin(f"{pre}.attn.k.weight"),
                    "v": lin(f"{pre}.attn.v.weight"),
                    "o": lin(f"{pre}.attn.o.weight"),
                },
                "norm2": {"weight": _jx(sd[f"{pre}.norm2.weight"], jnp.float32)},
                "ffn": {
                    "gate": lin(f"{pre}.ffn.gate.0.weight"),
                    "fc1": lin(f"{pre}.ffn.fc1.weight"),
                    "fc2": lin(f"{pre}.ffn.fc2.weight"),
                },
            }
            if not shared_pos:
                b["pos_embedding"] = _jx(
                    sd[f"{pre}.pos_embedding.embedding.weight"], jnp.float32
                )
        blocks.append(b)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    if hf:
        params = {
            "token_embedding": _jx(sd["shared.weight"], dtype),
            "blocks": stacked,
            "norm": {"weight": _jx(
                sd["encoder.final_layer_norm.weight"], jnp.float32)},
        }
        if shared_pos:
            params["pos_embedding"] = _jx(
                sd["encoder.block.0.layer.0.SelfAttention"
                   ".relative_attention_bias.weight"], jnp.float32,
            )
    else:
        params = {
            "token_embedding": _jx(sd["token_embedding.weight"], dtype),
            "blocks": stacked,
            "norm": {"weight": _jx(sd["norm.weight"], jnp.float32)},
        }
        if shared_pos:
            params["pos_embedding"] = _jx(
                sd["pos_embedding.embedding.weight"], jnp.float32
            )
    return params
