"""LTX causal 3D video VAE, TPU-native.

Parity target: ``CausalVideoAutoencoder`` and its Encoder / Decoder /
UNetMidBlock3D / ResnetBlock3D / SpaceToDepthDownsample /
DepthToSpaceUpsample blocks at
``/root/reference/ltx_video/models/autoencoders/causal_video_autoencoder.py``
plus ``CausalConv3d``
(``/root/reference/ltx_video/models/autoencoders/causal_conv3d.py:44-59``).

Layout is channels-last ``[B, F, H, W, C]`` (XLA's native TPU conv layout);
the reference is ``[B, C, F, H, W]``. Conv kernels are stored ``[kt, kh,
kw, C_in, C_out]`` (checkpoint loading transposes torch's
``[C_out, C_in, kt, kh, kw]``).

Supported block vocabulary (the full set reachable from LTX configs,
``causal_video_autoencoder.py:381-470, 630-700``):
encoder — res_x, res_x_y, compress_time, compress_space, compress_all,
compress_all_x_y, compress_all_res, compress_space_res, compress_time_res;
decoder — res_x, attn_res_x, res_x_y, compress_time, compress_space,
compress_all (DepthToSpaceUpsample, optional residual).

Decoder extras: timestep conditioning (noise-augmented decode,
``:722-733, 757-795``), per-resblock spatial noise injection
(``_feed_spatial_noise`` ``:1183-1195``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange

from ...ops.convs import framewise_conv_sum

from ...ops.norms import group_norm, layer_norm, pixel_norm, rms_norm
from ...ops.attention import attention as mha


# ---------------------------------------------------------------------------
# Config
# ---------------------------------------------------------------------------

def _norm_blocks(blocks) -> list[tuple[str, dict]]:
    out = []
    for name, params in blocks:
        if isinstance(params, int):
            params = {"num_layers": params}
        out.append((str(name), dict(params)))
    return out


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 128
    encoder_blocks: tuple = ()
    decoder_blocks: tuple = ()
    base_channels: int = 128
    encoder_base_channels: Optional[int] = None
    decoder_base_channels: Optional[int] = None
    norm_num_groups: int = 32
    patch_size: int = 4
    norm_layer: str = "pixel_norm"  # group_norm | pixel_norm | layer_norm
    latent_log_var: str = "uniform"  # per_channel | uniform | constant | none
    use_quant_conv: bool = False
    causal_decoder: bool = False
    timestep_conditioning: bool = False
    spatial_padding_mode: str = "zeros"

    @staticmethod
    def from_dict(cfg: dict) -> "VAEConfig":
        blocks = cfg.get("blocks")
        enc = _norm_blocks(cfg.get("encoder_blocks", blocks))
        dec = _norm_blocks(cfg.get("decoder_blocks", blocks))
        double_z = cfg.get("double_z", True)
        return VAEConfig(
            in_channels=cfg.get("in_channels", 3),
            out_channels=cfg.get("out_channels", 3),
            latent_channels=cfg["latent_channels"],
            encoder_blocks=tuple((n, tuple(sorted(p.items()))) for n, p in enc),
            decoder_blocks=tuple((n, tuple(sorted(p.items()))) for n, p in dec),
            base_channels=cfg.get("base_channels", 128),
            encoder_base_channels=cfg.get("encoder_base_channels"),
            decoder_base_channels=cfg.get("decoder_base_channels"),
            norm_num_groups=cfg.get("norm_num_groups", 32),
            patch_size=cfg.get("patch_size", 1),
            norm_layer=cfg.get("norm_layer", "group_norm"),
            latent_log_var=cfg.get(
                "latent_log_var", "per_channel" if double_z else "none"
            ),
            use_quant_conv=cfg.get("use_quant_conv", True),
            causal_decoder=cfg.get("causal_decoder", False),
            timestep_conditioning=cfg.get("timestep_conditioning", False),
            spatial_padding_mode=cfg.get("spatial_padding_mode", "zeros"),
        )

    def enc_blocks(self) -> list[tuple[str, dict]]:
        return [(n, dict(p)) for n, p in self.encoder_blocks]

    def dec_blocks(self) -> list[tuple[str, dict]]:
        return [(n, dict(p)) for n, p in self.decoder_blocks]

    @property
    def spatial_downscale_factor(self) -> int:
        n = sum(
            1 for b, _ in self.encoder_blocks
            if b in ("compress_space", "compress_all", "compress_all_res",
                     "compress_space_res", "compress_all_x_y")
        )
        return 2**n * self.patch_size

    @property
    def temporal_downscale_factor(self) -> int:
        n = sum(
            1 for b, _ in self.encoder_blocks
            if b in ("compress_time", "compress_all", "compress_all_res",
                     "compress_time_res", "compress_all_x_y")
        )
        return 2**n


# LTXV 0.9.x production config (diffusers_config_mapping.py:106-131)
LTX_VAE_CONFIG_097 = {
    "_class_name": "CausalVideoAutoencoder",
    "dims": 3,
    "in_channels": 3,
    "out_channels": 3,
    "latent_channels": 128,
    "blocks": [
        ["res_x", 4],
        ["compress_all", 1],
        ["res_x_y", 1],
        ["res_x", 3],
        ["compress_all", 1],
        ["res_x_y", 1],
        ["res_x", 3],
        ["compress_all", 1],
        ["res_x", 3],
        ["res_x", 4],
    ],
    "scaling_factor": 1.0,
    "norm_layer": "pixel_norm",
    "patch_size": 4,
    "latent_log_var": "uniform",
    "use_quant_conv": False,
    "causal_decoder": False,
}


# ---------------------------------------------------------------------------
# Primitive ops
# ---------------------------------------------------------------------------

def causal_conv3d(
    p: dict,
    x: jax.Array,
    stride: tuple[int, int, int] = (1, 1, 1),
    causal: bool = True,
    spatial_mode: str = "zeros",
) -> jax.Array:
    """CausalConv3d: first-frame replicate pad in time, same pad in space.

    ``p["kernel"]``: [kt, kh, kw, C_in, C_out]; x: [B, F, H, W, C].
    """
    kt, kh, kw = p["kernel"].shape[:3]
    if kt > 1:
        if causal:
            front = jnp.repeat(x[:, :1], kt - 1, axis=1)
            x = jnp.concatenate([front, x], axis=1)
        else:
            half = (kt - 1) // 2
            front = jnp.repeat(x[:, :1], half, axis=1)
            back = jnp.repeat(x[:, -1:], half, axis=1)
            x = jnp.concatenate([front, x, back], axis=1)
    ph, pw = kh // 2, kw // 2
    if ph or pw:
        pads = [(0, 0), (0, 0), (ph, ph), (pw, pw), (0, 0)]
        if spatial_mode == "replicate":
            x = jnp.pad(x, pads, mode="edge")
        else:
            x = jnp.pad(x, pads)
    if stride[0] == 1 and kt % 2 == 1:
        # time already padded above, space below -> temporal-VALID
        # framewise sum (see ops/convs.py for the measured rationale)
        y = framewise_conv_sum(
            x, p["kernel"], "VALID", (stride[1], stride[2])
        )
    else:
        y = jax.lax.conv_general_dilated(
            x,
            p["kernel"].astype(x.dtype),
            window_strides=stride,
            padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def pointwise(p: dict, x: jax.Array) -> jax.Array:
    """1x1x1 conv (the reference's ``make_linear_nd``)."""
    y = jnp.einsum("bfhwc,cd->bfhwd", x, p["kernel"][0, 0, 0].astype(x.dtype))
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def _norm(cfg_norm: str, p: Optional[dict], x: jax.Array, groups: int = 32):
    if cfg_norm == "group_norm":
        return group_norm(
            x, groups, p.get("weight"), p.get("bias"), eps=1e-6, channel_axis=-1
        )
    if cfg_norm == "pixel_norm":
        return pixel_norm(x, axis=-1)
    if cfg_norm == "layer_norm":
        return layer_norm(x, p.get("weight"), p.get("bias"), eps=1e-6)
    raise ValueError(cfg_norm)


def _timestep_embedding(t, dim, max_period=10000.0):
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[..., None] * freqs
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def _pixart_time_embed(p: dict, t: jax.Array) -> jax.Array:
    """PixArtAlphaCombinedTimestepSizeEmbeddings with size_emb_dim=0:
    sinusoidal(256) -> linear -> silu -> linear (output width comes from
    the linear_2 kernel)."""
    emb = _timestep_embedding(t, 256)
    emb = emb @ p["linear_1"]["kernel"].astype(jnp.float32) + p["linear_1"]["bias"]
    emb = jax.nn.silu(emb)
    emb = emb @ p["linear_2"]["kernel"].astype(jnp.float32) + p["linear_2"]["bias"]
    return emb


# ---------------------------------------------------------------------------
# Initialization helpers
# ---------------------------------------------------------------------------

def _conv_init(key, kt, kh, kw, cin, cout):
    fan_in = kt * kh * kw * cin
    k1, _ = jax.random.split(key)
    return {
        "kernel": jax.random.normal(k1, (kt, kh, kw, cin, cout)) * fan_in**-0.5,
        "bias": jnp.zeros((cout,)),
    }


def _linear_init(key, cin, cout):
    return {
        "kernel": jax.random.normal(key, (cin, cout)) * cin**-0.5,
        "bias": jnp.zeros((cout,)),
    }


def _norm_params(norm_layer: str, channels: int):
    if norm_layer in ("group_norm", "layer_norm"):
        return {"weight": jnp.ones((channels,)), "bias": jnp.zeros((channels,))}
    return {}


def _resnet_init(key, cfg: VAEConfig, cin, cout, inject_noise, timestep_cond):
    ks = iter(jax.random.split(key, 8))
    p: dict[str, Any] = {
        "norm1": _norm_params(cfg.norm_layer, cin),
        "conv1": _conv_init(next(ks), 3, 3, 3, cin, cout),
        "norm2": _norm_params(cfg.norm_layer, cout),
        "conv2": _conv_init(next(ks), 3, 3, 3, cout, cout),
    }
    if cin != cout:
        p["conv_shortcut"] = {
            "kernel": jax.random.normal(next(ks), (1, 1, 1, cin, cout)) * cin**-0.5,
            "bias": jnp.zeros((cout,)),
        }
        p["norm3"] = {"weight": jnp.ones((cin,)), "bias": jnp.zeros((cin,))}
    if inject_noise:
        p["per_channel_scale1"] = jnp.zeros((cout,))
        p["per_channel_scale2"] = jnp.zeros((cout,))
    if timestep_cond:
        p["scale_shift_table"] = jax.random.normal(next(ks), (4, cin)) / cin**0.5
    return p


def _midblock_init(key, cfg, cin, num_layers, inject_noise, timestep_cond,
                   attention_head_dim=-1):
    ks = iter(jax.random.split(key, num_layers + 2))
    p: dict[str, Any] = {
        "res_blocks": [
            _resnet_init(next(ks), cfg, cin, cin, inject_noise, timestep_cond)
            for _ in range(num_layers)
        ]
    }
    if timestep_cond:
        k = next(ks)
        p["time_embedder"] = {
            "linear_1": _linear_init(jax.random.fold_in(k, 0), 256, cin * 4),
            "linear_2": _linear_init(jax.random.fold_in(k, 1), cin * 4, cin * 4),
        }
    if attention_head_dim > 0:
        k = next(ks)
        # qk rms-norm is PER HEAD in the reference (diffusers Attention
        # with qk_norm="rms_norm": RMSNorm(dim_head)), so the norm weight
        # width is the head dim — the forward derives the head split
        # from it
        hd = attention_head_dim if attention_head_dim < cin else cin
        p["attention_blocks"] = [
            {
                "to_q": _linear_init(jax.random.fold_in(k, 4 * i), cin, cin),
                "to_k": _linear_init(jax.random.fold_in(k, 4 * i + 1), cin, cin),
                "to_v": _linear_init(jax.random.fold_in(k, 4 * i + 2), cin, cin),
                "to_out": _linear_init(jax.random.fold_in(k, 4 * i + 3), cin, cin),
                "q_norm": {"weight": jnp.ones((hd,))},
                "k_norm": {"weight": jnp.ones((hd,))},
            }
            for i in range(num_layers)
        ]
    return p


def _encoder_plan(cfg: VAEConfig):
    """Static (block_name, params, in_ch, out_ch) plan for the encoder."""
    plan = []
    ch = cfg.encoder_base_channels or cfg.base_channels
    for name, bp in cfg.enc_blocks():
        cin = ch
        if name in ("res_x_y", "compress_all_x_y", "compress_all_res",
                    "compress_space_res", "compress_time_res"):
            ch = bp.get("multiplier", 2) * ch
        plan.append((name, bp, cin, ch))
    return plan


def _decoder_plan(cfg: VAEConfig):
    plan = []
    blocks = list(reversed(cfg.dec_blocks()))
    ch = cfg.decoder_base_channels or cfg.base_channels
    for name, bp in blocks:
        if name == "res_x_y":
            ch = ch * bp.get("multiplier", 2)
        if name == "compress_all":
            ch = ch * bp.get("multiplier", 1)
    # ch is now conv_in output channel; walk forward
    plan_ch = ch
    for name, bp in blocks:
        cin = plan_ch
        if name == "res_x_y":
            plan_ch = plan_ch // bp.get("multiplier", 2)
        elif name == "compress_all":
            plan_ch = plan_ch // bp.get("multiplier", 1)
        plan.append((name, bp, cin, plan_ch))
    return ch, plan


def init_params(key: jax.Array, cfg: VAEConfig) -> dict:
    keys = iter(jax.random.split(key, 256))
    enc_plan = _encoder_plan(cfg)
    enc_in = cfg.in_channels * cfg.patch_size**2
    base = cfg.encoder_base_channels or cfg.base_channels

    enc: dict[str, Any] = {
        "conv_in": _conv_init(next(keys), 3, 3, 3, enc_in, base),
        "down_blocks": [],
    }
    for name, bp, cin, cout in enc_plan:
        if name == "res_x":
            p = _midblock_init(next(keys), cfg, cin, bp["num_layers"], False, False)
        elif name == "res_x_y":
            p = _resnet_init(next(keys), cfg, cin, cout, False, False)
        elif name in ("compress_time", "compress_space", "compress_all",
                      "compress_all_x_y"):
            p = _conv_init(next(keys), 3, 3, 3, cin, cout)
        elif name in ("compress_all_res", "compress_space_res",
                      "compress_time_res"):
            stride = {"compress_all_res": (2, 2, 2),
                      "compress_space_res": (1, 2, 2),
                      "compress_time_res": (2, 1, 1)}[name]
            p = {"conv": _conv_init(
                next(keys), 3, 3, 3, cin, cout // int(np.prod(stride)))}
        else:
            raise ValueError(f"unknown encoder block {name}")
        enc["down_blocks"].append(p)
    last_ch = enc_plan[-1][3] if enc_plan else base
    enc["conv_norm_out"] = _norm_params(cfg.norm_layer, last_ch)
    out_ch = cfg.latent_channels
    if cfg.latent_log_var == "per_channel":
        out_ch *= 2
    elif cfg.latent_log_var in ("uniform", "constant"):
        out_ch += 1
    enc["conv_out"] = _conv_init(next(keys), 3, 3, 3, last_ch, out_ch)

    dec_base, dec_plan = _decoder_plan(cfg)
    dec: dict[str, Any] = {
        "conv_in": _conv_init(next(keys), 3, 3, 3, cfg.latent_channels, dec_base),
        "up_blocks": [],
    }
    for name, bp, cin, cout in dec_plan:
        if name == "res_x":
            p = _midblock_init(
                next(keys), cfg, cin, bp["num_layers"],
                bp.get("inject_noise", False), cfg.timestep_conditioning,
            )
        elif name == "attn_res_x":
            p = _midblock_init(
                next(keys), cfg, cin, bp["num_layers"],
                bp.get("inject_noise", False), cfg.timestep_conditioning,
                attention_head_dim=bp["attention_head_dim"],
            )
        elif name == "res_x_y":
            p = _resnet_init(next(keys), cfg, cin, cout,
                             bp.get("inject_noise", False), False)
        elif name in ("compress_time", "compress_space", "compress_all"):
            stride = {"compress_time": (2, 1, 1), "compress_space": (1, 2, 2),
                      "compress_all": (2, 2, 2)}[name]
            reduction = bp.get("multiplier", 1) if name == "compress_all" else 1
            conv_out = int(np.prod(stride)) * cin // reduction
            p = {"conv": _conv_init(next(keys), 3, 3, 3, cin, conv_out)}
        else:
            raise ValueError(f"unknown decoder block {name}")
        dec["up_blocks"].append(p)
    final_ch = dec_plan[-1][3] if dec_plan else dec_base
    dec["conv_norm_out"] = _norm_params(cfg.norm_layer, final_ch)
    dec["conv_out"] = _conv_init(
        next(keys), 3, 3, 3, final_ch, cfg.out_channels * cfg.patch_size**2
    )
    if cfg.timestep_conditioning:
        dec["timestep_scale_multiplier"] = jnp.asarray(1000.0)
        k = next(keys)
        dec["last_time_embedder"] = {
            "linear_1": _linear_init(jax.random.fold_in(k, 0), 256, final_ch * 2),
            "linear_2": _linear_init(
                jax.random.fold_in(k, 1), final_ch * 2, final_ch * 2
            ),
        }
        dec["last_scale_shift_table"] = (
            jax.random.normal(next(keys), (2, final_ch)) / final_ch**0.5
        )

    params: dict[str, Any] = {"encoder": enc, "decoder": dec}
    if cfg.use_quant_conv:
        params["quant_conv"] = {
            "kernel": jax.random.normal(
                next(keys), (1, 1, 1, 2 * cfg.latent_channels,
                             2 * cfg.latent_channels)
            ) * (2 * cfg.latent_channels) ** -0.5,
            "bias": jnp.zeros((2 * cfg.latent_channels,)),
        }
        params["post_quant_conv"] = {
            "kernel": jax.random.normal(
                next(keys), (1, 1, 1, cfg.latent_channels, cfg.latent_channels)
            ) * cfg.latent_channels**-0.5,
            "bias": jnp.zeros((cfg.latent_channels,)),
        }
    # per-channel latent statistics (overwritten from checkpoint)
    params["per_channel_statistics"] = {
        "std_of_means": jnp.ones((cfg.latent_channels,)),
        "mean_of_means": jnp.zeros((cfg.latent_channels,)),
    }
    return params


# ---------------------------------------------------------------------------
# Forward blocks
# ---------------------------------------------------------------------------

def _resnet_forward(cfg: VAEConfig, p, x, causal, timestep_embed, key):
    h = _norm(cfg.norm_layer, p.get("norm1", {}), x, cfg.norm_num_groups)
    if "scale_shift_table" in p and timestep_embed is not None:
        # timestep_embed: [B, 4*C] fp32
        b = x.shape[0]
        c = p["scale_shift_table"].shape[1]
        ada = p["scale_shift_table"].astype(jnp.float32)[None] + \
            timestep_embed.reshape(b, 4, c)
        shift1, scale1, shift2, scale2 = [
            ada[:, i][:, None, None, None, :].astype(x.dtype) for i in range(4)
        ]
        h = h * (1 + scale1) + shift1
    h = jax.nn.silu(h)
    h = causal_conv3d(p["conv1"], h, causal=causal,
                      spatial_mode=cfg.spatial_padding_mode)
    if "per_channel_scale1" in p and key is not None:
        k1, key = jax.random.split(key)
        noise = jax.random.normal(k1, h.shape[-3:-1], h.dtype)  # [H, W]
        h = h + noise[None, None, :, :, None] * \
            p["per_channel_scale1"].astype(h.dtype)
    h = _norm(cfg.norm_layer, p.get("norm2", {}), h, cfg.norm_num_groups)
    if "scale_shift_table" in p and timestep_embed is not None:
        h = h * (1 + scale2) + shift2
    h = jax.nn.silu(h)
    h = causal_conv3d(p["conv2"], h, causal=causal,
                      spatial_mode=cfg.spatial_padding_mode)
    if "per_channel_scale2" in p and key is not None:
        k2, key = jax.random.split(key)
        noise = jax.random.normal(k2, h.shape[-3:-1], h.dtype)
        h = h + noise[None, None, :, :, None] * \
            p["per_channel_scale2"].astype(h.dtype)
    sc = x
    if "norm3" in p:
        sc = layer_norm(sc, p["norm3"].get("weight"), p["norm3"].get("bias"),
                        eps=1e-6)
    if "conv_shortcut" in p:
        sc = pointwise(p["conv_shortcut"], sc)
    return sc + h


def _vae_attention(p, x):
    """Spatial-temporal self-attention over all voxels (decoder mid-block,
    residual connection + PER-HEAD rms qk-norm —
    ``causal_video_autoencoder.py:876-895``: heads = C // head_dim, the
    qk-norm weight width IS the head dim)."""
    b, f, h, w, c = x.shape
    tokens = x.reshape(b, f * h * w, c)
    q = tokens @ p["to_q"]["kernel"].astype(x.dtype) + p["to_q"]["bias"].astype(x.dtype)
    k = tokens @ p["to_k"]["kernel"].astype(x.dtype) + p["to_k"]["bias"].astype(x.dtype)
    v = tokens @ p["to_v"]["kernel"].astype(x.dtype) + p["to_v"]["bias"].astype(x.dtype)
    d = p["q_norm"]["weight"].shape[0]
    heads = c // d

    def split(t):
        return t.reshape(b, -1, heads, d).transpose(0, 2, 1, 3)

    qh = rms_norm(split(q), p["q_norm"]["weight"], eps=1e-5)
    kh = rms_norm(split(k), p["k_norm"]["weight"], eps=1e-5)
    out = mha(qh, kh, split(v))
    out = out.transpose(0, 2, 1, 3).reshape(b, -1, c)
    out = out @ p["to_out"]["kernel"].astype(x.dtype) + \
        p["to_out"]["bias"].astype(x.dtype)
    return (tokens + out).reshape(b, f, h, w, c)


def _midblock_forward(cfg, p, x, causal, timestep, key):
    temb = None
    if "time_embedder" in p and timestep is not None:
        cin = x.shape[-1]
        temb = _pixart_time_embed(
            p["time_embedder"], jnp.broadcast_to(timestep, (x.shape[0],)),
        )  # [B, 4C]
    attn = p.get("attention_blocks")
    for i, rp in enumerate(p["res_blocks"]):
        sub = None if key is None else jax.random.fold_in(key, i)
        x = _resnet_forward(cfg, rp, x, causal, temb, sub)
        if attn is not None:
            x = _vae_attention(attn[i], x)
    return x


def _space_to_depth_down(cfg, p, x, stride, causal):
    if stride[0] == 2:
        x = jnp.concatenate([x[:, :1], x], axis=1)
    # skip branch: group-mean of space-to-depth
    x_in = rearrange(
        x, "b (d p1) (h p2) (w p3) c -> b d h w (c p1 p2 p3)",
        p1=stride[0], p2=stride[1], p3=stride[2],
    )
    cout_conv = p["conv"]["kernel"].shape[-1]
    total = x_in.shape[-1]
    out_ch = cout_conv * int(np.prod(stride))
    group = total // out_ch
    # reference groups as (c g): channel-major split then mean over g
    x_in = rearrange(x_in, "b d h w (c g) -> b d h w c g", g=group)
    x_in = x_in.mean(axis=-1)
    y = causal_conv3d(p["conv"], x, causal=causal,
                      spatial_mode=cfg.spatial_padding_mode)
    y = rearrange(
        y, "b (d p1) (h p2) (w p3) c -> b d h w (c p1 p2 p3)",
        p1=stride[0], p2=stride[1], p3=stride[2],
    )
    return y + x_in


def _pixel_shuffle_3d(x, stride):
    """[B, F, H, W, C*prod(stride)] -> [B, F*s0, H*s1, W*s2, C].

    Channel unpack order matches torch PixelShuffleND: channels split as
    (C, p1, p2, p3) row-major."""
    p1, p2, p3 = stride
    return rearrange(
        x, "b d h w (c p1 p2 p3) -> b (d p1) (h p2) (w p3) c",
        p1=p1, p2=p2, p3=p3,
    )


def _depth_to_space_up(cfg, p, x, stride, causal, residual, reduction):
    if residual:
        # residual branch: pixel-shuffle the raw input, tile channels to the
        # reduced output width (``causal_video_autoencoder.py:1052-1058``)
        num_repeat = int(np.prod(stride)) // reduction
        assert x.shape[-1] % int(np.prod(stride)) == 0
        x_in = _pixel_shuffle_3d(x, stride)
        x_in = jnp.concatenate([x_in] * num_repeat, axis=-1)
        if stride[0] == 2:
            x_in = x_in[:, 1:]
    y = causal_conv3d(p["conv"], x, causal=causal,
                      spatial_mode=cfg.spatial_padding_mode)
    y = _pixel_shuffle_3d(y, stride)
    if stride[0] == 2:
        y = y[:, 1:]
    if residual:
        y = y + x_in
    return y


# ---------------------------------------------------------------------------
# Encoder / decoder forward
# ---------------------------------------------------------------------------

def _patchify_pixels(x: jax.Array, p: int) -> jax.Array:
    if p == 1:
        return x
    return rearrange(
        x, "b f (h q) (w r) c -> b f h w (c r q)", q=p, r=p
    )


def _unpatchify_pixels(x: jax.Array, p: int) -> jax.Array:
    if p == 1:
        return x
    return rearrange(
        x, "b f h w (c r q) -> b f (h q) (w r) c", q=p, r=p
    )


def encode(params: dict, cfg: VAEConfig, media: jax.Array) -> jax.Array:
    """Encode pixels ``[B, F, H, W, C]`` (in [-1, 1]) to latent mean+logvar
    ``[B, F', H', W', 2*latent]``. Always causal (encoder)."""
    enc = params["encoder"]
    x = _patchify_pixels(media, cfg.patch_size)
    x = causal_conv3d(enc["conv_in"], x, causal=True,
                      spatial_mode=cfg.spatial_padding_mode)
    for (name, bp, cin, cout), p in zip(_encoder_plan(cfg), enc["down_blocks"]):
        if name == "res_x":
            x = _midblock_forward(cfg, p, x, True, None, None)
        elif name == "res_x_y":
            x = _resnet_forward(cfg, p, x, True, None, None)
        elif name in ("compress_time", "compress_space", "compress_all",
                      "compress_all_x_y"):
            stride = {"compress_time": (2, 1, 1), "compress_space": (1, 2, 2),
                      "compress_all": (2, 2, 2),
                      "compress_all_x_y": (2, 2, 2)}[name]
            x = causal_conv3d(p, x, stride=stride, causal=True,
                              spatial_mode=cfg.spatial_padding_mode)
        else:
            stride = {"compress_all_res": (2, 2, 2),
                      "compress_space_res": (1, 2, 2),
                      "compress_time_res": (2, 1, 1)}[name]
            x = _space_to_depth_down(cfg, p, x, stride, True)
    x = _norm(cfg.norm_layer, enc["conv_norm_out"], x, cfg.norm_num_groups)
    x = jax.nn.silu(x)
    x = causal_conv3d(enc["conv_out"], x, causal=True,
                      spatial_mode=cfg.spatial_padding_mode)

    if cfg.latent_log_var == "uniform":
        last = x[..., -1:]
        rep = jnp.repeat(last, x.shape[-1] - 2, axis=-1)
        x = jnp.concatenate([x, rep], axis=-1)
    elif cfg.latent_log_var == "constant":
        x = x[..., :-1]
        x = jnp.concatenate([x, jnp.full_like(x, -30.0)], axis=-1)
    if cfg.use_quant_conv and "quant_conv" in params:
        x = pointwise(params["quant_conv"], x)
    return x


def decode(
    params: dict,
    cfg: VAEConfig,
    latents: jax.Array,
    timestep: Optional[jax.Array] = None,
    noise_key: Optional[jax.Array] = None,
) -> jax.Array:
    """Decode latents ``[B, F', H', W', latent]`` to pixels."""
    if cfg.timestep_conditioning and timestep is None:
        # the reference asserts this (a conditioned decoder run without
        # its timestep silently drops the ada modulation the weights
        # were trained with — badly degraded output, no error)
        raise ValueError(
            "cfg.timestep_conditioning=True requires a decode timestep "
            "(the pipeline passes decode_timestep from the config)"
        )
    dec = params["decoder"]
    causal = cfg.causal_decoder
    x = latents
    if cfg.use_quant_conv and "post_quant_conv" in params:
        x = pointwise(params["post_quant_conv"], x)
    # the reference decoder runs conv_in/conv_out with causal=self.causal
    # (causal_video_autoencoder.py Decoder.forward), not the ctor default
    x = causal_conv3d(dec["conv_in"], x, causal=causal,
                      spatial_mode=cfg.spatial_padding_mode)

    scaled_t = None
    if cfg.timestep_conditioning and timestep is not None:
        scaled_t = timestep * params["decoder"].get(
            "timestep_scale_multiplier", 1000.0
        )

    _, dec_plan = _decoder_plan(cfg)
    for i, ((name, bp, cin, cout), p) in enumerate(zip(dec_plan, dec["up_blocks"])):
        key = None if noise_key is None else jax.random.fold_in(noise_key, i)
        if name in ("res_x", "attn_res_x"):
            x = _midblock_forward(cfg, p, x, causal, scaled_t, key)
        elif name == "res_x_y":
            x = _resnet_forward(cfg, p, x, causal, None, key)
        else:
            stride = {"compress_time": (2, 1, 1), "compress_space": (1, 2, 2),
                      "compress_all": (2, 2, 2)}[name]
            x = _depth_to_space_up(
                cfg, p, x, stride, causal,
                bp.get("residual", False), bp.get("multiplier", 1),
            )
    x = _norm(cfg.norm_layer, dec["conv_norm_out"], x, cfg.norm_num_groups)

    if cfg.timestep_conditioning and timestep is not None:
        b = x.shape[0]
        c = x.shape[-1]
        emb = _pixart_time_embed(
            dec["last_time_embedder"],
            jnp.broadcast_to(scaled_t, (b,)),
        )  # [B, 2C]
        vals = dec["last_scale_shift_table"].astype(jnp.float32)[None] + \
            emb.reshape(b, 2, c)
        shift = vals[:, 0][:, None, None, None, :].astype(x.dtype)
        scale = vals[:, 1][:, None, None, None, :].astype(x.dtype)
        x = x * (1 + scale) + shift

    x = jax.nn.silu(x)
    x = causal_conv3d(dec["conv_out"], x, causal=causal,
                      spatial_mode=cfg.spatial_padding_mode)
    return _unpatchify_pixels(x, cfg.patch_size)


def sample_posterior(
    encoded: jax.Array, key: Optional[jax.Array] = None
) -> jax.Array:
    """Split mean / logvar; sample (or mode when key is None)."""
    mean, logvar = jnp.split(encoded, 2, axis=-1)
    if key is None:
        return mean
    std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
    return mean + std * jax.random.normal(key, mean.shape, mean.dtype)


def normalize_latents(latents: jax.Array, stats: dict) -> jax.Array:
    """Pixel-latent -> DiT space: (z - mean) / std per channel
    (``vae_encode.py:228-236``)."""
    mean = stats["mean_of_means"].astype(latents.dtype)
    std = stats["std_of_means"].astype(latents.dtype)
    return (latents - mean) / std


def un_normalize_latents(latents: jax.Array, stats: dict) -> jax.Array:
    mean = stats["mean_of_means"].astype(latents.dtype)
    std = stats["std_of_means"].astype(latents.dtype)
    return latents * std + mean
