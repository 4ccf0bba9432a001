"""Latent upsampler for the multi-scale LTX pipeline.

Parity target: ``LatentUpsampler`` at
``/root/reference/ltx_video/models/autoencoders/latent_upsampler.py:42-149``
(ResBlock stack + PixelShuffle 2x spatial — optionally temporal — upsample,
operating in un-normalized latent space). Channels-last ``[B, F, H, W, C]``;
3-D convs (standard, non-causal, zero spatial padding as in the reference's
``nn.Conv3d(padding=1)``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from einops import rearrange

from ...ops.norms import group_norm


@dataclasses.dataclass(frozen=True)
class LatentUpsamplerConfig:
    in_channels: int = 128
    mid_channels: int = 512
    num_blocks_per_stage: int = 4
    dims: int = 3
    spatial_upsample: bool = True
    temporal_upsample: bool = False


def _conv3d(p, x):
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return y + p["bias"].astype(y.dtype)


def _conv2d_framewise(p, x):
    """2-D conv applied per frame (kernel [kh, kw, cin, cout])."""
    b, f = x.shape[:2]
    flat = x.reshape((b * f,) + x.shape[2:])
    y = jax.lax.conv_general_dilated(
        flat, p["kernel"].astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    y = y + p["bias"].astype(y.dtype)
    return y.reshape((b, f) + y.shape[1:])


def _gn(p, x):
    return group_norm(x, 32, p["weight"], p["bias"], eps=1e-5, channel_axis=-1)


def _conv(p, x, dims: int):
    """dims=2: 2-D convs applied framewise (the reference's from_config
    DEFAULT — the shipped spatial-upscaler checkpoints are 2-D,
    ``latent_upsampler.py:157``); dims=3: full 3-D convs."""
    return _conv2d_framewise(p, x) if dims == 2 else _conv3d(p, x)


def _resblock(p, x, dims: int = 3):
    r = x
    x = _conv(p["conv1"], x, dims)
    x = _gn(p["norm1"], x)
    x = jax.nn.silu(x)
    x = _conv(p["conv2"], x, dims)
    x = _gn(p["norm2"], x)
    return jax.nn.silu(x + r)


def _check_cfg(cfg: LatentUpsamplerConfig) -> None:
    if not (cfg.spatial_upsample or cfg.temporal_upsample):
        raise ValueError(
            "Either spatial_upsample or temporal_upsample must be True"
        )
    if cfg.dims == 2 and (cfg.temporal_upsample or not cfg.spatial_upsample):
        raise ValueError(
            "dims=2 supports spatial upsampling only (reference parity)"
        )


def init_params(key: jax.Array, cfg: LatentUpsamplerConfig) -> dict:
    _check_cfg(cfg)
    ks = iter(jax.random.split(key, 8 + 2 * cfg.num_blocks_per_stage))
    body_dims = 2 if cfg.dims == 2 else 3

    def conv(k, cin, cout, kdims=3):
        shape = (3,) * kdims + (cin, cout)
        fan = 27 * cin if kdims == 3 else 9 * cin
        return {
            "kernel": jax.random.normal(k, shape) * fan**-0.5,
            "bias": jnp.zeros((cout,)),
        }

    def gn(c):
        return {"weight": jnp.ones((c,)), "bias": jnp.zeros((c,))}

    def res(k):
        k1, k2 = jax.random.split(k)
        return {
            "conv1": conv(k1, cfg.mid_channels, cfg.mid_channels, body_dims),
            "norm1": gn(cfg.mid_channels),
            "conv2": conv(k2, cfg.mid_channels, cfg.mid_channels, body_dims),
            "norm2": gn(cfg.mid_channels),
        }

    if cfg.spatial_upsample and cfg.temporal_upsample:
        up = conv(next(ks), cfg.mid_channels, 8 * cfg.mid_channels, 3)
    elif cfg.spatial_upsample:
        up = conv(next(ks), cfg.mid_channels, 4 * cfg.mid_channels, 2)
    else:
        up = conv(next(ks), cfg.mid_channels, 2 * cfg.mid_channels, 3)

    return {
        "initial_conv": conv(
            next(ks), cfg.in_channels, cfg.mid_channels, body_dims
        ),
        "initial_norm": gn(cfg.mid_channels),
        "res_blocks": [res(next(ks)) for _ in range(cfg.num_blocks_per_stage)],
        "upsampler": up,
        "post_upsample_res_blocks": [
            res(next(ks)) for _ in range(cfg.num_blocks_per_stage)
        ],
        "final_conv": conv(
            next(ks), cfg.mid_channels, cfg.in_channels, body_dims
        ),
    }


def forward(params: dict, cfg: LatentUpsamplerConfig, latents: jax.Array):
    """latents: [B, F, H, W, C] un-normalized latent space."""
    _check_cfg(cfg)
    body_dims = 2 if cfg.dims == 2 else 3
    x = _conv(params["initial_conv"], latents, body_dims)
    x = _gn(params["initial_norm"], x)
    x = jax.nn.silu(x)
    for rp in params["res_blocks"]:
        x = _resblock(rp, x, body_dims)

    if cfg.temporal_upsample and cfg.spatial_upsample:
        x = _conv3d(params["upsampler"], x)
        x = rearrange(
            x, "b d h w (c p1 p2 p3) -> b (d p1) (h p2) (w p3) c",
            p1=2, p2=2, p3=2,
        )
        x = x[:, 1:]
    elif cfg.spatial_upsample:
        x = _conv2d_framewise(params["upsampler"], x)
        x = rearrange(
            x, "b f h w (c p1 p2) -> b f (h p1) (w p2) c", p1=2, p2=2
        )
    else:
        x = _conv3d(params["upsampler"], x)
        x = rearrange(x, "b d h w (c p1) -> b (d p1) h w c", p1=2)
        x = x[:, 1:]

    for rp in params["post_upsample_res_blocks"]:
        x = _resblock(rp, x, body_dims)
    return _conv(params["final_conv"], x, body_dims)
