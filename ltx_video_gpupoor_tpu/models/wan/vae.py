"""Wan 2.1 causal 3D VAE, TPU-native.

Parity target: ``WanVAE_`` / ``Encoder3d`` / ``Decoder3d`` / ``Resample`` /
``ResidualBlock`` / ``AttentionBlock`` at
``/root/reference/wan/modules/vae.py``.

The reference encodes/decodes via a per-CausalConv3d temporal feature cache
with frame-chunked streaming (1+4+4... encode ``:536-575``, frame-at-a-time
decode ``:578-609``). On TPU we process the whole clip; the cache protocol
reduces to these full-sequence equivalents (derived from the cache
dataflow):

- every CausalConv3d = zero-pad 2 frames in front (time kernel 3), spatial
  same-pad;
- encoder ``downsample3d``: frame 0 bypasses the time conv; frames j>=1
  come from stride-2 windows [2j-2, 2j-1, 2j] -> T' = 1 + (T-1)/2;
- decoder ``upsample3d``: frame 0 bypasses (no 2x); the time conv stream
  is frames 1..T-1 with causal zero pad, each output giving 2 interleaved
  frames -> T' = 1 + 2(T-1).

Layout channels-last [B, F, H, W, C]; kernels [kt, kh, kw, cin, cout].
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange

from ...ops.convs import framewise_conv_sum


@dataclasses.dataclass(frozen=True)
class WanVAEConfig:
    dim: int = 96
    z_dim: int = 16
    dim_mult: tuple = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_scales: tuple = ()
    temperal_downsample: tuple = (False, True, True)

    @property
    def temperal_upsample(self) -> tuple:
        return tuple(reversed(self.temperal_downsample))


# Wan 2.1 latent statistics (``vae.py:768-780``)
WAN_LATENT_MEAN = np.array([
    -0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517, 1.5508,
    0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497, 0.2503, -0.2921,
], np.float32)
WAN_LATENT_STD = np.array([
    2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
    3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160,
], np.float32)


# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------

def causal_conv3d(p, x, stride=(1, 1, 1)):
    """Wan CausalConv3d: zero-pad 2*(kt//2) front in time, same pad space.

    Stride-1 odd-kt convs (every call site in this VAE) go through
    :func:`ops.convs.framewise_conv_sum` — same math, measured on v5e at
    47.5→52.2 TF/s for the decoder's C96 full-res shape and
    8.0 s → 5.68 s for the whole 832x480x81f tiled decode (r3e; the
    end-to-end win exceeds the isolated-conv win because the shifted
    framewise reads also fuse with the surrounding elementwise ops).
    """
    kt, kh, kw = p["kernel"].shape[:3]
    if stride == (1, 1, 1) and kt % 2 == 1:
        xp = jnp.pad(x, [(0, 0), (2 * (kt // 2), 0), (0, 0), (0, 0),
                         (0, 0)])
        y = framewise_conv_sum(
            xp, p["kernel"],
            [(kh // 2, kh // 2), (kw // 2, kw // 2)],
        )
        return y + p["bias"].astype(y.dtype)
    pads = [(0, 0), (2 * (kt // 2), 0), (kh // 2, kh // 2),
            (kw // 2, kw // 2), (0, 0)]
    x = jnp.pad(x, pads)
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), stride, "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return y + p["bias"].astype(y.dtype)


def conv2d_framewise(p, x, stride=(1, 1), pad="SAME"):
    b, f = x.shape[:2]
    flat = x.reshape((b * f,) + x.shape[2:])
    y = jax.lax.conv_general_dilated(
        flat, p["kernel"].astype(x.dtype), stride, pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    y = y + p["bias"].astype(y.dtype)
    return y.reshape((b, f) + y.shape[1:])


def wan_rms_norm(p, x):
    """``RMS_norm`` (``vae.py:41-59``): L2-normalize channels * sqrt(C) * gamma."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True))
    c = x.shape[-1]
    y = xf / jnp.maximum(norm, 1e-12) * (c**0.5)
    y = y * p["gamma"].astype(jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(dtype)


def _residual_block(p, x):
    h = wan_rms_norm(p["norm1"], x)
    h = jax.nn.silu(h)
    h = causal_conv3d(p["conv1"], h)
    h = wan_rms_norm(p["norm2"], h)
    h = jax.nn.silu(h)
    h = causal_conv3d(p["conv2"], h)
    sc = x
    if "shortcut" in p:
        sc = causal_conv3d(p["shortcut"], sc)
    return sc + h


def _attention_block(p, x):
    """Single-head per-frame spatial attention (``vae.py:236-274``)."""
    b, f, h, w, c = x.shape
    identity = x
    y = wan_rms_norm(p["norm"], x)
    qkv = conv2d_framewise(p["to_qkv"], y)  # [B, F, H, W, 3C]
    q, k, v = jnp.split(qkv.reshape(b * f, h * w, 3 * c), 3, axis=-1)
    scores = jnp.einsum(
        "bic,bjc->bij", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * (c**-0.5)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bij,bjc->bic", probs, v.astype(jnp.float32))
    out = out.astype(x.dtype).reshape(b, f, h, w, c)
    out = conv2d_framewise(p["proj"], out)
    return out + identity


def _downsample_spatial(p, x):
    """ZeroPad2d (right, bottom) + stride-2 conv (``vae.py:92-96``)."""
    x = jnp.pad(x, [(0, 0), (0, 0), (0, 1), (0, 1), (0, 0)])
    return conv2d_framewise(p, x, stride=(2, 2), pad="VALID")


def _upsample_spatial(p, x):
    """Nearest-exact 2x + conv dim -> dim//2 (``vae.py:80-88``)."""
    b, f, h, w, c = x.shape
    y = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
    return conv2d_framewise(p, y)


def _downsample_time(p, x):
    """Frame 0 bypass + stride-2 kernel-3 causal windows."""
    first = x[:, :1]
    if x.shape[1] == 1:
        return first
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (2, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + p["bias"].astype(x.dtype)
    return jnp.concatenate([first, y], axis=1)


def _upsample_time(p, x):
    """Frame 0 bypass; frames 1.. through causal k-3 conv emitting 2x
    interleaved frames."""
    b, f, h, w, c = x.shape
    first = x[:, :1]
    if f == 1:
        return first
    rest = x[:, 1:]
    y = causal_conv3d(p, rest)  # [B, F-1, H, W, 2C]
    y = rearrange(y, "b f h w (p c) -> b (f p) h w c", p=2)
    return jnp.concatenate([first, y], axis=1)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _conv3d_init(key, kt, kh, kw, cin, cout):
    fan = kt * kh * kw * cin
    return {
        "kernel": jax.random.normal(key, (kt, kh, kw, cin, cout)) * fan**-0.5,
        "bias": jnp.zeros((cout,)),
    }


def _conv2d_init(key, kh, kw, cin, cout):
    fan = kh * kw * cin
    return {
        "kernel": jax.random.normal(key, (kh, kw, cin, cout)) * fan**-0.5,
        "bias": jnp.zeros((cout,)),
    }


def _norm_init(c):
    return {"gamma": jnp.ones((c,))}


def _res_init(key, cin, cout):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "norm1": _norm_init(cin),
        "conv1": _conv3d_init(k1, 3, 3, 3, cin, cout),
        "norm2": _norm_init(cout),
        "conv2": _conv3d_init(k2, 3, 3, 3, cout, cout),
    }
    if cin != cout:
        p["shortcut"] = _conv3d_init(k3, 1, 1, 1, cin, cout)
    return p


def _attn_init(key, c):
    k1, k2 = jax.random.split(key)
    return {
        "norm": _norm_init(c),
        "to_qkv": _conv2d_init(k1, 1, 1, c, 3 * c),
        "proj": {
            "kernel": jnp.zeros((1, 1, c, c)), "bias": jnp.zeros((c,))
        },
    }


def _encoder_structure(cfg: WanVAEConfig):
    """Yields (kind, cin, cout, extra) descriptors in forward order."""
    dims = [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]
    out = []
    scale = 1.0
    for i, (cin, cout) in enumerate(zip(dims[:-1], dims[1:])):
        cur = cin
        for _ in range(cfg.num_res_blocks):
            out.append(("res", cur, cout, None))
            if scale in cfg.attn_scales:
                out.append(("attn", cout, cout, None))
            cur = cout
        if i != len(cfg.dim_mult) - 1:
            mode = (
                "downsample3d" if cfg.temperal_downsample[i] else "downsample2d"
            )
            out.append((mode, cout, cout, None))
            scale /= 2.0
    return out, dims[-1]


def _decoder_structure(cfg: WanVAEConfig):
    dims = [cfg.dim * u for u in (cfg.dim_mult[-1],) + tuple(cfg.dim_mult[::-1])]
    out = []
    scale = 1.0 / 2 ** (len(cfg.dim_mult) - 2)
    for i, (cin, cout) in enumerate(zip(dims[:-1], dims[1:])):
        cur = cin // 2 if i in (1, 2, 3) else cin
        for _ in range(cfg.num_res_blocks + 1):
            out.append(("res", cur, cout, None))
            if scale in cfg.attn_scales:
                out.append(("attn", cout, cout, None))
            cur = cout
        if i != len(cfg.dim_mult) - 1:
            mode = "upsample3d" if cfg.temperal_upsample[i] else "upsample2d"
            out.append((mode, cout, cout // 2, None))
            scale *= 2.0
    return out, dims[0]


def init_params(key: jax.Array, cfg: WanVAEConfig) -> dict:
    ks = iter(jax.random.split(key, 512))
    enc_struct, enc_out = _encoder_structure(cfg)

    def build(structure):
        blocks = []
        for kind, cin, cout, _ in structure:
            if kind == "res":
                blocks.append(_res_init(next(ks), cin, cout))
            elif kind == "attn":
                blocks.append(_attn_init(next(ks), cin))
            elif kind == "downsample2d":
                blocks.append(_conv2d_init(next(ks), 3, 3, cin, cout))
            elif kind == "downsample3d":
                blocks.append({
                    "resample": _conv2d_init(next(ks), 3, 3, cin, cout),
                    "time_conv": _conv3d_init(next(ks), 3, 1, 1, cout, cout),
                })
            elif kind == "upsample2d":
                blocks.append(_conv2d_init(next(ks), 3, 3, cin, cout))
            elif kind == "upsample3d":
                blocks.append({
                    "resample": _conv2d_init(next(ks), 3, 3, cin, cout),
                    "time_conv": _conv3d_init(next(ks), 3, 1, 1, cin, 2 * cin),
                })
        return blocks

    dec_struct, dec_in = _decoder_structure(cfg)
    final_dec_c = cfg.dim * cfg.dim_mult[::-1][-1]

    params = {
        "encoder": {
            "conv1": _conv3d_init(next(ks), 3, 3, 3, 3, cfg.dim),
            "downsamples": build(enc_struct),
            "middle": [
                _res_init(next(ks), enc_out, enc_out),
                _attn_init(next(ks), enc_out),
                _res_init(next(ks), enc_out, enc_out),
            ],
            "head_norm": _norm_init(enc_out),
            "head_conv": _conv3d_init(next(ks), 3, 3, 3, enc_out, 2 * cfg.z_dim),
        },
        "conv1": _conv3d_init(next(ks), 1, 1, 1, 2 * cfg.z_dim, 2 * cfg.z_dim),
        "conv2": _conv3d_init(next(ks), 1, 1, 1, cfg.z_dim, cfg.z_dim),
        "decoder": {
            "conv1": _conv3d_init(next(ks), 3, 3, 3, cfg.z_dim, dec_in),
            "middle": [
                _res_init(next(ks), dec_in, dec_in),
                _attn_init(next(ks), dec_in),
                _res_init(next(ks), dec_in, dec_in),
            ],
            "upsamples": build(dec_struct),
            "head_norm": _norm_init(final_dec_c),
            "head_conv": _conv3d_init(next(ks), 3, 3, 3, final_dec_c, 3),
        },
    }
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _run_blocks(structure, blocks, x):
    for (kind, cin, cout, _), p in zip(structure, blocks):
        if kind == "res":
            x = _residual_block(p, x)
        elif kind == "attn":
            x = _attention_block(p, x)
        elif kind == "downsample2d":
            x = _downsample_spatial(p, x)
        elif kind == "downsample3d":
            x = _downsample_spatial(p["resample"], x)
            x = _downsample_time(p["time_conv"], x)
        elif kind == "upsample2d":
            x = _upsample_spatial(p, x)
        elif kind == "upsample3d":
            x = _upsample_time(p["time_conv"], x)
            x = _upsample_spatial(p["resample"], x)
    return x


def _encode_raw(params, cfg: WanVAEConfig, video: jax.Array) -> jax.Array:
    enc = params["encoder"]
    x = causal_conv3d(enc["conv1"], video)
    structure, _ = _encoder_structure(cfg)
    x = _run_blocks(structure, enc["downsamples"], x)
    for i, p in enumerate(enc["middle"]):
        x = _attention_block(p, x) if i == 1 else _residual_block(p, x)
    x = wan_rms_norm(enc["head_norm"], x)
    x = jax.nn.silu(x)
    return causal_conv3d(enc["head_conv"], x)


def encode(params, cfg: WanVAEConfig, video: jax.Array,
           normalize: bool = True, any_end_frame: bool = False) -> jax.Array:
    """video [B, F, H, W, 3] in [-1, 1] -> latent mean [B, F', H/8, W/8, z].

    F must be 4k+1 (4k+2 with ``any_end_frame``). Returns the (optionally
    normalized) posterior mean, matching ``WanVAE_.encode``
    (``vae.py:536-575``). With ``any_end_frame`` the last frame is encoded
    INDEPENDENTLY (fresh causal state — the reference's ``feat_cache=None``
    branch for last-frame conditioning, ``vae.py:552-557``) and appended.
    """
    if any_end_frame:
        main = _encode_raw(params, cfg, video[:, :-1])
        last = _encode_raw(params, cfg, video[:, -1:])
        x = jnp.concatenate([main, last], axis=1)
    else:
        x = _encode_raw(params, cfg, video)
    x = causal_conv3d(params["conv1"], x)
    mu, log_var = jnp.split(x, 2, axis=-1)
    if normalize:
        # cast stats to the latent dtype (decode does): fp32 constants
        # would silently promote bf16 latents to fp32 downstream
        mean = jnp.asarray(WAN_LATENT_MEAN[: cfg.z_dim]).astype(mu.dtype)
        std = jnp.asarray(WAN_LATENT_STD[: cfg.z_dim]).astype(mu.dtype)
        mu = (mu - mean) / std
    return mu


def decode(params, cfg: WanVAEConfig, z: jax.Array,
           normalized: bool = True, any_end_frame: bool = False,
           clamp: bool = True) -> jax.Array:
    """latents [B, F', H', W', z] -> video [B, 1+4(F'-1), 8H', 8W', 3].

    With ``any_end_frame`` the last latent decodes independently to one
    frame (``vae.py:589-595``)."""
    if any_end_frame:
        main = decode(params, cfg, z[:, :-1], normalized, clamp=clamp)
        last = decode(params, cfg, z[:, -1:], normalized, clamp=clamp)
        return jnp.concatenate([main, last], axis=1)
    if normalized:
        mean = jnp.asarray(WAN_LATENT_MEAN[: cfg.z_dim]).astype(z.dtype)
        std = jnp.asarray(WAN_LATENT_STD[: cfg.z_dim]).astype(z.dtype)
        z = z * std + mean
    x = causal_conv3d(params["conv2"], z)
    dec = params["decoder"]
    x = causal_conv3d(dec["conv1"], x)
    for i, p in enumerate(dec["middle"]):
        x = _attention_block(p, x) if i == 1 else _residual_block(p, x)
    structure, _ = _decoder_structure(cfg)
    x = _run_blocks(structure, dec["upsamples"], x)
    x = wan_rms_norm(dec["head_norm"], x)
    x = jax.nn.silu(x)
    x = causal_conv3d(dec["head_conv"], x)
    # the reference clamps in the WanVAE wrapper AFTER (tiled) decode
    # (vae.py:825-829); per-tile clamping would distort blended seams
    return jnp.clip(x, -1.0, 1.0) if clamp else x


# ---------------------------------------------------------------------------
# Spatial tiling (``/root/reference/wan/modules/vae.py:611-704``): overlapping
# spatial tiles with linear crossfade blending — bounds decoder activation
# memory for high resolutions (the 832x480x81f decode materializes ~18 GB
# untiled on v5e).
# ---------------------------------------------------------------------------

def get_vae_tile_size(vae_config: int, device_mem_mb: float,
                      mixed_precision: bool = False) -> int:
    """Pixel tile size policy (``vae.py:789-811``): 0 = untiled."""
    if vae_config == 0:
        if mixed_precision:
            device_mem_mb = device_mem_mb / 2
        if device_mem_mb >= 24000:
            vae_config = 1
        elif device_mem_mb >= 8000:
            vae_config = 2
        else:
            vae_config = 3
    return {1: 0, 2: 256, 3: 128}[vae_config]


# per-tile jitted decode: the tile loop must stay on host so XLA never
# holds every tile's decoder intermediates live at once (one fused tiled
# decode graph OOMs 16 GB HBM at 832x480x81f)
_tile_decode = jax.jit(decode, static_argnums=(1, 3, 4, 5))


def spatial_tiled_decode(params, cfg: WanVAEConfig, z: jax.Array,
                         tile_size: int = 256, normalized: bool = True,
                         any_end_frame: bool = False) -> jax.Array:
    """Tiled ``decode`` with 25% overlap crossfade (``vae.py:623-664``).
    The reference hardcodes the 8x spatial factor; derive it from the
    config so reduced test VAEs tile correctly."""
    from ..ltx.vae_tiling import blend

    sf = 2 ** (len(cfg.dim_mult) - 1)
    lat_tile = tile_size // sf
    overlap = int(lat_tile * 0.75)
    blend_extent = int(tile_size * 0.25)
    row_limit = tile_size - blend_extent
    h_lat, w_lat = z.shape[2], z.shape[3]
    if h_lat <= lat_tile and w_lat <= lat_tile:
        return decode(params, cfg, z, normalized, any_end_frame)

    if normalized:
        mean = jnp.asarray(WAN_LATENT_MEAN[: cfg.z_dim]).astype(z.dtype)
        std = jnp.asarray(WAN_LATENT_STD[: cfg.z_dim]).astype(z.dtype)
        z = z * std + mean

    rows = []
    prev = None
    for i in range(0, h_lat, overlap):
        row = []
        for j in range(0, w_lat, overlap):
            tile = z[:, :, i: i + lat_tile, j: j + lat_tile]
            if prev is not None:
                # zero-valued data dependency on the previous tile's
                # output: when the whole loop is traced into one jit
                # (spatial_tiled_decode_fused) this forces XLA to
                # SEQUENCE the tile decodes, so peak memory stays at
                # one tile's intermediates (an unordered fused graph
                # OOMs 16 GB HBM at 832x480x81f)
                tok = (jnp.nan_to_num(prev[(0,) * prev.ndim]) * 0).astype(tile.dtype)
                tile = tile + tok
            prev = _tile_decode(params, cfg, tile, False,
                                any_end_frame, False)
            row.append(prev)
        rows.append(row)
    result_rows = []
    for i, row in enumerate(rows):
        out_row = []
        for j, tile in enumerate(row):
            # the reference blends in place, so neighbors are the already-
            # blended tiles — mirror that by writing back into the grid
            if i > 0:
                tile = blend(rows[i - 1][j], tile, blend_extent, axis=2)
            if j > 0:
                tile = blend(row[j - 1], tile, blend_extent, axis=3)
            row[j] = tile
            out_row.append(tile[:, :, :row_limit, :row_limit])
        result_rows.append(jnp.concatenate(out_row, axis=3))
    return jnp.clip(jnp.concatenate(result_rows, axis=2), -1.0, 1.0)


def parallel_spatial_tiled_decode(mesh, params, cfg: WanVAEConfig,
                                  z: jax.Array, tile_size: int = 256,
                                  normalized: bool = True,
                                  any_end_frame: bool = False) -> jax.Array:
    """``spatial_tiled_decode`` with the tile grid fanned out over every
    device of the serving mesh (the LTX twin is
    ``ltx/vae_tiling.parallel_tiled_decode``). Tail tiles are made
    uniform by edge-replicate padding; each device runs its share
    sequentially (``lax.map``) so per-device peak memory stays at one
    tile's intermediates. Meant to run under jit on a multi-chip
    deployment where the one-time fused compile amortizes (the
    single-chip path deliberately stays an eager host loop — see
    ``pipelines/wan.py::_vae_decode``)."""
    from ..ltx.vae_tiling import parallel_spatial_map

    sf = 2 ** (len(cfg.dim_mult) - 1)
    lat_tile = tile_size // sf
    h_lat, w_lat = z.shape[2], z.shape[3]
    if (mesh is None or mesh.devices.size == 1
            or (h_lat <= lat_tile and w_lat <= lat_tile)):
        return spatial_tiled_decode(params, cfg, z, tile_size, normalized,
                                    any_end_frame)
    if normalized:
        mean = jnp.asarray(WAN_LATENT_MEAN[: cfg.z_dim]).astype(z.dtype)
        std = jnp.asarray(WAN_LATENT_STD[: cfg.z_dim]).astype(z.dtype)
        z = z * std + mean

    def tile_fn(tile, params):
        return decode(params, cfg, tile, False, any_end_frame, False)

    full = parallel_spatial_map(
        mesh, tile_fn, z, lat_tile, tile_size, 0.25, extra_args=(params,),
    )
    return jnp.clip(full[:, :, : h_lat * sf, : w_lat * sf], -1.0, 1.0)


# fused multi-chip decode: mesh and cfg are static; one compile per
# (mesh, latent shape, tile size), amortized by the persistent cache
parallel_spatial_tiled_decode_fused = jax.jit(
    parallel_spatial_tiled_decode,
    static_argnums=(0, 2),
    static_argnames=("tile_size", "normalized", "any_end_frame"),
)


_tile_encode = jax.jit(encode, static_argnums=(1, 3, 4))


def spatial_tiled_encode(params, cfg: WanVAEConfig, video: jax.Array,
                         tile_size: int = 256, normalize: bool = True,
                         any_end_frame: bool = False) -> jax.Array:
    """Tiled ``encode`` with 25% overlap crossfade (``vae.py:667-704``)."""
    from ..ltx.vae_tiling import blend

    sf = 2 ** (len(cfg.dim_mult) - 1)
    lat_tile = tile_size // sf
    overlap = int(tile_size * 0.75)
    blend_extent = int(lat_tile * 0.25)
    row_limit = lat_tile - blend_extent
    h, w = video.shape[2], video.shape[3]
    if h <= tile_size and w <= tile_size:
        return encode(params, cfg, video, normalize, any_end_frame)

    rows = []
    prev = None
    for i in range(0, h, overlap):
        row = []
        for j in range(0, w, overlap):
            tile = video[:, :, i: i + tile_size, j: j + tile_size]
            if prev is not None:
                # sequencing dependency — see spatial_tiled_decode
                tok = (jnp.nan_to_num(prev[(0,) * prev.ndim]) * 0).astype(tile.dtype)
                tile = tile + tok
            prev = _tile_encode(params, cfg, tile, False, any_end_frame)
            row.append(prev)
        rows.append(row)
    result_rows = []
    for i, row in enumerate(rows):
        out_row = []
        for j, tile in enumerate(row):
            if i > 0:
                tile = blend(rows[i - 1][j], tile, blend_extent, axis=2)
            if j > 0:
                tile = blend(row[j - 1], tile, blend_extent, axis=3)
            row[j] = tile
            out_row.append(tile[:, :, :row_limit, :row_limit])
        result_rows.append(jnp.concatenate(out_row, axis=3))
    mu = jnp.concatenate(result_rows, axis=2)
    if normalize:
        mean = jnp.asarray(WAN_LATENT_MEAN[: cfg.z_dim])
        std = jnp.asarray(WAN_LATENT_STD[: cfg.z_dim])
        mu = (mu - mean) / std
    return mu


# Fused whole-call jits: the tile loops above unroll at trace time, so a
# full spatial-tiled encode/decode — every tile model call and crossfade
# blend — compiles into ONE XLA dispatch instead of dozens of eager
# relay round-trips. The zero-valued inter-tile data dependency in the
# loops forces XLA to sequence tile decodes, keeping peak HBM at
# one-tile scale (an unordered fused graph OOMs 16 GB at 832x480x81f).
spatial_tiled_decode_fused = jax.jit(
    spatial_tiled_decode,
    static_argnames=("cfg", "tile_size", "normalized", "any_end_frame"),
)
spatial_tiled_encode_fused = jax.jit(
    spatial_tiled_encode,
    static_argnames=("cfg", "tile_size", "normalize", "any_end_frame"),
)
