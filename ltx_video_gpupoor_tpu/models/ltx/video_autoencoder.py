"""Legacy (non-causal) video VAE for pre-0.9.6 LTX checkpoints.

Parity target: ``VideoAutoencoder`` at
``/root/reference/ltx_video/models/autoencoders/video_autoencoder.py`` —
block_out_channels stage list, DownEncoderBlock3D / UNetMidBlock3D /
UpDecoderBlock3D, asymmetric-padded stride-2 ``Downsample3D``
(``:773-810``), nearest-neighbor ``Upsample3D`` (``:812-880``), pixel
patchify with optional channel padding (``:882-940``), and the
``make_conv_nd`` dims variants (``conv_nd_factory.py:9-72``): 3 = full 3-D
conv, (2, 1) = DualConv3d (spatial 2-D + temporal 1-D factorization,
``dual_conv3d.py:97-182``), 2 = per-frame 2-D conv.

Layout channels-last [B, F, H, W, C]; kernels [kt, kh, kw, cin, cout]
(for dims=(2,1): conv1 [1, k, k, cin, cout], conv2 [k, 1, 1, cout, cout]).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Union

import jax
import jax.numpy as jnp
from einops import rearrange

from ...ops.norms import group_norm, pixel_norm

Dims = Union[int, tuple]


# ---------------------------------------------------------------------------
# conv_nd: the reference's make_conv_nd variants
# ---------------------------------------------------------------------------

def _conv3d_same(p, x, stride=(1, 1, 1), padding="SAME"):
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), stride, padding,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def conv_nd(
    dims: Dims, p: dict, x: jax.Array,
    stride: int = 1, same_pad: bool = True, skip_time_conv: bool = False,
) -> jax.Array:
    """Apply a conv in the reference's dims convention."""
    pad = "SAME" if same_pad else "VALID"
    if dims == 3:
        return _conv3d_same(p, x, (stride,) * 3, pad)
    if dims == (2, 1):
        # spatial conv (stride on H/W)
        y = _conv3d_same(
            {"kernel": p["kernel1"], "bias": p["bias1"]},
            x, (1, stride, stride), pad,
        )
        if skip_time_conv:
            return y
        return _conv3d_same(
            {"kernel": p["kernel2"], "bias": p["bias2"]},
            y, (stride, 1, 1), pad,
        )
    if dims == 2:
        b, f = x.shape[:2]
        flat = x.reshape((b * f,) + x.shape[2:])
        y = jax.lax.conv_general_dilated(
            flat, p["kernel"].astype(x.dtype), (stride, stride), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        if "bias" in p:
            y = y + p["bias"].astype(y.dtype)
        return y.reshape((b, f) + y.shape[1:])
    raise ValueError(f"dims must be 2, 3 or (2, 1); got {dims}")


def conv_nd_init(key, dims: Dims, cin: int, cout: int, k: int = 3) -> dict:
    if dims == (2, 1):
        k1, k2 = jax.random.split(key)
        return {
            "kernel1": jax.random.normal(k1, (1, k, k, cin, cout))
            * (k * k * cin) ** -0.5,
            "bias1": jnp.zeros((cout,)),
            "kernel2": jax.random.normal(k2, (k, 1, 1, cout, cout))
            * (k * cout) ** -0.5,
            "bias2": jnp.zeros((cout,)),
        }
    if dims == 2:
        return {
            "kernel": jax.random.normal(key, (k, k, cin, cout))
            * (k * k * cin) ** -0.5,
            "bias": jnp.zeros((cout,)),
        }
    return {
        "kernel": jax.random.normal(key, (k, k, k, cin, cout))
        * (k**3 * cin) ** -0.5,
        "bias": jnp.zeros((cout,)),
    }


def linear_nd_init(key, cin, cout):
    return {
        "kernel": jax.random.normal(key, (cin, cout)) * cin**-0.5,
        "bias": jnp.zeros((cout,)),
    }


# ---------------------------------------------------------------------------
# Config / init
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class LegacyVAEConfig:
    dims: Any = 3
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 128
    block_out_channels: tuple = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    patch_size: int = 1
    patch_size_t: Optional[int] = None
    norm_layer: str = "group_norm"
    latent_log_var: str = "per_channel"
    use_quant_conv: bool = True
    add_channel_padding: bool = False

    @staticmethod
    def from_dict(cfg: dict) -> "LegacyVAEConfig":
        dims = cfg["dims"]
        if isinstance(dims, list):
            dims = tuple(dims)
        double_z = cfg.get("double_z", True)
        llv = cfg.get(
            "latent_log_var", "per_channel" if double_z else "none"
        )
        if cfg.get("use_quant_conv", True) and llv == "uniform":
            # reference config validation (``video_autoencoder.py:76-77``)
            raise ValueError(
                "uniform latent_log_var requires use_quant_conv=False"
            )
        return LegacyVAEConfig(
            dims=dims,
            in_channels=cfg.get("in_channels", 3),
            out_channels=cfg.get("out_channels", 3),
            latent_channels=cfg["latent_channels"],
            block_out_channels=tuple(cfg["block_out_channels"]),
            layers_per_block=cfg.get("layers_per_block", 2),
            norm_num_groups=cfg.get("norm_num_groups", 32),
            patch_size=cfg.get("patch_size", 1),
            patch_size_t=cfg.get("patch_size_t"),
            norm_layer=cfg.get("norm_layer", "group_norm"),
            latent_log_var=cfg.get(
                "latent_log_var", "per_channel" if double_z else "none"
            ),
            use_quant_conv=cfg.get("use_quant_conv", True),
            add_channel_padding=cfg.get("add_channel_padding", False),
        )

    @property
    def pst(self) -> int:
        return self.patch_size_t if self.patch_size_t else self.patch_size

    def encoder_in_channels(self) -> int:
        if self.add_channel_padding:
            return self.in_channels * self.patch_size**3
        return self.in_channels * self.pst * self.patch_size**2

    @property
    def _num_downsamples(self) -> int:
        n = len(self.block_out_channels)
        return sum(
            1 for i in range(n) if i != n - 1 and 2**i >= self.patch_size
        )

    @property
    def spatial_downscale_factor(self) -> int:
        return 2**self._num_downsamples * self.patch_size

    @property
    def temporal_downscale_factor(self) -> int:
        # dims=3 / (2,1) downsamples stride time as well (when in_time);
        # pure 2-D configs never stride the time axis
        if self.dims == 2:
            return self.pst
        return 2**self._num_downsamples * self.pst

    # the legacy decoder has no timestep conditioning / injected noise
    timestep_conditioning = False


def _resnet_init(key, cfg, dims, cin, cout):
    ks = iter(jax.random.split(key, 4))
    p = {
        "conv1": conv_nd_init(next(ks), dims, cin, cout),
        "conv2": conv_nd_init(next(ks), dims, cout, cout),
    }
    if cfg.norm_layer == "group_norm":
        p["norm1"] = {"weight": jnp.ones((cin,)), "bias": jnp.zeros((cin,))}
        p["norm2"] = {"weight": jnp.ones((cout,)), "bias": jnp.zeros((cout,))}
    if cin != cout:
        p["conv_shortcut"] = linear_nd_init(next(ks), cin, cout)
    return p


def init_params(key: jax.Array, cfg: LegacyVAEConfig) -> dict:
    ks = iter(jax.random.split(key, 256))
    dims = cfg.dims
    boc = cfg.block_out_channels

    def stage(cin, cout, n, downsample):
        blocks = []
        cur = cin
        for _ in range(n):
            blocks.append(_resnet_init(next(ks), cfg, dims, cur, cout))
            cur = cout
        p = {"res_blocks": blocks}
        if downsample:
            p["downsample"] = conv_nd_init(next(ks), dims, cout, cout)
        return p

    enc: dict[str, Any] = {
        "conv_in": conv_nd_init(
            next(ks), dims, cfg.encoder_in_channels(), boc[0]
        ),
        "down_blocks": [],
    }
    out_ch = boc[0]
    for i, ch in enumerate(boc):
        add_down = i != len(boc) - 1 and 2**i >= cfg.patch_size
        enc["down_blocks"].append(stage(out_ch, ch, cfg.layers_per_block,
                                        add_down))
        out_ch = ch
    enc["mid_block"] = {
        "res_blocks": [
            _resnet_init(next(ks), cfg, dims, boc[-1], boc[-1])
            for _ in range(cfg.layers_per_block)
        ]
    }
    if cfg.norm_layer == "group_norm":
        enc["conv_norm_out"] = {
            "weight": jnp.ones((boc[-1],)), "bias": jnp.zeros((boc[-1],))
        }
    conv_out_ch = cfg.latent_channels
    if cfg.latent_log_var == "per_channel":
        conv_out_ch *= 2
    elif cfg.latent_log_var == "uniform":
        conv_out_ch += 1
    enc["conv_out"] = conv_nd_init(next(ks), dims, boc[-1], conv_out_ch)

    rev = tuple(reversed(boc))
    dec: dict[str, Any] = {
        "conv_in": conv_nd_init(next(ks), dims, cfg.latent_channels, rev[0]),
        "mid_block": {
            "res_blocks": [
                _resnet_init(next(ks), cfg, dims, rev[0], rev[0])
                for _ in range(cfg.layers_per_block)
            ]
        },
        "up_blocks": [],
    }
    prev = rev[0]
    for i, ch in enumerate(rev):
        add_up = (
            i != len(boc) - 1 and 2 ** (len(boc) - i - 1) > cfg.patch_size
        )
        blocks = []
        cur = prev
        for _ in range(cfg.layers_per_block + 1):
            blocks.append(_resnet_init(next(ks), cfg, dims, cur, ch))
            cur = ch
        p = {"res_blocks": blocks}
        if add_up:
            p["upsample"] = conv_nd_init(next(ks), dims, ch, ch)
        dec["up_blocks"].append(p)
        prev = ch
    if cfg.norm_layer == "group_norm":
        dec["conv_norm_out"] = {
            "weight": jnp.ones((boc[0],)), "bias": jnp.zeros((boc[0],))
        }
    dec_out = (
        cfg.out_channels * cfg.patch_size**3 if cfg.add_channel_padding
        else cfg.out_channels * cfg.pst * cfg.patch_size**2
    )
    dec["conv_out"] = conv_nd_init(next(ks), dims, boc[0], dec_out)

    params: dict[str, Any] = {"encoder": enc, "decoder": dec}
    if cfg.use_quant_conv:
        params["quant_conv"] = linear_nd_init(
            next(ks), 2 * cfg.latent_channels, 2 * cfg.latent_channels
        )
        params["post_quant_conv"] = linear_nd_init(
            next(ks), cfg.latent_channels, cfg.latent_channels
        )
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _norm(cfg, p, x):
    if cfg.norm_layer == "group_norm":
        return group_norm(x, cfg.norm_num_groups, p["weight"], p["bias"],
                          eps=1e-6, channel_axis=-1)
    return pixel_norm(x, axis=-1)


def _resnet(cfg, dims, p, x):
    h = _norm(cfg, p.get("norm1"), x) if "norm1" in p else pixel_norm(x, -1)
    h = jax.nn.silu(h)
    h = conv_nd(dims, p["conv1"], h)
    h = _norm(cfg, p.get("norm2"), h) if "norm2" in p else pixel_norm(h, -1)
    h = jax.nn.silu(h)
    h = conv_nd(dims, p["conv2"], h)
    sc = x
    if "conv_shortcut" in p:
        sc = x @ p["conv_shortcut"]["kernel"].astype(x.dtype) + \
            p["conv_shortcut"]["bias"].astype(x.dtype)
    return sc + h


def _downsample(cfg, dims, p, x, in_time: bool):
    """Asymmetric (right/bottom/late) zero pad + stride-2 VALID conv
    (``video_autoencoder.py:796-810`` with padding=0)."""
    pads = [(0, 0), (0, 1 if in_time and dims != 2 else 0), (0, 1), (0, 1),
            (0, 0)]
    x = jnp.pad(x, pads)
    if dims == (2, 1) and not in_time:
        return conv_nd(dims, p, x, stride=2, same_pad=False,
                       skip_time_conv=True)
    if dims == (2, 1):
        # spatial stride then temporal stride, both VALID after the pad
        y = _conv3d_same(
            {"kernel": p["kernel1"], "bias": p["bias1"]}, x, (1, 2, 2),
            "VALID",
        )
        return _conv3d_same(
            {"kernel": p["kernel2"], "bias": p["bias2"]}, y, (2, 1, 1),
            "VALID",
        )
    return conv_nd(dims, p, x, stride=2, same_pad=False)


def _upsample(cfg, dims, p, x, in_time: bool):
    x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
    if dims != 2 and in_time:
        x = jnp.repeat(x, 2, axis=1)
    skip_t = dims == (2, 1) and not in_time
    return conv_nd(dims, p, x, skip_time_conv=skip_t)


def pixel_patchify(x, q: int, p_t: int = 1, add_channel_padding=False):
    if q == 1 and p_t == 1:
        return x
    y = rearrange(
        x, "b (f p) (h q) (w r) c -> b f h w (c p r q)", p=p_t, q=q, r=q
    )
    if q > p_t and (p_t > 1 or add_channel_padding):
        target = y.shape[-1] * (q // p_t)
        # the reference PREPENDS the zero channels (``torch.cat([zeros,
        # x], dim=1)``, ``video_autoencoder.py:892-901``) — appending
        # would feed real pixels to kernel slices trained on zeros
        y = jnp.concatenate(
            [jnp.zeros(y.shape[:-1] + (target - y.shape[-1],), y.dtype), y],
            axis=-1,
        )
    return y


def pixel_unpatchify(x, q: int, p_t: int = 1, out_channels: int = 3,
                     add_channel_padding=False):
    if q == 1 and p_t == 1:
        return x
    real = out_channels * p_t * q * q
    x = x[..., :real]
    return rearrange(
        x, "b f h w (c p r q) -> b (f p) (h q) (w r) c", p=p_t, q=q, r=q
    )


def encode(params, cfg: LegacyVAEConfig, media: jax.Array) -> jax.Array:
    dims = cfg.dims
    in_time = media.shape[1] != 1
    pst = cfg.pst if in_time else 1
    x = pixel_patchify(media, cfg.patch_size, pst, cfg.add_channel_padding)
    enc = params["encoder"]
    x = conv_nd(dims, enc["conv_in"], x)
    for stage in enc["down_blocks"]:
        for rp in stage["res_blocks"]:
            x = _resnet(cfg, dims, rp, x)
        if "downsample" in stage:
            x = _downsample(cfg, dims, stage["downsample"], x, in_time)
    for rp in enc["mid_block"]["res_blocks"]:
        x = _resnet(cfg, dims, rp, x)
    x = _norm(cfg, enc.get("conv_norm_out"), x) \
        if "conv_norm_out" in enc else pixel_norm(x, -1)
    x = jax.nn.silu(x)
    x = conv_nd(dims, enc["conv_out"], x)
    if cfg.latent_log_var == "uniform":
        last = x[..., -1:]
        rep = jnp.repeat(last, x.shape[-1] - 2, axis=-1)
        x = jnp.concatenate([x, rep], axis=-1)
    if cfg.use_quant_conv and "quant_conv" in params:
        x = x @ params["quant_conv"]["kernel"].astype(x.dtype) + \
            params["quant_conv"]["bias"].astype(x.dtype)
    return x


def decode(params, cfg: LegacyVAEConfig, z: jax.Array,
           target_frames: Optional[int] = None) -> jax.Array:
    dims = cfg.dims
    in_time = (
        True if target_frames is None else z.shape[1] < target_frames
    )
    if cfg.use_quant_conv and "post_quant_conv" in params:
        z = z @ params["post_quant_conv"]["kernel"].astype(z.dtype) + \
            params["post_quant_conv"]["bias"].astype(z.dtype)
    dec = params["decoder"]
    x = conv_nd(dims, dec["conv_in"], z)
    for rp in dec["mid_block"]["res_blocks"]:
        x = _resnet(cfg, dims, rp, x)
    for stage in dec["up_blocks"]:
        for rp in stage["res_blocks"]:
            x = _resnet(cfg, dims, rp, x)
        if "upsample" in stage:
            x = _upsample(cfg, dims, stage["upsample"], x, in_time)
    x = _norm(cfg, dec.get("conv_norm_out"), x) \
        if "conv_norm_out" in dec else pixel_norm(x, -1)
    x = jax.nn.silu(x)
    x = conv_nd(dims, dec["conv_out"], x)
    pst = cfg.pst if in_time else 1
    return pixel_unpatchify(
        x, cfg.patch_size, pst, cfg.out_channels, cfg.add_channel_padding
    )
