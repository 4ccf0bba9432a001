"""CLIP ViT-H/14 vision encoder for Wan i2v conditioning, TPU-native.

Parity target: the vision tower of ``XLMRobertaCLIP`` at
``/root/reference/wan/modules/clip.py`` — ``VisionTransformer``
(``:209-300``), pre-norm blocks with GELU MLPs (``:112-153``), and the i2v
usage ``CLIPModel.visual`` (``:535-549``): bicubic-resized 224x224 first
frame, CLIP normalization, penultimate-block features (``use_31_block``)
giving ``[B, 257, 1280]``.

The text tower (XLM-Roberta) is not reached by the serving paths of the
reference fork and is omitted; checkpoint conversion accepts full
open-clip state dicts and takes the visual weights.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.attention import attention as mha
from ...ops.norms import layer_norm

# open-clip ViT-H/14 image normalization (the ``transforms.transforms[-1]``
# the reference applies in ``CLIPModel.visual``)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    dim: int = 1280
    mlp_ratio: int = 4
    num_heads: int = 16
    num_layers: int = 32
    activation: str = "gelu"  # vit-h/14 config (``clip.py:483``)
    norm_eps: float = 1e-5

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


def init_params(key: jax.Array, cfg: CLIPVisionConfig) -> dict:
    ks = iter(jax.random.split(key, 8))
    d = cfg.dim
    gain = d**-0.5

    def lin(k, din, dout):
        return {
            "kernel": jax.random.normal(k, (din, dout)) * din**-0.5,
            "bias": jnp.zeros((dout,)),
        }

    def block(k):
        kk = iter(jax.random.split(k, 4))
        return {
            "norm1": {"weight": jnp.ones((d,)), "bias": jnp.zeros((d,))},
            "attn": {
                "to_qkv": lin(next(kk), d, 3 * d),
                "proj": lin(next(kk), d, d),
            },
            "norm2": {"weight": jnp.ones((d,)), "bias": jnp.zeros((d,))},
            "mlp": {
                "fc1": lin(next(kk), d, d * cfg.mlp_ratio),
                "fc2": lin(next(kk), d * cfg.mlp_ratio, d),
            },
        }

    blocks = jax.vmap(block)(jax.random.split(next(ks), cfg.num_layers))
    return {
        "patch_embedding": {
            "kernel": jax.random.normal(
                next(ks), (cfg.patch_size, cfg.patch_size, 3, d)
            ) * (3 * cfg.patch_size**2) ** -0.5,
        },
        "cls_embedding": gain * jax.random.normal(next(ks), (1, 1, d)),
        "pos_embedding": gain * jax.random.normal(
            next(ks), (1, cfg.num_patches + 1, d)
        ),
        "pre_norm": {"weight": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "blocks": blocks,
    }


def _block(cfg, p, x):
    # pre-norm: x + attn(norm1(x)); x + mlp(norm2(x))
    b, s, d = x.shape
    n = cfg.num_heads
    hd = d // n
    h = layer_norm(x, p["norm1"]["weight"], p["norm1"]["bias"], eps=cfg.norm_eps)
    qkv = h @ p["attn"]["to_qkv"]["kernel"].astype(h.dtype) + \
        p["attn"]["to_qkv"]["bias"].astype(h.dtype)
    q, k, v = [
        t.reshape(b, s, n, hd).transpose(0, 2, 1, 3)
        for t in jnp.split(qkv, 3, axis=-1)
    ]
    a = mha(q, k, v).transpose(0, 2, 1, 3).reshape(b, s, d)
    a = a @ p["attn"]["proj"]["kernel"].astype(a.dtype) + \
        p["attn"]["proj"]["bias"].astype(a.dtype)
    x = x + a
    h = layer_norm(x, p["norm2"]["weight"], p["norm2"]["bias"], eps=cfg.norm_eps)
    h = h @ p["mlp"]["fc1"]["kernel"].astype(h.dtype) + \
        p["mlp"]["fc1"]["bias"].astype(h.dtype)
    if cfg.activation == "quick_gelu":
        h = h * jax.nn.sigmoid(1.702 * h)
    else:
        h = jax.nn.gelu(h, approximate=False)
    h = h @ p["mlp"]["fc2"]["kernel"].astype(h.dtype) + \
        p["mlp"]["fc2"]["bias"].astype(h.dtype)
    return x + h


def visual(
    params: dict,
    cfg: CLIPVisionConfig,
    images: jax.Array,           # [B, H, W, 3] in [-1, 1]
    use_31_block: bool = True,
) -> jax.Array:
    """i2v feature extraction: resize is the caller's job (224x224 bicubic);
    normalization + penultimate-block forward happen here. Returns
    ``[B, 257, dim]``."""
    x = (images + 1.0) / 2.0
    x = (x - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)
    x = x.astype(images.dtype)

    patches = jax.lax.conv_general_dilated(
        x, params["patch_embedding"]["kernel"].astype(x.dtype),
        (cfg.patch_size, cfg.patch_size), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    b = x.shape[0]
    tokens = patches.reshape(b, -1, cfg.dim)
    cls = jnp.broadcast_to(
        params["cls_embedding"].astype(x.dtype), (b, 1, cfg.dim)
    )
    x = jnp.concatenate([cls, tokens], axis=1)
    x = x + params["pos_embedding"].astype(x.dtype)
    x = layer_norm(
        x, params["pre_norm"]["weight"], params["pre_norm"]["bias"],
        eps=cfg.norm_eps,
    )

    n_layers = cfg.num_layers - 1 if use_31_block else cfg.num_layers

    def body(x, lp):
        return _block(cfg, lp, x), None

    blocks = jax.tree.map(lambda a: a[:n_layers], params["blocks"])
    x, _ = jax.lax.scan(body, x, blocks)
    return x


def resize_bicubic(image: jax.Array, size: int) -> jax.Array:
    """Host-free bicubic resize to [size, size].

    ``antialias=False`` matches the reference's
    ``F.interpolate(mode='bicubic', align_corners=False)`` (torch does
    not antialias by default) — jax.image's default antialias widens the
    kernel on downscale and shifts CLIP features off parity."""
    return jax.image.resize(
        image, (image.shape[0], size, size, image.shape[-1]),
        method="bicubic", antialias=False,
    )
