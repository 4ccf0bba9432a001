"""XLM-Roberta text encoder (CLIP text tower), TPU-native.

Parity target: ``/root/reference/wan/modules/xlm_roberta.py`` — token +
type + position embeddings (positions = pad_id + cumsum of the pad mask),
post-norm attention blocks, final output; plus the projection head variant
``XLMRobertaWithHead`` (``clip.py:303-327``). Not reached by the fork's
serving paths (only ``CLIPModel.visual`` is used for i2v) but completes
the CLIP module for text-similarity use.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ...ops.attention import attention as mha
from ...ops.norms import layer_norm


@dataclasses.dataclass(frozen=True)
class XLMRobertaConfig:
    vocab_size: int = 250002
    max_seq_len: int = 514
    type_size: int = 1
    pad_id: int = 1
    dim: int = 1024
    num_heads: int = 16
    num_layers: int = 24
    post_norm: bool = True
    eps: float = 1e-5
    head_out_dim: int = 0  # >0: XLMRobertaWithHead projection


def init_params(key: jax.Array, cfg: XLMRobertaConfig) -> dict:
    ks = iter(jax.random.split(key, 8))
    d = cfg.dim

    def lin(k, din, dout):
        return {
            "kernel": jax.random.normal(k, (din, dout)) * din**-0.5,
            "bias": jnp.zeros((dout,)),
        }

    def norm():
        return {"weight": jnp.ones((d,)), "bias": jnp.zeros((d,))}

    def block(k):
        kk = iter(jax.random.split(k, 8))
        return {
            "attn": {
                "q": lin(next(kk), d, d), "k": lin(next(kk), d, d),
                "v": lin(next(kk), d, d), "o": lin(next(kk), d, d),
            },
            "norm1": norm(),
            "ffn": {
                "fc1": lin(next(kk), d, 4 * d),
                "fc2": lin(next(kk), 4 * d, d),
            },
            "norm2": norm(),
        }

    blocks = jax.vmap(block)(jax.random.split(next(ks), cfg.num_layers))
    params = {
        "token_embedding": jax.random.normal(next(ks), (cfg.vocab_size, d))
        * 0.02,
        "type_embedding": jax.random.normal(next(ks), (cfg.type_size, d))
        * 0.02,
        "pos_embedding": jax.random.normal(next(ks), (cfg.max_seq_len, d))
        * 0.02,
        "norm": norm(),
        "blocks": blocks,
    }
    if cfg.head_out_dim:
        # two-layer GELU head, no biases (``clip.py:310-314``)
        mid = (d + cfg.head_out_dim) // 2
        k = next(ks)
        params["head"] = {
            "fc1": {"kernel": jax.random.normal(
                jax.random.fold_in(k, 0), (d, mid)) * d**-0.5},
            "fc2": {"kernel": jax.random.normal(
                jax.random.fold_in(k, 1), (mid, cfg.head_out_dim)) * mid**-0.5},
        }
    return params


def _lin(p, x):
    return x @ p["kernel"].astype(x.dtype) + p["bias"].astype(x.dtype)


def encode(params: dict, cfg: XLMRobertaConfig, ids: jax.Array) -> jax.Array:
    """ids [B, L] int32 -> features [B, L, dim]."""
    b, s = ids.shape
    mask = (ids != cfg.pad_id).astype(jnp.int32)
    positions = cfg.pad_id + jnp.cumsum(mask, axis=1) * mask
    x = (
        params["token_embedding"][ids]
        + params["type_embedding"][jnp.zeros_like(ids)]
        + params["pos_embedding"][positions]
    ).astype(jnp.float32)
    if cfg.post_norm:
        x = layer_norm(x, params["norm"]["weight"], params["norm"]["bias"],
                       eps=cfg.eps)

    n, hd = cfg.num_heads, cfg.dim // cfg.num_heads
    kv_seg = mask

    def body(x, p):
        def attn(h):
            q = _lin(p["attn"]["q"], h).reshape(b, s, n, hd)
            k = _lin(p["attn"]["k"], h).reshape(b, s, n, hd)
            v = _lin(p["attn"]["v"], h).reshape(b, s, n, hd)
            out = mha(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3),
                jnp.ones((b, s), jnp.int32), kv_seg,
            ).transpose(0, 2, 1, 3).reshape(b, s, cfg.dim)
            return _lin(p["attn"]["o"], out)

        def ffn(h):
            h = _lin(p["ffn"]["fc1"], h)
            h = jax.nn.gelu(h, approximate=False)
            return _lin(p["ffn"]["fc2"], h)

        if cfg.post_norm:
            x = layer_norm(x + attn(x), p["norm1"]["weight"],
                           p["norm1"]["bias"], eps=cfg.eps)
            x = layer_norm(x + ffn(x), p["norm2"]["weight"],
                           p["norm2"]["bias"], eps=cfg.eps)
        else:
            x = x + attn(layer_norm(x, p["norm1"]["weight"],
                                    p["norm1"]["bias"], eps=cfg.eps))
            x = x + ffn(layer_norm(x, p["norm2"]["weight"],
                                   p["norm2"]["bias"], eps=cfg.eps))
        return x, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    if not cfg.post_norm:
        x = layer_norm(x, params["norm"]["weight"], params["norm"]["bias"],
                       eps=cfg.eps)
    return x


def encode_with_head(params: dict, cfg: XLMRobertaConfig, ids: jax.Array):
    """XLMRobertaWithHead (``clip.py:303-327``): masked mean pool + gelu
    projection head -> text embedding [B, head_out_dim]."""
    x = encode(params, cfg, ids)
    mask = (ids != cfg.pad_id).astype(x.dtype)[..., None]
    pooled = (x * mask).sum(axis=1) / jnp.maximum(mask.sum(axis=1), 1.0)
    assert "head" in params, "config needs head_out_dim > 0"
    h = pooled @ params["head"]["fc1"]["kernel"].astype(pooled.dtype)
    h = jax.nn.gelu(h, approximate=False)
    return h @ params["head"]["fc2"]["kernel"].astype(h.dtype)
