"""T5 / UMT5 text encoder, TPU-native.

Parity target: the from-scratch UMT5 implementation at
``/root/reference/wan/modules/t5.py`` (relative position buckets
``:221-265``, T5LayerNorm ``:53-66``, gated-GELU feed-forward ``:126-144``,
encoder stack ``:267-330``, ``umt5_xxl`` config ``:456-469``) — which also
covers the LTX T5-XXL encoder (same architecture with a single shared
relative-position bias, as in google/t5-v1.1-xxl).

Differences from a torch port: layers are stacked and scanned (one
compilation for 24 layers), attention uses the framework flash kernel with
the position bias folded in via the XLA path (T5 needs an additive bias, so
the unfused path is used for the 512-token text encode — it is a tiny cost
next to the DiT), and everything is pure functions over a param pytree.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.norms import rms_norm


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 256384
    dim: int = 4096
    dim_attn: int = 4096
    dim_ffn: int = 10240
    num_heads: int = 64
    num_layers: int = 24
    num_buckets: int = 32
    shared_pos: bool = False  # False = UMT5 (per-layer), True = T5 v1.1
    max_dist: int = 128


UMT5_XXL = T5Config()
# google/t5-v1.1-xxl (LTX text encoder): shared relative bias
T5_XXL = T5Config(vocab_size=32128, shared_pos=True)


def relative_position_bucket(
    rel_pos: jax.Array, num_buckets: int = 32, max_dist: int = 128,
    bidirectional: bool = True,
) -> jax.Array:
    """T5 relative-position bucketing (``t5.py:246-265``)."""
    if bidirectional:
        half = num_buckets // 2
        rel_buckets = (rel_pos > 0).astype(jnp.int32) * half
        rel_pos = jnp.abs(rel_pos)
        nb = half
    else:
        rel_buckets = jnp.zeros_like(rel_pos)
        rel_pos = -jnp.minimum(rel_pos, 0)
        nb = num_buckets
    max_exact = nb // 2
    large = max_exact + (
        jnp.log(jnp.maximum(rel_pos, 1).astype(jnp.float32) / max_exact)
        / math.log(max_dist / max_exact) * (nb - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, nb - 1)
    return rel_buckets + jnp.where(rel_pos < max_exact, rel_pos, large)


def relative_bias(
    embedding: jax.Array, lq: int, lk: int, num_buckets: int, max_dist: int
) -> jax.Array:
    """[num_buckets, H] embedding -> [1, H, Lq, Lk] additive bias."""
    rel = jnp.arange(lk)[None, :] - jnp.arange(lq)[:, None]
    buckets = relative_position_bucket(rel, num_buckets, max_dist)
    bias = embedding[buckets]  # [Lq, Lk, H]
    return bias.transpose(2, 0, 1)[None]


def init_params(key: jax.Array, cfg: T5Config) -> dict:
    ks = iter(jax.random.split(key, 8))

    def lin(k, din, dout, std):
        return {"kernel": jax.random.normal(k, (din, dout)) * std}

    def block(k):
        kk = iter(jax.random.split(k, 8))
        p = {
            "norm1": {"weight": jnp.ones((cfg.dim,))},
            "attn": {
                # reference init stds (``t5.py:37-40``): q/o scale by the
                # FULL products, no per-head division
                "q": lin(next(kk), cfg.dim, cfg.dim_attn,
                         (cfg.dim * cfg.dim_attn) ** -0.5),
                "k": lin(next(kk), cfg.dim, cfg.dim_attn, cfg.dim**-0.5),
                "v": lin(next(kk), cfg.dim, cfg.dim_attn, cfg.dim**-0.5),
                "o": lin(next(kk), cfg.dim_attn, cfg.dim,
                         (cfg.num_heads * cfg.dim_attn) ** -0.5),
            },
            "norm2": {"weight": jnp.ones((cfg.dim,))},
            "ffn": {
                "gate": lin(next(kk), cfg.dim, cfg.dim_ffn, cfg.dim**-0.5),
                "fc1": lin(next(kk), cfg.dim, cfg.dim_ffn, cfg.dim**-0.5),
                "fc2": lin(next(kk), cfg.dim_ffn, cfg.dim, cfg.dim_ffn**-0.5),
            },
        }
        if not cfg.shared_pos:
            p["pos_embedding"] = jax.random.normal(
                next(kk), (cfg.num_buckets, cfg.num_heads)
            ) * (2 * cfg.num_buckets * cfg.num_heads) ** -0.5
        return p

    blocks = jax.vmap(block)(jax.random.split(next(ks), cfg.num_layers))
    params = {
        "token_embedding": jax.random.normal(next(ks), (cfg.vocab_size, cfg.dim)),
        "blocks": blocks,
        "norm": {"weight": jnp.ones((cfg.dim,))},
    }
    if cfg.shared_pos:
        params["pos_embedding"] = jax.random.normal(
            next(ks), (cfg.num_buckets, cfg.num_heads)
        ) * (2 * cfg.num_buckets * cfg.num_heads) ** -0.5
    return params


def _t5_gelu(x):
    """T5's tanh-approximate GELU (``t5.py:46-50``)."""
    return 0.5 * x * (
        1.0 + jnp.tanh(math.sqrt(2.0 / math.pi) * (x + 0.044715 * x**3))
    )


def _attn(p, x, mask_bias, pos_bias, num_heads):
    """T5 attention: no sqrt(d) scaling, fp32 softmax, additive bias."""
    b, s, _ = x.shape
    hd = p["q"]["kernel"].shape[1] // num_heads
    q = (x @ p["q"]["kernel"].astype(x.dtype)).reshape(b, s, num_heads, hd)
    k = (x @ p["k"]["kernel"].astype(x.dtype)).reshape(b, s, num_heads, hd)
    v = (x @ p["v"]["kernel"].astype(x.dtype)).reshape(b, s, num_heads, hd)
    scores = jnp.einsum(
        "binc,bjnc->bnij", q.astype(jnp.float32), k.astype(jnp.float32)
    )
    scores = scores + pos_bias + mask_bias
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    out = jnp.einsum("bnij,bjnc->binc", probs, v).reshape(b, s, -1)
    return out @ p["o"]["kernel"].astype(x.dtype)


def encode(
    params: dict,
    cfg: T5Config,
    ids: jax.Array,            # [B, S] int32 token ids
    mask: jax.Array,           # [B, S] 1 = real token
) -> jax.Array:
    """Returns contextual embeddings ``[B, S, dim]`` (padded positions are
    garbage — callers carry ``mask`` as cross-attention segment ids, exactly
    like the reference returns unpadded per-sample lists, ``t5.py:511-518``)."""
    b, s = ids.shape
    x = params["token_embedding"][ids].astype(jnp.float32)
    mask_bias = jnp.where(
        mask[:, None, None, :] > 0, 0.0, -1e9
    ).astype(jnp.float32)

    if cfg.shared_pos:
        shared_bias = relative_bias(
            params["pos_embedding"].astype(jnp.float32), s, s,
            cfg.num_buckets, cfg.max_dist,
        )

    def body(x, layer_p):
        if cfg.shared_pos:
            pos = shared_bias
        else:
            pos = relative_bias(
                layer_p["pos_embedding"].astype(jnp.float32), s, s,
                cfg.num_buckets, cfg.max_dist,
            )
        h = rms_norm(x, layer_p["norm1"]["weight"], eps=1e-6)
        x = x + _attn(layer_p["attn"], h, mask_bias, pos, cfg.num_heads)
        h = rms_norm(x, layer_p["norm2"]["weight"], eps=1e-6)
        ff = (h @ layer_p["ffn"]["fc1"]["kernel"].astype(h.dtype)) * _t5_gelu(
            h @ layer_p["ffn"]["gate"]["kernel"].astype(h.dtype)
        )
        x = x + ff @ layer_p["ffn"]["fc2"]["kernel"].astype(h.dtype)
        return x, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    return rms_norm(x, params["norm"]["weight"], eps=1e-6)
