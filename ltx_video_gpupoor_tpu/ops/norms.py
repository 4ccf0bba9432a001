"""Normalization primitives (fp32 math, cast back to input dtype).

The reference keeps norms in fp32 via dtype locking
(``/root/reference/wan/modules/model.py:816-851``) and uses in-place RMSNorm
(``model.py:99-111``) — here they are pure functions; XLA fuses them into
neighbouring ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(
    x: jax.Array, weight: jax.Array | None = None, eps: float = 1e-5
) -> jax.Array:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    return y.astype(dtype)


def layer_norm(
    x: jax.Array,
    weight: jax.Array | None = None,
    bias: jax.Array | None = None,
    eps: float = 1e-6,
) -> jax.Array:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)


def pixel_norm(x: jax.Array, axis: int = 1, eps: float = 1e-8) -> jax.Array:
    """Per-pixel channel norm (``/root/reference/ltx_video/models/autoencoders/pixel_norm.py:5``)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=axis, keepdims=True) + eps)
    return y.astype(dtype)


def group_norm(
    x: jax.Array,
    num_groups: int,
    weight: jax.Array | None = None,
    bias: jax.Array | None = None,
    eps: float = 1e-6,
    channel_axis: int = -1,
) -> jax.Array:
    """GroupNorm over the channel axis (NHWC-style layouts preferred on TPU)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    ax = channel_axis % xf.ndim
    c = xf.shape[ax]
    assert c % num_groups == 0
    # reshape channel axis -> (groups, c//groups)
    new_shape = xf.shape[:ax] + (num_groups, c // num_groups) + xf.shape[ax + 1:]
    xg = xf.reshape(new_shape)
    red_axes = tuple(
        i for i in range(xg.ndim) if i != 0 and i != ax
    )  # all but batch and group axis
    mu = jnp.mean(xg, axis=red_axes, keepdims=True)
    var = jnp.mean((xg - mu) ** 2, axis=red_axes, keepdims=True)
    y = ((xg - mu) * jax.lax.rsqrt(var + eps)).reshape(xf.shape)
    if weight is not None:
        shape = [1] * xf.ndim
        shape[ax] = c
        y = y * weight.astype(jnp.float32).reshape(shape)
    if bias is not None:
        shape = [1] * xf.ndim
        shape[ax] = c
        y = y + bias.astype(jnp.float32).reshape(shape)
    return y.astype(dtype)
