"""Shape padding helpers for the 128-lane TPU constraint.

The reference hard-asserts "TPU supports only lengths multiple of 128"
(``/root/reference/ltx_video/pipelines/pipeline_ltx_video.py:368-370``) and
trims conditioning tokens to preserve the multiple
(``pipeline_ltx_video.py:1532-1541``). Here padding is systematic: pad to
the next block multiple, carry segment ids so the kernel masks the pad, and
slice back.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_axis(x: jax.Array, axis: int, multiple: int) -> jax.Array:
    """Zero-pad ``axis`` up to the next multiple."""
    size = x.shape[axis]
    target = round_up(size, multiple)
    if target == size:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - size)
    return jnp.pad(x, pads)


def unpad_axis(x: jax.Array, axis: int, size: int) -> jax.Array:
    if x.shape[axis] == size:
        return x
    return jax.lax.slice_in_dim(x, 0, size, axis=axis)
