"""Rotary position embeddings: LTX fractional 3D RoPE, Wan N-d RoPE, RIFLEx.

Parity targets (math, not code):
- LTX fractional-coordinate RoPE: ``precompute_freqs_cis`` at
  ``/root/reference/ltx_video/models/transformers/transformer3d.py:202-255``
  (spacings exp / exp_2 / linear / sqrt over ``dim // 6`` frequencies,
  fractional positions = grid / max_pos, pair-interleaved cos/sin).
- Interleaved-pair rotation: ``apply_rotary_emb`` at
  ``/root/reference/ltx_video/models/transformers/attention.py:960-975``
  and ``/root/reference/wan/modules/posemb_layers.py:229-293``.
- Wan N-d RoPE with head_dim split [44, 42, 42]:
  ``get_nd_rotary_pos_embed`` / ``get_rotary_pos_embed``
  (``/root/reference/wan/modules/posemb_layers.py:299-472``).
- RIFLEx long-video frequency clamp:
  ``get_1d_rotary_pos_embed_riflex`` / ``identify_k``
  (``/root/reference/wan/modules/posemb_layers.py:8-92``).

All precompute is fp32 (the reference insists on full precision here);
application casts to fp32 and back.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def rotate_pairs(x: jax.Array) -> jax.Array:
    """(x1, x2, x3, x4, ...) -> (-x2, x1, -x4, x3, ...).

    Keep the reshape-to-pairs form: strided lane slices (x[..., 0::2])
    measure 2.1x faster in isolation on v5e but regress the full DiT
    step by ~40 ms (16.27 vs 15.05 s/video) — in-graph, XLA fuses this
    form into the surrounding projections; the strided form does not."""
    x2 = x.reshape(*x.shape[:-1], -1, 2)
    a, b = x2[..., 0], x2[..., 1]
    return jnp.stack([-b, a], axis=-1).reshape(x.shape)


def apply_rotary_emb(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Apply interleaved-pair RoPE.

    ``cos``/``sin`` broadcast against ``x`` in either layout:
    - pair-duplicated to the last dim of ``x`` (the reference's layout), or
    - HALF width (one entry per rotation pair): same math with half the
      fp32 table traffic — the hot path when tables are built in-graph
      per step (see :func:`ltx_freqs_cis` ``half_layout``).
    """
    dtype = x.dtype
    if cos.shape[-1] * 2 == x.shape[-1]:
        xf = x.astype(jnp.float32).reshape(*x.shape[:-1], -1, 2)
        a, b = xf[..., 0], xf[..., 1]
        out = jnp.stack(
            [a * cos - b * sin, b * cos + a * sin], axis=-1
        ).reshape(x.shape)
        return out.astype(dtype)
    xf = x.astype(jnp.float32)
    out = xf * cos + rotate_pairs(xf) * sin
    return out.astype(dtype)


def _interleave2(x: jax.Array) -> jax.Array:
    """repeat_interleave(2, axis=-1)."""
    return jnp.repeat(x, 2, axis=-1)


def apply_rotary_emb_heads(
    x: jax.Array, cos: jax.Array, sin: jax.Array, heads: int
) -> jax.Array:
    """Interleaved-pair RoPE with the output written in head-major
    ``[B, H, S, d]`` layout: ``x`` is head-packed ``[B, S, H*d]``,
    ``cos/sin`` HALF layout ``[B, S, H*d/2]``. One fused elementwise+
    relayout pass — the separate ``[B,S,D] -> [B,H,S,d]`` transpose
    (~57 ms/step across the LTX-2B stack) becomes the rotation's output
    write. Numerically identical to ``apply_rotary_emb`` + transpose."""
    b, s, dt = x.shape
    d = dt // heads
    if cos.shape[-1] * 2 != dt:
        raise ValueError("apply_rotary_emb_heads needs half-layout tables")
    xf = x.astype(jnp.float32).reshape(b, s, heads, d // 2, 2)
    c = cos.reshape(b, s, heads, d // 2)
    sn = sin.reshape(b, s, heads, d // 2)
    a, b2 = xf[..., 0], xf[..., 1]
    out = jnp.stack(
        [a * c - b2 * sn, b2 * c + a * sn], axis=-1
    ).reshape(b, s, heads, d)
    return out.astype(x.dtype).transpose(0, 2, 1, 3)


def rope_heads_enabled(default: bool = False) -> bool:
    """Rope-on-heads output layout (``LTXV_TPU_ROPE_HEADS``): the
    rotation writes its result directly in head-major ``[B, H, S, d]``,
    fusing the head relayout into the RoPE pass instead of paying the
    rotation and the ``[B,S,..]->[B,H,S,..]`` transpose as separate HBM
    round-trips. One knob for both model families, but the measured
    default is per-family (r3 on-hardware A/B): Wan (d=128) passes
    ``default=True`` (−8.3% step), LTX (d=64) ``default=False`` (+0.6%
    — the narrower lane blocks lose more to the strided store than the
    saved transpose). The env var overrides both ways; unset keeps the
    family default."""
    import os

    raw = os.environ.get("LTXV_TPU_ROPE_HEADS", "").strip().lower()
    if not raw:
        return default
    return raw in ("1", "true", "on")


def full_to_half(tab: jax.Array) -> jax.Array:
    """Pair-duplicated RoPE table ``[..., d]`` -> half layout ``[..., d/2]``
    (one entry per rotation pair; entries within a pair are equal)."""
    return tab.reshape(*tab.shape[:-1], -1, 2)[..., 0]


def apply_rotary_emb_shared_heads(
    x: jax.Array, cos: jax.Array, sin: jax.Array
) -> jax.Array:
    """Interleaved-pair RoPE for per-head tensors with ONE table shared
    across heads (the Wan layout): ``x`` is ``[B, S, N, d]``, ``cos/sin``
    HALF layout broadcastable to ``[B, S, N, d/2]`` (e.g.
    ``[1, S, 1, d/2]``). The output is written head-major ``[B, N, S, d]``
    — the separate post-rope transpose becomes the rotation's output
    write. Numerically identical to ``apply_rotary_emb`` (full tables)
    + transpose: same products, same adds, different layout."""
    b, s, n, d = x.shape
    xf = x.astype(jnp.float32).reshape(b, s, n, d // 2, 2)
    a, b2 = xf[..., 0], xf[..., 1]
    c = cos[..., None, :] if cos.ndim != 4 else cos
    sn = sin[..., None, :] if sin.ndim != 4 else sin
    out = jnp.stack(
        [a * c - b2 * sn, b2 * c + a * sn], axis=-1
    ).reshape(b, s, n, d)
    return out.astype(x.dtype).transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# LTX fractional-coordinate RoPE
# ---------------------------------------------------------------------------

def ltx_freqs_cis(
    indices_grid: jax.Array,
    dim: int,
    theta: float = 10000.0,
    max_pos: Sequence[int] = (20, 2048, 2048),
    spacing: str = "exp",
    half_layout: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fractional 3D RoPE tables.

    Args:
      indices_grid: ``[B, 3, S]`` per-token (frame, y, x) latent coordinates
        (possibly fractional — conditioning tokens may sit off-grid).
      dim: model inner dim (frequencies span ``dim // 6`` per axis-pair).
      half_layout: return ``[B, S, dim/2]`` tables (one entry per rotation
        pair, consumed by :func:`apply_rotary_emb`'s half path) instead of
        the reference's pair-duplicated ``[B, S, dim]`` — identical math,
        half the fp32 table bytes per step.
    Returns:
      ``(cos, sin)`` each ``[B, S, dim]`` fp32 (``dim/2`` when
      ``half_layout``).
    """
    fractional = jnp.stack(
        [indices_grid[:, i].astype(jnp.float32) / max_pos[i] for i in range(3)],
        axis=-1,
    )  # [B, S, 3]
    n = dim // 6
    if spacing == "exp":
        indices = theta ** jnp.linspace(
            math.log(1.0, theta) if theta != 1.0 else 0.0,
            1.0,
            n,
            dtype=jnp.float32,
        )
    elif spacing == "exp_2":
        if dim % 6:
            # arange(0, dim, 6) yields ceil(dim/6) frequencies while the
            # table-width bookkeeping assumes dim//6 — the REFERENCE has
            # the same defect (transformer3d.py:224, 250-254 produce a
            # dim%6-over-wide table); no shipped config hits it, so fail
            # clearly instead of broadcasting garbage
            raise ValueError(
                f"exp_2 spacing requires dim divisible by 6, got {dim}"
            )
        indices = 1.0 / theta ** (jnp.arange(0, dim, 6, dtype=jnp.float32) / dim)
    elif spacing == "linear":
        indices = jnp.linspace(1.0, theta, n, dtype=jnp.float32)
    elif spacing == "sqrt":
        indices = jnp.sqrt(
            jnp.linspace(1.0, float(theta) ** 2, n, dtype=jnp.float32)
        )
    else:
        raise ValueError(f"unknown spacing {spacing!r}")
    indices = indices * math.pi / 2

    if spacing == "exp_2":
        # freqs[b, s, i*3 + axis] = indices[i] * frac[b, s, axis]
        freqs = (
            indices[None, None, :, None] * fractional[:, :, None, :]
        ).reshape(*fractional.shape[:2], -1)
    else:
        freqs = (
            indices[None, None, :, None]
            * (fractional[:, :, None, :] * 2 - 1)
        ).reshape(*fractional.shape[:2], -1)

    pad = dim % 6
    if half_layout:
        assert pad % 2 == 0, "half layout needs a pair-aligned pad"
        cos = jnp.cos(freqs)
        sin = jnp.sin(freqs)
        if pad:
            cos = jnp.concatenate(
                [jnp.ones_like(cos[..., :pad // 2]), cos], axis=-1
            )
            sin = jnp.concatenate(
                [jnp.zeros_like(sin[..., :pad // 2]), sin], axis=-1
            )
        return cos, sin
    cos = _interleave2(jnp.cos(freqs))
    sin = _interleave2(jnp.sin(freqs))
    if pad:
        cos = jnp.concatenate([jnp.ones_like(cos[..., :pad]), cos], axis=-1)
        sin = jnp.concatenate([jnp.zeros_like(sin[..., :pad]), sin], axis=-1)
    return cos, sin


# ---------------------------------------------------------------------------
# Wan N-d RoPE (+ RIFLEx)
# ---------------------------------------------------------------------------

def identify_k(b: float, d: int, n: int) -> tuple[int, int]:
    """Find the intrinsic RoPE frequency index whose period is closest to
    ``n`` latent frames (RIFLEx Eq. 7)."""
    periods = [
        round(2 * math.pi * (b ** (2 * (j - 1) / d))) for j in range(1, d // 2 + 1)
    ]
    diffs = [abs(p - n) for p in periods]
    k = diffs.index(min(diffs)) + 1
    return k, periods[k - 1]


def rope_1d(
    dim: int,
    pos: jax.Array,
    theta: float = 10000.0,
    riflex_k: int | None = None,
    riflex_l_test: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """1-D RoPE tables ``(cos, sin)`` each ``[S, dim]`` (pair-duplicated).

    With ``riflex_k`` set, the k-th frequency is clamped so the extrapolated
    video stays within 90% of one period (RIFLEx Eq. 8).
    """
    pos = jnp.asarray(pos, jnp.float32)
    freqs = 1.0 / theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim)
    if riflex_k is not None:
        freqs = freqs.at[riflex_k - 1].set(0.9 * 2 * math.pi / riflex_l_test)
    angles = jnp.outer(pos, freqs)  # [S, dim//2]
    return _interleave2(jnp.cos(angles)), _interleave2(jnp.sin(angles))


def default_rope_dims(head_dim: int) -> tuple[int, int, int]:
    """Wan's head-dim split: even spatial thirds, remainder to time
    (head_dim 128 -> (44, 42, 42))."""
    hw = (head_dim // 3) // 2 * 2
    return (head_dim - 2 * hw, hw, hw)


def wan_rope_freqs(
    grid_sizes: Sequence[int],
    head_dim: int = 128,
    rope_dims: Sequence[int] | None = None,
    theta: float = 10000.0,
    enable_riflex: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Wan RoPE tables over a (F, H, W) token grid, flattened row-major to
    ``[F*H*W, head_dim]`` with the head dim split per axis as ``rope_dims``.

    The time axis optionally gets the RIFLEx clamp with ``k=6`` and
    ``L_test = F`` (matching ``get_rotary_pos_embed``,
    ``/root/reference/wan/modules/posemb_layers.py:434-472``).
    """
    if rope_dims is None:
        rope_dims = default_rope_dims(head_dim)
    assert sum(rope_dims) == head_dim
    f, h, w = grid_sizes
    axes_pos = [np.arange(f), np.arange(h), np.arange(w)]
    coses, sins = [], []
    for i, (d, p) in enumerate(zip(rope_dims, axes_pos)):
        if i == 0 and enable_riflex:
            c, s = rope_1d(d, p, theta, riflex_k=6, riflex_l_test=f)
        else:
            c, s = rope_1d(d, p, theta)
        coses.append(c)
        sins.append(s)

    def expand(tabs):
        # tabs[i]: [axis_len_i, rope_dims_i*? ]; broadcast to [F,H,W,·]
        tf = jnp.broadcast_to(tabs[0][:, None, None, :], (f, h, w, tabs[0].shape[-1]))
        th = jnp.broadcast_to(tabs[1][None, :, None, :], (f, h, w, tabs[1].shape[-1]))
        tw = jnp.broadcast_to(tabs[2][None, None, :, :], (f, h, w, tabs[2].shape[-1]))
        return jnp.concatenate([tf, th, tw], axis=-1).reshape(f * h * w, -1)

    return expand(coses), expand(sins)
