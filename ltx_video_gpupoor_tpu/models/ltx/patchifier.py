"""Symmetric (de)patchification for the LTX DiT token space.

Parity target: ``SymmetricPatchifier`` at
``/root/reference/ltx_video/models/transformers/symmetric_patchifier.py:54-84``
and ``get_latent_coords`` (``:33-51``). Latent layout here is channels-last
``[B, F, H, W, C]`` (TPU-friendly); the reference uses ``[B, C, F, H, W]``.
Token order is identical: frame-major ``(f, h, w)`` raster order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from einops import rearrange


def get_latent_coords(
    num_frames: int,
    height: int,
    width: int,
    batch_size: int,
    patch_size: tuple[int, int, int] = (1, 1, 1),
) -> jax.Array:
    """Top-left latent coordinates per token: ``[B, 3, N]`` (f, y, x)."""
    pf, ph, pw = patch_size
    grid = jnp.meshgrid(
        jnp.arange(0, num_frames, pf),
        jnp.arange(0, height, ph),
        jnp.arange(0, width, pw),
        indexing="ij",
    )
    coords = jnp.stack(grid, axis=0).reshape(3, -1)  # [3, N]
    return jnp.broadcast_to(coords[None], (batch_size, 3, coords.shape[1]))


def patchify(
    latents: jax.Array, patch_size: tuple[int, int, int] = (1, 1, 1)
) -> tuple[jax.Array, jax.Array]:
    """``[B, F, H, W, C] -> ([B, N, C*pf*ph*pw], [B, 3, N])``."""
    b, f, h, w, c = latents.shape
    coords = get_latent_coords(f, h, w, b, patch_size)
    tokens = rearrange(
        latents,
        "b (f p1) (h p2) (w p3) c -> b (f h w) (c p1 p2 p3)",
        p1=patch_size[0], p2=patch_size[1], p3=patch_size[2],
    )
    return tokens, coords


def unpatchify(
    tokens: jax.Array,
    height: int,
    width: int,
    out_channels: int,
    patch_size: tuple[int, int, int] = (1, 1, 1),
) -> jax.Array:
    """``[B, N, C*p...] -> [B, F, H, W, C]`` (height/width in latent pixels).

    Temporal patch sizes > 1 are not supported (the rearrange below only
    unpacks the spatial patch dims; silently accepting ``p_t > 1`` would
    return a garbage grid) — every LTX config uses ``p_t == 1``."""
    if patch_size[0] != 1:
        raise ValueError(
            f"unpatchify supports temporal patch 1, got {patch_size}"
        )
    h = height // patch_size[1]
    w = width // patch_size[2]
    return rearrange(
        tokens,
        "b (f h w) (c p q) -> b f (h p) (w q) c",
        h=h, w=w, p=patch_size[1], q=patch_size[2],
    )
