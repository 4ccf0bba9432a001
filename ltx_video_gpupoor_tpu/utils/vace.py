"""VACE media preprocessing.

Parity target: ``VaceVideoProcessor`` at
``/root/reference/wan/utils/vace_preprocessor.py`` — aspect-preserving
resize+center-crop, fps resampling via frame-timestamp binning, seq-len
area budgeting, zero-start modes — plus the generator-side encoders
``vace_encode_frames`` / ``vace_encode_masks`` / ``vace_latent``
(``/root/reference/wan/text2video.py:120-187``), reimplemented over the
JAX Wan VAE with numpy host preprocessing.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..models.wan import vae as wan_vae


def resize_crop(video: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """[T, H, W, C] uint8/float -> [T, oh, ow, C] float32 in [-1, 1]
    (aspect-preserving scale + center crop, ``vace_preprocessor.py:102-139``)."""
    import cv2

    t, ih, iw, c = video.shape
    scale = max(ow / iw, oh / ih)
    rh, rw = round(scale * ih), round(scale * iw)
    # cv2.resize drops a trailing singleton channel (HxWx1 -> HxW);
    # restore it so the [T, oh, ow, C] contract holds for mask videos
    frames = np.stack([
        cv2.resize(f, (rw, rh), interpolation=cv2.INTER_CUBIC)
        .reshape(rh, rw, c)
        for f in video
    ])
    y1 = (rh - oh) // 2
    x1 = (rw - ow) // 2
    frames = frames[:, y1:y1 + oh, x1:x1 + ow]
    if frames.dtype == np.uint8:
        frames = frames.astype(np.float32) / 127.5 - 1.0
    return frames


@dataclasses.dataclass
class VaceVideoProcessor:
    """fps/area budgeting for VACE inputs (``vace_preprocessor.py:89-143``)."""

    downsample: tuple = (4, 8, 8)
    min_area: int = 480 * 832
    max_area: int = 480 * 832
    min_fps: int = 16
    max_fps: int = 24
    zero_start: bool = True
    seq_len: int = 32760
    keep_last: bool = True

    def select_frames(
        self, fps: float, num_frames: int,
        max_frames: int = 0, start_frame: int = 0,
    ) -> tuple[list[int], float]:
        """Frame ids resampled to the fps budget.

        ``keep_last=True`` (the fork's serving default) runs the
        timestamp-binning ``resample`` at ``max_fps``
        (``_get_frameid_bbox_adjust_last``); ``keep_last=False`` is the
        zero-start uniform path (``_get_frameid_bbox_default`` with
        ``zero_start=True``; the training-time random window/area
        sampling is out of scope for serving)."""
        if self.keep_last:
            from .video_ops import resample

            target_fps = self.max_fps
            ids = resample(
                fps, num_frames, max_frames or num_frames, target_fps,
                start_frame,
            )
            return ids, target_fps
        target_fps = min(fps, self.max_fps)
        duration = num_frames / fps
        target_num = int(duration * target_fps)
        ids = [
            min(round(i * fps / target_fps), num_frames - 1)
            for i in range(target_num)
        ]
        return ids, target_fps

    def budget_dimensions(self, h: int, w: int, num_frames: int):
        """Scale area so the token count fits the seq_len budget.

        Floors like the reference (``int(h*scale)//dh*dh``,
        ``vace_preprocessor.py:81-84``) — rounding could overshoot the
        budget the function exists to enforce. (``min_area``/``min_fps``
        bound the reference's TRAINING-time random area/window sampling,
        which is out of scope for serving.)"""
        df, dh, dw = self.downsample
        lat_frames = (num_frames - 1) // df + 1
        max_area = min(
            self.max_area, self.seq_len * dh * dw // lat_frames
        )
        area = h * w
        scale = min(1.0, math.sqrt(max_area / area))
        oh = int(h * scale) // dh * dh
        ow = int(w * scale) // dw * dw
        assert (oh // dh) * (ow // dw) * lat_frames <= self.seq_len
        return oh, ow


def vace_encode_frames(
    vae_params: dict,
    vae_cfg: wan_vae.WanVAEConfig,
    frames: jnp.ndarray,                 # [1, F, H, W, 3]
    ref_images: Optional[Sequence[jnp.ndarray]] = None,  # each [1, H, W, 3]
    masks: Optional[jnp.ndarray] = None,  # [1, F, H, W, 1] in [0, 1]
) -> jnp.ndarray:
    """``vace_encode_frames`` (``text2video.py:120-151``): encode active
    (masked) and inactive regions separately, concat channels, prepend ref
    image latents on the frame axis."""
    if masks is None:
        latents = wan_vae._tile_encode(vae_params, vae_cfg, frames)
        latents = jnp.concatenate(
            [latents, jnp.zeros_like(latents)], axis=-1
        )
    else:
        inactive = frames * (1 - masks)
        reactive = frames * masks
        z_inactive = wan_vae._tile_encode(vae_params, vae_cfg, inactive)
        z_reactive = wan_vae._tile_encode(vae_params, vae_cfg, reactive)
        latents = jnp.concatenate([z_inactive, z_reactive], axis=-1)
    if ref_images:
        refs = []
        for ref in ref_images:
            z = wan_vae._tile_encode(vae_params, vae_cfg, ref[:, None])
            z = jnp.concatenate([z, jnp.zeros_like(z)], axis=-1)
            refs.append(z)
        latents = jnp.concatenate(refs + [latents], axis=1)
    return latents


def vace_encode_masks(
    masks: jnp.ndarray,                  # [1, F, H, W, 1]
    vae_stride: tuple = (4, 8, 8),
    num_refs: int = 0,
) -> jnp.ndarray:
    """``vace_encode_masks`` (``text2video.py:153-184``): pack the
    ``dh x dw`` SPATIAL neighborhood of each latent cell into channels
    (64 for the production 8x8 stride — the real VACE checkpoint's
    ``vace_in_dim=96`` is 32 frame-latent + 64 mask channels),
    nearest-exact resample depth to the latent frame count, prepend
    zeros for ref frames. Returns ``[B, F', H', W', dh*dw]``."""
    b, f, h, w, _ = masks.shape
    df, dh, dw = vae_stride
    new_depth = (f + df - 1) // df           # == VAE latent frames
    # floor the spatial grid exactly like the reference
    # (``height = 2 * (H // (stride*2))``) and crop to it, so
    # non-aligned masks pack instead of crashing the reshape
    hl = 2 * (h // (dh * 2))
    wl = 2 * (w // (dw * 2))
    m = masks[..., 0][:, :, : hl * dh, : wl * dw]   # [B, F, hl*dh, wl*dw]
    m = m.reshape(b, f, hl, dh, wl, dw)
    # spatial phases -> channels, channel index = sh*dw + sw (the
    # reference's permute(2,4,0,1,3) + reshape order)
    m = jnp.transpose(m, (0, 1, 2, 4, 3, 5)).reshape(b, f, hl, wl, dh * dw)
    # nearest-exact depth resample F -> new_depth
    # (``F.interpolate(mode='nearest-exact')``: src = floor((dst+.5)*scale))
    idx = jnp.floor(
        (jnp.arange(new_depth) + 0.5) * (f / new_depth)
    ).astype(jnp.int32)
    m = m[:, jnp.clip(idx, 0, f - 1)]
    if num_refs:
        zeros = jnp.zeros((b, num_refs) + m.shape[2:], m.dtype)
        m = jnp.concatenate([zeros, m], axis=1)
    return m


def vace_latent(z: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """``vace_latent`` (``text2video.py:186-187``): concat latents + masks
    on channels — the vace_context fed to the model."""
    return jnp.concatenate([z, m], axis=-1)
