"""Two-pass multi-scale LTX pipeline.

Parity target: ``LTXMultiScalePipeline`` at
``/root/reference/ltx_video/pipelines/pipeline_ltx_video.py:1741-1903``:
pass 1 at ``downscale_factor`` resolution, latent 2x upsample via
``LatentUpsampler`` in un-normalized latent space (``_upsample_latents``
``:1760-1772``), AdaIN re-normalization against the pass-1 latents
(``adain_filter_latent`` ``:1709-1737``), pass 2 at 2x resolution with its
own guidance config, final decode.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..models.ltx import latent_upsampler as lup
from ..models.ltx import vae as ltx_vae
from .ltx_pipeline import LTXPipeline

_jit_upsample = jax.jit(lup.forward, static_argnums=(1,))


def adain_filter_latent(
    latents: jax.Array, reference: jax.Array, factor: float = 1.0
) -> jax.Array:
    """Per-(batch, channel) AdaIN over all (F, H, W) positions.

    Layout here is channels-last [B, F, H, W, C]; statistics reduce over
    the spatial-temporal axes (1, 2, 3), matching the reference's
    per-[i, c] full reduction."""
    axes = (1, 2, 3)
    i_mean = jnp.mean(latents, axis=axes, keepdims=True)
    i_sd = jnp.std(latents, axis=axes, keepdims=True)
    r_mean = jnp.mean(reference, axis=axes, keepdims=True)
    r_sd = jnp.std(reference, axis=axes, keepdims=True)
    result = ((latents - i_mean) / (i_sd + 1e-8)) * r_sd + r_mean
    return latents + factor * (result - latents)


def upsample_latents(
    upsampler_params: dict,
    upsampler_cfg: lup.LatentUpsamplerConfig,
    vae_stats: dict,
    latents: jax.Array,
) -> jax.Array:
    """Un-normalize -> upsample -> re-normalize (``:1760-1772``)."""
    z = ltx_vae.un_normalize_latents(latents, vae_stats)
    z = _jit_upsample(upsampler_params, upsampler_cfg, z)
    return ltx_vae.normalize_latents(z, vae_stats)


@dataclasses.dataclass
class MultiScalePipeline:
    pipeline: LTXPipeline
    upsampler_params: dict
    upsampler_cfg: lup.LatentUpsamplerConfig
    downscale_factor: float = 2 / 3

    def downscaled_dims(self, height: int, width: int) -> tuple[int, int]:
        """Pass-1 dims: ``int(dim * factor)`` snapped down to the VAE
        stride (``pipeline_ltx_video.py:1797-1801``). The single source
        of truth — callers deriving pass-1 latent grids must use THIS
        (the YAML factor 0.6666666 and float ``2/3`` differ by one unit
        in ``int()`` for dims divisible by 96, which the %32 snap then
        turns into a whole-block mismatch)."""
        sf = self.pipeline.vae_cfg.spatial_downscale_factor
        xh = int(height * self.downscale_factor)
        xw = int(width * self.downscale_factor)
        # floor at one VAE stride: a working dim under 1.5 strides (e.g.
        # a 32 px canvas from aspect fitting) would otherwise snap to a
        # ZERO-height pass-1 grid and crash in patchify (the reference's
        # own int()+%32 snap has the same degenerate edge)
        return max(sf, xh - (xh % sf)), max(sf, xw - (xw % sf))

    def generate(
        self,
        prompt_embeds,
        prompt_mask,
        height: int,
        width: int,
        num_frames: int,
        first_pass: dict,
        second_pass: dict,
        key: Optional[jax.Array] = None,
        output_type: str = "latent",
        decode_timestep: float = 0.0,
        decode_noise_scale: Optional[float] = None,
        noise_pass1: Optional[jax.Array] = None,
        noise_pass2: Optional[jax.Array] = None,
        **kwargs,
    ):
        key = key if key is not None else jax.random.key(0)
        k1, k2, k3 = jax.random.split(key, 3)

        downscaled_height, downscaled_width = self.downscaled_dims(
            height, width
        )

        from ..utils.observability import stage as _stage

        with _stage("pass1"):
            latents = self.pipeline.generate(
                prompt_embeds, prompt_mask,
                height=downscaled_height, width=downscaled_width,
                num_frames=num_frames, key=k1, output_type="latent",
                noise=noise_pass1,
                **first_pass, **kwargs,
            )

        with _stage("upsample_adain", sync=lambda: up):
            up = upsample_latents(
                self.upsampler_params, self.upsampler_cfg,
                self.pipeline.vae_params["per_channel_statistics"],
                latents,
            )
            up = adain_filter_latent(up, latents, factor=1.0)

        second = dict(second_pass)
        # pass 2 re-noises the upsampled latents to its first timestep
        ts2 = second.get("timesteps")
        t0 = float(ts2[0]) if ts2 is not None else None
        with _stage("pass2"):
            result = self.pipeline.generate(
                prompt_embeds, prompt_mask,
                height=downscaled_height * 2, width=downscaled_width * 2,
                num_frames=num_frames, key=k2,
                media_latents=up, initial_timestep=t0,
                output_type=output_type,
                decode_timestep=decode_timestep,
                decode_noise_scale=decode_noise_scale,
                noise=noise_pass2,
                **second, **kwargs,
            )
        return result
