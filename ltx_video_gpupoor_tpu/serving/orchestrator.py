"""LTX-Video generation orchestrator (the ``LTXV`` wrapper equivalent).

Parity target: ``LTXV`` at ``/root/reference/ltx_video/ltxv.py``:
- dimension policy: pad H/W to /32, frames to ``N*8+1``
  (``ltxv.py:340-344``), canvas fitting (``:290-293``), final crop +
  rescale of the decoded frames (``:449-458``);
- dev vs distilled pipeline configs (``:304-307``), STG mode mapping
  (``:398-409``);
- timestep list construction with ``skip_initial/final_inference_steps``
  (``pipeline_ltx_video.py:125-199``);
- conditioning media preprocessing (resize + CRF-29 round-trip,
  ``:530-567``).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import load_ltx_pipeline_config
from ..models.ltx.transformer3d import SkipLayerStrategy
from ..pipelines.ltx_pipeline import ConditioningItem, LTXPipeline
from ..pipelines.multiscale import MultiScalePipeline
from ..schedulers import rf
from ..utils import media as media_utils
from ..utils import resolution

logger = logging.getLogger(__name__)

@jax.jit
def _rgb_to_yuv420(frames: jax.Array):
    """[F, H, W, 3] float in [-1, 1] -> planar YUV420 uint8 (BT.601
    limited range, swscale's default for RGB24->YUV420P). Runs on device
    so the host fetch moves 1.5 bytes/px instead of 3."""
    rgb = (frames.astype(jnp.float32) + 1.0) * 0.5
    m = jnp.array(
        [[65.481, -37.797, 112.0],
         [128.553, -74.203, -93.786],
         [24.966, 112.0, -18.214]], jnp.float32,
    )
    yuv = rgb @ m + jnp.array([16.0, 128.0, 128.0], jnp.float32)
    y = jnp.clip(jnp.round(yuv[..., 0]), 0, 255).astype(jnp.uint8)
    f, h, w = y.shape
    c = yuv[..., 1:].reshape(f, h // 2, 2, w // 2, 2, 2).mean(axis=(2, 4))
    c = jnp.clip(jnp.round(c), 0, 255).astype(jnp.uint8)
    return y, c[..., 0], c[..., 1]


STG_MODES = {
    "attention_values": SkipLayerStrategy.AttentionValues,
    "stg_av": SkipLayerStrategy.AttentionValues,
    "attention_skip": SkipLayerStrategy.AttentionSkip,
    "stg_as": SkipLayerStrategy.AttentionSkip,
    "residual": SkipLayerStrategy.Residual,
    "stg_r": SkipLayerStrategy.Residual,
    "transformer_block": SkipLayerStrategy.TransformerBlock,
    "stg_t": SkipLayerStrategy.TransformerBlock,
}

MAX_HEIGHT, MAX_WIDTH, MAX_FRAMES = 720, 1280, 257  # ``ltxv.py:42-44``


def pad_dimensions(height: int, width: int, frame_num: int):
    """H/W to /32, frames to N*8+1 (``ltxv.py:340-344``)."""
    height_padded = ((height - 1) // 32 + 1) * 32
    width_padded = ((width - 1) // 32 + 1) * 32
    num_frames_padded = ((frame_num - 2) // 8 + 1) * 8 + 1
    return height_padded, width_padded, num_frames_padded


def build_timesteps(
    pass_cfg: dict,
    n_media_tokens: int,
    sampler: str = "from_checkpoint",
    max_timestep: float = 1.0,
) -> np.ndarray:
    """Timestep list for one pass, including skip_initial/final handling
    (``retrieve_timesteps``, ``pipeline_ltx_video.py:125-199``).

    The skips and the ``max_timestep`` (v2v strength) truncation apply
    to EXPLICIT config timestep lists too — the reference runs both
    after resolving either source (``:176-196``); without that, the
    distilled configs (explicit lists starting at 1.0) would silently
    ignore v2v strength entirely."""
    if "timesteps" in pass_cfg:
        ts = np.asarray(pass_cfg["timesteps"], np.float32)
    else:
        steps = pass_cfg.get("num_inference_steps", 30)
        sampler_name = {
            "from_checkpoint": "Uniform",
            "uniform": "Uniform",
            "linear-quadratic": "LinearQuadratic",
        }.get(sampler, "Uniform")
        sched = rf.make_schedule(
            steps,
            sampler=sampler_name,
            shifting="SD3",
            n_media_tokens=n_media_tokens,
            target_shift_terminal=0.1,
        )
        ts = np.asarray(sched.timesteps)
    skip_i = pass_cfg.get("skip_initial_inference_steps", 0)
    skip_f = pass_cfg.get("skip_final_inference_steps", 0)
    if skip_i < 0 or skip_f < 0 or skip_i + skip_f >= len(ts):
        # the reference validates BEFORE slicing (``:176-183``); without
        # this an aggressive skip (e.g. dev config skips + a small user
        # step count) silently yields an empty schedule and a bare
        # IndexError downstream
        raise ValueError(
            "invalid skip inference step values: skip_initial="
            f"{skip_i}, skip_final={skip_f} with {len(ts)} steps"
        )
    if skip_i or skip_f:
        ts = ts[skip_i: len(ts) - skip_f]
    if max_timestep < 1.0:
        # v2v strength: start denoising at the media's noise level
        # (``retrieve_timesteps`` max_timestep truncation,
        # ``pipeline_ltx_video.py:190-196``)
        if max_timestep < float(ts.min()):
            raise ValueError(
                f"max_timestep {max_timestep} is smaller than the "
                f"minimum timestep {float(ts.min())}"
            )
        ts = ts[ts <= max_timestep]
    return ts


def _pass_kwargs(pass_cfg: dict, stg_strategy):
    return dict(
        guidance_scale=pass_cfg.get("guidance_scale", 1.0),
        stg_scale=pass_cfg.get("stg_scale", 0.0),
        rescaling_scale=pass_cfg.get("rescaling_scale", 1.0),
        skip_block_list=pass_cfg.get("skip_block_list"),
        guidance_timesteps=pass_cfg.get("guidance_timesteps"),
        skip_layer_strategy=stg_strategy,
    )


@dataclasses.dataclass
class LTXVideoGenerator:
    """End-to-end t2v / i2v / v2v generation with the reference's knobs."""

    pipeline: LTXPipeline
    multiscale: Optional[MultiScalePipeline] = None
    pipeline_config: dict | str = "ltxv-13b-0.9.7-distilled"

    def __post_init__(self):
        if isinstance(self.pipeline_config, str):
            self.pipeline_config = load_ltx_pipeline_config(
                self.pipeline_config
            )

    def generate(
        self,
        prompt_embeds: jax.Array,       # [2, S, D] (neg, pos)
        prompt_mask: jax.Array,
        height: int = 704,
        width: int = 1216,
        frame_num: int = 81,
        frame_rate: float = 30.0,
        seed: int = 42,
        image_start: Optional[np.ndarray] = None,   # [H, W, 3]
        image_end: Optional[np.ndarray] = None,
        input_video: Optional[np.ndarray] = None,   # [F, H, W, 3]
        image_cond_noise_scale: float = 0.15,
        fit_into_canvas: bool = True,
        sampling_steps: Optional[int] = None,
        strength: float = 1.0,
        output_type: str = "pixels",
        bucket_resolution: bool = False,
        teacache_multiplier: float = 0.0,
    ) -> np.ndarray | jax.Array:
        """Generate video frames.

        Returns:
          ``output_type="pixels"`` (default): host ``np.ndarray`` of
          **uint8** frames ``[F, H, W, 3]`` in ``[0, 255]`` — quantized
          on device so the host fetch moves 1/4 the bytes of float32
          (callers that previously scaled ``(x + 1) * 127.5`` themselves
          must not: frames are already display-ready).
          ``output_type="yuv420"``: tuple of host uint8 planes
          ``(y [F,H,W], u [F,H/2,W/2], v [F,H/2,W/2])`` (BT.601), fetched
          at 1.5 bytes/px for the native mp4 writer
          (``media.save_video`` accepts the tuple directly); falls back
          to uint8 RGB when the target dims are odd.
          ``output_type="latent"``: device array of pass-output latents
          in ``[-1, 1]``-era float space (un-normalized latent grid).
        """
        cfg = dict(self.pipeline_config)
        stg_strategy = STG_MODES[cfg.get("stg_mode", "attention_values")]
        key = jax.random.key(seed)

        if input_video is not None:
            height, width = input_video.shape[1:3]
        elif image_start is not None:
            ih, iw = image_start.shape[:2]
            height, width = media_utils.calculate_new_dimensions(
                height, width, ih, iw, fit_into_canvas, 32
            )
        height = min(height, MAX_HEIGHT)
        width = min(width, MAX_WIDTH)
        frame_num = min(frame_num, MAX_FRAMES)
        if bucket_resolution:
            # snap to the nearest aspect-ratio bin so arbitrary user sizes
            # hit a bounded set of compiled programs (utils/resolution.py)
            req = (height, width, frame_num)
            height, width, frame_num = resolution.bucketed_dimensions(
                height, width, frame_num
            )
            if (height, width, frame_num) != req:
                logger.info(
                    "bucket_resolution: request %dx%dx%df -> %dx%dx%df",
                    req[0], req[1], req[2], height, width, frame_num,
                )
        hp, wp, fp = pad_dimensions(height, width, frame_num)
        padding = media_utils.calculate_padding(height, width, hp, wp)

        from ..utils.observability import stage as _stage

        conditioning = []
        media_video = None
        with _stage("media_prep"):
            if input_video is not None and (
                input_video.shape[1] != height
                or input_video.shape[2] != width
            ):
                # the working dims moved off the video's own (MAX clamp
                # or resolution bucketing): resize frames BEFORE padding,
                # or the pad/crop bookkeeping applies to dims the media
                # doesn't have
                input_video = np.stack([
                    media_utils.resize_image(f, height, width)
                    for f in np.asarray(input_video)
                ])
            if input_video is not None and strength < 1.0:
                # v2v: encode the whole video, noise to `strength`, denoise
                # from there (``prepare_latents`` media path, ``:632-710``);
                # the encode happens per-branch at the branch's working
                # resolution. Trim to the padded frame count (the
                # reference's ``load_media_file(max_frames=fp)``).
                media_video = media_utils.pad_media(
                    input_video[:fp], padding
                )
            elif input_video is not None:
                # conditioning video: trim to the target length floored
                # to N*temporal_factor+1 (``trim_conditioning_sequence``,
                # ``pipeline_ltx_video.py:1689-1707``)
                tsf = self.pipeline.vae_cfg.temporal_downscale_factor
                n = min(input_video.shape[0], frame_num)
                n = (n - 1) // tsf * tsf + 1
                item = media_utils.pad_media(input_video[:n], padding)
                conditioning.append(ConditioningItem(item, 0, 1.0))
            if image_start is not None:
                img = media_utils.prepare_conditioning_image(
                    image_start, height, width
                )
                conditioning.append(
                    ConditioningItem(
                        media_utils.pad_media(img, padding), 0, 1.0
                    )
                )
            if image_end is not None:
                img = media_utils.prepare_conditioning_image(
                    image_end, height, width
                )
                conditioning.append(
                    ConditioningItem(
                        media_utils.pad_media(img, padding), fp - 1, 1.0
                    )
                )

        common = dict(
            teacache_multiplier=teacache_multiplier,
            frame_rate=frame_rate,
            conditioning_items=conditioning,
            image_cond_noise_scale=(
                image_cond_noise_scale if conditioning else 0.0
            ),
            stochastic_sampling=cfg.get("stochastic_sampling", False),
            decode_timestep=cfg.get("decode_timestep", 0.0),
            decode_noise_scale=cfg.get("decode_noise_scale"),
        )

        f_lat, h_lat, w_lat = self.pipeline.latent_shape(hp, wp, fp)
        n_tokens = f_lat * h_lat * w_lat

        def encode_media(video: np.ndarray, th: int, tw: int):
            from ..models.ltx import vae as ltx_vae_mod

            if video.shape[1] != th or video.shape[2] != tw:
                video = np.stack([
                    media_utils.resize_image(f, th, tw) for f in video
                ])
            from ..pipelines.ltx_pipeline import _jit_vae_encode

            enc = _jit_vae_encode(
                self.pipeline.vae_params, self.pipeline.vae_cfg,
                jnp.asarray(video, jnp.float32)[None],
            )
            z = ltx_vae_mod.sample_posterior(enc)
            return ltx_vae_mod.normalize_latents(
                z, self.pipeline.vae_params["per_channel_statistics"]
            )

        media_latents = None

        if cfg.get("pipeline_type") == "multi-scale":
            assert self.multiscale is not None, (
                "multi-scale config requires a latent upsampler"
            )
            first = dict(cfg["first_pass"])
            second = dict(cfg["second_pass"])
            if sampling_steps is not None:
                # the user's step count overrides BOTH passes' configured
                # counts (``ltxv.py:277-278`` + the post-update assignment
                # at ``pipeline_ltx_video.py:1862-1888``); explicit config
                # timestep lists still win inside build_timesteps
                first["num_inference_steps"] = sampling_steps
                second["num_inference_steps"] = sampling_steps
            ms = self.multiscale
            df = cfg.get("downscale_factor")
            if df is not None and df != ms.downscale_factor:
                ms = dataclasses.replace(ms, downscale_factor=df)
            # pass-1 dims from the SAME computation the multiscale
            # pipeline will run (a one-ulp factor difference shifts the
            # %32 snap a whole block and desyncs the latent grids)
            dh, dw = ms.downscaled_dims(hp, wp)
            fl, hl, wl = self.pipeline.latent_shape(dh, dw, fp)
            if media_video is not None:
                media_latents = encode_media(media_video, dh, dw)
            ts1 = build_timesteps(
                first, fl * hl * wl, cfg.get("sampler"),
                max_timestep=strength if media_latents is not None else 1.0,
            )
            # strength truncates BOTH passes' schedules (the reference
            # threads ``strength`` into every ``retrieve_timesteps`` call,
            # ``pipeline_ltx_video.py:938-948`` — pass 2 included)
            ts2 = build_timesteps(
                second, n_tokens, cfg.get("sampler"),
                max_timestep=strength if media_latents is not None else 1.0,
            )
            first_pass_kwargs = dict(
                timesteps=ts1, **_pass_kwargs(first, stg_strategy)
            )
            if media_latents is not None:
                first_pass_kwargs.update(
                    media_latents=media_latents,
                    initial_timestep=float(ts1[0]),
                )
            result = ms.generate(
                prompt_embeds, prompt_mask,
                height=hp, width=wp, num_frames=fp,
                first_pass=first_pass_kwargs,
                second_pass=dict(
                    timesteps=ts2, **_pass_kwargs(second, stg_strategy)
                ),
                key=key, output_type=output_type, **common,
            )
        else:
            pass_cfg = {
                k: cfg[k]
                for k in ("guidance_scale", "stg_scale", "rescaling_scale",
                          "skip_block_list", "guidance_timesteps",
                          "num_inference_steps", "timesteps")
                if k in cfg
            }
            if sampling_steps is not None:
                pass_cfg["num_inference_steps"] = sampling_steps
            if media_video is not None:
                media_latents = encode_media(media_video, hp, wp)
            ts = build_timesteps(
                pass_cfg, n_tokens, cfg.get("sampler"),
                max_timestep=strength if media_latents is not None else 1.0,
            )
            extra = {}
            if media_latents is not None:
                extra = dict(
                    media_latents=media_latents,
                    initial_timestep=float(ts[0]),
                )
            result = self.pipeline.generate(
                prompt_embeds, prompt_mask,
                height=hp, width=wp, num_frames=fp,
                timesteps=ts, key=key, output_type=output_type,
                **_pass_kwargs(pass_cfg, stg_strategy), **common, **extra,
            )

        if output_type == "latent":
            return result
        with _stage("resize_quant_fetch"):
            frames = result[0]  # [F, H, W, 3] on device, [-1, 1]
            if frames.shape[1] != hp or frames.shape[2] != wp:
                # multi-scale pass 2 decodes at 2x the downscaled dims (can
                # exceed the request); bilinear-resize back to the padded
                # target (``pipeline_ltx_video.py:1891-1903``)
                frames = jax.image.resize(
                    jnp.asarray(frames),
                    (frames.shape[0], hp, wp, frames.shape[3]),
                    method="bilinear",
                )
            # crop padding ON DEVICE (a free slice) so the fetch moves
            # only requested pixels; shares the zero-pad edge cases with
            # the host-side helper
            frames = media_utils.crop_padding(
                jnp.asarray(frames), padding, frame_num
            )
            if output_type == "yuv420" and height % 2 == 0 and width % 2 == 0:
                # planar YUV420 fetch: half the bytes of uint8 RGB; the
                # native mp4 writer takes the planes directly
                # (media.save_video / native_codec.write_mp4_yuv)
                y, u, v = _rgb_to_yuv420(frames)
                return (np.asarray(y), np.asarray(u), np.asarray(v))
            # quantize to uint8 ON DEVICE before the host fetch: the video
            # writer wants uint8 anyway, and fetching float32 frames moves
            # 4x the bytes (~40 s extra at full res through this relay)
            frames = jnp.clip(
                (frames.astype(jnp.float32) + 1.0) * 127.5, 0, 255
            ).astype(jnp.uint8)
            out = np.asarray(frames)
        return out
