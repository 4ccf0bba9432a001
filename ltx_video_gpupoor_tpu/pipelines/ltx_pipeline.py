"""LTX-Video generation pipeline (single-scale pass), TPU-native.

Parity target: ``LTXVideoPipeline`` at
``/root/reference/ltx_video/pipelines/pipeline_ltx_video.py``:
- guidance-stream assembly [uncond, cond, perturbed] (``:1036-1051``),
- per-token conditioning timesteps ``min(t, 1 - conditioning_mask)``
  (``:1145-1150``), denoise-step masking of conditioned tokens
  (``denoising_step`` ``:1309-1342``),
- per-step conditioning-noise refresh
  (``add_noise_to_image_conditioning_latents`` ``:606-629``),
- CFG with CFG-star rescale (``:1189-1204``), spatio-temporal guidance
  (STG) with std-rescaling (``:1206-1222``),
- fractional RoPE coords: pixel coords / frame_rate on the time axis
  (``:1086-1088``), causal first-frame fix
  (``vae_encode.py:190-225``),
- initial latents from noised media (``prepare_latents`` ``:632-710``),
  decode-time noise augmentation (``:1269-1298``).

TPU-first redesign: the whole denoise loop is ONE ``lax.scan`` inside one
jit — per-step guidance scales / STG scales / skip-layer masks are scanned
arrays; guidance streams are batch rows (no joint_pass plumbing); interrupt
is host-side between jitted calls when running step-by-step mode.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.ltx import patchifier
from ..models.ltx import vae as ltx_vae
from ..models.ltx.transformer3d import (
    LTXTransformerConfig,
    SkipLayerStrategy,
    compute_freqs as _compute_freqs,
    forward as transformer_forward,
)
from ..schedulers import rf

# module-level so the jit cache survives across generate() calls (a
# fresh jax.jit wrapper per call would retrace every request)
_jit_compute_freqs = jax.jit(_compute_freqs, static_argnums=(0,))


# ---------------------------------------------------------------------------
# Conditioning
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class ConditioningItem:
    """In-grid conditioning media (ref ``ConditioningItem``,
    ``pipeline_ltx_video.py:202-219``): pixels ``[F, H, W, C]`` in [-1, 1]
    placed at ``frame_number`` (must map onto the latent grid)."""

    media: np.ndarray | jax.Array
    frame_number: int = 0
    strength: float = 1.0


def latent_to_pixel_coords(
    latent_coords: jax.Array,
    scale_factors: tuple[int, int, int],
    causal_fix: bool = True,
) -> jax.Array:
    """``[B, 3, N]`` latent coords -> pixel coords; the causal first frame
    covers 1 pixel frame instead of ``temporal_factor``
    (``vae_encode.py:215-225``)."""
    factors = jnp.asarray(scale_factors)[None, :, None]
    pixel = latent_coords * factors
    if causal_fix:
        t_fixed = jnp.clip(pixel[:, 0] + 1 - scale_factors[0], 0, None)
        pixel = pixel.at[:, 0].set(t_fixed)
    return pixel


def vae_encode(vae_params: dict, vae_cfg, media: jax.Array) -> jax.Array:
    """Encode dispatch: causal VAE or legacy ``video_autoencoder``."""
    if isinstance(vae_cfg, ltx_vae.VAEConfig):
        return ltx_vae.encode(vae_params, vae_cfg, media)
    from ..models.ltx import video_autoencoder as legacy_vae

    return legacy_vae.encode(vae_params, vae_cfg, media)


def vae_decode(vae_params: dict, vae_cfg, z: jax.Array,
               timestep=None, noise_key=None,
               target_frames=None) -> jax.Array:
    """Decode dispatch: causal VAE or legacy ``video_autoencoder``."""
    if isinstance(vae_cfg, ltx_vae.VAEConfig):
        return ltx_vae.decode(vae_params, vae_cfg, z, timestep, noise_key)
    from ..models.ltx import video_autoencoder as legacy_vae

    return legacy_vae.decode(vae_params, vae_cfg, z,
                             target_frames=target_frames)


# Eager VAE calls dispatch hundreds of ops one-by-one (catastrophic
# through a remote-device relay) — production paths go through these
# jitted wrappers. cfg / target_frames are static; params are arguments
# so weights don't bake into the executable.
_jit_vae_encode = jax.jit(vae_encode, static_argnums=(1,))
_jit_vae_decode = jax.jit(vae_decode, static_argnums=(1, 5))


def _decode_full(vae_params: dict, vae_cfg, latent_grid: jax.Array,
                 decode_timestep: jax.Array, decode_noise_scale: jax.Array,
                 key: jax.Array, z_tile: int, hw_tile: int,
                 mesh=None) -> jax.Array:
    """Full decode path as one traceable program: latent un-normalize,
    decode-timestep noising (``pipeline_ltx_video.py:1269-1298``), then
    the (tiled) causal VAE decode. Tiling loops unroll at trace time, so
    a 36-tile decode is one XLA dispatch instead of hundreds of eager
    relay round-trips."""
    stats = vae_params.get("per_channel_statistics")
    z = latent_grid if stats is None else \
        ltx_vae.un_normalize_latents(latent_grid, stats)
    if not isinstance(vae_cfg, ltx_vae.VAEConfig):
        from ..models.ltx import video_autoencoder as legacy_vae

        return legacy_vae.decode(vae_params, vae_cfg, z)
    t = None
    kd = None
    if vae_cfg.timestep_conditioning:
        kn, kd = jax.random.split(key)
        noise = jax.random.normal(kn, z.shape, z.dtype)
        s = decode_noise_scale.astype(z.dtype)
        z = z * (1 - s) + noise * s
        t = decode_timestep
    if z_tile or hw_tile:
        if mesh is not None:
            # multi-chip serving: the spatial tile grid fans out over
            # every mesh device instead of running sequentially on one
            from ..models.ltx.vae_tiling import parallel_tiled_decode

            return parallel_tiled_decode(
                mesh, vae_params, vae_cfg, z, z_tile=z_tile,
                hw_tile=hw_tile, timestep=t, noise_key=kd,
            )
        from ..models.ltx.vae_tiling import tiled_decode

        return tiled_decode(
            vae_params, vae_cfg, z, z_tile=z_tile, hw_tile=hw_tile,
            timestep=t, noise_key=kd,
        )
    return ltx_vae.decode(vae_params, vae_cfg, z, t, kd)


_jit_decode_full = jax.jit(
    _decode_full, static_argnums=(1,),
    static_argnames=("z_tile", "hw_tile", "mesh"),
)


def prepare_conditioning(
    init_latents: jax.Array,       # [B, F', H', W', C] noise-free latents
    items: Sequence[ConditioningItem],
    vae_params: dict,
    vae_cfg: ltx_vae.VAEConfig,
    num_prefix_latent_frames: int = 2,
) -> tuple[jax.Array, jax.Array, list]:
    """Write conditioning latents into the grid; out-of-grid handling for
    ``frame_number > 0`` items follows the reference
    (``pipeline_ltx_video.py:1449-1517``, ``:1613-1687`` "concat" mode):
    a sequence's tail beyond a ``num_prefix_latent_frames`` latent prefix
    lands on the grid, while the prefix (or a lone non-first frame)
    becomes EXTRA tokens carried alongside the sequence. Returns
    (latents, mask [B, F', H', W'], extras) where each extra is
    ``(z [B, fp, H', W', C], frame_number, strength)``."""
    b, f_lat, h_lat, w_lat, c = init_latents.shape
    mask = jnp.zeros((b, f_lat, h_lat, w_lat), init_latents.dtype)
    latents = init_latents
    t_factor = vae_cfg.temporal_downscale_factor
    sf = vae_cfg.spatial_downscale_factor
    height, width = h_lat * sf, w_lat * sf
    extras = []
    for item in items:
        media = jnp.asarray(item.media)
        if media.ndim == 4:
            media = media[None]
        if media.shape[2] != height or media.shape[3] != width:
            # items arrive at the generation's target size; each pass
            # (multi-scale runs at downscaled dims) resizes to its own
            # resolution (``_resize_conditioning_item``,
            # ``pipeline_ltx_video.py:1402, 1546-1564``)
            media = jax.image.resize(
                media,
                (media.shape[0], media.shape[1], height, width,
                 media.shape[4]),
                method="bilinear",
            )
        enc = _jit_vae_encode(vae_params, vae_cfg, media)
        z = ltx_vae.sample_posterior(enc)
        stats = vae_params.get("per_channel_statistics")
        if stats is not None:
            z = ltx_vae.normalize_latents(z, stats)
        assert item.frame_number % t_factor == 0, (
            f"conditioning frame {item.frame_number} not on the latent grid"
        )
        fz = z.shape[1]
        if item.frame_number == 0:
            latents = jax.lax.dynamic_update_slice(
                latents, z.astype(latents.dtype), (0, 0, 0, 0, 0)
            )
            mask = jax.lax.dynamic_update_slice(
                mask,
                jnp.full((b, fz, h_lat, w_lat), item.strength, mask.dtype),
                (0, 0, 0, 0),
            )
            continue
        # non-first frame/sequence
        fp = min(num_prefix_latent_frames, fz)
        if fz > fp:
            f_start = item.frame_number // t_factor + fp
            if f_start + (fz - fp) > latents.shape[1]:
                # dynamic_update_slice CLAMPS out-of-range starts, which
                # would silently write the conditioning at a shifted
                # frame offset — reject like the reference's shape error
                raise ValueError(
                    f"conditioning item at frame {item.frame_number} "
                    f"extends past the latent grid "
                    f"({f_start + fz - fp} > {latents.shape[1]})"
                )
            latents = jax.lax.dynamic_update_slice(
                latents, z[:, fp:].astype(latents.dtype),
                (0, f_start, 0, 0, 0),
            )
            mask = jax.lax.dynamic_update_slice(
                mask,
                jnp.full((b, fz - fp, h_lat, w_lat), item.strength,
                         mask.dtype),
                (0, f_start, 0, 0),
            )
        extras.append((z[:, :fp], item.frame_number, item.strength))
    return latents, mask, extras


def apply_conditioning(
    init_latents: jax.Array,
    items: Sequence[ConditioningItem],
    vae_params: dict,
    vae_cfg: ltx_vae.VAEConfig,
) -> tuple[jax.Array, jax.Array]:
    """In-grid-only view of ``prepare_conditioning`` (kept for callers
    that don't carry extra tokens)."""
    latents, mask, extras = prepare_conditioning(
        init_latents, items, vae_params, vae_cfg
    )
    assert not extras, (
        "out-of-grid conditioning requires the extra-token path "
        "(LTXPipeline.generate)"
    )
    return latents, mask


# ---------------------------------------------------------------------------
# Guidance schedule
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class GuidanceSchedule:
    """Per-step guidance arrays (built host-side from YAML pipeline
    configs — ``ltx_video/configs/*.yaml``)."""

    guidance_scale: np.ndarray    # [steps]
    stg_scale: np.ndarray         # [steps]
    rescaling_scale: np.ndarray   # [steps]
    skip_layer_mask: np.ndarray   # [steps, num_layers, num_conds]
    num_conds: int
    skip_layer_strategy: Optional[str]
    cfg_star_rescale: bool = True
    # the reference gates STG std-rescaling on any(rescaling != 1.0)
    # (``pipeline_ltx_video.py:998, 1211``) — with all-1 rescale the
    # factor would otherwise degenerate to std_text/std_pred, not no-op
    do_rescaling: bool = True

    @property
    def do_cfg(self) -> bool:
        # MUST match build_guidance_schedule's num_conds predicate: g of
        # exactly 0 or 1 means "no uncond stream" (the reference skips
        # CFG there) — counting g=0 as CFG would desync the stream rows
        # from num_conds when STG is on
        g = self.guidance_scale
        return self.num_conds >= 2 and bool(
            np.any((g != 0.0) & (g != 1.0))
        )

    @property
    def do_stg(self) -> bool:
        return bool(np.any(self.stg_scale > 0))


def _guidance_index(t, guidance_timesteps) -> int:
    """Bucket index for a sampled timestep: the FIRST i with
    ``guidance_timesteps[i] <= t`` (descending list), falling back to the
    last bucket (``pipeline_ltx_video.py:959-967``). Keeping the LAST i
    with ``t <= gt`` instead is off by one for every t strictly between
    two entries — silently wrong guidance on most steps."""
    for j, gt in enumerate(guidance_timesteps):
        if gt <= t:
            return j
    return len(guidance_timesteps) - 1


def _per_timestep(values, timesteps, guidance_timesteps):
    """Map per-guidance-timestep lists onto the sampled timesteps."""
    if not isinstance(values, (list, tuple)):
        return np.full(len(timesteps), float(values), np.float32)
    if guidance_timesteps is None:
        # per-step list already
        vals = list(values)
        if len(vals) < len(timesteps):
            vals = vals + [vals[-1]] * (len(timesteps) - len(vals))
        return np.asarray(vals[: len(timesteps)], np.float32)
    return np.asarray(
        [values[_guidance_index(t, guidance_timesteps)]
         for t in np.asarray(timesteps)],
        np.float32,
    )


def build_guidance_schedule(
    timesteps: np.ndarray,
    num_layers: int,
    guidance_scale=1.0,
    stg_scale=0.0,
    rescaling_scale=1.0,
    skip_block_list=None,
    guidance_timesteps=None,
    skip_layer_strategy: Optional[str] = SkipLayerStrategy.AttentionValues,
    cfg_star_rescale: bool = True,
) -> GuidanceSchedule:
    steps = len(timesteps)
    g = _per_timestep(guidance_scale, timesteps, guidance_timesteps)
    s = _per_timestep(stg_scale, timesteps, guidance_timesteps)
    r = _per_timestep(rescaling_scale, timesteps, guidance_timesteps)
    # guidance <= 1 means "no CFG" and is zeroed up front
    # (``pipeline_ltx_video.py:982``: ``x if x > 1.0 else 0.0``)
    g = np.where(g > 1.0, g, 0.0).astype(np.float32)
    do_cfg = bool(np.any((g != 0.0) & (g != 1.0)))
    do_stg = bool(np.any(s > 0))
    num_conds = 1 + (1 if do_cfg else 0) + (1 if do_stg else 0)

    # per-step skip-block lists -> [steps, L, num_conds] keep-masks
    mask = np.ones((steps, num_layers, num_conds), np.float32)
    if do_stg and skip_block_list is not None:
        ptb = num_conds - 1
        if len(skip_block_list) and isinstance(skip_block_list[0], (list, tuple)):
            if guidance_timesteps is not None:
                per_step_lists = [
                    skip_block_list[
                        min(_guidance_index(t, guidance_timesteps),
                            len(skip_block_list) - 1)
                    ]
                    for t in np.asarray(timesteps)
                ]
            else:
                per_step_lists = [
                    skip_block_list[min(i, len(skip_block_list) - 1)]
                    for i in range(steps)
                ]
        else:
            per_step_lists = [skip_block_list] * steps
        for i, blocks in enumerate(per_step_lists):
            for blk in blocks:
                if blk < num_layers:
                    mask[i, blk, ptb] = 0.0
    return GuidanceSchedule(
        guidance_scale=g, stg_scale=s, rescaling_scale=r,
        skip_layer_mask=mask, num_conds=num_conds,
        skip_layer_strategy=skip_layer_strategy if do_stg else None,
        cfg_star_rescale=cfg_star_rescale,
        do_rescaling=bool(np.any(r != 1.0)),
    )


# ---------------------------------------------------------------------------
# TeaCache schedule (LTX)
# ---------------------------------------------------------------------------

def ltx_teacache_schedule(
    transformer_params: dict,
    cfg: LTXTransformerConfig,
    timesteps: np.ndarray,
    multiplier: float,
    start_step: int = 0,
) -> np.ndarray:
    """Static per-step compute mask for the LTX DiT.

    The reference ships TeaCache for Wan only (``model.py:854-899``); the
    same signal exists here — the adaLN-single timestep embedding — so the
    flagship family gets the same speed knob. Precomputed host-side: the
    skip decisions depend only on the (static) timestep list.
    """
    from ..models.ltx import transformer3d as t3d
    from . import teacache

    t = np.asarray(timesteps, np.float32) * cfg.timestep_scale_multiplier
    emb = t3d.timestep_embedding(
        jnp.asarray(t), cfg.frequency_embedding_size
    )
    e = t3d._apply_linear(transformer_params["adaln"]["emb_linear_1"], emb)
    e = jax.nn.silu(e)
    e_list = np.asarray(
        t3d._apply_linear(transformer_params["adaln"]["emb_linear_2"], e),
        np.float32,
    )
    return teacache.calibrate_mask(e_list, multiplier, start_step=start_step)


# ---------------------------------------------------------------------------
# Denoise loop
# ---------------------------------------------------------------------------

def denoise(
    transformer_params: dict,
    transformer_cfg: LTXTransformerConfig,
    latents: jax.Array,            # [1, N, C] patchified tokens (noised)
    init_latents: jax.Array,       # [1, N, C] conditioning reference
    conditioning_mask: jax.Array,  # [1, N] strength per token (0 = free)
    indices_grid: jax.Array,       # [1, 3, N] fractional coords
    timesteps: jax.Array,          # [steps]
    schedule: GuidanceSchedule,
    prompt_embeds: jax.Array,      # [2 or 1, Sc, caption_dim] (neg, pos)
    prompt_mask: jax.Array,        # same leading dim
    key: jax.Array,
    num_frame_groups: int,
    image_cond_noise_scale: float = 0.0,
    stochastic_sampling: bool = False,
    attn_mode: str = "auto",
    teacache_mask: Optional[np.ndarray] = None,  # [steps] bool compute-mask
    sp_mesh=None,
    sp_axis: str = "sp",
    interrupt_flag=None,
    progress_callback=None,
) -> jax.Array:
    """Run the full denoise loop.

    Fast path: one scanned, jittable program. With ``interrupt_flag`` or
    ``progress_callback`` set, steps run in a host loop (one jitted step
    per iteration) so cancellation/progress work at step granularity — the
    reference's per-block interrupt (``transformer3d.py:468-487``)
    translated to the compiled-loop world (SURVEY §5).
    """
    num_conds = schedule.num_conds
    n_tokens = latents.shape[1]
    b = latents.shape[0]
    assert b == 1, "guidance streams occupy the batch dim; batch=1 per call"

    if sp_mesh is not None:
        # serving robustness: USP needs tokens, heads, and timestep groups
        # to divide over sp — shapes that don't (odd user resolutions)
        # fall back to the single-program path instead of erroring the
        # request; scale-out re-engages at the next conforming shape
        sp = sp_mesh.shape[sp_axis]
        if (n_tokens % sp or transformer_cfg.num_attention_heads % sp
                or num_frame_groups % sp):
            import logging

            logging.getLogger(__name__).warning(
                "USP disabled for this call: tokens=%d / heads=%d / "
                "frame groups=%d not all divisible by sp=%d",
                n_tokens, transformer_cfg.num_attention_heads,
                num_frame_groups, sp,
            )
            sp_mesh = None

    # assemble per-stream text embeddings: [uncond, cond, perturbed=cond]
    if num_conds == 1:
        ctx = prompt_embeds[-1:]
        ctx_mask = prompt_mask[-1:]
    else:
        rows = []
        if schedule.do_cfg:
            if prompt_embeds.shape[0] < 2:
                raise ValueError(
                    "CFG needs [negative, positive] prompt embeddings "
                    f"(got {prompt_embeds.shape[0]} row); pass "
                    "guidance_scale<=1 for single-prompt runs"
                )
            rows = [0, 1]
        else:
            rows = [1] if prompt_embeds.shape[0] > 1 else [0]
        if schedule.do_stg:
            rows.append(rows[-1])
        ctx = jnp.concatenate([prompt_embeds[i:i + 1] for i in rows], axis=0)
        ctx_mask = jnp.concatenate([prompt_mask[i:i + 1] for i in rows], axis=0)

    rf_sched = rf.RectifiedFlowSchedule(timesteps=jnp.asarray(timesteps))
    coords = jnp.concatenate([indices_grid] * num_conds, axis=0)
    # RoPE tables from the batch-1 grid: they broadcast over the guidance
    # streams in apply_rotary_emb, so materializing num_conds identical
    # multi-MB copies across the whole scan would waste HBM for nothing
    freq_coords = indices_grid
    cond_mask_tokens = conditioning_mask  # [1, N]
    tokens_per_group = n_tokens // num_frame_groups

    per_step = {
        "t": jnp.asarray(timesteps, jnp.float32),
        "g": jnp.asarray(schedule.guidance_scale),
        "stg": jnp.asarray(schedule.stg_scale),
        "rescale": jnp.asarray(schedule.rescaling_scale),
        "skip": jnp.asarray(schedule.skip_layer_mask),  # [steps, L, conds]
        "key": jax.random.split(key, len(np.asarray(timesteps))),
    }
    use_tc = teacache_mask is not None
    if use_tc:
        per_step["compute"] = jnp.asarray(np.asarray(teacache_mask, bool))

    # RoPE tables are step-invariant: build once outside the scan (XLA's
    # loop-invariant motion won't hoist the multi-MB cos/sin tables out
    # of the scan body itself). Under USP the same precomputed tables
    # enter shard_map token-sharded, so each shard reads its GLOBAL rows.
    rope_freqs = _jit_compute_freqs(transformer_cfg, freq_coords)

    def body(carry, step):
        if use_tc:
            latents, residual = carry
        else:
            latents = carry
        t = step["t"]
        k_noise, k_step = jax.random.split(step["key"])

        if image_cond_noise_scale > 0.0:
            noise = jax.random.normal(k_noise, latents.shape, latents.dtype)
            need = (cond_mask_tokens > 1.0 - 1e-6)[..., None]
            noised = init_latents + image_cond_noise_scale * noise * (t**2)
            latents = jnp.where(need, noised, latents)

        # per-token timesteps: conditioned tokens freeze at 1 - strength
        t_tokens = jnp.minimum(t, 1.0 - cond_mask_tokens)  # [1, N]
        t_groups = t_tokens.reshape(1, num_frame_groups, tokens_per_group)[
            :, :, 0
        ]  # [1, G]

        x = jnp.concatenate([latents] * num_conds, axis=0)
        tg = jnp.concatenate([t_groups] * num_conds, axis=0)
        skip = step["skip"]  # [L, num_conds]; stream rows ARE the batch

        if sp_mesh is not None:
            # USP: every evaluation runs under one shard_map over sp_axis
            from ..parallel.usp import usp_ltx_forward

            tc_kw = (
                dict(previous_residual=residual, compute=step["compute"])
                if use_tc else {}
            )
            pred, new_res = usp_ltx_forward(
                sp_mesh, transformer_params, transformer_cfg,
                x, coords, tg, ctx, caption_mask=ctx_mask,
                skip_layer_mask=skip,
                skip_layer_strategy=schedule.skip_layer_strategy,
                axis_name=sp_axis, attn_mode=attn_mode,
                freqs=rope_freqs, **tc_kw,
            )
            if use_tc:
                residual = new_res
            pred = pred.astype(jnp.float32)
        elif use_tc:
            pred, residual = transformer_forward(
                transformer_params, transformer_cfg,
                x, coords, tg, ctx, ctx_mask,
                skip_layer_mask=skip,
                skip_layer_strategy=schedule.skip_layer_strategy,
                attn_mode=attn_mode,
                previous_residual=residual,
                compute=step["compute"],
                return_residual=True,
                freqs=rope_freqs,
            )
            pred = pred.astype(jnp.float32)
        else:
            pred = transformer_forward(
                transformer_params, transformer_cfg,
                x, coords, tg, ctx, ctx_mask,
                skip_layer_mask=skip,
                skip_layer_strategy=schedule.skip_layer_strategy,
                attn_mode=attn_mode,
                freqs=rope_freqs,
            ).astype(jnp.float32)

        streams = jnp.split(pred, num_conds, axis=0)
        if schedule.do_stg:
            pred_text, pred_ptb = streams[-2], streams[-1]
        else:
            pred_text = streams[-1]
        if schedule.do_cfg:
            pred_uncond = streams[0]
            pred_text = streams[1]
            if schedule.cfg_star_rescale:
                dot = jnp.sum(pred_text * pred_uncond)
                sq = jnp.sum(pred_uncond**2) + 1e-8
                pred_uncond = (dot / sq) * pred_uncond
            guided = pred_uncond + step["g"] * (pred_text - pred_uncond)
            # g == 0 or 1 -> plain text prediction (ref skips CFG then)
            use_cfg = (step["g"] != 0.0) & (step["g"] != 1.0)
            noise_pred = jnp.where(use_cfg, guided, pred_text)
        else:
            noise_pred = pred_text
        if schedule.do_stg:
            noise_pred = noise_pred + step["stg"] * (pred_text - pred_ptb)
            if schedule.do_rescaling:  # static: any(rescaling != 1.0)
                std_text = jnp.std(pred_text)
                std_pred = jnp.std(noise_pred)
                factor = std_text / (std_pred + 1e-8)
                factor = step["rescale"] * factor + (1 - step["rescale"])
                noise_pred = jnp.where(
                    step["stg"] > 0.0, noise_pred * factor, noise_pred
                )

        denoised = rf.step(
            rf_sched, noise_pred.astype(latents.dtype), t_tokens, latents,
            stochastic_sampling=stochastic_sampling, key=k_step,
        )
        # conditioned tokens only start moving once t < 1 - strength
        to_denoise = (t - 1e-6 < (1.0 - cond_mask_tokens))[..., None]
        latents = jnp.where(to_denoise, denoised, latents)
        return ((latents, residual) if use_tc else latents), None

    if use_tc:
        # residual carry for TeaCache reuse; step 0 always computes, so the
        # zero init is never consumed
        carry0 = (
            latents,
            jnp.zeros(
                (num_conds, n_tokens, transformer_cfg.inner_dim),
                latents.dtype,
            ),
        )
    else:
        carry0 = latents

    if interrupt_flag is None and progress_callback is None:
        carry, _ = jax.lax.scan(body, carry0, per_step)
        return carry[0] if use_tc else carry

    from ..core.interrupt import check

    # per-call wrapper by necessity: body closes over this call's params
    # and conditioning, so the trace cannot be shared across generate()
    # calls. Only the interrupt/progress host loop pays this; the serving
    # fast path is the scan above.
    step_fn = jax.jit(lambda lat, step: body(lat, step)[0])
    n_steps = len(np.asarray(timesteps))
    carry = carry0
    for i in range(n_steps):
        check(interrupt_flag)
        step_i = jax.tree.map(lambda a: a[i], per_step)
        carry = step_fn(carry, step_i)
        if progress_callback is not None:
            progress_callback(i, n_steps)
    return carry[0] if use_tc else carry


# ---------------------------------------------------------------------------
# End-to-end single-pass generation
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class LTXPipeline:
    """Bundles params/configs; methods are thin wrappers over pure fns."""

    transformer_params: dict
    transformer_cfg: LTXTransformerConfig
    vae_params: dict
    vae_cfg: ltx_vae.VAEConfig
    tokenizer: object = None          # HF tokenizer (optional in tests)
    t5_params: dict = None
    t5_cfg: object = None
    # sequence parallelism: when set, every denoiser evaluation runs
    # usp_ltx_forward under one shard_map over `sp_axis`
    sp_mesh: object = None
    sp_axis: str = "sp"
    # the FULL serving mesh (dp*sp*tp — also set when sp == 1): tiled
    # VAE decodes fan their spatial tile grid over every device
    mesh: object = None
    # (z_tile latent frames, hw_tile pixels) for the VAE decode; None =
    # size-based auto: untiled below the measured 16 GiB-HBM envelope
    # (704x480x121f decodes untiled in 0.49 s), tiled above it — the
    # reference's VRAM-class policy (``vae.py:92-115``) translated to a
    # footprint rule
    vae_tile_size: Optional[tuple] = None

    def encode_prompt(self, prompts: list[str], max_len: int = 256):
        """Tokenize + T5-encode. Returns (embeds [B, S, D], mask [B, S]).
        Pads to ``max_len`` (a 128 multiple — the reference's TPU
        constraint, ``pipeline_ltx_video.py:368-370``)."""
        from ..models import t5 as jt5

        enc = self.tokenizer(
            prompts, padding="max_length", max_length=max_len,
            truncation=True, return_tensors="np", add_special_tokens=True,
        )
        ids = jnp.asarray(enc["input_ids"], jnp.int32)
        mask = jnp.asarray(enc["attention_mask"], jnp.int32)
        embeds = jt5.encode(self.t5_params, self.t5_cfg, ids, mask)
        return embeds, mask

    def latent_shape(self, height: int, width: int, num_frames: int):
        sf = self.vae_cfg.spatial_downscale_factor
        tf = self.vae_cfg.temporal_downscale_factor
        return (
            (num_frames - 1) // tf + 1,
            height // sf,
            width // sf,
        )

    def generate(
        self,
        prompt_embeds: jax.Array,      # [2, S, D] (neg, pos) or [1, S, D]
        prompt_mask: jax.Array,
        height: int,
        width: int,
        num_frames: int,
        num_inference_steps: int = 30,
        timesteps: Optional[Sequence[float]] = None,
        frame_rate: float = 25.0,
        key: Optional[jax.Array] = None,
        conditioning_items: Sequence[ConditioningItem] = (),
        media_latents: Optional[jax.Array] = None,
        initial_timestep: Optional[float] = None,
        guidance_scale=3.0,
        stg_scale=0.0,
        rescaling_scale=1.0,
        skip_block_list=None,
        guidance_timesteps=None,
        skip_layer_strategy=SkipLayerStrategy.AttentionValues,
        image_cond_noise_scale: float = 0.0,
        stochastic_sampling: bool = False,
        sampler: str = "Uniform",
        shift: Optional[float] = None,
        shifting: Optional[str] = "SD3",
        target_shift_terminal: Optional[float] = 0.1,
        output_type: str = "latent",
        decode_timestep: float = 0.0,
        decode_noise_scale: Optional[float] = None,
        attn_mode: str = "auto",
        teacache_multiplier: float = 0.0,
        interrupt_flag=None,
        progress_callback=None,
        noise: Optional[jax.Array] = None,
    ):
        from ..utils.observability import stage as _stage

        key = key if key is not None else jax.random.key(0)
        f_lat, h_lat, w_lat = self.latent_shape(height, width, num_frames)
        c = self.transformer_cfg.in_channels

        sched = rf.make_schedule(
            num_inference_steps,
            sampler=sampler,
            shift=shift,
            shifting=shifting,
            n_media_tokens=f_lat * h_lat * w_lat,
            target_shift_terminal=target_shift_terminal,
            timesteps=None if timesteps is None else jnp.asarray(timesteps),
        )
        ts = np.asarray(sched.timesteps)

        k_noise, k_denoise, k_decode, k_extras = jax.random.split(key, 4)
        if noise is None:
            # injectable for deterministic replay / reference-oracle runs
            # (the reference pipeline's ``latents=`` argument,
            # ``pipeline_ltx_video.py:632-710``)
            noise = jax.random.normal(
                k_noise, (1, f_lat * h_lat * w_lat, c), jnp.float32
            )
        noise_grid = patchifier.unpatchify(noise, h_lat, w_lat, c)

        if media_latents is not None:
            t0 = float(ts[0]) if initial_timestep is None else initial_timestep
            init = t0 * noise_grid + (1 - t0) * media_latents.astype(jnp.float32)
        else:
            init = noise_grid

        cond_mask_grid = jnp.zeros((1, f_lat, h_lat, w_lat), jnp.float32)
        extras = []
        if conditioning_items:
            with _stage("cond_encode", sync=lambda: cond_latents):
                cond_latents, cond_mask_grid, extras = prepare_conditioning(
                    jnp.zeros((1, f_lat, h_lat, w_lat, c), jnp.float32),
                    conditioning_items, self.vae_params, self.vae_cfg,
                )
            # lerp(noised init, clean conditioning latents, strength) at the
            # conditioned positions (``pipeline_ltx_video.py:1443-1452``)
            strength = cond_mask_grid[..., None]
            init = init + strength * (cond_latents.astype(init.dtype) - init)

        tokens, latent_coords = patchifier.patchify(init)
        cond_mask_tokens = cond_mask_grid.reshape(1, -1)

        scale_factors = (
            self.vae_cfg.temporal_downscale_factor,
            self.vae_cfg.spatial_downscale_factor,
            self.vae_cfg.spatial_downscale_factor,
        )
        pixel_coords = latent_to_pixel_coords(
            latent_coords, scale_factors, causal_fix=True
        ).astype(jnp.float32)

        # out-of-grid conditioning: extra tokens PREPENDED with their own
        # pixel coordinates (frame axis offset by the media frame number),
        # mask = strength, latents = lerp(noise, z, strength) — the
        # reference's non-TPU path (``pipeline_ltx_video.py:1466-1517``;
        # its TPU branch trims these, ours keeps them: padding + masking
        # removes the 128-multiple constraint)
        num_extra_tokens = 0
        extra_frame_groups = 0
        if extras:
            ex_tokens, ex_coords, ex_masks = [], [], []
            for i, (z, frame_number, strength_i) in enumerate(extras):
                # fresh stream: k_noise was already consumed for the base
                # noise (single-use key discipline)
                k_extras, k_ex = jax.random.split(k_extras)
                zt, z_coords = patchifier.patchify(z.astype(jnp.float32))
                ex_noise = jax.random.normal(k_ex, zt.shape, jnp.float32)
                zt = ex_noise + strength_i * (zt - ex_noise)
                pc = latent_to_pixel_coords(
                    z_coords, scale_factors, causal_fix=True
                ).astype(jnp.float32)
                pc = pc.at[:, 0].add(float(frame_number))
                ex_tokens.append(zt)
                ex_coords.append(pc)
                ex_masks.append(
                    jnp.full((1, zt.shape[1]), strength_i, jnp.float32)
                )
                extra_frame_groups += z.shape[1]
            tokens = jnp.concatenate(ex_tokens + [tokens], axis=1)
            pixel_coords = jnp.concatenate(ex_coords + [pixel_coords], axis=2)
            cond_mask_tokens = jnp.concatenate(
                ex_masks + [cond_mask_tokens], axis=1
            )
            num_extra_tokens = sum(t.shape[1] for t in ex_tokens)

        init_tokens = tokens
        pixel_coords = pixel_coords.at[:, 0].multiply(1.0 / frame_rate)

        schedule = build_guidance_schedule(
            ts, self.transformer_cfg.num_layers,
            guidance_scale=guidance_scale, stg_scale=stg_scale,
            rescaling_scale=rescaling_scale, skip_block_list=skip_block_list,
            guidance_timesteps=guidance_timesteps,
            skip_layer_strategy=skip_layer_strategy,
        )

        tc_mask = None
        if teacache_multiplier and teacache_multiplier > 1.0:
            tc_mask = ltx_teacache_schedule(
                self.transformer_params, self.transformer_cfg, ts,
                teacache_multiplier,
            )

        with _stage("denoise", sync=lambda: latents):
            latents = denoise(
                self.transformer_params, self.transformer_cfg,
                tokens, init_tokens, cond_mask_tokens, pixel_coords,
                sched.timesteps, schedule, prompt_embeds, prompt_mask,
                k_denoise, num_frame_groups=f_lat + extra_frame_groups,
                image_cond_noise_scale=image_cond_noise_scale,
                stochastic_sampling=stochastic_sampling,
                attn_mode=attn_mode,
                teacache_mask=tc_mask,
                sp_mesh=self.sp_mesh,
                sp_axis=self.sp_axis,
                interrupt_flag=interrupt_flag,
                progress_callback=progress_callback,
            )
        if num_extra_tokens:
            # drop the extra conditioning tokens before decoding
            # (``pipeline_ltx_video.py:1240-1243`` semantics)
            latents = latents[:, num_extra_tokens:]

        latent_grid = patchifier.unpatchify(latents, h_lat, w_lat, c)
        if output_type == "latent":
            return latent_grid
        with _stage("vae_decode", sync=lambda: px):
            px = self.decode(
                latent_grid, decode_timestep, decode_noise_scale, k_decode
            )
        return px

    def _decode_tiles(self, z: jax.Array) -> tuple[int, int]:
        """(z_tile, hw_tile) for this latent shape."""
        if not isinstance(self.vae_cfg, ltx_vae.VAEConfig):
            return (0, 0)  # legacy VAE: no tiling support
        if self.vae_tile_size is not None:
            return self.vae_tile_size
        sf = self.vae_cfg.spatial_downscale_factor
        tf = self.vae_cfg.temporal_downscale_factor
        h, w = z.shape[2] * sf, z.shape[3] * sf
        frames = (z.shape[1] - 1) * tf + 1
        n_dev = self.mesh.devices.size if self.mesh is not None else 1
        if n_dev > 1:
            # multi-chip: prefer spatial tiles so the decode fans over
            # the mesh (parallel_tiled_decode) — the ~1.3-1.8x overlap
            # recompute is far below the n_dev-way parallelism. 256 px
            # tiles give >= n_dev tiles at serving shapes; 512 when the
            # device count is small (fewer seams).
            hw = 256 if n_dev >= 4 else 512
            if (z.shape[2] > hw // sf or z.shape[3] > hw // sf):
                envelope = 704 * 480 * 121
                zt = 0 if h * w * frames <= envelope else 4
                return (zt, hw)
        # voxel budget: the measured 16 GiB untiled envelope
        envelope = 704 * 480 * 121
        if h * w * frames <= envelope:
            return (0, 0)
        # z-only tiling when one temporal chunk fits the envelope —
        # spatial tiles add 7.6x the dispatch/blend surface for nothing
        if h * w * (4 * tf + 1) <= envelope:
            return (4, 0)
        return (4, 512)

    def decode(self, latent_grid, decode_timestep=0.0,
               decode_noise_scale=None, key=None):
        if decode_noise_scale is None:
            decode_noise_scale = decode_timestep
        if key is None:
            key = jax.random.key(0)
        z_tile, hw_tile = self._decode_tiles(latent_grid)
        # un-normalize + decode-noise + (tiled) decode compile as ONE
        # program: the former eager noise prep + host tile loop paid a
        # relay dispatch per op (~90 s for the pass-2 36-tile decode)
        return _jit_decode_full(
            self.vae_params, self.vae_cfg, latent_grid,
            jnp.asarray(decode_timestep, jnp.float32),
            jnp.asarray(decode_noise_scale, jnp.float32),
            key, z_tile=z_tile, hw_tile=hw_tile,
            mesh=self.mesh if hw_tile else None,
        )
