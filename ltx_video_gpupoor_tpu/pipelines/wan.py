"""Wan 2.1 generation pipelines (t2v, i2v, Phantom, VACE, ReCamMaster).

Parity targets:
- ``WanT2V.generate`` (``/root/reference/wan/text2video.py:281-596``):
  UniPC / DPM++ / basic flow-match solver selection (``:414-434``), RoPE
  with optional RIFLEx (``:440-445``), CFG with CFG-Zero-star (zeroed first
  steps + alpha-rescaled uncond, ``:542-562``), SLG layer-skip window
  (``:492``), TeaCache (``:461-464``), Phantom ref-image latents
  (``:394-401, 503-507``), VACE context (``:379-392``), ReCamMaster source
  latents + camera embedding (``:367-377, 488-491``);
- ``WanI2V.generate`` (``/root/reference/wan/image2video.py:124-426``):
  CLIP visual context + first(/last)-frame VAE latents concatenated with
  the 4x-repeated frame mask (``:232-280``).

TPU-first: the denoise loop is a single ``lax.scan``; guidance streams are
batch rows; the TeaCache skip schedule is PRECOMPUTED host-side (the
reference's runtime decisions depend only on the timestep list — see
``model.py:854-899, 1030-1057`` — so they are deterministic and static).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.wan import model as wan_model
from ..models.wan import vae as wan_vae
from ..ops.rope import wan_rope_freqs
from ..schedulers import dpm as jdpm
from ..schedulers import flowmatch as jfm
from ..schedulers import unipc as junipc
from . import teacache

# Published TeaCache polynomial coefficients for the Wan 2.1 family (from
# the TeaCache project; the reference consumes them via the externally-set
# ``model.coefficients`` attribute, ``model.py:856, 1038``).
TEACACHE_COEFFICIENTS = {
    "t2v_1.3B": [2.39676752e03, -1.31110545e03, 2.01331979e02,
                 -8.29855975e00, 1.37887774e-01],
    "t2v_14B": [-5784.54975374, 5449.50911966, -1811.16591783,
                256.27178429, -13.02252404],
    "i2v_480p": [-3.02331670e02, 2.23948934e02, -5.25463970e01,
                 5.87348440e00, -2.01973289e-01],
    "i2v_720p": [-114.36346466, 65.26524496, -18.82220707,
                 4.91518089, -0.23412683],
}


def optimized_scale(positive: jax.Array, negative: jax.Array) -> jax.Array:
    """CFG-Zero-star alpha: projection of cond onto uncond
    (``text2video.py:29-41``)."""
    dot = jnp.sum(positive * negative)
    sq = jnp.sum(negative * negative) + 1e-8
    return dot / sq


# ---------------------------------------------------------------------------
# TeaCache schedule precompute
# ---------------------------------------------------------------------------

def teacache_skip_schedule(
    model_params: dict,
    cfg: wan_model.WanConfig,
    timesteps: np.ndarray,
    coefficients: Sequence[float],
    multiplier: float,
    start_step: int = 0,
) -> np.ndarray:
    """Static boolean compute-mask per step.

    Mirrors ``compute_teacache_threshold`` (``model.py:854-899``): calibrate
    the threshold so executed steps ~= len(timesteps)/multiplier, then apply
    the runtime accumulation rule — all of it depends only on the timestep
    embeddings, so it is precomputable.
    """
    emb = wan_model.sinusoidal_embedding_1d(
        cfg.freq_dim, jnp.asarray(np.asarray(timesteps, np.float32))
    )
    e = wan_model._apply(model_params["time_embedding"]["fc1"], emb)
    e = jax.nn.silu(e)
    e_list = np.asarray(
        wan_model._apply(model_params["time_embedding"]["fc2"], e),
        np.float32,
    )
    return teacache.calibrate_mask(
        e_list, multiplier, coefficients, start_step
    )


# ---------------------------------------------------------------------------
# Pipeline
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class WanPipeline:
    model_params: dict
    model_cfg: wan_model.WanConfig
    vae_params: dict
    vae_cfg: wan_vae.WanVAEConfig
    vae_stride: tuple = (4, 8, 8)
    num_train_timesteps: int = 1000
    # sequence parallelism: when a mesh is set, every denoiser evaluation
    # runs usp_wan_forward (one shard_map over `sp_axis`; frames sharded,
    # Ulysses all-to-all self-attention) — the xDiT USP serving mode
    sp_mesh: object = None
    sp_axis: str = "sp"
    # the FULL serving mesh (set for BOTH sp- and tp-style meshes):
    # tiled VAE decodes fan their tile grid over every device
    mesh: object = None
    # pixel tile size for VAE decode/encode; 0 = untiled
    # (reference get_VAE_tile_size policy, ``wan/modules/vae.py:790-811``)
    vae_tile_size: int = 256
    # optional encoder weights (loaded by serving.model_zoo.load_wan_model):
    # the pipeline itself takes pre-computed context / CLIP features, so
    # callers run models.t5.encode / models.wan.clip with these
    t5_params: Optional[dict] = None
    t5_cfg: object = None
    clip_params: Optional[dict] = None
    clip_cfg: object = None

    def _vae_decode(self, latents):
        if self.vae_tile_size:
            mesh = self.mesh if self.mesh is not None else self.sp_mesh
            if mesh is not None and mesh.devices.size > 1:
                # multi-chip: tile grid fans out over every mesh device
                # (one fused compile, amortized by the persistent cache)
                return wan_vae.parallel_spatial_tiled_decode_fused(
                    mesh, self.vae_params, self.vae_cfg, latents,
                    tile_size=self.vae_tile_size,
                )
            # host tile loop, NOT the fused jit: the Wan decode is
            # compute-bound (measured 8.04 s eager vs 7.96 s fused at
            # 832x480x81f) and the fused graph costs a 264 s cold
            # compile — unlike the LTX decode, where tile dispatch
            # overhead dominated and fusing was a 200x win
            return wan_vae.spatial_tiled_decode(
                self.vae_params, self.vae_cfg, latents,
                tile_size=self.vae_tile_size,
            )
        return wan_vae._tile_decode(self.vae_params, self.vae_cfg, latents)

    def _solve_schedule(self, solver, steps, shift):
        if solver == "unipc":
            return junipc.unipc_sigmas(steps, shift=shift)
        if solver == "dpm++":
            return jdpm.dpm_sigmas_from_custom(
                jdpm.get_sampling_sigmas(steps, shift)
            )
        if solver == "euler":
            sched = jfm.make_flowmatch_schedule(steps, shift=shift)
            return jnp.concatenate([sched.sigmas, jnp.zeros((1,))])
        raise ValueError(f"unsupported solver {solver!r}")

    def latent_shape(self, height, width, frame_num, extra_frames=0):
        return (
            (frame_num - 1) // self.vae_stride[0] + 1 + extra_frames,
            height // self.vae_stride[1],
            width // self.vae_stride[2],
        )

    def denoise(
        self,
        latents: jax.Array,           # [1, F', H', W', z]
        context: jax.Array,           # [2, text_len, text_dim] (pos, neg)
        context_mask: jax.Array,
        sigmas: jax.Array,            # [steps+1]
        *,
        guide_scale: float = 5.0,
        solver: str = "unipc",
        cfg_star_switch: bool = True,
        cfg_zero_step: int = 5,
        slg_layers: Optional[Sequence[int]] = None,
        slg_start: float = 0.0,
        slg_end: float = 1.0,
        enable_riflex: bool = False,
        clip_features: Optional[jax.Array] = None,
        y: Optional[jax.Array] = None,          # i2v cond [1, F', H', W', 20]
        ref_latents: Optional[jax.Array] = None,  # Phantom [1, R, H', W', z]
        ref_latents_neg: Optional[jax.Array] = None,
        source_latents: Optional[jax.Array] = None,  # ReCamMaster
        cam_emb: Optional[jax.Array] = None,
        vace_context: Optional[jax.Array] = None,
        vace_scale: float = 1.0,
        teacache_mask: Optional[np.ndarray] = None,  # [steps] bool
        attn_mode: str = "auto",
        # sliding-window continuation latents, INCLUDING the boundary
        # frame (the reference pins ``overlapped.shape[1] + 1`` frames —
        # ``text2video.py:456``; pass that full region here)
        overlapped_latents: Optional[jax.Array] = None,  # [1, n+1, H', W', z]
        overlap_noise: float = 0.0,
        key: Optional[jax.Array] = None,
    ) -> jax.Array:
        cfg = self.model_cfg
        if solver not in ("unipc", "dpm++", "euler"):
            raise ValueError(f"unsupported solver {solver!r}")
        num_steps = sigmas.shape[0] - 1
        # guide_scale == 1 takes precedence over Phantom in the reference
        # (``text2video.py:498-500``): a single cond pass on the bare
        # latents, ref images never appended
        phantom = ref_latents is not None and guide_scale != 1
        f_all = latents.shape[1] + (
            ref_latents.shape[1] if phantom else 0
        )
        if source_latents is not None:
            f_all = latents.shape[1] + source_latents.shape[1]
        h_tok = latents.shape[2] // cfg.patch_size[1]
        w_tok = latents.shape[3] // cfg.patch_size[2]
        freqs = wan_rope_freqs(
            (f_all, h_tok, w_tok), head_dim=cfg.head_dim,
            enable_riflex=enable_riflex,
        )

        # per-request single-device fallback (the LTX pipeline's serving
        # contract): shapes that don't divide the sequence mesh run this
        # request unsharded instead of raising
        sp_mesh = self.sp_mesh
        if sp_mesh is not None:
            sp = sp_mesh.shape[self.sp_axis]
            if cfg.patch_size[0] != 1 or f_all % sp or cfg.num_heads % sp:
                import logging

                logging.getLogger(__name__).warning(
                    "sp-mesh fallback: frames=%d heads=%d patch_t=%d do "
                    "not divide sp=%d; running this request single-device",
                    f_all, cfg.num_heads, cfg.patch_size[0], sp,
                )
                sp_mesh = None

        # SLG keep-mask per step: cond stream index 0, uncond index 1 — the
        # reference skips slg layers for the UNCOND stream only
        # (``model.py:1077-1080``: x_id != 0 path)
        num_streams = 3 if phantom else (2 if guide_scale != 1 else 1)
        slg_keep_steps = np.ones(
            (num_steps, cfg.num_layers, num_streams), np.float32
        )
        if slg_layers is not None and num_streams > 1:
            lo, hi = int(slg_start * num_steps), int(slg_end * num_steps)
            for i in range(lo, min(hi, num_steps)):
                for layer in slg_layers:
                    slg_keep_steps[i, layer, 1:] = 0.0

        tc_mask = (
            np.ones(num_steps, bool) if teacache_mask is None
            else np.asarray(teacache_mask, bool)
        )

        def model_call(x_latent, t_scalar, keep, residual, compute,
                       vctx_step=None):
            """Evaluate all guidance streams in one batched forward."""
            vace_ctx = vctx_step if vctx_step is not None else vace_context
            if phantom:
                # streams: [pos_it (ctx, ref), pos_i (null, ref), neg (null, ref_neg)]
                xs = jnp.concatenate([
                    jnp.concatenate([x_latent, ref_latents], axis=1),
                    jnp.concatenate([x_latent, ref_latents], axis=1),
                    jnp.concatenate([x_latent, ref_latents_neg], axis=1),
                ], axis=0)
                ctx = jnp.concatenate(
                    [context[0:1], context[1:2], context[1:2]], axis=0
                )
                cmask = jnp.concatenate(
                    [context_mask[0:1], context_mask[1:2], context_mask[1:2]],
                    axis=0,
                )
            elif num_streams == 2:
                xs = jnp.concatenate([x_latent, x_latent], axis=0)
                ctx = context
                cmask = context_mask
            else:
                xs = x_latent
                ctx = context[0:1]
                cmask = context_mask[0:1]
            if source_latents is not None:
                xs = jnp.concatenate(
                    [xs, jnp.concatenate([source_latents] * num_streams, 0)],
                    axis=1,
                )
            if y is not None:
                xs = jnp.concatenate(
                    [xs, jnp.concatenate([y] * num_streams, 0)], axis=-1
                )
            clip = (
                None if clip_features is None
                else jnp.concatenate([clip_features] * num_streams, axis=0)
            )
            vctx = (
                None if vace_ctx is None
                else jnp.concatenate([vace_ctx] * num_streams, axis=0)
            )
            t = jnp.full((num_streams,), t_scalar)
            if sp_mesh is not None:
                from ..parallel.usp import usp_wan_forward

                out, new_res = usp_wan_forward(
                    sp_mesh, self.model_params, cfg, xs, t, ctx,
                    cmask, freqs, axis_name=self.sp_axis,
                    attn_mode=attn_mode, clip_features=clip,
                    slg_keep=keep, previous_residual=residual,
                    compute=compute, vace_context=vctx,
                    vace_scale=vace_scale, cam_emb=cam_emb,
                )
            else:
                out, new_res = wan_model.forward(
                    self.model_params, cfg, xs, t, ctx, cmask, freqs,
                    clip_features=clip, vace_context=vctx,
                    vace_scale=vace_scale, slg_keep=keep, cam_emb=cam_emb,
                    previous_residual=residual, compute=compute,
                    attn_mode=attn_mode,
                )
            return out, new_res

        # token-space residual shape for TeaCache carry
        f_tok_all = f_all // cfg.patch_size[0]
        n_tokens = f_tok_all * h_tok * w_tok
        residual0 = jnp.zeros(
            (num_streams, n_tokens, cfg.dim), jnp.float32
        )

        solver_state = (
            junipc.unipc_init(latents.shape) if solver == "unipc"
            else jdpm.dpm_init(latents.shape)
        )

        n_overlap = (
            0 if overlapped_latents is None else overlapped_latents.shape[1]
        )
        per_step = {
            "idx": jnp.arange(num_steps),
            "keep": jnp.asarray(slg_keep_steps),
            "tc": jnp.asarray(tc_mask),
            "key": jax.random.split(
                key if key is not None else jax.random.key(0), num_steps
            ),
        }

        def body(carry, step):
            x, sstate, residual = carry
            i = step["idx"]
            sigma = sigmas[i]
            t_scalar = sigma * self.num_train_timesteps
            vctx_step = None
            if n_overlap:
                # sliding-window continuation: re-inject the previous
                # window's tail latents noised to the current level
                # (``text2video.py:471-480``; ``overlapped_latents`` must
                # include the boundary frame — the reference pins
                # ``shape[1] + 1`` frames)
                k_x, k_vace = jax.random.split(step["key"])
                factor = t_scalar / self.num_train_timesteps
                noise = jax.random.normal(
                    k_x, overlapped_latents.shape, x.dtype
                )
                noised = (
                    overlapped_latents.astype(x.dtype) * (1 - factor)
                    + noise * factor
                )
                x = jax.lax.dynamic_update_slice(
                    x, noised, (0, 0, 0, 0, 0)
                )
                if vace_context is not None and overlap_noise > 0:
                    # the VACE context's inactive channels (the leading
                    # z_dim of the feature axis) carry the continuation
                    # latents; each step they are re-perturbed from the
                    # clean snapshot at the fixed overlap noise floor
                    # (``text2video.py:471-480`` zz update). Stateless:
                    # derived from the ORIGINAL context every step.
                    onf = overlap_noise / self.num_train_timesteps
                    snap = jax.lax.dynamic_slice(
                        vace_context,
                        (0, 0, 0, 0, 0),
                        (1, n_overlap) + vace_context.shape[2:4]
                        + (overlapped_latents.shape[-1],),
                    )
                    vnoise = jax.random.normal(
                        k_vace, snap.shape, vace_context.dtype
                    )
                    vctx_step = jax.lax.dynamic_update_slice(
                        vace_context,
                        snap * (1 - onf) + vnoise * onf,
                        (0, 0, 0, 0, 0),
                    )
            out, residual = model_call(
                x, t_scalar, step["keep"], residual, step["tc"],
                vctx_step=vctx_step,
            )
            out = out[:, : latents.shape[1]]  # strip ref/source frames

            if phantom:
                pos_it, pos_i, neg = (
                    out[0:1], out[1:2], out[2:3]
                )
                noise_pred = neg + 5.0 * (pos_i - neg) + guide_scale * (
                    pos_it - pos_i
                )
            elif num_streams == 2:
                cond, uncond = out[0:1], out[1:2]
                if cfg_star_switch:
                    # reference quirk (``text2video.py:551-563``): the
                    # ``noise_pred_text*0`` zeroing for i <= cfg_zero_step
                    # is DEAD CODE — unconditionally overwritten by the
                    # plain-CFG line right after. The EXECUTED behavior:
                    # early steps merely skip the alpha rescale of the
                    # uncond stream, then apply plain CFG.
                    alpha = optimized_scale(
                        cond.astype(jnp.float32), uncond.astype(jnp.float32)
                    )
                    uncond = jnp.where(
                        i <= cfg_zero_step, uncond, uncond * alpha
                    )
                    noise_pred = uncond + guide_scale * (cond - uncond)
                else:
                    noise_pred = uncond + guide_scale * (cond - uncond)
            else:
                noise_pred = out

            if solver == "unipc":
                sstate, x = junipc.unipc_step(
                    sstate, noise_pred, x, i, sigmas, num_steps
                )
            elif solver == "euler":
                # flow-match Euler between sigma levels (the reference's
                # ``basic_flowmatch.FlowMatchScheduler.step``); state-free
                x = (
                    x.astype(jnp.float32)
                    + (sigmas[i + 1] - sigmas[i]) * noise_pred
                ).astype(x.dtype)
            else:
                sstate, x = jdpm.dpm_step(
                    sstate, noise_pred, x, i, sigmas, num_steps
                )
            return (x, sstate, residual), None

        (x, _, _), _ = jax.lax.scan(
            body, (latents, solver_state, residual0), per_step
        )
        if n_overlap:
            # restore the clean overlapped latents (``text2video.py:579-583``)
            x = jax.lax.dynamic_update_slice(
                x, overlapped_latents.astype(x.dtype), (0, 0, 0, 0, 0)
            )
        return x

    # ------------------------------------------------------------------
    # Entry points
    # ------------------------------------------------------------------

    def generate_t2v(
        self,
        context: jax.Array,
        context_mask: jax.Array,
        width: int = 832,
        height: int = 480,
        frame_num: int = 81,
        sampling_steps: int = 50,
        shift: float = 5.0,
        solver: str = "unipc",
        guide_scale: float = 5.0,
        key: Optional[jax.Array] = None,
        enable_riflex: bool = False,
        output_type: str = "latent",
        teacache_multiplier: float = 0.0,
        teacache_model: str = "t2v_14B",
        return_latent_slice: Optional[slice] = None,
        noise: Optional[jax.Array] = None,
        **denoise_kwargs,
    ):
        key = key if key is not None else jax.random.key(0)
        k_noise, k_loop = jax.random.split(key)  # never reuse a consumed key
        f_lat, h_lat, w_lat = self.latent_shape(height, width, frame_num)
        if noise is None:
            # injectable for deterministic replay / reference-oracle runs
            # (the reference's torch.Generator seed path,
            # ``text2video.py:366-372``)
            noise = jax.random.normal(
                k_noise, (1, f_lat, h_lat, w_lat, self.vae_cfg.z_dim),
                jnp.float32,
            )
        sigmas = self._solve_schedule(solver, sampling_steps, shift)
        tc_mask = None
        if teacache_multiplier > 0:
            tc_mask = teacache_skip_schedule(
                self.model_params, self.model_cfg,
                np.asarray(sigmas[:-1]) * self.num_train_timesteps,
                TEACACHE_COEFFICIENTS[teacache_model], teacache_multiplier,
            )
        latents = self.denoise(
            noise, context, context_mask, sigmas,
            guide_scale=guide_scale, solver=solver,
            enable_riflex=enable_riflex, teacache_mask=tc_mask,
            key=k_loop,
            **denoise_kwargs,
        )
        result = latents if output_type == "latent" else \
            self._vae_decode(latents)
        if return_latent_slice is not None:
            # sliding-window continuation output (``text2video.py:584-585``)
            return {
                "x": result,
                "latent_slice": latents[:, return_latent_slice],
            }
        return result

    def prepare_i2v_conditioning(
        self,
        first_frame: jax.Array,       # [H, W, 3] in [-1, 1]
        height: int,
        width: int,
        frame_num: int,
        last_frame: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Build the i2v ``y`` tensor: 4x-repeated frame mask (4 ch) +
        VAE latents of [first, zeros..., (last)] (``image2video.py:232-280``)."""
        f_lat, h_lat, w_lat = self.latent_shape(height, width, frame_num)
        ts = self.vae_stride[0]  # 4 for Wan (``image2video.py:232-244``)
        msk = np.ones((frame_num, h_lat, w_lat, 1), np.float32)
        msk[1:] = 0.0
        if last_frame is not None:
            msk[-1] = 1.0
        msk = np.concatenate([np.repeat(msk[:1], ts, axis=0), msk[1:]], axis=0)
        msk = msk.reshape(msk.shape[0] // ts, ts, h_lat, w_lat, 1)
        msk = np.transpose(msk, (0, 4, 2, 3, 1))[:, 0]  # [F', H', W', ts]

        frames = [first_frame[None]]
        mid = jnp.zeros((frame_num - (2 if last_frame is not None else 1),
                         height, width, 3))
        frames.append(mid)
        if last_frame is not None:
            frames.append(last_frame[None])
        video = jnp.concatenate(frames, axis=0)[None]
        lat = wan_vae._tile_encode(self.vae_params, self.vae_cfg, video)
        return jnp.concatenate([jnp.asarray(msk)[None], lat], axis=-1)

    def generate_i2v(
        self,
        context: jax.Array,
        context_mask: jax.Array,
        clip_features: jax.Array,     # [1, 257, 1280]
        first_frame: jax.Array,       # [H, W, 3]
        width: int = 832,
        height: int = 480,
        frame_num: int = 81,
        sampling_steps: int = 40,
        shift: float = 5.0,
        solver: str = "unipc",
        guide_scale: float = 5.0,
        key: Optional[jax.Array] = None,
        last_frame: Optional[jax.Array] = None,
        output_type: str = "latent",
        noise: Optional[jax.Array] = None,
        **denoise_kwargs,
    ):
        key = key if key is not None else jax.random.key(0)
        k_noise, k_loop = jax.random.split(key)
        f_lat, h_lat, w_lat = self.latent_shape(height, width, frame_num)
        if noise is None:  # injectable (see generate_t2v)
            noise = jax.random.normal(
                k_noise, (1, f_lat, h_lat, w_lat, self.vae_cfg.z_dim),
                jnp.float32,
            )
        y = self.prepare_i2v_conditioning(
            first_frame, height, width, frame_num, last_frame
        )
        sigmas = self._solve_schedule(solver, sampling_steps, shift)
        latents = self.denoise(
            noise, context, context_mask, sigmas,
            guide_scale=guide_scale, solver=solver,
            clip_features=clip_features, y=y, key=k_loop,
            **denoise_kwargs,
        )
        if output_type == "latent":
            return latents
        return self._vae_decode(latents)
