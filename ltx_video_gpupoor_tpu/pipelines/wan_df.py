"""Diffusion-forcing long-video generation (SkyReels-V2 style).

Parity target: ``DTT2V`` at ``/root/reference/wan/diffusion_forcing.py``:
- staggered per-frame timestep matrix with ``ar_step`` lag, causal blocks,
  and pre-completed prefix rows (``generate_timestep_matrix`` ``:116-190``);
- per-frame independent UniPC schedulers (``:307-314, 408-417``) — here ONE
  vmapped UniPC state over the frame axis with per-frame step counters;
- per-token 2-D timesteps into the DiT (``model.py:977-991`` df mode);
- prefix-latent noise floor (``overlap_noise``, ``:352-363``);
- frame count snapped to ``17 + 20k`` (``:224-225``), fps conditioning
  (``:261-262``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.wan import model as wan_model
from ..models.wan import vae as wan_vae
from ..ops.rope import wan_rope_freqs
from ..schedulers import unipc as junipc


def snap_frame_num(frame_num: int) -> int:
    """``:224-225``: frames = 17 + 20k."""
    frame_num = max(17, frame_num)
    return int(round((frame_num - 17) / 20) * 20 + 17)


def generate_timestep_matrix(
    num_frames: int,
    step_template: np.ndarray,
    base_num_frames: int,
    ar_step: int = 5,
    num_pre_ready: int = 0,
    causal_block_size: int = 1,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, list[tuple[int, int]]]:
    """Host-side port of ``generate_timestep_matrix`` (``:116-190``).

    Returns (step_matrix [rows, F] timesteps, step_index [rows, F],
    update_mask [rows, F] bool, valid_interval list of (start, end))."""
    num_iterations = len(step_template) + 1
    nfb = num_frames // causal_block_size
    bnfb = base_num_frames // causal_block_size
    if bnfb < nfb:
        min_ar_step = len(step_template) / bnfb
        assert ar_step >= min_ar_step, f"ar_step should be at least {math.ceil(min_ar_step)}"
    template = np.concatenate([
        np.array([999], np.int64),
        np.asarray(step_template, np.int64),
        np.array([0], np.int64),
    ])
    pre_row = np.zeros(nfb, np.int64)
    if num_pre_ready > 0:
        pre_row[: num_pre_ready // causal_block_size] = num_iterations

    step_matrix, step_index, update_mask = [], [], []
    while not np.all(pre_row >= num_iterations - 1):
        new_row = np.zeros(nfb, np.int64)
        for i in range(nfb):
            if i == 0 or pre_row[i - 1] >= num_iterations - 1:
                new_row[i] = pre_row[i] + 1
            else:
                new_row[i] = new_row[i - 1] - ar_step
        new_row = np.clip(new_row, 0, num_iterations)
        update_mask.append((new_row != pre_row) & (new_row != num_iterations))
        step_index.append(new_row.copy())
        step_matrix.append(template[new_row])
        pre_row = new_row

    terminal_flag = bnfb
    valid_interval = []
    for mask in update_mask:
        if terminal_flag < nfb and mask[terminal_flag]:
            terminal_flag += 1
        valid_interval.append((max(terminal_flag - bnfb, 0), terminal_flag))

    sm = np.stack(step_matrix)
    si = np.stack(step_index)
    um = np.stack(update_mask)
    if causal_block_size > 1:
        rep = lambda a: np.repeat(a[:, :, None], causal_block_size, 2).reshape(
            a.shape[0], -1
        )
        sm, si, um = rep(sm), rep(si), rep(um.astype(np.int64)).astype(bool)
        valid_interval = [
            (s * causal_block_size, e * causal_block_size)
            for s, e in valid_interval
        ]
    return sm, si, um, valid_interval


@dataclasses.dataclass
class WanDFPipeline:
    model_params: dict
    model_cfg: wan_model.WanConfig
    vae_params: dict
    vae_cfg: wan_vae.WanVAEConfig
    vae_stride: tuple = (4, 8, 8)
    num_train_timesteps: int = 1000
    # spatial tile size for the final decode; None = untiled. DF runs are
    # typically LONGER than t2v clips, so the same memory-envelope policy
    # applies (``WanPipeline.vae_tile_size``)
    vae_tile_size: Optional[int] = None
    # sequence parallelism over ICI (BASELINE "DF sharded over ICI"): every
    # denoiser evaluation runs under shard_map with frames (and the [B, F]
    # DF timestep rows) sharded over `sp_axis` — the autoregressive
    # timestep-matrix scan stays host-level/global
    sp_mesh: object = None
    sp_axis: str = "sp"
    # the FULL serving mesh (set for BOTH sp- and tp-style meshes):
    # tiled VAE decodes fan their tile grid over every device
    mesh: object = None

    def generate(
        self,
        context: jax.Array,          # [2, text_len, text_dim] (pos, neg)
        context_mask: jax.Array,
        height: int = 480,
        width: int = 832,
        frame_num: int = 97,
        sampling_steps: int = 50,
        shift: float = 1.0,
        guide_scale: float = 5.0,
        ar_step: int = 5,
        causal_block_size: int = 5,
        overlap_noise: int = 0,
        fps: int = 24,
        prefix_video: Optional[jax.Array] = None,  # [1, Fp, H, W, 3]
        # pre-encoded prefix latents [1, Fp', H', W', z] — bypasses the
        # VAE encode (sliding-window continuations already hold latents;
        # also the oracle-injection path)
        prefix_latents: Optional[jax.Array] = None,
        key: Optional[jax.Array] = None,
        output_type: str = "latent",
        attn_mode: str = "auto",
        noise: Optional[jax.Array] = None,
    ):
        key = key if key is not None else jax.random.key(0)
        cfg = self.model_cfg
        frame_num = snap_frame_num(frame_num)
        f_lat = (frame_num - 1) // self.vae_stride[0] + 1
        h_lat = height // self.vae_stride[1]
        w_lat = width // self.vae_stride[2]

        if ar_step == 0:
            causal_block_size = 1

        prefix_len = 0
        if prefix_latents is None and prefix_video is not None:
            prefix_latents = wan_vae._tile_encode(
                self.vae_params, self.vae_cfg, prefix_video
            )
        if prefix_latents is not None:
            prefix_len = prefix_latents.shape[1]
            trunc = prefix_len % causal_block_size
            if trunc:
                if trunc == prefix_len:
                    causal_block_size, ar_step = 1, 0
                else:
                    prefix_len -= trunc
                    prefix_latents = prefix_latents[:, :prefix_len]

        sigmas = junipc.unipc_sigmas(sampling_steps, shift=shift)
        init_timesteps = (
            np.asarray(sigmas[:-1]) * self.num_train_timesteps
        ).astype(np.int64)

        sm, si, um, valid = generate_timestep_matrix(
            f_lat, init_timesteps, f_lat, ar_step, prefix_len,
            causal_block_size,
        )
        rows = sm.shape[0]

        k_noise, k_loop = jax.random.split(key)
        if noise is None:  # injectable (deterministic replay / oracles)
            noise = jax.random.normal(
                k_noise, (1, f_lat, h_lat, w_lat, self.vae_cfg.z_dim),
                jnp.float32,
            )
        latents = noise
        if prefix_latents is not None:
            latents = latents.at[:, :prefix_len].set(
                prefix_latents.astype(jnp.float32)
            )

        freqs = wan_rope_freqs(
            (f_lat, h_lat // cfg.patch_size[1], w_lat // cfg.patch_size[2]),
            head_dim=cfg.head_dim,
        )
        fps_idx = 0 if fps == 16 else 1
        num_streams = 2 if guide_scale != 1 else 1
        do_cfg = num_streams == 2

        # per-request single-device fallback (same contract as WanPipeline):
        # shapes that don't divide the sequence mesh run unsharded
        sp_mesh = self.sp_mesh
        if sp_mesh is not None:
            sp = sp_mesh.shape[self.sp_axis]
            if cfg.patch_size[0] != 1 or f_lat % sp or cfg.num_heads % sp:
                import logging

                logging.getLogger(__name__).warning(
                    "sp-mesh fallback: frames=%d heads=%d patch_t=%d do "
                    "not divide sp=%d; running this request single-device",
                    f_lat, cfg.num_heads, cfg.patch_size[0], sp,
                )
                sp_mesh = None

        # vmapped per-frame UniPC state (every leaf carries a leading F axis)
        frame_shape = (1, h_lat, w_lat, self.vae_cfg.z_dim)
        z = jnp.zeros((f_lat,) + frame_shape, jnp.float32)
        solver_state = junipc.UniPCState(
            m_prev=z, m_prev2=z, last_sample=z,
            lower_order_nums=jnp.zeros((f_lat,), jnp.int32),
        )
        counters = jnp.zeros((f_lat,), jnp.int32)

        v_step = jax.vmap(
            lambda st, v, x, idx: junipc.unipc_step(
                st, v, x, idx, sigmas, sampling_steps
            ),
            in_axes=(0, 0, 0, 0),
        )

        per_row = {
            "t": jnp.asarray(sm, jnp.float32),          # [rows, F]
            "update": jnp.asarray(um),                  # [rows, F]
            "key": jax.random.split(k_loop, rows),
        }

        def body(carry, row):
            latents, state, counters = carry
            t_row = row["t"]  # [F]
            x = latents

            if overlap_noise > 0 and prefix_len > 0:
                noise_factor = 0.001 * overlap_noise
                prefix_mask = (
                    jnp.arange(f_lat) < prefix_len
                )[None, :, None, None, None]
                noise = jax.random.normal(row["key"], x.shape, x.dtype)
                x = jnp.where(
                    prefix_mask,
                    x * (1 - noise_factor) + noise * noise_factor,
                    x,
                )
                t_row = jnp.where(
                    jnp.arange(f_lat) < prefix_len,
                    float(overlap_noise),
                    t_row,
                )

            fps_kw = fps_idx if cfg.inject_sample_info else None

            def _fwd(xs, ts, ctx, ctx_mask):
                if sp_mesh is not None:
                    from ..parallel.usp import usp_wan_forward

                    out, _ = usp_wan_forward(
                        sp_mesh, self.model_params, cfg, xs, ts,
                        ctx, ctx_mask, freqs, axis_name=self.sp_axis,
                        attn_mode=attn_mode, fps_idx=fps_kw,
                    )
                    return out
                out, _ = wan_model.forward(
                    self.model_params, cfg, xs, ts, ctx, ctx_mask, freqs,
                    fps_idx=fps_kw, attn_mode=attn_mode,
                )
                return out

            if do_cfg:
                xs = jnp.concatenate([x, x], axis=0)
                t2 = jnp.stack([t_row, t_row], axis=0)  # [2, F]
                out = _fwd(xs, t2, context, context_mask)
                cond, uncond = out[0:1], out[1:2]
                noise_pred = uncond + guide_scale * (cond - uncond)
            else:
                noise_pred = _fwd(
                    x, t_row[None], context[0:1], context_mask[0:1]
                )

            # per-frame solver steps where update mask is set
            v_frames = jnp.moveaxis(noise_pred, 1, 0)       # [F, 1, H, W, C]
            x_frames = jnp.moveaxis(latents, 1, 0)
            new_state, new_frames = v_step(
                state, v_frames, x_frames, counters
            )
            upd = row["update"]
            sel = upd[:, None, None, None, None]
            x_frames = jnp.where(sel, new_frames, x_frames)
            state = jax.tree.map(
                lambda new, old: jnp.where(
                    upd.reshape((-1,) + (1,) * (new.ndim - 1)), new, old
                ) if new.ndim > 1 else jnp.where(upd, new, old),
                new_state, state,
            )
            counters = counters + upd.astype(jnp.int32)
            latents = jnp.moveaxis(x_frames, 0, 1)
            return (latents, state, counters), None

        (latents, _, _), _ = jax.lax.scan(
            body, (latents, solver_state, counters), per_row
        )

        if output_type == "latent":
            return latents
        if self.vae_tile_size:
            vmesh = self.mesh if self.mesh is not None else self.sp_mesh
            if vmesh is not None and vmesh.devices.size > 1:
                # multi-chip: tile grid fans out over every mesh device
                return wan_vae.parallel_spatial_tiled_decode_fused(
                    vmesh, self.vae_params, self.vae_cfg, latents,
                    tile_size=self.vae_tile_size,
                )
            return wan_vae.spatial_tiled_decode(
                self.vae_params, self.vae_cfg, latents,
                tile_size=self.vae_tile_size,
            )
        return wan_vae._tile_decode(self.vae_params, self.vae_cfg, latents)
