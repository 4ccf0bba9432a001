"""Real-checkpoint end-to-end parity harness (north-star acceptance).

The BASELINE.json acceptance metric is frame PSNR > 40 dB between this
framework and the reference on real LTX checkpoints. Checkpoints cannot
be downloaded in a zero-egress environment, so this tool is built to
execute THE MOMENT files land in ``ckpts/``:

    python tools/check_golden_e2e.py [--ckpt-dir ckpts] [--steps 8]
        [--size 256x256x9] [--json PATH]

Behavior:
- no checkpoint found      -> {"status": "checkpoints_absent"}, exit 0;
- checkpoint found         -> loads the SAME safetensors into (a) this
  framework's transformer+VAE (``core/checkpoint.py`` converters) and
  (b) the reference's torch modules (executed from
  ``/root/reference/ltx_video/models/**`` via the golden-test harness in
  ``tests/``), runs an identical smoke-config denoise trajectory
  (uniform rectified-flow schedule, CFG 3.0, shared noise + prompt
  embeddings) plus the timestep-conditioned VAE decode on both sides,
  and reports per-frame PSNR vs the >40 dB target.

The denoise trajectory is the pipeline's core numerics (DiT forward x
steps, guidance combine, RF step, decode); serving-layer differences
(conditioning machinery, multi-scale) are covered by their own golden
tests. Plumbing is testable offline with synthetic checkpoints —
``tests/test_golden_e2e_tool.py``.

Reference call stack being mirrored:
``LTXVideoPipeline.__call__`` denoise loop
(``/root/reference/ltx_video/pipelines/pipeline_ltx_video.py:1103-1256``)
with ``RectifiedFlowScheduler.step`` (``rf.py:311-380``) and
``vae_decode`` (``vae_encode.py:94``).
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, ".")

import numpy as np

PSNR_TARGET_DB = 40.0


def find_checkpoint(ckpt_dir):
    """Pick a FULL transformer checkpoint: exclude the upsampler, the
    standalone VAE file, and LoRA-only files (the distilled lora128
    checkpoint is a LoRA, not a full model — ``inference.py:449-452``)."""
    pats = ("ltxv*dev*.safetensors", "ltxv*.safetensors",
            "*ltx*video*.safetensors")
    for pat in pats:
        hits = sorted(glob.glob(os.path.join(ckpt_dir, pat)))
        hits = [
            h for h in hits
            if not any(s in os.path.basename(h).lower()
                       for s in ("upsampler", "upscaler", "vae", "lora"))
        ]
        if hits:
            return hits[0]
    return None


def psnr(a, b, peak=2.0):
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)


def _torch_state_dict(tensors, prefix=""):
    import torch

    out = {}
    for k, v in tensors.items():
        if prefix and not k.startswith(prefix):
            continue
        k2 = k[len(prefix):]
        # diffusers-format names -> reference-native names (mirror of
        # _TRANSFORMER_RENAMES in core/checkpoint.py, reference
        # TRANSFORMER_KEYS_RENAME_DICT)
        for a, b in (("proj_in", "patchify_proj"),
                     ("time_embed", "adaln_single"),
                     ("norm_q", "q_norm"), ("norm_k", "k_norm"),
                     # the golden-harness AdaLayerNormSingle oracle names
                     # its embedder `emb.linear_*` (diffusers nests it
                     # under emb.timestep_embedder)
                     ("adaln_single.emb.timestep_embedder.",
                      "adaln_single.emb.")):
            k2 = k2.replace(a, b)
        out[k2] = torch.from_numpy(
            np.ascontiguousarray(v.astype(np.float32))
        )
    return out


def _build_reference_transformer(tcfg_dict):
    from tests.test_ltx_transformer_golden import _load_reference_transformer

    ns = _load_reference_transformer()
    return ns["Transformer3DModel"](
        num_attention_heads=tcfg_dict.get("num_attention_heads", 32),
        attention_head_dim=tcfg_dict.get("attention_head_dim", 64),
        in_channels=tcfg_dict.get("in_channels", 128),
        out_channels=tcfg_dict.get("out_channels", 128),
        num_layers=tcfg_dict.get("num_layers", 48),
        cross_attention_dim=tcfg_dict.get("cross_attention_dim", 4096),
        attention_bias=True,
        activation_fn="gelu-approximate",
        adaptive_norm="single_scale_shift",
        standardization_norm="rms_norm",
        norm_elementwise_affine=False,
        norm_eps=1e-6,
        caption_channels=tcfg_dict.get("caption_channels", 4096),
        qk_norm="rms_norm",
        positional_embedding_theta=tcfg_dict.get(
            "positional_embedding_theta", 10000.0
        ),
        positional_embedding_max_pos=tcfg_dict.get(
            "positional_embedding_max_pos", [20, 2048, 2048]
        ),
        timestep_scale_multiplier=1000,
    ).eval().float()


def _build_reference_decoder(ns, vcfg):
    """Reference Decoder per ``CausalVideoAutoencoder.from_config``
    (``causal_video_autoencoder.py:122-177``)."""
    return ns["Decoder"](
        dims=3,
        in_channels=vcfg.latent_channels,
        out_channels=3,
        blocks=[list(b) for b in vcfg.dec_blocks()],
        base_channels=vcfg.decoder_base_channels or vcfg.base_channels,
        norm_num_groups=vcfg.norm_num_groups,
        patch_size=vcfg.patch_size,
        norm_layer=vcfg.norm_layer,
        causal=vcfg.causal_decoder,
        timestep_conditioning=vcfg.timestep_conditioning,
    ).eval().float()


def run(ckpt_dir="ckpts", steps=8, height=256, width=256, frames=9,
        guidance=3.0, json_out=None):
    path = find_checkpoint(ckpt_dir)
    if path is None:
        res = {
            "status": "checkpoints_absent",
            "detail": f"no LTX checkpoint under {ckpt_dir}/ "
                      "(zero-egress environment?); harness is ready — "
                      "drop ltxv_*.safetensors in and re-run",
        }
        print(json.dumps(res))
        if json_out:
            json.dump(res, open(json_out, "w"), indent=1)
        return 0

    import jax
    import jax.numpy as jnp
    import torch

    from ltx_video_gpupoor_tpu.core import checkpoint as ckpt
    from ltx_video_gpupoor_tpu.models.ltx import vae as ltx_vae
    from ltx_video_gpupoor_tpu.models.ltx.transformer3d import (
        LTXTransformerConfig,
        forward,
    )
    from ltx_video_gpupoor_tpu.schedulers import rf
    from tests.test_ltx_vae_golden import _load_reference_vae

    print(f"# checkpoint: {path}")
    tensors, config = ckpt.load_safetensors(path)
    tensors = ckpt.dequantize_quanto(tensors)
    # normalize the optional "vae." prefix once so both the JAX converter
    # (which strips it itself) and the torch-side decoder/transformer key
    # filters below see the same namespace
    tensors = {k.removeprefix("vae."): v for k, v in tensors.items()}
    config = config or {}
    tcfg_dict = config.get("transformer", config)
    vcfg_dict = config.get("vae")
    if vcfg_dict is None:
        res = {"status": "vae_config_absent",
               "detail": "checkpoint metadata carries no VAE config; "
                         "pass a combined dev checkpoint"}
        print(json.dumps(res))
        if json_out:
            json.dump(res, open(json_out, "w"), indent=1)
        return 0

    # ---- our side -------------------------------------------------------
    tcfg = LTXTransformerConfig(
        num_attention_heads=tcfg_dict.get("num_attention_heads", 32),
        attention_head_dim=tcfg_dict.get("attention_head_dim", 64),
        in_channels=tcfg_dict.get("in_channels", 128),
        out_channels=tcfg_dict.get("out_channels", 128),
        num_layers=tcfg_dict.get("num_layers", 48),
        cross_attention_dim=tcfg_dict.get("cross_attention_dim", 4096),
        caption_channels=tcfg_dict.get("caption_channels", 4096),
    )
    vcfg = ltx_vae.VAEConfig.from_dict(vcfg_dict)
    tf_params = ckpt.convert_ltx_transformer(
        tensors, tcfg.num_layers, dtype=jnp.float32
    )
    vae_params = ckpt.convert_ltx_vae(tensors, vcfg, dtype=jnp.float32)

    # ---- reference side -------------------------------------------------
    ref_tf = _build_reference_transformer(tcfg_dict)
    sd = _torch_state_dict(
        {k: v for k, v in tensors.items()
         if not k.startswith(("decoder.", "encoder.",
                              "per_channel_statistics."))}
    )
    missing, unexpected = ref_tf.load_state_dict(sd, strict=False)
    print(f"# ref transformer load: missing={len(missing)} "
          f"unexpected={len(unexpected)}")
    vns = _load_reference_vae()
    ref_dec = _build_reference_decoder(vns, vcfg)
    dec_sd = _torch_state_dict(tensors, prefix="decoder.")
    dmissing, dunexpected = ref_dec.load_state_dict(dec_sd, strict=False)
    print(f"# ref decoder load: missing={len(dmissing)} "
          f"unexpected={len(dunexpected)}")

    # ---- shared smoke trajectory ---------------------------------------
    fl = (frames - 1) // vcfg.temporal_downscale_factor + 1
    hl = height // vcfg.spatial_downscale_factor
    wl = width // vcfg.spatial_downscale_factor
    n_tokens = fl * hl * wl
    rng = np.random.RandomState(0)
    lat0 = rng.randn(1, n_tokens, tcfg.in_channels).astype(np.float32)
    emb = rng.randn(2, 128, tcfg.caption_channels).astype(np.float32) * 0.02
    coords = np.stack(np.meshgrid(
        np.arange(fl), np.arange(hl), np.arange(wl), indexing="ij"
    ), 0).reshape(1, 3, -1).astype(np.float32)
    sched = rf.make_schedule(steps, sampler="Uniform", shifting=None)
    ts = np.asarray(sched.timesteps, np.float32)

    # ours (float32 for the numerics gate; perf tiers have their own bench)
    fwd = jax.jit(forward, static_argnames=("cfg",))
    lat = jnp.asarray(lat0)
    emb_j = jnp.asarray(emb)
    coords_j = jnp.tile(jnp.asarray(coords), (2, 1, 1))
    for t in ts:
        x = jnp.concatenate([lat, lat], axis=0)
        v = fwd(tf_params, tcfg, x, coords_j, jnp.full((2,), float(t)),
                emb_j, None)
        un, co = np.split(np.asarray(v, np.float32), 2, axis=0)
        pred = jnp.asarray(un + guidance * (co - un))
        lat = rf.step(sched, pred, float(t), lat)
    ours_lat = np.asarray(lat, np.float32)

    # reference
    import types as _types

    freqs = ref_tf.precompute_freqs_cis(
        torch.from_numpy(np.tile(coords, (2, 1, 1)))
    )
    rlat = torch.from_numpy(lat0.copy())
    remb = torch.from_numpy(emb.copy())
    with torch.no_grad():
        for t in ts:
            x = torch.cat([rlat, rlat], dim=0)
            v = ref_tf(
                x, freqs_cis=freqs, encoder_hidden_states=remb,
                timestep=torch.full((2, 1), float(t)),
                encoder_attention_mask=None,
                ltxv_model=_types.SimpleNamespace(_interrupt=False),
                return_dict=False,
            )[0]
            un, co = v[:1], v[1:]
            pred = un + guidance * (co - un)
            # rectified-flow Euler step (rf.py:311-380), matching rf.step
            i = int(np.where(ts == t)[0][0])
            t_next = ts[i + 1] if i + 1 < len(ts) else 0.0
            rlat = rlat - (float(t) - float(t_next)) * pred
    ref_lat = rlat.numpy()

    lat_psnr = psnr(ours_lat, ref_lat,
                    peak=float(np.abs(ref_lat).max()) * 2 + 1e-6)

    # ---- decode both ----------------------------------------------------
    stats_std = tensors.get("per_channel_statistics.std-of-means")
    stats_mean = tensors.get(
        "per_channel_statistics.mean-of-means",
        np.zeros_like(stats_std) if stats_std is not None else None,
    )

    def unnorm(z):
        if stats_std is None:
            return z
        return z * stats_std.reshape(1, 1, 1, 1, -1) + stats_mean.reshape(
            1, 1, 1, 1, -1
        )

    z_ours = unnorm(ours_lat.reshape(1, fl, hl, wl, -1))
    dt = 0.05 if vcfg.timestep_conditioning else None
    ours_px = np.asarray(
        ltx_vae.decode(
            vae_params, vcfg, jnp.asarray(z_ours),
            **({"timestep": jnp.full((1,), dt)} if dt is not None else {}),
        ),
        np.float32,
    )

    z_ref = torch.from_numpy(
        np.transpose(
            unnorm(ref_lat.reshape(1, fl, hl, wl, -1)), (0, 4, 1, 2, 3)
        ).copy()
    )
    with torch.no_grad():
        kw = {}
        if vcfg.timestep_conditioning:
            kw["timestep"] = torch.full((1,), 0.05)
        ref_px = ref_dec(
            z_ref, target_shape=(1, 3, frames, height, width), **kw
        ).numpy()
    ref_px = np.transpose(ref_px, (0, 2, 3, 4, 1))  # -> [B, F, H, W, 3]
    if ours_px.shape != ref_px.shape:
        # a blind reshape would scramble pixels across axes and make the
        # PSNR verdict meaningless — fail loudly with the shapes instead
        raise SystemExit(
            f"decode layout mismatch: ours {ours_px.shape} vs reference "
            f"{ref_px.shape} — fix the axis order, do not reshape"
        )

    frame_psnrs = [
        psnr(ours_px[0, i], ref_px[0, i]) for i in range(ref_px.shape[1])
    ]
    res = {
        "status": "ran",
        "checkpoint": os.path.basename(path),
        "steps": steps,
        "size": f"{width}x{height}x{frames}",
        "latent_psnr_db": round(float(lat_psnr), 2),
        "frame_psnr_db_min": round(float(min(frame_psnrs)), 2),
        "frame_psnr_db_mean": round(float(np.mean(frame_psnrs)), 2),
        "target_db": PSNR_TARGET_DB,
        "pass": bool(min(frame_psnrs) > PSNR_TARGET_DB),
    }
    print(json.dumps(res))
    if json_out:
        json.dump(res, open(json_out, "w"), indent=1)
    return 0 if res["pass"] else 1


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-dir", default="ckpts")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--size", default="256x256x9",
                    help="WxHxF smoke config")
    ap.add_argument("--guidance", type=float, default=3.0)
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)
    w, h, f = (int(x) for x in args.size.split("x"))
    return run(args.ckpt_dir, args.steps, h, w, f, args.guidance, args.json)


if __name__ == "__main__":
    sys.exit(main())
