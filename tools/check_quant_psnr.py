"""Quantization-tier accuracy gate (VERDICT r3 #6).

The 13B headline row depends on the int4-WO tier and the default serving
mode on the int8-dynamic tier, but until r4 neither had an accuracy
check beyond synthetic round-trip tests. This tool runs the SAME
synthetic checkpoint (deterministic seed) through an identical denoise
trajectory + VAE decode under bf16, int8-dynamic, and int4-WO, and
reports PSNR of each quantized tier's decoded frames against the bf16
output.

Acceptance: int8-dynamic >= 40 dB is a HARD gate (the tier the default
serving config runs — the counterpart of the reference's quanto-int8
default, ``/root/reference/inference.py:96-100``), and so is
int4-mixed >= 40 dB (the 13B/14B flagship tier since r5: per-group
int4 bulk + int8 sensitive leaves, ``ops/quant.py::is_mixed_sensitive``).
Plain per-channel int4-WO is reported for tracking only (it measured
37.98 dB in r4 — below bar — which is why no headline row rides it
anymore).

Numerics are platform-portable (the quantization error dominates any
backend difference), so the gate runs on CPU in the test suite and the
bench emits the recorded JSON as a driver-visible detail line.

Usage:
    python tools/check_quant_psnr.py [--steps 8] [--preset smoke|2b]
        [--json QUANT_GATE.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

INT8_TARGET_DB = 40.0

# latent-channel count is shared by the transformer and the tiny VAE
_SMOKE_LATENT_CH = 16

_SMOKE_VAE = {
    "_class_name": "CausalVideoAutoencoder", "dims": 3,
    "latent_channels": _SMOKE_LATENT_CH,
    "blocks": [["res_x", 1], ["compress_all", 1]],
    "base_channels": 32, "norm_num_groups": 8, "patch_size": 2,
    "norm_layer": "pixel_norm", "latent_log_var": "uniform",
    "use_quant_conv": False, "causal_decoder": False,
}


def psnr(a, b, peak):
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)


def run(steps=8, preset="smoke", json_out=None):
    import jax
    import jax.numpy as jnp

    from ltx_video_gpupoor_tpu.models.ltx import vae as ltx_vae
    from ltx_video_gpupoor_tpu.models.ltx.transformer3d import (
        LTXTransformerConfig,
        forward,
        init_params,
    )
    from ltx_video_gpupoor_tpu.ops.quant import quantize_params
    from ltx_video_gpupoor_tpu.schedulers import rf

    if preset == "smoke":
        cfg = LTXTransformerConfig(
            num_attention_heads=8,
            attention_head_dim=64,
            in_channels=_SMOKE_LATENT_CH,
            out_channels=_SMOKE_LATENT_CH,
            num_layers=4,
            cross_attention_dim=512,
            caption_channels=512,
        )
        vcfg = ltx_vae.VAEConfig.from_dict(_SMOKE_VAE)
        fl, hl, wl = 2, 8, 8
    elif preset == "2b":
        # production dims (relay-chip run; compiles are minutes cold)
        cfg = LTXTransformerConfig(
            num_attention_heads=32,
            attention_head_dim=64,
            in_channels=128,
            out_channels=128,
            num_layers=28,
            cross_attention_dim=2048,
            caption_channels=4096,
        )
        vcfg = ltx_vae.VAEConfig.from_dict(ltx_vae.LTX_VAE_CONFIG_097)
        fl, hl, wl = 3, 16, 22
    else:
        raise SystemExit(f"unknown preset {preset!r}")

    key = jax.random.key(0)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16), init_params(key, cfg)
    )
    n_tokens = fl * hl * wl
    lat0 = jax.random.normal(key, (1, n_tokens, cfg.in_channels),
                             jnp.bfloat16)
    caption = jax.random.normal(
        jax.random.key(3), (2, 64, cfg.caption_channels), jnp.bfloat16
    ) * 0.02
    coords = jnp.tile(
        jnp.stack(jnp.meshgrid(
            jnp.arange(fl), jnp.arange(hl), jnp.arange(wl), indexing="ij",
        ), 0).reshape(1, 3, -1).astype(jnp.float32), (2, 1, 1),
    )
    sched = rf.make_schedule(steps, sampler="Uniform", shifting=None)
    vae_params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        ltx_vae.init_params(jax.random.key(1), vcfg),
    )

    @jax.jit
    def traj(params, lat0, sched_ts):
        def body(lat, t):
            x = jnp.concatenate([lat, lat], axis=0)
            v = forward(params, cfg, x, coords, jnp.full((2,), t),
                        caption, None)
            un, co = jnp.split(v.astype(jnp.float32), 2, axis=0)
            pred = un + 3.0 * (co - un)
            return rf.step(
                rf.RectifiedFlowSchedule(timesteps=sched_ts),
                pred.astype(lat.dtype), t, lat,
            ), None

        lat, _ = jax.lax.scan(body, lat0, sched_ts)
        z = lat.reshape(1, fl, hl, wl, cfg.out_channels)
        return ltx_vae.decode(vae_params, vcfg, z)

    tiers = {
        "bf16": params,
        "int8_dynamic": quantize_params(params, mode="dynamic"),
        "int4_wo": quantize_params(params, mode="wo_int4"),
        "int4_mixed": quantize_params(params, mode="mixed_int4"),
    }
    px = {}
    for name, p in tiers.items():
        t0 = time.time()
        px[name] = np.asarray(traj(p, lat0, sched.timesteps), np.float32)
        print(f"# {name}: decode done in {time.time() - t0:.1f}s",
              file=sys.stderr)

    peak = float(np.abs(px["bf16"]).max()) * 2 + 1e-6
    res = {
        "status": "ran",
        "preset": preset,
        "steps": steps,
        "tokens": n_tokens,
        "int8_dynamic_psnr_db": round(
            psnr(px["int8_dynamic"], px["bf16"], peak), 2),
        "int4_wo_psnr_db": round(psnr(px["int4_wo"], px["bf16"], peak), 2),
        "int4_mixed_psnr_db": round(
            psnr(px["int4_mixed"], px["bf16"], peak), 2),
        "int8_target_db": INT8_TARGET_DB,
        "backend": jax.default_backend(),
        "checked_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    # HARD gates: the default serving tier (int8-dynamic) and the tier
    # the 13B/14B flagship rows ride (mixed int4 since r5 — per-channel
    # int4-WO is reported for tracking but no headline row uses it).
    res["pass"] = bool(
        res["int8_dynamic_psnr_db"] >= INT8_TARGET_DB
        and res["int4_mixed_psnr_db"] >= INT8_TARGET_DB
    )
    print(json.dumps(res))
    if json_out:
        with open(json_out, "w") as fh:
            json.dump(res, fh, indent=1)
    return 0 if res["pass"] else 1


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--preset", default="smoke", choices=("smoke", "2b"))
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)
    return run(args.steps, args.preset, args.json)


if __name__ == "__main__":
    sys.exit(main())
