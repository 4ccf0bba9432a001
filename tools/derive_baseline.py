"""Derive the reference-baseline band for BASELINE.md (VERDICT r4 #6).

The reference publishes no benchmark numbers (BASELINE.md table), so the
bench's ``vs_baseline`` divides by an estimate of the reference's A100
low-VRAM path at the headline config. Through r4 that estimate (20
s/video) had no written derivation. This tool produces one:

1. **FLOPs are measured, not hand-counted**: XLA's cost analysis of the
   actual jitted programs — one CFG denoise step of the LTX-2B DiT at
   704x480x121f (5280 tokens, 2 guidance streams) and the full VAE
   decode — on the CPU backend (FLOP counts are backend-independent).
2. **A100 roofline band**: dense bf16 peak 312 TF/s. The low-VRAM path
   runs quanto-int8 linears (dequant + bf16 matmul with extra kernel
   traffic, typically ~0.7x bf16 throughput) in an unfused eager torch
   loop; MFU band 28-45% (the upper end is a well-tuned SDPA
   transformer at 5k tokens, the lower end quanto + modulation/scheduler
   overhead between launches).
3. **VAE decode at fp32**: the reference pins ``VAE_dtype=torch.float32``
   (``/root/reference/inference.py:455``), so decode rides the TF32
   pipe (156 TF/s peak) at conv MFU 20-40%.
4. **mmgp offload overhead**: profiles 2/4/5 cap the transformer's VRAM
   working set at 100 MB (``/root/reference/inference.py:465-482``), so
   every denoise step re-streams the ~2.1 GB int8 weight set over PCIe
   4.0 x16 (~20-25 GB/s effective): 0 s (fully overlapped with compute)
   to +`30 * 2.1/20` s (serial worst case).

The band's low edge stacks every optimistic assumption (45% MFU, 40%
conv MFU, free offload); the high edge every pessimistic one. The
central value is the geometric midpoint, rounded — which lands on the
20 s/video bench.py has carried since r2. bench.py emits the band as
``vs_baseline_range`` next to the central ``vs_baseline``.

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/derive_baseline.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEIGHT, WIDTH, FRAMES, STEPS = 480, 704, 121, 30

A100_BF16_TFLOPS = 312.0
A100_TF32_TFLOPS = 156.0
DIT_MFU_BAND = (0.28, 0.45)
VAE_MFU_BAND = (0.20, 0.40)
PCIE_GBPS = 20.0
INT8_WEIGHTS_GB = 2.1   # LTX-2B quanto int8 transformer


def _flops(jitted, *args) -> float:
    c = jitted.lower(*args).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list):  # older jax returns [dict]
        ca = ca[0]
    return float(ca["flops"])


def main():
    import jax
    import jax.numpy as jnp

    from ltx_video_gpupoor_tpu.models.ltx import vae as ltx_vae
    from ltx_video_gpupoor_tpu.models.ltx.transformer3d import (
        LTXTransformerConfig,
        forward,
        init_params,
    )

    cfg = LTXTransformerConfig(
        num_attention_heads=32, attention_head_dim=64, in_channels=128,
        out_channels=128, num_layers=28, cross_attention_dim=2048,
        caption_channels=4096,
    )
    vcfg = ltx_vae.VAEConfig.from_dict(ltx_vae.LTX_VAE_CONFIG_097)
    fl = (FRAMES - 1) // vcfg.temporal_downscale_factor + 1
    hl = HEIGHT // vcfg.spatial_downscale_factor
    wl = WIDTH // vcfg.spatial_downscale_factor
    n_tokens = fl * hl * wl

    tokens = jnp.zeros((2, n_tokens, cfg.in_channels), jnp.bfloat16)
    coords = jnp.zeros((2, 3, n_tokens), jnp.float32)
    t = jnp.full((2,), 0.5, jnp.float32)
    caption = jnp.zeros((2, 256, 4096), jnp.bfloat16)

    # XLA's cost analysis counts a lax.scan BODY ONCE (trip count is not
    # part of the HLO cost model), so the scanned 28-block stack must be
    # measured at num_layers=1 and scaled by L. The non-block overhead
    # (patchify/adaLN/caption projections, ~11 GFLOP) is over-counted
    # L times by the scaling — ~0.3 of ~48 TFLOP, noise next to the MFU
    # band's width.
    import dataclasses as _dc

    cfg1 = _dc.replace(cfg, num_layers=1)
    params1 = jax.tree.map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16),
        jax.eval_shape(lambda k: init_params(k, cfg1), jax.random.key(0)),
    )
    step_fn = jax.jit(
        lambda p, x, c, tt, cap: forward(p, cfg1, x, c, tt, cap, None)
    )
    print("# lowering DiT step (CPU cost analysis)...", file=sys.stderr)
    dit_step_tf = (
        _flops(step_fn, params1, tokens, coords, t, caption)
        * cfg.num_layers / 1e12
    )
    denoise_pf = dit_step_tf * STEPS / 1e3

    # VAE decode FLOPs: measure a quarter-frame-count decode and scale by
    # output voxels (causal convs are voxel-linear; avoids a very long
    # full-shape CPU compile)
    sub_f = (fl - 1) // 4 + 1
    vparams = jax.tree.map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16),
        jax.eval_shape(
            lambda k: ltx_vae.init_params(k, vcfg), jax.random.key(1)
        ),
    )
    z = jnp.zeros((1, sub_f, hl, wl, vcfg.latent_channels), jnp.bfloat16)
    dec_fn = jax.jit(lambda p, z: ltx_vae.decode(p, vcfg, z))
    print("# lowering VAE decode (CPU cost analysis)...", file=sys.stderr)
    sub_tf = _flops(dec_fn, vparams, z) / 1e12
    sub_frames = (sub_f - 1) * vcfg.temporal_downscale_factor + 1
    vae_tf = sub_tf * FRAMES / sub_frames

    lo_mfu, hi_mfu = DIT_MFU_BAND
    lo_v, hi_v = VAE_MFU_BAND
    denoise_band = (
        denoise_pf * 1e3 / (A100_BF16_TFLOPS * hi_mfu),
        denoise_pf * 1e3 / (A100_BF16_TFLOPS * lo_mfu),
    )
    vae_band = (
        vae_tf / (A100_TF32_TFLOPS * hi_v),
        vae_tf / (A100_TF32_TFLOPS * lo_v),
    )
    offload_band = (0.0, STEPS * INT8_WEIGHTS_GB / PCIE_GBPS)
    total = (
        denoise_band[0] + vae_band[0] + offload_band[0],
        denoise_band[1] + vae_band[1] + offload_band[1],
    )
    central = (total[0] * total[1]) ** 0.5
    out = {
        "dit_step_tflop": round(dit_step_tf, 1),
        "denoise_pflop_30steps": round(denoise_pf, 3),
        "vae_decode_tflop": round(vae_tf, 1),
        "a100_denoise_band_s": [round(x, 1) for x in denoise_band],
        "a100_vae_band_s": [round(x, 1) for x in vae_band],
        "mmgp_offload_band_s": [round(x, 1) for x in offload_band],
        "baseline_band_s": [round(total[0], 1), round(total[1], 1)],
        "baseline_central_s": round(central, 1),
        "assumptions": {
            "a100_bf16_tflops": A100_BF16_TFLOPS,
            "a100_tf32_tflops": A100_TF32_TFLOPS,
            "dit_mfu_band": DIT_MFU_BAND,
            "vae_mfu_band": VAE_MFU_BAND,
            "pcie_gbps": PCIE_GBPS,
            "int8_weights_gb": INT8_WEIGHTS_GB,
        },
    }
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
