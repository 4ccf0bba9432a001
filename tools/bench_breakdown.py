"""Step-time breakdown for the headline LTX-2B bench config (VERDICT r1 #2).

Times each stage of a denoise step as a standalone jitted program at the
exact bench shapes (b=2 guidance streams, 5280 tokens, 28 layers,
d=2048, 32x64 heads, 256-token caption), prints a per-step table with
per-stage share and achieved MFU, and compares the stage sum to the
measured whole-step time (the residual = XLA fusion wins + untimed glue).

Run on the real TPU from the repo root:

    python tools/bench_breakdown.py [--tier dynamic|bf16] [--json PATH]

Numbers flow into docs/DESIGN.md's perf section.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

# v5e: 197 bf16 TFLOP/s per chip (394 int8)
PEAK_BF16 = 197e12
PEAK_INT8 = 394e12

B, S, SC, STEPS = 2, 5280, 256, 30


# shared relay-safe helpers; the local timeit_rep below is the distinct
# per-stage fori-loop harness (pytree carry + perturbation), not the
# eager-rep variant
from _bench_util import sync_scalar as _sync  # noqa: E402
from _bench_util import timeit_rep as timeit  # noqa: E402


def timeit_rep(stage_fn, x, n=16, reps=2):
    """Per-iteration time of ``stage_fn(x)`` with the loop INSIDE one jit.

    Through the relay every dispatch costs ~100+ ms, so timing small
    jitted programs call-by-call measures the relay, not the chip. The
    fori_loop body perturbs the input with a scalar read from the
    previous output (real data dependence — XLA cannot hoist the
    loop-invariant computation)."""

    @jax.jit
    def run(x0):
        def body(i, carry):
            xc, acc = carry
            o = stage_fn(xc)
            s = jax.tree.leaves(o)[0].reshape(-1)[0].astype(jnp.float32)
            return (x0 + (s * 1e-6).astype(x0.dtype), acc + s)

        _, acc = jax.lax.fori_loop(0, n, body, (x0, jnp.float32(0)))
        return acc

    _sync(run(x))
    t0 = time.time()
    for _ in range(reps):
        o = run(x)
    _sync(o)
    return (time.time() - t0) / (reps * n)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", default="dynamic",
                    choices=["dynamic", "bf16"])
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)

    from ltx_video_gpupoor_tpu.models.ltx.transformer3d import (
        LTXTransformerConfig,
        _apply_linear,
        forward,
        init_params,
    )
    from ltx_video_gpupoor_tpu.ops.flash_attention import flash_attention
    from ltx_video_gpupoor_tpu.ops.rope import apply_rotary_emb, ltx_freqs_cis
    from ltx_video_gpupoor_tpu.ops.quant import quantize_params
    from ltx_video_gpupoor_tpu.schedulers import rf

    cfg = LTXTransformerConfig(
        num_attention_heads=32, attention_head_dim=64, in_channels=128,
        out_channels=128, num_layers=28, cross_attention_dim=2048,
        caption_channels=4096,
    )
    L, D, H, HD, F = cfg.num_layers, cfg.inner_dim, 32, 64, cfg.ffn_dim
    key = jax.random.key(0)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16), init_params(key, cfg)
    )
    if args.tier == "dynamic":
        params = quantize_params(params, mode="dynamic")
    blk = jax.tree.map(lambda x: x[0], params["blocks"])

    x = jax.random.normal(key, (B, S, D), jnp.bfloat16)
    ctx = jax.random.normal(key, (B, SC, D), jnp.bfloat16)
    lat = jax.random.normal(key, (B, S, cfg.in_channels), jnp.bfloat16)
    coords = jnp.tile(
        jax.random.uniform(key, (1, 3, S), jnp.float32, 0, 24), (B, 1, 1)
    )
    caption = jax.random.normal(key, (B, SC, cfg.caption_channels),
                                jnp.bfloat16)
    cmask = jnp.ones((B, SC), jnp.int32)
    t = jnp.full((B,), 0.4, jnp.float32)

    Sp = -(-S // 128) * 128  # kernel-padded seq len
    q4 = jax.random.normal(key, (B, H, Sp, HD), jnp.bfloat16)
    kv4 = q4
    qc = jax.random.normal(key, (B, H, Sp, HD), jnp.bfloat16)
    kc = jax.random.normal(key, (B, H, SC, HD), jnp.bfloat16)

    stages = {}

    # --- per-layer stages (x L) ------------------------------------------
    stages["proj_self_qkvo"] = timeit_rep(
        lambda h: (_apply_linear(blk["attn1"]["to_q"], h)
                   + _apply_linear(blk["attn1"]["to_k"], h)
                   + _apply_linear(blk["attn1"]["to_v"], h)
                   + _apply_linear(blk["attn1"]["to_out"], h)),
        x,
    ) * L

    cos, sin = ltx_freqs_cis(
        coords, cfg.inner_dim, theta=cfg.positional_embedding_theta,
        max_pos=cfg.positional_embedding_max_pos,
    )

    stages["rope_qk"] = timeit_rep(
        lambda h: apply_rotary_emb(h, cos, sin)
        + apply_rotary_emb(h, cos, sin),
        x,
    ) * L

    stages["self_attn_kernel"] = timeit_rep(
        lambda q: flash_attention(q, kv4, kv4, kv_valid=S), q4,
    ) * L

    stages["proj_cross"] = timeit_rep(
        lambda h: (_apply_linear(blk["attn2"]["to_q"], h)
                   + _apply_linear(blk["attn2"]["to_out"], h)
                   + jnp.sum(_apply_linear(blk["attn2"]["to_k"], ctx))
                   + jnp.sum(_apply_linear(blk["attn2"]["to_v"], ctx))),
        x,
    ) * L

    seg_q = jnp.ones((B, Sp), jnp.int32)
    seg_kv = jnp.ones((B, SC), jnp.int32)

    stages["cross_attn_kernel"] = timeit_rep(
        lambda q: flash_attention(q, kc, kc, seg_q, seg_kv), qc,
    ) * L

    stages["ffn"] = timeit_rep(
        lambda h: _apply_linear(
            blk["ff"]["proj_out"],
            jax.nn.gelu(_apply_linear(blk["ff"]["proj_in"], h),
                        approximate=True),
        ),
        x,
    ) * L

    from ltx_video_gpupoor_tpu.ops.norms import rms_norm

    def norms_mod(h):
        # 2x rms-norm + 6 modulation broadcasts + 3 gated adds per block
        a = rms_norm(h)
        mod = a * 1.01 + 0.01
        b_ = rms_norm(mod)
        return h + 0.5 * b_ + 0.5 * mod

    stages["norms_modulation"] = timeit_rep(norms_mod, x) * L

    # --- per-step stages --------------------------------------------------
    stages["patchify_and_head"] = timeit_rep(
        lambda la: _apply_linear(params["patchify_proj"], la)[..., 0]
        + jnp.sum(_apply_linear(params["proj_out"], x)),
        lat,
    )

    sched = rf.make_schedule(STEPS, sampler="Uniform", shifting="SD3",
                             n_media_tokens=S, target_shift_terminal=0.1)

    def combine_step(v):
        un, co = jnp.split(v.astype(jnp.float32), 2, axis=0)
        pred = un + 3.0 * (co - un)
        return rf.step(sched, pred.astype(v.dtype), 0.4, un.astype(v.dtype))

    stages["guidance_and_scheduler"] = timeit_rep(
        combine_step, x[:, :, :cfg.out_channels]
    )

    # --- whole step -------------------------------------------------------
    fwd = jax.jit(forward, static_argnames=("cfg",))

    def whole(params):
        return fwd(params, cfg, lat, coords, t, caption, cmask)

    step_s = timeit(whole, params, n=10)
    step_s += stages["guidance_and_scheduler"]

    # --- report -----------------------------------------------------------
    flops_linear = 2 * B * S * D * D * 4 * L          # self qkvo
    flops_linear += 2 * B * (S * D * D * 2 + SC * D * D * 2) * L  # cross
    flops_linear += 2 * B * S * D * F * 2 * L         # ffn
    flops_linear += 2 * B * S * (cfg.in_channels * D + D * cfg.out_channels)
    flops_attn = 4 * B * H * Sp * Sp * HD * L         # self
    flops_attn += 4 * B * H * Sp * SC * HD * L        # cross
    total_flops = flops_linear + flops_attn
    mfu = total_flops / step_s / PEAK_BF16

    ssum = sum(stages.values())
    rows = sorted(stages.items(), key=lambda kv: -kv[1])
    print(f"\n== per-step breakdown (tier={args.tier}, {L} layers, "
          f"B={B}, S={S}) ==")
    for name, v in rows:
        print(f"  {name:22s} {v*1e3:8.2f} ms  {v/step_s*100:5.1f}%")
    print(f"  {'stage sum':22s} {ssum*1e3:8.2f} ms  {ssum/step_s*100:5.1f}%")
    print(f"  {'measured step':22s} {step_s*1e3:8.2f} ms  (100%)")
    print(f"  residual (fusion/glue) {max(0.0, step_s-ssum)*1e3:8.2f} ms")
    print(f"\n  step FLOPs: {total_flops/1e12:.2f} TF  "
          f"MFU vs bf16 peak: {mfu*100:.1f}%  "
          f"denoise ({STEPS} steps): {step_s*STEPS:.2f} s")

    res = {
        "tier": args.tier,
        "stages_ms": {k: round(v * 1e3, 2) for k, v in stages.items()},
        "step_ms": round(step_s * 1e3, 2),
        "stage_sum_ms": round(ssum * 1e3, 2),
        "mfu_bf16_pct": round(mfu * 100, 1),
        "denoise_s": round(step_s * STEPS, 2),
    }
    print(json.dumps(res))
    if args.json:
        json.dump(res, open(args.json, "w"), indent=1)


if __name__ == "__main__":
    main()
