"""Secondary benchmark: Wan2.1-1.3B t2v denoise throughput on one TPU chip.

Config mirrors the reference's Wan 1.3B text-to-video serving path
(``/root/reference/wan/text2video.py``): 832x480, 81 frames (latent
21x60x104, patchified to 32 760 tokens), CFG with two guidance streams,
UMT5 text length 512. Times a 4-step chained denoise and reports
steps/sec, tokens/sec, achieved MFU, plus the extrapolated sec/video at
the reference's 30 sampling steps (denoise only; the Wan VAE decode is
timed separately on the detail line).

Tiers (env, mirroring bench.py):
- default: dynamic-activation int8 linears (the counterpart of the
  reference's quanto-int8 serving mode); BENCH_BF16=1 for pure bf16.
- BENCH_TEACACHE=<mult>: TeaCache static skip schedule (the serving
  speed knob, ``model.py:854-899``).
- BENCH_SCORE_BOUND=<b>: opt-in bounded-score attention tier (validated
  by tools/check_tpu_parity.py --stress).
- BENCH_ATTN=<mode> (alias BENCH_ATTENTION): force the attention kernel
  tier (e.g.
  ``pallas_int8pv`` — the sage2-equivalent int8 QKxPV path, a measured
  win at d=128).

Prints ONE JSON line like bench.py; run directly: ``python bench_wan.py``.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ltx_video_gpupoor_tpu.models.wan import vae as wvae
from ltx_video_gpupoor_tpu.models.wan.model import (
    WAN_T2V_1_3B,
    WAN_T2V_14B,
    forward,
    init_params,
)
from ltx_video_gpupoor_tpu.ops.rope import wan_rope_freqs
from ltx_video_gpupoor_tpu.schedulers import unipc

HEIGHT, WIDTH, FRAMES = 480, 832, 81
TIMED_STEPS, FULL_STEPS = 4, 30
PEAK_BF16 = 197e12  # v5e per-chip


def step_flops(cfg, n_tokens, streams=2, extra_ctx=0):
    """MXU FLOPs of one denoise evaluation (both guidance streams).
    ``extra_ctx``: additional cross-attention context tokens (the 257
    CLIP tokens of the i2v path)."""
    d, f = cfg.dim, cfg.ffn_dim
    ctx_len = cfg.text_len + extra_ctx
    # MACs/token/layer: self qkvo (4d^2) + cross q,o (2d^2) + ffn (2df)
    per_tok = 4 * d * d + 2 * d * d + 2 * d * f
    lin = 2 * streams * n_tokens * per_tok * cfg.num_layers
    lin += 2 * streams * ctx_len * 2 * d * d * cfg.num_layers  # cross kv
    attn = (4 * streams * cfg.num_heads * n_tokens * n_tokens
            * cfg.head_dim * cfg.num_layers)
    attn += (4 * streams * cfg.num_heads * n_tokens * ctx_len
             * cfg.head_dim * cfg.num_layers)
    return lin + attn


def main():
    import dataclasses

    from bench import wait_for_backend

    if not wait_for_backend():
        print(json.dumps({
            "metric": "e2e_sec_per_video_wan1.3b", "value": None,
            "unit": "s", "vs_baseline": None,
            "error": "device backend unavailable after wait budget",
        }))
        raise SystemExit(1)
    # BENCH_WAN_14B=1: the reference's flagship Wan config
    # (``/root/reference/wan/configs/wan_t2v_14B.py:8-29``). 14B on one
    # 16 GiB v5e runs the MIXED int4 tier (r5: per-group int4 bulk +
    # int8 sensitive leaves, ~7 GiB, leafwise init; clears the 40 dB gate)
    # with 4-way token-chunked FFN bounding the 13824-wide intermediate.
    is_14b = bool(os.environ.get("BENCH_WAN_14B"))
    # BENCH_WAN_I2V=1: the i2v-14B flagship instead
    # (``/root/reference/wan/configs/wan_i2v_14B.py`` — in_dim 36: the
    # 16 latent channels + 4 mask rows + 16 conditioning-frame channels
    # the pipeline concatenates, plus 257 CLIP context tokens through
    # MLPProj). Implies the 14B tiering.
    is_i2v = bool(os.environ.get("BENCH_WAN_I2V"))
    # BENCH_FFN_CHUNKS: widen the token-chunked FFN on a contended chip
    # (each doubling halves the 13824-wide FFN intermediate's footprint;
    # the r5a i2v window OOM'd at the default 4 after back-to-back 14B
    # runs held the pool)
    chunks = int(os.environ.get("BENCH_FFN_CHUNKS", "4") or 4)
    if is_i2v:
        from ltx_video_gpupoor_tpu.models.wan.model import WAN_I2V_14B

        is_14b = True
        cfg = dataclasses.replace(WAN_I2V_14B, ffn_chunks=chunks)
    else:
        cfg = dataclasses.replace(WAN_T2V_14B, ffn_chunks=chunks) \
            if is_14b else WAN_T2V_1_3B
    sb = os.environ.get("BENCH_SCORE_BOUND")
    if sb:
        cfg = dataclasses.replace(cfg, attention_score_bound=float(sb))
    am = os.environ.get("BENCH_ATTN") or os.environ.get("BENCH_ATTENTION")
    if am:
        from ltx_video_gpupoor_tpu.ops.attention import set_attention_mode

        set_attention_mode(am)
    f_lat = (FRAMES - 1) // 4 + 1
    h_lat, w_lat = HEIGHT // 8, WIDTH // 8
    n_tokens = f_lat * (h_lat // 2) * (w_lat // 2)

    key = jax.random.key(0)
    if is_14b:
        from bench import quantized_leafwise_init

        params = quantized_leafwise_init(
            lambda k: init_params(k, cfg), key,
            use_int8=bool(os.environ.get("BENCH_WAN_14B_INT8")),
        )
        tier = ("int8_dyn" if os.environ.get("BENCH_WAN_14B_INT8")
                else "int4_mixed")
    else:
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16), init_params(key, cfg)
        )
        tier = "bf16"
        if not os.environ.get("BENCH_BF16"):
            from ltx_video_gpupoor_tpu.ops.quant import quantize_params

            params = quantize_params(params, mode="dynamic")
            tier = "int8_dyn"
    if sb:
        tier += f"+bound{sb}"
    if am:
        tier += f"+{am}"
    from ltx_video_gpupoor_tpu.ops.rope import rope_heads_enabled

    if rope_heads_enabled(default=True):  # Wan family default since r3
        tier += "+ropeheads"

    # the carried latent is always 16 channels; i2v concatenates the
    # mask rows + conditioning-frame channels (in_dim - 16) per step
    # (text2video.py's y concat)
    lat_ch = 16 if is_i2v else cfg.in_dim
    x = jax.random.normal(
        key, (1, f_lat, h_lat, w_lat, lat_ch), jnp.bfloat16
    )
    cond_extra = jax.random.normal(
        key, (1, f_lat, h_lat, w_lat, cfg.in_dim - lat_ch), jnp.bfloat16
    ) if is_i2v else None
    clip_fea = jax.random.normal(
        key, (2, 257, 1280), jnp.bfloat16) if is_i2v else None
    ctx = jax.random.normal(key, (2, cfg.text_len, cfg.text_dim),
                            jnp.bfloat16)
    cmask = jnp.ones((2, cfg.text_len), jnp.int32)
    head_dim = cfg.dim // cfg.num_heads
    freqs = wan_rope_freqs(
        (f_lat, h_lat // 2, w_lat // 2), head_dim=head_dim
    )

    # TeaCache: static skip schedule (compute steps spread to hit the
    # multiplier — identical compute cost per executed step to threshold
    # calibration). A 4-step window can't represent e.g. 17/30, so with
    # TeaCache on we time the FULL 30-step schedule directly — no
    # extrapolation, the measured wall time IS the video's denoise time.
    tc_mult = float(os.environ.get("BENCH_TEACACHE", "0") or 0)
    timed_steps = FULL_STEPS if tc_mult > 1.0 else TIMED_STEPS
    sigmas = unipc.unipc_sigmas(timed_steps, shift=8.0)
    if tc_mult > 1.0:
        n_exec = max(2, int(round(timed_steps / tc_mult)))
        idx = np.linspace(0, timed_steps - 1, n_exec).round().astype(int)
        tc_mask = np.zeros(timed_steps, bool)
        tc_mask[idx] = True
        tier += f"+teacache{tc_mult}"
    else:
        tc_mask = np.ones(timed_steps, bool)
    tc_mask_j = jnp.asarray(tc_mask)
    exec_frac = float(tc_mask.mean())

    # One denoise segment (SEG_LEN steps) per device execution: a single
    # 30-step scan is a ~110 s XLA execution at these token counts, and
    # the shared relay's worker watchdog kills it ("TPU worker process
    # crashed or restarted" — reproduced 3x on the 30-step TeaCache run
    # while the 4-step run was fine). Host-chaining equal-shape segments
    # keeps one compile, stays async (no host fetch between segments),
    # and bounds every execution under ~20 s.
    # At 14B dims ONE step is ~3.4 PFLOP (~30 s on-chip), so even the
    # 4-step window exceeds the watchdog — single-step segments there.
    if is_14b:
        seg_len = 1
    else:
        seg_len = next(
            (s for s in (5, 6, 4, 3, 2) if timed_steps % s == 0), 1
        ) if timed_steps > 8 else timed_steps
    seg_len = int(os.environ.get("BENCH_SEG_LEN", seg_len) or seg_len)
    sig_pairs = jnp.stack([sigmas[:-1], sigmas[1:]], axis=1)  # [steps, 2]

    @jax.jit
    def denoise_seg(params, lat, res, pairs, mask):
        def body(carry, step):
            lat, res = carry
            pair, comp = step
            t = pair[0] * 1000.0
            model_in = lat if cond_extra is None else jnp.concatenate(
                [lat, cond_extra], axis=-1)
            xs = jnp.concatenate([model_in, model_in], axis=0)
            v, res = forward(
                params, cfg, xs, jnp.full((2,), t), ctx, cmask, freqs,
                clip_features=clip_fea,
                previous_residual=res, compute=comp,
            )
            un, co = jnp.split(v.astype(jnp.float32), 2, axis=0)
            pred = un + 5.0 * (co - un)
            # plain Euler between sigma levels (timing-equivalent to UniPC)
            lat = (
                lat.astype(jnp.float32) + (pair[1] - pair[0]) * pred
            ).astype(lat.dtype)
            return (lat, res), None

        return jax.lax.scan(body, (lat, res), (pairs, mask))[0]

    def denoise(params, lat):
        res = jnp.zeros((2, n_tokens, cfg.dim), jnp.bfloat16)
        for s in range(0, timed_steps, seg_len):
            lat, res = denoise_seg(
                params, lat, res,
                sig_pairs[s:s + seg_len], tc_mask_j[s:s + seg_len],
            )
        return lat[0, 0, 0, 0, 0].astype(jnp.float32)

    t0 = time.time()
    float(np.asarray(denoise(params, x)))
    compile_s = time.time() - t0
    t0 = time.time()
    float(np.asarray(denoise(params, x)))
    timed = time.time() - t0
    steps_per_sec = timed_steps / timed
    # TeaCache runs measure the full schedule directly; plain runs
    # extrapolate the uniform per-step rate to the 30-step video
    denoise_30 = timed if timed_steps == FULL_STEPS else (
        FULL_STEPS / steps_per_sec)

    fl = step_flops(cfg, n_tokens,
                    extra_ctx=257 if is_i2v else 0) * exec_frac
    mfu = fl * steps_per_sec / PEAK_BF16

    # denoise detail prints BEFORE the decode stage so a decode OOM on a
    # contended chip still leaves the denoise measurement in the log
    print(json.dumps({
        "tier": tier,
        "denoise_steps_per_sec": round(steps_per_sec, 3),
        "denoise_30steps_s": round(denoise_30, 2),
        "mfu_bf16_pct": round(mfu * 100, 1),
        "compile_s": round(compile_s, 1),
    }), flush=True)

    # 14B leaves ~7 GiB of DiT weights in HBM; serving swaps the DiT out
    # before the decode stage (the reference's mmgp offload ladder does
    # the same on CUDA, inference.py:442-509) — drop the buffers and let
    # the allocator reclaim before the VAE allocates its tiles.
    if is_14b:
        jax.tree.map(
            lambda a: a.delete() if hasattr(a, "delete") else None, params)
        del params

    # Wan VAE decode at full res
    vcfg = wvae.WanVAEConfig()
    vparams = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        wvae.init_params(jax.random.key(1), vcfg),
    )
    z = jax.random.normal(
        jax.random.key(2), (1, f_lat, h_lat, w_lat, vcfg.z_dim),
        jnp.bfloat16,
    )

    # 832x480x81f untiled materializes ~18 GB in the temporal upsample —
    # use the reference's 256 px tile class (its >=8 GB policy; v5e = 16 GB);
    # the tile loop runs on host with per-tile jitted decodes
    def decode(vp, z):
        out = wvae.spatial_tiled_decode(vp, vcfg, z, tile_size=256)
        return out[0, 0, 0, 0, 0].astype(jnp.float32)

    t0 = time.time()
    float(np.asarray(decode(vparams, z)))
    decode_compile_s = time.time() - t0
    t0 = time.time()
    float(np.asarray(decode(vparams, z)))
    decode_s = time.time() - t0

    family = ("wan14b_i2v" if is_i2v else "wan14b") if is_14b \
        else "wan1.3b"
    print(json.dumps({
        "metric": f"e2e_sec_per_video_{family}_{tier}_832x480x81f_30steps",
        "value": round(denoise_30 + decode_s, 2),
        "unit": "s",
        "vs_baseline": None,
    }))
    print(json.dumps({
        "tier": tier,
        "denoise_steps_per_sec": round(steps_per_sec, 3),
        "denoise_30steps_s": round(denoise_30, 2),
        "tokens_per_sec": round(n_tokens * 2 * steps_per_sec, 0),
        "mfu_bf16_pct": round(mfu * 100, 1),
        "vae_decode_s": round(decode_s, 3),
        "compile_s": round(compile_s + decode_compile_s, 1),
        "tokens": n_tokens,
    }))


if __name__ == "__main__":
    main()
