"""Secondary benchmark: Wan2.1-1.3B t2v denoise throughput on one TPU chip.

Config mirrors the reference's Wan 1.3B text-to-video serving path
(``/root/reference/wan/text2video.py``): 832x480, 81 frames (latent
21x60x104, patchified to 32 760 tokens), CFG with two guidance streams,
UMT5 text length 512, bf16 weights. TeaCache off (worst case). Times a
4-step chained denoise and reports steps/sec plus the extrapolated
sec/video at the reference's 30 sampling steps (denoise only; the Wan
VAE decode is timed separately on the detail line).

Prints ONE JSON line like bench.py; run directly: ``python bench_wan.py``.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ltx_video_gpupoor_tpu.models.wan import vae as wvae
from ltx_video_gpupoor_tpu.models.wan.model import (
    WAN_T2V_1_3B,
    forward,
    init_params,
)
from ltx_video_gpupoor_tpu.ops.rope import wan_rope_freqs
from ltx_video_gpupoor_tpu.schedulers import unipc

HEIGHT, WIDTH, FRAMES = 480, 832, 81
TIMED_STEPS, FULL_STEPS = 4, 30


def main():
    cfg = WAN_T2V_1_3B
    f_lat = (FRAMES - 1) // 4 + 1
    h_lat, w_lat = HEIGHT // 8, WIDTH // 8

    key = jax.random.key(0)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16), init_params(key, cfg)
    )
    x = jax.random.normal(
        key, (1, f_lat, h_lat, w_lat, cfg.in_dim), jnp.bfloat16
    )
    ctx = jax.random.normal(key, (2, cfg.text_len, cfg.text_dim),
                            jnp.bfloat16)
    cmask = jnp.ones((2, cfg.text_len), jnp.int32)
    head_dim = cfg.dim // cfg.num_heads
    freqs = wan_rope_freqs(
        (f_lat, h_lat // 2, w_lat // 2), head_dim=head_dim
    )
    sigmas = unipc.unipc_sigmas(TIMED_STEPS, shift=8.0)

    @jax.jit
    def denoise(params, lat):
        def body(lat, i):
            t = sigmas[i] * 1000.0
            xs = jnp.concatenate([lat, lat], axis=0)
            v, _ = forward(
                params, cfg, xs, jnp.full((2,), t), ctx, cmask, freqs
            )
            un, co = jnp.split(v.astype(jnp.float32), 2, axis=0)
            pred = un + 5.0 * (co - un)
            # plain Euler between sigma levels (timing-equivalent to UniPC)
            lat = (
                lat.astype(jnp.float32)
                + (sigmas[i + 1] - sigmas[i]) * pred
            ).astype(lat.dtype)
            return lat, None

        lat, _ = jax.lax.scan(body, lat, jnp.arange(TIMED_STEPS))
        return lat[0, 0, 0, 0, 0].astype(jnp.float32)

    t0 = time.time()
    float(np.asarray(denoise(params, x)))
    compile_s = time.time() - t0
    t0 = time.time()
    float(np.asarray(denoise(params, x)))
    timed = time.time() - t0
    steps_per_sec = TIMED_STEPS / timed
    denoise_30 = FULL_STEPS / steps_per_sec

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

    print(json.dumps({
        "metric": "e2e_sec_per_video_wan1.3b_832x480x81f_30steps",
        "value": round(denoise_30 + decode_s, 2),
        "unit": "s",
        "vs_baseline": None,
    }))
    print(json.dumps({
        "denoise_steps_per_sec": round(steps_per_sec, 3),
        "denoise_30steps_s": round(denoise_30, 2),
        "vae_decode_s": round(decode_s, 3),
        "compile_s": round(compile_s + decode_compile_s, 1),
        "tokens": f_lat * (h_lat // 2) * (w_lat // 2),
    }))


if __name__ == "__main__":
    main()
