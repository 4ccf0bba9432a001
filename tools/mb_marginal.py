"""Marginal step-cost ablations for the headline LTX-2B config.

The standalone stage table (tools/bench_breakdown.py) over-counts: its sum
(537 ms) exceeds the measured step (460 ms) because XLA fuses neighboring
stages in the real graph. This tool measures each candidate optimization's
MARGINAL value by timing the FULL step with one stage ablated/substituted:

  base          — the exact bench step (int8-dynamic tier, freqs hoisted)
  no_rope       — apply_rotary_emb patched to identity
  no_self_attn  — self-attention kernel replaced by identity on v
  no_cross_attn — cross-attention kernel replaced by identity on q
  int8qk        — self-attention via the int8-QK tier

Run: python tools/mb_marginal.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from ltx_video_gpupoor_tpu.models.ltx import transformer3d as t3d
from ltx_video_gpupoor_tpu.ops import attention as attn_mod
from ltx_video_gpupoor_tpu.ops.quant import quantize_params

B, S, SC, STEPS = 2, 5280, 256, 30


from _bench_util import require_backend, sync_scalar as _sync  # noqa: E402


def main():
    require_backend()
    cfg = t3d.LTXTransformerConfig(
        num_attention_heads=32, attention_head_dim=64, in_channels=128,
        out_channels=128, num_layers=28, cross_attention_dim=2048,
        caption_channels=4096,
    )
    key = jax.random.key(0)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16), t3d.init_params(key, cfg)
    )
    params = quantize_params(params, mode="dynamic")

    lat = jax.random.normal(key, (B, S, cfg.in_channels), jnp.bfloat16)
    coords = jnp.tile(
        jax.random.uniform(key, (1, 3, S), jnp.float32, 0, 24), (B, 1, 1)
    )
    caption = jax.random.normal(
        key, (B, SC, cfg.caption_channels), jnp.bfloat16
    )
    cmask = jnp.ones((B, SC), jnp.int32)
    t = jnp.full((B,), 0.4, jnp.float32)
    freqs = t3d.compute_freqs(cfg, coords)

    orig_rope = t3d.apply_rotary_emb
    orig_attn = t3d.attention
    orig_packed = t3d.attention_packed
    orig_std = t3d._std_norm
    orig_bg = t3d._broadcast_groups

    def run_variant(name, rope=None, attn=None, packed=None, pad_s=False,
                    full_freqs=False, std=None, bg=None, env=None,
                    n=8, reps=2):
        import os

        t3d.apply_rotary_emb = rope or orig_rope
        t3d.attention = attn or orig_attn
        t3d.attention_packed = packed or orig_packed
        t3d._std_norm = std or orig_std
        t3d._broadcast_groups = bg or orig_bg
        saved_env = {}
        for kk, vv in (env or {}).items():
            saved_env[kk] = os.environ.get(kk)
            os.environ[kk] = vv
        if pad_s:
            # whole model at S padded to a 128-multiple: the per-layer
            # pad/unpad copies inside attention() disappear (S % 128 == 0
            # -> needs_pad False); 96 extra rows of linear/norm work.
            sp = -(-S // 128) * 128
            my_lat = jnp.pad(lat, ((0, 0), (0, sp - S), (0, 0)))
            my_coords = jnp.pad(coords, ((0, 0), (0, 0), (0, sp - S)))
            my_freqs = t3d.compute_freqs(cfg, my_coords)
        else:
            my_lat, my_coords, my_freqs = lat, coords, freqs
        if full_freqs and my_freqs[0].shape[-1] * 2 == cfg.inner_dim:
            # pair-duplicate ONCE outside the layer loop (the rope_mm
            # variant consumes full-width tables)
            my_freqs = tuple(jnp.repeat(f, 2, axis=-1) for f in my_freqs)
        try:
            @jax.jit
            def prog(params, lat):
                def body(i, acc):
                    la = lat + (acc * 1e-6).astype(lat.dtype)
                    v = t3d.forward(
                        params, cfg, la, my_coords, t, caption, cmask,
                        freqs=my_freqs,
                    )
                    return v[0, 0, 0].astype(jnp.float32)
                return jax.lax.fori_loop(0, n, body, jnp.float32(0))

            _sync(prog(params, my_lat))
            t0 = time.time()
            for _ in range(reps):
                o = prog(params, my_lat)
            _sync(o)
            dt = (time.time() - t0) / (reps * n)
            print(f"{name:14s} {dt*1e3:8.2f} ms/step "
                  f"(30 steps: {dt*30:6.2f} s)")
            return dt
        finally:
            t3d.apply_rotary_emb = orig_rope
            t3d.attention = orig_attn
            t3d.attention_packed = orig_packed
            t3d._std_norm = orig_std
            t3d._broadcast_groups = orig_bg
            import os

            for kk, vv in saved_env.items():
                if vv is None:
                    os.environ.pop(kk, None)
                else:
                    os.environ[kk] = vv

    def rope_id(x, cos, sin):
        return x

    # rotate_pairs as a constant [64, 64] signed-permutation matmul per
    # head: no stride-2 lane relayouts; the tiny matmul rides the MXU.
    hd = cfg.attention_head_dim
    R = np.zeros((hd, hd), np.float32)
    for i in range(0, hd, 2):
        R[i + 1, i] = -1.0  # out[2i] = -x[2i+1]
        R[i, i + 1] = 1.0   # out[2i+1] = x[2i]
    Rm = jnp.asarray(R)

    def rope_mm(x, cos, sin):
        b, s, d = x.shape
        xf = x.astype(jnp.float32).reshape(b, s, d // hd, hd)
        rot = jnp.einsum("bshd,de->bshe", xf, Rm).reshape(b, s, d)
        xf = xf.reshape(b, s, d)
        return (xf * cos + rot * sin).astype(x.dtype)

    def packed_no_self(q, k, v, heads, **kw):
        return v

    def packed_sum_self(q, k, v, heads, **kw):
        return q + k + v

    def attn_no_cross(q, k, v, *a, **kw):
        if k.shape[2] <= 1024:  # cross (kv = caption tokens)
            return q
        return orig_attn(q, k, v, *a, **kw)

    def packed_int8(q, k, v, heads, **kw):
        kw["mode"] = "pallas_int8"
        return orig_packed(q, k, v, heads, **kw)

    def packed_int8pv(q, k, v, heads, **kw):
        kw["mode"] = "pallas_int8pv"
        return orig_packed(q, k, v, heads, **kw)

    def packed_hp(q, k, v, heads, **kw):
        kw["mode"] = "pallas_hp"
        return orig_packed(q, k, v, heads, **kw)

    # --- r3 candidates: adaLN prologue + rope-on-heads layout -------------

    def std_id(cfg_, x):
        return x

    def bg_rowvec(vals, n_tokens):
        # [B, 1, D] broadcast instead of materialized per-token rows:
        # timing-only ablation bounding the modulate-broadcast cost
        return vals[:, :1]


    variants = {
        "base": {},
        "no_rope": {"rope": rope_id},
        "no_self_attn": {"packed": packed_no_self},
        "no_cross_attn": {"attn": attn_no_cross},
        "int8qk_self": {"packed": packed_int8},
        "int8pv_self": {"packed": packed_int8pv},
        "hp_self": {"packed": packed_hp},
        "padded_s": {"pad_s": True},
        "rope_mm": {"rope": rope_mm, "full_freqs": True},
        "rope_mm_padded": {"rope": rope_mm, "full_freqs": True,
                           "pad_s": True},
        # r3: adaLN prologue ceiling + components, rope-on-heads fusion
        "no_norm_mod": {"std": std_id, "bg": bg_rowvec},
        "norm_id": {"std": std_id},
        "mod_rowvec": {"bg": bg_rowvec},
        # measures the productized env-gated path in transformer3d
        "rope_heads": {"env": {"LTXV_TPU_ROPE_HEADS": "1"}},
        "fused_prologue": {"env": {"LTXV_TPU_FUSED_PROLOGUE": "1"}},
        "fused_all": {"env": {"LTXV_TPU_FUSED_PROLOGUE": "1",
                              "LTXV_TPU_ROPE_HEADS": "1"}},
    }
    want = sys.argv[1:] or list(variants)
    for name in want:
        run_variant(name, **variants[name])
        sys.stdout.flush()


if __name__ == "__main__":
    main()
