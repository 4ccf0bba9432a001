"""On-hardware numerics check: Pallas kernel paths vs the XLA oracle.

The pytest suite runs on a virtual CPU mesh (tests/conftest.py), where the
Pallas kernel only executes under the interpreter — so the compiled
Mosaic kernel (including the bounded-score fast path that engages when a
model's qk-norm is on) is exercised by benchmarks but not numerically
pinned at model level on the real chip. This tool closes that: it runs
the LTX and Wan DiT forwards twice on the TPU — attention mode "pallas"
vs "xla" — and reports max|Δ| / relative error. Run from the repo root:

    python tools/check_tpu_parity.py
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def _rel(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    denom = max(np.abs(b).max(), 1e-6)
    return np.abs(a - b).max(), np.abs(a - b).max() / denom


def check_ltx():
    from ltx_video_gpupoor_tpu.models.ltx.transformer3d import (
        LTXTransformerConfig,
        forward,
        init_params,
    )

    cfg = LTXTransformerConfig(
        num_attention_heads=32,
        attention_head_dim=64,
        in_channels=128,
        out_channels=128,
        num_layers=4,
        cross_attention_dim=2048,
        caption_channels=4096,
    )
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16), init_params(jax.random.key(0), cfg)
    )
    b, s, sc = 2, 1280, 256
    key = jax.random.key(1)
    tokens = jax.random.normal(key, (b, s, cfg.in_channels), jnp.bfloat16)
    coords = jnp.tile(
        jax.random.uniform(key, (1, 3, s), jnp.float32, 0, 24), (b, 1, 1)
    )
    t = jnp.full((b,), 0.4, jnp.float32)
    caption = jax.random.normal(key, (b, sc, cfg.caption_channels), jnp.bfloat16)
    mask = jnp.ones((b, sc), jnp.int32).at[:, 200:].set(0)

    fwd = jax.jit(forward, static_argnames=("cfg", "attn_mode"))
    outs = {
        mode: np.asarray(
            fwd(
                params, cfg, tokens, coords, t, caption, mask,
                attn_mode=mode,
            ).astype(jnp.float32)
        )
        for mode in ("pallas", "xla")
    }
    ad, rd = _rel(outs["pallas"], outs["xla"])
    print(f"LTX forward  pallas-vs-xla: max|d|={ad:.3e}  rel={rd:.3e}")
    return rd


def check_wan():
    from ltx_video_gpupoor_tpu.models.wan.model import (
        WanConfig,
        forward,
        init_params,
    )
    from ltx_video_gpupoor_tpu.ops.rope import wan_rope_freqs

    cfg = WanConfig(
        dim=512, ffn_dim=1024, num_heads=4, num_layers=2, text_dim=1024,
    )
    params = init_params(jax.random.key(0), cfg)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 and x.ndim >= 2 else x,
        params,
    )
    f, h, w = 5, 8, 12
    s = f * h * w
    key = jax.random.key(2)
    x = jax.random.normal(key, (1, f, h, w, 16), jnp.bfloat16)
    t = jnp.full((1,), 500.0, jnp.float32)
    ctx = jax.random.normal(key, (1, 512, cfg.text_dim), jnp.bfloat16)
    ctx_mask = jnp.ones((1, 512), jnp.int32).at[:, 77:].set(0)
    # token grid after the (1, 2, 2) patch embed
    freqs = wan_rope_freqs((f, h // 2, w // 2), cfg.head_dim)

    outs = {
        mode: np.asarray(
            forward(
                params, cfg, x, t, ctx, ctx_mask, freqs, attn_mode=mode
            )[0].astype(jnp.float32)
        )
        for mode in ("pallas", "xla")
    }
    ad, rd = _rel(outs["pallas"], outs["xla"])
    print(f"Wan forward  pallas-vs-xla: max|d|={ad:.3e}  rel={rd:.3e}")
    return rd


if __name__ == "__main__":
    platform = jax.devices()[0].platform
    print(f"platform: {platform}")
    worst = max(check_ltx(), check_wan())
    # bf16 forward: anything under ~1% relative is kernel-equivalent
    ok = worst < 1e-2
    print("PARITY OK" if ok else "PARITY FAIL")
    sys.exit(0 if ok else 1)
