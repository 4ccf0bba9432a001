"""On-hardware numerics check: Pallas kernel paths vs the XLA oracle.

The pytest suite runs on a virtual CPU mesh (tests/conftest.py), where the
Pallas kernel only executes under the interpreter — so the compiled
Mosaic kernel is exercised by benchmarks but not numerically pinned at
model level on the real chip. This tool closes that. It checks:

1. LTX + Wan DiT forwards, attention mode "pallas" vs "xla", with the
   default exact online softmax AND with the opt-in bounded-score tier
   (``attention_score_bound=40``).
2. ``--stress``: kernel-level adversarial q/k whose row max-|logit|
   sweeps up to just below the bound — the regime where the clamped
   max-free softmax must still match the exact oracle.  Random-init
   model weights never reach such logits, so without this the bounded
   fast path trivially matches (ADVICE r1).  Above-bound saturation is
   also measured and reported (not gated: clamping beyond the bound is
   the tier's documented behavior — deploy the tier only on checkpoints
   whose measured max |logit| stays below the bound).

Run from the repo root on the real TPU:

    python tools/check_tpu_parity.py [--stress] [--json PATH]

Exit 0 iff every gated check passes; ``--json`` writes the numbers for
driver-visible artifacts (bench.py invokes this in-process).
"""

import argparse
import dataclasses
import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

# bf16 forward: anything under ~1% relative is kernel-equivalent
MODEL_REL_TOL = 1e-2
# kernel-level bounded-vs-exact with adversarially sharp rows below the
# bound: the fixed exponent offset costs one exp2 rounding step vs the
# running max, fp32 statistics keep it ~1e-3
STRESS_REL_TOL = 2e-2


def _rel(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    denom = max(np.abs(b).max(), 1e-6)
    return float(np.abs(a - b).max()), float(np.abs(a - b).max() / denom)


def check_ltx(score_bound=None):
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
        attention_score_bound=score_bound,
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
    tier = f"bound={score_bound}" if score_bound else "exact"
    print(f"LTX forward [{tier}]  pallas-vs-xla: max|d|={ad:.3e}  rel={rd:.3e}")
    return rd


def check_wan(score_bound=None):
    from ltx_video_gpupoor_tpu.models.wan.model import (
        WanConfig,
        forward,
        init_params,
    )
    from ltx_video_gpupoor_tpu.ops.rope import wan_rope_freqs

    cfg = WanConfig(
        dim=512, ffn_dim=1024, num_heads=4, num_layers=2, text_dim=1024,
        attention_score_bound=score_bound,
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
    tier = f"bound={score_bound}" if score_bound else "exact"
    print(f"Wan forward [{tier}]  pallas-vs-xla: max|d|={ad:.3e}  rel={rd:.3e}")
    return rd


def _sharp_qk(key, b, h, s, d, scale, target_logits):
    """q/k with controlled per-row max logits.

    Base: unit-norm random directions (logits O(1) after scaling).  For
    row group g with target L: q rows are a shared direction u scaled so
    q·k*scale == L against matching k rows — the sharp-attention regime a
    qk-normed trained model produces but random init never does.
    """
    kq, kk = jax.random.split(key)
    q = jax.random.normal(kq, (b, h, s, d), jnp.float32)
    k = jax.random.normal(kk, (b, h, s, d), jnp.float32)
    q /= jnp.linalg.norm(q, axis=-1, keepdims=True)
    k /= jnp.linalg.norm(k, axis=-1, keepdims=True)
    rows_per = s // len(target_logits)
    for g, L in enumerate(target_logits):
        lo = g * rows_per
        # point q rows [lo, lo+rows_per) at k row lo, magnitude L/scale
        u = k[:, :, lo, :]                        # [b, h, d] unit-ish
        u = u / jnp.linalg.norm(u, axis=-1, keepdims=True)
        amp = L / scale
        q = q.at[:, :, lo:lo + rows_per, :].set(
            (u * amp)[:, :, None, :]
            + 0.1 * q[:, :, lo:lo + rows_per, :]
        )
    return q.astype(jnp.bfloat16), k.astype(jnp.bfloat16)


def stress_bounded_kernel(bound=40.0):
    """Adversarially sharp rows: below-bound must match exact; above-bound
    saturation is measured and reported."""
    from ltx_video_gpupoor_tpu.ops.flash_attention import (
        flash_attention,
        reference_attention,
    )

    b, h, s, d = 1, 4, 1024, 64
    scale = d ** -0.5
    key = jax.random.key(7)
    v = jax.random.normal(jax.random.key(8), (b, h, s, d), jnp.bfloat16)

    results = {}
    # Regime 1 (gated): row max-logits sweep up to just below the bound.
    q, k = _sharp_qk(key, b, h, s, d, scale, (5.0, 15.0, 25.0, 35.0))
    o_b = flash_attention(q, k, v, score_bound=bound)
    o_e = reference_attention(q, k, v)
    ad, rd = _rel(o_b, o_e)
    print(f"stress below-bound (max logit 35 < {bound}): "
          f"max|d|={ad:.3e}  rel={rd:.3e}")
    results["below_bound_rel"] = rd

    # Regime 2 (reported): logits beyond the bound clamp and tie.
    q, k = _sharp_qk(key, b, h, s, d, scale, (50.0, 60.0, 70.0, 80.0))
    o_b = flash_attention(q, k, v, score_bound=bound)
    o_e = reference_attention(q, k, v)
    ad, rd = _rel(o_b, o_e)
    print(f"stress above-bound (logits 50-80 > {bound}, clamp ties): "
          f"max|d|={ad:.3e}  rel={rd:.3e}  [reported, not gated]")
    results["above_bound_rel"] = rd
    return results


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--stress", action="store_true",
                    help="adversarial sharp-logit stress of the bounded tier")
    ap.add_argument("--json", default=None, metavar="PATH",
                    help="write results JSON for driver artifacts")
    args = ap.parse_args(argv)

    platform = jax.devices()[0].platform
    print(f"platform: {platform}")
    res = {"platform": platform}
    gated = []
    for tier, sb in (("exact", None), ("bound40", 40.0)):
        l = check_ltx(sb)
        w = check_wan(sb)
        res[f"ltx_rel_{tier}"] = l
        res[f"wan_rel_{tier}"] = w
        gated += [(f"model {tier}", max(l, w), MODEL_REL_TOL)]
    if args.stress:
        sres = stress_bounded_kernel()
        res.update(sres)
        gated.append(("stress below-bound", sres["below_bound_rel"],
                      STRESS_REL_TOL))

    ok = all(v < tol for _, v, tol in gated)
    res["ok"] = ok
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(res, fh, indent=1)
    for name, v, tol in gated:
        print(f"  gate {name}: {v:.3e} < {tol:g} "
              f"{'ok' if v < tol else 'FAIL'}")
    print("PARITY OK" if ok else "PARITY FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
