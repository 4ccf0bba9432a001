"""Fused adaLN-prologue + int8 linear tier (ops/fused_prologue.py) —
numerics parity vs the unfused XLA chain, kernel- and model-level
(interpreter mode; the TPU path shares the kernel body)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ltx_video_gpupoor_tpu.ops import fused_prologue as fp
from ltx_video_gpupoor_tpu.ops.norms import rms_norm
from ltx_video_gpupoor_tpu.ops.quant import (
    QuantizedLinear,
    int8_dynamic_matmul,
    quantize_weights,
)


def _ref_chain(x, scale, shift, q, bias, rows_per_group, eps):
    """The unfused tier: rms -> bf16 modulate -> int8-dynamic matmul."""
    h = rms_norm(x, eps=eps)
    reps = rows_per_group
    sc = jnp.repeat(scale, reps, axis=0).astype(x.dtype)
    sh = jnp.repeat(shift, reps, axis=0).astype(x.dtype)
    h = h * (1 + sc) + sh
    return int8_dynamic_matmul(h, q, bias)


@pytest.mark.parametrize("groups,bias", [(1, True), (2, False)])
def test_kernel_matches_unfused_chain(groups, bias):
    m, k, n = 64, 256, 384
    kx, kw, ks = jax.random.split(jax.random.key(0), 3)
    x = (jax.random.normal(kx, (m, k)) * 2).astype(jnp.bfloat16)
    w = jax.random.normal(kw, (k, n)).astype(jnp.bfloat16) * k**-0.5
    q = quantize_weights(w)
    scale = (jax.random.normal(ks, (groups, k)) * 0.1).astype(jnp.bfloat16)
    shift = (jax.random.normal(ks, (groups, k)) * 0.1).astype(jnp.bfloat16)
    b = jnp.arange(n, dtype=jnp.float32) * 1e-3 if bias else None

    rows = m // groups
    out = fp.norm_mod_int8_matmul(
        x, scale, shift, q.w_int8, q.scale, b,
        rows_per_group=rows, eps=1e-5, interpret=True,
    )
    ref = _ref_chain(x, scale, shift, q, b, rows, 1e-5)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=5e-2, rtol=5e-2,
    )


def test_rejects_group_straddling_blocks():
    """rows_per_group with no 16-multiple divisor must raise: a block
    straddling two adaLN groups would silently apply the wrong group's
    scale/shift to its tail rows (found by review: m=48, groups=2 ->
    rows 24-31 got group 0's modulation, max err ~40)."""
    m, k, n = 48, 64, 64
    x = jnp.ones((m, k), jnp.bfloat16)
    q = quantize_weights(jnp.ones((k, n), jnp.bfloat16))
    scale = jnp.zeros((2, k), jnp.bfloat16)
    shift = jnp.zeros((2, k), jnp.bfloat16)
    with pytest.raises(ValueError, match="straddle"):
        fp.norm_mod_int8_matmul(
            x, scale, shift, q.w_int8, q.scale, None,
            rows_per_group=24, eps=1e-5, interpret=True,
        )


def test_supports_gates_shapes():
    q = quantize_weights(jnp.ones((8, 16), jnp.bfloat16))
    good = {"w_int8_dyn": q.w_int8, "scale": q.scale}
    assert fp.supports([good], s=32, g=1)
    assert not fp.supports([good], s=33, g=1)      # rows not 16-multiple
    assert not fp.supports([good], s=32, g=3)      # groups don't divide
    assert not fp.supports([{"kernel": jnp.ones((8, 16))}], s=32, g=1)
    mixed = [dict(good), dict(good, bias=jnp.zeros((16,)))]
    assert not fp.supports(mixed, s=32, g=1)       # mixed bias layout


def test_rope_heads_layout_exact(monkeypatch):
    """LTXV_TPU_ROPE_HEADS writes the rotation's output directly in
    [B, H, S, d]; numerics must be EXACT vs the packed-rope path (same
    math, different layout), including under USP-style grouped t."""
    from ltx_video_gpupoor_tpu.models.ltx import transformer3d as t3d

    cfg = t3d.LTXTransformerConfig(
        num_attention_heads=4, attention_head_dim=32, in_channels=16,
        out_channels=16, num_layers=2, cross_attention_dim=64,
        caption_channels=32,
    )
    params = t3d.init_params(jax.random.key(0), cfg)
    b, s, sc = 2, 24, 8
    lat = jax.random.normal(jax.random.key(1), (b, s, 16))
    coords = jnp.tile(
        jax.random.uniform(jax.random.key(2), (1, 3, s), jnp.float32, 0, 8),
        (b, 1, 1),
    )
    cap = jax.random.normal(jax.random.key(3), (b, sc, 32))
    cmask = jnp.ones((b, sc), jnp.int32)
    t = jnp.full((b,), 0.4, jnp.float32)

    base = t3d.forward(params, cfg, lat, coords, t, cap, cmask,
                       attn_mode="xla")
    monkeypatch.setenv("LTXV_TPU_ROPE_HEADS", "1")
    out = t3d.forward(params, cfg, lat, coords, t, cap, cmask,
                      attn_mode="xla")
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(base), atol=1e-5, rtol=1e-5
    )


def test_wan_rope_heads_layout_exact(monkeypatch):
    """Same gate for the Wan family: forward() converts the shared
    [L, hd] tables to half layout once and the blocks write rope output
    head-major; numerics must match the packed-rope path."""
    from ltx_video_gpupoor_tpu.models.wan import model as wan_model
    from ltx_video_gpupoor_tpu.ops.rope import wan_rope_freqs

    cfg = wan_model.WanConfig(
        model_type="t2v", patch_size=(1, 2, 2), text_len=8, in_dim=4,
        dim=64, ffn_dim=128, freq_dim=32, text_dim=16, out_dim=4,
        num_heads=2, num_layers=2,
    )
    params = wan_model.init_params(jax.random.key(0), cfg)
    b, f, h, w = 2, 4, 4, 4
    x = jax.random.normal(jax.random.key(1), (b, f, h, w, cfg.in_dim))
    ctx = jax.random.normal(jax.random.key(2), (b, 8, cfg.text_dim))
    cmask = jnp.ones((b, 8), jnp.int32)
    t = jnp.full((b,), 500.0, jnp.float32)
    freqs = wan_rope_freqs((f, h // 2, w // 2), cfg.head_dim)

    base, _ = wan_model.forward(params, cfg, x, t, ctx, cmask, freqs,
                                attn_mode="xla")
    monkeypatch.setenv("LTXV_TPU_ROPE_HEADS", "1")
    out, _ = wan_model.forward(params, cfg, x, t, ctx, cmask, freqs,
                               attn_mode="xla")
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(base), atol=1e-5, rtol=1e-5
    )


def test_model_forward_matches_unfused(monkeypatch):
    """Whole-block parity: LTXTransformer forward with the fused tier
    (interpret) equals the unfused int8-dynamic forward."""
    from ltx_video_gpupoor_tpu.models.ltx import transformer3d as t3d
    from ltx_video_gpupoor_tpu.ops.quant import quantize_params

    cfg = t3d.LTXTransformerConfig(
        num_attention_heads=4, attention_head_dim=32, in_channels=16,
        out_channels=16, num_layers=2, cross_attention_dim=64,
        caption_channels=32,
    )
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16),
        t3d.init_params(jax.random.key(0), cfg),
    )
    params = quantize_params(params, mode="dynamic")
    b, s, sc = 2, 32, 8
    lat = jax.random.normal(jax.random.key(1), (b, s, 16), jnp.bfloat16)
    coords = jnp.tile(
        jax.random.uniform(jax.random.key(2), (1, 3, s), jnp.float32, 0, 8),
        (b, 1, 1),
    )
    cap = jax.random.normal(jax.random.key(3), (b, sc, 32), jnp.bfloat16)
    cmask = jnp.ones((b, sc), jnp.int32)
    t = jnp.full((b,), 0.4, jnp.float32)

    base = t3d.forward(params, cfg, lat, coords, t, cap, cmask,
                       attn_mode="xla")
    monkeypatch.setenv("LTXV_TPU_FUSED_PROLOGUE", "interpret")
    fused = t3d.forward(params, cfg, lat, coords, t, cap, cmask,
                        attn_mode="xla")
    np.testing.assert_allclose(
        np.asarray(fused, np.float32), np.asarray(base, np.float32),
        atol=5e-2, rtol=5e-2,
    )

    # grouped timesteps (per-frame-group t) exercise the group-row path
    tg = jnp.tile(jnp.asarray([[0.2, 0.7]], jnp.float32), (b, 1))
    monkeypatch.delenv("LTXV_TPU_FUSED_PROLOGUE")
    base_g = t3d.forward(params, cfg, lat, coords, tg, cap, cmask,
                         attn_mode="xla")
    monkeypatch.setenv("LTXV_TPU_FUSED_PROLOGUE", "interpret")
    fused_g = t3d.forward(params, cfg, lat, coords, tg, cap, cmask,
                          attn_mode="xla")
    np.testing.assert_allclose(
        np.asarray(fused_g, np.float32), np.asarray(base_g, np.float32),
        atol=5e-2, rtol=5e-2,
    )
