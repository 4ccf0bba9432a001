import jax
import jax.numpy as jnp
import numpy as np

from ltx_video_gpupoor_tpu.core.lora import merge_lora, normalize_lora_keys
from ltx_video_gpupoor_tpu.ops.quant import (
    QuantizedLinear,
    dequantize_weights,
    int8_dynamic_matmul,
    int8_wo_matmul,
    maybe_quantized_matmul,
    quantize_params,
    quantize_weights,
)


def test_quantize_roundtrip_error():
    w = jax.random.normal(jax.random.key(0), (64, 32))
    q = quantize_weights(w)
    assert q.w_int8.dtype == jnp.int8
    back = dequantize_weights(q, jnp.float32)
    rel = np.abs(np.asarray(back - w)).max() / np.abs(np.asarray(w)).max()
    assert rel < 0.01  # 7-bit symmetric quantization


def test_int8_wo_matmul_close_to_fp():
    x = jax.random.normal(jax.random.key(1), (8, 64))
    w = jax.random.normal(jax.random.key(2), (64, 32))
    q = quantize_weights(w)
    ref = x @ w
    out = int8_wo_matmul(x, q)
    err = np.abs(np.asarray(out - ref)).max() / np.abs(np.asarray(ref)).max()
    assert err < 0.05


def test_int8_dynamic_matmul_close_to_fp():
    x = jax.random.normal(jax.random.key(1), (8, 64))
    w = jax.random.normal(jax.random.key(2), (64, 32))
    q = quantize_weights(w)
    ref = x @ w
    out = int8_dynamic_matmul(x, q)
    err = np.abs(np.asarray(out - ref)).max() / np.abs(np.asarray(ref)).max()
    assert err < 0.1


def test_quantize_params_tree():
    params = {
        "blocks": {"attn": {"to_q": {"kernel": jnp.ones((3, 16, 16)),
                                     "bias": jnp.zeros((16,))}}},
        "norm": {"weight": jnp.ones((16,))},
    }
    qp = quantize_params(params)
    q = qp["blocks"]["attn"]["to_q"]
    assert "w_int8" in q and q["w_int8"].shape == (3, 16, 16)
    assert q["scale"].shape == (3, 16)
    assert "weight" in qp["norm"]  # non-kernel leaves untouched
    x = jnp.ones((2, 16))
    out = maybe_quantized_matmul(
        {"w_int8": q["w_int8"][0], "scale": q["scale"][0],
         "bias": jnp.zeros((16,))}, x,
    )
    np.testing.assert_allclose(np.asarray(out), 16.0, rtol=0.02)


def test_normalize_comfy_lora_keys():
    sd = {
        "lora_unet_blocks_0_attn1_to_q.lora_down.weight": np.zeros((4, 8)),
        "lora_unet_blocks_0_attn1_to_q.lora_up.weight": np.zeros((8, 4)),
    }
    out = normalize_lora_keys(sd)
    assert "blocks.0.attn1.to_q.lora_A.weight" in out
    assert "blocks.0.attn1.to_q.lora_B.weight" in out


def test_merge_lora_into_stacked_blocks():
    rng = np.random.RandomState(0)
    params = {
        "blocks": {"attn1": {"to_q": {
            "kernel": jnp.asarray(rng.randn(2, 8, 8).astype(np.float32))
        }}},
    }
    down = rng.randn(4, 8).astype(np.float32)   # [r, in]
    up = rng.randn(8, 4).astype(np.float32)     # [out, r]
    sd = {
        "transformer_blocks.1.attn1.to_q.lora_A.weight": down,
        "transformer_blocks.1.attn1.to_q.lora_B.weight": up,
    }
    merged, n = merge_lora(params, sd, multiplier=0.5)
    assert n == 1
    delta = 0.5 * (up @ down).T
    np.testing.assert_allclose(
        np.asarray(merged["blocks"]["attn1"]["to_q"]["kernel"][1]),
        np.asarray(params["blocks"]["attn1"]["to_q"]["kernel"][1]) + delta,
        atol=1e-5,
    )
    # layer 0 untouched
    np.testing.assert_array_equal(
        np.asarray(merged["blocks"]["attn1"]["to_q"]["kernel"][0]),
        np.asarray(params["blocks"]["attn1"]["to_q"]["kernel"][0]),
    )


def test_quantized_transformer_forward_close():
    """Runtime int8 weight-only transformer matches bf16 closely."""
    from ltx_video_gpupoor_tpu.models.ltx import patchifier
    from ltx_video_gpupoor_tpu.models.ltx.transformer3d import (
        LTXTransformerConfig,
        forward,
        init_params,
    )

    cfg = LTXTransformerConfig(
        num_attention_heads=2, attention_head_dim=16, in_channels=8,
        out_channels=8, num_layers=2, cross_attention_dim=16,
        caption_channels=16,
    )
    params = init_params(jax.random.key(0), cfg)
    qparams = quantize_params(params)
    lat = jax.random.normal(jax.random.key(1), (1, 2, 4, 4, 8)) * 0.3
    tokens, coords = patchifier.patchify(lat)
    cap = jax.random.normal(jax.random.key(2), (1, 6, 16)) * 0.3
    mask = jnp.ones((1, 6), jnp.int32)
    t = jnp.full((1,), 0.5)
    base = forward(params, cfg, tokens, coords, t, cap, mask)
    quant = forward(qparams, cfg, tokens, coords, t, cap, mask)
    rel = np.abs(np.asarray(quant - base)).max() / (
        np.abs(np.asarray(base)).max() + 1e-9
    )
    assert rel < 0.1, rel


def test_dynamic_mode_transformer_forward_close():
    """mode="dynamic" stores under w_int8_dyn and routes through the
    int8xint8 MXU path; output stays close to bf16."""
    from ltx_video_gpupoor_tpu.core.params import flatten
    from ltx_video_gpupoor_tpu.models.ltx import patchifier
    from ltx_video_gpupoor_tpu.models.ltx.transformer3d import (
        LTXTransformerConfig,
        forward,
        init_params,
    )

    cfg = LTXTransformerConfig(
        num_attention_heads=2, attention_head_dim=16, in_channels=8,
        out_channels=8, num_layers=2, cross_attention_dim=16,
        caption_channels=16,
    )
    params = init_params(jax.random.key(0), cfg)
    qparams = quantize_params(params, mode="dynamic")
    assert any(k.endswith(".w_int8_dyn") for k in flatten(qparams))
    assert not any(k.endswith(".w_int8") for k in flatten(qparams))
    lat = jax.random.normal(jax.random.key(1), (1, 2, 4, 4, 8)) * 0.3
    tokens, coords = patchifier.patchify(lat)
    cap = jax.random.normal(jax.random.key(2), (1, 6, 16)) * 0.3
    mask = jnp.ones((1, 6), jnp.int32)
    t = jnp.full((1,), 0.5)
    base = forward(params, cfg, tokens, coords, t, cap, mask)
    quant = forward(qparams, cfg, tokens, coords, t, cap, mask)
    rel = np.abs(np.asarray(quant - base)).max() / (
        np.abs(np.asarray(base)).max() + 1e-9
    )
    assert rel < 0.15, rel


def test_maybe_quantized_matmul_dynamic_key():
    from ltx_video_gpupoor_tpu.ops.quant import (
        maybe_quantized_matmul,
        quantize_weights,
    )

    w = jax.random.normal(jax.random.key(0), (32, 16))
    x = jax.random.normal(jax.random.key(1), (4, 32))
    ql = quantize_weights(w)
    ref = x @ w
    out = maybe_quantized_matmul(
        {"w_int8_dyn": ql.w_int8, "scale": ql.scale}, x
    )
    rel = np.abs(np.asarray(out - ref)).max() / np.abs(np.asarray(ref)).max()
    assert rel < 0.05, rel


def test_int4_wo_tier_accuracy_and_routing():
    """int4 weight-only: larger error than int8 but bounded; routes
    through _apply_linear via the w_int4 key."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ltx_video_gpupoor_tpu.models.ltx.transformer3d import _apply_linear
    from ltx_video_gpupoor_tpu.ops.quant import (
        QuantizedLinear4,
        int4_wo_matmul,
        quantize_params,
        quantize_weights_int4,
    )

    w = jax.random.normal(jax.random.key(0), (64, 32)) * 0.05
    x = jax.random.normal(jax.random.key(1), (4, 64))
    q = quantize_weights_int4(w)
    assert q.w_int4.dtype == jnp.int8 and q.w_int4.shape == (32, 32)
    ref = x @ w
    out = int4_wo_matmul(x, q)
    rel = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
    assert rel < 0.12  # int4 WO accuracy class

    params = {"lin": {"kernel": w, "bias": jnp.zeros((32,))}}
    qp = quantize_params(params, lambda k: k.endswith(".kernel"),
                         mode="wo_int4")
    assert "w_int4" in qp["lin"]
    routed = _apply_linear(qp["lin"], x)
    np.testing.assert_allclose(
        np.asarray(routed), np.asarray(out), atol=1e-5, rtol=1e-4
    )


def test_wan_model_quantized_forward():
    """The Wan DiT runs with quantized linears (dynamic int8 and int4-WO)
    via the same w_* param-key routing as LTX."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ltx_video_gpupoor_tpu.models.wan import model as wan_model
    from ltx_video_gpupoor_tpu.ops.quant import quantize_params
    from ltx_video_gpupoor_tpu.ops.rope import wan_rope_freqs

    cfg = wan_model.WanConfig(
        dim=128, ffn_dim=256, num_heads=2, num_layers=2, text_dim=64,
    )
    params = wan_model.init_params(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (1, 2, 4, 4, cfg.in_dim))
    t = jnp.full((1,), 500.0)
    ctx = jax.random.normal(jax.random.key(2), (1, 16, cfg.text_dim))
    cmask = jnp.ones((1, 16), jnp.int32)
    freqs = wan_rope_freqs((2, 2, 2), cfg.head_dim)
    ref, _ = wan_model.forward(params, cfg, x, t, ctx, cmask, freqs)
    ref = np.asarray(ref)
    for mode, tol in (("dynamic", 0.08), ("wo_int4", 0.4)):
        qp = quantize_params(params, mode=mode)
        out, _ = wan_model.forward(qp, cfg, x, t, ctx, cmask, freqs)
        out = np.asarray(out)
        assert np.isfinite(out).all()
        rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-8)
        assert rel < tol, (mode, rel)


def test_maybe_quantized_matmul_int4_key():
    """mode="wo_int4" params route through maybe_quantized_matmul (it
    previously KeyError'd on the w_int4 layout)."""
    from ltx_video_gpupoor_tpu.ops.quant import quantize_params

    rng = np.random.RandomState(3)
    w = jnp.asarray(rng.randn(16, 8).astype(np.float32))
    params = {"lin": {"kernel": w, "bias": jnp.zeros((8,))}}
    qp = quantize_params(params, mode="wo_int4")
    assert "w_int4" in qp["lin"]
    x = jnp.asarray(rng.randn(4, 16).astype(np.float32))
    out = maybe_quantized_matmul(qp["lin"], x)
    ref = x @ w
    # int4 weight-only: coarse but correlated
    assert np.corrcoef(
        np.asarray(out).ravel(), np.asarray(ref).ravel()
    )[0, 1] > 0.98


def test_int4_per_group_scales_and_accuracy():
    """r5: int4 default is per-input-group scales ([in/g, out], g=64) —
    shape contract, exact dequant round-trip, and strictly lower error
    than the legacy per-channel scheme on an outlier-bearing kernel."""
    import jax

    from ltx_video_gpupoor_tpu.ops.quant import (
        INT4_GROUP_SIZE,
        dequantize_int4,
        quantize_weights_int4,
    )

    rng = np.random.RandomState(7)
    w = rng.randn(256, 32).astype(np.float32) * 0.05
    # outlier GROUP (group-aligned: rows 0..63): per-group scales confine
    # the coarse scale to this group; per-channel lets it poison every row
    w[:64] *= 20.0
    wj = jnp.asarray(w)

    q = quantize_weights_int4(wj)
    assert q.w_int4.shape == (128, 32)
    assert q.scale.shape == (256 // INT4_GROUP_SIZE, 32)
    q_pc = quantize_weights_int4(wj, group_size=None)
    assert q_pc.scale.shape == (32,)

    # the outlier group keeps the coarse scale either way (absmax is
    # absmax); the win is every OTHER group's error shrinking — compare
    # mean error
    err_g = float(
        np.abs(np.asarray(dequantize_int4(q, jnp.float32)) - w).mean()
    )
    err_c = float(
        np.abs(np.asarray(dequantize_int4(q_pc, jnp.float32)) - w).mean()
    )
    assert err_g < err_c / 2, (err_g, err_c)

    # matmul routes the 2-D (per-group) scale correctly; ~8-13%% rel is
    # the intrinsic 4-bit class (1/15 resolution) — the per-group win is
    # against per-channel, whose outlier-poisoned scales do far worse
    from ltx_video_gpupoor_tpu.ops.quant import int4_wo_matmul

    x = jnp.asarray(rng.randn(4, 256).astype(np.float32))
    ref = np.asarray(x @ wj)
    out = np.asarray(int4_wo_matmul(x, q))
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    out_pc = np.asarray(int4_wo_matmul(x, q_pc))
    rel_pc = np.abs(out_pc - ref).max() / np.abs(ref).max()
    assert rel < 0.13, rel
    # max-rel is dominated by the outlier group's entries (same scale in
    # both schemes) — the factor-2 win lives in the weight-level mean
    # error asserted above; here per-group must still be strictly better
    assert rel < rel_pc, (rel, rel_pc)


def test_mixed_int4_tier():
    """mode="mixed_int4": sensitive leaves (adaLN / patchify / final
    projection / time-text embeddings) land on int8-WO, bulk on int4 —
    and the mixed LTX forward is strictly closer to bf16 than all-int4
    (the 40 dB-gate fix, VERDICT r4 #3)."""
    import jax

    from ltx_video_gpupoor_tpu.core.params import flatten
    from ltx_video_gpupoor_tpu.models.ltx.transformer3d import (
        LTXTransformerConfig,
        forward,
        init_params,
    )
    from ltx_video_gpupoor_tpu.ops.quant import (
        is_mixed_sensitive,
        quantize_params,
    )

    assert is_mixed_sensitive("adaln.linear.kernel")
    assert is_mixed_sensitive("proj_out.kernel")
    assert is_mixed_sensitive("head.head.kernel")
    assert is_mixed_sensitive("time_projection.kernel")
    assert not is_mixed_sensitive("blocks.attn1.to_q.kernel")
    assert not is_mixed_sensitive("blocks.ff.proj_out.kernel")

    cfg = LTXTransformerConfig(
        num_attention_heads=2, attention_head_dim=32, in_channels=8,
        out_channels=8, num_layers=2, cross_attention_dim=64,
        caption_channels=64,
    )
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16), init_params(jax.random.key(0), cfg)
    )
    qp = quantize_params(params, mode="mixed_int4")
    fq = flatten(qp)
    assert "adaln.linear.w_int8" in fq
    assert "proj_out.w_int8" in fq
    assert "blocks.attn1.to_q.w_int4" in fq
    assert "blocks.ff.proj_out.w_int4" in fq

    lat = jax.random.normal(jax.random.key(1), (1, 16, 8), jnp.bfloat16)
    coords = jnp.stack(jnp.meshgrid(
        jnp.arange(1), jnp.arange(4), jnp.arange(4), indexing="ij",
    ), 0).reshape(1, 3, -1).astype(jnp.float32)
    t = jnp.full((1,), 0.5)
    cap = jax.random.normal(jax.random.key(2), (1, 8, 64), jnp.bfloat16)

    ref = np.asarray(
        forward(params, cfg, lat, coords, t, cap, None), np.float32
    )
    out_mixed = np.asarray(
        forward(qp, cfg, lat, coords, t, cap, None), np.float32
    )
    out_int4 = np.asarray(
        forward(quantize_params(params, mode="wo_int4"), cfg, lat, coords,
                t, cap, None), np.float32,
    )
    err_mixed = np.abs(out_mixed - ref).max()
    err_int4 = np.abs(out_int4 - ref).max()
    assert np.isfinite(out_mixed).all()
    assert err_mixed < err_int4, (err_mixed, err_int4)
