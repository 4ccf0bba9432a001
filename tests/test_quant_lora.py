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
