"""Fused dynamic-int8 Pallas matmul vs the unfused XLA reference
(ops/quant.py::int8_dynamic_matmul) — must agree to fp32-rounding level
since both quantize activations per-row to int8 with the same scales."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ltx_video_gpupoor_tpu.ops.int8_matmul import int8_dynamic_matmul_fused
from ltx_video_gpupoor_tpu.ops.quant import (
    QuantizedLinear,
    int8_dynamic_matmul,
    quantize_weights,
)


@pytest.mark.parametrize("m,k,n", [(256, 512, 512), (130, 256, 1024)])
def test_matches_xla_dynamic_path(m, k, n):
    key = jax.random.key(0)
    x = jax.random.normal(key, (m, k), jnp.bfloat16)
    w = jax.random.normal(jax.random.key(1), (k, n), jnp.bfloat16) * 0.05
    q = quantize_weights(w)
    ref = int8_dynamic_matmul(x, q)
    out = int8_dynamic_matmul_fused(
        x, q.w_int8, q.scale, interpret=True, block_m=128, block_n=256
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_bias_and_batched_shape():
    key = jax.random.key(2)
    x = jax.random.normal(key, (2, 70, 256), jnp.bfloat16)
    w = jax.random.normal(jax.random.key(3), (256, 512), jnp.bfloat16) * 0.05
    b = jax.random.normal(jax.random.key(4), (512,), jnp.float32)
    q = quantize_weights(w)
    ref = int8_dynamic_matmul(x, QuantizedLinear(q.w_int8, q.scale), b)
    out = int8_dynamic_matmul_fused(
        x, q.w_int8, q.scale, b, interpret=True, block_m=128, block_n=256
    )
    assert out.shape == (2, 70, 512)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_dispatch_routes_fused_only_at_projection_shapes(monkeypatch):
    """LTXV_TPU_FUSED_INT8 routes the fused kernel only where the r3
    block sweep measured a win (K, N <= 4096); wide FFN matmuls stay on
    the XLA path where XLA's in-graph overlap wins."""
    from ltx_video_gpupoor_tpu.ops import quant as quant_mod

    taken = []

    def fake_fused(x, w_int8, scale, bias=None, **kw):
        taken.append(("fused", w_int8.shape, kw.get("block_m"),
                      kw.get("block_n")))
        return int8_dynamic_matmul(x, QuantizedLinear(w_int8, scale), bias)

    monkeypatch.setenv("LTXV_TPU_FUSED_INT8", "1")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    import ltx_video_gpupoor_tpu.ops.int8_matmul as im
    monkeypatch.setattr(im, "int8_dynamic_matmul_fused", fake_fused)

    x = jax.random.normal(jax.random.key(0), (8, 2048), jnp.bfloat16)
    q_proj = quantize_weights(
        jax.random.normal(jax.random.key(1), (2048, 2048), jnp.bfloat16)
        * 0.02
    )
    quant_mod.int8_dynamic_matmul_dispatch(x, q_proj)
    assert taken == [("fused", (2048, 2048), 1024, 1024)], taken

    taken.clear()
    x_wide = jax.random.normal(jax.random.key(2), (8, 8192), jnp.bfloat16)
    q_down = quantize_weights(
        jax.random.normal(jax.random.key(3), (8192, 2048), jnp.bfloat16)
        * 0.01
    )
    quant_mod.int8_dynamic_matmul_dispatch(x_wide, q_down)  # K > 4096
    q_up = quantize_weights(
        jax.random.normal(jax.random.key(4), (2048, 8192), jnp.bfloat16)
        * 0.02
    )
    quant_mod.int8_dynamic_matmul_dispatch(x, q_up)         # N > 4096
    assert taken == [], taken
