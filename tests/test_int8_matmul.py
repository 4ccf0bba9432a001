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
