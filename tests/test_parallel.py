"""Sequence-parallel attention tests on the virtual 8-device CPU mesh —
Ulysses all-to-all and ring attention must match single-device attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ltx_video_gpupoor_tpu.core import MeshConfig, make_mesh
from ltx_video_gpupoor_tpu.ops.flash_attention import reference_attention
from ltx_video_gpupoor_tpu.parallel.ring_attention import (
    ring_attention_sharded,
)
from ltx_video_gpupoor_tpu.parallel.sharding import (
    token_sharding,
    transformer_param_shardings,
)
from ltx_video_gpupoor_tpu.parallel.ulysses import ulysses_attention_sharded


@pytest.fixture(scope="module")
def sp_mesh():
    return make_mesh(MeshConfig(dp=1, sp=8, tp=1))


def _qkv(b=1, h=8, s=256, d=32):
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(k1, (b, h, s, d))
    k = jax.random.normal(k2, (b, h, s, d))
    v = jax.random.normal(k3, (b, h, s, d))
    return q, k, v


def test_ulysses_matches_reference(sp_mesh):
    q, k, v = _qkv()
    out = ulysses_attention_sharded(sp_mesh, q, k, v, attn_mode="xla")
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_matches_reference(sp_mesh):
    q, k, v = _qkv()
    out = ring_attention_sharded(sp_mesh, q, k, v)
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def test_ring_under_jit(sp_mesh):
    q, k, v = _qkv(h=2, s=128)

    @jax.jit
    def run(q, k, v):
        return ring_attention_sharded(sp_mesh, q, k, v)

    out = run(q, k, v)
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_transformer_shardings_cover_tree(mesh8):
    from ltx_video_gpupoor_tpu.models.ltx.transformer3d import (
        LTXTransformerConfig,
        init_params,
    )

    cfg = LTXTransformerConfig(
        num_attention_heads=2, attention_head_dim=8, in_channels=4,
        out_channels=4, num_layers=2, cross_attention_dim=16,
        caption_channels=8,
    )
    params = init_params(jax.random.key(0), cfg)
    shardings = transformer_param_shardings(mesh8, params)
    assert jax.tree.structure(shardings) == jax.tree.structure(params)
    # qkv kernels sharded over tp on the output dim
    spec = shardings["blocks"]["attn1"]["to_q"]["kernel"].spec
    assert spec == jax.sharding.PartitionSpec(None, None, "tp")
    placed = jax.tree.map(jax.device_put, params, shardings)
    assert placed["blocks"]["attn1"]["to_q"]["kernel"].sharding.spec == spec
