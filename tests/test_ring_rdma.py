"""Pallas-RDMA ring attention: validated with the Pallas TPU interpreter
(emulated remote DMAs + semaphores) on the virtual device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ltx_video_gpupoor_tpu.core.mesh import MeshConfig, make_mesh
from ltx_video_gpupoor_tpu.ops.flash_attention import reference_attention
from ltx_video_gpupoor_tpu.parallel import ring_rdma


def _qkv(dtype=jnp.float32, b=1, h=2, s=64, d=32):
    kq, kk, kv = jax.random.split(jax.random.key(0), 3)
    return (
        jax.random.normal(kq, (b, h, s, d), dtype),
        jax.random.normal(kk, (b, h, s, d), dtype),
        jax.random.normal(kv, (b, h, s, d), dtype),
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_rdma_ring_matches_reference_1d():
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()).reshape(8), ("sp",))
    q, k, v = _qkv()
    out = ring_rdma.ring_attention_rdma_sharded(mesh, q, k, v,
                                                interpret=True)
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_rdma_ring_matches_reference_3axis_mesh():
    """Neighbor ids resolve correctly when the ring shares the mesh with
    dp/tp axes."""
    mesh = make_mesh(MeshConfig(dp=2, sp=2, tp=2))
    q, k, v = _qkv()
    out = ring_rdma.ring_attention_rdma_sharded(mesh, q, k, v,
                                                interpret=True)
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_rdma_ring_race_free():
    """The interpreter's vector-clock race detector must stay silent —
    validates the double-buffer + neighbor-barrier protocol."""
    from functools import partial

    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import Mesh, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()).reshape(8), ("sp",))
    q, k, v = _qkv(s=32, d=16)

    def inner(q, k, v):
        b, h, s_loc, d = q.shape
        bh = b * h
        import jax.experimental.pallas as pl

        out = pl.pallas_call(
            partial(
                ring_rdma._ring_kernel, 8, "sp", (("sp", 8),), d**-0.5
            ),
            out_shape=jax.ShapeDtypeStruct((bh, s_loc, d), q.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, bh, s_loc, d), q.dtype),
                pltpu.VMEM((2, bh, s_loc, d), q.dtype),
                pltpu.VMEM((bh, s_loc, 1), jnp.float32),
                pltpu.VMEM((bh, s_loc, 1), jnp.float32),
                pltpu.VMEM((bh, s_loc, d), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(collective_id=0),
            interpret=pltpu.InterpretParams(detect_races=True),
        )(q.reshape(bh, s_loc, d), k.reshape(bh, s_loc, d),
          v.reshape(bh, s_loc, d))
        return out.reshape(b, h, s_loc, d)

    spec = P(None, None, "sp", None)
    fn = jax.shard_map(inner, mesh=mesh, in_specs=(spec, spec, spec),
                       out_specs=spec, check_vma=False)
    out = fn(q, k, v)
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_rdma_ring_bf16():
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()).reshape(8), ("sp",))
    q, k, v = _qkv(jnp.bfloat16)
    out = ring_rdma.ring_attention_rdma_sharded(mesh, q, k, v,
                                                interpret=True)
    ref = reference_attention(q, k, v)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
    )
