"""Ring attention: KV blocks rotate around the sp axis via ``ppermute``
while each device accumulates online-softmax partial results.

This is the TPU equivalent of the reference's xDiT ring path
(``/root/reference/wan/distributed/xdit_context_parallel.py:179-184``,
NCCL P2P ring inside ``xFuserLongContextAttention``): point-to-point
neighbor exchange over ICI, communication overlapped with compute by XLA's
latency-hiding scheduler. Unlike Ulysses it has no head-count divisibility
constraint and communicates only KV blocks.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.flash_attention import NEG_INF


def _local_attention_stats(q, k, v, scale):
    """Returns (out_unnormalized, m, l) for one KV block — fp32 stats."""
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    return out, m, l


def ring_attention(
    q: jax.Array,            # [B, H, S/p, D] per shard
    k: jax.Array,
    v: jax.Array,
    axis_name: str = "sp",
    scale: float | None = None,
) -> jax.Array:
    """Full (non-causal) attention with ring-rotated KV. Call inside
    ``shard_map`` with q/k/v sequence-sharded."""
    p = jax.lax.psum(1, axis_name)
    d = q.shape[-1]
    if scale is None:
        scale = d**-0.5

    perm = [(i, (i + 1) % p) for i in range(p)]

    def merge(m, l, acc, out, m_cur, l_cur):
        m_new = jnp.maximum(m, m_cur)
        alpha = jnp.exp(m - m_new)
        beta = jnp.exp(m_cur - m_new)
        return m_new, l * alpha + l_cur * beta, acc * alpha + out * beta

    def step(carry, _):
        k_blk, v_blk, m, l, acc = carry
        out, m_cur, l_cur = _local_attention_stats(q, k_blk, v_blk, scale)
        m, l, acc = merge(m, l, acc, out, m_cur, l_cur)
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        return (k_blk, v_blk, m, l, acc), None

    b, h, s_local, _ = q.shape
    m0 = jnp.full((b, h, s_local, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, h, s_local, 1), jnp.float32)
    acc0 = jnp.zeros((b, h, s_local, d), jnp.float32)

    # p blocks need only p-1 rotations: the last block is consumed
    # OUTSIDE the scan so no dead KV round-trip rides the ICI
    (k_blk, v_blk, m, l, acc), _ = jax.lax.scan(
        step, (k, v, m0, l0, acc0), None, length=p - 1
    )
    out, m_cur, l_cur = _local_attention_stats(q, k_blk, v_blk, scale)
    m, l, acc = merge(m, l, acc, out, m_cur, l_cur)
    return (acc / jnp.maximum(l, 1e-20)).astype(q.dtype)


def ring_attention_sharded(
    mesh: Mesh,
    q: jax.Array,            # [B, H, S, D] global
    k: jax.Array,
    v: jax.Array,
    axis_name: str = "sp",
    scale: float | None = None,
) -> jax.Array:
    spec = P(None, None, axis_name, None)
    fn = jax.shard_map(
        partial(ring_attention, axis_name=axis_name, scale=scale),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)
