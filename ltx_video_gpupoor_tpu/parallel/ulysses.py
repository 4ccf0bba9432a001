"""Ulysses sequence parallelism: all-to-all head<->sequence exchange.

Parity target: the xDiT USP path at
``/root/reference/wan/distributed/xdit_context_parallel.py`` —
``usp_dit_forward`` chunks the token sequence across SP ranks after
embedding (``:131-133``) and ``usp_attn_forward`` runs
``xFuserLongContextAttention`` (hybrid Ulysses all-to-all + ring)
(``:179-184``) with per-rank RoPE slices (``:52-57``).

TPU-native redesign: inside ``shard_map`` over the ``sp`` axis,
``jax.lax.all_to_all`` converts sequence-sharded [B, H, S/p, D] tensors to
head-sharded [B, H/p, S, D], full attention runs locally per head group,
and a second all-to-all converts back. RoPE is computed from GLOBAL
coordinates per shard (the reference pads-then-slices frequencies,
``:12-22`` — unnecessary here and subtly wrong for the pad region).
"""

from __future__ import annotations

from functools import partial

import jax
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.attention import attention


def _heads_to_seq(x: jax.Array, axis_name: str) -> jax.Array:
    """[B, H, S/p, D] (local) -> [B, H/p, S, D] via all-to-all."""
    p = jax.lax.psum(1, axis_name)
    b, h, s_local, d = x.shape
    # split heads into p groups: [B, p, H/p, S/p, D]; scatter group j to
    # device j, stack received seq chunks (device-ordered) BEFORE the local
    # seq axis so the flattened sequence is globally ordered
    x = x.reshape(b, p, h // p, s_local, d)
    x = jax.lax.all_to_all(x, axis_name, split_axis=1, concat_axis=2,
                           tiled=False)
    # [B, H/p, p, S/p, D] -> [B, H/p, S, D]
    return x.reshape(b, h // p, p * s_local, d)


def _seq_to_heads(x: jax.Array, axis_name: str) -> jax.Array:
    """[B, H/p, S, D] (local) -> [B, H, S/p, D] via all-to-all."""
    p = jax.lax.psum(1, axis_name)
    b, h_local, s, d = x.shape
    # split seq into p chunks, send chunk i to device i; stack received head
    # groups (device-ordered) BEFORE the local head axis
    x = x.reshape(b, h_local, p, s // p, d)
    x = jax.lax.all_to_all(x, axis_name, split_axis=2, concat_axis=1,
                           tiled=False)
    # [B, p, H/p, S/p, D] -> [B, H, S/p, D]
    return x.reshape(b, h_local * p, s // p, d)


def ulysses_attention(
    q: jax.Array,            # [B, H, S/p, D] per shard
    k: jax.Array,
    v: jax.Array,
    axis_name: str = "sp",
    attn_mode: str = "auto",
    score_bound: float | None = None,
) -> jax.Array:
    """Sequence-parallel attention: heads must be divisible by the sp size.

    Call inside ``shard_map`` with q/k/v sharded on the sequence axis.
    """
    qh = _heads_to_seq(q, axis_name)
    kh = _heads_to_seq(k, axis_name)
    vh = _heads_to_seq(v, axis_name)
    # headpar=False: this call runs INSIDE the manual shard_map — the
    # SPMD partitioning wrapper must not nest under manual axes
    out = attention(qh, kh, vh, mode=attn_mode, score_bound=score_bound,
                    headpar=False)
    return _seq_to_heads(out, axis_name)


def ulysses_attention_sharded(
    mesh: Mesh,
    q: jax.Array,            # [B, H, S, D] globally
    k: jax.Array,
    v: jax.Array,
    axis_name: str = "sp",
    attn_mode: str = "auto",
    score_bound: float | None = None,
) -> jax.Array:
    """Convenience wrapper: shard_map over the sp axis of ``mesh``."""
    spec = P(None, None, axis_name, None)
    fn = jax.shard_map(
        partial(ulysses_attention, axis_name=axis_name,
                attn_mode=attn_mode, score_bound=score_bound),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)
