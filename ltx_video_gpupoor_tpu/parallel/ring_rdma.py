"""Pallas-RDMA ring attention: KV blocks rotate around the ``sp`` axis via
inter-chip async remote DMA started *before* each block's compute, so the
ICI transfer for step ``s+1`` overlaps the flash-attention math of step
``s`` explicitly (the XLA ``ppermute`` ring in ``ring_attention.py`` leaves
that overlap to the latency-hiding scheduler).

Reference role: the NCCL P2P ring inside xDiT's long-context attention
(``/root/reference/wan/distributed/xdit_context_parallel.py:179-184``),
re-designed for TPU: double-buffered VMEM KV slots, per-slot DMA
semaphores, a neighbor barrier per step to keep the ring in lockstep (so a
device never overwrites a slot its right neighbor is still reading), and
online-softmax accumulation in fp32 VMEM scratch.

Validated on the virtual CPU mesh with the Pallas TPU interpreter
(``pltpu.InterpretParams`` emulates remote DMAs and semaphores, including
race detection); on real hardware the same kernel lowers to ICI RDMA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.flash_attention import NEG_INF


def _logical_id(mesh_axes, ring_axis, ring_idx):
    """Global logical device id for the device at ``ring_idx`` on the ring
    axis and this device's coordinates on every other axis (row-major over
    the mesh axes, matching the mesh device-array order)."""
    lid = jnp.int32(0)
    for name, size in mesh_axes:
        idx = ring_idx if name == ring_axis else jax.lax.axis_index(name)
        lid = lid * size + idx
    return lid


def _ring_kernel(
    p: int,
    axis_name: str,
    mesh_axes: tuple,
    scale: float,
    q_ref, k_ref, v_ref, o_ref,
    kbuf, vbuf, m_scr, l_scr, acc_scr,
    ksend, krecv, vsend, vrecv,
):
    my = jax.lax.axis_index(axis_name)
    right = _logical_id(mesh_axes, axis_name, jax.lax.rem(my + 1, p))
    left = _logical_id(mesh_axes, axis_name, jax.lax.rem(my + p - 1, p))

    kbuf[0] = k_ref[...]
    vbuf[0] = v_ref[...]
    m_scr[...] = jnp.full(m_scr.shape, NEG_INF, jnp.float32)
    l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
    acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    q = q_ref[...].astype(jnp.float32)

    for step in range(p):
        slot = step % 2
        nxt = (step + 1) % 2
        if step + 1 < p:
            # lockstep barrier: the destination slot on the right neighbor
            # is the one it computed on last step — make sure every device
            # has advanced to this step before anyone overwrites a slot
            bar = pltpu.get_barrier_semaphore()
            for nb in (left, right):
                pltpu.semaphore_signal(
                    bar, inc=1, device_id=nb,
                    device_id_type=pltpu.DeviceIdType.LOGICAL,
                )
            pltpu.semaphore_wait(bar, 2)
            k_rdma = pltpu.make_async_remote_copy(
                src_ref=kbuf.at[slot], dst_ref=kbuf.at[nxt],
                send_sem=ksend.at[slot], recv_sem=krecv.at[nxt],
                device_id=right,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
            v_rdma = pltpu.make_async_remote_copy(
                src_ref=vbuf.at[slot], dst_ref=vbuf.at[nxt],
                send_sem=vsend.at[slot], recv_sem=vrecv.at[nxt],
                device_id=right,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
            k_rdma.start()
            v_rdma.start()

        # flash-attention accumulation on the current block while the next
        # block is in flight
        kb = kbuf[slot].astype(jnp.float32)
        vb = vbuf[slot].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, kb, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale                       # [BH, Sq, Skv]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_prev = m_scr[...]
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        pexp = jnp.exp(s - m_new)
        l_scr[...] = l_scr[...] * alpha + jnp.sum(pexp, -1, keepdims=True)
        acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot_general(
            pexp, vb, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        m_scr[...] = m_new

        if step + 1 < p:
            k_rdma.wait()
            v_rdma.wait()

    o_ref[...] = (
        acc_scr[...] / jnp.maximum(l_scr[...], 1e-20)
    ).astype(o_ref.dtype)


def ring_attention_rdma(
    q: jax.Array,            # [B, H, S/p, D] per shard
    k: jax.Array,
    v: jax.Array,
    axis_size: int,
    axis_name: str = "sp",
    mesh_axes: tuple = (),
    scale: float | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Full (non-causal) ring attention with explicit RDMA overlap. Call
    inside ``shard_map`` with q/k/v sequence-sharded over ``axis_name``.
    ``mesh_axes`` is the full ((name, size), ...) of the mesh (in mesh
    order) so neighbors resolve to global logical ids on multi-axis
    meshes; defaults to a 1-D ring."""
    if not mesh_axes:
        mesh_axes = ((axis_name, axis_size),)
    b, h, s_loc, d = q.shape
    if scale is None:
        scale = d**-0.5
    bh = b * h
    q3 = q.reshape(bh, s_loc, d)
    k3 = k.reshape(bh, s_loc, d)
    v3 = v.reshape(bh, s_loc, d)

    out = pl.pallas_call(
        functools.partial(
            _ring_kernel, axis_size, axis_name, tuple(mesh_axes), scale
        ),
        out_shape=jax.ShapeDtypeStruct((bh, s_loc, d), q.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, bh, s_loc, d), q.dtype),   # kbuf
            pltpu.VMEM((2, bh, s_loc, d), q.dtype),   # vbuf
            pltpu.VMEM((bh, s_loc, 1), jnp.float32),  # m
            pltpu.VMEM((bh, s_loc, 1), jnp.float32),  # l
            pltpu.VMEM((bh, s_loc, d), jnp.float32),  # acc
            pltpu.SemaphoreType.DMA((2,)),            # k send
            pltpu.SemaphoreType.DMA((2,)),            # k recv
            pltpu.SemaphoreType.DMA((2,)),            # v send
            pltpu.SemaphoreType.DMA((2,)),            # v recv
        ],
        # collective_id reserves the cross-chip barrier semaphore; a
        # 1-device ring never touches it and must leave it unset
        compiler_params=pltpu.CompilerParams(
            collective_id=0 if axis_size > 1 else None
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(q3, k3, v3)
    return out.reshape(b, h, s_loc, d)


def ring_attention_rdma_sharded(
    mesh: Mesh,
    q: jax.Array,            # [B, H, S, D] global
    k: jax.Array,
    v: jax.Array,
    axis_name: str = "sp",
    interpret: bool = False,
) -> jax.Array:
    spec = P(None, None, axis_name, None)
    fn = jax.shard_map(
        functools.partial(
            ring_attention_rdma,
            axis_size=mesh.shape[axis_name],
            axis_name=axis_name,
            mesh_axes=tuple(mesh.shape.items()),
            interpret=interpret,
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)
