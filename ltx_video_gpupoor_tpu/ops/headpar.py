"""Head-partitioned flash attention for pure-SPMD tensor-parallel meshes.

XLA treats a Pallas call as an opaque custom call: under a tp-sharded
jit it REPLICATES the operands — an all-gather of every head before
every attention — and runs the full kernel on every device, capping a
tp-style serving mesh at the matmul share of the step. This module
declares the rule XLA cannot infer: batch, head, and q-token dims of
``flash_attention`` are embarrassingly parallel; kv tokens and head_dim
must stay replicated (online softmax reduces over kv). With the rule, a
tp mesh runs each device's own heads locally — no gather, no redundant
FLOPs.

The reference has no analogue (its tensor parallelism does not exist;
sage/flash kernels run single-GPU — SURVEY §2.4). Engaged per-call via
``attention(..., headpar=...)`` or the ``LTXV_TPU_ATTN_HEADPAR=1`` env
gate, which tp-style serving meshes set by default
(``serving/model_zoo.py``). NOT for use inside a manual ``shard_map``
(the USP paths pass ``headpar=False``).
"""

from __future__ import annotations

import functools
import os

import jax
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

from .flash_attention import flash_attention


def enabled() -> bool:
    """Env opt-in (``LTXV_TPU_ATTN_HEADPAR=1``)."""
    return os.environ.get(
        "LTXV_TPU_ATTN_HEADPAR", ""
    ).strip().lower() in ("1", "true", "on")


@functools.cache
def _build(has_segments: bool, scale, causal: bool, kv_valid,
           qk_int8: bool, pv_int8: bool, score_bound, interpret: bool,
           int8_pipe: bool = False, pipe_relax: bool = False):
    """One cached custom_partitioning wrapper per static-config tuple."""

    def core(q, k, v, *segs):
        q_seg = segs[0] if has_segments else None
        kv_seg = segs[1] if has_segments else None
        return flash_attention(
            q, k, v, q_seg, kv_seg, scale=scale, causal=causal,
            kv_valid=kv_valid, qk_int8=qk_int8, pv_int8=pv_int8,
            score_bound=score_bound, interpret=interpret,
            int8_pipe=int8_pipe, pipe_relax=pipe_relax,
        )

    fa = custom_partitioning(core)

    def _q_spec(arg_infos):
        sh = arg_infos[0].sharding
        spec = tuple(sh.spec) if sh is not None else ()
        return spec + (None,) * (4 - len(spec))

    def infer(mesh, arg_infos, result_infos):
        b_ax, h_ax, s_ax, _ = _q_spec(arg_infos)
        return NamedSharding(mesh, P(b_ax, h_ax, s_ax, None))

    def partition(mesh, arg_infos, result_infos):
        b_ax, h_ax, s_ax, _ = _q_spec(arg_infos)
        qs = NamedSharding(mesh, P(b_ax, h_ax, s_ax, None))
        kvs = NamedSharding(mesh, P(b_ax, h_ax, None, None))
        args = (qs, kvs, kvs)
        if has_segments:
            args += (
                NamedSharding(mesh, P(b_ax, s_ax)),
                NamedSharding(mesh, P(b_ax, None)),
            )
        return mesh, core, qs, args

    rule = "b h s d, b h t d, b h t d"
    if has_segments:
        rule += ", b s, b t"
    rule += " -> b h s d"
    fa.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule=rule,
    )
    return fa


def headpar_flash_attention(
    q, k, v, q_segment_ids=None, kv_segment_ids=None, *, scale=None,
    causal=False, kv_valid=None, qk_int8=False, pv_int8=False,
    score_bound=None, interpret=False, int8_pipe=False, pipe_relax=False,
):
    """``flash_attention`` with the SPMD head/q-token partitioning rule.
    Single-device (or unsharded) calls lower to the plain kernel.

    Causal calls bypass the rule entirely: a q-token shard would see
    LOCAL block indices in the causal mask, and the Shardy propagation
    rule cannot express per-flag replication — neither model family
    uses causal attention, so the plain kernel is the honest path."""
    if causal:
        return flash_attention(
            q, k, v, q_segment_ids, kv_segment_ids, scale=scale,
            causal=True, kv_valid=kv_valid, qk_int8=qk_int8,
            pv_int8=pv_int8, score_bound=score_bound, interpret=interpret,
            int8_pipe=int8_pipe, pipe_relax=pipe_relax,
        )
    fa = _build(q_segment_ids is not None, scale, causal, kv_valid,
                qk_int8, pv_int8, score_bound, interpret, int8_pipe,
                pipe_relax)
    if q_segment_ids is not None:
        return fa(q, k, v, q_segment_ids, kv_segment_ids)
    return fa(q, k, v)
