"""Parameter and activation sharding rules over the (dp, sp, tp) mesh.

Replaces the reference's FSDP wrapping (``/root/reference/wan/distributed/
fsdp.py:10-32``) and xfuser USP plumbing with declarative
``NamedSharding``s: XLA SPMD inserts the all-gathers / reduce-scatters over
ICI. Tensor parallelism splits attention heads and FFN hidden dims;
sequence parallelism splits the token axis (XLA gathers K/V for
attention — the dedicated Ulysses/ring path lives in parallel/ulysses.py).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.params import flatten, unflatten

# flat-key substring -> PartitionSpec for the LTX transformer tree
# kernels are [*, in, out] ([L, in, out] for scanned blocks)
_TRANSFORMER_RULES = [
    # attention projections: split heads (output dim) over tp
    (".to_q.kernel", P(None, None, "tp")),
    (".to_k.kernel", P(None, None, "tp")),
    (".to_v.kernel", P(None, None, "tp")),
    (".to_q.bias", P(None, "tp")),
    (".to_k.bias", P(None, "tp")),
    (".to_v.bias", P(None, "tp")),
    # output projection: split input (head) dim over tp
    (".to_out.kernel", P(None, "tp", None)),
    # FFN: hidden dim over tp
    ("ff.proj_in.kernel", P(None, None, "tp")),
    ("ff.proj_in.bias", P(None, "tp")),
    ("ff.proj_out.kernel", P(None, "tp", None)),
]


_QUANT_SUFFIXES = ("w_int8_dyn", "w_int8", "w_int4")


def _with_quantized(rules):
    """Extend kernel rules to the quantized leaf names (ops/quant.py):
    the int8/int4 weight splits exactly like its bf16 kernel (the int4
    nibble packing halves the contraction dim — still divisible), and
    the per-out-channel scale shards with the out dim when the kernel
    splits on out, else replicates (the contraction-split matmul psums
    partial products BEFORE the scale multiply — XLA SPMD handles it).
    This covers pre-quantized checkpoints (``*_quanto_*_int8``), where
    the mesh is applied to already-quantized trees."""
    out = list(rules)
    for pat, spec in rules:
        if not pat.endswith(".kernel"):
            continue
        stem = pat[: -len("kernel")]
        for suf in _QUANT_SUFFIXES:
            out.append((stem + suf, spec))
        if spec[-1] == "tp":  # out-split: scale [..., out] follows
            out.append((stem + "scale", P(*spec[:-2], "tp")))
            # per-group int4 scale [..., in/g, out] mirrors the kernel's
            # own spec (out on tp, group dim unsharded); ndim matching in
            # _apply_rules picks the right one. In-split kernels leave
            # per-group scales replicated — the group dim of a tiny test
            # config need not divide tp, and the scale is small.
            out.append((stem + "scale", spec))
    return out


# flat-key substring -> PartitionSpec for the Wan DiT tree (scanned
# blocks carry a leading L axis). qk-norm weights stay replicated: they
# scale the packed head dim whose rms reduction XLA turns into a psum.
_WAN_RULES = [
    ("self_attn.q.kernel", P(None, None, "tp")),
    ("self_attn.k.kernel", P(None, None, "tp")),
    ("self_attn.v.kernel", P(None, None, "tp")),
    ("self_attn.q.bias", P(None, "tp")),
    ("self_attn.k.bias", P(None, "tp")),
    ("self_attn.v.bias", P(None, "tp")),
    ("self_attn.o.kernel", P(None, "tp", None)),
    ("cross_attn.q.kernel", P(None, None, "tp")),
    ("cross_attn.k.kernel", P(None, None, "tp")),
    ("cross_attn.v.kernel", P(None, None, "tp")),
    ("cross_attn.q.bias", P(None, "tp")),
    ("cross_attn.k.bias", P(None, "tp")),
    ("cross_attn.v.bias", P(None, "tp")),
    ("cross_attn.o.kernel", P(None, "tp", None)),
    ("ffn.fc1.kernel", P(None, None, "tp")),
    ("ffn.fc1.bias", P(None, "tp")),
    ("ffn.fc2.kernel", P(None, "tp", None)),
]


def wan_param_shardings(mesh: Mesh, params: dict) -> dict:
    """NamedSharding pytree for the Wan DiT: attention heads and FFN
    hidden dims split over 'tp', everything else replicated. The
    pure-SPMD twin of :func:`transformer_param_shardings` — for tp-style
    serving meshes (sp == 1); the USP path runs weights replicated."""
    return _apply_rules(mesh, params, _with_quantized(_WAN_RULES))


# T5/UMT5 encoder (models/t5.py): heads and FFN hidden over tp.
# T5-XXL is 4.7B params (9.4 GB bf16) — on a tp mesh, sharding the text
# encoder frees the HBM the replicated copy would burn on every chip.
_T5_RULES = [
    ("attn.q.kernel", P(None, None, "tp")),
    ("attn.k.kernel", P(None, None, "tp")),
    ("attn.v.kernel", P(None, None, "tp")),
    ("attn.o.kernel", P(None, "tp", None)),
    ("ffn.fc1.kernel", P(None, None, "tp")),
    ("ffn.gate.kernel", P(None, None, "tp")),
    ("ffn.fc2.kernel", P(None, "tp", None)),
]


def _apply_rules(mesh: Mesh, params: dict, rules) -> dict:
    """First substring+ndim rule match wins; unmatched leaves replicate."""
    flat = flatten(params)
    out: dict[str, Any] = {}
    for key, value in flat.items():
        spec = P()
        for pattern, rule in rules:
            if pattern in key and value.ndim == len(rule):
                spec = rule
                break
        out[key] = NamedSharding(mesh, spec)
    return unflatten(out)


def t5_param_shardings(mesh: Mesh, params: dict) -> dict:
    """NamedSharding pytree for the T5/UMT5 encoder tree (bf16 and
    quantized leaves). Relative-position biases and embeddings
    replicate (tiny next to the matmuls)."""
    return _apply_rules(mesh, params, _with_quantized(_T5_RULES))


def transformer_param_shardings(mesh: Mesh, params: dict) -> dict:
    """NamedSharding pytree matching the transformer param tree
    (bf16 kernels AND quantized leaves — see ``_with_quantized``)."""
    return _apply_rules(mesh, params, _with_quantized(_TRANSFORMER_RULES))


def token_sharding(mesh: Mesh) -> NamedSharding:
    """Activations [B(streams), S, C]: streams over dp, tokens over sp."""
    return NamedSharding(mesh, P("dp", "sp", None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(mesh: Mesh, params: dict) -> dict:
    shardings = transformer_param_shardings(mesh, params)
    return jax.tree.map(jax.device_put, params, shardings)


def shard_pipeline(pipeline, mesh: Mesh):
    """Place an LTXPipeline's transformer weights onto the mesh (tensor
    parallel over 'tp'); XLA SPMD partitions every jitted step and inserts
    the ICI collectives — the HBM-resident replacement for the reference's
    mmgp offload profiles (``/root/reference/inference.py:442-496``).

    VAE weights replicate (small next to the DiT); T5 shards over 'tp'
    (see ``t5_param_shardings``)."""
    import dataclasses

    replicated_s = replicated(mesh)

    def repl(tree):
        return jax.tree.map(
            lambda x: jax.device_put(x, replicated_s), tree
        )

    extra = {}
    if getattr(pipeline, "t5_params", None) is not None:
        # T5 encodes under a plain SPMD jit (never inside the USP
        # shard_map), so tp-sharding it is safe on every mesh style and
        # frees ~9 GB/chip of replicated T5-XXL weights when tp > 1
        extra["t5_params"] = jax.tree.map(
            jax.device_put, pipeline.t5_params,
            t5_param_shardings(mesh, pipeline.t5_params),
        )
    if hasattr(pipeline, "mesh"):
        # full mesh (also when sp == 1): tiled VAE decodes fan their
        # spatial tile grid over every device (pipelines/ltx_pipeline.py)
        extra["mesh"] = mesh
    return dataclasses.replace(
        pipeline,
        transformer_params=shard_params(mesh, pipeline.transformer_params),
        vae_params=repl(pipeline.vae_params),
        **extra,
    )
