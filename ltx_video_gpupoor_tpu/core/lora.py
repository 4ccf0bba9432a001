"""LoRA loading and merging.

Parity targets:
- runtime LoRA merge for the 13B-distilled checkpoint
  (``offload.load_loras_into_model`` with the lora128 file,
  ``/root/reference/inference.py:485-493``);
- ComfyUI ``lora_unet_*`` -> diffusers key conversion
  (``WanModel.preprocess_loras``, ``/root/reference/wan/modules/
  model.py:592-646``).

JAX-native: LoRA is merged into the weight pytree up-front
(``W += mult * (down.T @ up.T) = mult * (up @ down)^T`` in kernel [in, out]
layout). Runtime-switchable LoRA can re-merge with a different multiplier.
"""

from __future__ import annotations

import re
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .params import flatten, unflatten


def normalize_lora_keys(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Convert ComfyUI-format keys (``lora_unet_blocks_0_attn1_to_q``)
    into dotted diffusers-style paths with ``.lora_A`` / ``.lora_B``."""
    out = {}
    for k, v in sd.items():
        nk = k
        if nk.startswith("lora_unet_"):
            nk = nk[len("lora_unet_"):]
            nk = nk.replace(".lora_down.weight", ".lora_A.weight")
            nk = nk.replace(".lora_up.weight", ".lora_B.weight")
            # underscores between module path components -> dots, but keep
            # to_q / to_k / feed_forward style names intact
            nk = re.sub(r"blocks_(\d+)_", r"blocks.\1.", nk)
            nk = nk.replace("self_attn_", "self_attn.")
            nk = nk.replace("cross_attn_", "cross_attn.")
            nk = nk.replace("attn1_", "attn1.")
            nk = nk.replace("attn2_", "attn2.")
            nk = nk.replace("ffn_", "ffn.")
            nk = nk.replace("ff_", "ff.")
            # sub-module indices that stay underscore-joined after the
            # prefix replaces above: attention output Sequential slot and
            # the GEGLU FFN projections — without these, to_out/FFN LoRA
            # pairs silently never match merge_lora's dotted names
            nk = nk.replace("to_out_0", "to_out.0")
            nk = nk.replace("ff.net_0_proj", "ff.net.0.proj")
            nk = nk.replace("ff.net_2", "ff.net.2")
        nk = nk.removeprefix("diffusion_model.")
        nk = nk.removeprefix("transformer.")
        out[nk] = v
    return out


def lora_pairs(sd: dict[str, np.ndarray]):
    """Yield (base_path, down [r, in], up [out, r], alpha) triples."""
    sd = normalize_lora_keys(sd)
    bases = {}
    for k, v in sd.items():
        for marker, slot in (
            (".lora_A.weight", "down"), (".lora_down.weight", "down"),
            (".lora_B.weight", "up"), (".lora_up.weight", "up"),
            (".alpha", "alpha"),
        ):
            if k.endswith(marker):
                base = k[: -len(marker)]
                bases.setdefault(base, {})[slot] = v
                break
    for base, parts in bases.items():
        if "down" in parts and "up" in parts:
            yield base, parts["down"], parts["up"], parts.get("alpha")


def merge_lora(
    params: dict,
    lora_sd: dict[str, np.ndarray],
    multiplier: float = 1.0,
    path_map: Callable[[str], str] | None = None,
) -> tuple[dict, int]:
    """Merge a LoRA state dict into a param tree; returns (new_params,
    number of matched layers).

    Param kernels are [in, out] (or [L, in, out] for scanned stacks, where
    LoRA keys carry the layer index — e.g. ``transformer_blocks.3.attn1
    .to_q``)."""
    flat = flatten(params)
    matched = 0
    # collect all per-layer deltas per stacked key first: updating a
    # 48-layer [L, in, out] stack one .at[i].set at a time would copy the
    # full multi-GB stack once per LoRA pair instead of once per key
    stacked: dict[str, list] = {}
    for base, down, up, alpha in lora_pairs(lora_sd):
        path = base
        if path_map is not None:
            path = path_map(path)
        # reference naming -> our tree naming
        path = path.replace("transformer_blocks.", "blocks.")
        path = path.replace(".to_out.0", ".to_out")
        path = path.replace(".ff.net.0.proj", ".ff.proj_in")
        path = path.replace(".ff.net.2", ".ff.proj_out")
        # Wan FFN is an nn.Sequential in the reference (ffn.0 / ffn.2);
        # our tree names the projections fc1 / fc2
        path = path.replace(".ffn.0", ".ffn.fc1")
        path = path.replace(".ffn.2", ".ffn.fc2")
        m = re.match(r"blocks\.(\d+)\.(.*)", path)
        layer_idx = None
        if m:
            layer_idx = int(m.group(1))
            key = f"blocks.{m.group(2)}.kernel"
        else:
            key = path + ".kernel"
        if key not in flat:
            continue
        r = down.shape[0]
        scale = float(multiplier)
        if alpha is not None:
            scale *= float(np.asarray(alpha)) / r
        delta = scale * (
            up.astype(np.float32) @ down.astype(np.float32)
        ).T  # [in, out]
        w = flat[key]
        if layer_idx is not None and w.ndim == 3:
            stacked.setdefault(key, []).append((layer_idx, delta))
        else:
            flat[key] = (
                w.astype(jnp.float32) + delta
            ).astype(w.dtype)
        matched += 1
    for key, items in stacked.items():
        w = flat[key]
        idxs = jnp.asarray([i for i, _ in items])
        deltas = jnp.asarray(np.stack([d for _, d in items]))
        upd = w[idxs].astype(jnp.float32) + deltas
        flat[key] = w.at[idxs].set(upd.astype(w.dtype))
    return unflatten(flat), matched
