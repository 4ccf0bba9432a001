"""Attention dispatch.

The TPU-native analogue of the reference's ``pay_attention``
(``/root/reference/wan/modules/attention.py:161-399``): one entry point that
selects an implementation. Unlike the reference (global mutable
``offload.shared_state["_attention"]``), the choice is an explicit argument
or an automatic backend probe — Pallas flash attention on TPU, unfused XLA
elsewhere (tests / CPU dry-runs).
"""

from __future__ import annotations

import functools
import os
from typing import Literal

import jax

from .flash_attention import (
    flash_attention,
    flash_attention_hp,
    reference_attention,
)
from .padding import pad_axis, round_up, unpad_axis

# env knobs whose malformed values have already been warned about (one
# warning per process, not one per attention call)
_warned_knobs: set[str] = set()

AttentionMode = Literal["auto", "pallas", "pallas_hp", "pallas_int8",
                        "pallas_int8pv", "xla"]

_VALID_MODES = ("auto", "pallas", "pallas_hp", "pallas_int8",
                "pallas_int8pv", "xla")

# Process-wide override. Initialized from LTXV_TPU_ATTN so deployments
# can pin a tier without code (an explicit CLI --attention flag and
# set_attention_mode() still take precedence). Empty means unset, like
# every other env knob in this repo.
_FORCED_MODE: AttentionMode = os.environ.get("LTXV_TPU_ATTN") or "auto"
if _FORCED_MODE not in _VALID_MODES:
    raise ValueError(
        f"LTXV_TPU_ATTN={_FORCED_MODE!r}: expected one of {_VALID_MODES}"
    )


def parse_sp(mode: str) -> tuple[str, str | None]:
    """Split a sequence-parallel mode string.

    ``"ulysses:<axis>[:<base>]"`` -> (base or "auto", axis):
    self-attention runs the Ulysses all-to-all exchange over mesh axis
    ``<axis>`` (inside ``shard_map``), with ``<base>`` as the local
    kernel mode (e.g. ``pallas_int8``). Any other mode -> (mode, None).
    Cross-attention callers use only the base mode — sequence-sharded q
    rows against replicated kv need no collective.
    """
    if mode.startswith("ulysses:"):
        parts = mode.split(":", 2)
        return (parts[2] if len(parts) > 2 else "auto"), parts[1]
    return mode, None


def set_attention_mode(mode: AttentionMode) -> None:
    """Process-wide override (parity with the reference's ``--attention``
    CLI flag / sage tiers, ``/root/reference/inference.py:87-93, 592``).
    ``pallas_int8`` is the SageAttention-equivalent int8-QK tier."""
    global _FORCED_MODE
    if mode not in _VALID_MODES:
        raise ValueError(f"unknown attention mode {mode!r}")
    _FORCED_MODE = mode


def get_attention_mode() -> AttentionMode:
    return _FORCED_MODE


@functools.cache
def _default_backend_is_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def resolve_mode(
    mode: AttentionMode,
    score_bound: float | None = None,
    head_dim: int | None = None,
) -> AttentionMode:
    """Resolve ``"auto"`` to a concrete tier.

    A caller-supplied ``score_bound`` (the validated bounded-softmax
    fast path, e.g. via ``LTXV_TPU_SCORE_BOUND``) takes precedence over
    the implicit TPU default: int8 P quantization is incompatible with a
    fixed exponent offset, so auto must not silently discard the bound
    by picking ``pallas_int8pv``. An EXPLICIT int8pv pin (flag/env/
    ``set_attention_mode``) still wins and nulls the bound, as
    documented in ``attention()``.

    Mirrors the reference's ``get_auto_attention`` policy
    (``/root/reference/inference.py:87-93``) — its serving default is
    the best installed tier, not a fixed implementation — but the best
    tier on v5e is HEAD-DIM dependent, so auto resolves per call site:

    - ``d <= 64``: exact softmax (``pallas``). Attention at d=64 is
      VPU-softmax-bound, so int8 MXU tiers buy nothing; with the
      row-granular sub-block split (``pipe_relax``, default on) the
      exact kernel measured FASTER than int8pv in the same chip window
      (10.50 vs 10.88 ms kernel, 13.06 vs 13.12 s/video e2e,
      perf_logs/r3h) — the honest path is also the fast path.
    - ``d >= 128`` (or unknown): the sage2-equivalent ``pallas_int8pv``
      (int8 QK and PV on the MXU, per-kv-block K scales; stress-gated
      by the on-hardware parity probe at <1% relative error; measured
      35.79 vs 37.0 s at the 13B d=128 shape and −5.5% on the Wan
      step).

    Any tier stays one knob away: ``LTXV_TPU_ATTN=pallas|pallas_int8pv``
    or ``set_attention_mode(...)``. Off-TPU, ``auto`` is the XLA
    reference path (Pallas kernels would run interpreted)."""
    if mode == "auto":
        mode = _FORCED_MODE
    if mode == "auto":
        if not _default_backend_is_tpu():
            return "xla"
        if score_bound is not None:
            return "pallas"
        mode = ("pallas" if head_dim is not None and head_dim <= 64
                else "pallas_int8pv")
    return mode


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    q_segment_ids: jax.Array | None = None,
    kv_segment_ids: jax.Array | None = None,
    *,
    scale: float | None = None,
    causal: bool = False,
    mode: AttentionMode = "auto",
    score_bound: float | None = None,
    headpar: bool | None = None,
) -> jax.Array:
    """Multi-head attention over ``[B, H, S, D]`` tensors.

    Sequence lengths need not be 128-multiples: inputs are padded here and
    pad tokens masked via segment ids (id 0 = padding).

    ``score_bound``: static bound on |softmax logits| the caller can
    guarantee (e.g. RMS qk-normed attention). Enables the kernel's
    max-free streaming-softmax fast path; logits beyond the bound are
    clamped (softmax is saturated there anyway). Ignored on the XLA path.

    ``headpar``: wrap the kernel in the SPMD head/q-token partitioning
    rule (ops/headpar.py) so a tensor-parallel jit runs each device's
    heads locally instead of all-gathering. None = the
    ``LTXV_TPU_ATTN_HEADPAR`` env gate. Must be False inside a manual
    ``shard_map`` (the USP paths pass it explicitly).
    """
    mode = resolve_mode(mode, score_bound, head_dim=q.shape[-1])
    if mode == "pallas_hp":
        # hp applies only to head-packed callers (attention_packed);
        # head-split callers get the classic kernel
        mode = "pallas"

    if mode == "xla":
        return reference_attention(
            q, k, v, q_segment_ids, kv_segment_ids, scale=scale, causal=causal
        )

    b, h, sq, d = q.shape
    skv = k.shape[2]
    sq_p, skv_p = round_up(sq, 128), round_up(skv, 128)
    needs_pad = (sq_p != sq) or (skv_p != skv)
    kv_valid = None
    if q_segment_ids is not None:
        # genuine varlen structure: full segment masking
        q = pad_axis(q, 2, 128)
        k = pad_axis(k, 2, 128)
        v = pad_axis(v, 2, 128)
        q_segment_ids = pad_axis(q_segment_ids, 1, 128)
        kv_segment_ids = pad_axis(kv_segment_ids, 1, 128)
    elif needs_pad:
        # pure tail padding: pad q rows are harmless (their outputs are
        # sliced off); pad kv columns are masked by a static valid length —
        # much cheaper than segment-id masking in the kernel
        q = pad_axis(q, 2, 128)
        k = pad_axis(k, 2, 128)
        v = pad_axis(v, 2, 128)
        kv_valid = skv if skv_p != skv else None
    pv_int8 = mode == "pallas_int8pv"
    if pv_int8:
        # int8 P needs the online running max (a fixed exponent offset
        # would zero low-max rows); the tier subsumes the bounded path.
        score_bound = None
    if headpar is None:
        from . import headpar as _hp

        headpar = _hp.enabled()
    if headpar and jax.sharding.get_abstract_mesh().manual_axes:
        # inside a manual shard_map (USP local kernel, ring attention):
        # the SPMD partitioning wrapper must not nest under manual axes
        headpar = False
    if headpar:
        from .headpar import headpar_flash_attention as kernel
    else:
        kernel = flash_attention
    qk_int8 = mode in ("pallas_int8", "pallas_int8pv")
    extra = {}
    if qk_int8:
        from .flash_attention import int8_pipe_enabled

        extra["int8_pipe"] = int8_pipe_enabled()
    else:
        from .flash_attention import pipe_relax_enabled

        if pipe_relax_enabled():
            extra["pipe_relax"] = True
    if not headpar:
        # Sweep/adoption overrides for the kernel schedule (plain-kernel
        # path only; the headpar SPMD wrapper's cached partitioning rule
        # does not thread them). Requested blocks still resolve through
        # ``fit_blocks`` and an invalid nsub falls back to the default
        # plan, so a stale pin degrades to the shipped schedule rather
        # than failing — including a MALFORMED value (e.g. "896x1792"),
        # which is warned about once and skipped (ADVICE r3).
        for knob, key in (("LTXV_TPU_BLOCK_Q", "block_q"),
                          ("LTXV_TPU_BLOCK_KV", "block_kv"),
                          ("LTXV_TPU_PIPE_NSUB", "pipe_nsub")):
            val = os.environ.get(knob, "").strip()
            if val:
                try:
                    extra[key] = int(val)
                except ValueError:
                    if knob not in _warned_knobs:
                        _warned_knobs.add(knob)
                        import warnings

                        warnings.warn(
                            f"{knob}={val!r} is not an integer; "
                            "ignoring the override")
    out = kernel(
        q, k, v, q_segment_ids, kv_segment_ids, scale=scale, causal=causal,
        kv_valid=kv_valid,
        qk_int8=qk_int8,
        pv_int8=pv_int8,
        score_bound=score_bound,
        **extra,
    )
    return unpad_axis(out, 2, sq)


def attention_packed(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    heads: int,
    *,
    scale: float | None = None,
    mode: AttentionMode = "auto",
    score_bound: float | None = None,
) -> jax.Array:
    """Self-attention over head-PACKED ``[B, S, H*D]`` tensors.

    With ``mode="pallas_hp"`` (opt-in) the hp Pallas kernel consumes the
    projection outputs directly, so the ``[B,H,S,D]`` transposes
    (measured ~57 ms/step on the LTX-2B v5e config) never exist.
    NOT the default: at d=64 the paired kernel measured 15.2 vs the
    classic chain's 9.65 ms/layer on v5e — the mix/diff full-contraction
    QK doubles MXU row-pushes (a K=64 dot already takes half the cycles
    of K=128, so there was no half-fill wall-time penalty to reclaim),
    which outweighs the transpose savings. Kept for the d=128 families
    (one head per lane block — classic math, no pairing overhead) and as
    the substrate for future in-kernel RoPE fusion.
    """
    b, s, hd_total = q.shape
    d = hd_total // heads
    mode = resolve_mode(mode, score_bound, head_dim=d)
    if (mode == "pallas_hp" and _default_backend_is_tpu()
            and d in (64, 128) and score_bound is None
            and (d == 128 or heads % 2 == 0)):
        if k.shape[1] != s or v.shape[1] != s:
            # the hp kernel's kv_valid below is derived from the q
            # length; it is a self-attention-only path by contract
            raise ValueError(
                "attention_packed hp path requires q/k/v of equal length"
            )
        sp = round_up(s, 128)
        if sp != s:
            q = pad_axis(q, 1, 128)
            k = pad_axis(k, 1, 128)
            v = pad_axis(v, 1, 128)
        out = flash_attention_hp(
            q, k, v, heads=heads, scale=scale,
            kv_valid=s if sp != s else None,
        )
        return out[:, :s] if sp != s else out

    def split(t):
        return t.reshape(b, -1, heads, d).transpose(0, 2, 1, 3)

    o = attention(split(q), split(k), split(v), scale=scale, mode=mode,
                  score_bound=score_bound)
    return o.transpose(0, 2, 1, 3).reshape(b, s, hd_total)
