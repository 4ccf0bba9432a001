"""LTX-Video 3D diffusion transformer (DiT), TPU-native.

Parity target: ``Transformer3DModel`` at
``/root/reference/ltx_video/models/transformers/transformer3d.py`` and
``BasicTransformerBlock`` / ``Attention`` at
``/root/reference/ltx_video/models/transformers/attention.py``:

- token-space DiT: ``patchify_proj`` linear in (``transformer3d.py:93``),
  N blocks, adaLN-single per-block 6-way modulation
  (``attention.py:236-262``), final 2-way modulation + ``proj_out``
  (``transformer3d.py:489-506``);
- fractional-coordinate 3D RoPE on self-attention q/k after RMS qk-norm
  (``attention.py:1050-1058``), none on cross-attention;
- per-token (per-frame-group) timesteps (``transformer3d.py:423-425``);
- skip-layer masks for STG (``transformer3d.py:171-186``,
  ``attention.py:1056-1144``).

TPU-first redesign decisions:
- parameters for all blocks are stacked on a leading layer axis and the
  block is a single ``lax.scan`` body — one compilation for any depth, and
  layer weights shard cleanly over the mesh;
- guidance streams (uncond/cond/perturbed) are just batch rows — the
  reference's joint_pass/per-stream loop dichotomy disappears;
- attention runs through the framework-wide Pallas flash kernel with
  segment ids (text padding mask == kv segment ids);
- chunked in-place FFNs are unnecessary (XLA fuses; HBM-resident bf16).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from ...core.dtypes import DtypePolicy, DEFAULT_POLICY
from ...ops import fused_prologue as _fp
from ...ops.attention import attention, attention_packed, parse_sp
from ...ops.norms import layer_norm, rms_norm
from ...ops.rope import apply_rotary_emb, apply_rotary_emb_heads, ltx_freqs_cis


@dataclasses.dataclass(frozen=True)
class LTXTransformerConfig:
    """Mirror of the reference's transformer config (values for LTXV 13B /
    2B checkpoints come from safetensors metadata /
    ``diffusers_config_mapping.py:74-105``)."""

    num_attention_heads: int = 32
    attention_head_dim: int = 64
    in_channels: int = 128
    out_channels: int = 128
    num_layers: int = 28
    cross_attention_dim: int = 2048
    caption_channels: int = 4096
    qk_norm: Optional[str] = "rms_norm"
    # Static |logit| bound enabling the attention kernel's max-free
    # softmax (only used when qk_norm is on). The RMS norm is over the
    # FULL projection dim, so this is an empirical bound on trained
    # attention sharpness, not an algebraic one — logits beyond it clamp
    # (they tie where softmax is already saturated). Must stay <= ~45 for
    # the fp32 exp2 underflow margin. Default None = exact online softmax;
    # opt into the ~13%-faster bounded tier per checkpoint (env
    # LTXV_TPU_SCORE_BOUND, see serving/model_zoo.py) after validating the
    # real max |logit| with tools/check_tpu_parity.py --stress.
    attention_score_bound: Optional[float] = None
    standardization_norm: str = "rms_norm"  # or "layer_norm"
    activation_fn: str = "gelu-approximate"  # or "geglu"
    adaptive_norm: str = "single_scale_shift"
    norm_eps: float = 1e-6
    attention_bias: bool = True
    positional_embedding_theta: float = 10000.0
    positional_embedding_max_pos: tuple = (20, 2048, 2048)
    timestep_scale_multiplier: float = 1000.0
    ffn_mult: int = 4
    frequency_embedding_size: int = 256
    # token-chunked FFN (1 = off); see _ffn
    ffn_chunks: int = 1

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @property
    def ffn_dim(self) -> int:
        return self.inner_dim * self.ffn_mult


# Skip-layer strategies for STG
# (``/root/reference/ltx_video/utils/skip_layer_strategy.py:4-8``)
class SkipLayerStrategy:
    AttentionSkip = "attention_skip"
    AttentionValues = "attention_values"
    Residual = "residual"
    TransformerBlock = "transformer_block"


# ---------------------------------------------------------------------------
# Parameter initialization (tests / random models; checkpoints overwrite)
# ---------------------------------------------------------------------------

def _linear(key, d_in, d_out, bias=True):
    k1, _ = jax.random.split(key)
    p = {"kernel": jax.random.normal(k1, (d_in, d_out)) * (d_in**-0.5)}
    if bias:
        p["bias"] = jnp.zeros((d_out,))
    return p


def init_params(key: jax.Array, cfg: LTXTransformerConfig) -> dict:
    d = cfg.inner_dim
    keys = iter(jax.random.split(key, 64))

    def blk(key):
        ks = iter(jax.random.split(key, 16))
        p = {
            "scale_shift_table": jax.random.normal(next(ks), (6, d)) / d**0.5,
            "attn1": {
                "to_q": _linear(next(ks), d, d, cfg.attention_bias),
                "to_k": _linear(next(ks), d, d, cfg.attention_bias),
                "to_v": _linear(next(ks), d, d, cfg.attention_bias),
                "to_out": _linear(next(ks), d, d, True),
            },
            "attn2": {
                "to_q": _linear(next(ks), d, d, cfg.attention_bias),
                "to_k": _linear(next(ks), d, d, cfg.attention_bias),
                "to_v": _linear(next(ks), d, d, cfg.attention_bias),
                "to_out": _linear(next(ks), d, d, True),
            },
            "ff": {
                "proj_in": _linear(
                    next(ks),
                    d,
                    cfg.ffn_dim * (2 if cfg.activation_fn == "geglu" else 1),
                ),
                "proj_out": _linear(next(ks), cfg.ffn_dim, d),
            },
        }
        if cfg.qk_norm:
            p["attn1"]["q_norm"] = {"weight": jnp.ones((d,))}
            p["attn1"]["k_norm"] = {"weight": jnp.ones((d,))}
            p["attn2"]["q_norm"] = {"weight": jnp.ones((d,))}
            p["attn2"]["k_norm"] = {"weight": jnp.ones((d,))}
        return p

    block_keys = jax.random.split(next(keys), cfg.num_layers)
    blocks = jax.vmap(blk)(block_keys)

    params = {
        "patchify_proj": _linear(next(keys), cfg.in_channels, d),
        "adaln": {
            "emb_linear_1": _linear(next(keys), cfg.frequency_embedding_size, d),
            "emb_linear_2": _linear(next(keys), d, d),
            "linear": _linear(next(keys), d, 6 * d),
        },
        "caption_projection": {
            "linear_1": _linear(next(keys), cfg.caption_channels, d),
            "linear_2": _linear(next(keys), d, d),
        },
        "blocks": blocks,
        "scale_shift_table": jax.random.normal(next(keys), (2, d)) / d**0.5,
        "proj_out": _linear(next(keys), d, cfg.out_channels),
    }
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _apply_linear(p, x, accum=jnp.float32):
    # single source of truth for the quantization-tier dispatch
    # (int8-dynamic / int8-wo / int4-wo / dense — ops/quant.py)
    from ...ops.quant import maybe_quantized_matmul

    return maybe_quantized_matmul(p, x, accum=accum)


def timestep_embedding(
    t: jax.Array, dim: int, max_period: float = 10000.0
) -> jax.Array:
    """Sinusoidal embedding, diffusers convention: ``flip_sin_to_cos=True``,
    ``downscale_freq_shift=0`` → output is [cos | sin]
    (``/root/reference/ltx_video/models/transformers/embeddings.py:10-50``)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[..., None] * freqs
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def _rope_heads_on() -> bool:
    """Opt-in rope-on-heads output layout (``LTXV_TPU_ROPE_HEADS=1``)."""
    from ...ops.rope import rope_heads_enabled

    return rope_heads_enabled()


def _std_norm(cfg: LTXTransformerConfig, x):
    if cfg.standardization_norm == "rms_norm":
        return rms_norm(x, eps=cfg.norm_eps)
    return layer_norm(x, eps=cfg.norm_eps)


def _qk_norm(p, name, x):
    if name in p:
        return rms_norm(x, p[name]["weight"], eps=1e-5)
    return x


def _ffn_part(cfg: LTXTransformerConfig, p, x):
    h = _apply_linear(p["proj_in"], x)
    if cfg.activation_fn == "geglu":
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * jax.nn.gelu(gate, approximate=False)
    elif cfg.activation_fn == "gelu-approximate":
        h = jax.nn.gelu(h, approximate=True)
    elif cfg.activation_fn == "gelu":
        h = jax.nn.gelu(h, approximate=False)
    else:
        raise ValueError(cfg.activation_fn)
    return _apply_linear(p["proj_out"], h)


def _ffn(cfg: LTXTransformerConfig, p, x):
    """FFN, optionally token-chunked (``cfg.ffn_chunks``) to bound the
    4x-wide intermediate — the HBM analogue of the reference's in-place
    chunked feed-forward (``attention.py:334-343``); needed so 13B-class
    configs fit next to their weights on one 16 GB chip."""
    if cfg.ffn_chunks <= 1:
        return _ffn_part(cfg, p, x)
    s = x.shape[1]
    n = cfg.ffn_chunks
    pad = (-s) % n
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0))) if pad else x
    chunks = jnp.split(xp, n, axis=1)
    out = jnp.concatenate([_ffn_part(cfg, p, c) for c in chunks], axis=1)
    return out[:, :s] if pad else out


def _broadcast_groups(vals: jax.Array, n_tokens: int) -> jax.Array:
    """Expand per-group modulation values [B, G, D] to [B, n_tokens, D]
    (the reference reshapes hidden states to [B, G, T/G, D] instead —
    ``attention.py:34-41``; same numbers)."""
    b, g, dim = vals.shape
    if g == 1:
        return jnp.broadcast_to(vals, (b, n_tokens, dim))
    assert n_tokens % g == 0, (n_tokens, g)
    rep = n_tokens // g
    return jnp.repeat(vals, rep, axis=1)


def _block_forward(
    cfg: LTXTransformerConfig,
    p: dict,
    x: jax.Array,                  # [B, S, D]
    context: jax.Array,            # [B, Sc, D] (caption-projected)
    context_mask: Optional[jax.Array],  # [B, Sc] 1=keep
    ada: jax.Array,                # [B, G, 6, D] fp32 timestep table
    freqs: tuple[jax.Array, jax.Array],  # cos/sin [B, S, D] fp32
    skip_mask: Optional[jax.Array],      # [B] 1=keep, 0=perturb  (this layer)
    skip_strategy: Optional[str],
    attn_mode: str,
) -> jax.Array:
    b, s, d = x.shape
    heads = cfg.num_attention_heads
    hd = cfg.attention_head_dim

    table = p["scale_shift_table"].astype(jnp.float32)  # [6, D]
    ada_v = table[None, None] + ada  # [B, G, 6, D]
    shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = [
        _broadcast_groups(ada_v[:, :, i], s).astype(x.dtype) for i in range(6)
    ]

    # Fused adaLN prologue tier (opt-in, measured): rms-norm + modulate +
    # act-quant + the int8 qkv / fc1 matmuls in ONE Pallas launch — h is
    # never materialized to HBM. AttentionSkip needs h explicitly, so
    # that (rare, perturbed-stream) combination stays on the XLA chain.
    fused_mode = _fp.enabled_mode()
    use_fused = (
        fused_mode is not None
        and cfg.standardization_norm == "rms_norm"
        and not (skip_mask is not None
                 and skip_strategy == SkipLayerStrategy.AttentionSkip)
        and _fp.supports(
            [p["attn1"]["to_q"], p["attn1"]["to_k"], p["attn1"]["to_v"]],
            s, ada.shape[1],
        )
        and (fused_mode == "interpret"
             or jax.default_backend() == "tpu")
    )

    original_x = x

    # --- self attention -----------------------------------------------------
    if use_fused:
        qkv = _fp.apply_fused(
            x, ada_v[:, :, 1], ada_v[:, :, 0],
            [p["attn1"]["to_q"], p["attn1"]["to_k"], p["attn1"]["to_v"]],
            eps=cfg.norm_eps, interpret=fused_mode == "interpret",
        )
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _qk_norm(p["attn1"], "q_norm", q)
        k = _qk_norm(p["attn1"], "k_norm", k)
        h = None
    else:
        h = _std_norm(cfg, x)
        h = h * (1 + scale_msa) + shift_msa

        q = _qk_norm(p["attn1"], "q_norm", _apply_linear(p["attn1"]["to_q"], h))
        k = _qk_norm(p["attn1"], "k_norm", _apply_linear(p["attn1"]["to_k"], h))
        v = _apply_linear(p["attn1"]["to_v"], h)
    cos, sin = freqs
    # opt-in rope-on-heads layout (LTXV_TPU_ROPE_HEADS=1): the rotation's
    # output is written directly in [B, H, S, d], fusing the head
    # relayout into the RoPE pass instead of paying both as separate HBM
    # round-trips; needs the half-layout tables (the hot path)
    rope_heads = _rope_heads_on() and cos.shape[-1] * 2 == q.shape[-1]
    if rope_heads:
        q4 = apply_rotary_emb_heads(q, cos, sin, heads)
        k4 = apply_rotary_emb_heads(k, cos, sin, heads)
    else:
        q = apply_rotary_emb(q, cos, sin)
        k = apply_rotary_emb(k, cos, sin)

    def to_heads(t):
        return t.reshape(b, s, heads, hd).transpose(0, 2, 1, 3)

    def from_heads(t):
        return t.transpose(0, 2, 1, 3).reshape(b, s, heads * hd)

    # qk-normed logits stay within the configured bound -> the kernel's
    # max-free softmax path (see attention_score_bound in the config)
    sb = cfg.attention_score_bound if cfg.qk_norm else None
    base_mode, sp_axis = parse_sp(attn_mode)
    if sp_axis is not None:
        # USP: tokens sequence-sharded over `sp_axis` (parallel/usp.py);
        # RoPE above used the per-shard slice of the GLOBAL fractional
        # coordinates, so only the attention itself needs the exchange
        from ...parallel.ulysses import ulysses_attention

        attn_raw = from_heads(ulysses_attention(
            q4 if rope_heads else to_heads(q),
            k4 if rope_heads else to_heads(k),
            to_heads(v), axis_name=sp_axis,
            attn_mode=base_mode, score_bound=sb,
        ))
    elif rope_heads:
        attn_raw = from_heads(attention(
            q4, k4, to_heads(v), mode=base_mode, score_bound=sb,
        ))
    else:
        # head-packed fast path: consumes [B, S, H*D] directly (the hp
        # Pallas kernel), so the to_heads/from_heads transposes never
        # exist; falls back to split-heads dispatch off-TPU / for the
        # int8 and bounded tiers
        attn_raw = attention_packed(q, k, v, heads, mode=base_mode,
                                    score_bound=sb)
    # STG perturbation mixes BEFORE the output projection
    # (``attention.py:1128-1144``): AttentionSkip swaps in the pre-attention
    # (modulated, normed) input; AttentionValues swaps in the raw values.
    if skip_mask is not None and skip_strategy == SkipLayerStrategy.AttentionSkip:
        m = skip_mask.astype(x.dtype)[:, None, None]
        attn_raw = attn_raw * m + h * (1 - m)
    elif skip_mask is not None and skip_strategy == SkipLayerStrategy.AttentionValues:
        m = skip_mask.astype(x.dtype)[:, None, None]
        attn_raw = attn_raw * m + v * (1 - m)
    x = x + gate_msa * _apply_linear(p["attn1"]["to_out"], attn_raw)

    # --- cross attention ----------------------------------------------------
    q = _qk_norm(p["attn2"], "q_norm", _apply_linear(p["attn2"]["to_q"], x))
    k = _qk_norm(p["attn2"], "k_norm", _apply_linear(p["attn2"]["to_k"], context))
    v = _apply_linear(p["attn2"]["to_v"], context)
    sc = context.shape[1]
    kv_seg = (
        context_mask.astype(jnp.int32)
        if context_mask is not None
        else jnp.ones((b, sc), jnp.int32)
    )
    q_seg = jnp.ones((b, s), jnp.int32)
    # sequence-sharded q rows against replicated context: no collective
    ca = attention(
        q.reshape(b, s, heads, hd).transpose(0, 2, 1, 3),
        k.reshape(b, sc, heads, hd).transpose(0, 2, 1, 3),
        v.reshape(b, sc, heads, hd).transpose(0, 2, 1, 3),
        q_seg,
        kv_seg,
        mode=base_mode,
        score_bound=sb,
    )
    ca = ca.transpose(0, 2, 1, 3).reshape(b, s, heads * hd)
    x = x + _apply_linear(p["attn2"]["to_out"], ca)

    # --- feed-forward -------------------------------------------------------
    if (use_fused and cfg.ffn_chunks <= 1
            and cfg.activation_fn in ("geglu", "gelu-approximate", "gelu")
            and _fp.supports([p["ff"]["proj_in"]], s, ada.shape[1])):
        hp = _fp.apply_fused(
            x, ada_v[:, :, 4], ada_v[:, :, 3], [p["ff"]["proj_in"]],
            eps=cfg.norm_eps, interpret=fused_mode == "interpret",
        )
        if cfg.activation_fn == "geglu":
            hp, gate = jnp.split(hp, 2, axis=-1)
            hp = hp * jax.nn.gelu(gate, approximate=False)
        elif cfg.activation_fn == "gelu-approximate":
            hp = jax.nn.gelu(hp, approximate=True)
        else:
            hp = jax.nn.gelu(hp, approximate=False)
        x = x + gate_mlp * _apply_linear(p["ff"]["proj_out"], hp)
    else:
        h = _std_norm(cfg, x)
        h = h * (1 + scale_mlp) + shift_mlp
        x = x + gate_mlp * _ffn(cfg, p["ff"], h)

    if skip_mask is not None and skip_strategy == SkipLayerStrategy.TransformerBlock:
        m = skip_mask.astype(x.dtype)[:, None, None]
        x = x * m + original_x * (1 - m)

    return x


def compute_freqs(cfg: LTXTransformerConfig,
                  indices_grid: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Fractional-coordinate RoPE (cos, sin) tables for ``forward``
    (``transformer3d.py:202-255``). Step-invariant — precompute once per
    denoise and reuse across all steps/layers."""
    d = cfg.inner_dim
    return ltx_freqs_cis(
        indices_grid,
        d,
        theta=cfg.positional_embedding_theta,
        max_pos=cfg.positional_embedding_max_pos,
        # one entry per rotation pair: halves the fp32 table bytes the
        # per-step graph materializes and reads (x2 applies x layers)
        half_layout=(d % 6) % 2 == 0,
    )


def forward(
    params: dict,
    cfg: LTXTransformerConfig,
    latents: jax.Array,            # [B, S, C_in] patchified tokens
    indices_grid: jax.Array,       # [B, 3, S] fractional latent coords
    timestep: jax.Array,           # [B] or [B, G] in [0, 1]
    caption: jax.Array,            # [B, Sc, caption_channels]
    caption_mask: Optional[jax.Array] = None,  # [B, Sc]
    skip_layer_mask: Optional[jax.Array] = None,  # [L, B] 1=keep
    skip_layer_strategy: Optional[str] = None,
    attn_mode: str = "auto",
    scan_layers: bool = True,
    previous_residual: Optional[jax.Array] = None,  # [B, S, D] block delta
    compute: bool | jax.Array = True,
    return_residual: bool = False,
    freqs: Optional[tuple] = None,  # precomputed (cos, sin) RoPE tables
) -> jax.Array:
    """Denoiser forward: returns velocity prediction ``[B, S, C_out]``
    (or ``(velocity, residual)`` with ``return_residual``).

    Guidance streams are batch rows; per-token timesteps are expressed as
    per-group timesteps ``[B, G]`` where G divides S (the reference reduces
    per-token t the same way — ``transformer3d.py:423-425``).

    ``previous_residual``/``compute`` implement TeaCache-style step
    skipping (the reference ships it for Wan only, ``model.py:1030-1057``;
    here the flagship family gets the same knob): when ``compute`` is
    False the block stack is bypassed and the previous step's block-stack
    delta is re-applied to the current embedding.
    """
    d = cfg.inner_dim
    b, s, _ = latents.shape

    x = _apply_linear(params["patchify_proj"], latents)

    t = jnp.asarray(timestep)
    if t.ndim == 1:
        t = t[:, None]  # [B, 1]
    t = t * cfg.timestep_scale_multiplier
    g = t.shape[1]

    # adaLN-single: sinusoidal -> MLP -> embedded; linear(silu) -> 6-chunk
    emb = timestep_embedding(t.reshape(-1), cfg.frequency_embedding_size)
    emb = _apply_linear(params["adaln"]["emb_linear_1"], emb)
    emb = jax.nn.silu(emb)
    embedded = _apply_linear(params["adaln"]["emb_linear_2"], emb)  # [B*G, D]
    ada = _apply_linear(params["adaln"]["linear"], jax.nn.silu(embedded))
    ada = ada.reshape(b, g, 6, d).astype(jnp.float32)
    embedded = embedded.reshape(b, g, d).astype(jnp.float32)

    # caption projection (PixArtAlphaTextProjection: linear-gelu_tanh-linear)
    ctx = _apply_linear(params["caption_projection"]["linear_1"],
                        caption.astype(x.dtype))
    ctx = jax.nn.gelu(ctx, approximate=True)
    ctx = _apply_linear(params["caption_projection"]["linear_2"], ctx)

    # RoPE tables depend only on coords — callers that loop over steps
    # (denoise scan) precompute them ONCE via compute_freqs and pass them
    # in; XLA's loop-invariant motion won't hoist multi-MB intermediates
    # out of the scan body on its own
    cos, sin = freqs if freqs is not None else compute_freqs(
        cfg, indices_grid
    )

    if skip_layer_mask is None:
        skip_layer_mask = jnp.ones((cfg.num_layers, b), jnp.float32)

    def body(x, layer):
        layer_params, layer_skip = layer
        x = _block_forward(
            cfg, layer_params, x, ctx, caption_mask,
            ada, (cos, sin), layer_skip, skip_layer_strategy, attn_mode,
        )
        return x, None

    def run_blocks(x):
        if scan_layers:
            x, _ = jax.lax.scan(body, x, (params["blocks"], skip_layer_mask))
        else:
            # unrolled: static-index slices of the stacked weights let XLA
            # feed matmuls without the per-iteration gather copy a scan
            # incurs — larger executables, one compile, faster steady-state
            for i in range(cfg.num_layers):
                layer_params = jax.tree.map(lambda a: a[i], params["blocks"])
                x, _ = body(x, (layer_params, skip_layer_mask[i]))
        return x

    x_in = x
    if previous_residual is None:
        x = run_blocks(x)
    else:
        x = jax.lax.cond(
            jnp.asarray(compute, bool),
            run_blocks,
            lambda xx: xx + previous_residual.astype(xx.dtype),
            x,
        )
    residual = x - x_in

    # final modulation + projection
    table = params["scale_shift_table"].astype(jnp.float32)  # [2, D]
    vals = table[None, None] + embedded[:, :, None]  # [B, G, 2, D]
    shift = _broadcast_groups(vals[:, :, 0], s).astype(x.dtype)
    scale = _broadcast_groups(vals[:, :, 1], s).astype(x.dtype)
    x = layer_norm(x, eps=1e-6)
    x = x * (1 + scale) + shift
    out = _apply_linear(params["proj_out"], x)
    if return_residual:
        return out, residual
    return out
