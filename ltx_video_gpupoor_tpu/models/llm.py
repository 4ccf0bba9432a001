"""Decoder-only LLM family (Llama-3.x / Qwen2.5), TPU-native.

Parity target: the prompt-enhancement / prompt-extension language models
the reference drives through host-side torch ``transformers`` —
``unsloth/Llama-3.2-3B-Instruct`` for the LTX cinematic enhancer
(``/root/reference/ltx_video/utils/prompt_enhance_utils.py``) and the
Qwen2.5-Instruct family for the Wan extenders
(``/root/reference/wan/utils/prompt_extend.py:300-365``). The reference
runs these as black-box ``AutoModelForCausalLM.generate`` calls on the
serving host; here the same architectures are implemented as pure JAX
functions so the rewrite runs on the TPU next to the diffusion model —
no host round-trip, no torch dependency on the serving path.

One config covers both families: Qwen2 is Llama plus attention-input
biases (``qkv_bias``); both use RMSNorm, rotary GQA attention and SwiGLU.
Llama-3.x additionally applies the "llama3" RoPE frequency rescaling.

Design notes (TPU-first):
- layers are stacked and scanned — one compilation regardless of depth;
- generation is a ``lax.scan`` over a static-size KV cache (prefill +
  single-token steps), so the whole ``generate`` is ONE compiled program
  per (prompt_len_bucket, max_new_tokens) — no per-token dispatch over
  the relay (eager per-token decode is catastrophically slow there);
- weights convert 1:1 from the published HF safetensors layout via
  ``convert_hf_state_dict`` (``model.layers.N.self_attn.q_proj.weight``
  naming), validated against torch ``transformers`` in
  ``tests/test_llm_golden.py``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.norms import rms_norm


@dataclasses.dataclass(frozen=True)
class LLMConfig:
    vocab_size: int = 128256
    dim: int = 3072
    num_layers: int = 28
    num_heads: int = 24
    num_kv_heads: int = 8
    ffn_dim: int = 8192
    rope_theta: float = 500000.0
    rms_eps: float = 1e-5
    qkv_bias: bool = False          # True for Qwen2
    tie_embeddings: bool = True
    head_dim: Optional[int] = None  # defaults to dim // num_heads
    # "llama3" RoPE rescaling (Llama-3.1+ / 3.2); None = plain RoPE
    rope_scaling: Optional[str] = None
    rope_factor: float = 32.0
    rope_low_freq_factor: float = 1.0
    rope_high_freq_factor: float = 4.0
    rope_original_max_pos: int = 8192
    # Qwen2.5-VL multimodal RoPE: per-axis channel sections (t, h, w)
    # summing to hd/2; None = standard 1D RoPE
    mrope_section: Optional[tuple] = None

    @property
    def hd(self) -> int:
        return self.head_dim or self.dim // self.num_heads


# unsloth/Llama-3.2-3B-Instruct (the LTX enhancer LLM)
LLAMA_3_2_3B = LLMConfig(rope_scaling="llama3")
# Qwen/Qwen2.5-3B-Instruct (the Wan prompt extender)
QWEN_2_5_3B = LLMConfig(
    vocab_size=151936, dim=2048, num_layers=36, num_heads=16,
    num_kv_heads=2, ffn_dim=11008, rope_theta=1000000.0, rms_eps=1e-6,
    qkv_bias=True,
)


def config_from_hf(hf: dict) -> LLMConfig:
    """Map a HF ``config.json`` dict (LlamaConfig / Qwen2Config fields)
    onto :class:`LLMConfig`."""
    arch = (hf.get("architectures") or [""])[0].lower()
    rs = hf.get("rope_scaling") or {}
    return LLMConfig(
        vocab_size=hf["vocab_size"],
        dim=hf["hidden_size"],
        num_layers=hf["num_hidden_layers"],
        num_heads=hf["num_attention_heads"],
        num_kv_heads=hf.get("num_key_value_heads", hf["num_attention_heads"]),
        ffn_dim=hf["intermediate_size"],
        rope_theta=hf.get("rope_theta", 10000.0),
        rms_eps=hf.get("rms_norm_eps", 1e-6),
        qkv_bias="qwen2" in arch,
        tie_embeddings=hf.get("tie_word_embeddings", False),
        head_dim=hf.get("head_dim"),
        rope_scaling=rs.get("rope_type") or rs.get("type"),
        rope_factor=rs.get("factor", 32.0),
        rope_low_freq_factor=rs.get("low_freq_factor", 1.0),
        rope_high_freq_factor=rs.get("high_freq_factor", 4.0),
        rope_original_max_pos=rs.get(
            "original_max_position_embeddings", 8192),
    )


def init_params(key: jax.Array, cfg: LLMConfig) -> dict:
    ks = iter(jax.random.split(key, 4))
    hd, nh, nkv = cfg.hd, cfg.num_heads, cfg.num_kv_heads

    def lin(k, din, dout, bias):
        p = {"kernel": jax.random.normal(k, (din, dout)) * din**-0.5}
        if bias:
            p["bias"] = jnp.zeros((dout,))
        return p

    def block(k):
        kk = iter(jax.random.split(k, 8))
        return {
            "input_norm": {"weight": jnp.ones((cfg.dim,))},
            "attn": {
                "q": lin(next(kk), cfg.dim, nh * hd, cfg.qkv_bias),
                "k": lin(next(kk), cfg.dim, nkv * hd, cfg.qkv_bias),
                "v": lin(next(kk), cfg.dim, nkv * hd, cfg.qkv_bias),
                "o": lin(next(kk), nh * hd, cfg.dim, False),
            },
            "post_norm": {"weight": jnp.ones((cfg.dim,))},
            "mlp": {
                "gate": lin(next(kk), cfg.dim, cfg.ffn_dim, False),
                "up": lin(next(kk), cfg.dim, cfg.ffn_dim, False),
                "down": lin(next(kk), cfg.ffn_dim, cfg.dim, False),
            },
        }

    blocks = jax.vmap(block)(jax.random.split(next(ks), cfg.num_layers))
    params = {
        "token_embedding": jax.random.normal(
            next(ks), (cfg.vocab_size, cfg.dim)) * 0.02,
        "blocks": blocks,
        "norm": {"weight": jnp.ones((cfg.dim,))},
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = {
            "kernel": jax.random.normal(next(ks), (cfg.dim, cfg.vocab_size))
            * cfg.dim**-0.5
        }
    return params


def rope_tables(cfg: LLMConfig, positions: jax.Array):
    """cos/sin tables ``[..., hd]`` in the HF half-split convention
    (cos duplicated over both halves), incl. the "llama3" frequency
    rescaling (transformers ``_compute_llama3_parameters``)."""
    hd = cfg.hd
    inv_freq = 1.0 / (
        cfg.rope_theta ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd)
    )
    if cfg.rope_scaling == "llama3":
        wavelen = 2.0 * math.pi / inv_freq
        low_wl = cfg.rope_original_max_pos / cfg.rope_low_freq_factor
        high_wl = cfg.rope_original_max_pos / cfg.rope_high_freq_factor
        smooth = (
            cfg.rope_original_max_pos / wavelen - cfg.rope_low_freq_factor
        ) / (cfg.rope_high_freq_factor - cfg.rope_low_freq_factor)
        smoothed = (
            (1.0 - smooth) * inv_freq / cfg.rope_factor + smooth * inv_freq
        )
        inv_freq = jnp.where(
            wavelen > low_wl,
            inv_freq / cfg.rope_factor,
            jnp.where(wavelen < high_wl, inv_freq, smoothed),
        )
    ang = positions[..., None].astype(jnp.float32) * inv_freq  # [..., hd/2]
    if cfg.mrope_section is not None and positions.ndim == 3:
        # multimodal 3D RoPE (Qwen2.5-VL): positions [3, B, S]; channel
        # chunks of the half-dim take the t/h/w axis cyclically
        # (transformers apply_multimodal_rotary_pos_emb)
        parts, start = [], 0
        for i, sec in enumerate(cfg.mrope_section):
            parts.append(ang[i % 3, ..., start:start + sec])
            start += sec
        ang = jnp.concatenate(parts, axis=-1)  # [B, S, hd/2]
    cos = jnp.concatenate([jnp.cos(ang), jnp.cos(ang)], axis=-1)
    sin = jnp.concatenate([jnp.sin(ang), jnp.sin(ang)], axis=-1)
    return cos, sin


def _rotate_half(x):
    a, b = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-b, a], axis=-1)


def _apply_rope(x, cos, sin):
    # x: [B, S, H, hd]; cos/sin: [S, hd] or [B, S, hd]
    if cos.ndim == 2:
        cos, sin = cos[None], sin[None]
    cos, sin = cos[:, :, None, :], sin[:, :, None, :]
    return (x * cos + _rotate_half(x) * sin).astype(x.dtype)


def _attn(p, cfg, x, cos, sin, kv_cache=None, cache_pos=None,
          attn_bias=None):
    """GQA attention. Full-sequence causal when ``kv_cache is None``;
    otherwise a single-token decode step against the static cache
    (``kv_cache = (k, v)`` of shape ``[B, max_len, nkv, hd]``)."""
    b, s, _ = x.shape
    hd, nh, nkv = cfg.hd, cfg.num_heads, cfg.num_kv_heads
    dt = x.dtype

    def proj(name, dout):
        w = p[name]["kernel"].astype(dt)
        y = x @ w
        if "bias" in p[name]:
            y = y + p[name]["bias"].astype(dt)
        return y

    q = proj("q", nh * hd).reshape(b, s, nh, hd)
    k = proj("k", nkv * hd).reshape(b, s, nkv, hd)
    v = proj("v", nkv * hd).reshape(b, s, nkv, hd)
    q = _apply_rope(q, cos, sin)
    k = _apply_rope(k, cos, sin)

    if kv_cache is not None:
        ck, cv = kv_cache
        ck = jax.lax.dynamic_update_slice_in_dim(ck, k, cache_pos, axis=1)
        cv = jax.lax.dynamic_update_slice_in_dim(cv, v, cache_pos, axis=1)
        k, v = ck, cv
        new_cache = (ck, cv)
    else:
        new_cache = None

    rep = nh // nkv
    kf = jnp.repeat(k, rep, axis=2)
    vf = jnp.repeat(v, rep, axis=2)
    # QK on the MXU in the compute dtype, fp32 accumulation/softmax
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, kf,
        preferred_element_type=jnp.float32) * hd**-0.5
    if attn_bias is not None:
        scores = scores + attn_bias
    probs = jax.nn.softmax(scores, axis=-1).astype(dt)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, vf).reshape(b, s, nh * hd)
    out = out @ p["o"]["kernel"].astype(dt)
    return out, new_cache


def _block(p, cfg, x, cos, sin, kv_cache=None, cache_pos=None,
           attn_bias=None):
    h = rms_norm(x, p["input_norm"]["weight"], eps=cfg.rms_eps)
    a, new_cache = _attn(
        p["attn"], cfg, h, cos, sin, kv_cache, cache_pos, attn_bias)
    x = x + a
    h = rms_norm(x, p["post_norm"]["weight"], eps=cfg.rms_eps)
    dt = h.dtype
    ff = jax.nn.silu(h @ p["mlp"]["gate"]["kernel"].astype(dt)) * (
        h @ p["mlp"]["up"]["kernel"].astype(dt))
    x = x + ff @ p["mlp"]["down"]["kernel"].astype(dt)
    return x, new_cache


def _logits(params, cfg, x):
    dt = x.dtype
    x = rms_norm(x, params["norm"]["weight"], eps=cfg.rms_eps)
    if cfg.tie_embeddings:
        return x @ params["token_embedding"].astype(dt).T
    return x @ params["lm_head"]["kernel"].astype(dt)


def forward(
    params: dict,
    cfg: LLMConfig,
    ids: jax.Array,                 # [B, S] int32
    mask: Optional[jax.Array] = None,  # [B, S] 1 = real (left-pad aware)
    positions: Optional[jax.Array] = None,  # [B,S] or [3,B,S] (M-RoPE)
    embeds: Optional[jax.Array] = None,     # [B,S,dim] overrides embedding
) -> jax.Array:
    """Full-sequence causal forward -> logits ``[B, S, vocab]``."""
    b, s = ids.shape
    # compute dtype follows the checkpoint: fp32 params run fp32 (the
    # golden-test configuration), bf16 params run bf16 on the MXU with
    # fp32 softmax/norm accumulation
    x = params["token_embedding"][ids] if embeds is None else embeds
    x = x.astype(params["token_embedding"].dtype)
    if mask is None:
        mask = jnp.ones((b, s), jnp.int32)
    if positions is None:
        # HF convention for left-padded batches: positions count real
        # tokens
        positions = jnp.cumsum(mask, axis=1) - 1
    cos, sin = rope_tables(cfg, positions)
    causal = jnp.tril(jnp.ones((s, s), bool))
    keep = causal[None, None] & (mask[:, None, None, :] > 0)
    bias = jnp.where(keep, 0.0, -1e9).astype(jnp.float32)

    def body(x, layer_p):
        x, _ = _block(layer_p, cfg, x, cos, sin, attn_bias=bias)
        return x, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    return _logits(params, cfg, x)


def generate(
    params: dict,
    cfg: LLMConfig,
    ids: jax.Array,                # [B, S] int32, LEFT-padded
    mask: jax.Array,               # [B, S] 1 = real token
    max_new_tokens: int,
    eos_ids: tuple = (),
    temperature: float = 0.0,
    key: Optional[jax.Array] = None,
    positions: Optional[jax.Array] = None,   # [B,S] / [3,B,S] prefill
    decode_pos0: Optional[jax.Array] = None,  # [B] first decode position
    embeds: Optional[jax.Array] = None,       # [B,S,dim] prefill embeds
) -> jax.Array:
    """Prefill + scan decode. Returns ``[B, max_new_tokens]`` int32; after
    an EOS the row repeats the EOS id (caller truncates). ``temperature=0``
    is greedy; otherwise pass ``key`` for categorical sampling. The whole
    call is jittable with static ``max_new_tokens``/``eos_ids``.

    ``positions``/``decode_pos0``/``embeds`` support the multimodal
    (M-RoPE) path: custom prefill positions, a per-row position for the
    first generated token (defaults to the real-token count), and
    pre-scattered input embeddings."""
    b, s = ids.shape
    hd, nkv = cfg.hd, cfg.num_kv_heads
    max_len = s + max_new_tokens
    if key is None:
        key = jax.random.key(0)

    # ---- prefill: full-sequence pass that also fills the KV cache ----
    dt = params["token_embedding"].dtype
    x = (params["token_embedding"][ids] if embeds is None else embeds
         ).astype(dt)
    if positions is None:
        positions = jnp.cumsum(mask, axis=1) - 1
    cos, sin = rope_tables(cfg, positions)
    causal = jnp.tril(jnp.ones((s, s), bool))
    keep = causal[None, None] & (mask[:, None, None, :] > 0)
    bias = jnp.where(keep, 0.0, -1e9).astype(jnp.float32)

    empty_k = jnp.zeros((cfg.num_layers, b, max_len, nkv, hd), dt)
    empty_v = jnp.zeros_like(empty_k)

    def prefill_body(x, inp):
        layer_p, ck, cv = inp
        x, cache = _block(
            layer_p, cfg, x, cos, sin, kv_cache=(ck, cv), cache_pos=0,
            attn_bias=jnp.pad(
                bias, ((0, 0), (0, 0), (0, 0), (0, max_new_tokens)),
                constant_values=-1e9),
        )
        return x, cache

    x, (cache_k, cache_v) = jax.lax.scan(
        prefill_body, x, (params["blocks"], empty_k, empty_v))
    last_logits = _logits(params, cfg, x[:, -1:, :])[:, 0]  # [B, vocab]

    n_real = jnp.sum(mask, axis=1)  # next physical cache slot count
    if decode_pos0 is None:
        decode_pos0 = n_real  # standard 1D RoPE: position = token count
    # M-RoPE prompts compress vision positions (a grid spans
    # max(t, h, w) positions, not t*h*w), so the first generated token's
    # rotary position comes from the caller (max prefill position + 1),
    # NOT from the token count.
    decode_pos0 = jnp.asarray(decode_pos0)

    def sample(logits, k):
        logits = logits.astype(jnp.float32)
        if temperature <= 0.0:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return jax.random.categorical(
            k, logits / temperature, axis=-1).astype(jnp.int32)

    eos_fill = eos_ids[0] if eos_ids else 0
    pmask = jnp.pad(mask > 0, ((0, 0), (0, max_new_tokens)))

    def decode_body(carry, step_key):
        cache_k, cache_v, logits, done, step = carry
        tok = sample(logits, step_key)
        # rows already finished keep emitting EOS (callers truncate there)
        tok = jnp.where(done, jnp.int32(eos_fill), tok)
        for e in eos_ids:
            done = done | (tok == e)
        emb = params["token_embedding"][tok][:, None, :].astype(dt)
        pos = (decode_pos0 + step)[:, None]  # [B, 1] rotary position
        c, sn = rope_tables(cfg, pos)
        # attend to: prompt real tokens + generated tokens so far
        kpos = jnp.arange(max_len)[None, :]
        keep = (pmask & (kpos < s)) | ((kpos >= s) & (kpos < s + step + 1))
        abias = jnp.where(keep[:, None, None, :], 0.0, -1e9)

        def layer(xx, inp):
            layer_p, ck, cv = inp
            xx, cache = _block(
                layer_p, cfg, xx, c, sn, kv_cache=(ck, cv),
                cache_pos=s + step, attn_bias=abias)
            return xx, cache

        xx, (cache_k, cache_v) = jax.lax.scan(
            layer, emb, (params["blocks"], cache_k, cache_v))
        logits = _logits(params, cfg, xx)[:, 0]
        return (cache_k, cache_v, logits, done, step + 1), tok

    done0 = jnp.zeros((b,), bool)
    keys = jax.random.split(key, max_new_tokens)
    _, toks = jax.lax.scan(
        decode_body, (cache_k, cache_v, last_logits, done0, 0), keys)
    return toks.T  # [B, max_new_tokens]


# ---------------------------------------------------------------------------
# HF checkpoint conversion
# ---------------------------------------------------------------------------

def convert_hf_state_dict(sd: dict, cfg: LLMConfig) -> dict:
    """Map a HF Llama/Qwen2 state dict (numpy arrays, HF names) onto the
    param tree. Accepts the published safetensors naming
    (``model.layers.N.self_attn.q_proj.weight`` ...)."""
    import numpy as np

    def g(name):
        return np.asarray(sd[name])

    blocks = []
    for i in range(cfg.num_layers):
        pre = f"model.layers.{i}."
        at = {"q": {}, "k": {}, "v": {}, "o": {}}
        for ours, theirs in (("q", "q_proj"), ("k", "k_proj"),
                             ("v", "v_proj"), ("o", "o_proj")):
            at[ours]["kernel"] = g(f"{pre}self_attn.{theirs}.weight").T
            bname = f"{pre}self_attn.{theirs}.bias"
            if bname in sd:
                at[ours]["bias"] = g(bname)
        blocks.append({
            "input_norm": {"weight": g(f"{pre}input_layernorm.weight")},
            "attn": at,
            "post_norm": {
                "weight": g(f"{pre}post_attention_layernorm.weight")},
            "mlp": {
                "gate": {"kernel": g(f"{pre}mlp.gate_proj.weight").T},
                "up": {"kernel": g(f"{pre}mlp.up_proj.weight").T},
                "down": {"kernel": g(f"{pre}mlp.down_proj.weight").T},
            },
        })
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    params = {
        "token_embedding": jnp.asarray(g("model.embed_tokens.weight")),
        "blocks": stacked,
        "norm": {"weight": jnp.asarray(g("model.norm.weight"))},
    }
    if not cfg.tie_embeddings and "lm_head.weight" in sd:
        params["lm_head"] = {"kernel": jnp.asarray(g("lm_head.weight")).T}
    return params


def read_hf_dir(path: str) -> tuple:
    """(config dict, raw state dict) from a HF model directory —
    config.json + every safetensors shard, read through the framework's
    native loader. Shared by the Llama/Qwen2, Qwen2.5-VL, and Florence-2
    loaders so shard handling has exactly one implementation."""
    import json
    import os

    from ..core.checkpoint import load_safetensors

    with open(os.path.join(path, "config.json")) as fh:
        hf_cfg = json.load(fh)
    sd = {}
    for f in sorted(os.listdir(path)):
        if f.endswith(".safetensors"):
            tensors, _meta = load_safetensors(os.path.join(path, f))
            sd.update(tensors)
    return hf_cfg, sd


def load_hf_dir(path: str):
    """Load (cfg, params) from a HF model directory (config.json +
    safetensors shards) using the framework's native loader."""
    hf_cfg, sd = read_hf_dir(path)
    cfg = config_from_hf(hf_cfg)
    return cfg, convert_hf_state_dict(sd, cfg)
