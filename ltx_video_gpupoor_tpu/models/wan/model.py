"""Wan 2.1 diffusion transformer (WanModel), TPU-native.

Parity target: ``WanModel`` at ``/root/reference/wan/modules/model.py``:
- Conv3d patch-embed stride=patch (``:740``), text/time MLPs + 6-way
  modulation (``:745-752``), N ``WanAttentionBlock``s (self-attn with
  [44,42,42] RoPE over head_dim 128, t2v/i2v cross-attn, tanh-GELU FFN)
  (``:354-500``), modulated ``Head`` (``:539-573``);
- per-frame modulation for diffusion forcing (2-D timesteps, ``:977-991``);
- i2v CLIP context via ``MLPProj`` (257 tokens prepended, ``:576-588``);
- fps conditioning (``inject_sample_info``, ``:746-748, 984-991``);
- VACE control blocks (``VaceWanAttentionBlock`` ``:503-536``) — the vace
  stream consumes the embedded input once at block 0 and evolves
  independently, so its hints are computed as a separate scan;
- ReCamMaster camera embedding (``cam_encoder``/``projector``,
  ``:442-455, 806-814``);
- SLG layer skipping (``:1077-1080``) expressed as a per-layer per-stream
  keep mask;
- TeaCache residual reuse (``:1030-1101``) — decisions depend only on the
  timestep list, so the JAX version precomputes a static skip schedule
  (see wan pipeline) and the forward exposes residual in/out.

Guidance streams are batch rows (replacing the multi-stream ``x_list``
aliasing protocol at ``:938-955``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange

from ...ops.attention import attention, parse_sp
from ...ops.norms import layer_norm, rms_norm
from ...ops.rope import (
    apply_rotary_emb,
    apply_rotary_emb_shared_heads,
    full_to_half,
    rope_heads_enabled,
)


@dataclasses.dataclass(frozen=True)
class WanConfig:
    model_type: str = "t2v"  # t2v | i2v
    patch_size: tuple = (1, 2, 2)
    text_len: int = 512
    in_dim: int = 16
    dim: int = 2048
    ffn_dim: int = 8192
    freq_dim: int = 256
    text_dim: int = 4096
    out_dim: int = 16
    num_heads: int = 16
    num_layers: int = 32
    qk_norm: bool = True
    # |logit| bound for the kernel's max-free softmax when qk_norm is on;
    # empirical (RMS norm is over the full dim), clamp-saturating beyond
    # it; <= ~45 for fp32 exp2 underflow margin. Default None = exact
    # softmax; opt in per checkpoint (env LTXV_TPU_SCORE_BOUND via
    # serving/model_zoo.py) after stressing with check_tpu_parity.py
    attention_score_bound: Optional[float] = None
    cross_attn_norm: bool = True
    eps: float = 1e-6
    vace_layers: Optional[tuple] = None
    vace_in_dim: Optional[int] = None
    recammaster: bool = False
    inject_sample_info: bool = False
    # token-chunked FFN: bounds the ffn_dim-wide intermediate so
    # 14B-class dims (ffn 13824 at 32k tokens x 2 streams = 1.8 GiB per
    # intermediate) fit next to the weights on one 16 GiB chip — the
    # HBM analogue of the reference's in-place chunked feed-forward
    # (``/root/reference/wan/modules/attention.py`` pattern; LTX has the
    # same knob in ``transformer3d.LTXTransformerConfig.ffn_chunks``)
    ffn_chunks: int = 1

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads


# /root/reference/wan/configs/wan_t2v_1_3B.py:8-29
WAN_T2V_1_3B = WanConfig(
    model_type="t2v", dim=1536, ffn_dim=8960, num_heads=12, num_layers=30
)
# /root/reference/wan/configs/wan_t2v_14B.py:8-29
WAN_T2V_14B = WanConfig(
    model_type="t2v", dim=5120, ffn_dim=13824, num_heads=40, num_layers=40
)
WAN_I2V_14B = WanConfig(
    model_type="i2v", dim=5120, ffn_dim=13824, num_heads=40, num_layers=40,
    in_dim=36,
)


def sinusoidal_embedding_1d(dim: int, position: jax.Array) -> jax.Array:
    """``model.py:18-28``: [cos | sin] with 10000^(-i/half) frequencies."""
    half = dim // 2
    freqs = 10000.0 ** (
        -jnp.arange(half, dtype=jnp.float32) / half
    )
    angles = position.astype(jnp.float32)[..., None] * freqs
    return jnp.concatenate([jnp.cos(angles), jnp.sin(angles)], axis=-1)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _lin(key, din, dout, bias=True):
    p = {"kernel": jax.random.normal(key, (din, dout)) * (din**-0.5)}
    if bias:
        p["bias"] = jnp.zeros((dout,))
    return p


def _block_init(key, cfg: WanConfig, cross_attn_type: str, vace: bool = False):
    ks = iter(jax.random.split(key, 24))
    d = cfg.dim
    p = {
        "modulation": jax.random.normal(next(ks), (1, 6, d)) / d**0.5,
        "self_attn": {
            "q": _lin(next(ks), d, d), "k": _lin(next(ks), d, d),
            "v": _lin(next(ks), d, d), "o": _lin(next(ks), d, d),
            "norm_q": {"weight": jnp.ones((d,))},
            "norm_k": {"weight": jnp.ones((d,))},
        },
        "cross_attn": {
            "q": _lin(next(ks), d, d), "k": _lin(next(ks), d, d),
            "v": _lin(next(ks), d, d), "o": _lin(next(ks), d, d),
            "norm_q": {"weight": jnp.ones((d,))},
            "norm_k": {"weight": jnp.ones((d,))},
        },
        "ffn": {
            "fc1": _lin(next(ks), d, cfg.ffn_dim),
            "fc2": _lin(next(ks), cfg.ffn_dim, d),
        },
    }
    if cfg.cross_attn_norm:
        p["norm3"] = {"weight": jnp.ones((d,)), "bias": jnp.zeros((d,))}
    if cross_attn_type == "i2v_cross_attn":
        p["cross_attn"]["k_img"] = _lin(next(ks), d, d)
        p["cross_attn"]["v_img"] = _lin(next(ks), d, d)
        p["cross_attn"]["norm_k_img"] = {"weight": jnp.ones((d,))}
    if cfg.recammaster:
        p["cam_encoder"] = _lin(next(ks), 12, d)
        p["projector"] = {
            "kernel": jnp.eye(d), "bias": jnp.zeros((d,)),
        }
    if vace:
        p["after_proj"] = {
            "kernel": jnp.zeros((d, d)), "bias": jnp.zeros((d,))
        }
    return p


def init_params(key: jax.Array, cfg: WanConfig) -> dict:
    ks = iter(jax.random.split(key, 32))
    d = cfg.dim
    cross_type = (
        "i2v_cross_attn" if cfg.model_type == "i2v" else "t2v_cross_attn"
    )
    pt, ph, pw = cfg.patch_size

    block_keys = jax.random.split(next(ks), cfg.num_layers)
    blocks = [
        _block_init(block_keys[i], cfg, cross_type)
        for i in range(cfg.num_layers)
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    params = {
        "patch_embedding": {
            "kernel": jax.random.normal(
                next(ks), (pt, ph, pw, cfg.in_dim, d)
            ) * (pt * ph * pw * cfg.in_dim) ** -0.5,
            "bias": jnp.zeros((d,)),
        },
        "text_embedding": {
            "fc1": _lin(next(ks), cfg.text_dim, d),
            "fc2": _lin(next(ks), d, d),
        },
        "time_embedding": {
            "fc1": _lin(next(ks), cfg.freq_dim, d),
            "fc2": _lin(next(ks), d, d),
        },
        "time_projection": _lin(next(ks), d, 6 * d),
        "blocks": stacked,
        "head": {
            "modulation": jax.random.normal(next(ks), (1, 2, d)) / d**0.5,
            "head": _lin(
                next(ks), d, math.prod(cfg.patch_size) * cfg.out_dim
            ),
        },
    }
    if cfg.model_type == "i2v":
        params["img_emb"] = {
            "norm_in": {"weight": jnp.ones((1280,)), "bias": jnp.zeros((1280,))},
            "fc1": _lin(next(ks), 1280, 1280),
            "fc2": _lin(next(ks), 1280, d),
            "norm_out": {"weight": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        }
    if cfg.inject_sample_info:
        params["fps_embedding"] = jax.random.normal(next(ks), (2, d)) * 0.02
        params["fps_projection"] = {
            "fc1": _lin(next(ks), d, d),
            "fc2": _lin(next(ks), d, 6 * d),
        }
    if cfg.vace_layers is not None:
        vace_keys = jax.random.split(next(ks), len(cfg.vace_layers))
        vace_blocks = [
            _block_init(vace_keys[i], cfg, "t2v_cross_attn", vace=True)
            for i in range(len(cfg.vace_layers))
        ]
        vace_blocks[0]["before_proj"] = {
            "kernel": jnp.zeros((d, d)), "bias": jnp.zeros((d,))
        }
        params["vace_blocks"] = vace_blocks
        vin = cfg.vace_in_dim or cfg.in_dim
        params["vace_patch_embedding"] = {
            "kernel": jax.random.normal(next(ks), (pt, ph, pw, vin, d))
            * (pt * ph * pw * vin) ** -0.5,
            "bias": jnp.zeros((d,)),
        }
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _apply(p, x):
    # single source of truth for the quantization-tier dispatch
    from ...ops.quant import maybe_quantized_matmul

    return maybe_quantized_matmul(p, x)


def patch_embed(p, cfg: WanConfig, video: jax.Array) -> tuple[jax.Array, tuple]:
    """video [B, F, H, W, C] -> tokens [B, L, D], grid (F, H/ph, W/pw)."""
    y = jax.lax.conv_general_dilated(
        video, p["kernel"].astype(video.dtype),
        window_strides=cfg.patch_size, padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    ).astype(video.dtype) + p["bias"].astype(video.dtype)
    b, f, h, w, d = y.shape
    return y.reshape(b, f * h * w, d), (f, h, w)


def unpatchify(x: jax.Array, grid: tuple, cfg: WanConfig) -> jax.Array:
    """tokens [B, L, out*prod(patch)] -> video [B, F*pt, H*ph, W*pw, out]."""
    f, h, w = grid
    pt, ph, pw = cfg.patch_size
    return rearrange(
        x, "b (f h w) (p q r c) -> b (f p) (h q) (w r) c",
        f=f, h=h, w=w, p=pt, q=ph, r=pw, c=cfg.out_dim,
    )


def _mod(x, e_shift, e_scale):
    """x [B, L, D]; e_* [B, G, D]: modulate per token group."""
    b, l, d = x.shape
    g = e_shift.shape[1]
    if g == 1:
        return x * (1 + e_scale) + e_shift
    xg = x.reshape(b, g, l // g, d)
    out = xg * (1 + e_scale[:, :, None]) + e_shift[:, :, None]
    return out.reshape(b, l, d)


def _gate(x, y, e_gate):
    b, l, d = x.shape
    g = e_gate.shape[1]
    if g == 1:
        return x + y * e_gate
    xg = x.reshape(b, g, l // g, d)
    yg = y.reshape(b, g, l // g, d)
    return (xg + yg * e_gate[:, :, None]).reshape(b, l, d)


def _self_attention(p, cfg, x, freqs, attn_mode):
    b, s, d = x.shape
    n, hd = cfg.num_heads, cfg.head_dim
    q = _apply(p["q"], x)
    k = _apply(p["k"], x)
    v = _apply(p["v"], x)
    if cfg.qk_norm:
        q = rms_norm(q, p["norm_q"]["weight"], eps=cfg.eps)
        k = rms_norm(k, p["norm_k"]["weight"], eps=cfg.eps)
    q = q.reshape(b, s, n, hd)
    k = k.reshape(b, s, n, hd)
    v = v.reshape(b, s, n, hd)
    cos, sin = freqs  # [L, hd] fp32 — or [L, hd/2] half layout (rope-heads)
    if cos.shape[-1] * 2 == hd:
        # opt-in rope-on-heads (LTXV_TPU_ROPE_HEADS=1, tables converted
        # to half layout once in forward()): the rotation writes q/k
        # directly in [B, N, S, hd], fusing the head relayout into the
        # RoPE pass instead of paying it as a separate HBM round-trip
        qh = apply_rotary_emb_shared_heads(
            q, cos[None, :, None, :], sin[None, :, None, :]
        )
        kh = apply_rotary_emb_shared_heads(
            k, cos[None, :, None, :], sin[None, :, None, :]
        )
    else:
        q = apply_rotary_emb(q, cos[None, :, None, :], sin[None, :, None, :])
        k = apply_rotary_emb(k, cos[None, :, None, :], sin[None, :, None, :])
        qh = q.transpose(0, 2, 1, 3)
        kh = k.transpose(0, 2, 1, 3)
    # qk-normed logits stay within the configured bound (see config)
    sb = cfg.attention_score_bound if cfg.qk_norm else None
    base_mode, sp_axis = parse_sp(attn_mode)
    vh = v.transpose(0, 2, 1, 3)
    if sp_axis is not None:
        # USP: tokens are sequence-sharded over `sp_axis` (caller runs
        # inside shard_map — parallel/usp.py); RoPE above already used the
        # per-shard slice of the GLOBAL frequency table
        from ...parallel.ulysses import ulysses_attention

        out = ulysses_attention(
            qh, kh, vh, axis_name=sp_axis, attn_mode=base_mode,
            score_bound=sb,
        )
    else:
        out = attention(qh, kh, vh, mode=base_mode, score_bound=sb)
    out = out.transpose(0, 2, 1, 3).reshape(b, s, d)
    return _apply(p["o"], out)


def _cross_attention(p, cfg, x, context, context_mask, attn_mode,
                     img_context=None):
    # under USP, sequence-sharded q rows against replicated context need
    # no collective — run the local kernel
    attn_mode, _ = parse_sp(attn_mode)
    b, s, d = x.shape
    n, hd = cfg.num_heads, cfg.head_dim
    q = _apply(p["q"], x)
    if cfg.qk_norm:
        q = rms_norm(q, p["norm_q"]["weight"], eps=cfg.eps)
    qh = q.reshape(b, s, n, hd).transpose(0, 2, 1, 3)

    k = _apply(p["k"], context)
    if cfg.qk_norm:
        k = rms_norm(k, p["norm_k"]["weight"], eps=cfg.eps)
    v = _apply(p["v"], context)
    sc = context.shape[1]
    out = attention(
        qh,
        k.reshape(b, sc, n, hd).transpose(0, 2, 1, 3),
        v.reshape(b, sc, n, hd).transpose(0, 2, 1, 3),
        jnp.ones((b, s), jnp.int32),
        context_mask.astype(jnp.int32),
        mode=attn_mode,
        score_bound=cfg.attention_score_bound if cfg.qk_norm else None,
    )
    if img_context is not None:
        k_img = _apply(p["k_img"], img_context)
        k_img = rms_norm(k_img, p["norm_k_img"]["weight"], eps=cfg.eps)
        v_img = _apply(p["v_img"], img_context)
        si = img_context.shape[1]
        out = out + attention(
            qh,
            k_img.reshape(b, si, n, hd).transpose(0, 2, 1, 3),
            v_img.reshape(b, si, n, hd).transpose(0, 2, 1, 3),
            mode=attn_mode,
            score_bound=cfg.attention_score_bound if cfg.qk_norm else None,
        )
    out = out.transpose(0, 2, 1, 3).reshape(b, s, d)
    return _apply(p["o"], out)


def _ffn(cfg: WanConfig, p, x):
    """FFN, optionally token-chunked (``cfg.ffn_chunks``) to bound the
    ffn_dim-wide intermediate; the enabler for 14B dims on one chip."""
    def part(c):
        h = _apply(p["fc1"], c)
        h = jax.nn.gelu(h, approximate=True)
        return _apply(p["fc2"], h)

    if cfg.ffn_chunks <= 1:
        return part(x)
    s = x.shape[1]
    n = cfg.ffn_chunks
    pad = (-s) % n
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0))) if pad else x
    out = jnp.concatenate(
        [part(c) for c in jnp.split(xp, n, axis=1)], axis=1
    )
    return out[:, :s] if pad else out


def block_forward(
    p: dict,
    cfg: WanConfig,
    x: jax.Array,                 # [B, L, D]
    e0: jax.Array,                # [B, G, 6, D] fp32 modulation table
    freqs: tuple,                 # (cos, sin) [L, head_dim]
    context: jax.Array,           # [B, Sc, D]
    context_mask: jax.Array,      # [B, Sc]
    img_context: Optional[jax.Array] = None,
    keep: Optional[jax.Array] = None,   # [B] 1=run block, 0=skip (SLG)
    cam_emb: Optional[jax.Array] = None,  # [B, L, D] precomputed cam tokens
    attn_mode: str = "auto",
) -> jax.Array:
    mod = p["modulation"].astype(jnp.float32)  # [1, 6, D]
    e = mod[:, None] + e0  # [B, G, 6, D]
    e = [e[:, :, i].astype(x.dtype) for i in range(6)]

    original = x
    h = layer_norm(x, eps=cfg.eps)
    h = _mod(h, e[0], e[1])
    if cam_emb is not None and "cam_encoder" in p:
        h = h + cam_emb
    y = _self_attention(p["self_attn"], cfg, h, freqs, attn_mode)
    if cam_emb is not None and "projector" in p:
        # the reference applies the ReCamMaster projector only when
        # camera poses are given (``model.py:454-455``) — a trained
        # projector must not touch plain t2v runs
        y = _apply(p["projector"], y)
    x = _gate(x, y, e[2])

    if "norm3" in p:
        h = layer_norm(x, p["norm3"]["weight"], p["norm3"]["bias"], eps=cfg.eps)
    else:
        h = x
    x = x + _cross_attention(
        p["cross_attn"], cfg, h, context, context_mask, attn_mode, img_context
    )

    h = layer_norm(x, eps=cfg.eps)
    h = _mod(h, e[3], e[4])
    h = _ffn(cfg, p["ffn"], h)
    x = _gate(x, h, e[5])

    if keep is not None:
        m = keep.astype(x.dtype)[:, None, None]
        x = x * m + original * (1 - m)
    return x


def time_modulation(params, cfg: WanConfig, t: jax.Array):
    """t [B] or [B, G] -> (e [B*G, D], e0 [B, G, 6, D]) fp32."""
    tb = jnp.asarray(t)
    if tb.ndim == 1:
        tb = tb[:, None]
    b, g = tb.shape
    emb = sinusoidal_embedding_1d(cfg.freq_dim, tb.reshape(-1))
    e = _apply(params["time_embedding"]["fc1"], emb)
    e = jax.nn.silu(e)
    e = _apply(params["time_embedding"]["fc2"], e)  # [B*G, D]
    e0 = _apply(params["time_projection"], jax.nn.silu(e))
    e0 = e0.reshape(b, g, 6, cfg.dim).astype(jnp.float32)
    return e.reshape(b, g, cfg.dim).astype(jnp.float32), e0


def embed_text(params, cfg: WanConfig, text_embeds: jax.Array) -> jax.Array:
    """UMT5 embeddings [B, text_len, text_dim] (zero-padded) -> [B, text_len, D]."""
    h = _apply(params["text_embedding"]["fc1"], text_embeds)
    h = jax.nn.gelu(h, approximate=True)
    return _apply(params["text_embedding"]["fc2"], h)


def embed_clip(params, clip_features: jax.Array) -> jax.Array:
    """MLPProj (``model.py:576-588``): CLIP features [B, 257, 1280] -> [B, 257, D]."""
    p = params["img_emb"]
    h = layer_norm(clip_features, p["norm_in"]["weight"], p["norm_in"]["bias"],
                   eps=1e-5)
    h = _apply(p["fc1"], h)
    h = jax.nn.gelu(h, approximate=False)
    h = _apply(p["fc2"], h)
    return layer_norm(h, p["norm_out"]["weight"], p["norm_out"]["bias"],
                      eps=1e-5)


def forward(
    params: dict,
    cfg: WanConfig,
    x: jax.Array,                   # [B, F, H, W, C_in] latent video (+ y concat done by caller for i2v)
    t: jax.Array,                   # [B] or [B, latent_frames] (df mode)
    context: jax.Array,             # [B, text_len, text_dim] UMT5 embeds
    context_mask: jax.Array,        # [B, text_len]
    freqs: tuple,                   # (cos, sin) [L, head_dim] from wan_rope_freqs
    clip_features: Optional[jax.Array] = None,  # [B, 257, 1280] (i2v)
    vace_context: Optional[jax.Array] = None,   # [B, F, H, W, vace_in]
    vace_scale: float = 1.0,
    slg_keep: Optional[jax.Array] = None,       # [num_layers, B] 1=run
    cam_emb: Optional[jax.Array] = None,        # [B, F', 12] camera pose
    fps_idx: Optional[int] = None,
    previous_residual: Optional[jax.Array] = None,
    compute: bool | jax.Array = True,
    attn_mode: str = "auto",
) -> tuple[jax.Array, jax.Array]:
    """One denoiser evaluation. Returns (velocity [B, F, H, W, C_out],
    residual [B, L, D]-like for TeaCache reuse — here the token-space
    delta x_out_tokens - x_in_tokens).

    When ``compute`` is a traced boolean and ``previous_residual`` given,
    the block stack is skipped via ``lax.cond`` and the residual reused
    (TeaCache runtime skip, ``model.py:1030-1057``).
    """
    tokens, grid = patch_embed(params["patch_embedding"], cfg, x)
    b, l, d = tokens.shape

    if (rope_heads_enabled(default=True)
            and freqs[0].shape[-1] == cfg.head_dim):
        # one conversion per forward, outside the block scan; the blocks
        # detect the half-width tables and take the fused rope-on-heads
        # path (see _self_attention)
        freqs = (full_to_half(freqs[0]), full_to_half(freqs[1]))

    e, e0 = time_modulation(params, cfg, t)  # [B,G,D], [B,G,6,D]

    if cfg.inject_sample_info and fps_idx is not None:
        fps_emb = params["fps_embedding"][fps_idx].astype(jnp.float32)
        fp = _apply(params["fps_projection"]["fc1"], fps_emb)
        fp = jax.nn.silu(fp)
        fp = _apply(params["fps_projection"]["fc2"], fp)
        e0 = e0 + fp.reshape(1, 1, 6, cfg.dim).astype(jnp.float32)

    ctx = embed_text(params, cfg, context.astype(tokens.dtype))
    img_ctx = None
    if clip_features is not None and "img_emb" in params:
        img_ctx = embed_clip(params, clip_features.astype(tokens.dtype))

    cam_tokens = None
    if cam_emb is not None:
        # ReCamMaster: raw [B, F', 12] pose features; each block encodes
        # them with its OWN cam_encoder inside the loop
        cam_tokens = cam_emb

    def run_blocks(tokens):
        if cfg.vace_layers is not None and vace_context is not None:
            return _run_blocks_vace(
                params, cfg, tokens, e0, freqs, ctx, context_mask,
                img_ctx, slg_keep, vace_context, vace_scale, attn_mode,
                grid, cam_tokens,
            )
        skip = (
            slg_keep if slg_keep is not None
            else jnp.ones((cfg.num_layers, b), jnp.float32)
        )

        def body(xx, layer):
            lp, keep = layer
            cam = _encode_cam(lp, cfg, cam_tokens, grid, b, l, xx.dtype)
            xx = block_forward(
                lp, cfg, xx, e0, freqs, ctx, context_mask, img_ctx,
                keep, cam, attn_mode,
            )
            return xx, None

        out, _ = jax.lax.scan(body, tokens, (params["blocks"], skip))
        return out

    if isinstance(compute, bool):
        if compute:
            out_tokens = run_blocks(tokens)
            residual = out_tokens - tokens
        else:
            assert previous_residual is not None
            out_tokens = tokens + previous_residual
            residual = previous_residual
    else:
        prev = (
            previous_residual if previous_residual is not None
            else jnp.zeros_like(tokens)
        )
        out_tokens, residual = jax.lax.cond(
            compute,
            # both branches must agree in dtype even when the residual
            # carry is fp32 and the tokens bf16 (cond type-checks the
            # branch outputs; the LTX twin casts identically)
            lambda tk: (lambda o: (o, (o - tk).astype(prev.dtype)))(
                run_blocks(tk)
            ),
            lambda tk: ((tk + prev).astype(tk.dtype), prev),
            tokens,
        )

    # head: modulated projection (e per frame group)
    hm = params["head"]["modulation"].astype(jnp.float32)  # [1, 2, D]
    he = hm[:, None] + e[:, :, None]  # [B, G, 2, D]
    shift = he[:, :, 0].astype(out_tokens.dtype)
    scale = he[:, :, 1].astype(out_tokens.dtype)
    y = layer_norm(out_tokens, eps=cfg.eps)
    y = _mod(y, shift, scale)
    y = _apply(params["head"]["head"], y)
    return unpatchify(y, grid, cfg), residual


def _encode_cam(lp, cfg, cam_tokens, grid, b, l, dtype):
    """ReCamMaster per-block camera tokens: encode the raw pose features
    with THIS block's cam_encoder, tile the pose rows (torch
    ``.repeat(1, 2, 1)`` tiles — an interleaving repeat would hand every
    frame the wrong pose, ``model.py:443-446``), broadcast over (H, W).

    When ``cam_tokens`` already carries one row per latent frame
    (``expand_cam_to_frames`` — the sequence-parallel path, where each
    shard must see its GLOBAL frames' poses), the tile is skipped."""
    if cam_tokens is None or "cam_encoder" not in lp:
        return None
    f, h, w = grid
    ce = _apply(lp["cam_encoder"], cam_tokens.astype(dtype))
    if ce.shape[1] < f:
        ce = jnp.tile(ce, (1, 2, 1))  # [B, 2F', D]
    ce = jnp.broadcast_to(
        ce[:, :f, None, None, :], (b, f, h, w, cfg.dim)
    ).reshape(b, -1, cfg.dim)[:, :l]
    return ce


def expand_cam_to_frames(cam_emb: jax.Array, num_frames: int) -> jax.Array:
    """[B, F', 12] pose rows -> frame-aligned [B, F, 12], reproducing the
    tile-then-slice frame->pose mapping of ``_encode_cam`` (frame f gets
    row f, wrapping past F'). Frame-aligned rows shard with their frames
    under USP, where each shard's local tile-and-slice would otherwise
    hand shard k>0 the poses of shard 0's frames."""
    tiled = jnp.concatenate([cam_emb, cam_emb], axis=1)
    if tiled.shape[1] < num_frames:
        raise ValueError(
            f"cam_emb rows ({cam_emb.shape[1]}) cover at most "
            f"2x rows; need {num_frames} frames"
        )
    return tiled[:, :num_frames]


def _run_blocks_vace(
    params, cfg, tokens, e0, freqs, ctx, context_mask, img_ctx,
    slg_keep, vace_context, vace_scale, attn_mode, grid, cam_tokens,
):
    """Unrolled layer loop with interleaved VACE hint blocks."""
    b, l = tokens.shape[0], tokens.shape[1]
    vace_tokens, _ = patch_embed(
        params["vace_patch_embedding"], cfg, vace_context
    )
    mapping = {
        layer: i for i, layer in enumerate(cfg.vace_layers)
    }
    c = None
    x = tokens
    for i in range(cfg.num_layers):
        lp = jax.tree.map(lambda a: a[i], params["blocks"])
        keep = None if slg_keep is None else slg_keep[i]
        cam = _encode_cam(lp, cfg, cam_tokens, grid, b, l, x.dtype)
        if i in mapping:
            vp = params["vace_blocks"][mapping[i]]
            if mapping[i] == 0:
                c = _apply(vp["before_proj"], vace_tokens) + x
            c = block_forward(
                vp, cfg, c, e0, freqs, ctx, context_mask, None,
                None, None, attn_mode,
            )
            hint = _apply(vp["after_proj"], c)
            x = block_forward(
                lp, cfg, x, e0, freqs, ctx, context_mask, img_ctx,
                keep, cam, attn_mode,
            )
            h_add = vace_scale * hint
            if keep is not None:
                # SLG-skipped streams skip the WHOLE block in the
                # reference — hint included (``model.py:1077-1083``)
                h_add = h_add * keep.astype(x.dtype)[:, None, None]
            x = x + h_add
        else:
            x = block_forward(
                lp, cfg, x, e0, freqs, ctx, context_mask, img_ctx,
                keep, cam, attn_mode,
            )
    return x
