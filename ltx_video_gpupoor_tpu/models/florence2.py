"""Florence-2 (DaViT vision backbone + BART seq2seq LM), TPU-native.

Parity target: the LTX prompt enhancer's image captioner
(``/root/reference/ltx_video/utils/prompt_enhance_utils.py`` drives
``MiaoshouAI/Florence-2-large-PromptGen-v2.0`` through host torch
``AutoModelForCausalLM.generate``). Here the whole captioner is JAX:
the 4-stage DaViT tower (conv embeddings, alternating window-spatial
and grouped-channel attention blocks), the multimodal projector
(learned 2D + cosine temporal position embeddings), and a BART
encoder-decoder with one-program greedy decoding. Numerics are pinned
against torch ``transformers``' Florence2 classes in
``tests/test_florence2_golden.py``.

TPU-first notes:
- depthwise 3x3 convs lower via ``lax.conv_general_dilated`` with
  ``feature_group_count`` (XLA maps these to the VPU/MXU well at the
  DaViT channel counts);
- each DaViT stage's identical block pairs are stacked and scanned —
  one compilation per stage, not per block;
- window attention pads once per stage to static window grids (no
  ragged control flow inside jit);
- the seq2seq greedy decode is a ``lax.scan`` over a static-size
  decoder KV cache with encoder cross-K/V computed once (the encoder
  pass and every decode step stay on-device).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class FlorenceVisionConfig:
    in_channels: int = 3
    depths: tuple = (1, 1, 9, 1)
    patch_size: tuple = (7, 3, 3, 3)
    patch_stride: tuple = (4, 2, 2, 2)
    patch_padding: tuple = (3, 1, 1, 1)
    patch_prenorm: tuple = (False, True, True, True)
    embed_dim: tuple = (128, 256, 512, 1024)
    num_heads: tuple = (4, 8, 16, 32)
    num_groups: tuple = (4, 8, 16, 32)
    window_size: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    projection_dim: int = 1024
    max_temporal_embeddings: int = 100
    max_position_embeddings: int = 50


@dataclasses.dataclass(frozen=True)
class FlorenceTextConfig:
    """BART (the Florence-2 language model)."""
    vocab_size: int = 51289
    d_model: int = 1024
    encoder_layers: int = 12
    decoder_layers: int = 12
    num_heads: int = 16
    ffn_dim: int = 4096
    max_position_embeddings: int = 1024
    scale_embedding: bool = False
    pad_token_id: int = 1
    bos_token_id: int = 0
    eos_token_id: int = 2
    decoder_start_token_id: int = 2
    forced_bos_token_id: Optional[int] = 0
    forced_eos_token_id: Optional[int] = 2


@dataclasses.dataclass(frozen=True)
class FlorenceConfig:
    vision: FlorenceVisionConfig
    text: FlorenceTextConfig
    image_token_id: int = 51289


def config_from_hf(hf: dict) -> FlorenceConfig:
    v = hf.get("vision_config", {})
    t = hf.get("text_config", {})
    vision = FlorenceVisionConfig(
        in_channels=v.get("in_channels", 3),
        depths=tuple(v.get("depths", (1, 1, 9, 1))),
        patch_size=tuple(v.get("patch_size", (7, 3, 3, 3))),
        patch_stride=tuple(v.get("patch_stride", (4, 2, 2, 2))),
        patch_padding=tuple(v.get("patch_padding", (3, 1, 1, 1))),
        patch_prenorm=tuple(v.get("patch_prenorm",
                                  (False, True, True, True))),
        embed_dim=tuple(v.get("embed_dim", (128, 256, 512, 1024))),
        num_heads=tuple(v.get("num_heads", (4, 8, 16, 32))),
        num_groups=tuple(v.get("num_groups", (4, 8, 16, 32))),
        window_size=v.get("window_size", 12),
        mlp_ratio=v.get("mlp_ratio", 4.0),
        qkv_bias=v.get("qkv_bias", True),
        projection_dim=v.get("projection_dim", 1024),
        max_temporal_embeddings=v.get("max_temporal_embeddings", 100),
        max_position_embeddings=v.get("max_position_embeddings", 50),
    )
    text = FlorenceTextConfig(
        vocab_size=t.get("vocab_size", 51289),
        d_model=t.get("d_model", 1024),
        encoder_layers=t.get("encoder_layers", 12),
        decoder_layers=t.get("decoder_layers", 12),
        num_heads=t.get("encoder_attention_heads", 16),
        ffn_dim=t.get("encoder_ffn_dim", 4096),
        max_position_embeddings=t.get("max_position_embeddings", 1024),
        scale_embedding=t.get("scale_embedding", False),
        pad_token_id=t.get("pad_token_id", 1),
        bos_token_id=t.get("bos_token_id", 0),
        eos_token_id=t.get("eos_token_id", 2),
        decoder_start_token_id=t.get("decoder_start_token_id", 2),
        forced_bos_token_id=t.get("forced_bos_token_id", 0),
        forced_eos_token_id=t.get("forced_eos_token_id", 2),
    )
    return FlorenceConfig(vision=vision, text=text,
                          image_token_id=hf.get("image_token_id", 51289))


# ---------------------------------------------------------------------------
# small shared pieces
# ---------------------------------------------------------------------------

def _ln(p, x, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return ((x - mu) * jax.lax.rsqrt(var + eps)) * p["weight"] + p["bias"]


def _lin(p, x):
    y = x @ p["kernel"]
    if "bias" in p:
        y = y + p["bias"]
    return y


def _mha(q, k, v, n_heads, bias=None, scale=None):
    """[B, S, D] multi-head attention (fp32 softmax)."""
    b, sq, d = q.shape
    sk = k.shape[1]
    hd = d // n_heads
    q = q.reshape(b, sq, n_heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, sk, n_heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, sk, n_heads, hd).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (
        hd**-0.5 if scale is None else scale)
    if bias is not None:
        scores = scores + bias
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1) \
        .astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    return out.transpose(0, 2, 1, 3).reshape(b, sq, d)


# ---------------------------------------------------------------------------
# DaViT vision backbone
# ---------------------------------------------------------------------------

def vision_init_params(key: jax.Array, cfg: FlorenceVisionConfig) -> dict:
    ks = iter(jax.random.split(key, 2 * len(cfg.depths) + 2))

    def lin(k, din, dout, bias=True):
        p = {"kernel": jax.random.normal(k, (din, dout)) * 0.02}
        if bias:
            p["bias"] = jnp.zeros((dout,))
        return p

    def ln(d):
        return {"weight": jnp.ones((d,)), "bias": jnp.zeros((d,))}

    stages = []
    for si, depth in enumerate(cfg.depths):
        d = cfg.embed_dim[si]
        din = cfg.in_channels if si == 0 else cfg.embed_dim[si - 1]
        ps = cfg.patch_size[si]
        conv_key, blocks_key = jax.random.split(next(ks))
        conv = {
            "conv": {
                "kernel": jax.random.normal(
                    conv_key, (ps, ps, din, d)) * 0.02,
                "bias": jnp.zeros((d,)),
            },
            "norm": ln(din if cfg.patch_prenorm[si] else d),
        }
        mlp_dim = int(d * cfg.mlp_ratio)

        def block(k, d=d, mlp_dim=mlp_dim):
            kk = iter(jax.random.split(k, 16))
            def half():
                return {
                    "conv": {"kernel": jax.random.normal(
                        next(kk), (3, 3, 1, d)) * 0.02,
                        "bias": jnp.zeros((d,))},
                    "norm1": ln(d),
                    "qkv": lin(next(kk), d, 3 * d, cfg.qkv_bias),
                    "proj": lin(next(kk), d, d),
                    "conv2": {"kernel": jax.random.normal(
                        next(kk), (3, 3, 1, d)) * 0.02,
                        "bias": jnp.zeros((d,))},
                    "norm2": ln(d),
                    "fc1": lin(next(kk), d, mlp_dim),
                    "fc2": lin(next(kk), mlp_dim, d),
                }
            return {"spatial": half(), "channel": half()}

        blocks = jax.vmap(block)(jax.random.split(blocks_key, depth))
        stages.append({"conv_embed": conv, "blocks": blocks})
    return {"stages": stages}


def _dw_conv3x3(p, x):
    """Depthwise 3x3 over [B, H, W, C]."""
    c = x.shape[-1]
    y = jax.lax.conv_general_dilated(
        x, p["kernel"], window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    return y + p["bias"]


def _window_attn(p, cfg, x, n_heads):
    """[B, H, W, C] window attention (DaViT spatial mixer)."""
    b, h, w, c = x.shape
    ws = cfg.window_size
    ph, pw = (-h) % ws, (-w) % ws
    xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hh, ww = h + ph, w + pw
    xw = (xp.reshape(b, hh // ws, ws, ww // ws, ws, c)
          .transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c))
    qkv = _lin(p["qkv"], xw)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    out = _mha(q, k, v, n_heads)
    out = _lin(p["proj"], out)
    out = (out.reshape(b, hh // ws, ww // ws, ws, ws, c)
           .transpose(0, 1, 3, 2, 4, 5).reshape(b, hh, ww, c))
    return out[:, :h, :w]


def _channel_attn(p, x, groups):
    """[B, N, C] grouped channel attention (transposed attention: the
    C/groups channel slots attend over each other with token-count
    scaling)."""
    b, n, c = x.shape
    qkv = _lin(p["qkv"], x).reshape(b, n, 3, groups, c // groups)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 3, 1) for i in range(3))
    # q/k/v: [B, groups, c/groups, N]; attention over the channel axis
    scores = jnp.einsum("bgcn,bgdn->bgcd", q, k) * n**-0.5
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1) \
        .astype(x.dtype)
    out = jnp.einsum("bgcd,bgdn->bgcn", probs, v)
    out = out.transpose(0, 3, 1, 2).reshape(b, n, c)
    return _lin(p["proj"], out)


def vision_forward(params: dict, cfg: FlorenceVisionConfig,
                   pixels: jax.Array) -> jax.Array:
    """[B, H, W, 3] -> [B, H', W', embed_dim[-1]] feature map. Compute
    dtype follows the checkpoint (bf16 serving, fp32 goldens)."""
    x = pixels.astype(
        params["stages"][0]["conv_embed"]["conv"]["kernel"].dtype)
    for si, stage in enumerate(params["stages"]):
        ce = stage["conv_embed"]
        if cfg.patch_prenorm[si]:
            x = _ln(ce["norm"], x)
        x = jax.lax.conv_general_dilated(
            x, ce["conv"]["kernel"],
            window_strides=(cfg.patch_stride[si],) * 2,
            padding=((cfg.patch_padding[si],) * 2,) * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + ce["conv"]["bias"]
        if not cfg.patch_prenorm[si]:
            x = _ln(ce["norm"], x)

        n_heads, groups = cfg.num_heads[si], cfg.num_groups[si]

        def body(x, p):
            b, h, w, c = x.shape
            # spatial half: dw-conv + window attention, dw-conv + FFN
            sp = p["spatial"]
            x = _dw_conv3x3(sp["conv"], x) + x
            x = x + _window_attn(sp, cfg,
                                 _ln(sp["norm1"], x), n_heads)
            x = _dw_conv3x3(sp["conv2"], x) + x
            h2 = _ln(sp["norm2"], x)
            x = x + _lin(sp["fc2"], jax.nn.gelu(
                _lin(sp["fc1"], h2), approximate=False))
            # channel half: dw-conv + channel attention, dw-conv + FFN
            chp = p["channel"]
            x = _dw_conv3x3(chp["conv"], x) + x
            flat = x.reshape(b, h * w, c)
            flat = flat + _channel_attn(
                chp, _ln(chp["norm1"], flat), groups)
            x = flat.reshape(b, h, w, c)
            x = _dw_conv3x3(chp["conv2"], x) + x
            flat = x.reshape(b, h * w, c)
            h2 = _ln(chp["norm2"], flat)
            flat = flat + _lin(chp["fc2"], jax.nn.gelu(
                _lin(chp["fc1"], h2), approximate=False))
            x = flat.reshape(b, h, w, c)
            return x, None

        x, _ = jax.lax.scan(body, x, stage["blocks"])
    return x


# ---------------------------------------------------------------------------
# Multimodal projector
# ---------------------------------------------------------------------------

def projector_init_params(key: jax.Array, cfg: FlorenceConfig) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    d = cfg.vision.embed_dim[-1]
    pd = cfg.vision.projection_dim
    return {
        "image_projection": {"kernel": jax.random.normal(k1, (d, pd)) * 0.02},
        "image_proj_norm": {"weight": jnp.ones((pd,)),
                            "bias": jnp.zeros((pd,))},
        "row_embeddings": jax.random.normal(
            k2, (cfg.vision.max_position_embeddings, d // 2)) * 0.02,
        "column_embeddings": jax.random.normal(
            k3, (cfg.vision.max_position_embeddings, d - d // 2)) * 0.02,
    }


def _cosine_1d(seq_len: int, dim: int) -> np.ndarray:
    half = dim // 2
    emb = np.exp(np.arange(half) * (-math.log(10000) / half))
    ang = np.arange(seq_len)[:, None] * emb[None]
    out = np.empty((seq_len, dim), np.float32)
    out[:, 0::2] = np.sin(ang)
    out[:, 1::2] = np.cos(ang)
    return out


def project_image_features(params: dict, cfg: FlorenceConfig,
                           feat: jax.Array) -> jax.Array:
    """[B, H', W', C] tower output -> [B, H'W'+1, projection_dim]
    (learned 2D positions, cosine temporal embed, spatial/temporal
    means, projection + LN) — transformers Florence2MultiModalProjector."""
    b, h, w, c = feat.shape
    pos = jnp.concatenate([
        jnp.tile(params["column_embeddings"][None, :w], (h, 1, 1)),
        jnp.tile(params["row_embeddings"][:h, None], (1, w, 1)),
    ], axis=-1)
    x = (feat + pos[None]).reshape(b, h * w, c)
    # one frame; cast: the fp32 table must not promote a bf16 path
    temporal = jnp.asarray(_cosine_1d(1, c), feat.dtype)
    x = x + temporal[None]
    # one temporal frame: spatial mean token + per-position tokens
    spatial_mean = jnp.mean(x, axis=1, keepdims=True)
    x = jnp.concatenate([spatial_mean, x], axis=1)
    x = x @ params["image_projection"]["kernel"]
    return _ln(params["image_proj_norm"], x)


# ---------------------------------------------------------------------------
# BART encoder-decoder
# ---------------------------------------------------------------------------

def text_init_params(key: jax.Array, cfg: FlorenceTextConfig) -> dict:
    ks = iter(jax.random.split(key, 8))
    d = cfg.d_model

    def lin(k, din, dout):
        return {"kernel": jax.random.normal(k, (din, dout)) * 0.02,
                "bias": jnp.zeros((dout,))}

    def ln():
        return {"weight": jnp.ones((d,)), "bias": jnp.zeros((d,))}

    def attn(k):
        kk = iter(jax.random.split(k, 4))
        return {n: lin(next(kk), d, d) for n in ("q", "k", "v", "o")}

    def enc_layer(k):
        kk = iter(jax.random.split(k, 4))
        return {
            "self_attn": attn(next(kk)),
            "self_attn_layer_norm": ln(),
            "fc1": lin(next(kk), d, cfg.ffn_dim),
            "fc2": lin(next(kk), cfg.ffn_dim, d),
            "final_layer_norm": ln(),
        }

    def dec_layer(k):
        kk = iter(jax.random.split(k, 6))
        p = enc_layer(next(kk))
        p["encoder_attn"] = attn(next(kk))
        p["encoder_attn_layer_norm"] = ln()
        return p

    return {
        "shared": jax.random.normal(next(ks), (cfg.vocab_size, d)) * 0.02,
        "encoder": {
            "embed_positions": jax.random.normal(
                next(ks), (cfg.max_position_embeddings + 2, d)) * 0.02,
            "layernorm_embedding": ln(),
            "layers": jax.vmap(enc_layer)(
                jax.random.split(next(ks), cfg.encoder_layers)),
        },
        "decoder": {
            "embed_positions": jax.random.normal(
                next(ks), (cfg.max_position_embeddings + 2, d)) * 0.02,
            "layernorm_embedding": ln(),
            "layers": jax.vmap(dec_layer)(
                jax.random.split(next(ks), cfg.decoder_layers)),
        },
        "final_logits_bias": jnp.zeros((cfg.vocab_size,)),
    }


def _bart_attn(p, xq, xkv, n_heads, bias=None):
    q = _lin(p["q"], xq) * (xq.shape[-1] // n_heads) ** -0.5
    k = _lin(p["k"], xkv)
    v = _lin(p["v"], xkv)
    return _lin(p["o"], _mha(q, k, v, n_heads, bias=bias, scale=1.0))


def encode(params: dict, cfg: FlorenceTextConfig, embeds: jax.Array,
           mask: jax.Array) -> jax.Array:
    """BART encoder over pre-built input embeddings [B, S, d]."""
    enc = params["encoder"]
    b, s, _ = embeds.shape
    scale = math.sqrt(cfg.d_model) if cfg.scale_embedding else 1.0
    x = embeds * scale + enc["embed_positions"][2:s + 2][None]
    x = _ln(enc["layernorm_embedding"], x)
    bias = jnp.where(mask[:, None, None, :] > 0, 0.0, -1e9) \
        .astype(jnp.float32)

    def body(x, p):
        h = _bart_attn(p["self_attn"], x, x, cfg.num_heads, bias)
        x = _ln(p["self_attn_layer_norm"], x + h)
        h = _lin(p["fc2"], jax.nn.gelu(_lin(p["fc1"], x),
                                       approximate=False))
        x = _ln(p["final_layer_norm"], x + h)
        return x, None

    x, _ = jax.lax.scan(body, x, enc["layers"])
    return x


def decode_full(params: dict, cfg: FlorenceTextConfig,
                dec_ids: jax.Array, enc_out: jax.Array,
                enc_mask: jax.Array) -> jax.Array:
    """Full-sequence (teacher-forced) decoder -> logits (golden-test
    surface)."""
    dec = params["decoder"]
    b, s = dec_ids.shape
    scale = math.sqrt(cfg.d_model) if cfg.scale_embedding else 1.0
    x = params["shared"][dec_ids] * scale \
        + dec["embed_positions"][2:s + 2][None]
    x = _ln(dec["layernorm_embedding"], x)
    causal = jnp.where(jnp.tril(jnp.ones((s, s), bool)), 0.0, -1e9) \
        .astype(jnp.float32)[None, None]
    xbias = jnp.where(enc_mask[:, None, None, :] > 0, 0.0, -1e9) \
        .astype(jnp.float32)

    def body(x, p):
        h = _bart_attn(p["self_attn"], x, x, cfg.num_heads, causal)
        x = _ln(p["self_attn_layer_norm"], x + h)
        h = _bart_attn(p["encoder_attn"], x, enc_out, cfg.num_heads, xbias)
        x = _ln(p["encoder_attn_layer_norm"], x + h)
        h = _lin(p["fc2"], jax.nn.gelu(_lin(p["fc1"], x),
                                       approximate=False))
        x = _ln(p["final_layer_norm"], x + h)
        return x, None

    x, _ = jax.lax.scan(body, x, dec["layers"])
    return x @ params["shared"].T + params["final_logits_bias"]


def build_encoder_embeds(params: dict, cfg: FlorenceConfig,
                         input_ids: jax.Array,
                         image_features: Optional[jax.Array]) -> jax.Array:
    """Token embeddings with image features scattered at the
    ``image_token_id`` placeholders (Florence2Model.get_placeholder_mask
    + masked_scatter)."""
    embeds = params["text"]["shared"][input_ids]
    if image_features is None:
        return embeds
    flat_ids = input_ids.reshape(-1)
    is_img = flat_ids == cfg.image_token_id
    order = jnp.cumsum(is_img) - 1
    feats = image_features.reshape(-1, image_features.shape[-1])
    gathered = feats[jnp.clip(order, 0, feats.shape[0] - 1)]
    out = jnp.where(is_img[:, None], gathered.astype(embeds.dtype),
                    embeds.reshape(-1, embeds.shape[-1]))
    return out.reshape(embeds.shape)


def forward(params: dict, cfg: FlorenceConfig, input_ids: jax.Array,
            pixels: Optional[jax.Array], dec_ids: jax.Array,
            mask: Optional[jax.Array] = None) -> jax.Array:
    """Full multimodal seq2seq forward -> decoder logits."""
    if mask is None:
        mask = jnp.ones(input_ids.shape, jnp.int32)
    feats = None
    if pixels is not None:
        tower = vision_forward(params["vision"], cfg.vision, pixels)
        feats = project_image_features(params["projector"], cfg, tower)
    embeds = build_encoder_embeds(params, cfg, input_ids, feats)
    enc_out = encode(params["text"], cfg.text, embeds, mask)
    return decode_full(params["text"], cfg.text, dec_ids, enc_out, mask)


def generate(params: dict, cfg: FlorenceConfig, input_ids: jax.Array,
             pixels: Optional[jax.Array], max_new_tokens: int,
             mask: Optional[jax.Array] = None) -> jax.Array:
    """Greedy seq2seq generation (the captioner's decode mode). Returns
    ``[B, max_new_tokens]`` starting with the forced BOS; rows repeat
    EOS after finishing. Decoder cross-K/V are computed once per layer;
    each step is one scanned cache update."""
    t = cfg.text
    if mask is None:
        mask = jnp.ones(input_ids.shape, jnp.int32)
    feats = None
    if pixels is not None:
        tower = vision_forward(params["vision"], cfg.vision, pixels)
        feats = project_image_features(params["projector"], cfg, tower)
    embeds = build_encoder_embeds(params, cfg, input_ids, feats)
    enc_out = encode(t_params := params["text"], t, embeds, mask)

    b = input_ids.shape[0]
    d, nh = t.d_model, t.num_heads
    hd = d // nh
    max_len = max_new_tokens + 1
    dec = t_params["decoder"]
    scale = math.sqrt(d) if t.scale_embedding else 1.0
    xbias = jnp.where(mask[:, None, None, :] > 0, 0.0, -1e9) \
        .astype(jnp.float32)

    # per-layer cross K/V, computed once
    def cross_kv(p):
        return (_lin(p["encoder_attn"]["k"], enc_out),
                _lin(p["encoder_attn"]["v"], enc_out))

    ck, cv = jax.vmap(cross_kv, in_axes=(0,))(dec["layers"])

    cache_k = jnp.zeros((t.decoder_layers, b, max_len, d),
                        t_params["shared"].dtype)
    cache_v = jnp.zeros_like(cache_k)

    def step(carry, _):
        tok, pos, cache_k, cache_v, done = carry
        x = t_params["shared"][tok][:, None] * scale \
            + dec["embed_positions"][pos + 2][None, None]
        x = _ln(dec["layernorm_embedding"], x)
        kpos = jnp.arange(max_len)
        sbias = jnp.where((kpos <= pos)[None, None, None, :], 0.0, -1e9)

        def layer(x, inp):
            p, lck, lcv, ck_c, cv_c = inp
            q = _lin(p["self_attn"]["q"], x) * hd**-0.5
            k1 = _lin(p["self_attn"]["k"], x)
            v1 = _lin(p["self_attn"]["v"], x)
            ck_c = jax.lax.dynamic_update_slice_in_dim(ck_c, k1, pos, 1)
            cv_c = jax.lax.dynamic_update_slice_in_dim(cv_c, v1, pos, 1)
            h = _lin(p["self_attn"]["o"],
                     _mha(q, ck_c, cv_c, nh, bias=sbias, scale=1.0))
            x = _ln(p["self_attn_layer_norm"], x + h)
            q = _lin(p["encoder_attn"]["q"], x) * hd**-0.5
            h = _lin(p["encoder_attn"]["o"],
                     _mha(q, lck, lcv, nh, bias=xbias, scale=1.0))
            x = _ln(p["encoder_attn_layer_norm"], x + h)
            h = _lin(p["fc2"], jax.nn.gelu(_lin(p["fc1"], x),
                                           approximate=False))
            x = _ln(p["final_layer_norm"], x + h)
            return x, (ck_c, cv_c)

        x, (cache_k, cache_v) = jax.lax.scan(
            layer, x, (dec["layers"], ck, cv, cache_k, cache_v))
        logits = x[:, 0] @ t_params["shared"].T \
            + t_params["final_logits_bias"]
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        # forced BOS on the first generated token (BART convention)
        if t.forced_bos_token_id is not None:
            nxt = jnp.where(pos == 0, jnp.int32(t.forced_bos_token_id),
                            nxt)
        nxt = jnp.where(done, jnp.int32(t.eos_token_id), nxt)
        done = done | (nxt == t.eos_token_id)
        return (nxt, pos + 1, cache_k, cache_v, done), nxt

    tok0 = jnp.full((b,), t.decoder_start_token_id, jnp.int32)
    done0 = jnp.zeros((b,), bool)
    _, toks = jax.lax.scan(step, (tok0, 0, cache_k, cache_v, done0),
                           None, length=max_new_tokens)
    return toks.T


# ---------------------------------------------------------------------------
# HF checkpoint conversion
# ---------------------------------------------------------------------------

def convert_hf_state_dict(sd: dict, cfg: FlorenceConfig) -> dict:
    """Published Florence-2 safetensors naming -> param tree."""
    def g(name):
        return jnp.asarray(np.asarray(sd[name]))

    # ---- vision tower ----
    stages = []
    for si, depth in enumerate(cfg.vision.depths):
        cpre = f"model.vision_tower.convs.{si}."
        conv = {
            "conv": {"kernel": g(cpre + "conv.weight")
                     .transpose(2, 3, 1, 0),
                     "bias": g(cpre + "conv.bias")},
            "norm": {"weight": g(cpre + "norm.weight"),
                     "bias": g(cpre + "norm.bias")},
        }
        blocks = []
        for bi in range(depth):
            bpre = f"model.vision_tower.blocks.{si}.{bi}."

            def half(name, attn_name):
                hp = bpre + name + "."
                return {
                    "conv": {"kernel": g(hp + "conv1.weight")
                             .transpose(2, 3, 1, 0),
                             "bias": g(hp + "conv1.bias")},
                    "norm1": {"weight": g(hp + "norm1.weight"),
                              "bias": g(hp + "norm1.bias")},
                    "qkv": {"kernel": g(hp + attn_name + ".qkv.weight").T,
                            "bias": g(hp + attn_name + ".qkv.bias")},
                    "proj": {"kernel": g(hp + attn_name + ".proj.weight").T,
                             "bias": g(hp + attn_name + ".proj.bias")},
                    "conv2": {"kernel": g(hp + "conv2.weight")
                              .transpose(2, 3, 1, 0),
                              "bias": g(hp + "conv2.bias")},
                    "norm2": {"weight": g(hp + "norm2.weight"),
                              "bias": g(hp + "norm2.bias")},
                    "fc1": {"kernel": g(hp + "ffn.fc1.weight").T,
                            "bias": g(hp + "ffn.fc1.bias")},
                    "fc2": {"kernel": g(hp + "ffn.fc2.weight").T,
                            "bias": g(hp + "ffn.fc2.bias")},
                }

            blocks.append({
                "spatial": half("spatial_block", "window_attn"),
                "channel": half("channel_block", "channel_attn"),
            })
        stages.append({
            "conv_embed": conv,
            "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        })
    vision = {"stages": stages}

    # ---- projector ----
    ppre = "model.multi_modal_projector."
    projector = {
        "image_projection": {
            "kernel": g(ppre + "image_projection.weight").T},
        "image_proj_norm": {
            "weight": g(ppre + "image_proj_norm.weight"),
            "bias": g(ppre + "image_proj_norm.bias")},
        "row_embeddings": g(
            ppre + "image_position_embed.row_embeddings.weight"),
        "column_embeddings": g(
            ppre + "image_position_embed.column_embeddings.weight"),
    }

    # ---- BART ----
    def attn(pre):
        return {n: {"kernel": g(pre + f"{hn}.weight").T,
                    "bias": g(pre + f"{hn}.bias")}
                for n, hn in (("q", "q_proj"), ("k", "k_proj"),
                              ("v", "v_proj"), ("o", "out_proj"))}

    def ln(pre):
        return {"weight": g(pre + ".weight"), "bias": g(pre + ".bias")}

    def lin(pre):
        return {"kernel": g(pre + ".weight").T, "bias": g(pre + ".bias")}

    lm = "model.language_model."

    def layers(which, n, cross):
        out = []
        for i in range(n):
            pre = f"{lm}{which}.layers.{i}."
            p = {
                "self_attn": attn(pre + "self_attn."),
                "self_attn_layer_norm": ln(pre + "self_attn_layer_norm"),
                "fc1": lin(pre + "fc1"),
                "fc2": lin(pre + "fc2"),
                "final_layer_norm": ln(pre + "final_layer_norm"),
            }
            if cross:
                p["encoder_attn"] = attn(pre + "encoder_attn.")
                p["encoder_attn_layer_norm"] = ln(
                    pre + "encoder_attn_layer_norm")
            out.append(p)
        return jax.tree.map(lambda *xs: jnp.stack(xs), *out)

    shared_key = lm + "shared.weight" if lm + "shared.weight" in sd \
        else lm + "encoder.embed_tokens.weight"
    text = {
        "shared": g(shared_key),
        "encoder": {
            "embed_positions": g(lm + "encoder.embed_positions.weight"),
            "layernorm_embedding": ln(lm + "encoder.layernorm_embedding"),
            "layers": layers("encoder", cfg.text.encoder_layers, False),
        },
        "decoder": {
            "embed_positions": g(lm + "decoder.embed_positions.weight"),
            "layernorm_embedding": ln(lm + "decoder.layernorm_embedding"),
            "layers": layers("decoder", cfg.text.decoder_layers, True),
        },
        "final_logits_bias": (
            g("final_logits_bias").reshape(-1)
            if "final_logits_bias" in sd
            else jnp.zeros((cfg.text.vocab_size,))),
    }
    return {"vision": vision, "projector": projector, "text": text}


def load_hf_dir(path: str):
    from .llm import read_hf_dir

    hf_cfg, sd = read_hf_dir(path)
    cfg = config_from_hf(hf_cfg)
    return cfg, convert_hf_state_dict(sd, cfg)
