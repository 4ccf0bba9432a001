"""Qwen2.5-VL (vision tower + M-RoPE LM glue), TPU-native.

Parity target: the image-aware Wan prompt extender
(``/root/reference/wan/utils/prompt_extend.py:398-455``) drives
``Qwen2_5_VLForConditionalGeneration`` through host torch. Here the
whole model is JAX: the windowed vision transformer encodes the frame,
its merged patch embeddings are scattered into the text embedding
sequence, and the framework LLM (``models/llm.py`` with
``mrope_section`` set) runs the 3D-RoPE prefill+decode on the
accelerator. Numerics are pinned against torch ``transformers``'
Qwen2.5-VL in ``tests/test_qwen25_vl_golden.py``.

TPU-first notes:
- the patch "Conv3d" with kernel==stride is a single matmul over
  flattened patches (MXU, no conv lowering);
- window partition / full-attention layout is computed ONCE host-side
  per image grid (static shapes), the device sees only gathers and a
  segment-id mask — no ragged control flow inside jit;
- the 32-deep tower is stacked and scanned with the per-block
  full-vs-window choice carried as a scanned boolean (one compile).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.norms import rms_norm
from . import llm


@dataclasses.dataclass(frozen=True)
class QwenVLVisionConfig:
    depth: int = 32
    hidden_size: int = 1280
    intermediate_size: int = 3420
    num_heads: int = 16
    in_channels: int = 3
    patch_size: int = 14
    spatial_merge_size: int = 2
    temporal_patch_size: int = 2
    window_size: int = 112
    out_hidden_size: int = 3584
    fullatt_block_indexes: tuple = (7, 15, 23, 31)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def patch_dim(self) -> int:
        return (self.in_channels * self.temporal_patch_size
                * self.patch_size ** 2)


@dataclasses.dataclass(frozen=True)
class QwenVLConfig:
    """Full model: vision tower + text LLM + special token ids."""
    vision: QwenVLVisionConfig
    text: llm.LLMConfig
    image_token_id: int = 151655
    video_token_id: int = 151656
    vision_start_token_id: int = 151652


def config_from_hf(hf: dict) -> QwenVLConfig:
    v = hf.get("vision_config", {})
    t = hf.get("text_config", hf)
    rs = t.get("rope_scaling") or {}
    text = llm.LLMConfig(
        vocab_size=t["vocab_size"],
        dim=t["hidden_size"],
        num_layers=t["num_hidden_layers"],
        num_heads=t["num_attention_heads"],
        num_kv_heads=t.get("num_key_value_heads",
                           t["num_attention_heads"]),
        ffn_dim=t["intermediate_size"],
        rope_theta=t.get("rope_theta", 1000000.0),
        rms_eps=t.get("rms_norm_eps", 1e-6),
        qkv_bias=True,
        tie_embeddings=t.get("tie_word_embeddings", False),
        mrope_section=tuple(rs.get("mrope_section", (16, 24, 24))),
    )
    vision = QwenVLVisionConfig(
        depth=v.get("depth", 32),
        hidden_size=v.get("hidden_size", 1280),
        intermediate_size=v.get("intermediate_size", 3420),
        num_heads=v.get("num_heads", 16),
        in_channels=v.get("in_channels", 3),
        patch_size=v.get("patch_size", 14),
        spatial_merge_size=v.get("spatial_merge_size", 2),
        temporal_patch_size=v.get("temporal_patch_size", 2),
        window_size=v.get("window_size", 112),
        out_hidden_size=v.get("out_hidden_size", 3584),
        fullatt_block_indexes=tuple(
            v.get("fullatt_block_indexes", (7, 15, 23, 31))),
    )
    return QwenVLConfig(
        vision=vision, text=text,
        image_token_id=hf.get("image_token_id", 151655),
        video_token_id=hf.get("video_token_id", 151656),
        vision_start_token_id=hf.get("vision_start_token_id", 151652),
    )


# ---------------------------------------------------------------------------
# Vision tower
# ---------------------------------------------------------------------------

def vision_init_params(key: jax.Array, cfg: QwenVLVisionConfig) -> dict:
    ks = iter(jax.random.split(key, 6))
    d, hd = cfg.hidden_size, cfg.head_dim

    def lin(k, din, dout, bias=True):
        p = {"kernel": jax.random.normal(k, (din, dout)) * din**-0.5}
        if bias:
            p["bias"] = jnp.zeros((dout,))
        return p

    def block(k):
        kk = iter(jax.random.split(k, 8))
        return {
            "norm1": {"weight": jnp.ones((d,))},
            "attn": {
                "qkv": lin(next(kk), d, 3 * d),
                "proj": lin(next(kk), d, d),
            },
            "norm2": {"weight": jnp.ones((d,))},
            "mlp": {
                "gate": lin(next(kk), d, cfg.intermediate_size),
                "up": lin(next(kk), d, cfg.intermediate_size),
                "down": lin(next(kk), cfg.intermediate_size, d),
            },
        }

    merge_dim = d * cfg.spatial_merge_size ** 2
    return {
        "patch_embed": {"kernel": jax.random.normal(
            next(ks), (cfg.patch_dim, d)) * cfg.patch_dim**-0.5},
        "blocks": jax.vmap(block)(jax.random.split(next(ks), cfg.depth)),
        "merger": {
            "ln_q": {"weight": jnp.ones((d,))},
            "fc1": lin(next(ks), merge_dim, merge_dim),
            "fc2": lin(next(ks), merge_dim, cfg.out_hidden_size),
        },
    }


def vision_layout(cfg: QwenVLVisionConfig, grid_thw: np.ndarray):
    """Host-side static layout for a batch of image/video grids
    (``grid_thw`` [N, 3] of (t, h, w) patch counts).

    Returns ``(window_index, seg_window, seg_full, pos_hw)``:
    - ``window_index`` [S/mu]: merge-unit permutation into window order
      (transformers ``get_window_index``);
    - ``seg_window``/``seg_full`` [S]: attention segment ids in window
      order for the windowed / full-attention blocks;
    - ``pos_hw`` [S, 2]: (h, w) rotary position ids in window order.
    """
    merge = cfg.spatial_merge_size
    mu = merge * merge
    win = cfg.window_size // merge // cfg.patch_size

    window_index = []
    win_sizes = []
    pos_ids = []
    base = 0
    for t, h, w in grid_thw:
        t, h, w = int(t), int(h), int(w)
        lh, lw = h // merge, w // merge
        idx = np.arange(t * lh * lw).reshape(t, lh, lw)
        pad_h, pad_w = (-lh) % win, (-lw) % win
        nh, nw = (lh + pad_h) // win, (lw + pad_w) // win
        idxp = np.full((t, lh + pad_h, lw + pad_w), -100)
        idxp[:, :lh, :lw] = idx
        idxp = (idxp.reshape(t, nh, win, nw, win)
                .transpose(0, 1, 3, 2, 4).reshape(t, nh * nw, win, win))
        sizes = (idxp != -100).sum(axis=(2, 3)).reshape(-1)
        flat = idxp.reshape(-1)
        window_index.append(flat[flat != -100] + base)
        win_sizes.extend(int(s) * mu for s in sizes if s > 0)
        base += t * lh * lw
        # rotary (h, w) ids at PATCH granularity, merge-unit order
        hp = np.arange(h)[:, None].repeat(w, 1)
        hp = (hp.reshape(lh, merge, lw, merge).transpose(0, 2, 1, 3)
              .reshape(-1))
        wp = np.arange(w)[None, :].repeat(h, 0)
        wp = (wp.reshape(lh, merge, lw, merge).transpose(0, 2, 1, 3)
              .reshape(-1))
        pos_ids.append(np.tile(np.stack([hp, wp], -1), (t, 1)))
    window_index = np.concatenate(window_index)
    pos_hw = np.concatenate(pos_ids, axis=0)

    # expand the merge-unit permutation to patch granularity
    patch_perm = (window_index[:, None] * mu + np.arange(mu)).reshape(-1)
    pos_hw = pos_hw[patch_perm]

    # windowed segments: one id per non-empty window, repeated by size
    seg_window = np.repeat(np.arange(len(win_sizes)), win_sizes)
    # full-attention segments: one id per image/video frame group
    # (cu_seqlens = repeat_interleave(h*w, t) per grid), mapped through
    # the window permutation
    full = []
    fid = 0
    for t, h, w in grid_thw:
        for _ in range(int(t)):
            full.extend([fid] * (int(h) * int(w)))
            fid += 1
    seg_full = np.asarray(full)[patch_perm]
    return window_index, seg_window, seg_full, pos_hw


def vision_forward(
    params: dict,
    cfg: QwenVLVisionConfig,
    patches: jax.Array,     # [S, patch_dim] flattened patches
    grid_thw: np.ndarray,   # [N, 3] host-side (static)
) -> jax.Array:
    """Returns merged vision embeddings ``[S/mu, out_hidden]`` in the
    original (pre-window) order, matching transformers' tower output."""
    mu = cfg.spatial_merge_size ** 2
    window_index, seg_window, seg_full, pos_hw = vision_layout(
        cfg, np.asarray(grid_thw))
    s = patches.shape[0]
    # compute dtype follows the checkpoint (bf16 serving, fp32 goldens)
    dt = params["patch_embed"]["kernel"].dtype

    x = patches.astype(dt) @ params["patch_embed"]["kernel"]
    # reorder into window order at merge-unit granularity
    patch_perm = jnp.asarray(
        (window_index[:, None] * mu + np.arange(mu)).reshape(-1))
    x = x[patch_perm]

    # rotary tables: head_dim/2 channels split between h and w axes
    half = cfg.head_dim // 2
    inv_freq = 1.0 / (10000.0 ** (np.arange(0, half, 2) / half))
    ang = np.concatenate([
        pos_hw[:, 0:1] * inv_freq[None], pos_hw[:, 1:2] * inv_freq[None],
    ], axis=-1)  # [S, half]
    ang = np.concatenate([ang, ang], axis=-1)  # [S, head_dim]
    cos = jnp.asarray(np.cos(ang), jnp.float32)
    sin = jnp.asarray(np.sin(ang), jnp.float32)

    segw = jnp.asarray(seg_window)
    segf = jnp.asarray(seg_full)
    mask_w = (segw[:, None] == segw[None, :])
    mask_f = (segf[:, None] == segf[None, :])
    bias_w = jnp.where(mask_w, 0.0, -1e9).astype(jnp.float32)
    bias_f = jnp.where(mask_f, 0.0, -1e9).astype(jnp.float32)

    nh, hd = cfg.num_heads, cfg.head_dim
    is_full = np.zeros((cfg.depth,), bool)
    is_full[list(cfg.fullatt_block_indexes)] = True

    def attn(p, h, bias):
        qkv = h @ p["qkv"]["kernel"].astype(dt) + p["qkv"]["bias"].astype(dt)
        q, k, v = jnp.split(qkv.reshape(s, 3, nh, hd), 3, axis=1)
        q, k, v = (a[:, 0] for a in (q, k, v))

        def rope(a):
            af = a.astype(jnp.float32)
            return (af * cos[:, None, :]
                    + llm._rotate_half(af) * sin[:, None, :]).astype(dt)

        q, k = rope(q), rope(k)
        scores = jnp.einsum(
            "qhd,khd->hqk", q.astype(jnp.float32), k.astype(jnp.float32)
        ) * hd**-0.5 + bias[None]
        probs = jax.nn.softmax(scores, axis=-1).astype(dt)
        out = jnp.einsum("hqk,khd->qhd", probs, v).reshape(s, nh * hd)
        return out @ p["proj"]["kernel"].astype(dt) + \
            p["proj"]["bias"].astype(dt)

    def body(x, inp):
        p, full = inp
        bias = jax.lax.select(full, bias_f, bias_w)
        h = rms_norm(x, p["norm1"]["weight"], eps=1e-6)
        x = x + attn(p["attn"], h, bias)
        h = rms_norm(x, p["norm2"]["weight"], eps=1e-6)
        ff = jax.nn.silu(
            h @ p["mlp"]["gate"]["kernel"].astype(dt)
            + p["mlp"]["gate"]["bias"].astype(dt)
        ) * (h @ p["mlp"]["up"]["kernel"].astype(dt)
             + p["mlp"]["up"]["bias"].astype(dt))
        x = x + (ff @ p["mlp"]["down"]["kernel"].astype(dt)
                 + p["mlp"]["down"]["bias"].astype(dt))
        return x, None

    x, _ = jax.lax.scan(body, x, (params["blocks"], jnp.asarray(is_full)))

    # merger: RMSNorm, group merge-units, 2-layer MLP with GELU
    m = params["merger"]
    h = rms_norm(x, m["ln_q"]["weight"], eps=1e-6).reshape(s // mu, -1)
    h = h @ m["fc1"]["kernel"].astype(dt) + m["fc1"]["bias"].astype(dt)
    h = jax.nn.gelu(h, approximate=False)
    h = h @ m["fc2"]["kernel"].astype(dt) + m["fc2"]["bias"].astype(dt)
    # back to the original merge-unit order
    reverse = jnp.asarray(np.argsort(window_index))
    return h[reverse]


# ---------------------------------------------------------------------------
# Multimodal glue
# ---------------------------------------------------------------------------

def get_rope_index(
    cfg: QwenVLConfig,
    input_ids: np.ndarray,            # [B, S]
    image_grid_thw: Optional[np.ndarray] = None,
    video_grid_thw: Optional[np.ndarray] = None,
    attention_mask: Optional[np.ndarray] = None,
) -> tuple:
    """Host-side 3D position ids (transformers ``get_rope_index``,
    image/video second_per_grid=1 path). Returns ``positions`` [3, B, S]
    and ``deltas`` [B] (first-decode position = prompt_len + delta)."""
    merge = cfg.vision.spatial_merge_size
    b, s = input_ids.shape
    if attention_mask is None:
        attention_mask = np.ones_like(input_ids)
    positions = np.ones((3, b, s), np.int64)
    deltas = np.zeros((b,), np.int64)
    img_i = vid_i = 0
    for bi in range(b):
        ids = input_ids[bi][attention_mask[bi] == 1]
        starts = np.where(ids == cfg.vision_start_token_id)[0]
        vis_tokens = ids[starts + 1] if starts.size else np.zeros((0,))
        n_img = int((vis_tokens == cfg.image_token_id).sum())
        n_vid = int((vis_tokens == cfg.video_token_id).sum())
        rem = ids.tolist()
        pos_list = []
        st = 0
        st_idx = 0
        li, vi = img_i, vid_i
        for _ in range(n_img + n_vid):
            it = rem.index(cfg.image_token_id, st) \
                if cfg.image_token_id in rem[st:] else len(rem) + 1
            vt = rem.index(cfg.video_token_id, st) \
                if cfg.video_token_id in rem[st:] else len(rem) + 1
            if it < vt:
                t, h, w = image_grid_thw[li]
                li += 1
                ed = it
            else:
                t, h, w = video_grid_thw[vi]
                vi += 1
                ed = vt
            lt, lh, lw = int(t), int(h) // merge, int(w) // merge
            text_len = ed - st
            pos_list.append(
                np.tile(np.arange(text_len) + st_idx, (3, 1)))
            st_idx += text_len
            tpos = np.repeat(np.arange(lt), lh * lw)
            hpos = np.tile(np.repeat(np.arange(lh), lw), lt)
            wpos = np.tile(np.arange(lw), lt * lh)
            pos_list.append(np.stack([tpos, hpos, wpos]) + st_idx)
            st = ed + lt * lh * lw
            # text after a vision block resumes at max vision pos + 1
            st_idx += int(max(lt, lh, lw))
        if st < len(rem):
            text_len = len(rem) - st
            pos_list.append(np.tile(np.arange(text_len) + st_idx, (3, 1)))
        pos = np.concatenate(pos_list, axis=1) if pos_list else \
            np.tile(np.arange(len(rem)), (3, 1))
        positions[:, bi, attention_mask[bi] == 1] = pos
        deltas[bi] = pos.max() + 1 - len(ids) if len(ids) else 0
        img_i, vid_i = li, vi
    return positions, deltas


def scatter_image_embeds(
    cfg: QwenVLConfig,
    token_embeds: jax.Array,   # [B, S, dim]
    input_ids: jax.Array,      # [B, S]
    image_embeds: jax.Array,   # [N_img_tokens, dim] (merged tower output)
) -> jax.Array:
    """Place vision embeddings at the image/video token positions (the
    reference's masked_scatter)."""
    flat_ids = input_ids.reshape(-1)
    is_img = (flat_ids == cfg.image_token_id) | \
        (flat_ids == cfg.video_token_id)
    # k-th image token takes image_embeds[k]
    order = jnp.cumsum(is_img) - 1
    gathered = image_embeds[jnp.clip(order, 0, image_embeds.shape[0] - 1)]
    out = jnp.where(is_img[:, None],
                    gathered.astype(token_embeds.dtype),
                    token_embeds.reshape(-1, token_embeds.shape[-1]))
    return out.reshape(token_embeds.shape)


def forward(
    params: dict,               # {"vision": ..., "text": ...}
    cfg: QwenVLConfig,
    input_ids: jax.Array,       # [B, S]
    patches: Optional[jax.Array] = None,
    grid_thw: Optional[np.ndarray] = None,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Full multimodal forward -> logits (golden-test surface)."""
    b, s = input_ids.shape
    if mask is None:
        mask = jnp.ones((b, s), jnp.int32)
    embeds = params["text"]["token_embedding"][input_ids]
    if patches is not None:
        img = vision_forward(params["vision"], cfg.vision, patches,
                             grid_thw)
        embeds = scatter_image_embeds(cfg, embeds, input_ids, img)
        pos_np, _ = get_rope_index(
            cfg, np.asarray(input_ids),
            image_grid_thw=np.asarray(grid_thw),
            attention_mask=np.asarray(mask))
        positions = jnp.asarray(pos_np)
    else:
        positions = None
    return llm.forward(params["text"], cfg.text, input_ids, mask,
                       positions=positions, embeds=embeds)


def generate(
    params: dict,
    cfg: QwenVLConfig,
    input_ids: jax.Array,
    patches: Optional[jax.Array],
    grid_thw: Optional[np.ndarray],
    mask: jax.Array,
    max_new_tokens: int,
    eos_ids: tuple = (),
    temperature: float = 0.0,
    key: Optional[jax.Array] = None,
    positions: Optional[jax.Array] = None,   # precomputed [3, B, S]
    decode_pos0: Optional[jax.Array] = None,  # precomputed [B]
) -> jax.Array:
    """Multimodal generate: vision encode + scatter + M-RoPE positions,
    then the framework LLM's one-program prefill+decode.

    Pass ``positions``/``decode_pos0`` (from :func:`get_rope_index`,
    computed host-side on concrete ids) to make this call fully
    traceable — callers that jit it MUST precompute them, since the
    default path reads ``input_ids`` on the host."""
    embeds = params["text"]["token_embedding"][input_ids]
    if patches is not None:
        img = vision_forward(params["vision"], cfg.vision, patches,
                             grid_thw)
        embeds = scatter_image_embeds(cfg, embeds, input_ids, img)
        if positions is None:
            pos_np, _deltas = get_rope_index(
                cfg, np.asarray(input_ids),
                image_grid_thw=np.asarray(grid_thw),
                attention_mask=np.asarray(mask))
            positions = jnp.asarray(pos_np)
            decode_pos0 = jnp.asarray(
                pos_np.max(axis=(0, 2)) + 1, jnp.int32)
    return llm.generate(
        params["text"], cfg.text, input_ids, mask, max_new_tokens,
        eos_ids=eos_ids, temperature=temperature, key=key,
        positions=positions, decode_pos0=decode_pos0, embeds=embeds)


# ---------------------------------------------------------------------------
# HF checkpoint conversion
# ---------------------------------------------------------------------------

def convert_hf_state_dict(sd: dict, cfg: QwenVLConfig) -> dict:
    """Published Qwen2.5-VL safetensors naming -> param tree. The text
    side reuses the LLM converter (``model.language_model.*`` or legacy
    ``model.*`` prefixes); the tower maps ``model.visual.*``."""
    import numpy as np

    # normalize prefixes: new HF layout uses model.language_model. and
    # model.visual.; older exports use model. and visual.
    text_sd = {}
    vis_sd = {}
    for k, v in sd.items():
        if ".visual." in k or k.startswith("visual."):
            vis_sd[k.split("visual.", 1)[1]] = v
        elif ".language_model." in k:
            text_sd["model." + k.split(".language_model.", 1)[1]] = v
        elif k == "lm_head.weight":
            text_sd[k] = v
        else:
            text_sd[k] = v

    def g(name):
        return np.asarray(vis_sd[name])

    blocks = []
    for i in range(cfg.vision.depth):
        pre = f"blocks.{i}."
        blocks.append({
            "norm1": {"weight": g(pre + "norm1.weight")},
            "attn": {
                "qkv": {"kernel": g(pre + "attn.qkv.weight").T,
                        "bias": g(pre + "attn.qkv.bias")},
                "proj": {"kernel": g(pre + "attn.proj.weight").T,
                         "bias": g(pre + "attn.proj.bias")},
            },
            "norm2": {"weight": g(pre + "norm2.weight")},
            "mlp": {
                "gate": {"kernel": g(pre + "mlp.gate_proj.weight").T,
                         "bias": g(pre + "mlp.gate_proj.bias")},
                "up": {"kernel": g(pre + "mlp.up_proj.weight").T,
                       "bias": g(pre + "mlp.up_proj.bias")},
                "down": {"kernel": g(pre + "mlp.down_proj.weight").T,
                         "bias": g(pre + "mlp.down_proj.bias")},
            },
        })
    vision = {
        "patch_embed": {"kernel": g("patch_embed.proj.weight")
                        .reshape(cfg.vision.hidden_size, -1).T},
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "merger": {
            "ln_q": {"weight": g("merger.ln_q.weight")},
            "fc1": {"kernel": g("merger.mlp.0.weight").T,
                    "bias": g("merger.mlp.0.bias")},
            "fc2": {"kernel": g("merger.mlp.2.weight").T,
                    "bias": g("merger.mlp.2.bias")},
        },
    }
    return {"vision": vision,
            "text": llm.convert_hf_state_dict(text_sd, cfg.text)}


def load_hf_dir(path: str):
    hf_cfg, sd = llm.read_hf_dir(path)
    cfg = config_from_hf(hf_cfg)
    return cfg, convert_hf_state_dict(sd, cfg)
