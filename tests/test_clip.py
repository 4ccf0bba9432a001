"""CLIP vision tower golden test vs the reference (torch CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from ltx_video_gpupoor_tpu.core.checkpoint import convert_clip_vision
from ltx_video_gpupoor_tpu.models.wan import clip as jclip


def _load_ref():
    src = open("/root/reference/wan/modules/clip.py").read()
    src = src.replace("import torchvision.transforms as T", "T = None")
    src = src.replace("from .attention import pay_attention", "")
    src = src.replace(
        "from .tokenizers import HuggingfaceTokenizer",
        "HuggingfaceTokenizer = None",
    )
    src = src.replace(
        "from .xlm_roberta import XLMRoberta",
        "import torch.nn as _nn\nclass XLMRoberta(_nn.Module):\n"
        "    def __init__(self, **kw):\n        super().__init__()",
    )
    ns = {
        "pay_attention": lambda qkv, **kw: torch.nn.functional
        .scaled_dot_product_attention(
            qkv[0].transpose(1, 2), qkv[1].transpose(1, 2),
            qkv[2].transpose(1, 2),
        ).transpose(1, 2),
    }
    exec(compile(src, "ref_clip.py", "exec"), ns)
    return ns


CFG = jclip.CLIPVisionConfig(
    image_size=28, patch_size=14, dim=32, mlp_ratio=2, num_heads=2,
    num_layers=3, activation="gelu",
)


def test_clip_vision_matches_reference():
    ns = _load_ref()
    torch.manual_seed(0)
    ref = ns["VisionTransformer"](
        image_size=CFG.image_size, patch_size=CFG.patch_size, dim=CFG.dim,
        mlp_ratio=CFG.mlp_ratio, out_dim=16, num_heads=CFG.num_heads,
        num_layers=CFG.num_layers, pool_type="token", pre_norm=True,
        post_norm=False, activation="gelu",
    ).eval().float()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert_clip_vision(sd, CFG.num_layers, dtype=jnp.float32)

    rng = np.random.RandomState(0)
    img = rng.rand(2, 3, 28, 28).astype(np.float32) * 2 - 1  # [B,C,H,W]

    # reference path: normalize like CLIPModel.visual then forward
    mean = torch.tensor(jclip.CLIP_MEAN).view(1, 3, 1, 1)
    std = torch.tensor(jclip.CLIP_STD).view(1, 3, 1, 1)
    timg = (torch.from_numpy(img) * 0.5 + 0.5 - mean) / std
    with torch.no_grad():
        ref_out = ref(timg, use_31_block=True).numpy()

    mine = jclip.visual(
        params, CFG, jnp.asarray(np.transpose(img, (0, 2, 3, 1))),
        use_31_block=True,
    )
    assert mine.shape == ref_out.shape  # [B, 5 tokens, 32]
    np.testing.assert_allclose(np.asarray(mine), ref_out, atol=2e-4, rtol=2e-4)


def test_resize_bicubic_shape():
    img = jnp.zeros((1, 64, 48, 3))
    out = jclip.resize_bicubic(img, 28)
    assert out.shape == (1, 28, 28, 3)
