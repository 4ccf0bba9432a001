"""Golden test: our LTX transformer block vs the reference
``BasicTransformerBlock`` (``ltx_video/models/transformers/attention.py``)
executed with torch on CPU.

The reference file's heavy external imports (diffusers / mmgp / CUDA
attention) are replaced with minimal stand-ins; the block logic under test
— modulation order, residuals, qk-norm placement, RoPE application, STG
mixing — is entirely the reference's own code.
"""

import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from ltx_video_gpupoor_tpu.models.ltx.transformer3d import (
    LTXTransformerConfig,
    _block_forward,
)
from ltx_video_gpupoor_tpu.ops.rope import ltx_freqs_cis


def _load_reference_block():
    src = open(
        "/root/reference/ltx_video/models/transformers/attention.py"
    ).read()

    class _GELU(nn.Module):
        def __init__(self, dim_in, dim_out, approximate="none", bias=True):
            super().__init__()
            self.proj = nn.Linear(dim_in, dim_out, bias=bias)
            self.approximate = approximate

        def forward(self, x, *a):
            return F.gelu(self.proj(x), approximate=self.approximate)

    class _GEGLU(nn.Module):
        def __init__(self, dim_in, dim_out, bias=True):
            super().__init__()
            self.proj = nn.Linear(dim_in, dim_out * 2, bias=bias)

        def forward(self, x, *a):
            h, gate = self.proj(x).chunk(2, dim=-1)
            return h * F.gelu(gate)

    class _RMSNorm(nn.Module):
        def __init__(self, dim, eps=1e-5, elementwise_affine=True):
            super().__init__()
            self.eps = eps
            self.weight = (
                nn.Parameter(torch.ones(dim)) if elementwise_affine else None
            )

        def forward(self, x):
            dtype = x.dtype
            v = x.float().pow(2).mean(-1, keepdim=True)
            x = x.float() * torch.rsqrt(v + self.eps)
            if self.weight is not None:
                x = x * self.weight.float()
            return x.to(dtype)

    def pay_attention(qkv_list, attention_mask=None, **kw):
        q, k, v = qkv_list  # [b, s, h, d]
        out = F.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2),
            attn_mask=None if attention_mask is None
            else attention_mask.transpose(1, 2),
        )
        return out.transpose(1, 2)

    # strip un-stubable imports, provide the rest via the namespace
    src = src.replace(
        "from diffusers.models.attention_processor import (\n"
        "    LoRAAttnAddedKVProcessor,\n"
        "    LoRAAttnProcessor,\n"
        "    LoRAAttnProcessor2_0,\n"
        "    LoRAXFormersAttnProcessor,\n"
        "    SpatialNorm,\n"
        ")",
        "",
    )
    for line in [
        "from diffusers.models.activations import GEGLU, GELU, ApproximateGELU",
        "from diffusers.models.attention import _chunked_feed_forward",
        "from diffusers.models.lora import LoRACompatibleLinear",
        "from diffusers.models.normalization import RMSNorm",
        "from diffusers.utils import deprecate, logging",
        "from diffusers.utils.torch_utils import maybe_allow_in_graph",
        "from wan.modules.attention import pay_attention",
        "from ltx_video.utils.skip_layer_strategy import SkipLayerStrategy",
    ]:
        src = src.replace(line, "")

    class _SkipLayerStrategy:
        AttentionSkip = "attention_skip"
        AttentionValues = "attention_values"
        Residual = "residual"
        TransformerBlock = "transformer_block"

    class _Logging:
        @staticmethod
        def get_logger(name):
            import logging as _l

            return _l.getLogger(name)

    ns = {
        "GELU": _GELU, "GEGLU": _GEGLU, "ApproximateGELU": _GELU,
        "_chunked_feed_forward": None,
        "LoRAAttnAddedKVProcessor": object, "LoRAAttnProcessor": object,
        "LoRAAttnProcessor2_0": object, "LoRAXFormersAttnProcessor": object,
        "SpatialNorm": object, "LoRACompatibleLinear": nn.Linear,
        "RMSNorm": _RMSNorm,
        "deprecate": lambda *a, **k: None,
        "logging": _Logging(),
        "maybe_allow_in_graph": lambda cls: cls,
        "pay_attention": pay_attention,
        "SkipLayerStrategy": _SkipLayerStrategy,
    }
    exec(compile(src, "ref_ltx_attention.py", "exec"), ns)
    return ns


CFG = LTXTransformerConfig(
    num_attention_heads=2,
    attention_head_dim=16,
    in_channels=8,
    out_channels=8,
    num_layers=1,
    cross_attention_dim=32,
    caption_channels=32,
    qk_norm="rms_norm",
    standardization_norm="rms_norm",
    activation_fn="gelu-approximate",
)


@pytest.mark.parametrize("activation", ["gelu-approximate", "geglu"])
def test_block_matches_reference(activation):
    ns = _load_reference_block()
    cfg = LTXTransformerConfig(
        **{**CFG.__dict__, "activation_fn": activation}
    )
    d = cfg.inner_dim
    torch.manual_seed(0)
    ref = ns["BasicTransformerBlock"](
        d, cfg.num_attention_heads, cfg.attention_head_dim,
        cross_attention_dim=cfg.cross_attention_dim,
        activation_fn=activation,
        attention_bias=True,
        adaptive_norm="single_scale_shift",
        standardization_norm="rms_norm",
        norm_elementwise_affine=False,  # production config value
        norm_eps=1e-6,
        qk_norm="rms_norm",
        use_tpu_flash_attention=False,
        use_rope=True,
    ).eval().float()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    def lin(prefix):
        p = {"kernel": jnp.asarray(sd[prefix + ".weight"].T)}
        if prefix + ".bias" in sd:
            p["bias"] = jnp.asarray(sd[prefix + ".bias"])
        return p

    p = {
        "scale_shift_table": jnp.asarray(sd["scale_shift_table"]),
        "attn1": {
            "to_q": lin("attn1.to_q"), "to_k": lin("attn1.to_k"),
            "to_v": lin("attn1.to_v"), "to_out": lin("attn1.to_out.0"),
            "q_norm": {"weight": jnp.asarray(sd["attn1.q_norm.weight"])},
            "k_norm": {"weight": jnp.asarray(sd["attn1.k_norm.weight"])},
        },
        "attn2": {
            "to_q": lin("attn2.to_q"), "to_k": lin("attn2.to_k"),
            "to_v": lin("attn2.to_v"), "to_out": lin("attn2.to_out.0"),
            "q_norm": {"weight": jnp.asarray(sd["attn2.q_norm.weight"])},
            "k_norm": {"weight": jnp.asarray(sd["attn2.k_norm.weight"])},
        },
        "ff": {
            "proj_in": lin("ff.net.0.proj"),
            "proj_out": lin("ff.net.2"),
        },
    }

    rng = np.random.RandomState(0)
    b, s, sc = 2, 12, 7
    x = rng.randn(b, s, d).astype(np.float32)
    ctx = rng.randn(b, sc, d).astype(np.float32)
    timestep = rng.randn(b, 1, 6 * d).astype(np.float32) * 0.1
    coords = np.stack([
        rng.randint(0, 8, (b, s)), rng.randint(0, 64, (b, s)),
        rng.randint(0, 64, (b, s)),
    ], axis=1).astype(np.float32)

    cos, sin = ltx_freqs_cis(jnp.asarray(coords), d, max_pos=(20, 2048, 2048))

    # the reference block mutates its input in place; torch.from_numpy
    # shares memory with the numpy array, so copies are essential here
    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(x.copy()),
            freqs_cis=(
                torch.from_numpy(np.asarray(cos)),
                torch.from_numpy(np.asarray(sin)),
            ),
            encoder_hidden_states=torch.from_numpy(ctx),
            encoder_attention_mask=None,
            timestep=torch.from_numpy(timestep),
        ).numpy()

    # our block adds the scale_shift_table itself: pass raw values
    ada = jnp.asarray(timestep).reshape(b, 1, 6, d)

    out = _block_forward(
        cfg, p, jnp.asarray(x), jnp.asarray(ctx), None,
        ada, (cos, sin), None, None, "xla",
    )
    np.testing.assert_allclose(
        np.asarray(out), ref_out, atol=3e-4, rtol=3e-4
    )
