"""Whole-model golden test: our LTX ``forward`` vs the reference
``Transformer3DModel`` (``ltx_video/models/transformers/transformer3d.py``)
executed with torch on CPU.

Covers what the per-block test can't: patchify projection, adaLN-single
timestep embedding (sinusoidal -> MLP -> 6-chunk), caption projection,
per-layer stacking, and the final 2-way modulation + proj_out.

The diffusers classes the reference instantiates (AdaLayerNormSingle,
PixArtAlphaTextProjection) are re-implemented here as faithful torch
oracles (diffusers is not installed in this image).
"""

import math
import types

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn as nn
import torch.nn.functional as F

from ltx_video_gpupoor_tpu.models.ltx.transformer3d import (
    LTXTransformerConfig,
    forward as ltx_forward,
)
from tests.test_ltx_block_golden import _load_reference_block


class _TimestepEmbedder(nn.Module):
    """diffusers PixArtAlphaCombinedTimestepSizeEmbeddings equivalent:
    Timesteps(256, flip_sin_to_cos=True, downscale_freq_shift=0) ->
    Linear(256, d) -> SiLU -> Linear(d, d)."""

    def __init__(self, dim):
        super().__init__()
        self.linear_1 = nn.Linear(256, dim)
        self.linear_2 = nn.Linear(dim, dim)

    def forward(self, timestep, resolution=None, aspect_ratio=None,
                batch_size=None, hidden_dtype=None):
        half = 128
        exponent = (
            -math.log(10000.0)
            * torch.arange(half, dtype=torch.float32)
            / half
        )
        emb = timestep.float()[:, None] * exponent.exp()[None]
        emb = torch.cat([emb.cos(), emb.sin()], dim=-1)
        return self.linear_2(F.silu(self.linear_1(emb)))


class _AdaLayerNormSingle(nn.Module):
    def __init__(self, dim, use_additional_conditions=False):
        super().__init__()
        self.emb = _TimestepEmbedder(dim)
        self.silu = nn.SiLU()
        self.linear = nn.Linear(dim, 6 * dim, bias=True)

    def forward(self, timestep, added_cond_kwargs=None, batch_size=None,
                hidden_dtype=None):
        embedded = self.emb(
            timestep, batch_size=batch_size, hidden_dtype=hidden_dtype
        )
        return self.linear(self.silu(embedded)), embedded


class _PixArtAlphaTextProjection(nn.Module):
    def __init__(self, in_features, hidden_size):
        super().__init__()
        self.linear_1 = nn.Linear(in_features, hidden_size)
        self.linear_2 = nn.Linear(hidden_size, hidden_size)

    def forward(self, caption):
        return self.linear_2(
            F.gelu(self.linear_1(caption), approximate="tanh")
        )


def _load_reference_transformer():
    attn_ns = _load_reference_block()
    src = open(
        "/root/reference/ltx_video/models/transformers/transformer3d.py"
    ).read()
    for line in [
        "from diffusers.configuration_utils import ConfigMixin, register_to_config",
        "from diffusers.models.embeddings import PixArtAlphaTextProjection",
        "from diffusers.models.modeling_utils import ModelMixin",
        "from diffusers.models.normalization import AdaLayerNormSingle",
        "from diffusers.utils import BaseOutput, is_torch_version",
        "from diffusers.utils import logging",
        "from safetensors import safe_open",
        "from ltx_video.models.transformers.attention import BasicTransformerBlock, reshape_hidden_states, restore_hidden_states_shape",
        "from ltx_video.utils.skip_layer_strategy import SkipLayerStrategy",
    ]:
        src = src.replace(line, "")
    src = src.replace(
        "from ltx_video.utils.diffusers_config_mapping import (\n"
        "    diffusers_and_ours_config_mapping,\n"
        "    make_hashable_key,\n"
        "    TRANSFORMER_KEYS_RENAME_DICT,\n"
        ")",
        "",
    )

    class _ModelMixin(nn.Module):
        @property
        def dtype(self):
            return torch.float32

        @property
        def device(self):
            return torch.device("cpu")

    class _Logging:
        @staticmethod
        def get_logger(name):
            import logging as _l

            return _l.getLogger(name)

    ns = {
        "ConfigMixin": object,
        "register_to_config": lambda f: f,
        "ModelMixin": _ModelMixin,
        "PixArtAlphaTextProjection": _PixArtAlphaTextProjection,
        "AdaLayerNormSingle": _AdaLayerNormSingle,
        "BaseOutput": object,
        "is_torch_version": lambda *a: False,
        "logging": _Logging(),
        "safe_open": None,
        "BasicTransformerBlock": attn_ns["BasicTransformerBlock"],
        "reshape_hidden_states": attn_ns["reshape_hidden_states"],
        "restore_hidden_states_shape": attn_ns["restore_hidden_states_shape"],
        "SkipLayerStrategy": attn_ns["SkipLayerStrategy"],
        "diffusers_and_ours_config_mapping": {},
        "make_hashable_key": lambda d: d,
        "TRANSFORMER_KEYS_RENAME_DICT": {},
    }
    exec(compile(src, "ref_ltx_transformer3d.py", "exec"), ns)
    return ns


def test_ltx_transformer_full_forward_matches_reference():
    ns = _load_reference_transformer()
    cfg = LTXTransformerConfig(
        num_attention_heads=2, attention_head_dim=16,
        in_channels=8, out_channels=8, num_layers=2,
        cross_attention_dim=32, caption_channels=24,
    )
    d = cfg.inner_dim
    torch.manual_seed(0)
    ref = ns["Transformer3DModel"](
        num_attention_heads=cfg.num_attention_heads,
        attention_head_dim=cfg.attention_head_dim,
        in_channels=cfg.in_channels, out_channels=cfg.out_channels,
        num_layers=cfg.num_layers,
        cross_attention_dim=cfg.cross_attention_dim,
        attention_bias=True,
        activation_fn="gelu-approximate",
        adaptive_norm="single_scale_shift",
        standardization_norm="rms_norm",
        norm_elementwise_affine=False,
        norm_eps=1e-6,
        caption_channels=cfg.caption_channels,
        qk_norm="rms_norm",
        positional_embedding_theta=10000.0,
        positional_embedding_max_pos=[20, 2048, 2048],
        timestep_scale_multiplier=1000,
    ).eval().float()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    def lin(prefix):
        p = {"kernel": jnp.asarray(sd[prefix + ".weight"].T)}
        if prefix + ".bias" in sd:
            p["bias"] = jnp.asarray(sd[prefix + ".bias"])
        return p

    blocks = []
    for i in range(cfg.num_layers):
        pre = f"transformer_blocks.{i}"
        blocks.append({
            "scale_shift_table": jnp.asarray(sd[pre + ".scale_shift_table"]),
            "attn1": {
                "to_q": lin(pre + ".attn1.to_q"),
                "to_k": lin(pre + ".attn1.to_k"),
                "to_v": lin(pre + ".attn1.to_v"),
                "to_out": lin(pre + ".attn1.to_out.0"),
                "q_norm": {"weight": jnp.asarray(sd[pre + ".attn1.q_norm.weight"])},
                "k_norm": {"weight": jnp.asarray(sd[pre + ".attn1.k_norm.weight"])},
            },
            "attn2": {
                "to_q": lin(pre + ".attn2.to_q"),
                "to_k": lin(pre + ".attn2.to_k"),
                "to_v": lin(pre + ".attn2.to_v"),
                "to_out": lin(pre + ".attn2.to_out.0"),
                "q_norm": {"weight": jnp.asarray(sd[pre + ".attn2.q_norm.weight"])},
                "k_norm": {"weight": jnp.asarray(sd[pre + ".attn2.k_norm.weight"])},
            },
            "ff": {
                "proj_in": lin(pre + ".ff.net.0.proj"),
                "proj_out": lin(pre + ".ff.net.2"),
            },
        })
    import jax

    params = {
        "patchify_proj": lin("patchify_proj"),
        "adaln": {
            "emb_linear_1": lin("adaln_single.emb.linear_1"),
            "emb_linear_2": lin("adaln_single.emb.linear_2"),
            "linear": lin("adaln_single.linear"),
        },
        "caption_projection": {
            "linear_1": lin("caption_projection.linear_1"),
            "linear_2": lin("caption_projection.linear_2"),
        },
        "scale_shift_table": jnp.asarray(sd["scale_shift_table"]),
        "proj_out": lin("proj_out"),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
    }

    rng = np.random.RandomState(0)
    b, s, sc = 2, 12, 7
    x = rng.randn(b, s, cfg.in_channels).astype(np.float32)
    caption = rng.randn(b, sc, cfg.caption_channels).astype(np.float32)
    t = rng.uniform(0.1, 0.9, (b,)).astype(np.float32)
    grid = np.stack([
        rng.randint(0, 8, (b, s)), rng.randint(0, 64, (b, s)),
        rng.randint(0, 64, (b, s)),
    ], axis=1).astype(np.float32)

    freqs = ref.precompute_freqs_cis(torch.from_numpy(grid.copy()))
    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(x.copy()),
            freqs_cis=freqs,
            encoder_hidden_states=torch.from_numpy(caption.copy()),
            timestep=torch.from_numpy(t.copy())[:, None],
            encoder_attention_mask=None,
            ltxv_model=types.SimpleNamespace(_interrupt=False),
            return_dict=False,
        )[0].numpy()

    out = ltx_forward(
        params, cfg, jnp.asarray(x), jnp.asarray(grid), jnp.asarray(t),
        jnp.asarray(caption), attn_mode="xla",
    )
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=5e-4, rtol=5e-4)
