"""Golden test: our LTX causal video VAE vs the reference Encoder/Decoder
(``ltx_video/models/autoencoders/causal_video_autoencoder.py``) executed
with torch on CPU.

Exercises the production block vocabulary — res_x (UNetMidBlock3D),
res_x_y (channel-multiplier resnet), compress_all (strided causal conv
down / depth-to-space up with residual), pixel_norm, patchify, uniform
log-var — plus the 0.9.7 timestep-conditioned decoder (last_scale_shift
modulation). Noise injection is covered by shape/statistics tests
elsewhere (RNG streams can't match across frameworks).
"""

import math
import re

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn as nn
import torch.nn.functional as F

from ltx_video_gpupoor_tpu.core.checkpoint import convert_ltx_vae
from ltx_video_gpupoor_tpu.models.ltx import vae as jvae

_BASE = "/root/reference/ltx_video/models/autoencoders/"


class _PixArtCombinedTimestepEmb(nn.Module):
    """diffusers PixArtAlphaCombinedTimestepSizeEmbeddings oracle
    (size_emb_dim=0 path): Timesteps(256, flip_sin_to_cos=True,
    downscale_freq_shift=0) -> Linear -> SiLU -> Linear. Submodule named
    ``timestep_embedder`` so state-dict keys match diffusers."""

    def __init__(self, embedding_dim, size_emb_dim,
                 use_additional_conditions=False):
        super().__init__()
        self.timestep_embedder = nn.Module()
        self.timestep_embedder.linear_1 = nn.Linear(256, embedding_dim)
        self.timestep_embedder.linear_2 = nn.Linear(
            embedding_dim, embedding_dim
        )

    def forward(self, timestep, resolution=None, aspect_ratio=None,
                batch_size=None, hidden_dtype=torch.float32, **kw):
        half = 128
        exponent = (
            -math.log(10000.0)
            * torch.arange(half, dtype=torch.float32)
            / half
        )
        emb = timestep.float()[:, None] * exponent.exp()[None]
        emb = torch.cat([emb.cos(), emb.sin()], dim=-1).to(hidden_dtype)
        return self.timestep_embedder.linear_2(
            F.silu(self.timestep_embedder.linear_1(emb))
        )


def _strip_imports(src: str) -> str:
    out, skip = [], False
    for line in src.splitlines():
        if skip:
            if line.rstrip().endswith(")"):
                skip = False
            continue
        if re.match(r"from (ltx_video|diffusers|safetensors)\b", line):
            if line.rstrip().endswith("(") and ")" not in line:
                skip = True
            continue
        out.append(line)
    return "\n".join(out)


def _load_reference_vae():
    class _Logging:
        @staticmethod
        def get_logger(name):
            import logging as _l

            return _l.getLogger(name)

    ns = {
        "logging": _Logging(),
        "PixArtAlphaCombinedTimestepSizeEmbeddings": _PixArtCombinedTimestepEmb,
        "safe_open": None,
        "AutoencoderKLWrapper": nn.Module,
        "Attention": None,  # config below uses no attn_res_x blocks
        "diffusers_and_ours_config_mapping": {},
        "make_hashable_key": lambda d: d,
        "VAE_KEYS_RENAME_DICT": {},
    }
    for fname in [
        "pixel_norm.py",
        "pixel_shuffle.py",
        "causal_conv3d.py",
        "dual_conv3d.py",
        "conv_nd_factory.py",
        "causal_video_autoencoder.py",
    ]:
        src = _strip_imports(open(_BASE + fname).read())
        exec(compile(src, "ref_" + fname, "exec"), ns)
    return ns


ENC_BLOCKS = [
    ["res_x", 1],
    ["compress_all", 1],
    ["res_x_y", 1],
    ["res_x", 1],
]
DEC_BLOCKS = [
    ["res_x", {"num_layers": 1}],
    ["compress_all", {"residual": True, "multiplier": 2}],
    ["res_x", {"num_layers": 1}],
]
LATENT = 4


def _configs():
    cfg = jvae.VAEConfig.from_dict({
        "latent_channels": LATENT,
        "encoder_blocks": ENC_BLOCKS,
        "decoder_blocks": DEC_BLOCKS,
        "base_channels": 8,
        "decoder_base_channels": 8,
        "patch_size": 2,
        "norm_layer": "pixel_norm",
        "latent_log_var": "uniform",
        "use_quant_conv": False,
        "causal_decoder": False,
        "timestep_conditioning": True,
    })
    return cfg


import pytest


@pytest.fixture(scope="module")
def pair():
    ns = _load_reference_vae()
    torch.manual_seed(0)
    enc = ns["Encoder"](
        dims=3, in_channels=3, out_channels=LATENT, blocks=ENC_BLOCKS,
        base_channels=8, norm_num_groups=2, patch_size=2,
        norm_layer="pixel_norm", latent_log_var="uniform",
    ).eval().float()
    torch.manual_seed(1)
    dec = ns["Decoder"](
        dims=3, in_channels=LATENT, out_channels=3, blocks=DEC_BLOCKS,
        base_channels=8, norm_num_groups=2, patch_size=2,
        norm_layer="pixel_norm", causal=False, timestep_conditioning=True,
    ).eval().float()
    sd = {"encoder." + k: v.numpy() for k, v in enc.state_dict().items()}
    sd.update(
        {"decoder." + k: v.numpy() for k, v in dec.state_dict().items()}
    )
    cfg = _configs()
    params = convert_ltx_vae(sd, cfg, dtype=jnp.float32)
    return enc, dec, cfg, params


def test_encoder_matches_reference(pair):
    ref, _, cfg, params = pair
    rng = np.random.RandomState(0)
    video = rng.randn(1, 3, 5, 16, 16).astype(np.float32)  # [B,C,F,H,W]
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(video.copy())).numpy()
    mine = jvae.encode(
        params, cfg, jnp.asarray(np.transpose(video, (0, 2, 3, 4, 1)))
    )
    mine = np.transpose(np.asarray(mine), (0, 4, 1, 2, 3))
    assert mine.shape == ref_out.shape, (mine.shape, ref_out.shape)
    np.testing.assert_allclose(mine, ref_out, atol=3e-4, rtol=3e-4)


def test_decoder_matches_reference_with_timestep(pair):
    _, ref, cfg, params = pair
    rng = np.random.RandomState(2)
    z = rng.randn(1, LATENT, 3, 4, 4).astype(np.float32)
    t = 0.05
    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(z.copy()),
            target_shape=(1, 3, 5, 16, 16),
            timestep=torch.tensor([t]),
        ).numpy()
    mine = jvae.decode(
        params, cfg, jnp.asarray(np.transpose(z, (0, 2, 3, 4, 1))),
        timestep=jnp.asarray(t),
    )
    mine = np.transpose(np.asarray(mine), (0, 4, 1, 2, 3))
    assert mine.shape == ref_out.shape, (mine.shape, ref_out.shape)
    np.testing.assert_allclose(mine, ref_out, atol=5e-4, rtol=5e-4)
