"""Golden test: our latent upsampler vs the reference ``LatentUpsampler``
(``ltx_video/models/autoencoders/latent_upsampler.py``) on CPU, through
the production converter (``serving/model_zoo.py::convert_latent_upsampler``).
"""

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn

from ltx_video_gpupoor_tpu.models.ltx import latent_upsampler as jup
from ltx_video_gpupoor_tpu.serving.model_zoo import convert_latent_upsampler


def _load_ref():
    src = open(
        "/root/reference/ltx_video/models/autoencoders/latent_upsampler.py"
    ).read()
    for line in [
        "from diffusers import ConfigMixin, ModelMixin",
        "from safetensors.torch import safe_open",
        "from ltx_video.models.autoencoders.pixel_shuffle import PixelShuffleND",
    ]:
        src = src.replace(line, "")
    ps_src = open(
        "/root/reference/ltx_video/models/autoencoders/pixel_shuffle.py"
    ).read()
    ns = {"ConfigMixin": object, "ModelMixin": nn.Module, "safe_open": None}
    exec(compile(ps_src, "ref_pixel_shuffle.py", "exec"), ns)
    exec(compile(src, "ref_latent_upsampler.py", "exec"), ns)
    return ns


@pytest.mark.parametrize(
    "spatial,temporal", [(True, False), (False, True), (True, True)]
)
def test_latent_upsampler_matches_reference(spatial, temporal):
    ns = _load_ref()
    cfg = jup.LatentUpsamplerConfig(
        in_channels=4, mid_channels=32, num_blocks_per_stage=1,
        spatial_upsample=spatial, temporal_upsample=temporal,
    )
    torch.manual_seed(0)
    ref = ns["LatentUpsampler"](
        in_channels=4, mid_channels=32, num_blocks_per_stage=1, dims=3,
        spatial_upsample=spatial, temporal_upsample=temporal,
    ).eval().float()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert_latent_upsampler(sd, dtype=jnp.float32)

    rng = np.random.RandomState(0)
    z = rng.randn(1, 4, 3, 4, 4).astype(np.float32)  # [B,C,F,H,W]
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(z.copy())).numpy()
    mine = jup.forward(
        params, cfg, jnp.asarray(np.transpose(z, (0, 2, 3, 4, 1)))
    )
    mine = np.transpose(np.asarray(mine), (0, 4, 1, 2, 3))
    assert mine.shape == ref_out.shape, (mine.shape, ref_out.shape)
    np.testing.assert_allclose(mine, ref_out, atol=3e-4, rtol=3e-4)
