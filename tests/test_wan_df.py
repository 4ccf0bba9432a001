import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ltx_video_gpupoor_tpu.models.wan import model as wm
from ltx_video_gpupoor_tpu.models.wan import vae as wv
from ltx_video_gpupoor_tpu.pipelines.wan_df import (
    WanDFPipeline,
    generate_timestep_matrix,
    snap_frame_num,
)


def test_snap_frame_num():
    assert snap_frame_num(17) == 17
    assert snap_frame_num(97) == 97
    assert snap_frame_num(5) == 17
    assert snap_frame_num(30) == 37


def _ref_matrix(num_frames, template, base, ar_step, pre, block):
    """Reference implementation executed with torch for comparison."""
    import importlib.util
    import torch

    # the reference method lives on the DTT2V class; port the call via a
    # minimal shim around the source lines (the function only uses torch)
    src = open("/root/reference/wan/diffusion_forcing.py").read()
    start = src.index("    def generate_timestep_matrix")
    end = src.index("    @torch.no_grad()", start)
    fn_src = "import math, torch\n" + (
        "def generate_timestep_matrix(self,\n"
        + src[start:end].split("self,\n", 1)[1]
    ).replace("\n    ", "\n")
    ns = {}
    exec(compile(fn_src, "ref_dtm.py", "exec"), ns)
    return ns["generate_timestep_matrix"](
        None, num_frames, torch.tensor(template), base, ar_step, pre, block
    )


@pytest.mark.parametrize(
    "frames,steps,ar,pre,block",
    [(8, 4, 2, 0, 1), (10, 5, 3, 2, 2), (6, 3, 0, 0, 1)],
)
def test_timestep_matrix_matches_reference(frames, steps, ar, pre, block):
    template = np.linspace(999, 1, steps).astype(np.int64)
    if ar == 0:
        block = 1
    sm, si, um, vi = generate_timestep_matrix(
        frames, template, frames, ar, pre, block
    )
    rsm, rsi, rum, rvi = _ref_matrix(frames, template, frames, ar, pre, block)
    np.testing.assert_array_equal(sm, rsm.numpy())
    np.testing.assert_array_equal(si, rsi.numpy())
    np.testing.assert_array_equal(um, rum.numpy())
    assert vi == [tuple(x) for x in rvi]


def test_df_pipeline_runs():
    vae_cfg = wv.WanVAEConfig(
        dim=8, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
        temperal_downsample=(True,),
    )
    cfg = wm.WanConfig(
        model_type="t2v", patch_size=(1, 2, 2), text_len=8, in_dim=4,
        dim=64, ffn_dim=128, freq_dim=32, text_dim=16, out_dim=4,
        num_heads=2, num_layers=2, inject_sample_info=True,
    )
    pipe = WanDFPipeline(
        model_params=wm.init_params(jax.random.key(0), cfg),
        model_cfg=cfg,
        vae_params=wv.init_params(jax.random.key(1), vae_cfg),
        vae_cfg=vae_cfg,
        vae_stride=(2, 2, 2),
    )
    ctx = jax.random.normal(jax.random.key(2), (2, 8, 16))
    mask = jnp.ones((2, 8), jnp.int32)
    out = pipe.generate(
        ctx, mask, height=8, width=8, frame_num=17, sampling_steps=3,
        ar_step=1, causal_block_size=1, guide_scale=2.0,
        key=jax.random.key(3),
    )
    # frame_num snapped to 17 -> f_lat = 9 with stride 2
    assert out.shape == (1, 9, 4, 4, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_df_pipeline_with_prefix():
    vae_cfg = wv.WanVAEConfig(
        dim=8, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
        temperal_downsample=(True,),
    )
    cfg = wm.WanConfig(
        model_type="t2v", patch_size=(1, 2, 2), text_len=8, in_dim=4,
        dim=64, ffn_dim=128, freq_dim=32, text_dim=16, out_dim=4,
        num_heads=2, num_layers=2,
    )
    pipe = WanDFPipeline(
        model_params=wm.init_params(jax.random.key(0), cfg),
        model_cfg=cfg,
        vae_params=wv.init_params(jax.random.key(1), vae_cfg),
        vae_cfg=vae_cfg,
        vae_stride=(2, 2, 2),
    )
    ctx = jax.random.normal(jax.random.key(2), (2, 8, 16))
    mask = jnp.ones((2, 8), jnp.int32)
    prefix = jax.random.uniform(jax.random.key(5), (1, 3, 8, 8, 3)) * 2 - 1
    out = pipe.generate(
        ctx, mask, height=8, width=8, frame_num=17, sampling_steps=3,
        ar_step=0, causal_block_size=1, guide_scale=1.0,
        prefix_video=prefix, overlap_noise=20, key=jax.random.key(3),
    )
    assert out.shape == (1, 9, 4, 4, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_df_pipeline_usp_matches_single_device():
    """Diffusion forcing sharded over ICI (BASELINE config: 'Wan
    diffusion-forcing long-video generation sharded over ICI'): the
    per-frame [B, F] timestep rows shard with the frames; the
    autoregressive timestep-matrix scan stays global. Must equal the
    single-device run."""
    import dataclasses as dc

    from ltx_video_gpupoor_tpu.core.mesh import MeshConfig, make_mesh

    vae_cfg = wv.WanVAEConfig(
        dim=8, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
        temperal_downsample=(True,),
    )
    cfg = wm.WanConfig(
        model_type="t2v", patch_size=(1, 2, 2), text_len=8, in_dim=4,
        dim=64, ffn_dim=128, freq_dim=32, text_dim=16, out_dim=4,
        num_heads=2, num_layers=2,
    )
    pipe = WanDFPipeline(
        model_params=wm.init_params(jax.random.key(0), cfg),
        model_cfg=cfg,
        vae_params=wv.init_params(jax.random.key(1), vae_cfg),
        vae_cfg=vae_cfg,
        vae_stride=(4, 2, 2),
    )
    ctx = jax.random.normal(jax.random.key(2), (2, 8, 16))
    mask = jnp.ones((2, 8), jnp.int32)
    kwargs = dict(
        height=8, width=8, frame_num=37, sampling_steps=3,
        ar_step=1, causal_block_size=2, guide_scale=2.0,
        key=jax.random.key(3),
    )
    ref = np.asarray(pipe.generate(ctx, mask, **kwargs))
    # f_lat = (37-1)/4 + 1 = 10 frames and 2 heads both divide sp=2
    mesh = make_mesh(MeshConfig(dp=1, sp=2, tp=1), devices=jax.devices()[:2])
    pipe_sp = dc.replace(pipe, sp_mesh=mesh)
    out = np.asarray(pipe_sp.generate(ctx, mask, **kwargs))
    assert ref.shape == (1, 10, 4, 4, 4)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)
