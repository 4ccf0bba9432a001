import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ltx_video_gpupoor_tpu.models.wan import model as wm
from ltx_video_gpupoor_tpu.models.wan import vae as wv
from ltx_video_gpupoor_tpu.pipelines.wan import (
    TEACACHE_COEFFICIENTS,
    WanPipeline,
    optimized_scale,
    teacache_skip_schedule,
)

VAE_CFG = wv.WanVAEConfig(
    dim=8, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
    attn_scales=(), temperal_downsample=(True,),
)
# vae stride with one temporal downsample and one spatial stage: (2, 2, 2)
STRIDE = (2, 2, 2)

T2V_CFG = wm.WanConfig(
    model_type="t2v", patch_size=(1, 2, 2), text_len=16, in_dim=4,
    dim=64, ffn_dim=128, freq_dim=32, text_dim=24, out_dim=4,
    num_heads=2, num_layers=2,
)


@pytest.fixture(scope="module")
def pipe():
    return WanPipeline(
        model_params=wm.init_params(jax.random.key(0), T2V_CFG),
        model_cfg=T2V_CFG,
        vae_params=wv.init_params(jax.random.key(1), VAE_CFG),
        vae_cfg=VAE_CFG,
        vae_stride=STRIDE,
    )


def _ctx(b=2):
    ctx = jax.random.normal(jax.random.key(2), (b, 16, 24))
    mask = jnp.ones((b, 16), jnp.int32)
    return ctx, mask


def test_t2v_latent(pipe):
    ctx, mask = _ctx()
    out = pipe.generate_t2v(
        ctx, mask, width=16, height=16, frame_num=5,
        sampling_steps=4, guide_scale=3.0, key=jax.random.key(0),
    )
    assert out.shape == (1, 3, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_t2v_pixels_and_solvers(pipe):
    ctx, mask = _ctx()
    for solver in ("unipc", "dpm++"):
        out = pipe.generate_t2v(
            ctx, mask, width=16, height=16, frame_num=5,
            sampling_steps=3, guide_scale=2.0, solver=solver,
            key=jax.random.key(1), output_type="pixels",
        )
        assert out.shape == (1, 5, 16, 16, 3)
        assert np.isfinite(np.asarray(out)).all()


def test_t2v_no_cfg(pipe):
    ctx, mask = _ctx()
    out = pipe.generate_t2v(
        ctx, mask, width=16, height=16, frame_num=5,
        sampling_steps=2, guide_scale=1.0, key=jax.random.key(0),
    )
    assert np.isfinite(np.asarray(out)).all()


def test_t2v_slg(pipe):
    ctx, mask = _ctx()
    base = pipe.generate_t2v(
        ctx, mask, width=16, height=16, frame_num=5,
        sampling_steps=3, guide_scale=3.0, key=jax.random.key(0),
    )
    out = pipe.generate_t2v(
        ctx, mask, width=16, height=16, frame_num=5,
        sampling_steps=3, guide_scale=3.0, key=jax.random.key(0),
        slg_layers=[1], slg_start=0.0, slg_end=1.0,
    )
    assert np.abs(np.asarray(out) - np.asarray(base)).max() > 1e-5


def test_cfg_zero_early_steps_are_plain_cfg(pipe):
    """The reference's 'zero the prediction for i <= cfg_zero_step' is
    dead code (text2video.py:558-563 overwrites it); the executed
    behavior merely skips the alpha rescale early. A 2-step run with
    cfg_zero_step=5 must therefore equal plain CFG exactly."""
    p = pipe
    ctx, mask = _ctx()
    kw = dict(width=16, height=16, frame_num=5, sampling_steps=2,
              guide_scale=3.0, key=jax.random.key(0))
    star = p.generate_t2v(ctx, mask, cfg_star_switch=True,
                          cfg_zero_step=5, **kw)
    plain = p.generate_t2v(ctx, mask, cfg_star_switch=False, **kw)
    np.testing.assert_allclose(np.asarray(star), np.asarray(plain))


def test_euler_solver_runs_and_differs_from_unipc(pipe):
    """solver='euler' must run the flow-match Euler integrator (it
    previously fell through to DPM++ silently)."""
    p = pipe
    ctx, mask = _ctx()
    kw = dict(width=16, height=16, frame_num=5, sampling_steps=4,
              guide_scale=2.0, key=jax.random.key(0))
    eu = p.generate_t2v(ctx, mask, solver="euler", **kw)
    un = p.generate_t2v(ctx, mask, solver="unipc", **kw)
    assert np.isfinite(np.asarray(eu)).all()
    assert np.abs(np.asarray(eu) - np.asarray(un)).max() > 1e-6
    with pytest.raises(ValueError, match="unsupported solver"):
        p.generate_t2v(ctx, mask, solver="heun", **kw)


def test_phantom_guide_scale_one_single_stream(pipe):
    """Phantom refs with guide_scale == 1: the reference runs ONE cond
    pass on the bare latents (text2video.py:498-500) — the result must
    equal a plain no-CFG run, refs ignored."""
    p = pipe
    ctx, mask = _ctx()
    refs = jax.random.normal(jax.random.key(7), (1, 1, 8, 8, 4))
    kw = dict(width=16, height=16, frame_num=5, sampling_steps=2,
              guide_scale=1.0, key=jax.random.key(0))
    with_refs = p.generate_t2v(
        ctx, mask, ref_latents=refs, ref_latents_neg=refs, **kw
    )
    without = p.generate_t2v(ctx, mask, **kw)
    np.testing.assert_allclose(np.asarray(with_refs), np.asarray(without))


def test_teacache_schedule(pipe):
    ts = np.linspace(999, 1, 20)
    # small constant rescale polynomial -> deltas are controllable, so the
    # threshold search can actually hit the target step count
    mask = teacache_skip_schedule(
        pipe.model_params, pipe.model_cfg, ts,
        [0.0, 0.0, 0.0, 0.0, 0.05], multiplier=2.0,
    )
    assert mask.shape == (20,)
    assert mask[0] and mask[-1]          # first and last always run
    assert 2 <= mask.sum() < 20          # some steps skipped
    # roughly hits the target of total/multiplier executed steps
    assert abs(int(mask.sum()) - 10) <= 3


def test_t2v_with_teacache_runs(pipe):
    ctx, mask = _ctx()
    out = pipe.generate_t2v(
        ctx, mask, width=16, height=16, frame_num=5,
        sampling_steps=6, guide_scale=2.0, key=jax.random.key(0),
        teacache_multiplier=1.5, teacache_model="t2v_1.3B",
    )
    assert np.isfinite(np.asarray(out)).all()


def test_i2v_pipeline():
    cfg = wm.WanConfig(
        model_type="i2v", patch_size=(1, 2, 2), text_len=16,
        in_dim=4 + 2 + 4,  # x(z=4) + y(msk=t_stride=2 + latent z=4)
        dim=64, ffn_dim=128, freq_dim=32, text_dim=24, out_dim=4,
        num_heads=2, num_layers=2,
    )
    pipe = WanPipeline(
        model_params=wm.init_params(jax.random.key(3), cfg),
        model_cfg=cfg,
        vae_params=wv.init_params(jax.random.key(1), VAE_CFG),
        vae_cfg=VAE_CFG,
        vae_stride=STRIDE,
    )
    ctx, mask = _ctx()
    clip = jax.random.normal(jax.random.key(4), (1, 257, 1280))
    first = jax.random.uniform(jax.random.key(5), (16, 16, 3)) * 2 - 1
    out = pipe.generate_i2v(
        ctx, mask, clip, first, width=16, height=16, frame_num=5,
        sampling_steps=3, guide_scale=2.0, key=jax.random.key(0),
    )
    assert out.shape == (1, 3, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_optimized_scale():
    a = jnp.asarray([1.0, 2.0])
    np.testing.assert_allclose(float(optimized_scale(a, a)), 1.0, atol=1e-5)
    np.testing.assert_allclose(
        float(optimized_scale(2 * a, a)), 2.0, atol=1e-5
    )


def test_sliding_window_continuation(pipe):
    ctx, mask = _ctx()
    # window 1: request a latent slice for continuation
    out1 = pipe.generate_t2v(
        ctx, mask, width=16, height=16, frame_num=5,
        sampling_steps=3, guide_scale=1.0, key=jax.random.key(0),
        return_latent_slice=slice(-2, None),
    )
    assert set(out1) == {"x", "latent_slice"}
    tail = out1["latent_slice"]
    assert tail.shape[1] == 2
    # window 2: continue with the overlapped latents pinned
    out2 = pipe.generate_t2v(
        ctx, mask, width=16, height=16, frame_num=5,
        sampling_steps=3, guide_scale=1.0, key=jax.random.key(1),
        overlapped_latents=tail, overlap_noise=20,
    )
    # the overlap region is restored to the clean tail latents
    np.testing.assert_allclose(
        np.asarray(out2[:, :2]), np.asarray(tail), atol=1e-5
    )
