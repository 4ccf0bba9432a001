import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ltx_video_gpupoor_tpu.core.interrupt import Interrupted, InterruptFlag
from ltx_video_gpupoor_tpu.models.ltx import vae as ltx_vae
from ltx_video_gpupoor_tpu.models.ltx.transformer3d import (
    LTXTransformerConfig,
    init_params as tf_init,
)
from ltx_video_gpupoor_tpu.pipelines.ltx_pipeline import LTXPipeline
from ltx_video_gpupoor_tpu.utils.observability import Metrics, StageTimer

TF_CFG = LTXTransformerConfig(
    num_attention_heads=2, attention_head_dim=16, in_channels=8,
    out_channels=8, num_layers=1, cross_attention_dim=32, caption_channels=24,
)
VAE_CFG = ltx_vae.VAEConfig.from_dict({
    "_class_name": "CausalVideoAutoencoder",
    "dims": 3, "latent_channels": 8,
    "blocks": [["res_x", 1], ["compress_all", 1]],
    "base_channels": 8, "norm_num_groups": 4, "patch_size": 2,
    "norm_layer": "pixel_norm", "latent_log_var": "uniform",
    "use_quant_conv": False, "causal_decoder": False,
})


@pytest.fixture(scope="module")
def pipe():
    return LTXPipeline(
        transformer_params=tf_init(jax.random.key(0), TF_CFG),
        transformer_cfg=TF_CFG,
        vae_params=ltx_vae.init_params(jax.random.key(1), VAE_CFG),
        vae_cfg=VAE_CFG,
    )


def _prompts():
    emb = jax.random.normal(jax.random.key(2), (2, 8, TF_CFG.caption_channels))
    return emb, jnp.ones((2, 8), jnp.int32)


def test_stepwise_loop_matches_scan(pipe):
    emb, mask = _prompts()
    kw = dict(height=32, width=32, num_frames=9, num_inference_steps=3,
              guidance_scale=2.0, output_type="latent")
    scan_out = pipe.generate(emb, mask, key=jax.random.key(0), **kw)
    progress = []
    loop_out = pipe.generate(
        emb, mask, key=jax.random.key(0),
        progress_callback=lambda i, n: progress.append((i, n)), **kw,
    )
    np.testing.assert_allclose(
        np.asarray(scan_out), np.asarray(loop_out), atol=1e-4, rtol=1e-4
    )
    assert progress == [(0, 3), (1, 3), (2, 3)]


def test_interrupt_cancels_generation(pipe):
    emb, mask = _prompts()
    flag = InterruptFlag()
    steps_done = []

    def cb(i, n):
        steps_done.append(i)
        if i == 0:
            flag.interrupt()

    with pytest.raises(Interrupted):
        pipe.generate(
            emb, mask, height=32, width=32, num_frames=9,
            num_inference_steps=4, guidance_scale=2.0,
            output_type="latent", key=jax.random.key(0),
            interrupt_flag=flag, progress_callback=cb,
        )
    assert steps_done == [0]  # flag set after step 0; checked before step 1


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    rep = t.report()
    assert "a=" in rep and "b=" in rep and rep.startswith("total=")


def test_stage_marks_from_other_threads_are_noops():
    """Only the thread that entered collect_stages records: the server's
    background warmup thread also emits stage marks, and cross-thread
    pops/pushes would corrupt the collecting request's prefix stack."""
    import threading

    from ltx_video_gpupoor_tpu.utils import observability as obs

    t = StageTimer()
    with obs.collect_stages(t):
        started = threading.Event()
        release = threading.Event()

        def intruder():
            with obs.stage("warmup-noise"):
                started.set()
                release.wait(timeout=30)

        th = threading.Thread(target=intruder)
        th.start()
        started.wait(timeout=30)
        # the intruder is INSIDE its stage right now; ours must nest
        # under nothing and record under its own clean name
        with obs.stage("denoise"):
            pass
        release.set()
        th.join(timeout=30)
    assert list(t.stages) == ["denoise"]


def test_metrics():
    Metrics.reset()
    Metrics.inc("requests")
    Metrics.inc("requests")
    Metrics.set("last_latency_s", 1.5)
    snap = Metrics.snapshot()
    assert snap["counters"]["requests"] == 2
    assert snap["gauges"]["last_latency_s"] == 1.5


def test_stepwise_loop_matches_scan_with_teacache(pipe):
    """The host-loop (progress/interrupt) path carries the TeaCache
    residual tuple; it must equal the scanned run step for step."""
    import unittest.mock as um

    from ltx_video_gpupoor_tpu.pipelines import ltx_pipeline as lp

    emb, mask = _prompts()
    kw = dict(height=32, width=32, num_frames=9, num_inference_steps=4,
              guidance_scale=2.0, output_type="latent",
              teacache_multiplier=2.0)
    skip_mask = np.array([1, 1, 0, 1], bool)
    with um.patch.object(lp, "ltx_teacache_schedule",
                         lambda *a, **k: skip_mask):
        scan_out = pipe.generate(emb, mask, key=jax.random.key(0), **kw)
        loop_out = pipe.generate(
            emb, mask, key=jax.random.key(0),
            progress_callback=lambda i, n: None, **kw,
        )
    np.testing.assert_allclose(
        np.asarray(scan_out), np.asarray(loop_out), atol=1e-4, rtol=1e-4
    )
