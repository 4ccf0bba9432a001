"""Sequence-parallel attention tests on the virtual 8-device CPU mesh —
Ulysses all-to-all and ring attention must match single-device attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ltx_video_gpupoor_tpu.core import MeshConfig, make_mesh
from ltx_video_gpupoor_tpu.ops.flash_attention import reference_attention
from ltx_video_gpupoor_tpu.parallel.ring_attention import (
    ring_attention_sharded,
)
from ltx_video_gpupoor_tpu.parallel.sharding import (
    token_sharding,
    transformer_param_shardings,
)
from ltx_video_gpupoor_tpu.parallel.ulysses import ulysses_attention_sharded


@pytest.fixture(scope="module")
def sp_mesh():
    return make_mesh(MeshConfig(dp=1, sp=8, tp=1))


def _qkv(b=1, h=8, s=256, d=32):
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(k1, (b, h, s, d))
    k = jax.random.normal(k2, (b, h, s, d))
    v = jax.random.normal(k3, (b, h, s, d))
    return q, k, v


def test_ulysses_matches_reference(sp_mesh):
    q, k, v = _qkv()
    out = ulysses_attention_sharded(sp_mesh, q, k, v, attn_mode="xla")
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_matches_reference(sp_mesh):
    q, k, v = _qkv()
    out = ring_attention_sharded(sp_mesh, q, k, v)
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def test_ring_under_jit(sp_mesh):
    q, k, v = _qkv(h=2, s=128)

    @jax.jit
    def run(q, k, v):
        return ring_attention_sharded(sp_mesh, q, k, v)

    out = run(q, k, v)
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_transformer_shardings_cover_tree(mesh8):
    from ltx_video_gpupoor_tpu.models.ltx.transformer3d import (
        LTXTransformerConfig,
        init_params,
    )

    cfg = LTXTransformerConfig(
        num_attention_heads=2, attention_head_dim=8, in_channels=4,
        out_channels=4, num_layers=2, cross_attention_dim=16,
        caption_channels=8,
    )
    params = init_params(jax.random.key(0), cfg)
    shardings = transformer_param_shardings(mesh8, params)
    assert jax.tree.structure(shardings) == jax.tree.structure(params)
    # qkv kernels sharded over tp on the output dim
    spec = shardings["blocks"]["attn1"]["to_q"]["kernel"].spec
    assert spec == jax.sharding.PartitionSpec(None, None, "tp")
    placed = jax.tree.map(jax.device_put, params, shardings)
    assert placed["blocks"]["attn1"]["to_q"]["kernel"].sharding.spec == spec


def test_sharded_pipeline_matches_single_device(mesh8):
    """End-to-end: tp-sharded weights + XLA SPMD produce the same latents
    as the unsharded pipeline."""
    from ltx_video_gpupoor_tpu.models.ltx import vae as ltx_vae
    from ltx_video_gpupoor_tpu.models.ltx.transformer3d import (
        LTXTransformerConfig,
        init_params as tf_init,
    )
    from ltx_video_gpupoor_tpu.pipelines.ltx_pipeline import LTXPipeline
    from ltx_video_gpupoor_tpu.parallel.sharding import shard_pipeline

    cfg = LTXTransformerConfig(
        num_attention_heads=4, attention_head_dim=8, in_channels=8,
        out_channels=8, num_layers=2, cross_attention_dim=16,
        caption_channels=24,
    )
    vae_cfg = ltx_vae.VAEConfig.from_dict({
        "_class_name": "CausalVideoAutoencoder", "dims": 3,
        "latent_channels": 8,
        "blocks": [["res_x", 1], ["compress_all", 1]],
        "base_channels": 8, "norm_num_groups": 4, "patch_size": 2,
        "norm_layer": "pixel_norm", "latent_log_var": "uniform",
        "use_quant_conv": False, "causal_decoder": False,
    })
    pipe = LTXPipeline(
        transformer_params=tf_init(jax.random.key(0), cfg),
        transformer_cfg=cfg,
        vae_params=ltx_vae.init_params(jax.random.key(1), vae_cfg),
        vae_cfg=vae_cfg,
    )
    emb = jax.random.normal(jax.random.key(2), (2, 8, cfg.caption_channels))
    mask = jnp.ones((2, 8), jnp.int32)
    kw = dict(height=32, width=32, num_frames=9, num_inference_steps=2,
              guidance_scale=2.0, output_type="latent", attn_mode="xla")
    base = pipe.generate(emb, mask, key=jax.random.key(3), **kw)

    sharded = shard_pipeline(pipe, mesh8)
    spec = sharded.transformer_params["blocks"]["attn1"]["to_q"]["kernel"]
    assert spec.sharding.spec == jax.sharding.PartitionSpec(None, None, "tp")
    out = sharded.generate(emb, mask, key=jax.random.key(3), **kw)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(base), atol=1e-4, rtol=1e-4
    )


def test_usp_wan_forward_matches_single_device(sp_mesh):
    """Model-level USP (ulysses inside shard_map over sp): the reference's
    usp_dit_forward equivalent. Frames sharded, global RoPE by
    construction, no all-gather before the head."""
    from ltx_video_gpupoor_tpu.models.wan import model as wan_model
    from ltx_video_gpupoor_tpu.ops.rope import wan_rope_freqs
    from ltx_video_gpupoor_tpu.parallel.usp import usp_wan_forward

    cfg = wan_model.WanConfig(
        dim=512, ffn_dim=1024, num_heads=8, num_layers=2, text_dim=256,
    )
    params = wan_model.init_params(jax.random.key(0), cfg)
    f, h, w = 8, 8, 12   # frames divide sp=8; heads (8) divide sp=8
    x = jax.random.normal(jax.random.key(1), (1, f, h, w, cfg.in_dim))
    t = jnp.full((1,), 400.0)
    ctx = jax.random.normal(jax.random.key(2), (1, 64, cfg.text_dim))
    cmask = jnp.ones((1, 64), jnp.int32).at[:, 50:].set(0)
    freqs = wan_rope_freqs((f, h // 2, w // 2), cfg.head_dim)

    ref, ref_res = wan_model.forward(params, cfg, x, t, ctx, cmask, freqs)
    out, res = usp_wan_forward(
        sp_mesh, params, cfg, x, t, ctx, cmask, freqs, axis_name="sp"
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(res), np.asarray(ref_res), atol=2e-4, rtol=2e-4
    )


def test_usp_wan_vace_recam_matches_single_device(sp_mesh):
    """VACE hint stream + ReCamMaster poses under USP equal the
    single-device forward: hints are frame-aligned so they shard with the
    frames and ride the same Ulysses exchange; poses are pre-expanded to
    one row per frame (``expand_cam_to_frames``) so shard k>0 encodes its
    GLOBAL frames' poses rather than shard 0's (the failure a per-shard
    tile-and-slice would produce)."""
    from ltx_video_gpupoor_tpu.models.wan import model as wan_model
    from ltx_video_gpupoor_tpu.ops.rope import wan_rope_freqs
    from ltx_video_gpupoor_tpu.parallel.usp import usp_wan_forward

    cfg = wan_model.WanConfig(
        dim=512, ffn_dim=1024, num_heads=8, num_layers=2, text_dim=256,
        vace_layers=(0,), vace_in_dim=96, recammaster=True,
    )
    params = wan_model.init_params(jax.random.key(0), cfg)
    # after_proj inits to zeros (reference parity) — randomize it so the
    # hint path actually contributes; same for the identity projector
    kr = iter(jax.random.split(jax.random.key(7), 4))
    vp0 = params["vace_blocks"][0]
    vp0["after_proj"]["kernel"] = (
        jax.random.normal(next(kr), vp0["after_proj"]["kernel"].shape) * 0.02
    )
    vp0["before_proj"]["kernel"] = (
        jax.random.normal(next(kr), vp0["before_proj"]["kernel"].shape) * 0.02
    )
    params["blocks"]["projector"]["kernel"] = (
        params["blocks"]["projector"]["kernel"]
        + jax.random.normal(
            next(kr), params["blocks"]["projector"]["kernel"].shape
        ) * 0.02
    )
    f, h, w = 8, 8, 12
    x = jax.random.normal(jax.random.key(1), (1, f, h, w, cfg.in_dim))
    t = jnp.full((1,), 400.0)
    ctx = jax.random.normal(jax.random.key(2), (1, 64, cfg.text_dim))
    cmask = jnp.ones((1, 64), jnp.int32)
    freqs = wan_rope_freqs((f, h // 2, w // 2), cfg.head_dim)
    vctx = jax.random.normal(jax.random.key(3), (1, f, h, w, 96))
    # F' = f//2 pose rows: the reference tiles (repeat(1,2,1)) to cover f
    cam = jax.random.normal(jax.random.key(4), (1, f // 2, 12))

    ref, _ = wan_model.forward(
        params, cfg, x, t, ctx, cmask, freqs,
        vace_context=vctx, vace_scale=1.3, cam_emb=cam,
    )
    out, _ = usp_wan_forward(
        sp_mesh, params, cfg, x, t, ctx, cmask, freqs, axis_name="sp",
        vace_context=vctx, vace_scale=1.3, cam_emb=cam,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4
    )


def test_usp_wan_pipeline_matches_single_device(sp_mesh):
    """Pipeline-level USP: the full scanned denoise with the mesh set
    equals the single-device run (t2v, CFG, SLG window, TeaCache off)."""
    import dataclasses as dc

    from ltx_video_gpupoor_tpu.models.wan import model as wan_model
    from ltx_video_gpupoor_tpu.models.wan import vae as wvae
    from ltx_video_gpupoor_tpu.pipelines.wan import WanPipeline
    from ltx_video_gpupoor_tpu.schedulers import unipc

    cfg = wan_model.WanConfig(
        dim=256, ffn_dim=512, num_heads=8, num_layers=2, text_dim=128,
    )
    vcfg = wvae.WanVAEConfig(
        dim=8, z_dim=16, dim_mult=(1, 2), num_res_blocks=1,
        temperal_downsample=(True,),
    )
    params = wan_model.init_params(jax.random.key(0), cfg)
    vparams = wvae.init_params(jax.random.key(1), vcfg)
    pipe = WanPipeline(
        model_params=params, model_cfg=cfg,
        vae_params=vparams, vae_cfg=vcfg, vae_tile_size=0,
    )
    lat = jax.random.normal(jax.random.key(2), (1, 8, 8, 12, 16))
    ctx = jax.random.normal(jax.random.key(3), (2, 32, cfg.text_dim))
    cmask = jnp.ones((2, 32), jnp.int32)
    sigmas = unipc.unipc_sigmas(4, shift=5.0)
    kwargs = dict(
        guide_scale=5.0, solver="unipc", slg_layers=[1],
        slg_start=0.0, slg_end=1.0, key=jax.random.key(4),
    )
    ref = np.asarray(pipe.denoise(lat, ctx, cmask, sigmas, **kwargs))
    pipe_sp = dc.replace(pipe, sp_mesh=sp_mesh)
    out = np.asarray(pipe_sp.denoise(lat, ctx, cmask, sigmas, **kwargs))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_headpar_attention_matches_unsharded(mesh8):
    """The SPMD head-partitioning rule (ops/headpar.py): head-sharded
    q/k/v run the kernel per-shard with numerics equal to the unsharded
    call, and the output keeps the head sharding (no all-gather)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ltx_video_gpupoor_tpu.ops.headpar import headpar_flash_attention

    b, h, s, d = 2, 8, 256, 32
    kq, kk, kv = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(kq, (b, h, s, d), jnp.float32)
    k = jax.random.normal(kk, (b, h, s, d), jnp.float32)
    v = jax.random.normal(kv, (b, h, s, d), jnp.float32)

    ref = headpar_flash_attention(q, k, v, interpret=True)

    sh = NamedSharding(mesh8, P(None, "tp", None, None))
    out = jax.jit(
        lambda a, bb, c: headpar_flash_attention(a, bb, c, interpret=True)
    )(jax.device_put(q, sh), jax.device_put(k, sh), jax.device_put(v, sh))
    assert "tp" in tuple(out.sharding.spec)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
    )

    # the quantized tier shares the wrapper (static args): int8-QK under
    # head partitioning must also match its unsharded self
    ref8 = headpar_flash_attention(q, k, v, qk_int8=True, interpret=True)
    out8 = jax.jit(
        lambda a, bb, c: headpar_flash_attention(a, bb, c, qk_int8=True,
                                                 interpret=True)
    )(jax.device_put(q, sh), jax.device_put(k, sh), jax.device_put(v, sh))
    np.testing.assert_allclose(
        np.asarray(out8), np.asarray(ref8), atol=1e-5, rtol=1e-5
    )

    # q-token sharding is also legal (rows are independent; kv replicates)
    sh_s = NamedSharding(mesh8, P(None, None, "sp", None))
    out_s = jax.jit(
        lambda a, bb, c: headpar_flash_attention(a, bb, c, interpret=True)
    )(jax.device_put(q, sh_s), jax.device_put(k, sh_s),
      jax.device_put(v, sh_s))
    np.testing.assert_allclose(
        np.asarray(out_s), np.asarray(ref), atol=1e-5, rtol=1e-5
    )


def test_headpar_gate_ignored_inside_shard_map(sp_mesh, monkeypatch):
    """The env gate must not wrap the kernel under manual axes: USP's
    local attention still runs (and matches) with the gate set."""
    from ltx_video_gpupoor_tpu.parallel.ulysses import ulysses_attention
    from ltx_video_gpupoor_tpu.ops.attention import attention
    from jax.sharding import PartitionSpec as P

    monkeypatch.setenv("LTXV_TPU_ATTN_HEADPAR", "1")
    b, h, s, d = 1, 8, 128, 16
    kq, kk, kv = jax.random.split(jax.random.key(1), 3)
    q = jax.random.normal(kq, (b, h, s, d), jnp.float32)
    k = jax.random.normal(kk, (b, h, s, d), jnp.float32)
    v = jax.random.normal(kv, (b, h, s, d), jnp.float32)
    ref = attention(q, k, v, mode="xla")
    fn = jax.shard_map(
        lambda a, bb, c: ulysses_attention(a, bb, c, axis_name="sp",
                                           attn_mode="xla"),
        mesh=sp_mesh, in_specs=P(None, None, "sp", None),
        out_specs=P(None, None, "sp", None), check_vma=False,
    )
    out = fn(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def test_wan_tp_sharded_forward_matches_single_device(mesh8):
    """Pure-SPMD tensor parallelism for Wan: weights sharded over 'tp'
    (wan_param_shardings), the jitted forward partitioned by XLA —
    numerics equal to the unsharded run."""
    from ltx_video_gpupoor_tpu.models.wan import model as wan_model
    from ltx_video_gpupoor_tpu.ops.rope import wan_rope_freqs
    from ltx_video_gpupoor_tpu.parallel.sharding import wan_param_shardings

    cfg = wan_model.WanConfig(
        dim=128, ffn_dim=256, num_heads=4, num_layers=2, text_dim=64,
        in_dim=4, out_dim=4, freq_dim=32, text_len=8,
        patch_size=(1, 2, 2), model_type="t2v",
    )
    params = wan_model.init_params(jax.random.key(0), cfg)
    f, h, w = 2, 4, 4
    x = jax.random.normal(jax.random.key(1), (1, f, h, w, cfg.in_dim))
    ctx = jax.random.normal(jax.random.key(2), (1, 8, cfg.text_dim))
    cmask = jnp.ones((1, 8), jnp.int32)
    t = jnp.full((1,), 500.0)
    freqs = wan_rope_freqs((f, h // 2, w // 2), cfg.head_dim)

    fn = jax.jit(lambda p, x, t: wan_model.forward(
        p, cfg, x, t, ctx, cmask, freqs, attn_mode="xla"))
    ref, _ = fn(params, x, t)
    sharded = jax.tree.map(
        jax.device_put, params, wan_param_shardings(mesh8, params)
    )
    out, _ = fn(sharded, x, t)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def test_t5_tp_sharded_encode_matches_single_device(mesh8):
    """T5/UMT5 weights shard over 'tp' (the 9.4 GB XXL replication was
    pure HBM waste on tp meshes); the SPMD encode matches unsharded."""
    from jax.sharding import PartitionSpec as P

    from ltx_video_gpupoor_tpu.models import t5 as jt5
    from ltx_video_gpupoor_tpu.parallel.sharding import t5_param_shardings

    cfg = jt5.T5Config(vocab_size=100, dim=64, dim_attn=64, dim_ffn=128,
                       num_heads=4, num_layers=2)
    params = jt5.init_params(jax.random.key(0), cfg)
    sh = t5_param_shardings(mesh8, params)
    assert sh["blocks"]["attn"]["q"]["kernel"].spec == P(None, None, "tp")
    assert sh["blocks"]["ffn"]["fc2"]["kernel"].spec == P(None, "tp", None)

    ids = jax.random.randint(jax.random.key(1), (2, 16), 0, 100)
    mask = jnp.ones((2, 16), jnp.int32)
    ref = jt5.encode(params, cfg, ids, mask)
    out = jt5.encode(jax.tree.map(jax.device_put, params, sh), cfg, ids,
                     mask)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def test_quantized_tp_shardings_match_single_device(mesh8):
    """Pre-quantized trees (the production checkpoint format) shard over
    'tp' too: int8 weights split like their bf16 kernels, out-split
    scales follow, and the SPMD forward matches the unsharded run."""
    from jax.sharding import PartitionSpec as P

    from ltx_video_gpupoor_tpu.models.ltx import transformer3d as t3d
    from ltx_video_gpupoor_tpu.ops.quant import quantize_params
    from ltx_video_gpupoor_tpu.parallel.sharding import (
        transformer_param_shardings,
    )

    cfg = t3d.LTXTransformerConfig(
        num_attention_heads=4, attention_head_dim=32, in_channels=16,
        out_channels=16, num_layers=2, cross_attention_dim=64,
        caption_channels=32,
    )
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16),
        t3d.init_params(jax.random.key(0), cfg),
    )
    params = quantize_params(params, mode="dynamic")
    sh = transformer_param_shardings(mesh8, params)
    attn1 = sh["blocks"]["attn1"]
    assert attn1["to_q"]["w_int8_dyn"].spec == P(None, None, "tp")
    assert attn1["to_q"]["scale"].spec == P(None, "tp")
    assert attn1["to_out"]["w_int8_dyn"].spec == P(None, "tp", None)
    assert attn1["to_out"]["scale"].spec == P()

    b, s, sc = 2, 32, 8
    lat = jax.random.normal(jax.random.key(1), (b, s, 16), jnp.bfloat16)
    coords = jnp.tile(
        jax.random.uniform(jax.random.key(2), (1, 3, s), jnp.float32, 0, 8),
        (b, 1, 1),
    )
    cap = jax.random.normal(jax.random.key(3), (b, sc, 32), jnp.bfloat16)
    cmask = jnp.ones((b, sc), jnp.int32)
    t = jnp.full((b,), 0.4, jnp.float32)
    fn = jax.jit(lambda p: t3d.forward(p, cfg, lat, coords, t, cap, cmask,
                                       attn_mode="xla"))
    ref = fn(params)
    out = fn(jax.tree.map(jax.device_put, params, sh))
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_usp_wan_pipeline_fallback_on_indivisible_shapes(sp_mesh):
    """Serving contract: a request whose frames don't divide sp runs
    single-device (bit-identical to the no-mesh run) instead of raising."""
    import dataclasses as dc

    from ltx_video_gpupoor_tpu.models.wan import model as wan_model
    from ltx_video_gpupoor_tpu.models.wan import vae as wvae
    from ltx_video_gpupoor_tpu.pipelines.wan import WanPipeline
    from ltx_video_gpupoor_tpu.schedulers import unipc

    cfg = wan_model.WanConfig(
        dim=256, ffn_dim=512, num_heads=8, num_layers=2, text_dim=128,
    )
    vcfg = wvae.WanVAEConfig(
        dim=8, z_dim=16, dim_mult=(1, 2), num_res_blocks=1,
        temperal_downsample=(True,),
    )
    pipe = WanPipeline(
        model_params=wan_model.init_params(jax.random.key(0), cfg),
        model_cfg=cfg,
        vae_params=wvae.init_params(jax.random.key(1), vcfg),
        vae_cfg=vcfg, vae_tile_size=0,
    )
    lat = jax.random.normal(jax.random.key(2), (1, 7, 8, 12, 16))  # 7 % 8 != 0
    ctx = jax.random.normal(jax.random.key(3), (2, 32, cfg.text_dim))
    cmask = jnp.ones((2, 32), jnp.int32)
    sigmas = unipc.unipc_sigmas(2, shift=5.0)
    kwargs = dict(guide_scale=5.0, solver="unipc", key=jax.random.key(4))
    ref = np.asarray(pipe.denoise(lat, ctx, cmask, sigmas, **kwargs))
    out = np.asarray(
        dc.replace(pipe, sp_mesh=sp_mesh).denoise(
            lat, ctx, cmask, sigmas, **kwargs
        )
    )
    np.testing.assert_array_equal(out, ref)


def test_usp_ltx_pipeline_matches_single_device(mesh8):
    """LTX flagship under USP (sp=2 of the dp2/sp2/tp2 mesh): generate()
    with sp_mesh set equals the single-device run — CFG + STG + per-group
    conditioning timesteps all under the shard_map."""
    import dataclasses as dc

    from ltx_video_gpupoor_tpu.models.ltx import vae as ltx_vae
    from ltx_video_gpupoor_tpu.models.ltx.transformer3d import (
        LTXTransformerConfig,
        init_params as tf_init,
    )
    from ltx_video_gpupoor_tpu.pipelines.ltx_pipeline import LTXPipeline

    cfg = LTXTransformerConfig(
        num_attention_heads=2, attention_head_dim=16, in_channels=8,
        out_channels=8, num_layers=2, cross_attention_dim=32,
        caption_channels=24,
    )
    vcfg = ltx_vae.VAEConfig.from_dict({
        "_class_name": "CausalVideoAutoencoder",
        "dims": 3,
        "latent_channels": 8,
        "blocks": [["res_x", 1], ["compress_all", 1], ["res_x", 1]],
        "base_channels": 8,
        "norm_num_groups": 4,
        "patch_size": 2,
        "norm_layer": "pixel_norm",
        "latent_log_var": "uniform",
        "use_quant_conv": False,
        "causal_decoder": False,
    })
    pipe = LTXPipeline(
        transformer_params=tf_init(jax.random.key(0), cfg),
        transformer_cfg=cfg,
        vae_params=ltx_vae.init_params(jax.random.key(1), vcfg),
        vae_cfg=vcfg,
    )
    emb = jax.random.normal(jax.random.key(2), (2, 8, cfg.caption_channels))
    mask = jnp.ones((2, 8), jnp.int32)
    kwargs = dict(
        height=32, width=32, num_frames=7,  # f_lat=4 divides sp=2
        num_inference_steps=3, guidance_scale=3.0, stg_scale=1.0,
        skip_block_list=[1], key=jax.random.key(3), output_type="latent",
    )
    ref = np.asarray(pipe.generate(emb, mask, **kwargs))
    pipe_sp = dc.replace(pipe, sp_mesh=mesh8)
    out = np.asarray(pipe_sp.generate(emb, mask, **kwargs))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_mixed_int4_tp_shardings_match_single_device(mesh8):
    """r5: the mixed int4 tier (per-group int4 bulk + int8 sensitive
    leaves) shards over 'tp' — the packed int4 weight splits like its
    bf16 kernel, the 2-D per-group scale mirrors the kernel spec on
    out-split layers and replicates on in-split — and the SPMD forward
    matches the unsharded run."""
    from jax.sharding import PartitionSpec as P

    from ltx_video_gpupoor_tpu.models.ltx import transformer3d as t3d
    from ltx_video_gpupoor_tpu.ops.quant import quantize_params
    from ltx_video_gpupoor_tpu.parallel.sharding import (
        transformer_param_shardings,
    )

    cfg = t3d.LTXTransformerConfig(
        num_attention_heads=4, attention_head_dim=32, in_channels=16,
        out_channels=16, num_layers=2, cross_attention_dim=64,
        caption_channels=32,
    )
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16),
        t3d.init_params(jax.random.key(0), cfg),
    )
    params = quantize_params(params, mode="mixed_int4")
    sh = transformer_param_shardings(mesh8, params)
    attn1 = sh["blocks"]["attn1"]
    assert attn1["to_q"]["w_int4"].spec == P(None, None, "tp")
    # per-group scale [L, in/g, out]: out on tp (mirrors the kernel)
    assert attn1["to_q"]["scale"].spec == P(None, None, "tp")
    # in-split kernel: per-group scale replicates (group dim of tiny
    # configs need not divide tp)
    assert attn1["to_out"]["w_int4"].spec == P(None, "tp", None)
    assert attn1["to_out"]["scale"].spec == P()
    # sensitive leaves landed on int8-WO and replicate (unmatched rules)
    assert "w_int8" in sh["adaln"]["linear"]

    b, s, sc = 2, 32, 8
    lat = jax.random.normal(jax.random.key(1), (b, s, 16), jnp.bfloat16)
    coords = jnp.tile(
        jax.random.uniform(jax.random.key(2), (1, 3, s), jnp.float32, 0, 8),
        (b, 1, 1),
    )
    cap = jax.random.normal(jax.random.key(3), (b, sc, 32), jnp.bfloat16)
    cmask = jnp.ones((b, sc), jnp.int32)
    t = jnp.full((b,), 0.4, jnp.float32)
    fn = jax.jit(lambda p: t3d.forward(p, cfg, lat, coords, t, cap, cmask,
                                       attn_mode="xla"))
    ref = fn(params)
    out = fn(jax.tree.map(jax.device_put, params, sh))
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )
