"""Training checkpoint/resume: save+restore round-trips bit-exactly,
resume matches an uninterrupted run, restore respects target shardings,
and retention prunes old steps."""

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
)
from ltx_video_gpupoor_tpu.training.checkpoint import TrainCheckpointer

CFG = LTXTransformerConfig(
    num_attention_heads=2, attention_head_dim=16, in_channels=8,
    out_channels=8, num_layers=2, cross_attention_dim=32,
    caption_channels=16,
)
TC = TrainConfig(learning_rate=2e-3, remat=False)


def _batch(seed, b=2, s=16, sc=4):
    rng = np.random.RandomState(seed)
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


def _run(step_fn, params, opt_state, key, n, start=0):
    for i in range(start, start + n):
        key, sub = jax.random.split(key)
        params, opt_state, metrics = step_fn(
            params, opt_state, _batch(i), sub
        )
    return params, opt_state, key, metrics


def test_resume_matches_uninterrupted(tmp_path):
    params0 = init_params(jax.random.key(0), CFG)
    opt0 = init_train_state(params0, TC)
    step_fn = jax.jit(make_train_step(CFG, TC, attn_mode="xla"))
    key0 = jax.random.key(1)

    # uninterrupted: 4 steps
    p_ref, o_ref, _, m_ref = _run(step_fn, params0, opt0, key0, 4)

    # interrupted: 2 steps -> save -> restore -> 2 steps
    p, o, key, _ = _run(step_fn, params0, opt0, key0, 2)
    ckpt = TrainCheckpointer(str(tmp_path / "run"))
    ckpt.save(2, p, o, key)
    assert ckpt.latest_step() == 2

    step, p2, o2, key2 = ckpt.restore(p, o, key)
    assert step == 2
    # round-trip is bit-exact
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        (p, o), (p2, o2),
    )
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(key)),
        np.asarray(jax.random.key_data(key2)),
    )

    p_res, o_res, _, m_res = _run(step_fn, p2, o2, key2, 2, start=2)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=0
        ),
        p_ref, p_res,
    )
    assert float(m_ref["loss"]) == float(m_res["loss"])
    ckpt.close()


def test_restore_onto_mesh(tmp_path):
    """A single-device save restores onto a dp×sp×tp mesh with the target
    tree's shardings (orbax reshards on read)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from ltx_video_gpupoor_tpu.core.mesh import MeshConfig, make_mesh
    from ltx_video_gpupoor_tpu.parallel.sharding import (
        transformer_param_shardings,
    )

    params = init_params(jax.random.key(0), CFG)
    opt = init_train_state(params, TC)
    key = jax.random.key(5)
    ckpt = TrainCheckpointer(str(tmp_path / "run"))
    ckpt.save(0, params, opt, key)

    mesh = make_mesh(MeshConfig(dp=2, sp=2, tp=2))
    shardings = transformer_param_shardings(mesh, params)
    params_like = jax.tree.map(
        lambda p, s: jax.ShapeDtypeStruct(p.shape, p.dtype, sharding=s),
        params, shardings,
    )
    _, p2, o2, key2 = ckpt.restore(params_like, opt, key)

    leaf = p2["blocks"]["attn1"]["to_q"]["kernel"]
    want = shardings["blocks"]["attn1"]["to_q"]["kernel"]
    assert leaf.sharding.is_equivalent_to(want, leaf.ndim)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        params, p2,
    )
    ckpt.close()


def test_retention_prunes_old_steps(tmp_path):
    params = init_params(jax.random.key(0), CFG)
    opt = init_train_state(params, TC)
    key = jax.random.key(9)
    ckpt = TrainCheckpointer(str(tmp_path / "run"), max_to_keep=2)
    for s in range(4):
        ckpt.save(s, params, opt, key)
    assert ckpt.latest_step() == 3
    kept = sorted(ckpt._mgr.all_steps())
    assert kept == [2, 3], kept
    # missing step -> clear error
    with pytest.raises(Exception):
        ckpt.restore(params, opt, key, step=0)
    ckpt.close()


def test_restore_without_checkpoint_raises(tmp_path):
    params = init_params(jax.random.key(0), CFG)
    opt = init_train_state(params, TC)
    ckpt = TrainCheckpointer(str(tmp_path / "empty"))
    with pytest.raises(FileNotFoundError):
        ckpt.restore(params, opt, jax.random.key(0))
    ckpt.close()


def test_restore_with_abstract_rng_target(tmp_path):
    """The resume-from-scratch flow builds its target via jax.eval_shape,
    so rng_like arrives as a ShapeDtypeStruct with a typed key dtype —
    restore must not require a concrete key (review fix)."""
    params = init_params(jax.random.key(0), CFG)
    opt = init_train_state(params, TC)
    key = jax.random.key(7)
    ckpt = TrainCheckpointer(str(tmp_path / "run"))
    ckpt.save(1, params, opt, key)

    params_sds = jax.eval_shape(lambda: params)
    opt_sds = jax.eval_shape(lambda: opt)
    rng_sds = jax.eval_shape(lambda: key)
    assert isinstance(rng_sds, jax.ShapeDtypeStruct)

    step, p2, o2, key2 = ckpt.restore(params_sds, opt_sds, rng_sds)
    assert step == 1
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(key)),
        np.asarray(jax.random.key_data(key2)),
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        params, p2,
    )
    ckpt.close()


def test_restore_rng_impl_follows_target_not_process_default(tmp_path):
    """A checkpoint saved under a non-default PRNG impl (e.g. rbg on
    TPU) restores under the TARGET rng's impl, not the process default
    — otherwise wrap_key_data silently reinterprets the bits and the
    'resume is bit-exact' guarantee breaks (review fix)."""
    params = init_params(jax.random.key(0), CFG)
    opt = init_train_state(params, TC)
    with jax.default_prng_impl("rbg"):
        key = jax.random.key(3)
    assert jax.random.key_data(key).shape == (4,)

    ckpt = TrainCheckpointer(str(tmp_path / "run"))
    ckpt.save(0, params, opt, key)
    # process default here is threefry2x32; the target key carries rbg
    _, _, _, key2 = ckpt.restore(params, opt, key)
    assert key2.dtype == key.dtype, (key2.dtype, key.dtype)
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(key)),
        np.asarray(jax.random.key_data(key2)),
    )
    ckpt.close()
