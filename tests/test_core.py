import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ltx_video_gpupoor_tpu.core import (
    MeshConfig,
    cast_params,
    flatten,
    make_mesh,
    param_count,
    seed_everything,
    unflatten,
)


def test_mesh_resolve():
    assert MeshConfig(dp=2, sp=2, tp=-1).resolve(8) == (2, 2, 2)
    assert MeshConfig(dp=1, sp=1, tp=-1).resolve(8) == (1, 1, 8)
    with pytest.raises(ValueError):
        MeshConfig(dp=3, sp=1, tp=-1).resolve(8)


def test_make_mesh_8_devices():
    mesh = make_mesh(MeshConfig(dp=2, sp=2, tp=2))
    assert mesh.shape == {"dp": 2, "sp": 2, "tp": 2}


def test_flatten_roundtrip():
    tree = {"a": {"b": jnp.ones(3), "c": {"d": jnp.zeros(2)}}, "e": jnp.ones(1)}
    flat = flatten(tree)
    assert set(flat) == {"a.b", "a.c.d", "e"}
    rt = unflatten(flat)
    assert jax.tree.structure(rt) == jax.tree.structure(tree)
    assert param_count(tree) == 6


def test_cast_params_keeps_fp32_norms():
    tree = {"blk": {"norm": {"scale": jnp.ones(4)}, "mlp": {"kernel": jnp.ones((4, 4))}}}
    out = cast_params(tree, jnp.bfloat16, keep_fp32=lambda k: "norm" in k)
    assert out["blk"]["norm"]["scale"].dtype == jnp.float32
    assert out["blk"]["mlp"]["kernel"].dtype == jnp.bfloat16


def test_seed_everything_deterministic():
    k1 = seed_everything(42)
    k2 = seed_everything(42)
    np.testing.assert_array_equal(
        jax.random.normal(k1, (4,)), jax.random.normal(k2, (4,))
    )
