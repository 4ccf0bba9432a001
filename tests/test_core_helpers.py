"""Core helper behaviors: mesh validation, rng contracts, compile-cache
gating. (The flatten/unflatten list-subtree behavior lives in
tests/test_checkpoint.py.)"""

import numpy as np
import pytest

from ltx_video_gpupoor_tpu.core.mesh import MeshConfig
from ltx_video_gpupoor_tpu.core.rng import seed_everything, split_for


def test_mesh_resolve_validates_dims():
    assert MeshConfig(dp=2, sp=2, tp=-1).resolve(8) == (2, 2, 2)
    with pytest.raises(ValueError, match="positive or -1"):
        MeshConfig(dp=0).resolve(8)
    with pytest.raises(ValueError, match="positive or -1"):
        MeshConfig(dp=-2, tp=-1).resolve(8)
    with pytest.raises(ValueError, match="at most one"):
        MeshConfig(dp=-1, sp=-1, tp=1).resolve(8)


def test_seed_everything_keeps_high_bits():
    k1 = seed_everything(7)
    k2 = seed_everything(2**32 + 7)
    assert not np.array_equal(_key_data(k1), _key_data(k2))


def _key_data(k):
    import jax

    return np.asarray(jax.random.key_data(k))


def test_split_for_names_are_order_stable():
    import jax

    key = jax.random.key(0)
    a = split_for(key, "noise", "dropout")
    b = split_for(key, "init", "noise", "dropout")
    # adding a name must not move existing names' keys (the documented
    # contract — a positional split silently reseeded everything)
    np.testing.assert_array_equal(
        _key_data(a["noise"]), _key_data(b["noise"])
    )
    np.testing.assert_array_equal(
        _key_data(a["dropout"]), _key_data(b["dropout"])
    )
    assert not np.array_equal(
        _key_data(a["noise"]), _key_data(a["dropout"])
    )


def test_compile_cache_cpu_guard_and_disable(monkeypatch, tmp_path):
    from ltx_video_gpupoor_tpu.core import compile_cache as cc

    # legacy env spelling also counts as CPU selection
    monkeypatch.setenv("JAX_PLATFORM_NAME", "cpu")
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    assert cc.enable(str(tmp_path / "c")) is None
    monkeypatch.delenv("JAX_PLATFORM_NAME", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu,tpu")
    assert cc.enable(str(tmp_path / "c")) is None
