"""Persistent compilation cache plumbing (core/compile_cache.py)."""

import os

import jax

from ltx_video_gpupoor_tpu.core import compile_cache


def test_enable_points_jax_at_dir(tmp_path):
    d = str(tmp_path / "xla-cache")
    got = compile_cache.enable(d)
    assert got == d
    assert os.path.isdir(d)
    assert jax.config.jax_compilation_cache_dir == d
    assert compile_cache.cache_dir() == d
    # Idempotent.
    assert compile_cache.enable(d) == d


def test_enable_off_values_disable():
    for off in ("0", "off", "false", "none", ""):
        assert compile_cache.enable(off) is None


def test_package_import_enables_by_default():
    # Package __init__ called enable(); unless the env opted out, a
    # directory is active.
    env = os.environ.get("LTXV_TPU_COMPILE_CACHE")
    if env and env.lower() in ("0", "off", "false", "none"):
        return
    assert compile_cache.cache_dir() is not None
