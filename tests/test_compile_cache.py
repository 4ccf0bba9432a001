"""Persistent compilation cache plumbing (core/compile_cache.py)."""

import os

import jax
import pytest

from ltx_video_gpupoor_tpu.core import compile_cache


def test_enable_points_jax_at_dir(tmp_path, monkeypatch):
    # pretend a TPU process: the cache only engages off-CPU (XLA:CPU AOT
    # entries embed host machine features -> cross-host SIGILL risk)
    monkeypatch.setenv("JAX_PLATFORMS", "tpu")
    d = str(tmp_path / "xla-cache")
    got = compile_cache.enable(d)
    assert got == d
    assert os.path.isdir(d)
    assert jax.config.jax_compilation_cache_dir == d
    assert compile_cache.cache_dir() == d
    # Idempotent.
    assert compile_cache.enable(d) == d


def test_enable_off_values_disable(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "tpu")
    for off in ("0", "off", "false", "none", ""):
        assert compile_cache.enable(off) is None


def test_cpu_processes_skip_persistent_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert compile_cache.enable(str(tmp_path / "nope")) is None
    assert not os.path.isdir(str(tmp_path / "nope"))
