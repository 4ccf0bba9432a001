"""Persistent compilation cache plumbing (core/compile_cache.py)."""

import os

import jax
import pytest

from ltx_video_gpupoor_tpu.core import compile_cache


def test_enable_points_jax_at_dir(tmp_path, monkeypatch):
    # pretend a TPU process: the cache only engages off-CPU (XLA:CPU AOT
    # entries embed host machine features -> cross-host SIGILL risk)
    monkeypatch.setenv("JAX_PLATFORMS", "tpu")
    monkeypatch.setattr(compile_cache, "_backend_is_cpu", lambda: False)
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


def test_resolved_cpu_backend_skips_cache(tmp_path, monkeypatch):
    """A TPU-less host with NO platform env vars still resolves to the
    CPU backend; the resolved-backend check must catch what the env-var
    check cannot (this test process IS such a host)."""
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.delenv("JAX_PLATFORM_NAME", raising=False)
    jax.devices()  # ensure backends initialized -> _backend_is_cpu() True
    assert compile_cache._backend_is_cpu() is True
    assert compile_cache.enable(str(tmp_path / "nope")) is None
    assert not os.path.isdir(str(tmp_path / "nope"))


def test_lazy_guard_disables_on_cpu_fallback(tmp_path, monkeypatch):
    """Backend unknown at enable() time (import-time call): the armed
    guard must kill the cache dir at the first cache consultation if the
    backend resolved to CPU, and self-remove otherwise."""
    from jax._src import compilation_cache as cc

    monkeypatch.setenv("JAX_PLATFORMS", "tpu")
    monkeypatch.setattr(compile_cache, "_backend_is_cpu", lambda: None)
    monkeypatch.setattr(compile_cache, "_lazy_guard_installed", False)
    orig_fn = cc.is_cache_used
    try:
        d = str(tmp_path / "xla-cache")
        assert compile_cache.enable(d) == d
        assert cc.is_cache_used is not orig_fn  # guard armed

        class FakeCpuBackend:
            platform = "cpu"

        assert cc.is_cache_used(FakeCpuBackend()) is False
        assert cc.is_cache_used is orig_fn  # one-shot: unwrapped
        assert compile_cache.cache_dir() is None
        assert jax.config.jax_compilation_cache_dir is None
    finally:
        cc.is_cache_used = orig_fn
