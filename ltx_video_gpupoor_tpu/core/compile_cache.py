"""Persistent XLA compilation cache.

The reference pays its model-load cost once per process via mmgp's mmap
safetensors loads (``/root/reference/inference.py:442-496``); on TPU the
analogous per-process cost is XLA compilation (~285 s cold for the LTX
denoise step through the relay).  A persistent on-disk compilation cache
amortizes that across process restarts: the first process compiles and
writes serialized executables; every later process deserializes in
seconds.

Enabled automatically at package import (see ``__init__``).  Controls:

- ``LTXV_TPU_COMPILE_CACHE``: cache directory.  Set to ``0``/``off``/empty
  to disable.  Default: ``~/.cache/ltx_video_gpupoor_tpu/xla``.
"""

from __future__ import annotations

import os

_ENV = "LTXV_TPU_COMPILE_CACHE"
_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "ltx_video_gpupoor_tpu", "xla"
)

_enabled_dir: str | None = None
_lazy_guard_installed = False


def _backend_is_cpu() -> bool | None:
    """Whether the RESOLVED JAX backend is CPU: True/False once backends
    are initialized, None while unknown. Never initializes the backend
    itself (that would defeat lazy platform selection)."""
    try:
        from jax._src import xla_bridge as xb

        if not xb.backends_are_initialized():
            return None
        import jax

        return jax.default_backend() == "cpu"
    except Exception:
        return None


def _install_lazy_cpu_guard() -> None:
    """Arm a one-shot check at the first cache consultation: a TPU-less
    host with no platform env vars set silently falls back to the CPU
    backend AFTER ``enable()`` ran at import — exactly the cross-host
    XLA:CPU AOT/SIGILL hazard the env-var check alone cannot see. The
    guard wraps ``compilation_cache.is_cache_used`` (consulted with the
    live backend before any read/write); CPU resolution disables the
    cache dir, anything else restores the original immediately."""
    global _lazy_guard_installed
    if _lazy_guard_installed:
        return
    try:
        from jax._src import compilation_cache as cc

        orig = cc.is_cache_used

        def guarded(backend):
            global _enabled_dir
            cc.is_cache_used = orig
            if getattr(backend, "platform", None) == "cpu":
                if _enabled_dir is not None:
                    import jax

                    jax.config.update("jax_compilation_cache_dir", None)
                    _enabled_dir = None
                return False
            return orig(backend)

        cc.is_cache_used = guarded
        _lazy_guard_installed = True
    except Exception:
        pass  # best-effort: internal seam moved; env-var check still holds


def enable(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Idempotent; returns the active cache directory or ``None`` when
    disabled.  Must run before the first ``jit`` compilation to benefit
    that compilation, but is safe to call at any time.
    """
    global _enabled_dir
    if cache_dir is None:
        cache_dir = os.environ.get(_ENV, _DEFAULT_DIR)
    if not cache_dir or cache_dir.lower() in ("0", "off", "false", "none"):
        if _enabled_dir is not None:
            # actually disable an already-enabled cache, or the None
            # return would lie while entries keep being written
            import jax

            jax.config.update("jax_compilation_cache_dir", None)
            _enabled_dir = None
        return None
    if _enabled_dir == cache_dir:
        return _enabled_dir

    import jax

    # CPU-only processes (tests, virtual-mesh dryruns): skip the persistent
    # cache. CPU compiles are cheap, and XLA:CPU AOT entries embed host
    # machine features — loading one compiled on a different host risks
    # SIGILL. The minutes-scale wins are all on the TPU backend. Check
    # every CPU-selection spelling that takes effect before backend init
    # (probing jax.default_backend() here would itself initialize it).
    plats = os.environ.get("JAX_PLATFORMS", "").strip().lower()
    legacy = os.environ.get("JAX_PLATFORM_NAME", "").strip().lower()
    first = plats.split(",")[0].strip() if plats else ""
    if first == "cpu" or legacy == "cpu":
        return None
    # The env vars only cover EXPLICIT CPU selection; a TPU-less host with
    # nothing set still resolves to the CPU backend. Consult the resolved
    # backend when it exists, else arm a lazy check for when it does.
    resolved_cpu = _backend_is_cpu()
    if resolved_cpu:
        return None
    if resolved_cpu is None:
        _install_lazy_cpu_guard()

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache everything that took meaningful compile time; through the
    # relay even small programs cost ~1 min, so keep the bar low.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _enabled_dir = cache_dir
    return _enabled_dir


def cache_dir() -> str | None:
    """The active persistent-cache directory, or None if disabled."""
    return _enabled_dir
