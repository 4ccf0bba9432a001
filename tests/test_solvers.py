"""Flow-match solver golden tests vs the reference implementations
(executed with torch + a minimal diffusers stub)."""

import math
import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from ltx_video_gpupoor_tpu.schedulers import dpm as jdpm
from ltx_video_gpupoor_tpu.schedulers import flowmatch as jfm
from ltx_video_gpupoor_tpu.schedulers import unipc as junipc


def _diffusers_stub():
    """Minimal stand-ins for the diffusers base classes the solvers use."""
    cu = types.ModuleType("diffusers.configuration_utils")

    class ConfigMixin:
        pass

    def register_to_config(fn):
        import functools, inspect

        @functools.wraps(fn)
        def wrapper(self, *args, **kwargs):
            sig = inspect.signature(fn)
            bound = sig.bind(self, *args, **kwargs)
            bound.apply_defaults()
            cfg = {k: v for k, v in bound.arguments.items() if k != "self"}
            self.config = types.SimpleNamespace(**cfg)
            return fn(self, *args, **kwargs)

        return wrapper

    cu.ConfigMixin = ConfigMixin
    cu.register_to_config = register_to_config

    su = types.ModuleType("diffusers.schedulers.scheduling_utils")

    class SchedulerMixin:
        pass

    class SchedulerOutput:
        def __init__(self, prev_sample):
            self.prev_sample = prev_sample

    su.SchedulerMixin = SchedulerMixin
    su.SchedulerOutput = SchedulerOutput
    su.KarrasDiffusionSchedulers = []  # iterated for _compatibles

    util = types.ModuleType("diffusers.utils")
    util.deprecate = lambda *a, **k: None
    util.is_scipy_available = lambda: False

    tu = types.ModuleType("diffusers.utils.torch_utils")
    tu.randn_tensor = lambda *a, **k: torch.randn(*a[0])

    root = types.ModuleType("diffusers")
    root.configuration_utils = cu
    root.utils = util
    schedulers = types.ModuleType("diffusers.schedulers")
    schedulers.scheduling_utils = su

    mods = {
        "diffusers": root,
        "diffusers.configuration_utils": cu,
        "diffusers.schedulers": schedulers,
        "diffusers.schedulers.scheduling_utils": su,
        "diffusers.utils": util,
        "diffusers.utils.torch_utils": tu,
    }
    return mods


def _load(path):
    mods = _diffusers_stub()
    saved = {k: sys.modules.get(k) for k in mods}
    sys.modules.update(mods)
    try:
        src = open(path).read()
        ns = {}
        exec(compile(src, path, "exec"), ns)
        return ns
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def _fake_velocity(x, sigma):
    """A deterministic pseudo-model: v depends on x and sigma."""
    return 0.3 * x + float(sigma) * 0.1 - 0.05 * x**2 / (1 + x**2)


@pytest.mark.parametrize("steps,shift", [(8, 1.0), (6, 5.0)])
def test_unipc_matches_reference(steps, shift):
    ns = _load("/root/reference/wan/utils/fm_solvers_unipc.py")
    sched = ns["FlowUniPCMultistepScheduler"](
        num_train_timesteps=1000, solver_order=2, shift=1.0,
    )
    sched.set_timesteps(steps, shift=shift)

    rng = np.random.RandomState(0)
    x_ref = torch.from_numpy(rng.randn(1, 4, 6).astype(np.float32))
    x = jnp.asarray(x_ref.numpy())

    sigmas = junipc.unipc_sigmas(steps, shift=shift)
    np.testing.assert_allclose(
        np.asarray(sigmas), sched.sigmas.numpy(), atol=1e-6
    )

    state = junipc.unipc_init(x.shape)
    for i, t in enumerate(sched.timesteps):
        sigma = float(sched.sigmas[i])
        v_ref = _fake_velocity(x_ref, sigma)
        x_ref = sched.step(v_ref, t, x_ref, return_dict=False)[0]

        v = _fake_velocity(np.asarray(x), sigma)
        state, x = junipc.unipc_step(
            state, jnp.asarray(v), x, jnp.asarray(i), sigmas, steps
        )
        np.testing.assert_allclose(
            np.asarray(x), x_ref.numpy(), atol=2e-4, rtol=2e-4,
            err_msg=f"step {i}",
        )


@pytest.mark.parametrize("steps,shift", [(8, 1.0), (5, 3.0)])
def test_dpm_matches_reference(steps, shift):
    ns = _load("/root/reference/wan/utils/fm_solvers.py")
    sched = ns["FlowDPMSolverMultistepScheduler"](
        num_train_timesteps=1000, solver_order=2, shift=1.0,
        algorithm_type="dpmsolver++", solver_type="midpoint",
    )
    sampling_sigmas = ns["get_sampling_sigmas"](steps, shift)
    sched.set_timesteps(None, sigmas=sampling_sigmas)

    rng = np.random.RandomState(1)
    x_ref = torch.from_numpy(rng.randn(1, 4, 6).astype(np.float32))
    x = jnp.asarray(x_ref.numpy())

    sigmas = jdpm.dpm_sigmas_from_custom(
        np.asarray(jdpm.get_sampling_sigmas(steps, shift))
    )
    np.testing.assert_allclose(
        np.asarray(sigmas), sched.sigmas.numpy(), atol=1e-6
    )

    state = jdpm.dpm_init(x.shape)
    for i, t in enumerate(sched.timesteps):
        sigma = float(sched.sigmas[i])
        v_ref = _fake_velocity(x_ref, sigma)
        x_ref = sched.step(v_ref, t, x_ref, return_dict=False)[0]

        v = _fake_velocity(np.asarray(x), sigma)
        state, x = jdpm.dpm_step(
            state, jnp.asarray(v), x, jnp.asarray(i), sigmas, steps
        )
        np.testing.assert_allclose(
            np.asarray(x), x_ref.numpy(), atol=2e-4, rtol=2e-4,
            err_msg=f"step {i}",
        )


def test_basic_flowmatch_matches_reference():
    ns = {}
    exec(
        compile(open("/root/reference/wan/utils/basic_flowmatch.py").read(),
                "basic_flowmatch.py", "exec"),
        ns,
    )
    ref = ns["FlowMatchScheduler"](num_inference_steps=7, shift=5.0)
    mine = jfm.make_flowmatch_schedule(7, shift=5.0, extra_one_step=False)
    np.testing.assert_allclose(
        np.asarray(mine.sigmas), ref.sigmas.numpy(), atol=1e-6
    )

    x_ref = torch.from_numpy(
        np.random.RandomState(2).randn(1, 3, 4, 4).astype(np.float32)
    )
    x = jnp.asarray(x_ref.numpy())
    for t in ref.timesteps:
        v_ref = _fake_velocity(x_ref, float(t) / 1000)
        x_ref = ref.step(v_ref, t, x_ref)
        v = _fake_velocity(np.asarray(x), float(t) / 1000)
        x = jfm.step(mine, jnp.asarray(v), jnp.asarray(float(t)), x)
        np.testing.assert_allclose(
            np.asarray(x), x_ref.numpy(), atol=1e-5, rtol=1e-5
        )


def test_unipc_scan_driver():
    sigmas = junipc.unipc_sigmas(6, shift=3.0)
    x0 = jax.random.normal(jax.random.key(0), (1, 8, 4))

    @jax.jit
    def run(x0):
        return junipc.sample_unipc(
            lambda x, s, i: 0.2 * x, x0, sigmas
        )

    out = run(x0)
    assert out.shape == x0.shape
    assert np.isfinite(np.asarray(out)).all()
