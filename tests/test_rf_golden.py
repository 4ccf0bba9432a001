"""Golden test: our rectified-flow scheduler vs the reference
``RectifiedFlowScheduler`` (``ltx_video/schedulers/rf.py``) on CPU —
schedules (Uniform / LinearQuadratic / Constant-shift, SD3 and
SimpleDiffusion resolution shifts), Euler step with scalar and per-token
timesteps, and add_noise."""

import functools
import inspect
import types

import numpy as np
import jax.numpy as jnp
import torch

from ltx_video_gpupoor_tpu.schedulers import rf as jrf


def _load_ref():
    src = open("/root/reference/ltx_video/schedulers/rf.py").read()
    for line in [
        "from diffusers.configuration_utils import ConfigMixin, register_to_config",
        "from diffusers.schedulers.scheduling_utils import SchedulerMixin",
        "from diffusers.utils import BaseOutput",
        "from safetensors import safe_open",
        "from ltx_video.utils.torch_utils import append_dims",
    ]:
        src = src.replace(line, "")
    src = src.replace(
        "from ltx_video.utils.diffusers_config_mapping import (\n"
        "    diffusers_and_ours_config_mapping,\n"
        "    make_hashable_key,\n"
        ")",
        "",
    )

    def register_to_config(fn):
        sig = inspect.signature(fn)

        @functools.wraps(fn)
        def wrapper(self, *args, **kwargs):
            bound = sig.bind(self, *args, **kwargs)
            bound.apply_defaults()
            cfg = {k: v for k, v in bound.arguments.items() if k != "self"}
            self.config = types.SimpleNamespace(**cfg)
            return fn(self, *args, **kwargs)

        return wrapper

    def append_dims(x, target_dims):
        return x[(...,) + (None,) * (target_dims - x.ndim)]

    class _BaseOutput:
        def __init__(self, **kw):
            for k, v in kw.items():
                setattr(self, k, v)

    class _ConfigMixin:
        pass

    class _SchedulerMixin:
        pass

    ns = {
        "ConfigMixin": _ConfigMixin,
        "SchedulerMixin": _SchedulerMixin,
        "BaseOutput": _BaseOutput,
        "register_to_config": register_to_config,
        "append_dims": append_dims,
        "safe_open": None,
        "diffusers_and_ours_config_mapping": {},
        "make_hashable_key": lambda d: d,
    }
    exec(compile(src, "ref_rf.py", "exec"), ns)
    return ns


def _mk(ns, **kw):
    return ns["RectifiedFlowScheduler"](**kw)


def test_uniform_and_lq_schedules_match():
    ns = _load_ref()
    for sampler in ("Uniform", "LinearQuadratic"):
        ref = _mk(ns, sampler=sampler)
        ref.set_timesteps(num_inference_steps=20, samples_shape=(1, 99, 128))
        mine = jrf.make_schedule(20, sampler=sampler)
        np.testing.assert_allclose(
            np.asarray(mine.timesteps), ref.timesteps.numpy(), atol=1e-6
        )


def test_constant_shift_schedule_matches():
    ns = _load_ref()
    ref = _mk(ns, sampler="Constant", shift=3.0)
    ref.set_timesteps(num_inference_steps=12, samples_shape=(1, 99, 128))
    mine = jrf.make_schedule(12, sampler="Constant", shift=3.0)
    np.testing.assert_allclose(
        np.asarray(mine.timesteps), ref.timesteps.numpy(), atol=1e-6
    )


def test_sd3_shift_matches():
    ns = _load_ref()
    n_tokens = 5280
    ref = _mk(ns, shifting="SD3", target_shift_terminal=0.1)
    ref.set_timesteps(
        num_inference_steps=30, samples_shape=torch.Size([1, n_tokens, 128])
    )
    mine = jrf.make_schedule(
        30, shifting="SD3", n_media_tokens=n_tokens,
        target_shift_terminal=0.1,
    )
    np.testing.assert_allclose(
        np.asarray(mine.timesteps), ref.timesteps.numpy(), atol=1e-5
    )


def test_simple_diffusion_shift_matches():
    ns = _load_ref()
    n_tokens = 2048
    ref = _mk(ns, shifting="SimpleDiffusion", base_resolution=32**2)
    ref.set_timesteps(
        num_inference_steps=16, samples_shape=torch.Size([1, n_tokens, 128])
    )
    mine = jrf.make_schedule(
        16, shifting="SimpleDiffusion", n_media_tokens=n_tokens,
        base_resolution=32**2,
    )
    np.testing.assert_allclose(
        np.asarray(mine.timesteps), ref.timesteps.numpy(), atol=1e-5
    )


def test_step_scalar_timestep_matches():
    ns = _load_ref()
    ref = _mk(ns)
    ref.set_timesteps(num_inference_steps=10, samples_shape=(1, 8, 64))
    mine = jrf.make_schedule(10)

    rng = np.random.RandomState(0)
    sample = rng.randn(1, 64, 8).astype(np.float32)
    vel = rng.randn(1, 64, 8).astype(np.float32)
    for i in [0, 4, 9]:
        t = ref.timesteps[i]
        out = ref.step(
            torch.from_numpy(vel.copy()), t, torch.from_numpy(sample.copy()),
            return_dict=True,
        )
        mine_prev = jrf.step(
            mine, jnp.asarray(vel), jnp.asarray(float(t)), jnp.asarray(sample)
        )
        np.testing.assert_allclose(
            np.asarray(mine_prev), out.prev_sample.numpy(), atol=1e-5,
            err_msg=f"step {i}",
        )


def test_step_per_token_timestep_matches():
    ns = _load_ref()
    ref = _mk(ns)
    ref.set_timesteps(num_inference_steps=8, samples_shape=(1, 8, 64))
    mine = jrf.make_schedule(8)

    rng = np.random.RandomState(1)
    sample = rng.randn(1, 64, 8).astype(np.float32)
    vel = rng.randn(1, 64, 8).astype(np.float32)
    # conditioned tokens frozen at low t, the rest at schedule t (the
    # pipeline's per-token timestep pattern)
    t_tok = np.full((1, 64), float(ref.timesteps[2]), np.float32)
    t_tok[0, :16] = 0.11  # off-schedule values exercise lower_timestep
    out = ref.step(
        torch.from_numpy(vel.copy()), torch.from_numpy(t_tok.copy()),
        torch.from_numpy(sample.copy()), return_dict=True,
    )
    mine_prev = jrf.step(
        mine, jnp.asarray(vel), jnp.asarray(t_tok), jnp.asarray(sample)
    )
    np.testing.assert_allclose(
        np.asarray(mine_prev), out.prev_sample.numpy(), atol=1e-5
    )


def test_add_noise_matches():
    ns = _load_ref()
    ref = _mk(ns)
    rng = np.random.RandomState(2)
    x0 = rng.randn(2, 16, 4).astype(np.float32)
    eps = rng.randn(2, 16, 4).astype(np.float32)
    t = np.asarray([0.3, 0.8], np.float32)
    ref_zt = ref.add_noise(
        torch.from_numpy(x0.copy()), torch.from_numpy(eps.copy()),
        torch.from_numpy(t.copy()),
    ).numpy()
    mine = jrf.add_noise(jnp.asarray(x0), jnp.asarray(eps), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(mine), ref_zt, atol=1e-6)
