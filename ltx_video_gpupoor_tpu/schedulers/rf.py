"""Rectified-flow Euler scheduler with per-token timesteps.

Parity target: ``RectifiedFlowScheduler`` at
``/root/reference/ltx_video/schedulers/rf.py`` — Uniform / LinearQuadratic /
Constant-shifted initial schedules (``:25-70, 199-213``), SD3-style and
SimpleDiffusion-style resolution-dependent shifting (``:49-66, 112-149``),
Euler ``step`` with scalar or per-token 2-D timesteps and stochastic
resampling (``:311-380``), and ``add_noise`` (``:382-392``).

Everything is a pure function over a frozen schedule; ``step`` is jittable
(the "next lower timestep" search is a vectorized masked max, identical in
semantics to the reference's).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

T_EPS = 1e-6


def linear_quadratic_schedule(
    num_steps: int,
    threshold_noise: float = 0.025,
    linear_steps: Optional[int] = None,
) -> jnp.ndarray:
    """LTX's linear-then-quadratic sigma schedule (``rf.py:25-46``)."""
    if num_steps == 1:
        return jnp.array([1.0], jnp.float32)
    if linear_steps is None:
        linear_steps = num_steps // 2
    linear = [i * threshold_noise / linear_steps for i in range(linear_steps)]
    diff = linear_steps - threshold_noise * num_steps
    quadratic_steps = num_steps - linear_steps
    a = diff / (linear_steps * quadratic_steps**2)
    b = threshold_noise / linear_steps - 2 * diff / (quadratic_steps**2)
    c = a * linear_steps**2
    quad = [a * i**2 + b * i + c for i in range(linear_steps, num_steps)]
    sigmas = [1.0 - x for x in (linear + quad)]
    return jnp.asarray(sigmas, jnp.float32)


def time_shift(mu: float, sigma: float, t: jnp.ndarray) -> jnp.ndarray:
    """Constant (flux-style) shift: sigmoid reparametrization (``rf.py:69-70``)."""
    return math.exp(mu) / (math.exp(mu) + (1 / t - 1) ** sigma)


def get_normal_shift(
    n_tokens: int,
    min_tokens: int = 1024,
    max_tokens: int = 4096,
    min_shift: float = 0.95,
    max_shift: float = 2.05,
) -> float:
    m = (max_shift - min_shift) / (max_tokens - min_tokens)
    b = min_shift - m * min_tokens
    return m * n_tokens + b


def stretch_shifts_to_terminal(shifts: jnp.ndarray, terminal: float = 0.1):
    if not (0.0 < terminal < 1.0):
        raise ValueError("terminal must be in (0, 1)")
    one_minus = 1 - shifts
    scale = one_minus[-1] / (1 - terminal)
    return 1 - one_minus / scale


def sd3_resolution_dependent_shift(
    n_media_tokens: int,
    timesteps: jnp.ndarray,
    target_shift_terminal: Optional[float] = None,
) -> jnp.ndarray:
    shift = get_normal_shift(n_media_tokens)
    shifted = time_shift(shift, 1.0, timesteps)
    if target_shift_terminal is not None:
        shifted = stretch_shifts_to_terminal(shifted, target_shift_terminal)
    return shifted


def simple_diffusion_resolution_dependent_shift(
    n_media_tokens: int,
    timesteps: jnp.ndarray,
    base_tokens: int = 32 * 32,
) -> jnp.ndarray:
    snr = (timesteps / (1 - timesteps)) ** 2
    shift_snr = jnp.log(snr) + 2 * math.log(n_media_tokens / base_tokens)
    return jax.nn.sigmoid(0.5 * shift_snr)


@dataclasses.dataclass(frozen=True)
class RectifiedFlowSchedule:
    """Frozen sampling schedule. ``timesteps`` descend from ~1 toward 0."""

    timesteps: jnp.ndarray  # [steps] fp32
    num_train_timesteps: int = 1000
    init_noise_sigma: float = 1.0

    @property
    def sigmas(self) -> jnp.ndarray:
        return self.timesteps


def initial_timesteps(
    num_steps: int,
    sampler: str = "Uniform",
    shift: Optional[float] = None,
) -> jnp.ndarray:
    """``get_initial_timesteps`` (``rf.py:199-213``)."""
    if sampler == "Uniform":
        return jnp.linspace(1.0, 1.0 / num_steps, num_steps, dtype=jnp.float32)
    if sampler == "LinearQuadratic":
        return linear_quadratic_schedule(num_steps)
    if sampler == "Constant":
        assert shift is not None, "Constant sampler requires a shift"
        return time_shift(
            shift, 1.0, jnp.linspace(1.0, 1.0 / num_steps, num_steps)
        ).astype(jnp.float32)
    raise ValueError(f"unknown sampler {sampler!r}")


def make_schedule(
    num_steps: Optional[int] = None,
    *,
    sampler: str = "Uniform",
    shift: Optional[float] = None,
    shifting: Optional[str] = None,
    n_media_tokens: Optional[int] = None,
    target_shift_terminal: Optional[float] = None,
    base_resolution: int = 32 * 32,
    timesteps: Optional[jnp.ndarray] = None,
    num_train_timesteps: int = 1000,
) -> RectifiedFlowSchedule:
    """``set_timesteps`` + ``shift_timesteps`` (``rf.py:215-261``): either an
    explicit timestep list (distilled configs) or a sampled schedule with
    optional resolution-dependent shifting."""
    if timesteps is not None:
        ts = jnp.asarray(timesteps, jnp.float32)
    else:
        num_steps = min(num_train_timesteps, num_steps)
        ts = initial_timesteps(num_steps, sampler, shift)
        if shifting == "SD3":
            ts = sd3_resolution_dependent_shift(
                n_media_tokens, ts, target_shift_terminal
            )
        elif shifting == "SimpleDiffusion":
            ts = simple_diffusion_resolution_dependent_shift(
                n_media_tokens, ts, base_resolution
            )
        elif shifting not in (None, "", "None"):
            raise ValueError(f"unknown shifting {shifting!r}")
    return RectifiedFlowSchedule(
        timesteps=ts, num_train_timesteps=num_train_timesteps
    )


def lower_timestep(schedule_ts: jnp.ndarray, timestep: jnp.ndarray) -> jnp.ndarray:
    """Closest schedule timestep strictly below ``timestep`` (0 if none).

    Works for scalar or per-token timesteps of any shape (vectorized
    equivalent of ``rf.py:345-358``).
    """
    padded = jnp.concatenate([schedule_ts, jnp.zeros((1,), schedule_ts.dtype)])
    # [steps+1, *t.shape]
    mask = padded.reshape((-1,) + (1,) * timestep.ndim) < (timestep - T_EPS)
    cand = jnp.where(
        mask, padded.reshape((-1,) + (1,) * timestep.ndim), 0.0
    )
    return jnp.max(cand, axis=0)


def step(
    schedule: RectifiedFlowSchedule,
    model_output: jax.Array,
    timestep: jax.Array,
    sample: jax.Array,
    *,
    stochastic_sampling: bool = False,
    key: Optional[jax.Array] = None,
) -> jax.Array:
    """Euler step ``z_prev = z - dt * v`` with per-token dt.

    ``timestep`` is scalar or ``[B, tokens]`` (per-token); ``sample`` is
    ``[B, tokens, C]`` in the per-token case.
    """
    lower = lower_timestep(schedule.timesteps, jnp.asarray(timestep))
    dt = jnp.asarray(timestep) - lower
    if jnp.ndim(dt) and jnp.ndim(dt) < jnp.ndim(sample):
        dt = jnp.expand_dims(dt, -1)
        t_full = jnp.expand_dims(jnp.asarray(timestep), -1)
    else:
        t_full = jnp.asarray(timestep)
    if stochastic_sampling:
        assert key is not None, "stochastic sampling needs a PRNG key"
        x0 = sample - t_full * model_output
        next_t = t_full - dt
        noise = jax.random.normal(key, sample.shape, sample.dtype)
        return add_noise(x0, noise, next_t).astype(sample.dtype)
    return (sample - dt * model_output).astype(sample.dtype)


def add_noise(
    original: jax.Array, noise: jax.Array, timesteps: jax.Array
) -> jax.Array:
    """``z_t = (1 - t) x0 + t eps`` (``rf.py:382-392``)."""
    t = jnp.asarray(timesteps)
    while t.ndim < original.ndim:
        t = jnp.expand_dims(t, -1)
    return (1 - t) * original + t * noise
