"""Minimal flow-match Euler scheduler (DiffSynth style).

Parity target: ``FlowMatchScheduler`` at
``/root/reference/wan/utils/basic_flowmatch.py:7-81`` — shift-warped linear
sigmas, nearest-timestep lookup in ``step``/``add_noise``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class FlowMatchSchedule:
    sigmas: jnp.ndarray       # [steps]
    timesteps: jnp.ndarray    # [steps] = sigmas * num_train_timesteps
    num_train_timesteps: int = 1000


def make_flowmatch_schedule(
    num_inference_steps: int,
    shift: float = 5.0,
    sigma_max: float = 1.0,
    sigma_min: float = 0.003 / 1.002,
    num_train_timesteps: int = 1000,
    denoising_strength: float = 1.0,
    extra_one_step: bool = True,
) -> FlowMatchSchedule:
    start = sigma_min + (sigma_max - sigma_min) * denoising_strength
    if extra_one_step:
        sigmas = np.linspace(start, sigma_min, num_inference_steps + 1)[:-1]
    else:
        sigmas = np.linspace(start, sigma_min, num_inference_steps)
    sigmas = shift * sigmas / (1 + (shift - 1) * sigmas)
    sigmas = jnp.asarray(sigmas, jnp.float32)
    return FlowMatchSchedule(
        sigmas=sigmas,
        timesteps=sigmas * num_train_timesteps,
        num_train_timesteps=num_train_timesteps,
    )


def step(
    schedule: FlowMatchSchedule,
    model_output: jax.Array,
    timestep: jax.Array,
    sample: jax.Array,
    to_final: bool = False,
) -> jax.Array:
    idx = jnp.argmin(jnp.abs(schedule.timesteps - timestep))
    sigma = schedule.sigmas[idx]
    n = schedule.sigmas.shape[0]
    sigma_next = jnp.where(
        to_final | (idx + 1 >= n), 0.0, schedule.sigmas[jnp.minimum(idx + 1, n - 1)]
    )
    return (sample + model_output * (sigma_next - sigma)).astype(sample.dtype)


def add_noise(
    schedule: FlowMatchSchedule,
    original: jax.Array,
    noise: jax.Array,
    timestep: jax.Array,
) -> jax.Array:
    idx = jnp.argmin(jnp.abs(schedule.timesteps - timestep))
    sigma = schedule.sigmas[idx]
    return (1 - sigma) * original + sigma * noise
