"""Flow-matching DPM-Solver++ multistep (order <= 2), jittable.

Parity target: ``FlowDPMSolverMultistepScheduler`` at
``/root/reference/wan/utils/fm_solvers.py`` with its Wan usage:
``algorithm_type='dpmsolver++'``, ``solver_type='midpoint'``,
``solver_order=2``, ``prediction_type='flow_prediction'``,
``lower_order_final=True`` — plus ``get_sampling_sigmas`` /
``retrieve_timesteps`` helpers (``fm_solvers.py:22-60``).

Flow parametrization matches UniPC: ``alpha = 1 - sigma``,
``x0 = sample - sigma * velocity``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def get_sampling_sigmas(sampling_steps: int, shift: float) -> np.ndarray:
    """``fm_solvers.py:22-27``: uniform sigmas with flux shift."""
    sigma = np.linspace(1, 0, sampling_steps + 1)[:sampling_steps]
    return (shift * sigma / (1 + (shift - 1) * sigma)).astype(np.float32)


def dpm_sigmas_from_custom(sigmas: np.ndarray) -> jnp.ndarray:
    """Append the terminal zero sigma: [steps] -> [steps + 1]."""
    return jnp.asarray(
        np.concatenate([np.asarray(sigmas, np.float32), [0.0]])
    )


class DPMState(NamedTuple):
    m_prev: jax.Array            # x0 prediction at step i-1
    lower_order_nums: jax.Array  # int32


def dpm_init(sample_shape, dtype=jnp.float32) -> DPMState:
    return DPMState(jnp.zeros(sample_shape, dtype), jnp.asarray(0, jnp.int32))


def _lam(sigma):
    return jnp.log1p(-sigma) - jnp.log(jnp.maximum(sigma, 1e-8))


def dpm_step(
    state: DPMState,
    model_output: jax.Array,
    sample: jax.Array,
    step_index: jax.Array,
    sigmas: jax.Array,   # [steps + 1]
    num_steps: int,
    order: int = 2,
) -> tuple[DPMState, jax.Array]:
    x = sample.astype(jnp.float32)
    v = model_output.astype(jnp.float32)

    sigma_cur = sigmas[step_index]
    sigma_next = sigmas[step_index + 1]
    sigma_prev = sigmas[jnp.maximum(step_index - 1, 0)]

    m0 = x - sigma_cur * v  # x0 prediction

    a_t = 1 - sigma_next
    h = _lam(sigma_next) - _lam(sigma_cur)
    # first order: x_t = (s_t/s_s0) x - a_t (e^-h - 1) x0
    x1 = sigma_next / jnp.maximum(sigma_cur, 1e-8) * x \
        - a_t * jnp.expm1(-h) * m0

    # second order midpoint
    h_0 = _lam(sigma_cur) - _lam(sigma_prev)
    r0 = h_0 / jnp.where(h == 0, 1.0, h)
    d1 = (m0 - state.m_prev) / jnp.where(r0 == 0, 1.0, r0)
    x2 = x1 - 0.5 * a_t * jnp.expm1(-h) * d1

    this_order = jnp.minimum(
        jnp.minimum(order, num_steps - step_index),
        state.lower_order_nums + 1,
    )
    # note: the reference defines a lower_order_second rule (<15-step
    # schedules, ``fm_solvers.py:750-752``) but its dispatch at ``:778``
    # short-circuits on ``solver_order == 2`` first, so the rule is DEAD
    # for the order-2 configs Wan runs — the golden test pins the
    # executed behavior (second order at the second-to-last step)
    prev_sample = jnp.where(this_order >= 2, x2, x1)

    new_state = DPMState(
        m_prev=m0,
        lower_order_nums=jnp.minimum(state.lower_order_nums + 1, order),
    )
    return new_state, prev_sample.astype(sample.dtype)


def sample_dpm(denoise_fn, initial_noise, sigmas, order: int = 2):
    num_steps = sigmas.shape[0] - 1
    state = dpm_init(initial_noise.shape)

    def body(carry, step_index):
        state, x = carry
        v = denoise_fn(x, sigmas[step_index], step_index)
        state, x = dpm_step(state, v, x, step_index, sigmas, num_steps, order)
        return (state, x), None

    (_, x), _ = jax.lax.scan(
        body, (state, initial_noise), jnp.arange(num_steps)
    )
    return x
