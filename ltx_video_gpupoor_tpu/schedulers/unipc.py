"""Flow-matching UniPC multistep solver (predictor-corrector), jittable.

Parity target: ``FlowUniPCMultistepScheduler`` at
``/root/reference/wan/utils/fm_solvers_unipc.py`` with its Wan defaults:
``solver_order=2``, ``prediction_type='flow_prediction'`` (predict_x0
path), ``solver_type='bh2'``, ``lower_order_final=True``. The reference's
mutable scheduler object becomes an explicit ``UniPCState`` carried through
``lax.scan``; the order warm-up / final-step order reduction are expressed
with ``jnp.where`` masks (order <= 2, the only configuration the reference
ever runs).

Flow parametrization: ``alpha_t = 1 - sigma``, ``sigma_t = sigma``,
``x0 = sample - sigma * velocity`` (``fm_solvers_unipc.py:272-350``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


def unipc_sigmas(
    num_steps: int,
    shift: float = 1.0,
    num_train_timesteps: int = 1000,
    final_sigma_zero: bool = True,
) -> jnp.ndarray:
    """``set_timesteps`` (``fm_solvers_unipc.py:160-227``): linspace from
    ``sigma_max = 1 - 1/num_train`` down to 0 with the flux-style shift,
    terminal sigma appended. Returns [steps + 1].

    ``final_sigma_zero=False`` maps to the reference's "sigma_min"
    final-sigmas type: the terminal sigma is the training grid's
    smallest (1/num_train) instead of exactly 0."""
    sigma_max = 1.0 - 1.0 / num_train_timesteps
    sigmas = np.linspace(sigma_max, 0.0, num_steps + 1)[:-1]
    sigmas = shift * sigmas / (1 + (shift - 1) * sigmas)
    last = 0.0 if final_sigma_zero else 1.0 / num_train_timesteps
    return jnp.asarray(np.concatenate([sigmas, [last]]), jnp.float32)


class UniPCState(NamedTuple):
    m_prev: jax.Array        # x0 prediction at step i-1
    m_prev2: jax.Array       # x0 prediction at step i-2
    last_sample: jax.Array   # sample before the last predictor
    lower_order_nums: jax.Array  # int32 scalar


def unipc_init(sample_shape, dtype=jnp.float32) -> UniPCState:
    z = jnp.zeros(sample_shape, dtype)
    return UniPCState(z, z, z, jnp.asarray(0, jnp.int32))


def _lam(sigma):
    return jnp.log1p(-sigma) - jnp.log(jnp.maximum(sigma, 1e-8))


def unipc_step(
    state: UniPCState,
    model_output: jax.Array,
    sample: jax.Array,
    step_index: jax.Array,     # int32 scalar (0-based)
    sigmas: jax.Array,         # [steps + 1]
    num_steps: int,
    order: int = 2,
    use_corrector: bool = True,
) -> tuple[UniPCState, jax.Array]:
    """One UniPC step (corrector for the previous step + predictor)."""
    dtype = jnp.float32
    x = sample.astype(dtype)
    v = model_output.astype(dtype)

    sigma_cur = sigmas[step_index]
    sigma_next = sigmas[step_index + 1]
    sigma_prev = sigmas[jnp.maximum(step_index - 1, 0)]
    sigma_prev2 = sigmas[jnp.maximum(step_index - 2, 0)]

    # convert flow velocity -> x0 prediction
    m_t = x - sigma_cur * v

    this_order_p = jnp.minimum(
        jnp.minimum(order, num_steps - step_index),
        state.lower_order_nums + 1,
    )

    # ---------------- corrector (UniC) for the previous prediction --------
    def corrector(x):
        # operates at transition sigma_prev -> sigma_cur
        s_t, s_s0 = sigma_cur, sigma_prev
        a_t, a_s0 = 1 - s_t, 1 - s_s0
        h = _lam(s_t) - _lam(s_s0)
        hh = -h
        h_phi_1 = jnp.expm1(hh)
        b_h = jnp.expm1(hh)  # bh2
        m0 = state.m_prev
        d1_t = m_t - m0

        # order of the previous predictor step
        prev_order = jnp.minimum(
            jnp.minimum(order, num_steps - (step_index - 1)),
            state.lower_order_nums,
        )
        prev_order = jnp.maximum(prev_order, 1)

        x_t_ = s_t / jnp.maximum(s_s0, 1e-8) * state.last_sample \
            - a_t * h_phi_1 * m0

        # order-1 corrector: rhos_c = [0.5]
        xc1 = x_t_ - a_t * b_h * 0.5 * d1_t

        # order-2 corrector: rks = [r0, 1]; solve R rhos = b
        lam_s1 = _lam(sigma_prev2)
        r0 = (lam_s1 - _lam(s_s0)) / jnp.where(h == 0, 1.0, h)
        d1_0 = (state.m_prev2 - m0) / jnp.where(r0 == 0, 1.0, r0)
        h_phi_k1 = h_phi_1 / hh - 1
        b1 = h_phi_k1 * 1 / b_h
        h_phi_k2 = h_phi_k1 / hh - 0.5
        b2 = h_phi_k2 * 2 / b_h
        # R = [[1, 1], [r0, 1]]; solve -> rhos
        det = 1 - r0
        det = jnp.where(jnp.abs(det) < 1e-8, 1e-8, det)
        rho1 = (b1 - b2) / det
        rho2 = (b2 - r0 * b1) / det
        xc2 = x_t_ - a_t * b_h * (rho1 * d1_0 + rho2 * d1_t)

        return jnp.where(prev_order >= 2, xc2, xc1)

    # The corrector refines the SAMPLE; the stored x0 prediction (m_t) stays
    # the uncorrected one, exactly as the reference keeps
    # ``model_output_convert`` from before the correction
    # (``fm_solvers_unipc.py:696-711``).
    if use_corrector and order >= 1:
        x = jnp.where(step_index > 0, corrector(x), x)

    # ---------------- predictor (UniP) ------------------------------------
    s_t, s_s0 = sigma_next, sigma_cur
    a_t = 1 - s_t
    h = _lam(s_t) - _lam(s_s0)
    hh = -h
    h_phi_1 = jnp.expm1(hh)
    b_h = jnp.expm1(hh)  # bh2

    x_t_ = s_t / jnp.maximum(s_s0, 1e-8) * x - a_t * h_phi_1 * m_t
    # order 2: rhos_p = [0.5], D1_0 = (m_prev - m_t)/r0
    lam_s1 = _lam(sigma_prev)
    r0 = (lam_s1 - _lam(s_s0)) / jnp.where(h == 0, 1.0, h)
    d1_0 = (state.m_prev - m_t) / jnp.where(r0 == 0, 1.0, r0)
    x2 = x_t_ - a_t * b_h * 0.5 * d1_0
    prev_sample = jnp.where(this_order_p >= 2, x2, x_t_)

    new_state = UniPCState(
        m_prev=m_t,
        m_prev2=state.m_prev,
        last_sample=x,
        lower_order_nums=jnp.minimum(state.lower_order_nums + 1, order),
    )
    return new_state, prev_sample.astype(sample.dtype)


def sample_unipc(
    denoise_fn,
    initial_noise: jax.Array,
    sigmas: jax.Array,
    order: int = 2,
) -> jax.Array:
    """Convenience driver: scan UniPC over the sigma schedule.

    ``denoise_fn(sample, sigma, step_index) -> velocity``.
    """
    num_steps = sigmas.shape[0] - 1
    state = unipc_init(initial_noise.shape, jnp.float32)

    def body(carry, step_index):
        state, x = carry
        v = denoise_fn(x, sigmas[step_index], step_index)
        state, x = unipc_step(
            state, v, x, step_index, sigmas, num_steps, order=order
        )
        return (state, x), None

    (_, x), _ = jax.lax.scan(
        body, (state, initial_noise), jnp.arange(num_steps)
    )
    return x
