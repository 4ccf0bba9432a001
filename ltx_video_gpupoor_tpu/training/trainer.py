"""Flow-matching trainer for the LTX DiT.

The reference fork is inference-only, but its base model family is trained
with rectified-flow / flow-matching (the sampler in
``/root/reference/ltx_video/schedulers/rf.py`` integrates
``z_t = (1 - t) x0 + t eps`` with the network predicting the velocity
``eps - x0``).  This module provides the matching TPU-native training step:

- per-sample timesteps drawn uniformly (optionally logit-normal shifted),
- velocity-MSE loss in fp32 with bf16 activations,
- ``jax.grad`` + optax update, all under one sharded ``jit`` so XLA SPMD
  inserts the gradient all-reduce over the ``dp``/``sp`` mesh axes,
- optional rematerialisation of the block scan to trade FLOPs for HBM.

Everything is a pure function over (params, opt_state, batch, rng); the
driver's ``dryrun_multichip`` jits ``train_step`` over the device mesh.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..models.ltx import transformer3d
from ..schedulers import rf


class TrainBatch(NamedTuple):
    """One training micro-batch of patchified latent tokens."""

    tokens: jax.Array       # [B, S, C] clean latents (patchified)
    coords: jax.Array       # [B, 3, S] fractional latent coordinates
    caption: jax.Array      # [B, Sc, caption_channels]
    caption_mask: jax.Array  # [B, Sc] 1=keep


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 0.01
    b1: float = 0.9
    b2: float = 0.95
    grad_clip: float = 1.0
    # timestep sampling: "uniform" or "logit_normal" (SD3-style)
    timestep_sampling: str = "uniform"
    logit_mean: float = 0.0
    logit_std: float = 1.0
    remat: bool = True


def make_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    # standard transformer recipe: weight decay applies to matmul kernels
    # only — norm weights, biases (ndim < 2), and the adaLN
    # scale_shift/modulation tables (2-3D, matched by name) must not
    # shrink toward zero
    def decay_mask(params):
        from ..core.params import flatten, unflatten

        flat = flatten(params)
        return unflatten({
            k: (
                v.ndim >= 2
                and "scale_shift" not in k
                and "modulation" not in k
            )
            for k, v in flat.items()
        })

    return optax.chain(
        optax.clip_by_global_norm(tc.grad_clip),
        optax.adamw(
            tc.learning_rate, b1=tc.b1, b2=tc.b2,
            weight_decay=tc.weight_decay, mask=decay_mask,
        ),
    )


def sample_timesteps(key: jax.Array, batch: int, tc: TrainConfig) -> jax.Array:
    if tc.timestep_sampling == "logit_normal":
        u = jax.random.normal(key, (batch,)) * tc.logit_std + tc.logit_mean
        return jax.nn.sigmoid(u)
    if tc.timestep_sampling != "uniform":
        raise ValueError(
            f"unknown timestep_sampling {tc.timestep_sampling!r} "
            "(expected 'uniform' or 'logit_normal')"
        )
    return jax.random.uniform(key, (batch,))


def flow_match_loss(
    params: dict,
    cfg: transformer3d.LTXTransformerConfig,
    batch: TrainBatch,
    rng: jax.Array,
    tc: TrainConfig,
    attn_mode: str = "auto",
) -> tuple[jax.Array, dict]:
    """Velocity-prediction MSE: the network sees ``z_t = (1-t) x0 + t eps``
    and must output ``eps - x0`` (so one Euler step toward t=0 denoises —
    the convention ``rf.step`` integrates)."""
    kt, kn = jax.random.split(rng)
    b = batch.tokens.shape[0]
    t = sample_timesteps(kt, b, tc)
    x0 = batch.tokens.astype(jnp.float32)
    eps = jax.random.normal(kn, x0.shape, jnp.float32)
    z_t = rf.add_noise(x0, eps, t).astype(batch.tokens.dtype)

    fwd = transformer3d.forward
    if tc.remat:
        fwd = jax.checkpoint(fwd, static_argnums=(1, 8, 9))
    v = fwd(
        params, cfg, z_t, batch.coords, t, batch.caption,
        batch.caption_mask, None, None, attn_mode,
    ).astype(jnp.float32)

    target = eps - x0
    loss = jnp.mean(jnp.square(v - target))
    return loss, {"loss": loss, "t_mean": jnp.mean(t)}


def make_train_step(
    cfg: transformer3d.LTXTransformerConfig,
    tc: TrainConfig,
    optimizer: Optional[optax.GradientTransformation] = None,
    attn_mode: str = "auto",
) -> Callable[..., tuple[dict, Any, dict]]:
    """Build ``train_step(params, opt_state, batch, rng)``.

    The returned function is pure and jit/pjit-friendly; under a sharded
    ``jit`` XLA SPMD derives the gradient reductions from the parameter
    shardings (no explicit psum needed).
    """
    opt = optimizer if optimizer is not None else make_optimizer(tc)

    def train_step(params, opt_state, batch: TrainBatch, rng):
        def loss_fn(p):
            return flow_match_loss(p, cfg, batch, rng, tc, attn_mode)

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        # grads follow param dtype; optimizer math in fp32
        grads = jax.tree.map(lambda g: g.astype(jnp.float32), grads)
        updates, opt_state = opt.update(
            grads, opt_state, jax.tree.map(lambda p: p.astype(jnp.float32),
                                           params)
        )
        params = jax.tree.map(
            lambda p, u: (p.astype(jnp.float32) + u).astype(p.dtype),
            params, updates,
        )
        metrics = dict(metrics, grad_norm=optax.global_norm(grads))
        return params, opt_state, metrics

    return train_step


def init_train_state(
    params: dict, tc: TrainConfig,
    optimizer: Optional[optax.GradientTransformation] = None,
):
    opt = optimizer if optimizer is not None else make_optimizer(tc)
    return opt.init(jax.tree.map(lambda p: p.astype(jnp.float32), params))
