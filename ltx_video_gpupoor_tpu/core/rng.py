"""Deterministic seeding.

Parity target: ``seed_everething`` (sic) at
``/root/reference/ltx_video/ltxv.py:136-143`` and ``seed_everything`` at
``/root/reference/wan/utils/utils.py:24``. In JAX the single source of
randomness is the threaded PRNG key, so "seed everything" collapses to
constructing one key per generation plus stdlib/numpy seeding for host-side
preprocessing.
"""

from __future__ import annotations

import random

import jax
import numpy as np


def seed_everything(seed: int) -> jax.Array:
    """Seed host-side RNGs and return the root JAX key for a generation."""
    seed = int(seed) & 0xFFFFFFFF
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.key(seed)


def split_for(key: jax.Array, *names: str) -> dict[str, jax.Array]:
    """Split a key into named sub-keys (stable w.r.t. name order)."""
    keys = jax.random.split(key, len(names))
    return dict(zip(names, keys))
