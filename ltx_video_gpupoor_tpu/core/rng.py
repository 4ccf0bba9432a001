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
    """Seed host-side RNGs and return the root JAX key for a generation.

    Two 64-bit user seeds differing only in high bits must not collide:
    under the default (x64-disabled) config ``jax.random.key`` truncates
    to 32 bits, so the high word is folded in explicitly. numpy's legacy
    API needs the 32-bit mask."""
    seed = int(seed)
    random.seed(seed)
    np.random.seed(seed & 0xFFFFFFFF)
    key = jax.random.key(seed & 0xFFFFFFFF)
    high = (seed >> 32) & 0xFFFFFFFF
    if high:
        key = jax.random.fold_in(key, high)
    return key


def split_for(key: jax.Array, *names: str) -> dict[str, jax.Array]:
    """Named sub-keys derived by folding a stable hash of each NAME into
    the key — adding/reordering names never changes another name's key
    (a positional split would)."""
    import zlib

    return {
        n: jax.random.fold_in(key, zlib.crc32(n.encode()) & 0x7FFFFFFF)
        for n in names
    }
