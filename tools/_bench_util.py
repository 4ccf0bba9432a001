"""Shared timing harness for the micro-benchmark tools.

Two relay gotchas live here ONCE (see docs/DESIGN.md "perf gotchas"):

- ``sync_scalar``: `jax.block_until_ready` is unreliable through the
  axon relay, and `np.asarray(big)` would fetch the whole array at
  ~13 MB/s. Sync by fetching ONE element of a device-side computation.
- ``timeit_loop``: every dispatch through the relay costs ~100+ ms, so
  small jitted programs must be timed with the repeat loop INSIDE one
  jit. The loop body perturbs the input with a scalar read from the
  previous output — a real data dependence, so XLA can neither hoist
  the loop-invariant computation nor run iterations in parallel.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def sync_scalar(x) -> float:
    """Fetch one element (device sync) from an array or pytree."""
    leaf = jax.tree.leaves(x)[0]
    return float(np.asarray(leaf).reshape(-1)[0])


def timeit_loop(fn, *args, n=20):
    """Per-iteration seconds of ``fn(*args)`` with the loop inside one
    jit; ``args[0]`` must be a float array (it carries the perturbation).
    """

    @jax.jit
    def run(*a):
        def body(i, acc):
            o = fn(a[0] + (acc * 1e-6).astype(a[0].dtype), *a[1:])
            leaf = jax.tree.leaves(o)[0]
            return leaf[(0,) * leaf.ndim].astype(jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    sync_scalar(run(*args))  # compile
    t0 = time.time()
    o = run(*args)
    sync_scalar(o)
    return (time.time() - t0) / n


def timeit_rep(fn, *args, n=30):
    """Per-call seconds of an already-jitted ``fn`` timed call-by-call:
    async dispatch overlaps the relay latency across the n calls, so
    this suits programs big enough (>~100 ms) to dwarf dispatch."""
    sync_scalar(fn(*args))  # compile
    t0 = time.time()
    o = None
    for _ in range(n):
        o = fn(*args)
    sync_scalar(o)
    return (time.time() - t0) / n


def require_backend() -> None:
    """Wait for the relay chip BEFORE the first in-process device touch.

    Honors ``BENCH_WAIT_TPU_S`` (same contract as bench.py) and exits
    non-zero when the relay never answers — so a perf-session step is
    skipped in minutes instead of hanging on an in-process backend init
    until the step's outer ``timeout`` kills it (a failed init is also
    cached for the whole process, which would poison the run anyway).
    """
    import os
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if root not in sys.path:
        sys.path.insert(0, root)
    from bench import wait_for_backend

    if not wait_for_backend():
        print("backend unavailable after wait budget; skipping", flush=True)
        raise SystemExit(3)
