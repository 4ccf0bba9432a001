"""Training checkpoint/resume (orbax).

The reference fork is inference-only, so this has no upstream
counterpart; it completes the bonus training subsystem
(``training/trainer.py``) with crash-safe state persistence:

- one orbax ``CheckpointManager`` over ``(params, opt_state, step, rng)``
  with retention and atomic-commit semantics,
- sharding-aware restore: the target structure's ``Sharding`` (from the
  live train-state pytree) drives placement, so a checkpoint written on
  one mesh restores onto another (orbax reshards on read) — a
  single-host save resumes on a ``dp×sp×tp`` mesh and vice versa,
- RNG keys stored as raw ``uint32`` key data (typed PRNG arrays don't
  serialize portably).

Pure-host orchestration: nothing here traces or jits; it only moves
device buffers to/from the store.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp


def _manager(directory: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        directory,
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True
        ),
    )


def _pack_rng(rng: jax.Array) -> jax.Array:
    """Typed PRNG keys -> raw uint32 key data (portable)."""
    if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key):
        return jax.random.key_data(rng)
    return rng


def _rng_impl_name(rng_like) -> Optional[str]:
    """PRNG impl name carried by a typed key (concrete array OR
    ``jax.ShapeDtypeStruct``) — the impl travels in the dtype."""
    try:
        return rng_like.dtype._impl.name
    except Exception:
        try:
            return str(jax.random.key_impl(rng_like))
        except Exception:
            return None


def _unpack_rng(data: jax.Array, impl: Optional[str]) -> jax.Array:
    """Raw uint32 key data -> typed key under the TARGET's impl.

    ``impl=None`` means the target rng is untyped raw data. Passing the
    impl explicitly (instead of relying on ``jax_default_prng_impl``)
    keeps resume bit-exact when the process default differs from the
    impl the run trains with (e.g. ``rbg`` on TPU): cross-impl restores
    with different key widths fail loudly on the shape instead of
    silently reinterpreting the bits."""
    if impl is None:
        return data
    return jax.random.wrap_key_data(data, impl=impl)


@dataclasses.dataclass
class TrainCheckpointer:
    """Save/restore the trainer's ``(params, opt_state, rng)`` by step.

    Usage::

        ckpt = TrainCheckpointer("/ckpts/run1")
        ckpt.save(step, params, opt_state, rng)
        ...
        step, params, opt_state, rng = ckpt.restore(
            params_like, opt_state_like, rng_like)

    ``*_like`` are live pytrees (or ``jax.ShapeDtypeStruct`` trees with
    ``.sharding`` set) giving the structure, dtypes, and target
    shardings for the restore.
    """

    directory: str
    max_to_keep: int = 3

    def __post_init__(self):
        self._mgr = _manager(self.directory, self.max_to_keep)

    # -- write ---------------------------------------------------------
    def save(self, step: int, params: dict, opt_state: Any,
             rng: jax.Array, wait: bool = True) -> None:
        import orbax.checkpoint as ocp

        state = {
            "params": params,
            "opt_state": opt_state,
            "rng": _pack_rng(rng),
        }
        self._mgr.save(int(step), args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()

    # -- read ----------------------------------------------------------
    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, params_like: dict, opt_state_like: Any,
                rng_like: jax.Array, step: Optional[int] = None):
        """Returns ``(step, params, opt_state, rng)`` at ``step`` (or the
        latest). Placement follows the ``*_like`` trees' shardings."""
        import orbax.checkpoint as ocp

        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(
                f"no checkpoint under {self.directory!r}"
            )
        rng_typed = jnp.issubdtype(rng_like.dtype, jax.dtypes.prng_key)
        rng_impl = _rng_impl_name(rng_like) if rng_typed else None

        def abstract(x):
            x = jax.ShapeDtypeStruct(
                jnp.shape(x), jnp.result_type(x),
                sharding=getattr(x, "sharding", None),
            )
            return x

        # packed-rng structure via eval_shape: works whether rng_like is
        # a concrete key array or an abstract ShapeDtypeStruct (key_data
        # on an abstract value would raise)
        rng_packed = jax.eval_shape(_pack_rng, rng_like)
        rng_packed = jax.ShapeDtypeStruct(
            rng_packed.shape, rng_packed.dtype,
            sharding=getattr(rng_like, "sharding", None),
        )
        target = {
            "params": jax.tree.map(abstract, params_like),
            "opt_state": jax.tree.map(abstract, opt_state_like),
            "rng": rng_packed,
        }
        state = self._mgr.restore(
            int(step), args=ocp.args.StandardRestore(target)
        )
        return (
            int(step),
            state["params"],
            state["opt_state"],
            _unpack_rng(state["rng"], rng_impl),
        )

    def close(self) -> None:
        self._mgr.close()
