"""Device mesh and sharding-axis conventions.

Replaces the reference's process-level parallelism (gunicorn workers,
``torch.distributed`` FSDP at ``/root/reference/wan/distributed/fsdp.py``,
xfuser USP at ``/root/reference/wan/distributed/xdit_context_parallel.py``)
with one JAX device mesh and named axes:

- ``dp``: data parallel — independent requests / guidance micro-batches.
- ``sp``: sequence parallel — video-token sequence (Ulysses all-to-all +
  ring attention live on this axis).
- ``tp``: tensor parallel — attention heads and FFN hidden dim.

All collectives are XLA-compiled (``psum`` / ``all_gather`` /
``all_to_all`` / ``ppermute``) over ICI; there is no NCCL analogue.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "dp"
SEQUENCE_AXIS = "sp"
TENSOR_AXIS = "tp"
AXIS_NAMES = (DATA_AXIS, SEQUENCE_AXIS, TENSOR_AXIS)


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Logical mesh shape. ``-1`` on one axis means "use remaining devices"."""

    dp: int = 1
    sp: int = 1
    tp: int = -1

    def resolve(self, n_devices: int) -> tuple[int, int, int]:
        dims = [self.dp, self.sp, self.tp]
        if any(d == 0 or d < -1 for d in dims):
            raise ValueError(
                f"mesh dims must be positive or -1, got {dims}"
            )
        free = [i for i, d in enumerate(dims) if d == -1]
        fixed = math.prod(d for d in dims if d != -1)
        if n_devices % fixed != 0:
            raise ValueError(
                f"{n_devices} devices not divisible by fixed mesh dims {dims}"
            )
        if len(free) > 1:
            raise ValueError("at most one mesh axis may be -1")
        if free:
            dims[free[0]] = n_devices // fixed
        elif math.prod(dims) != n_devices:
            raise ValueError(f"mesh {dims} != {n_devices} devices")
        return tuple(dims)


def make_mesh(
    config: MeshConfig | None = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 3-axis ``Mesh`` over the given (default: all) devices."""
    config = config or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    shape = config.resolve(len(devices))
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, AXIS_NAMES)


def single_device_mesh() -> Mesh:
    return make_mesh(MeshConfig(dp=1, sp=1, tp=1), devices=jax.devices()[:1])


def parse_mesh_spec(spec: str) -> Optional[MeshConfig]:
    """``"dp2,sp2,tp2"`` / ``"sp=4,tp=2"`` -> MeshConfig (unnamed axes
    default to 1); ``"auto"`` -> tensor-parallel over every device
    (numerics-identical scale-out); empty/``"off"`` -> None."""
    spec = (spec or "").strip().lower()
    if not spec or spec in ("off", "0", "false", "none", "1x1x1"):
        return None
    if spec == "auto":
        return MeshConfig(dp=1, sp=1, tp=-1)
    dims = {}
    for part in spec.split(","):
        part = part.strip().replace("=", "")
        axis, num = part[:2], part[2:]
        if axis not in AXIS_NAMES or not (num == "-1" or num.isdigit()):
            raise ValueError(
                f"bad mesh spec {spec!r}: want e.g. 'dp1,sp2,tp4' or 'auto'"
            )
        dims[axis] = int(num)
    return MeshConfig(**{a: dims.get(a, 1) for a in AXIS_NAMES})


def mesh_from_env(env_var: str = "LTXV_TPU_MESH") -> Optional[Mesh]:
    """Build the serving mesh from ``LTXV_TPU_MESH`` (e.g. ``dp1,sp2,tp4``
    or ``auto``), or None when unset / single-device / not satisfiable on
    the visible devices (a mis-sized spec must not take the server down —
    it logs and serves single-device)."""
    import logging
    import os

    try:
        cfg = parse_mesh_spec(os.environ.get(env_var, ""))
        if cfg is None:
            return None
        mesh = make_mesh(cfg)
        if math.prod(mesh.devices.shape) <= 1:
            return None
        return mesh
    except Exception as e:
        logging.getLogger(__name__).warning(
            "%s=%r not usable on %d visible devices (%s) — serving "
            "single-device", env_var, os.environ.get(env_var),
            len(jax.devices()), e,
        )
        return None


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))
