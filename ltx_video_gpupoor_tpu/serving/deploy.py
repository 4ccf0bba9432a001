"""Cloud deployment entrypoint (Beam-Pod equivalent).

Parity target: ``/root/reference/beamapp.py`` — a Pod built from the
requirements image, one accelerator, gunicorn ``-w 2 --timeout 600``, model
volume mounted at ``./ckpts``, 5-minute keep-warm. The TPU translation: one
v5e host per replica, the same HTTP surface (see server.py), checkpoints on
an attached volume. Process-replication DP (two gunicorn workers sharing
one GPU) becomes one server process per TPU chip — each worker owns its
chip, so workers scale with ``--workers``.

The ``beam`` SDK is optional; without it this module just describes the
deployment and can launch the local server for testing.
"""

from __future__ import annotations

import dataclasses
import os


@dataclasses.dataclass(frozen=True)
class DeploySpec:
    name: str = "ltxv-tpu"
    accelerator: str = "v5e-1"
    memory: str = "32Gi"
    cpu: int = 8
    workers: int = 1            # one worker per TPU chip
    timeout_s: int = 600
    keep_warm_seconds: int = 300
    volume_path: str = "./ckpts"
    port: int = 7860
    env: tuple = (
        ("MODEL_MODE", "ltxv_13B_distilled"),
        ("QUANTIZATION", "int8"),
        ("PROFILE_TYPE_ID", "1"),
    )


def entrypoint(spec: DeploySpec | None = None):
    """Container entrypoint: env config + HTTP server (``beamapp.py:41``)."""
    spec = spec or DeploySpec()
    for k, v in spec.env:
        os.environ.setdefault(k, v)
    from .server import InferenceService, create_stdlib_server

    service = InferenceService()
    server = create_stdlib_server(service, port=spec.port)
    server.serve_forever()


if __name__ == "__main__":
    entrypoint()
