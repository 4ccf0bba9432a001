"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU hardware is single-chip in CI; multi-device sharding is validated
on host-platform virtual devices (the capability the reference's distributed
code never had a test harness for — SURVEY.md §4).

The container's ``sitecustomize`` registers and initializes the TPU (axon)
PJRT backend at interpreter startup, before pytest imports this file, so
setting ``JAX_PLATFORMS`` here is too late — we re-exec the interpreter once
with a scrubbed environment.
"""

import os
import sys

if os.environ.get("_LVGT_TEST_REEXEC") != "1":
    env = dict(os.environ)
    env["_LVGT_TEST_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""  # disable sitecustomize TPU registration
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = flags + " --xla_force_host_platform_device_count=8"
    if "collective_call_terminate_timeout" not in flags:
        # XLA hard-exits when a CPU collective rendezvous exceeds 40 s;
        # an oversubscribed host can trip that spuriously.
        flags = (
            flags + " --xla_cpu_collective_call_terminate_timeout_seconds=600"
            " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
        )
    env["XLA_FLAGS"] = flags.strip()
    os.execve(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from ltx_video_gpupoor_tpu.core import MeshConfig, make_mesh

    return make_mesh(MeshConfig(dp=2, sp=2, tp=2))
