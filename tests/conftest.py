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
    # zero-egress image: make the torch-fallback paths fail FAST instead
    # of 5x retry-with-backoff per file (minutes of wall time in the
    # enhancer fallback tests); production keeps the default so online
    # deployments still download
    env.setdefault("HF_HUB_OFFLINE", "1")
    # A full-suite session JIT-compiles hundreds of XLA CPU executables
    # (some concurrently in the warmup/tiling tests); the default
    # vm.max_map_count (65530) can run out of mappings mid-compile,
    # which surfaces as "LLVM compilation error: Cannot allocate
    # memory" + a segfault with >100 GB RAM free. Raise it when we can
    # (root in this container image) for the DURATION OF THE RUN ONLY —
    # the original value is restored at session exit so the suite leaves
    # no persistent host-state change behind. It announces itself and
    # honors an opt-out: set LVGT_KEEP_MAP_COUNT=1 to leave the kernel
    # setting alone entirely.
    if os.environ.get("LVGT_KEEP_MAP_COUNT") != "1":
        try:
            with open("/proc/sys/vm/max_map_count", "r+") as fh:
                orig = int(fh.read())
                if orig < 1048576:
                    fh.seek(0)
                    fh.write("1048576")
                    env["_LVGT_RESTORE_MAP_COUNT"] = str(orig)
                    print("[conftest] raised vm.max_map_count to 1048576 "
                          "for this run (restored to %d at exit; "
                          "LVGT_KEEP_MAP_COUNT=1 to opt out)" % orig)
        except OSError:
            pass
    os.execve(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env)

_restore_map_count = os.environ.pop("_LVGT_RESTORE_MAP_COUNT", None)
if _restore_map_count is not None:
    import atexit

    def _put_back_map_count(value=_restore_map_count):
        try:
            with open("/proc/sys/vm/max_map_count", "w") as fh:
                fh.write(value)
        except OSError:
            pass

    atexit.register(_put_back_map_count)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# smoke / golden / slow tiers (VERDICT r1 item 9, r2 item 9)
#
# `pytest -m smoke` = fast correctness sweep, < 2:30 on one CPU.
# `pytest -m golden` = every numerics-parity oracle (torch-executed or
#   pinned reference outputs) — the "is it still bit-faithful?" tier,
#   < 10 min on one CPU. Orthogonal to smoke/slow: golden tests keep
#   their speed marker too.
# `pytest -m slow` (or no -m) = full suite incl. virtual-mesh
#   parallelism, tiled VAEs, training (~20 min on one CPU).
# ---------------------------------------------------------------------------

_SLOW_MODULES = {
    # virtual-mesh / multi-device
    "test_parallel", "test_ring_rdma", "test_training",
    "test_training_checkpoint",
    # heavy model / pipeline sweeps
    "test_wan_vae", "test_ltx_pipeline", "test_quant_lora",
    "test_wan_model", "test_wan_pipeline", "test_wan_df",
    "test_ltx_vae", "test_legacy_vae", "test_vae_tiling",
    "test_xlm_roberta", "test_clip", "test_t5", "test_ltx_transformer",
    # checkpoint / serving e2e
    "test_checkpoint", "test_model_zoo_integration", "test_serving",
    "test_interrupt_observability", "test_golden_e2e_tool",
}
_SLOW_TESTS = {
    "test_vace_encoders",
    "test_dryrun_body_runs_on_virtual_mesh",
    # full demo-model generations (~80 s compile on one CPU)
    "test_warmup_runs_generation_for_bucket",
    "test_warmup_survives_bad_bucket",
    "test_warmup_blocks_on_generation_lock",
}


_GOLDEN_NAME_PATTERNS = (
    "golden", "matches_reference", "matches_torch", "vs_reference",
    "vs_torch",
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        name = item.name.split("[")[0]
        if (
            mod in _SLOW_MODULES
            or mod.endswith("_golden")
            or name in _SLOW_TESTS
        ):
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.smoke)
        if mod.endswith("_golden") or any(
            p in name for p in _GOLDEN_NAME_PATTERNS
        ):
            item.add_marker(pytest.mark.golden)


@pytest.fixture(scope="session")
def mesh8():
    from ltx_video_gpupoor_tpu.core import MeshConfig, make_mesh

    return make_mesh(MeshConfig(dp=2, sp=2, tp=2))
