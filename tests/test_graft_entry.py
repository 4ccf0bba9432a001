"""Driver-contract regression tests (__graft_entry__.py).

Round 2's only red gate was this file: the dryrun outgrew the driver
budget and nothing in the suite noticed. Pin both contract functions —
``entry()`` must return a jittable (fn, args) fast even with a dead
relay, and ``_dryrun_multichip_body(8)`` must compile + run its SPMD
programs on the 8-virtual-device CPU mesh the conftest provides.
"""

import sys
import time

import jax
import pytest


def _entry_mod():
    import __graft_entry__ as g

    return g


def test_entry_returns_jittable(monkeypatch):
    # zero wait budget: a single probe (fast on the CPU test backend),
    # then straight to building the flagship step
    monkeypatch.setenv("GRAFT_ENTRY_WAIT_S", "0")
    g = _entry_mod()
    t0 = time.time()
    fn, args = g.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (1, 256, 128)
    assert time.time() - t0 < 120, "entry() too slow for the driver budget"


def test_dryrun_body_runs_on_virtual_mesh():
    g = _entry_mod()
    t0 = time.time()
    g._dryrun_multichip_body(8)
    # the driver gate must stay FAR inside its ~5 min budget even on a
    # loaded host; this single-suite run should be well under 3 min
    assert time.time() - t0 < 180, "dryrun body outgrew the driver budget"


def test_dryrun_optional_groups_on_virtual_mesh():
    """The decode and Wan-DF groups are part of the DEFAULT dryrun set
    since r4 (VERDICT r3 #5); pin that each group body runs standalone
    on the virtual mesh the way the per-group watchdog subprocesses do.
    """
    g = _entry_mod()
    t0 = time.time()
    g._dryrun_multichip_body(8, group="decode")
    g._dryrun_multichip_body(8, group="wandf")
    assert time.time() - t0 < 150, "optional groups outgrew their watchdogs"


def test_last_good_contention_guard(tmp_path, monkeypatch):
    """BENCH_LAST_GOOD is the outage fallback: a contended relay window
    (same metric, >1.4x slower) must not clobber it, while faster rows
    and changed workloads always overwrite (r3h: a 46.8 s window
    overwrote a 13.1 s record for identical HLO)."""
    import json

    import bench

    path = tmp_path / "BENCH_LAST_GOOD.json"
    monkeypatch.setattr(bench, "LAST_GOOD_PATH", str(path))

    def row(metric, value):
        return {"metric": metric, "value": value, "unit": "s",
                "vs_baseline": 1.0}

    bench._save_last_good(row("m1", 13.0), {"denoise_s": 12.7})
    assert json.loads(path.read_text())["result"]["value"] == 13.0
    # contended same-metric row: rejected
    bench._save_last_good(row("m1", 46.8), {"denoise_s": 46.5})
    assert json.loads(path.read_text())["result"]["value"] == 13.0
    # modest slowdown (run noise / genuine small regression): recorded
    bench._save_last_good(row("m1", 14.0), {"denoise_s": 13.6})
    assert json.loads(path.read_text())["result"]["value"] == 14.0
    # faster: recorded
    bench._save_last_good(row("m1", 12.5), {"denoise_s": 12.1})
    assert json.loads(path.read_text())["result"]["value"] == 12.5
    # different workload: always recorded
    bench._save_last_good(row("m2", 99.0), {"denoise_s": 98.0})
    assert json.loads(path.read_text())["result"]["metric"] == "m2"
