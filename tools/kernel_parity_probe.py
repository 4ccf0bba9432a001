"""Standalone on-hardware kernel-parity gate, decoupled from bench.py.

Round-2 lesson: the parity record was only refreshed by the headline
bench, so one relay outage at bench time left the round with a frozen
snapshot. This probe waits for the chip on its OWN schedule (same
continuous short-probe loop as bench.wait_for_backend) and rewrites
``PARITY_KERNEL.json`` with a ``checked_at`` timestamp. Run it at the
start of every perf session:

    python tools/kernel_parity_probe.py [--wait S] [--no-stress]

Exit 0 iff the parity run completed and passed; exit 2 if the backend
never answered (the old record is left untouched — a stale-but-labeled
record beats none).
"""

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
OUT = os.path.join(REPO, "PARITY_KERNEL.json")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--wait", type=float, default=900.0,
                    help="max seconds to wait for the relay chip")
    ap.add_argument("--no-stress", action="store_true",
                    help="skip the adversarial bounded-score stress sweep")
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from bench import wait_for_backend

    os.environ.setdefault("BENCH_WAIT_TPU_S", str(args.wait))
    history: list = []
    if not wait_for_backend(max_wait_s=args.wait, history=history):
        print(json.dumps({"ok": None, "probe_history": history,
                          "error": "backend unavailable; record untouched"}))
        return 2

    # run the parity check in a subprocess so a crash can't leave this
    # process with a poisoned backend; write to a temp path and only
    # replace the record on completion
    tmp = OUT + ".tmp"
    if os.path.exists(tmp):
        os.remove(tmp)
    cmd = [sys.executable, os.path.join(HERE, "check_tpu_parity.py"),
           "--json", tmp]
    if not args.no_stress:
        cmd.insert(2, "--stress")
    try:
        proc = subprocess.run(cmd, cwd=REPO, capture_output=True,
                              text=True, timeout=900)
    except subprocess.TimeoutExpired as e:
        # a mid-run relay stall must still emit the JSON contract line
        if os.path.exists(tmp):
            os.remove(tmp)
        tail = ((e.stdout or b"")[-400:] if isinstance(e.stdout, bytes)
                else (e.stdout or "")[-400:])
        print(json.dumps({"ok": None,
                          "error": "parity run timed out (900s); "
                                   "record untouched",
                          "tail": str(tail)}))
        return 2
    try:
        with open(tmp) as fh:
            res = json.load(fh)
    except Exception as e:
        print(json.dumps({"ok": False, "rc": proc.returncode,
                          "error": f"no result file: {e}",
                          "tail": proc.stdout[-400:] + proc.stderr[-400:]}))
        return 1
    os.remove(tmp)
    import socket

    res["checked_at"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    res["parity_rc"] = proc.returncode
    # reuse (bench.py::_emit_parity) is host-pinned: a committed record
    # from another machine must never pass as this hardware's verdict
    res["host"] = socket.gethostname()
    with open(OUT, "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res))
    return 0 if (proc.returncode == 0 and res.get("ok")) else 1


if __name__ == "__main__":
    raise SystemExit(main())
