#!/usr/bin/env python
"""Hang-resilient supervisor for long training runs.

The tunneled-TPU backend is known to hang mid-run (process near-0% CPU, all
threads in futex wait, no log progress).  The reference has no recovery
story at all (SURVEY.md §5: crashes kill the job, recovery = manual restart
with --load_path); this supervisor closes that gap the way a production
runner would: watch the run's log file, and if it stops advancing for
``--stall_timeout`` seconds, SIGKILL the child and relaunch it with
``--auto_resume`` so it continues from the last per-epoch checkpoint.

Usage:
  python scripts/supervise.py --log_file <dir>/log.txt \
      [--stall_timeout 600] [--max_restarts 10] -- \
      python scripts/train.py --config_file ... --auto_resume ...

The child command must (a) append to --log_file while healthy and (b)
support being relaunched idempotently (scripts/train.py --auto_resume).
"""
from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time


def parse_args():
    p = argparse.ArgumentParser("training-run supervisor")
    p.add_argument("--log_file", required=True,
                   help="file whose mtime indicates liveness")
    p.add_argument("--stall_timeout", type=float, default=900.0,
                   help="seconds without log progress before kill+relaunch "
                   "(a cold remote compile can be silent for ~10 min — do "
                   "not set this below that, or the supervisor will kill "
                   "healthy startups in a loop)")
    p.add_argument("--poll", type=float, default=15.0)
    p.add_argument("--max_restarts", type=int, default=10)
    argv = sys.argv[1:]
    if "--" not in argv:
        p.error("separate the child command with `--`")
    split = argv.index("--")
    args = p.parse_args(argv[:split])
    args.cmd = argv[split + 1:]
    if not args.cmd:
        p.error("empty child command")
    return args


def _mtime(path: str) -> float:
    try:
        return os.path.getmtime(path)
    except OSError:
        return 0.0


def run_once(args) -> int:
    """Run the child until exit or stall. Returns exit code, or -1 on
    stall-kill."""
    child = subprocess.Popen(args.cmd, start_new_session=True)
    start = time.time()
    while True:
        try:
            rc = child.wait(timeout=args.poll)
            return rc
        except subprocess.TimeoutExpired:
            pass
        last = max(_mtime(args.log_file), start)
        if time.time() - last > args.stall_timeout:
            print(f"[supervise] no log progress for "
                  f"{time.time() - last:.0f}s — killing pid {child.pid}",
                  flush=True)
            # kill the whole session group (child may have helper threads /
            # grandchildren); never pattern-match process names
            try:
                os.killpg(os.getpgid(child.pid), signal.SIGKILL)
            except OSError:
                child.kill()
            child.wait()
            return -1


def main():
    args = parse_args()
    restarts = 0
    while True:
        rc = run_once(args)
        if rc == 0:
            print("[supervise] child finished cleanly", flush=True)
            return 0
        restarts += 1
        if restarts > args.max_restarts:
            print(f"[supervise] giving up after {args.max_restarts} "
                  f"restarts (last rc={rc})", flush=True)
            return 1
        print(f"[supervise] restart {restarts}/{args.max_restarts} "
              f"(rc={rc})", flush=True)
        time.sleep(5.0)


if __name__ == "__main__":
    sys.exit(main())
