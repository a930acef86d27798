#!/usr/bin/env python
"""Op-level device profile of the flagship forward (or train step).

Captures a ``jax.profiler`` trace on the active backend and prints the
top-k ops by self time using xprof's trace converters — the TPU-native
equivalent of the reference's (absent) profiling story beyond wall-clock
meters (SURVEY.md §5 names `jax.profiler` traces as the plan).

Usage:
  python scripts/profile_trace.py [--batch 16] [--train] [--top 30]
"""
from __future__ import annotations

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(args, trace_dir: str) -> None:
    import jax

    from __graft_entry__ import _example_batch, _flagship_config
    from deep3dpointclouddenoising_tpu.models import build_offset_regression
    from deep3dpointclouddenoising_tpu.train import Trainer
    from deep3dpointclouddenoising_tpu.utils.compile_cache import \
        enable_persistent_cache

    enable_persistent_cache()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    print("backend:", jax.default_backend(), flush=True)

    cfg = _flagship_config(num_points=args.num_points)
    b = _example_batch(cfg, batch_size=args.batch)
    model, loss_fn = build_offset_regression(cfg)
    rng = jax.random.PRNGKey(0)

    if args.train:
        cfg.batch_size = args.batch
        trainer = Trainer(cfg, model, loss_fn, n_iter_per_epoch=100)
        state = trainer.init_state(rng, b)
        step = lambda: trainer.train_step(state, b, rng)[1]
    else:
        variables = model.init(rng, b["points"], b["mask"], b["features"],
                               train=False)
        fwd = jax.jit(lambda: model.apply(variables, b["points"], b["mask"],
                                          b["features"], train=False))
        step = fwd

    for _ in range(3):  # compile + warm
        jax.block_until_ready(step())
    with jax.profiler.trace(trace_dir):
        for _ in range(args.iters):
            out = step()
        jax.block_until_ready(out)


def report(trace_dir: str, top: int) -> None:
    """Print top ops by self time from the captured .xplane.pb."""
    from xprof.convert import raw_to_tool_data as rtd

    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        print("no xplane captured (backend may not support profiling)")
        return
    import json

    data, _ = rtd.xspace_to_tool_data([paths[-1]], "framework_op_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    tables = json.loads(data)
    rows = []
    for tbl in tables if isinstance(tables, list) else [tables]:
        cols = [c["id"] for c in tbl.get("cols", [])]
        for r in tbl.get("rows", []):
            d = dict(zip(cols, [c.get("v") for c in r["c"]]))
            rows.append(d)
    dev = [r for r in rows if r.get("host_or_device") == "Device"
           and r.get("type") != "IDLE"]
    dev.sort(key=lambda r: -(r.get("total_self_time") or 0))
    print(f"{'op type':<28} {'occur':>6} {'self us':>10} {'dev %':>6} "
          f"{'bound by':>10}  operation")
    for r in dev[:top]:
        print(f"{str(r.get('type')):<28} {int(r.get('occurrences') or 0):>6} "
              f"{(r.get('total_self_time') or 0):>10.1f} "
              f"{(r.get('device_total_self_time_percent') or 0):>6.2f} "
              f"{str(r.get('bound_by')):>10}  "
              f"{str(r.get('operation'))[:60]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--num_points", type=int, default=500)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--trace_dir", default="/tmp/d3pcd_trace")
    args = ap.parse_args()
    os.makedirs(args.trace_dir, exist_ok=True)
    capture(args, args.trace_dir)
    time.sleep(1.0)
    report(args.trace_dir, args.top)


if __name__ == "__main__":
    main()
