#!/usr/bin/env python
"""Timing-methodology validation for bench.py on the tunneled TPU.

Answers two questions the round-3 verdict raised (impossible >peak
FLOP/s figures):

1. Does the pipelined-forward timing change when every dispatch gets
   DIFFERENT input data (rules out any repeat-call elision/memoization
   along the relay or runtime)?  bench.py dispatches the same committed
   arrays 50x; this script times (a) that regime, (b) 8 rotating
   pre-committed batches, (c) donated-state train steps (which cannot be
   elided — the state changes every step).
2. What do the actual on-device kernel times say (jax.profiler trace,
   printed via profile_trace's converter) vs the XLA static cost model?

Usage: python scripts/validate_timing.py [--batch 16] [--iters 50]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    import numpy as np

    from deep3dpointclouddenoising_tpu.utils.compile_cache import \
        enable_persistent_cache
    enable_persistent_cache()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from __graft_entry__ import _example_batch, _flagship_config
    from deep3dpointclouddenoising_tpu.models import build_offset_regression

    print("backend:", jax.default_backend(), flush=True)
    cfg = _flagship_config()
    model, loss_fn = build_offset_regression(cfg)
    b = _example_batch(cfg, batch_size=args.batch)
    variables = model.init(jax.random.PRNGKey(0), b["points"], b["mask"],
                           b["features"], train=False)

    @jax.jit
    def forward(variables, points, mask, features):
        return model.apply(variables, points, mask, features, train=False)

    v = jax.device_put(variables)
    fixed = (jax.device_put(b["points"]), jax.device_put(b["mask"]),
             jax.device_put(b["features"]))

    # 8 distinct pre-committed batches
    rng = np.random.default_rng(1)
    rot = []
    for _ in range(8):
        bb = _example_batch(cfg, batch_size=args.batch)
        bb["points"] = bb["points"] + rng.normal(
            size=bb["points"].shape).astype(np.float32) * 0.01
        rot.append((jax.device_put(bb["points"]), jax.device_put(b["mask"]),
                    jax.device_put(bb["points"].copy())))

    for _ in range(3):
        forward(v, *fixed).block_until_ready()
        forward(v, *rot[0]).block_until_ready()

    def timeit(fn, n):
        t0 = time.perf_counter()
        out = None
        for i in range(n):
            out = fn(i)
        jax.block_until_ready(out)
        return 1e3 * (time.perf_counter() - t0) / n

    ms_same = timeit(lambda i: forward(v, *fixed), args.iters)
    ms_rot = timeit(lambda i: forward(v, *rot[i % 8]), args.iters)
    # fresh device data each dispatch (includes H2D, so an upper bound)
    ms_h2d = timeit(
        lambda i: forward(v, jax.device_put(
            b["points"] + np.float32(1e-6 * i)), fixed[1], fixed[2]), 10)
    print(f"forward same-args:      {ms_same:.3f} ms/call")
    print(f"forward rotating-args:  {ms_rot:.3f} ms/call")
    print(f"forward fresh-H2D args: {ms_h2d:.3f} ms/call (incl. transfer)")
    ratio = ms_rot / ms_same if ms_same > 0 else float("nan")
    print(f"rotating/same ratio: {ratio:.2f} "
          f"({'OK — no repeat-call elision' if ratio < 1.5 else 'SUSPECT'})",
          flush=True)

    # per-call distribution with per-call sync, rotating args
    lat = []
    for i in range(20):
        t0 = time.perf_counter()
        forward(v, *rot[i % 8]).block_until_ready()
        lat.append(1e3 * (time.perf_counter() - t0))
    lat.sort()
    print(f"synced rotating: min {lat[0]:.3f}  p50 {lat[10]:.3f}  "
          f"max {lat[-1]:.3f} ms", flush=True)

    # Is block_until_ready a REAL barrier on this backend?  Compare N
    # dispatches synced by block_until_ready against the same N synced by
    # an actual 1-element D2H fetch — if the fetch-synced loop is much
    # slower, block_until_ready returns early and every number that relied
    # on it was an enqueue rate, not an execution rate.
    def loop(n, sync):
        t0 = time.perf_counter()
        out = None
        for i in range(n):
            out = forward(v, *rot[i % 8])
        sync(out)
        return 1e3 * (time.perf_counter() - t0) / n

    ms_block = loop(args.iters, lambda o: o.block_until_ready())
    ms_fetch = loop(args.iters, lambda o: float(np.asarray(o)[0, 0, 0]))
    print(f"pipelined, block_until_ready sync: {ms_block:.3f} ms/call")
    print(f"pipelined, D2H-fetch sync:         {ms_fetch:.3f} ms/call")
    if ms_fetch > 2.0 * ms_block:
        print("=> block_until_ready is NOT a real barrier here; "
              "trust only D2H-fetch-synced times", flush=True)

    # Delta-scan: single-dispatch lax.scan of S forwards at two lengths;
    # (t_S2 - t_S1) / (S2 - S1) cancels dispatch overhead and sync
    # artifacts — the device-true forward time bench.py now reports.
    import jax.numpy as jnp

    def make(S):
        @jax.jit
        def run(variables, points, mask, features):
            def body(c, _):
                out = model.apply(variables, points + c, mask, features,
                                  train=False)
                return jnp.sum(out) * np.float32(1e-38), ()
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=S)
            return c
        return run

    t = {}
    for S in (16, 64):
        fn = make(S)
        np.asarray(fn(v, *fixed))
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn(v, *fixed)
        np.asarray(out)
        t[S] = (time.perf_counter() - t0) / 3
    print(f"delta-scan forward: {1e3 * (t[64] - t[16]) / 48:.3f} ms "
          f"(S=16: {1e3 * t[16]:.1f} ms total, S=64: {1e3 * t[64]:.1f})",
          flush=True)


if __name__ == "__main__":
    main()
