#!/usr/bin/env python
"""Split the flagship forward's device time into geometry-pyramid vs network
compute, and compare float32 vs bfloat16 compute modes.

Usage: python scripts/profile_forward.py [--platform cpu] [--batch 16]

Each jit region is compiled and timed separately so the output attributes
wall time to (a) the neighbor/subsample pyramid, (b) the full model forward,
and (c) the full model forward in bfloat16 — the three levers that matter
for bench.py.  On the tunneled TPU every compile costs minutes; run with
run_in_background.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time(fn, *args, iters=10, warmup=2):
    import jax
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--num_points", type=int, default=500)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from deep3dpointclouddenoising_tpu.utils.compile_cache import \
        enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch, _flagship_config
    from deep3dpointclouddenoising_tpu.models import build_offset_regression
    from deep3dpointclouddenoising_tpu.models.pyramid import build_pyramid

    print("backend:", jax.default_backend(), flush=True)
    cfg = _flagship_config(num_points=args.num_points)
    b = _example_batch(cfg, batch_size=args.batch)
    pts = jax.device_put(jnp.asarray(b["points"]))
    msk = jax.device_put(jnp.asarray(b["mask"]))
    feat = jax.device_put(jnp.asarray(b["features"]))
    pps_denom = args.batch * args.num_points

    # (a) pyramid only
    pyr_fn = jax.jit(lambda p, m: build_pyramid(
        p, m, radius=float(cfg.radius), sample_dl=float(cfg.sampleDl),
        nsamples=list(cfg.nsamples), npoints=list(cfg.npoints)))
    t = _time(pyr_fn, pts, msk)
    print(f"pyramid_only: {t*1e3:.3f} ms  ({pps_denom/t:,.0f} pts/s)",
          flush=True)

    # (b)/(c) full forward per compute dtype
    for dtype in ("float32", "bfloat16"):
        cfg.compute_dtype = dtype
        model, _ = build_offset_regression(cfg)
        variables = model.init(jax.random.PRNGKey(0), b["points"], b["mask"],
                               b["features"], train=False)
        fwd = jax.jit(lambda p, m, f: model.apply(variables, p, m, f,
                                                  train=False))
        t = _time(fwd, pts, msk, feat)
        out = fwd(pts, msk, feat)
        print(f"forward[{dtype}]: {t*1e3:.3f} ms  ({pps_denom/t:,.0f} pts/s)"
              f"  out_std={float(jnp.std(out)):.5f}", flush=True)


if __name__ == "__main__":
    main()
