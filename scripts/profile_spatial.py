#!/usr/bin/env python
"""Measure the spatial (point-sharded) full-cloud forward: XLA/GSPMD
aggregation vs the fused shard_map Pallas KPConv path.

The spatial path (parallel/spatial.py) denoises one giant cloud in a single
U-Net forward with the point axis sharded over the mesh — the TPU-native
alternative to the reference's overlapping-patch voting
(/root/reference/u_net_arch/qualitative_inference_test.py:282-344).  Its
aggregation has two modes: pure-XLA (GSPMD partitions it; the oracle) and
the fused Pallas kernel per device via shard_map.  This script times both
on the same cloud and prints the speedup — the number RESULTS.md cites.

Usage:
    python scripts/profile_spatial.py [--platform cpu] [--num_points 16384]

On the tunneled TPU each variant costs a multi-minute remote compile; run
with run_in_background.  On CPU pass --platform cpu (the Pallas kernel runs
in interpret mode there, so only the XLA number is meaningful).
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
    ap.add_argument("--num_points", type=int, default=16384,
                    help="giant-cloud size (chamfer cfgs run 15000-point "
                         "patches; 16384 buckets the 140k-density shapes)")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--skip_xla", action="store_true")
    ap.add_argument("--skip_pallas", action="store_true")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from deep3dpointclouddenoising_tpu.utils.compile_cache import \
        enable_persistent_cache
    enable_persistent_cache()
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from __graft_entry__ import _flagship_config
    from deep3dpointclouddenoising_tpu.parallel.mesh import (
        DATA_AXIS, make_mesh)
    from deep3dpointclouddenoising_tpu.parallel.spatial import \
        build_spatial_model

    print("backend:", jax.default_backend(),
          "devices:", len(jax.devices()), flush=True)

    # flagship geometry scaled to the giant cloud, exactly like
    # infer.denoise_clouds_spatial: trained radii/sampleDl/nsamples kept,
    # subsample capacities follow the reference num_points/4/16/32/128
    # schedule (train_dist.py:133-137)
    n = args.num_points
    cfg = _flagship_config(num_points=n)
    cfg.npoints = [max(n // 4, 1), max(n // 16, 1),
                   max(n // 32, 1), max(n // 128, 1)]

    rng = np.random.default_rng(0)
    pts = (rng.random((args.batch, n, 3)) * 0.1).astype(np.float32)
    mask = np.ones((args.batch, n), np.float32)
    mask[:, -5:] = 0.0

    mesh = make_mesh()
    pts_sh = NamedSharding(mesh, P(None, DATA_AXIS, None))
    msk_sh = NamedSharding(mesh, P(None, DATA_AXIS))
    d_pts = jax.device_put(jnp.asarray(pts), pts_sh)
    d_msk = jax.device_put(jnp.asarray(mask), msk_sh)

    pps = args.batch * n
    results = {}
    variables = None
    for label, pallas in (("xla_gspmd", False), ("pallas_shard_map",
                                                 "shard_map")):
        if (pallas is False and args.skip_xla) or \
           (pallas != False and args.skip_pallas):  # noqa: E712
            continue
        if pallas == "shard_map" and jax.default_backend() != "tpu":
            # interpret-mode Pallas per shard: correctness only, not perf
            print(f"{label}: skipped (non-TPU backend)", flush=True)
            continue
        model = build_spatial_model(cfg, mesh, pallas=pallas)
        if variables is None:
            variables = jax.device_put(model.init(
                jax.random.PRNGKey(0), d_pts, d_msk, d_pts, train=False))
        fwd = jax.jit(lambda v, p, m, f, _model=model:
                      _model.apply(v, p, m, f, train=False))
        t0 = time.perf_counter()
        out = jax.block_until_ready(fwd(variables, d_pts, d_msk, d_pts))
        print(f"{label}: compile+first call {time.perf_counter()-t0:.1f}s",
              flush=True)
        dt = _time(fwd, variables, d_pts, d_msk, d_pts, iters=args.iters)
        results[label] = (dt, out)
        print(f"{label}: {dt*1e3:.2f} ms/cloud  "
              f"({pps/dt/1e6:.2f} Mpts/s)", flush=True)

    if len(results) == 2:
        (dx, ox), (dp, op) = (results["xla_gspmd"],
                              results["pallas_shard_map"])
        err = float(jnp.max(jnp.abs(ox - op)))
        print(f"pallas vs xla: speedup {dx/dp:.2f}x  max|diff| {err:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
