#!/usr/bin/env python
"""Microbenchmark the geometry ops that bound the forward (VERDICT r4 #3).

The flagship forward is NOT matmul-bound (MFU 0.31%, bf16 does not move
it), so the time lives in the neighbor ops: ball-query ``top_k`` over the
full support set, the grid-subsample double ``argsort``, the 1-NN argmin,
and the pyramid glue.  This script times each op in isolation on the
active backend with the delta-scan method (two scan lengths, difference —
dispatch overhead cancels; the same methodology as bench.py), at both the
flagship (B16, N=500) and large (B4, N=15000) geometries.

Usage:
  python scripts/profile_ops.py [--large] [--platform cpu]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def delta_scan_ms(jax, fn, args, sizes=(4, 12)) -> float:
    """Device-true ms/call: lax.scan of S serialized calls, two S values."""
    import jax.numpy as jnp

    def make(S):
        def run(*args):
            def body(c, _):
                out = fn(*((args[0] + c,) + args[1:]))
                leaf = jax.tree_util.tree_leaves(out)[0]
                return jnp.sum(leaf.astype(jnp.float32)) * np.float32(1e-30), ()
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=S)
            return c
        return jax.jit(run)

    times = {}
    for S in sizes:
        f = make(S)
        np.asarray(f(*args))  # compile + run
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            np.asarray(f(*args))
            best = min(best, time.perf_counter() - t0)
        times[S] = best
    s0, s1 = sizes
    return 1e3 * (times[s1] - times[s0]) / (s1 - s0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--large", action="store_true",
                   help="15k-point chamfer geometry instead of flagship")
    p.add_argument("--ops", type=str, default="",
                   help="comma-separated subset of op names to run")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from deep3dpointclouddenoising_tpu.utils.compile_cache import \
        enable_persistent_cache
    enable_persistent_cache()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    print("backend:", jax.default_backend(), flush=True)

    from deep3dpointclouddenoising_tpu.models.pyramid import build_pyramid
    from deep3dpointclouddenoising_tpu.ops import (
        masked_grid_subsampling, masked_nearest_query,
        masked_ordered_ball_query)

    if args.large:
        B, N, K = 4, 15000, 26
        radius, dl = 0.05, 0.02  # chamfer_5e3 twin geometry scale
        nsamples = [26, 31, 38, 41, 39]
        npoints = [N // 4, N // 16, N // 32, N // 128]
    else:
        B, N, K = 16, 500, 26
        radius, dl = 0.05, 0.02
        nsamples = [26, 31, 38, 41, 39]
        npoints = [N // 4, N // 16, N // 32, N // 128]

    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.random((B, N, 3), np.float32) * 0.4)
    mask = jnp.ones((B, N), jnp.float32)
    sub = jnp.asarray(rng.random((B, N // 4, 3), np.float32) * 0.4)
    smask = jnp.ones((B, N // 4), jnp.float32)

    todo = set(args.ops.split(",")) if args.ops else None

    def run(name, fn, fargs):
        if todo and name not in todo:
            return
        ms = delta_scan_ms(jax, fn, fargs)
        print(f"{name:34s} {ms:9.3f} ms/call", flush=True)

    run("ball_query_self", lambda x, m: masked_ordered_ball_query(
        x, x, m, m, radius=radius, nsample=K), (xyz, mask))
    run("ball_query_pool", lambda s, x: masked_ordered_ball_query(
        s, x, smask, mask, radius=radius, nsample=K), (sub, xyz))
    run("nearest_query", lambda x, s: masked_nearest_query(
        x, s, mask, smask), (xyz, sub))
    run("grid_subsample", lambda x, m: masked_grid_subsampling(
        x, m, npoint=N // 4, sample_dl=2 * dl), (xyz, mask))
    def pyramid_all(x, m):
        # reduce over EVERY neighborhood product so XLA cannot DCE any
        # level (summing only levels[0].xyz lets the whole build fold away)
        pyr = build_pyramid(x, m, radius=radius, sample_dl=dl,
                            nsamples=nsamples, npoints=npoints)
        tot = jnp.float32(0.0)
        for leaf in jax.tree_util.tree_leaves(pyr):
            if hasattr(leaf, "astype"):  # skip static floats (radius)
                tot = tot + jnp.sum(leaf.astype(jnp.float32))
        return tot

    run("pyramid_full", pyramid_all, (xyz, mask))

    # decomposition of the ball query: distance tile vs top_k
    def dist_only(x, m):
        d2 = jnp.sum((x[:, :, None, :] - x[:, None, :, :]) ** 2, -1)
        return jnp.min(d2, axis=-1)

    def topk_only(x, m):
        d2 = jnp.sum((x[:, :, None, :] - x[:, None, :, :]) ** 2, -1)
        neg, idx = jax.lax.top_k(-d2, K)
        return neg

    def topk_mxu_dist(x, m):
        qq = jnp.sum(x * x, -1)
        cross = jnp.einsum("bmc,bnc->bmn", x, x)
        d2 = qq[:, :, None] - 2 * cross + qq[:, None, :]
        neg, idx = jax.lax.top_k(-d2, K)
        return neg

    def argsort_n(x, m):
        d2 = jnp.sum((x - x[:, :1]) ** 2, -1)
        return jnp.argsort(d2, axis=-1)

    if not args.large:
        run("dist_matrix_only", dist_only, (xyz, mask))
        run("dist+topk", topk_only, (xyz, mask))
        run("dist_mxu+topk", topk_mxu_dist, (xyz, mask))
        run("argsort_N", argsort_n, (xyz, mask))
    else:
        # chunked variants at 15k: vary the tile budget
        for budget in (1 << 22, 1 << 24, 1 << 26):
            run(f"ball_query_budget_{budget:#x}",
                lambda x, m, b=budget: masked_ordered_ball_query(
                    x, x, m, m, radius=radius, nsample=K,
                    chunk_size=max(1, min(N, (b // N) // 128 * 128))),
                (xyz, mask))


if __name__ == "__main__":
    main()
