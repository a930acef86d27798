#!/usr/bin/env python
"""Compile-time HBM analysis of the jitted train step (no device run).

AOT-lowers and compiles the Trainer's train step from ShapeDtypeStructs
(``jax.jit(...).lower(...).compile().memory_analysis()``) and reports the
compiler's peak/temp/argument byte counts per variant — the tool for
sizing cfg.remat / cfg.compute_dtype / batch_size at the big 15000-point
chamfer geometries (cfgs/chamfer_*.yaml) without paying a training run.
The reference has no analogue (its OOM discovery loop is "run and crash").

Usage:
  python scripts/memory_analysis.py --config_file cfgs/chamfer_5e3.yaml \
      --batch_sizes 4,8 --remat 0,1 [--compute_dtype bfloat16]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser("train-step memory analysis")
    p.add_argument("--config_file", type=str, required=True)
    p.add_argument("--batch_sizes", type=str, default="")
    p.add_argument("--remat", type=str, default="0,1")
    p.add_argument("--compute_dtype", type=str, default=None,
                   help="override cfg.compute_dtype for every variant")
    p.add_argument("--num_points", type=int, default=None)
    p.add_argument("--platform", type=str, default=None)
    return p.parse_args()


def analyze(cfg) -> dict:
    """Lower + compile the train step abstractly; return the byte counts."""
    from deep3dpointclouddenoising_tpu.models import build_offset_regression
    from deep3dpointclouddenoising_tpu.train import Trainer
    from deep3dpointclouddenoising_tpu.train.trainer import TrainState

    model, loss_fn = build_offset_regression(cfg)
    trainer = Trainer(cfg, model, loss_fn, n_iter_per_epoch=100)

    B, N = int(cfg.batch_size), int(cfg.num_points)
    f32 = jnp.float32
    batch = {"points": jax.ShapeDtypeStruct((B, N, 3), f32),
             "mask": jax.ShapeDtypeStruct((B, N), f32),
             "features": jax.ShapeDtypeStruct(
                 (B, N, int(cfg.input_features_dim)), f32),
             "offsets": jax.ShapeDtypeStruct((B, N, 3), f32)}
    rng = jax.random.PRNGKey(0)
    variables = jax.eval_shape(
        lambda r, p, mk, f: model.init(
            {"params": r, "dropout": jax.random.fold_in(r, 1)},
            p, mk, f, train=False),
        rng, batch["points"], batch["mask"], batch["features"])
    params = variables["params"]
    opt_state = jax.eval_shape(trainer.tx.init, params)
    state = TrainState(step=jax.ShapeDtypeStruct((), jnp.int32),
                       params=params,
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=opt_state)

    compiled = trainer._jit_train.lower(state, batch, rng).compile()
    ma = compiled.memory_analysis()
    out = {"batch_size": B, "num_points": N,
           "remat": int(cfg.remat), "compute_dtype": str(cfg.compute_dtype)}
    if ma is None:
        out["note"] = "backend reports no memory analysis"
        return out
    for k in ("temp_size_in_bytes", "argument_size_in_bytes",
              "output_size_in_bytes", "alias_size_in_bytes",
              "generated_code_size_in_bytes"):
        v = getattr(ma, k, None)
        if v is not None:
            out[k] = int(v)
    # peak live = everything the step holds at once minus donated aliasing
    if "temp_size_in_bytes" in out and "argument_size_in_bytes" in out:
        out["peak_hbm_bytes"] = (out["temp_size_in_bytes"]
                                 + out["argument_size_in_bytes"]
                                 + out.get("output_size_in_bytes", 0)
                                 - out.get("alias_size_in_bytes", 0))
    return out


def main():
    args = parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from deep3dpointclouddenoising_tpu.config import load_config
    from deep3dpointclouddenoising_tpu.utils.compile_cache import \
        enable_persistent_cache
    enable_persistent_cache()

    batch_sizes = [int(b) for b in args.batch_sizes.split(",") if b] or [None]
    remats = [int(r) for r in args.remat.split(",") if r != ""]
    for bs in batch_sizes:
        for rm in remats:
            cfg = load_config(args.config_file)
            if bs is not None:
                cfg.batch_size = bs
            if args.num_points is not None:
                cfg.num_points = int(args.num_points)
                from deep3dpointclouddenoising_tpu.config import \
                    derive_geometry
                derive_geometry(cfg)
            cfg.remat = rm
            if args.compute_dtype:
                cfg.compute_dtype = args.compute_dtype
            try:
                print(json.dumps(analyze(cfg)), flush=True)
            except Exception as e:  # OOM-at-compile is itself a data point
                print(json.dumps({
                    "batch_size": int(cfg.batch_size), "remat": rm,
                    "error": f"{type(e).__name__}: {str(e)[:200]}"}),
                    flush=True)


if __name__ == "__main__":
    main()
