#!/usr/bin/env python
"""Export a trained denoiser checkpoint as a sealed serving artifact.

AOT-lowers the inference forward (StableHLO via jax.export) with the
checkpoint weights baked in; the artifact is loadable by any process with a
compatible jax — no framework code, config, or checkpoint tree needed
(deep3dpointclouddenoising_tpu/serving.py).  The reference has no
equivalent: its inference re-instantiates the whole training stack
(/root/reference/u_net_arch/qualitative_inference_test.py:234-262).

    python scripts/export_model.py --config_file cfgs/l1.yaml \
        --checkpoint log/exp/current --out denoiser.stablehlo \
        --platforms cpu,tpu --check
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from deep3dpointclouddenoising_tpu.config import load_config
from deep3dpointclouddenoising_tpu.models import (
    build_complete_denoising, build_offset_regression)
from deep3dpointclouddenoising_tpu.serving import (
    artifact_meta, export_denoiser, load_denoiser, save_artifact)
from deep3dpointclouddenoising_tpu.utils.checkpoint import load_checkpoint


def main():
    p = argparse.ArgumentParser("Serving-artifact export")
    p.add_argument("--config_file", type=str, required=True)
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--out", type=str, required=True,
                   help="artifact path (+ .json metadata sidecar)")
    p.add_argument("--batch_size", type=int, default=None,
                   help="served batch size (default: cfg.batch_size)")
    p.add_argument("--platforms", type=str, default=None,
                   help="comma-separated lowering platforms, e.g. 'cpu,tpu' "
                        "(default: the current backend)")
    p.add_argument("--full_cleaning", action="store_true")
    p.add_argument("--platform", type=str, default=None,
                   help="JAX platform for the export process itself")
    p.add_argument("--check", action="store_true",
                   help="reload the artifact and verify it matches the "
                        "direct forward on random inputs")
    args = p.parse_args()

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    cfg = load_config(args.config_file)
    batch = args.batch_size or cfg.batch_size

    build = build_complete_denoising if args.full_cleaning \
        else build_offset_regression
    model, _ = build(cfg)
    state = load_checkpoint(args.checkpoint)
    variables = {"params": state["params"],
                 "batch_stats": state["batch_stats"]}
    norm_factor = float(cfg.in_radius) / 100.0 if cfg.norm else None

    rng = np.random.default_rng(0)
    example = {
        "points": rng.standard_normal(
            (batch, cfg.num_points, 3)).astype(np.float32) * cfg.in_radius,
        "mask": np.ones((batch, cfg.num_points), np.float32),
        "features": rng.standard_normal(
            (batch, cfg.num_points, cfg.input_features_dim)
        ).astype(np.float32) * cfg.in_radius,
    }
    platforms = args.platforms.split(",") if args.platforms else None
    exported = export_denoiser(model, variables, example,
                               norm_factor=norm_factor,
                               scale_outputs=not args.full_cleaning,
                               platforms=platforms)
    save_artifact(exported, args.out, meta={
        "config_file": os.path.basename(args.config_file),
        "checkpoint": args.checkpoint,
        "full_cleaning": bool(args.full_cleaning),
        "norm_factor": norm_factor,
    })
    print(json.dumps(artifact_meta(args.out), indent=1))

    if args.check:
        from deep3dpointclouddenoising_tpu.serving import make_serving_forward
        predict = load_denoiser(args.out)
        got = np.asarray(predict(example["points"], example["mask"],
                                 example["features"]))
        want = np.asarray(jax.jit(make_serving_forward(
            model, variables, norm_factor=norm_factor,
            scale_outputs=not args.full_cleaning))(
                example["points"], example["mask"], example["features"]))
        err = float(np.max(np.abs(got - want)))
        scale = float(np.max(np.abs(want))) or 1.0
        print(f"roundtrip max abs err {err:.3e} (output scale {scale:.3e})")
        assert err <= 1e-5 * max(scale, 1.0), "artifact mismatch"
        print("CHECK OK")


if __name__ == "__main__":
    main()
