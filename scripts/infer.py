#!/usr/bin/env python
"""Full-shape denoising inference (qualitative_inference_test.py equivalent).

Loads a checkpoint, covers each qualitative_test shape with overlapping
patches, vote-averages offsets, and writes noisy/denoised/clean PLY trees
(/root/reference/u_net_arch/qualitative_inference_test.py:513-588).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from deep3dpointclouddenoising_tpu.config import load_config
from deep3dpointclouddenoising_tpu.data.meshio import write_ply
from deep3dpointclouddenoising_tpu.data.offset_dataset import OffsetDataset
from deep3dpointclouddenoising_tpu.infer import (
    clean_clouds, denoise_clouds, denoise_clouds_device,
    denoise_clouds_spatial, make_predict_fn)
from deep3dpointclouddenoising_tpu.models import (
    build_complete_denoising, build_offset_regression)
from deep3dpointclouddenoising_tpu.utils.checkpoint import load_checkpoint
from deep3dpointclouddenoising_tpu.utils.compile_cache import \
    enable_persistent_cache

enable_persistent_cache()


def main():
    p = argparse.ArgumentParser("Qualitative full-shape inference")
    p.add_argument("--config_file", type=str, required=True)
    p.add_argument("--data_root", type=str, required=True)
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--out_dir", type=str, default="inference_out")
    p.add_argument("--full_cleaning", action="store_true")
    p.add_argument("--pcn", action="store_true",
                   help="PointCleanNet-baseline inference: one patch per "
                        "cloud point, the ResPCPNet predicts the center "
                        "offset only (qualitative_inference_test.py:353-403)")
    p.add_argument("--device_voting", action="store_true",
                   help="run the voting protocol on device: clouds "
                        "resident, host-precomputed patch indices, "
                        "forward + scatter-free vote reduction in one "
                        "jitted executable (incl. augmentation vote "
                        "rounds when --num_votes > 1); offset regression "
                        "and --full_cleaning heads")
    p.add_argument("--spatial", action="store_true",
                   help="denoise each full cloud in one forward with the "
                        "point axis sharded over the device mesh "
                        "(parallel.spatial) instead of patch voting")
    p.add_argument("--chunk_steps", type=int, default=16,
                   help="host-voting paths: stack this many eval batches "
                        "per device dispatch (one H2D + one scan executable "
                        "+ one D2H per chunk — the eval analogue of the "
                        "training loop's steps_per_dispatch); 0 restores "
                        "the per-batch dispatch")
    p.add_argument("--num_votes", type=int, default=1,
                   help="augmentation-based voting rounds: rounds past the "
                        "first rotate patches by a random z-angle, predict, "
                        "and rotate the offsets back before vote-averaging")
    p.add_argument("--checkpoint_low", type=str, default="auto",
                   help="low-noise-regime checkpoint (e.g. diverse_stable); "
                        "each cloud's noise sigma is estimated train-free "
                        "(evaluate.estimate_noise_sigma) and clouds below "
                        "--route_sigma are denoised with this checkpoint "
                        "instead of --checkpoint.  Default 'auto': look "
                        "for a sibling experiment dir of --checkpoint "
                        "whose name ends in '_stable' or '_stable_low' "
                        "(deployed two-regime routing — the single-"
                        "checkpoint default otherwise reproduces the "
                        "low-noise overshoot, RESULTS.md); 'none' "
                        "disables routing")
    p.add_argument("--route_sigma", type=float, default=0.002,
                   help="routing threshold (absolute sigma, bbox diag = 1) "
                        "for --checkpoint_low")
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--noise_level", type=float, default=None,
                   help="override the eval noise sigma (fraction of the "
                        "bbox diagonal) — the report evaluates every loss "
                        "at sigma=0.5%% AND 0.1%% (report.pdf section 5.2)")
    p.add_argument("--noise_type", type=str, default=None,
                   help="override the eval noise type (e.g. gaussian for "
                        "a diverse-trained checkpoint)")
    args = p.parse_args()

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    cfg = load_config(args.config_file)
    cfg.data_root = args.data_root
    if args.noise_level is not None:
        cfg.noise_level = args.noise_level
    if args.noise_type is not None:
        cfg.noise_type = args.noise_type

    dataset = OffsetDataset(
        cfg.data_root, "qualitative_test", in_radius=cfg.in_radius,
        num_points=cfg.num_points, num_steps=1, num_epochs=1,
        noise_type=cfg.noise_type, noise_level=cfg.noise_level,
        num_points_per_shape=cfg.num_points_per_shape,
        outlier_proportion=cfg.outlier_percentage,
        fourier_features=bool(cfg.fourier_features),
        architecture="PCN" if args.pcn else "U-Net",
        sample_dl_patches=cfg.sample_Dl_patches, seed=cfg.rng_seed)

    if args.pcn:
        return run_pcn(args, cfg, dataset)

    build = build_complete_denoising if args.full_cleaning \
        else build_offset_regression
    model, _ = build(cfg)
    sample = dataset.get(0)
    variables = model.init(
        jax.random.PRNGKey(0), sample["points"][None], sample["mask"][None],
        sample["features"][None], train=False)
    state = load_checkpoint(args.checkpoint)
    variables = {"params": state["params"],
                 "batch_stats": state["batch_stats"]}
    norm_factor = float(cfg.in_radius) / 100.0 if cfg.norm else None

    if args.checkpoint_low == "auto":
        args.checkpoint_low = _auto_low_checkpoint(args.checkpoint)
        if args.checkpoint_low:
            print(f"routing: auto-discovered low-noise checkpoint "
                  f"{args.checkpoint_low}")
    elif args.checkpoint_low in ("none", ""):
        args.checkpoint_low = None
    variables_lo = route_low = None
    if args.checkpoint_low:
        if args.spatial:
            p.error("--checkpoint_low routes the voting paths only")
        from deep3dpointclouddenoising_tpu.evaluate import \
            estimate_noise_sigma
        state_lo = load_checkpoint(args.checkpoint_low)
        variables_lo = {"params": state_lo["params"],
                        "batch_stats": state_lo["batch_stats"]}
        sigmas = [estimate_noise_sigma(s.points) for s in dataset.shapes]
        route_low = np.asarray([s < args.route_sigma for s in sigmas])
        for name, sg, lo in zip(dataset.cloud_names, sigmas, route_low):
            print(f"route {os.path.basename(name)}: est sigma {sg:.2e} -> "
                  f"{'LOW' if lo else 'HIGH'}-noise checkpoint")

    # full-cleaning applies tanh to the offset channels downstream, so the
    # un-normalization happens there (f*tanh(raw)); offset regression
    # rescales the raw outputs directly
    chunk_steps = max(int(args.chunk_steps), 0)
    if chunk_steps and not (args.device_voting or args.spatial):
        # production default: scan-batched dispatch — S batches per
        # executable, one D2H per chunk (checkpoint routing folds into
        # the same scan)
        from deep3dpointclouddenoising_tpu.infer import make_chunk_predict_fn
        predict = make_chunk_predict_fn(
            model, variables, norm_factor=norm_factor,
            scale_outputs=not args.full_cleaning,
            variables_lo=variables_lo, route_low=route_low)
    else:
        predict = make_predict_fn(model, variables, norm_factor=norm_factor,
                                  scale_outputs=not args.full_cleaning)
        if variables_lo is not None:
            from deep3dpointclouddenoising_tpu.infer import \
                make_routed_predict_fn
            predict_lo = make_predict_fn(
                model, variables_lo, norm_factor=norm_factor,
                scale_outputs=not args.full_cleaning)
            predict = make_routed_predict_fn(predict, predict_lo, route_low)

    if args.device_voting:
        if args.spatial:
            p.error("--device_voting and --spatial are exclusive")
        if args.full_cleaning:
            from deep3dpointclouddenoising_tpu.infer import \
                clean_clouds_device
            results = clean_clouds_device(model, variables, cfg, dataset,
                                          batch_size=cfg.batch_size,
                                          norm_factor=norm_factor,
                                          num_votes=args.num_votes)
            if route_low is not None and route_low.any():
                results_lo = clean_clouds_device(
                    model, variables_lo, cfg, dataset,
                    batch_size=cfg.batch_size, norm_factor=norm_factor,
                    num_votes=args.num_votes)
                results = [lo_r if lo else hi_r for hi_r, lo_r, lo
                           in zip(results, results_lo, route_low)]
            write_results(args, dataset, results)
            return
        results = denoise_clouds_device(model, variables, cfg, dataset,
                                        batch_size=cfg.batch_size,
                                        scale=norm_factor,
                                        num_votes=args.num_votes)
        if route_low is not None and route_low.any():
            # per-cloud routing on the device path: the jitted scan takes
            # the weights as an argument, so the low-noise pass reuses the
            # same executable; keep the low-checkpoint result for routed
            # clouds (host routing composes predict fns instead)
            results_lo = denoise_clouds_device(
                model, variables_lo, cfg, dataset,
                batch_size=cfg.batch_size, scale=norm_factor,
                num_votes=args.num_votes)
            results = [lo_r if lo else hi_r for hi_r, lo_r, lo
                       in zip(results, results_lo, route_low)]
    elif args.spatial:
        if args.full_cleaning:
            p.error("--spatial supports offset regression only")
        results = denoise_clouds_spatial(variables, cfg, dataset)
    else:
        if args.full_cleaning:
            results = clean_clouds(predict, dataset,
                                   batch_size=cfg.batch_size,
                                   norm_factor=norm_factor,
                                   num_votes=args.num_votes,
                                   chunk_steps=chunk_steps)
        else:
            results = denoise_clouds(predict, dataset,
                                     batch_size=cfg.batch_size,
                                     num_votes=args.num_votes,
                                     chunk_steps=chunk_steps)

    write_results(args, dataset, results)


def _auto_low_checkpoint(checkpoint: str):
    """Deployed default: discover a low-noise specialist next to the main
    checkpoint.

    ``log/<experiment>/current`` -> first of ``log/<experiment>_stable``,
    ``log/<experiment>_stable_low``, ``log/<experiment>stable_low`` (for
    ``*_diverse`` -> ``*_stable_low`` naming) that holds the same
    checkpoint leaf.  Returns None when no sibling exists (single-
    checkpoint behavior, as before)."""
    path = os.path.abspath(checkpoint)
    exp_dir, leaf = os.path.split(path)
    root, exp = os.path.split(exp_dir)
    if not exp:
        return None
    candidates = [exp + "_stable", exp + "_stable_low"]
    if exp.endswith("_diverse"):
        candidates.append(exp[: -len("_diverse")] + "_stable_low")
    for cand in candidates:
        p = os.path.join(root, cand, leaf)
        if os.path.isdir(p) or os.path.isfile(p):
            return p
    return None


def run_pcn(args, cfg, dataset):
    """ResPCPNet per-point denoising: jitted forward with the checkpoint
    weights as an argument (weight-independent executable), STN rotation
    applied on device (train/pcn.py PCNTrainer.predict)."""
    import jax.numpy as jnp

    from deep3dpointclouddenoising_tpu.infer import denoise_clouds_pcn
    from deep3dpointclouddenoising_tpu.models import \
        build_offset_regression_PCN

    model, _ = build_offset_regression_PCN(cfg)
    state = load_checkpoint(args.checkpoint)
    variables = {"params": state["params"],
                 "batch_stats": state["batch_stats"]}
    variables = jax.device_put(variables)
    if args.device_voting:
        from deep3dpointclouddenoising_tpu.infer import \
            denoise_clouds_pcn_device
        results = denoise_clouds_pcn_device(model, variables, cfg, dataset,
                                            batch_size=int(cfg.batch_size))
        write_results(args, dataset, results)
        return
    scale = float(cfg.in_radius) if cfg.loss != "L1" else 1.0

    @jax.jit
    def fwd(variables, points):
        pred, trans, _ = model.apply(variables, points, train=False)
        return jnp.einsum("bd,bed->be", pred, trans)

    batch = int(cfg.batch_size)

    def predict(points):
        # pad ragged final batches so every call hits one executable
        points = np.asarray(points, np.float32)
        b = len(points)
        if b < batch:
            pad = np.zeros((batch - b,) + points.shape[1:], np.float32)
            points = np.concatenate([points, pad])
        pts = points / scale if scale != 1.0 else points
        return np.asarray(fwd(variables, pts))[:b] * scale

    results = denoise_clouds_pcn(predict, dataset, batch_size=batch)
    write_results(args, dataset, results)


def write_results(args, dataset, results):
    for sub in ("noisy", "denoised", "clean"):
        os.makedirs(os.path.join(args.out_dir, sub), exist_ok=True)
    for name, res in zip(dataset.cloud_names, results):
        base = os.path.basename(name)
        shape = dataset.shapes[dataset.cloud_names.index(name)]
        write_ply(os.path.join(args.out_dir, "noisy", base + ".ply"),
                  [res["noisy"], res["labels"].astype(np.float32)],
                  ["vertex", "gt_outlier"])
        write_ply(os.path.join(args.out_dir, "denoised", base + ".ply"),
                  [res["denoised"]], ["vertex"])
        clean = shape.points + shape.offsets
        write_ply(os.path.join(args.out_dir, "clean", base + ".ply"),
                  [clean], ["vertex"])
        print(f"wrote {base}")


if __name__ == "__main__":
    main()
