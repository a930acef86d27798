#!/usr/bin/env python
"""Full-cloud voting evaluation of an outlier-segmentation checkpoint.

TPU-native equivalent of /root/reference/u_net_arch/evaluate_dist.py (the
spec-bearing but bit-rotted distributed voting eval): per-patch class
probabilities accumulated over the covering test patches, projected onto the
full clouds, metrics table + per-cloud PLYs.

Usage:
  python scripts/evaluate_outlier_seg.py --config_file cfgs/outlier_seg_edf.yaml \
      --data_root <scans> --load_path <ckpt> [--write_dir out/]
"""
from __future__ import annotations

from _common import base_parser, setup


def main():
    p = base_parser("Outlier segmentation voting eval")
    p.add_argument("--dataset_type", type=str, default=None)
    p.add_argument("--write_dir", type=str, default=None)
    p.add_argument("--split", type=str, default="test")
    args = p.parse_args()
    cfg, logger = setup(args)
    cfg.num_classes = 2
    dataset_type = args.dataset_type or str(cfg.datasets)

    import jax

    from deep3dpointclouddenoising_tpu.data.outlier_dataset import \
        OutlierSegmentationDataset
    from deep3dpointclouddenoising_tpu.evaluate import \
        evaluate_outlier_segmentation
    from deep3dpointclouddenoising_tpu.models import build_scene_segmentation
    from deep3dpointclouddenoising_tpu.train import Trainer
    from deep3dpointclouddenoising_tpu.utils.checkpoint import \
        load_checkpoint
    from deep3dpointclouddenoising_tpu.utils.metrics import \
        format_metric_table

    ds = OutlierSegmentationDataset(
        cfg.data_root, args.split, dataset_type=dataset_type,
        input_features=list(cfg.features), katz_params=list(cfg.katz_params),
        katz_type=cfg.katz_type,
        subsampling_parameter=float(cfg.sampleDl),
        in_radius=cfg.in_radius, num_points=cfg.num_points,
        num_steps=cfg.num_steps, debug=bool(cfg.DEBUG), seed=cfg.rng_seed)
    cfg.input_features_dim = ds.input_features_dim

    model, loss_fn = build_scene_segmentation(cfg)
    trainer = Trainer(cfg, model, loss_fn, n_iter_per_epoch=1,
                      loss_mode="segmentation")
    rng = jax.random.PRNGKey(cfg.rng_seed)
    example = ds.get(0)
    batch = {k: (v[None] if hasattr(v, "shape") else v)
             for k, v in example.items()}
    state = trainer.init_state(rng, batch)
    if cfg.load_path:
        state = load_checkpoint(cfg.load_path, state)
        logger.info(f"loaded {cfg.load_path} (step {int(state.step)})")
    else:
        logger.warning("no --load_path: evaluating a random init")

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    predict = jax.jit(lambda pts, m, f: model.apply(variables, pts, m, f,
                                                    train=False))

    metrics = evaluate_outlier_segmentation(
        predict, ds, batch_size=int(cfg.batch_size),
        write_dir=args.write_dir)
    logger.info("\n" + format_metric_table(metrics, name=args.split))


if __name__ == "__main__":
    main()
