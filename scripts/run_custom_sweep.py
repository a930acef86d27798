#!/usr/bin/env python
"""Mini feature-ablation sweep over the custom_cfgs twins.

Reproduces the reference's EDF outlier-segmentation ablation matrix
(/root/reference/u_net_arch/custom_cfgs/: aggregation operator x
raw/intensity/katz-visibility input features) end-to-end on synthetic
EDF-schema scans, at a small compute budget: every config trains with
scripts/train_outlier_seg.py and is scored with the full-cloud voting
evaluation + confusion-metric suite (evaluate_outlier_seg.py protocol).

Synthetic scans mimic the EDF regime: diameter-10 ellipsoid shells (the
dataset's derive_geometry EDF branch assumes shape diameter 10 ->
in_radius 2.0) with 10% uniform box outliers; outlier INTENSITY is drawn
from a separated distribution so the intensity/katz feature axes carry
real signal for the ablation.

Usage:
  python scripts/run_custom_sweep.py --out_dir /tmp/sweep \
      [--configs cfgs/custom_cfgs/*.yaml] [--epochs 6] [--width 32] \
      [--num_points 512] [--num_steps 128]
"""
from __future__ import annotations

import argparse
import glob
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_scans(scan_dir: str, n_scans: int = 14, n: int = 24000,
               outlier_frac: float = 0.1, seed: int = 0) -> None:
    import numpy as np

    from deep3dpointclouddenoising_tpu.data.meshio import write_ply
    rng = np.random.default_rng(seed)
    os.makedirs(scan_dir, exist_ok=True)
    for i in range(n_scans):
        n_out = int(n * outlier_frac)
        axes = rng.uniform(3.5, 5.0, 3)  # diameter ~10 (EDF scale)
        u = rng.normal(size=(n - n_out, 3))
        u /= np.linalg.norm(u, axis=1, keepdims=True)
        surface = u * axes
        outliers = rng.uniform(-6.0, 6.0, size=(n_out, 3))
        pts = np.concatenate([surface, outliers]).astype(np.float32)
        gt = np.concatenate([np.zeros(n - n_out), np.full(n_out, 2.0)])
        normals = pts / np.maximum(
            np.linalg.norm(pts, axis=1, keepdims=True), 1e-9)
        # separated intensity distributions: inliers bright, outliers dim
        inten = np.concatenate([
            rng.normal(180.0, 30.0, n - n_out),
            rng.normal(80.0, 40.0, n_out)]).clip(0, 255).astype(np.float32)
        order = rng.permutation(n)
        write_ply(os.path.join(scan_dir, f"pointcloud_{i:02d}.ply"),
                  [pts[order], gt[order].astype(np.float32),
                   normals[order].astype(np.float32), inten[order]],
                  ["vertex", "GT", "normal", "intensity"])


METRIC_KEYS = ("macc", "miou", "prec", "rec", "fdrate", "forate", "f_b")


def parse_metrics(text: str) -> dict:
    """Pull the metric suite out of format_metric_table's columnar output:
    a header row of |-separated keys followed (after a ---- separator) by
    a row of |-separated values."""
    lines = text.splitlines()
    for i, ln in enumerate(lines):
        if "macc" in ln and "|" in ln:
            keys = [k.strip() for k in ln.split("|")]
            for vln in lines[i + 1:i + 4]:
                if re.search(r"\d+\.\d+", vln) and "|" in vln:
                    vals = [v.strip() for v in vln.split("|")]
                    if len(vals) == len(keys):
                        return {k: float(v) for k, v in zip(keys, vals)}
    return {}


def main():
    ap = argparse.ArgumentParser("custom_cfgs mini ablation")
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--configs", nargs="*", default=None)
    # Defaults = the budget the round-3 outlier-seg demo verified to get
    # OFF the all-inlier optimum (prec 100 / rec 52 after 8 x 256 steps,
    # RESULTS.md).  A 6-epoch x 128-step x width-24 sweep was measured to
    # leave EVERY config at the degenerate all-inlier solution (90% macc,
    # 0 recall at 10% outliers) — under-budget ablations of an imbalanced
    # segmentation task produce zeros, not rankings.
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--width", type=int, default=72)
    ap.add_argument("--num_points", type=int, default=512)
    ap.add_argument("--num_steps", type=int, default=256)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()

    cfgs = args.configs or sorted(
        glob.glob(os.path.join(REPO, "cfgs", "custom_cfgs", "*.yaml")))
    # the 12-config core matrix (pospool/pointwisemlp/adaptiveweight x
    # features) first, then the pseudogrid/Non-local extras
    core = [c for c in cfgs if not os.path.basename(c).startswith(
        ("pseudogrid", "Non-local"))]
    extras = [c for c in cfgs if c not in core]
    cfgs = core + extras

    os.makedirs(args.out_dir, exist_ok=True)
    scan_dir = os.path.join(args.out_dir, "scans")
    if not glob.glob(os.path.join(scan_dir, "*.ply")):
        print("generating synthetic EDF scans...", flush=True)
        make_scans(scan_dir)

    table_path = os.path.join(args.out_dir, "ablation_table.md")
    rows = []
    for cfg_path in cfgs:
        name = os.path.splitext(os.path.basename(cfg_path))[0]
        log_dir = os.path.join(args.out_dir, "log")
        t0 = time.time()
        common = ["--config_file", cfg_path, "--data_root", scan_dir,
                  "--platform", args.platform, "--log_dir", log_dir,
                  "--dataset_type", "EDFS",
                  "--width", str(args.width),
                  "--num_points", str(args.num_points),
                  "--batch_size", str(args.batch_size)]
        tr = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts",
                                          "train_outlier_seg.py"),
             *common, "--num_steps", str(args.num_steps),
             "--epochs", str(args.epochs)],
            capture_output=True, text=True, cwd=REPO, timeout=3600)
        if tr.returncode != 0:
            print(f"{name}: TRAIN FAILED\n{tr.stdout[-1500:]}"
                  f"{tr.stderr[-1500:]}", flush=True)
            rows.append((name, None))
            continue
        exp = None
        for ln in tr.stdout.splitlines():
            m = re.search(r"log_dir.*?(\S*custom_\S+)", ln)
            if m:
                exp = m.group(1)
        ckpt = os.path.join(log_dir, f"custom_{name}".replace("-", "_")
                            .replace(".", "_").rstrip("_"), "current")
        if not os.path.isdir(ckpt):
            cands = sorted(glob.glob(os.path.join(log_dir, "*", "current")),
                           key=os.path.getmtime)
            ckpt = cands[-1] if cands else ckpt
        ev = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts",
                                          "evaluate_outlier_seg.py"),
             *common, "--num_steps", str(args.num_steps),
             "--load_path", ckpt, "--split", "test"],
            capture_output=True, text=True, cwd=REPO, timeout=3600)
        met = parse_metrics(ev.stdout + ev.stderr)
        dt = time.time() - t0
        print(f"{name}: {met} ({dt:.0f}s)", flush=True)
        rows.append((name, met))

        # rewrite the table after every config (crash-safe progress)
        with open(table_path, "w") as f:
            f.write("| config | macc | mIoU | prec | recall | FDR | FOR |"
                    " F-beta |\n|---|---|---|---|---|---|---|---|\n")
            for nm, mm in rows:
                if mm is None:
                    f.write(f"| {nm} | FAILED |\n")
                else:
                    f.write(f"| {nm} | " + " | ".join(
                        f"{mm.get(k, float('nan')):.1f}"
                        for k in METRIC_KEYS) + " |\n")
    print(f"table: {table_path}", flush=True)


if __name__ == "__main__":
    main()
