#!/usr/bin/env python
"""Noise ratio + outlier ratio tables
(/root/reference/u_net_arch/measure_performance.py equivalent)."""
from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deep3dpointclouddenoising_tpu.data.meshio import read_ply
from deep3dpointclouddenoising_tpu.evaluate import performance_table


def main():
    p = argparse.ArgumentParser("Noise/outlier ratios")
    p.add_argument("--in_dir", type=str, required=True)
    p.add_argument("--which", type=str, default="denoised",
                   choices=["denoised", "noisy"])
    p.add_argument("--threshold", type=float, default=0.05)
    p.add_argument("--platform", type=str, default="cpu",
                   help="JAX platform (offline tables default to cpu so "
                        "they never wait on the TPU tunnel)")
    args = p.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    names, clean, clouds = [], [], []
    for f in sorted(glob.glob(os.path.join(args.in_dir, "clean", "*.ply"))):
        base = os.path.basename(f)
        names.append(base[:-4])
        clean.append(read_ply(f)["vertex"])
        clouds.append(read_ply(
            os.path.join(args.in_dir, args.which, base))["vertex"])

    table = performance_table(clean, clouds, args.threshold, names)
    lines = [f"{'shape':<40}{'noise_ratio':>15}{'outlier_ratio':>15}"]
    for name, row in table.items():
        lines.append(f"{name:<40}{row['noise_ratio']:>15.6g}"
                     f"{row['outlier_ratio']:>15.4f}")
    txt = "\n".join(lines)
    print(txt)
    with open(os.path.join(args.in_dir, "Performance.txt"), "w") as f:
        f.write(txt + "\n")


if __name__ == "__main__":
    main()
