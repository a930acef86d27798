#!/usr/bin/env python
"""Chamfer-ratio tables from saved PLY trees
(/root/reference/u_net_arch/compute_cd.py equivalent).

Reads {noisy,denoised,clean}/ PLY trees written by scripts/infer.py and
writes CD_table.txt (ratios) + CD_table_absolute.txt (absolute CDs).
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deep3dpointclouddenoising_tpu.data.meshio import read_ply
from deep3dpointclouddenoising_tpu.evaluate import (
    chamfer_ratio_table, format_cd_table)


def main():
    p = argparse.ArgumentParser("Chamfer tables")
    p.add_argument("--in_dir", type=str, required=True,
                   help="directory holding noisy/ denoised/ clean/ trees")
    p.add_argument("--out_dir", type=str, default=None)
    p.add_argument("--platform", type=str, default="cpu",
                   help="JAX platform for the CD computation (offline "
                        "tables default to cpu so they never wait on the "
                        "TPU tunnel)")
    p.add_argument("--device", action="store_true",
                   help="compute NN distances with the batched on-device "
                        "matmul kernel (MXU brute force) instead of the "
                        "host KD-tree; combine with --platform '' to run "
                        "it on the TPU")
    args = p.parse_args()
    out_dir = args.out_dir or args.in_dir
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    if args.device:
        from deep3dpointclouddenoising_tpu.utils.compile_cache import \
            enable_persistent_cache
        enable_persistent_cache()

    names, clean, noisy, denoised = [], [], [], []
    for f in sorted(glob.glob(os.path.join(args.in_dir, "clean", "*.ply"))):
        base = os.path.basename(f)
        names.append(base[:-4])
        clean.append(read_ply(f)["vertex"])
        noisy.append(read_ply(
            os.path.join(args.in_dir, "noisy", base))["vertex"])
        denoised.append(read_ply(
            os.path.join(args.in_dir, "denoised", base))["vertex"])

    table = chamfer_ratio_table(clean, noisy, denoised, names,
                                device=args.device)
    txt = format_cd_table(table)
    print(txt)
    with open(os.path.join(out_dir, "CD_table.txt"), "w") as f:
        f.write(txt + "\n")
    with open(os.path.join(out_dir, "CD_table_absolute.txt"), "w") as f:
        for name, row in table.items():
            f.write(f"{name} {row['cd_denoised']:.8g}\n")


if __name__ == "__main__":
    main()
