#!/usr/bin/env python
"""Generate a synthetic shape tree for end-to-end quality runs.

No shape dataset ships with this repo (the reference trains on the
PointCleanNet shapes); this builds a {train,val,test,qualitative_test}/*.off
tree of procedural meshes (spheres, ellipsoids, tori, boxes, cylinders at
varied proportions) so training -> voting inference -> CD-ratio tables can
run end-to-end (BASELINE.md protocol) without external data.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deep3dpointclouddenoising_tpu.data.meshio import save_off
from deep3dpointclouddenoising_tpu.data.synthetic import (
    make_box, make_cylinder, make_ellipsoid, make_icosphere, make_torus)


def shapes_for(split: str):
    if split == "train":
        return {
            "sphere": make_icosphere(3),
            "ellipsoid_a": make_ellipsoid(3, (1.0, 0.7, 0.45)),
            "ellipsoid_b": make_ellipsoid(3, (1.0, 0.9, 0.3)),
            "torus_fat": make_torus(1.0, 0.45),
            "torus_thin": make_torus(1.0, 0.2),
            "box": make_box(10, (1.0, 0.8, 0.6)),
            "box_flat": make_box(10, (1.0, 1.0, 0.25)),
            "cylinder": make_cylinder(48, 16, 0.5, 2.0),
        }
    if split == "val":
        return {
            "ellipsoid_v": make_ellipsoid(3, (1.0, 0.8, 0.55)),
            "torus_v": make_torus(1.0, 0.3),
            "cylinder_v": make_cylinder(40, 12, 0.65, 1.6),
        }
    # held-out geometries for test/qualitative_test
    return {
        "ellipsoid_t": make_ellipsoid(3, (1.0, 0.6, 0.6)),
        "torus_t": make_torus(1.0, 0.38),
        "box_t": make_box(10, (0.9, 0.7, 0.7)),
        "cylinder_t": make_cylinder(56, 20, 0.4, 2.2),
    }


def main():
    p = argparse.ArgumentParser("Synthetic shape tree")
    p.add_argument("--out", type=str, required=True)
    args = p.parse_args()
    for split in ("train", "val", "test", "qualitative_test"):
        d = os.path.join(args.out, split)
        os.makedirs(d, exist_ok=True)
        for name, mesh in shapes_for(split).items():
            save_off(os.path.join(d, f"{name}.off"), mesh)
            print(f"{split}/{name}.off  ({len(mesh.vertices)} verts)")


if __name__ == "__main__":
    main()
