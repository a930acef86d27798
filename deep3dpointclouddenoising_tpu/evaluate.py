"""Offline evaluation: Chamfer-ratio tables + noise/outlier ratios.

Re-implements the reference benchmark tooling on device:
  * :func:`chamfer_ratio_table` — per-shape CD(clean, denoised) /
    CD(clean, noisy) plus absolute CDs
    (/root/reference/u_net_arch/compute_cd.py:20-169);
  * :func:`performance_table` — noise ratio (mean NN distance to the clean
    cloud) and outlier ratio (fraction with NN distance > 0.05)
    (/root/reference/u_net_arch/measure_performance.py:48-80).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np
import jax.numpy as jnp

from .losses.chamfer import chamfer_distance, nearest_distances


def _cd(a: np.ndarray, b: np.ndarray, chunk: int = 4096) -> float:
    val = chamfer_distance(jnp.asarray(a[None]), jnp.asarray(b[None]),
                           batch_reduction="mean", chunk=chunk)
    return float(val)


def chamfer_ratio_table(clean: Sequence[np.ndarray],
                        noisy: Sequence[np.ndarray],
                        denoised: Sequence[np.ndarray],
                        names: Optional[Sequence[str]] = None
                        ) -> Dict[str, Dict[str, float]]:
    """Per-shape CD ratios; 'mean' aggregates like the reference table
    (compute_cd.py:120-169).  Ratio < 1 means the model improved the cloud."""
    names = list(names) if names is not None else [
        f"shape_{i}" for i in range(len(clean))]
    table: Dict[str, Dict[str, float]] = {}
    ratios, absolutes = [], []
    for name, c, n, d in zip(names, clean, noisy, denoised):
        cd_dn = _cd(c, d)
        cd_ns = _cd(c, n)
        ratio = cd_dn / max(cd_ns, 1e-12)
        table[name] = {"cd_denoised": cd_dn, "cd_noisy": cd_ns,
                       "ratio": ratio}
        ratios.append(ratio)
        absolutes.append(cd_dn)
    table["mean"] = {"cd_denoised": float(np.mean(absolutes)),
                     "cd_noisy": float(np.mean(
                         [t["cd_noisy"] for k, t in table.items()
                          if k != "mean"])),
                     "ratio": float(np.mean(ratios))}
    return table


def performance_table(clean: Sequence[np.ndarray],
                      clouds: Sequence[np.ndarray],
                      outlier_threshold: float = 0.05,
                      names: Optional[Sequence[str]] = None
                      ) -> Dict[str, Dict[str, float]]:
    """Noise ratio + outlier ratio per cloud vs its clean counterpart
    (measure_performance.py:48-80)."""
    names = list(names) if names is not None else [
        f"shape_{i}" for i in range(len(clean))]
    table: Dict[str, Dict[str, float]] = {}
    for name, c, x in zip(names, clean, clouds):
        d2 = np.asarray(nearest_distances(jnp.asarray(x[None]),
                                          jnp.asarray(c[None])))[0]
        d = np.sqrt(np.maximum(d2, 0.0))
        table[name] = {
            "noise_ratio": float(d.mean()),
            "outlier_ratio": float((d > outlier_threshold).mean()),
        }
    vals = [t for k, t in table.items()]
    table["mean"] = {
        "noise_ratio": float(np.mean([t["noise_ratio"] for t in vals])),
        "outlier_ratio": float(np.mean([t["outlier_ratio"] for t in vals])),
    }
    return table


def format_cd_table(table: Dict[str, Dict[str, float]]) -> str:
    lines = [f"{'shape':<40}{'CD(denoised)':>15}{'CD(noisy)':>15}"
             f"{'ratio':>10}"]
    for name, row in table.items():
        lines.append(f"{name:<40}{row['cd_denoised']:>15.6g}"
                     f"{row['cd_noisy']:>15.6g}{row['ratio']:>10.4f}")
    return "\n".join(lines)
