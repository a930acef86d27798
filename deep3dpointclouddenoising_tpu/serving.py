"""AOT model export for serving (``jax.export`` / StableHLO artifacts).

Beyond-reference capability: the reference has no serving story — deploying
it means shipping the full training container and its CUDA extension build
(/root/reference/u_net_arch/qualitative_inference_test.py re-instantiates
the training stack, DDP included, just to run a forward).  A production
deployment wants a **sealed artifact**: the denoiser forward AOT-lowered to
StableHLO with the checkpoint weights baked in as constants, loadable by
any process with a compatible jax (no framework code, no checkpoint tree,
no config file) and compiled once by XLA at load time on the serving
platform.

Design notes (TPU serving):
- Shapes are fixed per artifact.  That is not a limitation on TPU — serving
  at a pinned (batch, points) shape is how XLA executables are deployed;
  export one artifact per served shape class (the patch pipeline already
  quantizes every cloud to fixed-size patches).
- Weights are BAKED IN, deliberately the opposite of the in-framework
  predictors (infer.make_predict_fn passes weights as arguments to keep the
  compile cache weight-independent during development).  An artifact is
  compiled once per deployment, so cache-key hygiene is irrelevant and a
  single self-contained file wins.
- The forward is exported exactly as inference runs it: eval-mode batch
  stats, cfg.norm input/output rescaling folded in (so norm-trained
  checkpoints serve at the right scale), full-cleaning outputs left raw for
  the downstream tanh/sigmoid split (infer.clean_clouds semantics).
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax import export as jax_export

FORMAT_VERSION = 1
_META_SUFFIX = ".json"


def make_serving_forward(model, variables, norm_factor: Optional[float] = None,
                         scale_outputs: bool = True):
    """The sealed forward: ``(points, mask, features) -> (B, N, out)``.

    Mirrors infer.make_predict_fn's fwd but closes over the weights —
    see the module docstring for why baking them in is right here.
    """
    variables = jax.tree.map(jnp.asarray, variables)

    def fwd(points, mask, features):
        if norm_factor:
            points = points / norm_factor
            features = features / norm_factor
        out = model.apply(variables, points, mask, features, train=False)
        if norm_factor and scale_outputs:
            # offsets live in the first 3 channels; a 4th full-cleaning
            # channel is an outlierness logit and must not be scaled
            out = out.at[..., :3].multiply(norm_factor)
        return out

    return fwd


def export_denoiser(model, variables, example: Dict[str, Any],
                    norm_factor: Optional[float] = None,
                    scale_outputs: bool = True,
                    platforms: Optional[Sequence[str]] = None,
                    ) -> jax_export.Exported:
    """Export the denoiser forward as a ``jax.export.Exported``.

    Args:
      example: a batch dict with ``points (B,N,3) / mask (B,N) /
        features (B,N,F)`` — only shapes/dtypes are read.
      platforms: lowering platforms (e.g. ``("tpu",)``, ``("cpu", "tpu")``);
        default = the current backend.
    """
    fwd = make_serving_forward(model, variables, norm_factor=norm_factor,
                               scale_outputs=scale_outputs)
    spec = lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype)
    return jax_export.export(jax.jit(fwd), platforms=platforms)(
        spec(example["points"]), spec(example["mask"]),
        spec(example["features"]))


def save_artifact(exported: jax_export.Exported, path: str,
                  meta: Optional[Dict[str, Any]] = None) -> None:
    """Write the serialized StableHLO artifact + a sidecar metadata json
    (shapes, platforms, format version) for deploy-time validation."""
    data = exported.serialize()
    with open(path, "wb") as f:
        f.write(data)
    info = {
        "format_version": FORMAT_VERSION,
        "fn_name": exported.fun_name,
        "platforms": list(exported.platforms),
        "in_avals": [str(a) for a in exported.in_avals],
        "out_avals": [str(a) for a in exported.out_avals],
        "nr_devices": exported.nr_devices,
        "bytes": len(data),
    }
    if meta:
        info.update(meta)
    with open(path + _META_SUFFIX, "w") as f:
        json.dump(info, f, indent=1)


def load_denoiser(path: str):
    """Load an artifact and return ``predict(points, mask, features)``.

    The returned callable is jittable and runs on whatever platform jax is
    configured for (must be one of the artifact's lowering platforms).
    Needs only this function and jax — no model code, config, or weights.
    """
    with open(path, "rb") as f:
        exported = jax_export.deserialize(bytearray(f.read()))
    call = jax.jit(exported.call)

    def predict(points, mask, features):
        return call(jnp.asarray(points), jnp.asarray(mask),
                    jnp.asarray(features))

    predict.exported = exported
    return predict


def artifact_meta(path: str) -> Dict[str, Any]:
    with open(path + _META_SUFFIX) as f:
        return json.load(f)
