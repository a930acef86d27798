"""Spatial (sequence/context) parallelism: one giant cloud sharded over its
POINT axis across the device mesh.

The reference never holds more than ``num_points`` (500-15000) points on a
device at once — full 140k-point clouds go through the overlapping-patch
voting pipeline (/root/reference/u_net_arch/qualitative_inference_test.py:
282-344), i.e. its "long sequences" are handled by decomposition, never by
sharding.  TPU-native stretch (SURVEY.md §5): treat the point axis like a
sequence axis and shard it over the mesh, so ONE U-Net forward denoises an
entire cloud with memory and compute split across chips.

Design — the annotate-and-let-XLA-partition recipe rather than hand-written
halo exchange:

* inputs ``points/mask/features`` enter jit sharded ``P(None, 'data')`` on
  axis 1 (the point axis);
* a ``pyramid_hook`` pins a ``with_sharding_constraint`` on every per-point
  axis of the geometry pyramid (each level's xyz/mask, every neighborhood's
  query axis, the decoder's upsample indices), so the whole network —
  neighbor queries, KPConv aggregation, 1x1 convs, decoder — computes on
  local query shards;
* neighbor gathers index into the *full* support set, so GSPMD inserts the
  all-gathers of support positions/features over ICI exactly where the
  reference's CUDA kernels read global GPU memory.  Per level that is one
  ``(N_i, C)`` all-gather — at 140k points x 72 channels x f32 ~ 40 MB,
  well under ICI budgets — while the O(N*K*C*P) aggregation FLOPs and the
  O(N * N_i) distance tiles stay sharded.

The aggregation has two spatial modes (``build_spatial_model(pallas=...)``):

* ``False`` — pure-XLA aggregation, partitionable by GSPMD (the oracle);
* ``"shard_map"`` — the fused Pallas KPConv kernel per device via
  :func:`kpconv_aggregate_sharded`: a ``pallas_call`` is an opaque unit to
  GSPMD, so the wrapper makes the collective explicit — all-gather the
  support features over the point axis inside ``shard_map`` (exactly the
  collective GSPMD inserts around the XLA gather) and run the kernel on the
  local query shard.  Numerics are identical either way.

Sharded and unsharded forwards are bit-comparable because every op is a
static-shape gather/matmul — ``tests/test_spatial.py`` pins equality on an
8-device CPU mesh.
"""
from __future__ import annotations

import copy
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.pyramid import Level, Neighborhood, Pyramid, Transition
from .mesh import DATA_AXIS


def _c(x: jnp.ndarray, mesh: Mesh, spec: P) -> jnp.ndarray:
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def point_sharded_pyramid(mesh: Mesh, axis: str = DATA_AXIS,
                          batch_axis: Optional[str] = None
                          ) -> Callable[[Pyramid], Pyramid]:
    """A ``pyramid_hook`` that shards every per-point axis over ``axis``.

    Every array in the pyramid has the point (query) axis at position 1:
    level xyz ``(B, N_i, 3)`` / mask ``(B, N_i)``, neighborhood idx/mask
    ``(B, M, K)`` and rel_xyz ``(B, M, K, 3)``, upsample idx/mask
    ``(B, N_fine)``.

    ``batch_axis`` additionally shards the leading batch dimension — the
    2-D ``(data, points)`` mesh of :func:`..mesh.make_mesh_2d`, combining
    data parallelism over clouds with spatial parallelism within each.
    """
    ba = batch_axis

    def nbr_hook(nb: Optional[Neighborhood]) -> Optional[Neighborhood]:
        if nb is None:
            return None
        return Neighborhood(
            idx=_c(nb.idx, mesh, P(ba, axis, None)),
            mask=_c(nb.mask, mesh, P(ba, axis, None)),
            rel_xyz=_c(nb.rel_xyz, mesh, P(ba, axis, None, None)),
            radius=nb.radius)

    def hook(pyr: Pyramid) -> Pyramid:
        levels = tuple(
            Level(xyz=_c(lv.xyz, mesh, P(ba, axis, None)),
                  mask=_c(lv.mask, mesh, P(ba, axis)),
                  self_nbr=nbr_hook(lv.self_nbr))
            for lv in pyr.levels)
        transitions = tuple(
            Transition(pool_nbr=nbr_hook(tr.pool_nbr),
                       up_idx=_c(tr.up_idx, mesh, P(ba, axis)),
                       up_mask=_c(tr.up_mask, mesh, P(ba, axis)))
            for tr in pyr.transitions)
        return Pyramid(levels=levels, transitions=transitions)

    return hook


def kpconv_aggregate_sharded(mesh: Mesh, axis: str, features, idx, rel,
                             mask, kpoints, kernel_weights, extent: float,
                             influence: str = "linear",
                             interpret: bool = False,
                             batch_axis: Optional[str] = None):
    """Fused Pallas KPConv over a point-sharded cloud via shard_map.

    ``pallas_call`` is opaque to GSPMD, so the collective structure the
    partitioner would derive for the XLA path is written out explicitly:
    all-gather the (B, N_shard, C) support features over the point axis
    (one (N, C) all-gather per level — the same transfer GSPMD inserts for
    the neighbor gather), then run the fused kernel on the device-local
    (B, M/n, K) query shard against the full support set.  idx values are
    global support indices, so no index remapping is needed.

    Differentiable: shard_map transposes the tiled all-gather into a
    reduce-scatter of the kernel's d_features, and ``kpconv_aggregate``
    carries its own Pallas backward.
    """
    from ..ops.pallas_kpconv import kpconv_aggregate

    def local(feats, idx_, rel_, msk, kp, kw):
        full = jax.lax.all_gather(feats, axis, axis=1, tiled=True)
        return kpconv_aggregate(full, idx_, rel_, msk, kp, kw, extent,
                                influence, interpret)

    ba = batch_axis
    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(ba, axis, None), P(ba, axis, None),
                  P(ba, axis, None, None), P(ba, axis, None),
                  P(), P()),
        out_specs=P(ba, axis, None),
        # pallas_call emits ShapeDtypeStructs without vma annotations, so
        # the varying-across-mesh check cannot see through it
        check_vma=False,
    )(features, idx, rel, mask, kpoints, kernel_weights)


def build_spatial_model(cfg, mesh: Mesh, kind: str = "offset_regression",
                        pallas: object = "auto", axis: str = DATA_AXIS,
                        batch_axis: Optional[str] = None):
    """Build a task model whose geometry pyramid carries point-axis sharding
    constraints.  Parameters are identical to the unhooked model — a
    checkpoint trained patch-wise loads directly into the spatial forward.

    kind: 'offset_regression' | 'complete_denoising' | 'scene_segmentation'.
    pallas: False -> pure-XLA GSPMD aggregation (the oracle);
            "shard_map" -> fused Pallas kernel per device
            (:func:`kpconv_aggregate_sharded`);
            "auto" -> shard_map on TPU, XLA on CPU.
    axis / batch_axis: mesh axis names for the point and (optional) batch
    dimension — pass ``POINTS_AXIS`` / ``DATA_AXIS`` with a
    :func:`..mesh.make_mesh_2d` mesh for combined DP x SP.
    """
    from ..models.build import (
        CompleteDenoisingModel,
        OffsetRegressionModel,
        SceneSegmentationModel,
    )
    cls = {
        "offset_regression": OffsetRegressionModel,
        "complete_denoising": CompleteDenoisingModel,
        "scene_segmentation": SceneSegmentationModel,
    }[kind]
    cfg = copy.deepcopy(cfg)
    if pallas == "auto":
        pallas = "shard_map" if jax.default_backend() == "tpu" else False
    if pallas == "shard_map":
        cfg.use_pallas = "shard_map"
        cfg.spatial_mesh = mesh  # set AFTER the deepcopy (meshes are not
        cfg.spatial_axis = axis  # deep-copyable config material)
        cfg.spatial_batch_axis = batch_axis
    else:
        cfg.use_pallas = False  # GSPMD-partitionable XLA path
    return cls(cfg=cfg,
               pyramid_hook=point_sharded_pyramid(mesh, axis, batch_axis))


def build_spatial_forward(cfg, mesh: Mesh, kind: str = "offset_regression",
                          axis: str = DATA_AXIS,
                          batch_axis: Optional[str] = None):
    """(model, jitted_forward): full-cloud inference with the point axis
    sharded over the mesh.

    ``jitted_forward(variables, points, mask, features) -> (B, N, out)``;
    inputs may live on host — they are placed with the point axis sharded.
    The output stays point-sharded so a caller can chain further sharded
    stages (e.g. the voting accumulator) before any host transfer.
    With a 2-D ``(data, points)`` mesh, pass ``axis=POINTS_AXIS,
    batch_axis=DATA_AXIS`` to also shard the cloud batch.
    """
    model = build_spatial_model(cfg, mesh, kind, axis=axis,
                                batch_axis=batch_axis)
    pts_sh = NamedSharding(mesh, P(batch_axis, axis, None))
    msk_sh = NamedSharding(mesh, P(batch_axis, axis))

    @jax.jit
    def _fwd(variables, points, mask, features):
        return model.apply(variables, points, mask, features, train=False)

    def forward(variables, points, mask, features):
        points = jax.device_put(jnp.asarray(points), pts_sh)
        mask = jax.device_put(jnp.asarray(mask), msk_sh)
        features = jax.device_put(jnp.asarray(features), pts_sh)
        return _fwd(variables, points, mask, features)

    return model, forward
