"""Fused KPConv (pseudo-grid) aggregation as a Pallas TPU kernel.

The reference computes this op as a chain of CUDA kernels + torch bmm
(/root/reference/u_net_arch/models/local_aggregation_operators.py:452-510):
gather neighbors, build per-kernel-point influence weights from relative
positions, ``bmm`` neighbors against kernel points, then apply per-kernel-
point channel weights and sum.  Materialized intermediates per layer are
``sq (M,K,P)``, ``w (M,K,P)`` and ``per_kp (M,P,C)`` — at the 15k-point
configs that is hundreds of MB of HBM traffic.

TPU-first redesign: one Pallas kernel per (batch, query-tile) computes

    out[m, c] = sum_k  mask[m, k] * feat[idx[m, k], c] *
                (sum_p  influence(|rel[m,k] - kp[p]|) * kw[p, c])

with the influence weights, the ``(TM, P) @ (P, C)`` MXU contraction, and
the neighbor reduction kept in VMEM; only the gathered neighbor features
(produced by XLA's native gather, in neighbor-major ``(B, K, M, C)`` layout
so every in-kernel slice is a well-tiled 2-D ``(TM, C)`` block) and the
``(M, C)`` output move through HBM.

The public entry :func:`kpconv_aggregate` takes the *ungathered* support
features + neighbor indices and is a ``jax.custom_vjp``: forward is the
Pallas kernel, backward is the closed-form jnp gradient (gather/scatter-add
handled by XLA, mirroring the reference's group_points_grad atomicAdd
kernel, group_points_gpu.cu:42-80).  :func:`kpconv_aggregate_reference` is
the pure-jnp oracle used for tests.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INFLUENCES = ("linear", "gaussian", "constant")


def _influence_weights(sq: jnp.ndarray, extent: float,
                       influence: str) -> jnp.ndarray:
    """Kernel-point influence from squared distances
    (local_aggregation_operators.py:475-489)."""
    if influence == "constant":
        return jnp.ones_like(sq)
    if influence == "linear":
        # where-guarded sqrt: sq==0 at neighbor/kernel-point coincidences
        # and sqrt'(0)=inf would poison gradients flowing through the
        # geometry (GAN G-step differentiates D's pyramid w.r.t. the
        # generated points); forward value is unchanged
        d = jnp.where(sq > 0.0, jnp.sqrt(jnp.where(sq > 0.0, sq, 1.0)), 0.0)
        return jnp.maximum(1.0 - d / extent, 0.0)
    if influence == "gaussian":
        sigma = extent * 0.3
        return jnp.exp(-sq / (2.0 * sigma * sigma + 1e-9))
    raise ValueError(f"Unknown KP_influence {influence}")


# ---------------------------------------------------------------------------
# jnp oracle (takes pre-gathered neighbors)


def kpconv_aggregate_reference(grouped: jnp.ndarray, rel: jnp.ndarray,
                               mask: jnp.ndarray, kpoints: jnp.ndarray,
                               kernel_weights: jnp.ndarray, *,
                               extent: float, influence: str = "linear"
                               ) -> jnp.ndarray:
    """Pure-jnp KPConv aggregation.

    Args:
      grouped: (B, M, K, C) gathered neighbor features.
      rel: (B, M, K, 3) neighbor positions relative to the query.
      mask: (B, M, K) float {0,1} feature mask.
      kpoints: (P, 3) kernel point positions.
      kernel_weights: (P, C) per-kernel-point channel weights.
      extent: influence extent (static).
      influence: 'linear' | 'gaussian' | 'constant' (static).

    Returns:
      (B, M, C) aggregated features.
    """
    diff = rel[..., None, :] - kpoints[None, None, None, :, :]
    sq = jnp.sum(diff * diff, axis=-1)  # (B,M,K,P)
    w = _influence_weights(sq, extent, influence) * mask[..., None]
    per_kp = jnp.einsum("bmkp,bmkc->bmpc", w, grouped)
    return jnp.einsum("bmpc,pc->bmc", per_kp, kernel_weights)


# ---------------------------------------------------------------------------
# Pallas forward


_MASK_PENALTY = 1e9  # added to sq for masked slots -> influence weight 0


def _fwd_kernel(grouped_ref, aux_ref, kpa_ref, kk_ref, kw_ref, out_ref, *,
                extent: float, influence: str, kb: int):
    # grid (B, M_tiles, K_chunks); blocks:
    #   grouped (1, Kb, TM, C)   aux (1, Kb, 5, TM)
    #   kpa (P, 5)  kk (1, P)  kw (P, C)   out (1, TM, C)
    # aux rows: [rel_x, rel_y, rel_z, |rel|^2, (1-mask)*PENALTY]; with
    # kpa = [-2*kp, 1, 1] the contraction gives
    #   sq[m,p] = |rel|^2 - 2 rel.kp + |kp|^2 + mask_penalty
    # so the validity mask is baked into the distance (masked and K-padding
    # slots get a huge sq -> zero influence for linear/gaussian).
    # The K_chunks grid axis iterates fastest; the out block accumulates
    # across chunk steps (same (b, i) index map).
    del kb
    kpa = kpa_ref[:]                                # (P, 5)
    kk = kk_ref[:]                                  # (1, P)
    kw = kw_ref[:]                                  # (P, C)

    aux = aux_ref[0]                                # (Kb, 5, TM)
    g = grouped_ref[0].astype(jnp.float32)          # (Kb, TM, C)
    # sq (Kb, TM, P): one contraction for the whole neighbor chunk.
    # HIGHEST precision: the distance term feeds a sqrt near zero, where
    # the MXU's default bf16 passes cost ~1% relative error in the weights.
    sq = jax.lax.dot_general(
        aux, kpa, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST) + kk[None]
    w = _influence_weights(jnp.maximum(sq, 0.0), extent, influence)
    wc = jax.lax.dot_general(
        w, kw, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)         # (Kb, TM, C)
    acc = jnp.sum(wc * g, axis=0)                   # (TM, C)

    @pl.when(pl.program_id(2) == 0)
    def _init():
        out_ref[0] = acc.astype(out_ref.dtype)

    @pl.when(pl.program_id(2) != 0)
    def _accum():
        out_ref[0] = out_ref[0] + acc.astype(out_ref.dtype)


_ONEHOT_MAX_N = 2048  # gather-as-matmul path for small support sets


def _fwd_kernel_onehot(feat_ref, idx_ref, aux_ref, kpa_ref, kk_ref, kw_ref,
                       out_ref, *, extent: float, influence: str, kb: int):
    # Like _fwd_kernel, but the neighbor gather happens ON THE MXU: a
    # one-hot(idx) @ features matmul against the VMEM-resident support
    # features.  XLA's dynamic row gather measured ~19 GB/s effective on
    # v5e (6.2 ms for the flagship layer); the one-hot contraction is ~30
    # GFLOP and runs in a fraction of that.  Blocks:
    #   feat (1, N, C)  idx (1, Kb, TM, 1)  aux (1, Kb, 5, TM)
    #   kpa (P, 5)  kk (1, P)  kw (P, C)  out (1, TM, C)
    del kb
    feat = feat_ref[0]                              # (N, C)
    n = feat.shape[0]
    idx = idx_ref[0]                                # (Kb, TM, 1)
    kb_, tm = idx.shape[0], idx.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (kb_, tm, n), 2)
    onehot = (iota == idx).astype(feat.dtype)       # (Kb, TM, N)
    g = jax.lax.dot_general(
        onehot, feat, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)         # (Kb, TM, C)

    kpa = kpa_ref[:]
    kk = kk_ref[:]
    kw = kw_ref[:]
    aux = aux_ref[0]                                # (Kb, 5, TM)
    sq = jax.lax.dot_general(
        aux, kpa, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST) + kk[None]
    w = _influence_weights(jnp.maximum(sq, 0.0), extent, influence)
    wc = jax.lax.dot_general(
        w, kw, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)         # (Kb, TM, C)
    acc = jnp.sum(wc * g, axis=0)

    @pl.when(pl.program_id(2) == 0)
    def _init():
        out_ref[0] = acc.astype(out_ref.dtype)

    @pl.when(pl.program_id(2) != 0)
    def _accum():
        out_ref[0] = out_ref[0] + acc.astype(out_ref.dtype)


def _pick_tiles(M: int, K: int, C: int, itemsize: int,
                budget: int = 4 * 1024 * 1024,
                onehot_n: int = 0) -> Tuple[int, int]:
    """(query tile, neighbor chunk).  Mosaic requires the block's last dim to
    be a multiple of 128 or the full array dim, so the query tile is either
    all of M (small levels) or a multiple of 128; the neighbor chunk then
    shrinks until the double-buffered grouped block (or, on the one-hot
    gather path, the in-kernel (Kb, TM, N) one-hot intermediate) fits the
    VMEM budget.  Footprints use the lane/sublane-PADDED sizes (144 channels
    occupy 256 lanes)."""
    tm = M if M <= 128 else 128
    tm_pad = -(-tm // 8) * 8
    c_pad = -(-C // 128) * 128
    if onehot_n:
        n_pad = -(-onehot_n // 128) * 128
        per_k = tm_pad * (n_pad + 2 * c_pad) * itemsize
    else:
        per_k = tm_pad * c_pad * itemsize * 2  # x2: double buffering
    kb_max = max(1, min(K, budget // max(per_k, 1)))
    # balance chunks so k_pad == n_chunks * kb stays as close to K as
    # possible (kb_max=45 on K=52 would pad to 90 -> 73% wasted traffic)
    n_chunks = -(-K // kb_max)
    kb = -(-K // n_chunks)
    return tm, kb


def _fwd_pallas(features: jnp.ndarray, idx: jnp.ndarray, rel: jnp.ndarray,
                mask: jnp.ndarray, kpoints: jnp.ndarray,
                kernel_weights: jnp.ndarray, *, extent: float,
                influence: str, interpret: bool = False) -> jnp.ndarray:
    B, M, K = idx.shape
    N, C = features.shape[-2:]
    P = kpoints.shape[0]
    if influence == "constant":
        # w == mask: reduces to a masked neighbor sum scaled by sum_p kw —
        # no fused kernel needed (and the sq-penalty mask trick above does
        # not apply to a constant influence)
        grouped = jnp.take_along_axis(
            features, idx.reshape(B, M * K)[..., None], axis=1
        ).reshape(B, M, K, C)
        summed = jnp.sum(grouped * mask[..., None], axis=2)
        return summed * jnp.sum(kernel_weights, axis=0)[None, None, :]

    if M <= 128 and M % 32:
        # Mosaic folds the (Kb, TM) leading dims for the batched dots, which
        # requires TM to be a sublane-tile multiple (16 for bf16); pad the
        # query axis (mask=0 -> penalty row disables the padding) and slice
        # the output back.
        m_pad = -(-M // 32) * 32
        pq = ((0, 0), (0, m_pad - M))
        out = _fwd_pallas(
            features, jnp.pad(idx, pq + ((0, 0),)),
            jnp.pad(rel, pq + ((0, 0), (0, 0))), jnp.pad(mask, pq + ((0, 0),)),
            kpoints, kernel_weights, extent=extent, influence=influence,
            interpret=interpret)
        return out[:, :M]

    onehot_gather = N <= _ONEHOT_MAX_N
    tm, kb = _pick_tiles(M, K, C, features.dtype.itemsize,
                         onehot_n=N if onehot_gather else 0)
    k_pad = pl.cdiv(K, kb) * kb

    # neighbor-major index layout; padding chunk slots point at index 0 and
    # are disabled through the aux mask-penalty row.
    idx_t = jnp.transpose(idx, (0, 2, 1))               # (B, K, M)
    idx_t = jnp.pad(idx_t, ((0, 0), (0, k_pad - K), (0, 0)))
    if not onehot_gather:
        # XLA dynamic row gather: grouped_t[b,k,m,:] = feat[b, idx[b,m,k], :]
        grouped_t = jnp.take_along_axis(
            features, idx_t.reshape(B, k_pad * M)[..., None],
            axis=1).reshape(B, k_pad, M, C)
    # aux rows along the sublane dim, M on the lane dim (no 128-lane padding
    # waste on the geometry inputs)
    kpd = ((0, 0), (0, k_pad - K), (0, 0), (0, 0))
    rel_t = jnp.pad(jnp.transpose(rel, (0, 2, 3, 1)), kpd)  # (B, Kp, 3, M)
    rr = jnp.sum(rel * rel, axis=-1)                    # (B, M, K)
    rr_t = jnp.pad(jnp.transpose(rr, (0, 2, 1))[:, :, None, :], kpd)
    pen_t = jnp.pad(jnp.transpose((1.0 - mask) * _MASK_PENALTY,
                                  (0, 2, 1))[:, :, None, :], kpd,
                    constant_values=_MASK_PENALTY)      # (B, Kp, 1, M)
    aux = jnp.concatenate([rel_t, rr_t, pen_t], axis=2)  # (B, Kp, 5, M)
    kp_aug = jnp.concatenate(
        [-2.0 * kpoints, jnp.ones((P, 2), kpoints.dtype)], axis=1)  # (P, 5)
    kk = jnp.sum(kpoints * kpoints, axis=-1)[None, :]   # (1, P)

    grid = (B, pl.cdiv(M, tm), k_pad // kb)
    shared_specs = [
        pl.BlockSpec((1, kb, 5, tm), lambda b, i, k: (b, k, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((P, 5), lambda b, i, k: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, P), lambda b, i, k: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((P, C), lambda b, i, k: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((1, tm, C), lambda b, i, k: (b, i, 0),
                            memory_space=pltpu.VMEM)
    flops = 2 * B * M * K * (5 * P + P * C + C)
    if onehot_gather:
        kernel = functools.partial(_fwd_kernel_onehot, extent=extent,
                                   influence=influence, kb=kb)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, M, C), features.dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, N, C), lambda b, i, k: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, kb, tm, 1), lambda b, i, k: (b, k, i, 0),
                             memory_space=pltpu.VMEM),
            ] + shared_specs,
            out_specs=out_spec,
            cost_estimate=pl.CostEstimate(
                flops=flops + 2 * B * M * k_pad * N * C,
                bytes_accessed=B * N * C * features.dtype.itemsize
                + B * M * K * 4 * 5 + B * M * C * 4,
                transcendentals=B * M * K * P
                if influence == "gaussian" else 0),
            interpret=interpret,
        )(features, idx_t[..., None], aux, kp_aug, kk, kernel_weights)

    kernel = functools.partial(_fwd_kernel, extent=extent,
                               influence=influence, kb=kb)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, M, C), features.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, kb, tm, C), lambda b, i, k: (b, k, i, 0),
                         memory_space=pltpu.VMEM),
        ] + shared_specs,
        out_specs=out_spec,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=B * M * K * C * features.dtype.itemsize
            + B * M * K * 5 * 4 + B * M * C * 4,
            transcendentals=B * M * K * P if influence == "gaussian" else 0),
        interpret=interpret,
    )(grouped_t, aux, kp_aug, kk, kernel_weights)


# ---------------------------------------------------------------------------
# custom VJP


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def kpconv_aggregate(features, idx, rel, mask, kpoints, kernel_weights,
                     extent: float, influence: str = "linear",
                     interpret: bool = False):
    """Fused KPConv aggregation over ungathered support features.

    Args:
      features: (B, N, C) support features.
      idx: (B, M, K) int32 neighbor indices into the support set.
      rel: (B, M, K, 3) neighbor positions relative to the query.
      mask: (B, M, K) float {0,1} feature mask.
      kpoints: (P, 3); kernel_weights: (P, C).

    Differentiable in ``features`` and ``kernel_weights`` (the backward
    scatter-add mirrors the reference group_points_grad,
    group_points_gpu.cu:42-80); ``idx``/``rel``/``mask``/``kpoints`` are
    treated as constants.
    """
    return _fwd_pallas(features, idx, rel, mask, kpoints, kernel_weights,
                       extent=extent, influence=influence,
                       interpret=interpret)


def _vjp_fwd(features, idx, rel, mask, kpoints, kernel_weights, extent,
             influence, interpret):
    out = _fwd_pallas(features, idx, rel, mask, kpoints, kernel_weights,
                      extent=extent, influence=influence, interpret=interpret)
    return out, (features, idx, rel, mask, kpoints, kernel_weights)


def _bwd_kernel_onehot(feat_ref, idx_ref, idxr_ref, aux_ref, kpa_ref, kk_ref,
                       kkt_ref, kw_ref, gout_ref, dfeat_ref, dkw_ref, *,
                       extent: float, influence: str, m_total: int):
    # Backward twin of _fwd_kernel_onehot: the gather AND the scatter-add
    # both become one-hot contractions on the MXU.
    #   d_feat[n,c] = sum_{m,k} onehot[k,m,n] * wc[k,m,c] * gout[m,c]
    #   d_kw[p,c]   = sum_{m,k} w[k,m,p] * grouped[k,m,c] * gout[m,c]
    # Every matmul contracts the LANE axis of its lhs against the SUBLANE
    # axis of its rhs (normal orientation): the transposed one-hot and the
    # transposed weights are BUILT in transposed layout (idx in two layouts,
    # sq computed twice) instead of contracting over sublanes, which would
    # make Mosaic materialize operand transposes.
    feat = feat_ref[0]                              # (N, C)
    n = feat.shape[0]
    idx = idx_ref[0]                                # (Kb, TM, 1)
    idx_r = idxr_ref[0]                             # (Kb, 1, TM)
    kb_, tm = idx.shape[0], idx.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (kb_, tm, n), 2)
    onehot = (iota == idx).astype(feat.dtype)       # (Kb, TM, N)
    iota_t = jax.lax.broadcasted_iota(jnp.int32, (kb_, n, tm), 1)
    onehot_t = (iota_t == idx_r).astype(feat.dtype)  # (Kb, N, TM)

    kpa = kpa_ref[:]                                # (P, 5)
    kk = kk_ref[:]                                  # (1, P)
    kw = kw_ref[:]                                  # (P, C)
    aux = aux_ref[0]                                # (Kb, 5, TM)
    sq = jax.lax.dot_general(
        aux, kpa, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST) + kk[None]
    w = _influence_weights(jnp.maximum(sq, 0.0), extent, influence)
    wc = jax.lax.dot_general(
        w, kw, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)         # (Kb, TM, C)
    del w
    kkt = kkt_ref[:]                                # (P, 1)

    # zero out query rows past M (the last M-tile's grid padding reads
    # undefined memory — NaN in interpret mode; unlike the forward, the
    # backward ACCUMULATES, so garbage rows would pollute d_features).
    # Both sides of every product are sanitized: 0 * NaN = NaN.
    gout = gout_ref[0].astype(jnp.float32)          # (TM, C)
    row_ok = (jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0)
              + pl.program_id(1) * tm) < m_total
    row_ok_t = (jax.lax.broadcasted_iota(jnp.int32, (1, tm), 1)
                + pl.program_id(1) * tm) < m_total
    gout = jnp.where(row_ok, gout, 0.0)
    wc = jnp.where(row_ok[None], wc, 0.0)
    dwc = wc * gout[None]                           # (Kb, TM, C)
    grouped = jax.lax.dot_general(
        onehot, feat, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)         # (Kb, TM, C)
    gg = grouped * gout[None]

    # Mosaic has no multi-dim-contraction matmul, and dynamic_slice on
    # values is unsupported in kernels — reduce the neighbor axis with a
    # STATICALLY-unrolled loop of 2-D matmuls (kb_ is compile-time); the
    # transposed weights are recomputed per chunk in (P, TM) layout so no
    # matmul contracts over a sublane axis.
    p = kpa.shape[0]
    c = feat.shape[-1]
    dfeat = jnp.zeros((n, c), jnp.float32)
    dkw = jnp.zeros((p, c), jnp.float32)
    for k in range(kb_):
        dfeat = dfeat + jax.lax.dot_general(
            onehot_t[k], dwc[k], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)     # (N, C)
        sqt_k = jax.lax.dot_general(
            kpa, aux[k], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST) + kkt  # (P, TM)
        wt_k = _influence_weights(jnp.maximum(sqt_k, 0.0), extent, influence)
        wt_k = jnp.where(row_ok_t, wt_k, 0.0)
        dkw = dkw + jax.lax.dot_general(
            wt_k, gg[k], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)     # (P, C)

    first_chunk = (pl.program_id(1) == 0) & (pl.program_id(2) == 0)

    @pl.when(first_chunk)
    def _init_dfeat():
        dfeat_ref[0] = dfeat.astype(dfeat_ref.dtype)

    @pl.when(jnp.logical_not(first_chunk))
    def _acc_dfeat():
        dfeat_ref[0] = dfeat_ref[0] + dfeat.astype(dfeat_ref.dtype)

    first_all = first_chunk & (pl.program_id(0) == 0)

    @pl.when(first_all)
    def _init_dkw():
        dkw_ref[...] = dkw.astype(dkw_ref.dtype)

    @pl.when(jnp.logical_not(first_all))
    def _acc_dkw():
        dkw_ref[...] = dkw_ref[...] + dkw.astype(dkw_ref.dtype)


def _bwd_pallas_onehot(features, idx, rel, mask, kpoints, kernel_weights, g,
                       *, extent: float, influence: str, interpret: bool):
    B, M, K = idx.shape
    N, C = features.shape[-2:]
    P = kpoints.shape[0]
    if M <= 128 and M % 32:
        # see the forward's query-axis padding note
        m_pad = -(-M // 32) * 32
        pq = ((0, 0), (0, m_pad - M))
        return _bwd_pallas_onehot(
            features, jnp.pad(idx, pq + ((0, 0),)),
            jnp.pad(rel, pq + ((0, 0), (0, 0))), jnp.pad(mask, pq + ((0, 0),)),
            kpoints, kernel_weights, jnp.pad(g, pq + ((0, 0),)),
            extent=extent, influence=influence, interpret=interpret)
    tm, kb = _pick_tiles(M, K, C, features.dtype.itemsize, onehot_n=N)
    k_pad = pl.cdiv(K, kb) * kb

    idx_t = jnp.transpose(idx, (0, 2, 1))
    idx_t = jnp.pad(idx_t, ((0, 0), (0, k_pad - K), (0, 0)))
    kpd = ((0, 0), (0, k_pad - K), (0, 0), (0, 0))
    rel_t = jnp.pad(jnp.transpose(rel, (0, 2, 3, 1)), kpd)
    rr = jnp.sum(rel * rel, axis=-1)
    rr_t = jnp.pad(jnp.transpose(rr, (0, 2, 1))[:, :, None, :], kpd)
    pen_t = jnp.pad(jnp.transpose((1.0 - mask) * _MASK_PENALTY,
                                  (0, 2, 1))[:, :, None, :], kpd,
                    constant_values=_MASK_PENALTY)
    aux = jnp.concatenate([rel_t, rr_t, pen_t], axis=2)
    kp_aug = jnp.concatenate(
        [-2.0 * kpoints, jnp.ones((P, 2), kpoints.dtype)], axis=1)
    kk = jnp.sum(kpoints * kpoints, axis=-1)[None, :]

    grid = (B, pl.cdiv(M, tm), k_pad // kb)
    kernel = functools.partial(_bwd_kernel_onehot, extent=extent,
                               influence=influence, m_total=M)
    d_features, d_kw = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((B, N, C), features.dtype),
                   jax.ShapeDtypeStruct((P, C), jnp.float32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, N, C), lambda b, i, k: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kb, tm, 1), lambda b, i, k: (b, k, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kb, 1, tm), lambda b, i, k: (b, k, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kb, 5, tm), lambda b, i, k: (b, k, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, 5), lambda b, i, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P), lambda b, i, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, 1), lambda b, i, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, C), lambda b, i, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, C), lambda b, i, k: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, N, C), lambda b, i, k: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, C), lambda b, i, k: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(features, idx_t[..., None], idx_t[:, :, None, :], aux, kp_aug, kk,
      jnp.transpose(kk), kernel_weights, g)
    return d_features, d_kw


def _vjp_bwd(extent, influence, interpret, res, g):
    features, idx, rel, mask, kpoints, kernel_weights = res
    B, M, K = idx.shape
    N, C = features.shape[-2:]

    if influence != "constant" and N <= _ONEHOT_MAX_N:
        d_features, d_kw = _bwd_pallas_onehot(
            features, idx, rel, mask, kpoints, kernel_weights, g,
            extent=extent, influence=influence, interpret=interpret)
        zeros = (jnp.zeros_like(idx), jnp.zeros_like(rel),
                 jnp.zeros_like(mask), jnp.zeros_like(kpoints))
        return (d_features, *zeros, d_kw.astype(kernel_weights.dtype))

    diff = rel[..., None, :] - kpoints[None, None, None, :, :]
    sq = jnp.sum(diff * diff, axis=-1)
    w = _influence_weights(sq, extent, influence) * mask[..., None]
    # d grouped[b,m,k,c] = g[b,m,c] * sum_p w[b,m,k,p] kw[p,c]
    wc = jnp.einsum("bmkp,pc->bmkc", w, kernel_weights)
    d_grouped = wc * g[:, :, None, :]
    # accumulate back to support features (reference group_points_grad,
    # group_points_gpu.cu:42-80) — scatter-free sort + prefix-sum
    # reduction: XLA TPU scatters serialize per row, which put the
    # 15k-point chamfer configs on a ~seconds-per-step backward
    from .neighbors import segment_sums_sorted

    def one(idx_b, vals_b):
        sums, _ = segment_sums_sorted(
            idx_b, vals_b, jnp.ones(idx_b.shape[0], jnp.float32), N)
        return sums

    d_features = jax.vmap(one)(
        idx.reshape(B, M * K),
        d_grouped.reshape(B, M * K, C).astype(jnp.float32)
    ).astype(features.dtype)
    # d kw[p,c] = sum_{b,m,k} w * grouped * g
    grouped = jnp.take_along_axis(
        features, idx.reshape(B, M * K)[..., None], axis=1
    ).reshape(B, M, K, C)
    d_kw = jnp.einsum("bmkp,bmkc,bmc->pc", w,
                      grouped.astype(jnp.float32), g)
    zeros = (jnp.zeros_like(idx), jnp.zeros_like(rel), jnp.zeros_like(mask),
             jnp.zeros_like(kpoints))
    return (d_features, *zeros, d_kw.astype(kernel_weights.dtype))


kpconv_aggregate.defvjp(_vjp_fwd, _vjp_bwd)
