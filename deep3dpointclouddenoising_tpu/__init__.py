"""TPU-native 3D point-cloud denoising framework.

A brand-new JAX / XLA / Pallas implementation of the capabilities of
``diego1401/Deep3DPointCloudDenoising``: a KPConv-style ("pseudo-grid")
multi-scale point-cloud U-Net that denoises 3D point clouds by regressing
per-point offsets and classifying outliers.

Design notes (TPU-first, not a port):
  * All ops run on fixed-size padded tensors with explicit {0,1} masks, which
    maps 1:1 onto XLA's static-shape compilation model.  The reference's CUDA
    neighbor kernels (masked_ordered_ball_query / masked_nearest_query /
    masked_grid_subsampling / group_points, see
    /root/reference/u_net_arch/pt_custom_ops/_ext_src/) become jit-compatible
    index builders in :mod:`.ops`.
  * Feature layout is channels-last ``(B, N, C)`` so the channel dimension
    lands on TPU lanes and 1x1 convolutions are plain MXU matmuls.
  * Neighborhood indices are built once per forward pass in a geometry
    pyramid (:mod:`.models.pyramid`) and shared by every residual block of a
    stage, instead of re-running the query kernels per layer like the
    reference does.
  * Data parallelism is a 1-D ``jax.sharding.Mesh`` with a batch-sharded
    jitted train step (see :mod:`.parallel`), replacing DDP/NCCL.
"""

__version__ = "0.1.0"
