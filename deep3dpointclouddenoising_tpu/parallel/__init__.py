"""Parallelism: device-mesh data parallelism (replaces the reference's
DDP/NCCL stack, /root/reference/u_net_arch/train_dist.py:375,502) and
spatial/sequence parallelism over the point axis of one giant cloud
(TPU-native stretch beyond the reference, SURVEY.md §5)."""
from .mesh import make_mesh, make_mesh_2d, shard_batch, replicate
from .multihost import (host_barrier, initialize_multihost, is_coordinator,
                        process_slice, replicate_tree, shard_batch_multihost)
from .spatial import build_spatial_forward, build_spatial_model
