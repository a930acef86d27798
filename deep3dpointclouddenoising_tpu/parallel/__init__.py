"""Device-mesh data parallelism (replaces the reference's DDP/NCCL stack,
/root/reference/u_net_arch/train_dist.py:375,502)."""
from .mesh import make_mesh, shard_batch, replicate
