"""Parallelism utilities (re-exported from core.mesh).

The reference's distributed layer (NCCL DDP helpers, DistributedEvalSampler —
kn_util/distributed/) is never exercised; its TPU-native replacement is the
mesh + NamedSharding machinery in :mod:`segmminterest_tpu.core.mesh`, used by
the engine for batch sharding and (implicitly, via XLA) gradient psum.
"""

from ..core.mesh import make_mesh, batch_sharding, replicated_sharding, shard_batch

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding", "shard_batch"]
