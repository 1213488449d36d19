"""Parallelism: single-host mesh/sharding (core.mesh) + multi-host DCN init.

The reference's distributed layer (NCCL DDP helpers, DistributedEvalSampler —
kn_util/distributed/) is replaced by the mesh + NamedSharding machinery in
:mod:`segmminterest_tpu.core.mesh` (used by the engine for batch sharding and,
via XLA, gradient psum) and the ``jax.distributed`` multi-host path in
:mod:`.distributed` (the initialize_ddp_from_env analogue).
"""

from ..core.mesh import make_mesh, batch_sharding, replicated_sharding, shard_batch
from .distributed import (initialize_from_env, is_distributed_initialized,
                          make_hybrid_mesh, rank_zero_only)

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding", "shard_batch",
           "initialize_from_env", "is_distributed_initialized",
           "make_hybrid_mesh", "rank_zero_only"]
