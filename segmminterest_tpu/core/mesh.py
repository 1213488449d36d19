"""Device mesh + sharding helpers.

The reference ships NCCL DDP utilities that are never called
(/root/reference/MMinterest/models/kn_util/distributed/utils.py:47-63); all
published runs are single-GPU. The TPU-native equivalent is first-class here:
a ('data', 'model') mesh over ICI, global-batch sharding via NamedSharding,
and compiler-emitted collectives (psum on grads under jit). 'model' defaults
to size 1 — the 40-segment problem is batch-parallel — but the axis exists so
larger variants shard without API changes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              data: Optional[int] = None, model: int = 1) -> Mesh:
    """Build a ('data', 'model') mesh. By default all visible devices go to
    the data axis (the reference workload is batch-parallel end to end)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays on the mesh, batch-dim sharded.

    Replaces the reference's per-rank ``batch_size // world_size`` split
    (kn_util/distributed/utils.py:60) with a single global-batch placement.
    """
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def is_multihost(mesh: Mesh) -> bool:
    """True when the mesh spans devices owned by other processes."""
    pid = jax.process_index()
    return any(d.process_index != pid for d in mesh.devices.flat)


def to_host_global(x) -> np.ndarray:
    """Materialize a (possibly cross-host sharded) array on every host.

    Single-host arrays pass through np.asarray; multi-host shards are
    all-gathered over DCN so host-side metric code sees the global batch —
    the analogue of the reference's DistributedEvalSampler + gather
    (kn_util/distributed/).
    """
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)
