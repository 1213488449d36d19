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
import jax.numpy as jnp
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


def model_axis_size(mesh: Mesh) -> int:
    return mesh.shape[MODEL_AXIS]


def table_sharding(mesh: Mesh) -> NamedSharding:
    """Row-shard a (rows, dim) feature table over the MODEL axis.

    The production SegMM table (3,920,483 rows x 1024 bf16 ≈ 8 GB,
    BASELINE.md Table 1) consumes half of one v5e's HBM; at 2x the corpus a
    single chip cannot hold it. Sharding rows over 'model' scales table
    capacity linearly with the model-axis size while 'data' keeps scaling
    the batch."""
    return NamedSharding(mesh, P(MODEL_AXIS, None))


def pad_table_rows(table, mesh: Mesh):
    """Zero-pad rows so the table divides evenly over the model axis.

    Accepts a host array or a device-resident jax.Array (the pad then runs
    on device instead of round-tripping 4-8 GB through the host)."""
    m = model_axis_size(mesh)
    n = table.shape[0]
    pad = (-n) % m
    if pad:
        if isinstance(table, jax.Array) and not isinstance(table, np.ndarray):
            table = jnp.pad(table, ((0, pad),) + ((0, 0),) * (table.ndim - 1))
        else:
            table = np.concatenate(
                [table, np.zeros((pad,) + table.shape[1:], table.dtype)])
    return table


def sharded_table_gather(mesh: Mesh, table, ids, scale=None,
                         out_dtype=None):
    """Gather rows of a model-axis-sharded table for a data-sharded id batch.

    Classic sharded-embedding pattern: every model shard gathers the ids
    that fall inside its row range (others contribute zeros) and a psum
    over 'model' assembles the full rows. ICI traffic = the gathered
    output, not the table. ids: (B, L) int32 >= 0; returns (B, L, dim).

    With ``scale`` (the (rows, 1) per-row scale of an int8-quantized table,
    sharded like the table), rows are dequantized to ``out_dtype`` INSIDE
    the shard before the psum — int8 never crosses ICI un-scaled and the
    psum runs in the compute dtype.
    """
    from functools import partial
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:
        from jax.experimental.shard_map import shard_map

    from .numerics import dequantize_rows

    if scale is not None and out_dtype is None:
        raise ValueError("sharded_table_gather(scale=...) requires an "
                         "explicit out_dtype (astype(None) would silently "
                         "promote the psum to the default float)")

    def body(tab_local, ids_local, scale_local=None):
        rows_per = tab_local.shape[0]
        offset = jax.lax.axis_index(MODEL_AXIS) * rows_per
        local = ids_local - offset
        ok = (local >= 0) & (local < rows_per)
        local = jnp.clip(local, 0, rows_per - 1)
        out = jnp.take(tab_local, local, axis=0)
        if scale_local is not None:
            out = dequantize_rows(out, jnp.take(scale_local, local, axis=0),
                                  out_dtype)
        out = out * ok[..., None].astype(out.dtype)
        return jax.lax.psum(out, MODEL_AXIS)

    in_specs = (P(MODEL_AXIS, None), P(DATA_AXIS, None))
    operands = (table, ids)
    if scale is not None:
        in_specs += (P(MODEL_AXIS, None),)
        operands += (scale,)
    gather = partial(shard_map, mesh=mesh, in_specs=in_specs,
                     out_specs=P(DATA_AXIS, None, None))(body)
    return gather(*operands)
