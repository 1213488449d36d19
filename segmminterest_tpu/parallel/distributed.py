"""Multi-host (DCN) initialization and hybrid mesh construction.

Behavioral spec: /root/reference/MMinterest/models/kn_util/distributed/utils.py
(:47-63 initialize_ddp_from_env — NCCL process group from RANK/WORLD_SIZE env,
:13-25 rank_zero_only, :66-67 is_ddp_initialized_and_available). The reference
never exercises these (all published runs are single-GPU); here the TPU-native
equivalents are first-class and tested.

TPU-first redesign: instead of per-rank NCCL process groups + manual
``batch_size // world_size`` splits (:60), one ``jax.distributed.initialize``
call makes every process see the GLOBAL device set; a hybrid mesh lays the
batch ('data') axis across hosts so its collectives cross DCN only where they
must, while the 'model' axis stays inside a host's ICI domain. Sharding is
then identical to single-host code — XLA inserts the DCN/ICI collectives.
"""

from __future__ import annotations

import functools
import logging
import os
from typing import Any, Callable, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_from_env(coordinator_address: Optional[str] = None,
                        num_processes: Optional[int] = None,
                        process_id: Optional[int] = None,
                        local_device_ids=None) -> Tuple[int, int]:
    """``jax.distributed.initialize`` from env vars; the analogue of
    initialize_ddp_from_env (kn_util/distributed/utils.py:47-63).

    Env (torchrun-compatible names accepted): COORDINATOR_ADDRESS /
    MASTER_ADDR:MASTER_PORT, NUM_PROCESSES / WORLD_SIZE, PROCESS_ID / RANK.
    A single-process environment (WORLD_SIZE absent or 1 with no coordinator)
    is a no-op. Returns (process_id, num_processes).
    """
    import jax

    def env(*names, default=None):
        for n in names:
            v = os.environ.get(n)
            if v is not None:
                return v
        return default

    if coordinator_address is None:
        coordinator_address = env("COORDINATOR_ADDRESS",
                                  "JAX_COORDINATOR_ADDRESS")
        if coordinator_address is None and env("MASTER_ADDR"):
            coordinator_address = (f"{env('MASTER_ADDR')}:"
                                   f"{env('MASTER_PORT', default='1234')}")
    if num_processes is None:
        v = env("NUM_PROCESSES", "WORLD_SIZE")
        num_processes = int(v) if v is not None else None
    if process_id is None:
        v = env("PROCESS_ID", "RANK")
        process_id = int(v) if v is not None else None

    if coordinator_address is None and (num_processes or 1) <= 1:
        # single process — nothing to initialize (the reference asserts env
        # vars exist and crashes; being callable unconditionally is nicer)
        return 0, 1

    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids)
    logger.info("distributed: process %d/%d, %d local / %d global devices",
                jax.process_index(), jax.process_count(),
                jax.local_device_count(), jax.device_count())
    return jax.process_index(), jax.process_count()


def is_distributed_initialized() -> bool:
    """Analogue of is_ddp_initialized_and_available (utils.py:66-67)."""
    import jax
    try:
        return jax.process_count() > 1
    except RuntimeError:
        return False


def rank_zero_only(fn: Callable) -> Callable:
    """Run ``fn`` only on process 0 (utils.py:13-25). Unlike the reference,
    no manual rank attribute needs to be set first."""

    @functools.wraps(fn)
    def wrapped(*args: Any, **kwargs: Any) -> Optional[Any]:
        import jax
        if jax.process_index() == 0:
            return fn(*args, **kwargs)
        return None

    return wrapped


def make_hybrid_mesh(model: int = 1, devices=None):
    """('data', 'model') mesh spanning every process.

    The data axis is laid out DCN-major (hosts) x ICI-minor (chips within a
    host) via mesh_utils.create_hybrid_device_mesh, so 'model'-axis
    collectives never leave a host's ICI domain and 'data'-axis gradient
    psums do a hierarchical ICI-then-DCN reduction. Single-process falls back
    to core.mesh.make_mesh (identical semantics).
    """
    import jax
    from jax.sharding import Mesh

    if devices is None and jax.process_count() == 1:
        from ..core.mesh import make_mesh
        return make_mesh(model=model)

    n_local = jax.local_device_count()
    n_proc = jax.process_count()
    assert n_local % model == 0, \
        f"{n_local} local devices not divisible by model={model}"
    try:
        # TPU pods/multislice: group by slice_index so DCN boundaries are real
        from jax.experimental import mesh_utils
        dev = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(n_local // model, model),
            dcn_mesh_shape=(n_proc, 1),
            devices=devices)
    except ValueError:
        # backends whose devices carry no slice topology (CPU simulation):
        # group by owning process — each process IS a DCN endpoint there
        devs = sorted(devices if devices is not None else jax.devices(),
                      key=lambda d: (d.process_index, d.id))
        dev = np.asarray(devs).reshape(n_proc, n_local // model, model)
    # (dcn*ici_data, model): collapse DCN-major onto the data axis
    dev = np.asarray(dev).reshape(n_proc * (n_local // model), model)
    return Mesh(dev, (DATA_AXIS, MODEL_AXIS))
