"""Device mesh + sharding helpers for SPMD data-parallel training.

The reference is single-process/single-GPU (SURVEY.md section 2.4: no
torch.distributed anywhere); here data parallelism is the primary scaling
strategy: a 1-D `data` mesh, batches sharded over it, parameters replicated.
XLA inserts the gradient all-reduce over ICI from the sharding propagation —
no explicit collectives needed in the step function.

A `model` axis hook is included for future tensor parallelism (unused: the
largest layer is a 960->300 dense).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed() -> int:
    """Multi-host entry: jax.distributed.initialize() per process.

    The SURVEY §2.4/§5 plan for scaling past one host: each process calls
    this before any device op, then builds the global mesh from
    jax.devices() and feeds its host-local batch shard (the sampler takes
    process_index/process_count). Activation rules:

    * explicit env (any launcher): JAX_COORDINATOR_ADDRESS +
      JAX_NUM_PROCESSES + JAX_PROCESS_ID;
    * TPU pod slices: jax.distributed.initialize() auto-detects from the
      TPU metadata when SMIRK_DISTRIBUTED=1 is set.

    Returns jax.process_count(). No-op (returns 1) for single-process runs,
    so single-host training needs no flags.
    """
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coord:
        missing = [k for k in ("JAX_NUM_PROCESSES", "JAX_PROCESS_ID")
                   if k not in os.environ]
        if missing:
            raise RuntimeError(
                "JAX_COORDINATOR_ADDRESS is set but "
                f"{' and '.join(missing)} are not; all three are required "
                "for multi-process initialization"
            )
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )
    elif os.environ.get("SMIRK_DISTRIBUTED") == "1":
        jax.distributed.initialize()  # TPU pod auto-detection
    return jax.process_count()


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 1) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"make_mesh({n_devices}) but only {len(devices)} devices "
                "visible — a silently smaller mesh would break batch "
                "divisibility downstream"
            )
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model_parallel == 0
    shape = (n // model_parallel, model_parallel)
    try:
        # ICI-topology-aware layout on real TPU slices: neighboring mesh
        # coordinates land on adjacent chips so the data-axis all-reduce
        # ring rides contiguous ICI links
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_device_mesh(shape, devices=devices)
    except Exception:  # virtual CPU meshes / older jax: plain reshape
        arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch dict onto the mesh, sharded on the batch axis."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)
