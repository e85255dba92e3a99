"""Device-mesh utilities — the TPU replacement for the reference's
DDP/NCCL engine (SURVEY.md §2.5: reference is data-parallel only via
detectron2 `launch` + DistributedDataParallel).

Here data parallelism is expressed as shardings over a `jax.sharding.Mesh`:
the batch is sharded over the 'data' axis, parameters are replicated, and
XLA inserts the gradient all-reduce over ICI/DCN automatically. A 'model'
axis is kept for optional tensor sharding of large backbones (a stretch the
reference does not have).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(data: int = -1, model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        data = n // model
    assert data * model <= n, f"mesh {data}x{model} > {n} devices"
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch pytree with the leading axis sharded."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
