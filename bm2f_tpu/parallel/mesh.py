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
    """Place a host batch pytree with the leading axis sharded over 'data'.

    Single-process (incl. the 8-virtual-device test mesh): the host batch IS
    the global batch — device_put splits it. Multi-process: each host's
    loader yields only ITS slice of the global batch (train.py builds
    per-host loader shards), so the local arrays are assembled into global
    jax.Arrays via make_array_from_process_local_data — device_put with a
    cross-process sharding would wrongly treat the local slice as the whole
    global batch."""
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)
            ),
            batch,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
