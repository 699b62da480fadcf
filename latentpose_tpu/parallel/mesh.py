"""Device mesh + sharding rules — the TPU-native distributed layer.

Replaces the reference's three data-parallel regimes (NCCL process group +
apex Reducer for <=8 GPUs, horovod beyond — reference ``train.py:97-211``)
with a single-program SPMD design:

- one 1-D ``Mesh(('data',))`` over all chips (ICI within a slice, DCN across
  slices is handled transparently by the JAX runtime);
- the train step is written over the *global* batch; inputs are sharded on
  the 'data' axis and params replicated, and XLA inserts the gradient
  all-reduces (replacing explicit NCCL allreduce calls);
- per-host input sharding uses ``jax.process_index()`` (see data/dataloader);
- checkpointing is process-0-only, like the reference's rank-0 guard.

The model is small (256² CNNs), so pure DP is the right parallelism — there
is no tensor/pipeline dimension worth paying ICI latency for (SURVEY.md
§2.9).  The mesh helper still accepts extra axes for forward-compatible
FSDP-style sharding experiments.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(num_devices: int = 0, devices=None,
                axis_names=("data",)) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = num_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"Requested {n} devices, only {len(devices)} "
                         "visible")
    mesh_shape = (n,) + (1,) * (len(axis_names) - 1)
    return Mesh(np.asarray(devices[:n]).reshape(mesh_shape), axis_names)


def shard_batch(batch, mesh: Mesh):
    """Place a host batch on the mesh, axis 0 split over 'data'."""
    sharding = NamedSharding(mesh, P("data"))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params / train state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding),
                                  tree)


def shard_batch_multihost(local_batch, mesh: Mesh):
    """Multi-host input: assemble global arrays from per-process shards.

    Each host loads only its own rows (data/pipeline.py shards indices by
    ``jax.process_index()``, like the reference's ``Subset(rank::world)`` —
    ``dataloaders/dataloader.py:29-33``); this stitches them into global
    jax.Arrays sharded over the 'data' axis.  This is the >8-GPU/horovod
    regime equivalent (SURVEY.md §2.9) — the same jitted step runs
    unchanged.
    """
    sharding = NamedSharding(mesh, P("data"))

    def put(x):
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree_util.tree_map(put, local_batch)


def batch_sharding(mesh: Mesh):
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh):
    return NamedSharding(mesh, P())
