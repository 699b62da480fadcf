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


# --- FSDP-style parameter sharding (beyond-reference extension) ------------
#
# The reference's only parallelism is data parallelism with replicated
# weights (SURVEY.md §2.9).  For parity that is also our default — the
# models are ~100M-param CNNs and fit comfortably.  `--param_sharding fsdp`
# additionally shards every large TrainState leaf (params, EMA copies, both
# optimizers' moments) over the 'data' axis, ZeRO-3 style: XLA's SPMD
# partitioner inserts the all-gathers before use and reduce-scatters after
# the backward, riding ICI.  This cuts per-chip state memory ~Nx and is the
# lever that lets the same train step host much larger generators or longer
# EMA chains without code changes.

def _fsdp_spec(x, num_shards: int, min_size: int, path: str = "") -> P:
    """Partition spec for one leaf: split the largest axis that divides
    evenly over 'data'; small/indivisible leaves stay replicated.

    Grouped-convolution kernels stay replicated: XLA's SPMD partitioner
    CHECK-fails (convolution_handler.cc `new_input_batch_size %
    new_output_batch_size`) when a conv with feature_group_count > 1 sees a
    kernel sharded on a feature axis — it partitions grouped convs by
    mapping groups onto a batch dimension, and a feature-sharded kernel
    splits *within* groups.  Two leaf families hit this: ResNeXt's 32-group
    3x3 kernels (grouped HWIO (kh, kw, Cg, G*co) — out features are >= 8x
    the per-group in features; their coarse block-diagonal expansions
    inherit the param's sharding) and MobileNetV2's depthwise kernels
    (HWIO with I == 1).  Both are detected by shape — a grouped kernel is
    indistinguishable from a dense one by name ('conv2' in the bottleneck).
    The heuristic also catches from-RGB stem kernels (I <= 3); those are
    tiny, and all these leaves together are a small fraction of state
    memory — everything else still shards.
    """
    shape = tuple(getattr(x, "shape", ()) or ())
    size = int(np.prod(shape)) if shape else 0
    if size < min_size:
        return P()
    if len(shape) == 4 and (shape[2] == 1 or shape[3] >= 8 * shape[2]
                            or "GroupedConv" in path):
        return P()  # grouped / depthwise conv kernel (or its moments)
    for axis in sorted(range(len(shape)), key=lambda a: shape[a],
                       reverse=True):
        if shape[axis] % num_shards == 0:
            spec = [None] * len(shape)
            spec[axis] = "data"
            return P(*spec)
    return P()


def state_shardings(state, mesh: Mesh, mode: str = "replicated",
                    min_size: int = 2 ** 12):
    """A TrainState-shaped tree of NamedShardings for the given mode.

    Used both to place the initial state and as the jitted step's
    ``out_shardings`` so the updated state *stays* sharded (without the
    pin, GSPMD may decide to gather the new params back to replicated).
    """
    if mode not in ("replicated", "fsdp"):
        raise ValueError(f"Unknown param sharding mode: {mode!r}")
    if mode == "replicated":
        return jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P()), state)
    n = int(mesh.shape["data"])
    return jax.tree_util.tree_map_with_path(
        lambda kp, x: NamedSharding(
            mesh, _fsdp_spec(x, n, min_size, jax.tree_util.keystr(kp))),
        state)


def shard_state(state, mesh: Mesh, mode: str = "replicated",
                min_size: int = 2 ** 12):
    """Place a TrainState on the mesh under the given parameter-sharding
    mode ('replicated' = pure DP, 'fsdp' = ZeRO-3-style)."""
    shardings = state_shardings(state, mesh, mode, min_size)
    return jax.tree_util.tree_map(jax.device_put, state, shardings)
