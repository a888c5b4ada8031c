"""Device mesh + sharding helpers for data-parallel training.

The reference scales with `tf.distribute.MirroredStrategy` (single-host
multi-GPU NCCL all-reduce, `bin/train.py:349`). The TPU-native equivalent is
a 1-axis `jax.sharding.Mesh` over all chips with the batch dimension sharded
along the ``data`` axis and parameters replicated: XLA then inserts the
gradient psum over ICI automatically when the jitted train step consumes
sharded batches and produces replicated parameter updates.

The mesh generalizes beyond MirroredStrategy: on multi-host slices the same
code spans hosts (each host feeds its local shard), and the Decathlon-style
task-per-host-group sweep maps to one process group per task with its own
mesh (see `bin/cv_experiment.py` in this package)."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"


def get_mesh(devices=None):
    """A 1D data-parallel mesh over all (or the given) devices."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh):
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh):
    """Place a pytree of batch arrays with the leading axis sharded.

    Multi-process (multi-host) meshes: each process passes its LOCAL slice
    of the global batch (`local_batch_slice` sizes it) and the global
    jax.Array is assembled from the per-process data — the device_put path
    cannot address remote devices."""
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)),
            batch,
        )
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate(tree, mesh):
    """Fully replicate a pytree (params, opt state) over the mesh.

    Multi-process: every process must hold identical values (same init
    seed / restored checkpoint), which become the replicated global array."""
    sharding = replicated(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x), np.shape(x)),
            tree,
        )
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


def pad_batch_to_multiple(batch_size, n_devices):
    """Smallest batch >= batch_size divisible by n_devices."""
    return -(-batch_size // n_devices) * n_devices
