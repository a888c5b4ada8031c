"""Multi-host (multi-process) initialization and task-group meshes.

The reference's largest-scale mode is process-parallel CV sweeps pinned to
GPU sets (`bin/cv_experiment.py`). On TPU pods the equivalents are:

  * one data-parallel job spanning all hosts of a slice: call
    `initialize_distributed()` in every process (JAX wires coordinator
    discovery from the TPU environment), then `get_mesh()` spans the global
    device set and per-host input pipelines feed their local shard;
  * task-per-host-group sweeps (e.g. one Decathlon task per v5e-4 group of a
    v5e-16): `task_group_mesh(n_groups)` carves the global devices into
    contiguous groups and returns this process's group mesh, so independent
    trainings share one slice without interfering.
"""

from __future__ import annotations

import os

import numpy as np

# Environment markers that signal a multi-process launch. The MPUNET_*
# triple is this framework's explicit form (set by a job launcher); the
# rest are standard cluster environments jax.distributed auto-detects.
_DIST_ENV_MARKERS = (
    "JAX_COORDINATOR_ADDRESS",
    "COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",
    "SLURM_JOB_NUM_NODES",
    "OMPI_COMM_WORLD_SIZE",
    "TPU_WORKER_HOSTNAMES",
)


def maybe_initialize_distributed(logger=None):
    """Entry-point hook (`mp train` / `mp predict` / `mp train_fusion`):
    initialize jax.distributed when a multi-process environment is
    detected, no-op otherwise. Replaces the reference's out-of-band GPU
    pinning (`mpunet/bin/train.py:349` MirroredStrategy scope +
    CUDA_VISIBLE_DEVICES) with TPU-native process-group setup.

    Detection: MPUNET_COORDINATOR_ADDRESS (+ MPUNET_NUM_PROCESSES /
    MPUNET_PROCESS_ID) set explicitly by a launcher, or any standard
    cluster marker (Slurm, OpenMPI, Cloud TPU pod metadata), which
    jax.distributed.initialize resolves itself. Returns
    (process_count, process_index)."""
    import jax

    addr = os.environ.get("MPUNET_COORDINATOR_ADDRESS")
    if addr:
        n, i = initialize_distributed(
            addr,
            int(os.environ["MPUNET_NUM_PROCESSES"]),
            int(os.environ["MPUNET_PROCESS_ID"]),
        )
    elif any(m in os.environ for m in _DIST_ENV_MARKERS):
        n, i = initialize_distributed()
    else:
        return jax.process_count(), jax.process_index()
    if logger is not None and n > 1:
        logger(f"Distributed: process {i + 1}/{n}, "
               f"{jax.device_count()} global / "
               f"{jax.local_device_count()} local device(s)")
    return n, i


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Initialize jax.distributed (no-op if already initialized or single
    process). Safe to call unconditionally from CLI entry points."""
    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError) as e:
        # Already initialized, or single-process environment without
        # coordinator configuration. With an EXPLICIT multi-process
        # config a silent fallback would run every process standalone
        # (e.g. initialize called after the first JAX computation) —
        # that must be loud.
        if (num_processes or 1) > 1 and jax.process_count() == 1:
            raise RuntimeError(
                f"jax.distributed.initialize failed for an explicit "
                f"{num_processes}-process configuration (most often: "
                f"called after the JAX backend was already initialized "
                f"by a device computation): {e}"
            ) from e
    return jax.process_count(), jax.process_index()


def task_group_mesh(n_groups, group_index=None):
    """Split the global device set into `n_groups` contiguous groups and
    return (mesh over this process's group, group_index)."""
    import jax
    from jax.sharding import Mesh

    from multiplanarunet_tpu.parallel.mesh import DATA_AXIS

    devices = np.asarray(jax.devices())
    if len(devices) % n_groups:
        raise ValueError(
            f"{len(devices)} devices do not split into {n_groups} groups"
        )
    per_group = len(devices) // n_groups
    if group_index is None:
        # Default: the group containing this process's first local device
        local = jax.local_devices()[0]
        flat_index = int(np.where(devices == local)[0][0])
        group_index = flat_index // per_group
    group = devices[group_index * per_group:(group_index + 1) * per_group]
    return Mesh(group, (DATA_AXIS,)), group_index


def local_batch_slice(global_batch_size):
    """(start, size) of this process's share of a globally sharded batch."""
    import jax

    per_proc = global_batch_size // jax.process_count()
    return jax.process_index() * per_proc, per_proc


def is_main_process():
    """True in the process that owns shared-filesystem writes (results
    CSVs, checkpoints, views.npz, hparams). Single-process: always True.
    The reference never needs this (its MirroredStrategy is single-
    process, `mpunet/bin/train.py:349`); here every `mp` entry point may
    run as one process of a jax.distributed group sharing a project dir,
    so exactly one writer is part of the CLI contract.

    Reads the MPUNET_PROCESS_ID launcher marker first: querying
    jax.process_index() initializes the backend, which must never happen
    before jax.distributed.initialize — this keeps the predicate safe to
    call from anywhere (e.g. YAMLHParams.save_current during project
    setup)."""
    pid = os.environ.get("MPUNET_PROCESS_ID")
    if pid is not None:
        return pid == "0"
    if any(m in os.environ for m in _DIST_ENV_MARKERS):
        import jax

        return jax.process_index() == 0
    return True


def process_barrier(name, timeout_ms=3_600_000):
    """Block until every process of the group reaches `name` (no-op
    single-process). Used by `mp predict` before the main process merges
    the per-process partial results CSVs.

    Uses the jax.distributed coordination-service barrier (host-level,
    explicit timeout) rather than a device collective: processes reach
    this barrier minutes apart (each predicts its own share of the
    cohort), and a first gloo collective issued that late dies on gloo's
    30 s context-initialization deadline (measured in
    tests/test_distributed_cli.py). Falls back to sync_global_devices
    where the client API is unavailable."""
    import jax

    if jax.process_count() == 1:
        return
    try:
        from jax._src import distributed

        client = getattr(distributed.global_state, "client", None)
    except Exception:  # pragma: no cover - private-API drift
        client = None
    if client is not None:
        client.wait_at_barrier(name, timeout_ms)
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)  # pragma: no cover


def broadcast_from_main(array):
    """Return the main process's value of `array` in every process (no-op
    single-process). Keeps randomly sampled run artifacts — e.g. the view
    axes of `load_or_create_views` — identical across a process group
    without requiring seed discipline in every sampler."""
    import jax

    if jax.process_count() == 1:
        return array
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.broadcast_one_to_all(np.asarray(array)))
