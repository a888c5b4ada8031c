"""Multi-host (multi-process) data parallelism — executed for real.

Launches TWO OS processes that join one jax.distributed process group over
a localhost coordinator (CPU backend, 2 virtual devices per process, gloo
cross-process collectives), build the GLOBAL 4-device mesh, assemble global
batches from per-process local shards (`shard_batch` →
make_array_from_process_local_data) and run real jitted train steps of the
2D U-Net with the gradient all-reduce crossing process boundaries.

This is the executable form of the BASELINE v5e-16 task-group config:
the same code paths `mp train` uses via maybe_initialize_distributed
(replacing the reference's single-host MirroredStrategy,
`mpunet/bin/train.py:349`)."""
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import json, os, sys
import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

addr, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

# The CLI entry points reach this through maybe_initialize_distributed's
# MPUNET_* env marker path; exercise exactly that path here.
os.environ["MPUNET_COORDINATOR_ADDRESS"] = addr
os.environ["MPUNET_NUM_PROCESSES"] = str(nproc)
os.environ["MPUNET_PROCESS_ID"] = str(pid)
from multiplanarunet_tpu.parallel import (
    get_mesh, local_batch_slice, maybe_initialize_distributed, shard_batch,
    replicate,
)

n, i = maybe_initialize_distributed()
assert (n, i) == (nproc, pid), (n, i)
assert jax.device_count() == 2 * nproc, jax.device_count()
assert jax.local_device_count() == 2

import jax.numpy as jnp
import optax

from multiplanarunet_tpu.evaluate.losses import SparseCategoricalCrossentropy
from multiplanarunet_tpu.models import UNet, init_model_variables
from multiplanarunet_tpu.train.train_step import (
    create_train_state, make_train_step,
)

mesh = get_mesh()           # spans BOTH processes' devices
assert mesh.devices.size == 2 * nproc

model = UNet(n_classes=3, dim=16, n_channels=1, depth=1, init_filters=4)
variables = init_model_variables(model, rng=jax.random.PRNGKey(0))

tx = optax.inject_hyperparams(optax.adam)(learning_rate=1e-2)
state = create_train_state(variables, tx)
state = replicate(state, mesh)  # identical across processes (same seed)

loss_obj = SparseCategoricalCrossentropy()
step = make_train_step(model, tx, loss_obj, {})

GLOBAL_BATCH = 8
start, local_bs = local_batch_slice(GLOBAL_BATCH)
assert local_bs == GLOBAL_BATCH // nproc

losses = []
for it in range(4):
    # Deterministic per-process slice of one global dataset: both halves
    # of the batch exist exactly once across the process group.
    rng = np.random.RandomState(100 + it)
    gx = rng.rand(GLOBAL_BATCH, 16, 16, 1).astype(np.float32)
    gy = (gx[..., 0] > 0.5).astype(np.int32)[..., None] + (
        gx[..., 0] > 0.8).astype(np.int32)[..., None]
    x, y = gx[start:start + local_bs], gy[start:start + local_bs]
    w = np.ones(local_bs, np.float32)
    xb, yb, wb = shard_batch((x, y, w), mesh)
    state, logs = step(state, xb, yb, wb)
    losses.append(float(logs["loss"]))  # replicated output: same everywhere

checksum = float(
    sum(jnp.sum(jnp.abs(p)) for p in jax.tree_util.tree_leaves(state.params))
)

# ---- epoch validation across hosts: local batch 3 over 2 local devices
# exercises the per-process pad + validity mask and the in-graph
# padded-loss factor (global pad 8 / global true 6).
from multiplanarunet_tpu.callbacks.validation import Validation
from multiplanarunet_tpu.logging import ScreenLogger
from multiplanarunet_tpu.train import Trainer

val_trainer = Trainer(model, init_model_variables(model, jax.random.PRNGKey(0)),
                      logger=ScreenLogger(False), mesh=mesh)
val_trainer.compile_model(
    optimizer="Adam", optimizer_kwargs={"lr": 1e-3},
    loss="SparseCategoricalCrossentropy", metrics=[])

VAL_GLOBAL, LOCAL_VAL = 6, 3
rngv = np.random.RandomState(7)
gvx = rngv.rand(VAL_GLOBAL, 16, 16, 1).astype(np.float32)
gvy = (gvx[..., 0] > 0.5).astype(np.int32)[..., None] + (
    gvx[..., 0] > 0.8).astype(np.int32)[..., None]
vstart = pid * LOCAL_VAL


class _Replay:
    batch_size = LOCAL_VAL

    def __getitem__(self, i):
        return (gvx[vstart:vstart + LOCAL_VAL],
                gvy[vstart:vstart + LOCAL_VAL],
                np.ones(LOCAL_VAL, np.float32))


cb = Validation(_Replay(), steps=2, logger=ScreenLogger(False), verbose=False)
cb.set_trainer(val_trainer)
val_logs = {}
cb.on_epoch_end(0, val_logs)

print("RESULT " + json.dumps({
    "pid": pid, "losses": losses, "checksum": checksum,
    "global_devices": jax.device_count(),
    "val_loss": val_logs["val_loss"], "val_dice": val_logs["val_dice"],
}))
"""


@pytest.fixture(scope="module")
def two_process_results(tmp_path_factory):
    port = _free_port()
    addr = f"localhost:{port}"
    script = tmp_path_factory.mktemp("dist") / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (env.get("PYTHONPATH", ""), str(REPO)) if p
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), addr, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)
    results = {}
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")][-1]
        r = json.loads(line[len("RESULT "):])
        results[r["pid"]] = r
    return results


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_global_mesh_spans_processes(two_process_results):
    """Each process sees 2x its local devices globally."""
    for r in two_process_results.values():
        assert r["global_devices"] == 4


def test_training_reduces_loss_across_hosts(two_process_results):
    """Real cross-process train steps make progress."""
    losses = two_process_results[0]["losses"]
    assert losses[-1] < losses[0], losses


def test_replicas_stay_identical(two_process_results):
    """Loss stream and post-training params agree bit-wise between the two
    processes (the psum'd gradient is the same everywhere)."""
    r0, r1 = two_process_results[0], two_process_results[1]
    np.testing.assert_allclose(r0["losses"], r1["losses"], rtol=0, atol=0)
    assert r0["checksum"] == r1["checksum"]


def test_explicit_multiprocess_init_after_backend_raises():
    """An EXPLICIT multi-process config must fail LOUDLY when the JAX
    backend was already initialized (silent fallback would run every
    process standalone — the bug class the predict entry point had)."""
    code = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
float(jnp.sum(jnp.ones(4)))  # initialize the backend
from multiplanarunet_tpu.parallel.distributed import initialize_distributed
try:
    initialize_distributed("localhost:59999", 2, 0)
except RuntimeError as e:
    print("RAISED", str(e)[:60])
else:
    print("NO_RAISE")
"""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (env.get("PYTHONPATH", ""), str(REPO)) if p)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, env=env, timeout=240)
    assert "RAISED" in out.stdout, (out.stdout, out.stderr[-1500:])


def test_multihost_validation_matches_single_process(two_process_results):
    """The Validation callback running across 2 processes (local batch 3,
    per-process pad + mask) must reproduce the single-process numbers for
    the same global batches: the mask is built over the process-LOCAL
    padded piece and the padded-loss factor is global-pad / global-true."""
    import jax

    from multiplanarunet_tpu.callbacks.validation import Validation
    from multiplanarunet_tpu.logging import ScreenLogger
    from multiplanarunet_tpu.models import UNet, init_model_variables
    from multiplanarunet_tpu.parallel import get_mesh
    from multiplanarunet_tpu.train import Trainer

    # Same model/seed/data as the worker's validation block, single process
    # over a 4-device mesh (global batch 6 pads to 8 with the same 6/8
    # validity ratio; the pad rows differ but carry zero weight and are
    # masked out of the confusion counts).
    model = UNet(n_classes=3, dim=16, n_channels=1, depth=1, init_filters=4)
    trainer = Trainer(model, init_model_variables(model, jax.random.PRNGKey(0)),
                      logger=ScreenLogger(False),
                      mesh=get_mesh(jax.devices()[:4]))
    trainer.compile_model(
        optimizer="Adam", optimizer_kwargs={"lr": 1e-3},
        loss="SparseCategoricalCrossentropy", metrics=[])

    rngv = np.random.RandomState(7)
    gvx = rngv.rand(6, 16, 16, 1).astype(np.float32)
    gvy = (gvx[..., 0] > 0.5).astype(np.int32)[..., None] + (
        gvx[..., 0] > 0.8).astype(np.int32)[..., None]

    class _Replay:
        batch_size = 6

        def __getitem__(self, i):
            return gvx, gvy, np.ones(6, np.float32)

    cb = Validation(_Replay(), steps=2, logger=ScreenLogger(False),
                    verbose=False)
    cb.set_trainer(trainer)
    expected = {}
    cb.on_epoch_end(0, expected)

    for r in two_process_results.values():
        np.testing.assert_allclose(r["val_loss"], expected["val_loss"],
                                   rtol=1e-5)
        np.testing.assert_allclose(r["val_dice"], expected["val_dice"],
                                   rtol=1e-6)
