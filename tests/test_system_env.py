"""Environment sanity tests (parity: mpunet/tests/system/test_system.py —
the reference asserts RAM/cores/GPU presence; here: devices, mesh carving,
host resources). Failures may indicate an under-provisioned machine rather
than a framework bug."""
import numpy as np

import jax

from multiplanarunet_tpu.parallel import get_mesh, task_group_mesh
from multiplanarunet_tpu.utils.system import (
    describe_devices,
    device_memory_stats,
    host_core_count,
    host_rss_gib,
    DeviceMonitor,
)


def test_devices_present():
    assert len(jax.devices()) >= 1
    assert describe_devices()


def test_virtual_mesh_spans_devices():
    mesh = get_mesh()
    assert mesh.devices.size == len(jax.devices()) == 8  # conftest forces 8


def test_task_group_mesh_carves_groups():
    mesh, idx = task_group_mesh(4)
    assert mesh.devices.size == 2
    assert 0 <= idx < 4
    mesh2, _ = task_group_mesh(4, group_index=3)
    assert set(d.id for d in mesh2.devices.ravel()) == {6, 7}


def test_host_resources():
    assert host_core_count() >= 1
    assert host_rss_gib() > 0


def test_device_monitor_api():
    mon = DeviceMonitor()
    assert mon.await_and_set_free_devices(2) == [0, 1]
    mon.stop()
    stats = device_memory_stats()
    assert set(stats) == {d.id for d in jax.devices()}
