"""Device and host-resource reporting.

Replaces the reference's GPU machinery (`mpunet/utils/system.py` GPUMonitor
process + nvidia-smi polling, `utils/utils.py` CUDA_VISIBLE_DEVICES
bookkeeping): on TPU the runtime owns topology, so "allocation" reduces to
discovery + reporting. `DeviceMonitor` keeps the monitor-object API shape
(`stop()`, `await_and_set_free_devices()`), making CLI scripts portable, but
is process-free."""

from __future__ import annotations

import os
import resource
import threading
import time


def get_devices():
    import jax

    return jax.devices()


def describe_devices():
    """One line per device: platform, kind, id."""
    lines = []
    for d in get_devices():
        lines.append(f"[{d.id}] {d.platform} {getattr(d, 'device_kind', '?')}")
    return "\n".join(lines)


def device_memory_stats():
    """Per-device memory stats dicts where the backend exposes them."""
    stats = {}
    for d in get_devices():
        try:
            stats[d.id] = d.memory_stats()
        except Exception:
            stats[d.id] = None
    return stats


def host_rss_gib():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024 ** 2


def host_core_count():
    return os.cpu_count() or 1


class DeviceMonitor:
    """API-compatible stand-in for the reference's GPUMonitor process.

    Optionally logs device memory stats on an interval thread; `stop()` ends
    it. No subprocesses, no environment mutation."""

    def __init__(self, logger=None, interval_s=None):
        self.logger = logger
        self._stop = threading.Event()
        self._thread = None
        if interval_s:
            self._thread = threading.Thread(
                target=self._loop, args=(interval_s,), daemon=True
            )
            self._thread.start()

    def _log(self, msg):
        (self.logger or print)(msg)

    def _loop(self, interval_s):
        while not self._stop.wait(interval_s):
            stats = device_memory_stats()
            for dev_id, s in stats.items():
                if s and "bytes_in_use" in s:
                    self._log(
                        f"[DeviceMonitor] dev {dev_id}: "
                        f"{s['bytes_in_use'] / 1024 ** 3:.2f} GiB in use"
                    )

    @property
    def free_GPUs(self):  # legacy name
        return list(range(len(get_devices())))

    def await_and_set_free_devices(self, N=1, sleep_seconds=0):
        """All devices are always 'free' under the TPU runtime; returns ids."""
        if sleep_seconds:
            time.sleep(sleep_seconds)
        return self.free_GPUs[:N]

    # Back-compat alias matching the reference method name
    await_and_set_free_GPU = await_and_set_free_devices

    def stop(self):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=1)
