"""DeviceVolumePool: resident training volumes stacked in one HBM array.

The per-slice sampling path costs two device calls + host syncs per slice
(candidate labels, then the chosen image slice). With all resident volumes
bucket-padded to ONE common shape and stacked as a (n_slots, X, Y, Z, C)
pool, a whole batch of slices — across different subjects — extracts in a
single gather call indexed by slot: the flat gather index simply gains a
slot stride. This removes the per-slice dispatch overhead entirely (16x
fewer host->device round trips at batch 16) and is the natural TPU analogue
of the reference's in-RAM image set.

Slots carry per-image sampling parameters (origin/spacing/rotation/fill/
valid extent) consumed by `ops.interp.sample_plane_batch_pool`."""

from __future__ import annotations

import threading

import numpy as np


class DeviceVolumePool:
    """Fixed-capacity pool of staged (scaled) volumes + label volumes."""

    def __init__(self, shape, n_channels, capacity, with_labels=True,
                 dtype=np.float32, pack_volumes=None):
        import jax.numpy as jnp

        self.shape = tuple(int(s) for s in shape)  # common padded (X, Y, Z)
        self.n_channels = int(n_channels)
        self.capacity = int(capacity)
        self.with_labels = with_labels
        self._volumes = jnp.zeros(
            (self.capacity,) + self.shape + (self.n_channels,), dtype
        )
        # Corner-packed twin of `volumes` (see ops.interp.pack_corners):
        # trilinear plane extraction becomes ONE gather instead of eight
        # at 8x the volume HBM. Measured OFF-BY-DEFAULT negative result
        # on the v5e (2026-08-19): a multi-dim packed pool argument gets a
        # whole-pool relayout inside every consuming program (~20 ms/step
        # at 524 MB — more than the ~12 ms the gather saves), and the
        # relayout-proof FLAT form's lax.gather of 8-element rows lowers
        # to a slow path (~430 ms/batch vs 15 ms for 8 take-gathers).
        # MP_POOL_PACK=1 re-enables for future toolchains.
        if pack_volumes is None:
            import os

            pack_volumes = os.environ.get("MP_POOL_PACK", "0") == "1"
        self.pack_volumes = bool(pack_volumes)
        # FLAT packed pool: a multi-dim packed argument gets a whole-pool
        # relayout inside EVERY consuming program (measured 35-40 ms/step
        # at 524 MB); 1-D has exactly one layout. See
        # ops.interp.grid_gather_pool_packed.
        self._packed = (
            jnp.zeros(self.capacity * int(np.prod(self.shape)) * 8
                      * self.n_channels, dtype)
            if self.pack_volumes else None
        )
        self._labels = (
            jnp.zeros((self.capacity,) + self.shape + (1,), jnp.float32)
            if with_labels else None
        )
        # per-slot params (host mirrors, shipped per batch)
        self.origins = np.zeros((self.capacity, 3), np.float32)
        self.spacings = np.ones((self.capacity, 3), np.float32)
        self.rots = np.tile(np.eye(3, dtype=np.float32),
                            (self.capacity, 1, 1))
        self.fills = np.zeros((self.capacity, self.n_channels), np.float32)
        self.bg_classes = np.zeros((self.capacity,), np.float32)
        self.valid_shapes = np.ones((self.capacity, 3), np.int32)
        self._slot_of = {}
        self._order = []  # LRU
        self._lock = threading.Lock()

    @classmethod
    def shape_for(cls, images, bucket=32):
        """Common padded shape covering every image (bucket multiples)."""
        dims = np.stack([np.asarray(im.shape[:3]) for im in images])
        maxd = dims.max(axis=0)
        return tuple(int(max(bucket, -(-d // bucket) * bucket)) for d in maxd)

    # -------------------------------------------------------------- staging
    def _pad_to_shape(self, arr):
        pads = [(0, t - s) for t, s in zip(self.shape, arr.shape[:3])]
        pads.append((0, 0))
        if any(p != (0, 0) for p in pads):
            arr = np.pad(arr, pads, mode="constant")
        return arr

    def ensure(self, image):
        """Return the slot of `image`, staging it (with LRU eviction) if
        absent. The image must be loaded. Thread-safe: sampler prefetch
        threads build independent batches concurrently (the staged jnp
        arrays are functional — an in-flight batch keeps referencing the
        array version it was built against even across evictions)."""
        with self._lock:
            return self._ensure_locked(image)

    def _ensure_locked(self, image):
        key = image.identifier
        if key in self._slot_of:
            self._order.remove(key)
            self._order.append(key)
            return self._slot_of[key]
        if len(self._slot_of) >= self.capacity:
            evict = self._order.pop(0)
            del self._slot_of[evict]
        slot = next(
            i for i in range(self.capacity)
            if i not in self._slot_of.values()
        )
        sampler = image.interpolator
        vol = self._pad_to_shape(sampler.scaled_volume)
        self._volumes = self._volumes.at[slot].set(vol)
        if self.pack_volumes:
            import jax
            import jax.numpy as jnp

            from multiplanarunet_tpu.ops.interp import pack_corners

            packed_vol = pack_corners(jnp.asarray(vol)).reshape(-1)
            self._packed = jax.lax.dynamic_update_slice(
                self._packed, packed_vol,
                (slot * packed_vol.shape[0],))
        if self.with_labels and sampler.labels is not None:
            lab = self._pad_to_shape(
                sampler.labels[..., None].astype(np.float32)
            )
            self._labels = self._labels.at[slot].set(lab)
        self.origins[slot] = sampler.origin
        self.spacings[slot] = sampler.spacing
        self.rots[slot] = (np.eye(3, dtype=np.float32)
                           if sampler.rot_mat is None
                           else np.asarray(sampler.rot_mat, np.float32))
        self.fills[slot] = sampler.scaled_bg_value
        self.bg_classes[slot] = float(image.bg_class)
        self.valid_shapes[slot] = sampler.valid_shape
        self._slot_of[key] = slot
        self._order.append(key)
        return slot

    def release(self, identifier):
        with self._lock:
            if identifier in self._slot_of:
                del self._slot_of[identifier]
                self._order.remove(identifier)

    @property
    def volumes(self):
        return self._volumes

    @property
    def packed(self):
        """FLAT corner-packed volumes ((N * X*Y*Z * 8 * C,)) or None."""
        return self._packed

    @property
    def grid_shape(self):
        """(X, Y, Z, C) of one pool slot — static arg of the packed
        gather kernels."""
        return self.shape + (self.n_channels,)

    @property
    def labels(self):
        return self._labels

    def params_for(self, slots):
        """Per-sample parameter arrays for a list/array of slot indices."""
        slots = np.asarray(slots, np.int32)
        return dict(
            slots=slots,
            origins=self.origins[slots],
            spacings=self.spacings[slots],
            rots=self.rots[slots],
            fills=self.fills[slots],
            bg_classes=self.bg_classes[slots],
            valid_shapes=self.valid_shapes[slots],
        )
