"""Per-image sampling facade: host fallback + device staging.

This replaces the reference's `ViewInterpolator` (`mpunet/interpolation/
view_interpolator.py`): one object per loaded image that can answer
image/label interpolation queries in centered scanner space. Two paths:

  * **Device path (production)**: `device_volume()` / `device_labels()` stage
    the (scaled) volume to HBM once per image residency; samplers in
    `multiplanarunet_tpu.ops.interp` then extract planes/boxes with fused
    gathers. Scaling is folded into the staged volume (affine scaling commutes
    with linear interpolation), so per-slice normalization costs nothing.
  * **Host path (tests / small CPU work)**: `intrp_image` / `intrp_labels`
    reproduce the reference's numpy semantics on the RAW volume (scaling
    applied later by the caller, matching
    `mpunet/sequences/isotrophic_live_view_sequence.py:141-142`).

Non-axis-aligned affines are handled as in the reference: queries are rotated
by ``diag(pixdims) @ inv(basis)`` onto the centered axis-aligned grid
(`view_interpolator.py:54-60`). Axis flips (negative affine diagonal) fold
into the same rotation instead of being rejected.
"""

from __future__ import annotations

import numpy as np

from multiplanarunet_tpu.ops import geometry
from multiplanarunet_tpu.ops.interp import grid_gather_np


class VolumeSampler:
    def __init__(self, image, labels, affine, bg_value=0.0, bg_class=0,
                 scaler=None):
        if image.ndim != 4:
            raise ValueError(
                f"Image must be rank-4 (X,Y,Z,C); got shape {image.shape}. "
                f"Use np.expand_dims(img, -1) for single-channel volumes."
            )
        self.image = image
        self.labels = labels
        self.affine = np.asarray(affine)
        self.n_channels = image.shape[-1]
        self.bg_class = int(bg_class)
        self.scaler = scaler

        if not isinstance(bg_value, (list, tuple, np.ndarray)):
            bg_value = [bg_value] * self.n_channels
        if len(bg_value) != self.n_channels:
            raise ValueError(
                f"bg_value must have one entry per channel "
                f"({self.n_channels}), got {bg_value}"
            )
        self.bg_value = list(bg_value)

        origin, spacing, rot = geometry.voxel_axes_origin_spacing(
            image.shape, self.affine
        )
        self.origin = origin
        self.spacing = spacing
        self.rot_mat = rot  # None when affine is axis-aligned

        self._device_volume = None
        self._device_volume_packed = None
        self._device_volume_packed_key = None
        self._device_volume_unpacked = None
        self._device_volume_unpacked_key = None
        self._device_labels = None
        self._scaled_cache = None

    # ------------------------------------------------------------- host path
    def apply_rotation(self, mgrid):
        """Rotate a (3, ...) stacked query mesh onto the aligned grid."""
        if self.rot_mat is None:
            return mgrid
        mgrid = np.asarray(mgrid)
        pts = geometry.mgrid_to_points(mgrid)
        return geometry.points_to_mgrid(
            pts @ np.asarray(self.rot_mat, np.float32).T, mgrid.shape[1:]
        )

    def _points_from_mgrid(self, mgrid, apply_rot):
        mgrid = np.asarray(mgrid)
        if apply_rot:
            mgrid = self.apply_rotation(mgrid)
        return np.moveaxis(mgrid, 0, -1)  # (..., 3)

    def intrp_image(self, mgrid, apply_rot=True):
        """Linear-interpolate the RAW image at a (3, ...) query mesh."""
        pts = self._points_from_mgrid(mgrid, apply_rot)
        out = grid_gather_np(
            self.image, self.origin, self.spacing, pts,
            method="linear", fill=np.asarray(self.bg_value, np.float32),
        )
        return np.squeeze(out, axis=tuple(
            i for i, s in enumerate(out.shape[:-1]) if s == 1
        )) if 1 in out.shape[:-1] else out

    def intrp_labels(self, mgrid, apply_rot=True):
        """Nearest-interpolate labels; None if the image has no labels."""
        if self.labels is None:
            return None
        pts = self._points_from_mgrid(mgrid, apply_rot)
        lab = grid_gather_np(
            self.labels[..., None].astype(np.float32), self.origin,
            self.spacing, pts, method="nearest", fill=float(self.bg_class),
        )[..., 0]
        if 1 in lab.shape:
            lab = np.squeeze(lab, axis=tuple(
                i for i, s in enumerate(lab.shape) if s == 1
            ))
        return self._cast_labels(lab)

    def __call__(self, mgrid):
        mgrid = self.apply_rotation(np.asarray(mgrid))
        return (self.intrp_image(mgrid, apply_rot=False),
                self.intrp_labels(mgrid, apply_rot=False))

    @staticmethod
    def _cast_labels(lab):
        info = np.iinfo(np.uint8)
        if np.all((lab >= info.min) & (lab <= info.max)):
            return lab.astype(np.uint8)
        return lab.astype(np.uint16)

    # ----------------------------------------------------------- device path
    @property
    def scaled_volume(self):
        """Raw volume with the per-channel scaler applied (numpy, cached)."""
        if self._scaled_cache is None:
            if self.scaler is not None:
                self._scaled_cache = np.ascontiguousarray(
                    self.scaler.transform(self.image), dtype=np.float32
                )
            else:
                self._scaled_cache = np.ascontiguousarray(
                    self.image, dtype=np.float32
                )
        return self._scaled_cache

    @property
    def scaled_bg_value(self):
        """bg fill in scaled units: transform([bg_value]) per channel."""
        if self.scaler is None:
            return np.asarray(self.bg_value, np.float32)
        bg = np.asarray(self.bg_value, np.float32).reshape(1, 1, 1, -1)
        return self.scaler.transform(bg).reshape(-1).astype(np.float32)

    @staticmethod
    def _bucket_pad(arr, bucket):
        """Zero-pad spatial dims up to multiples of `bucket` (at the high
        end). Padding is never sampled — gathers receive the true extent via
        `valid_shape` — but makes every volume of a similar size share one
        compiled kernel instead of one per subject shape."""
        if not bucket:
            return arr
        pads = []
        for n in arr.shape[:3]:
            target = max(bucket, -(-n // bucket) * bucket)
            pads.append((0, target - n))
        pads.append((0, 0))
        if all(p == (0, 0) for p in pads):
            return arr
        return np.pad(arr, pads, mode="constant")

    @property
    def valid_shape(self):
        """True spatial extent (3,) int32 — pass to gathers as valid_shape."""
        return np.asarray(self.image.shape[:3], np.int32)

    def device_volume(self, dtype=None, bucket=32):
        """The scaled volume staged to the default device (cached, padded)."""
        import jax.numpy as jnp

        if self._device_volume is None:
            vol = self._bucket_pad(self.scaled_volume, bucket)
            self._device_volume = jnp.asarray(
                vol if dtype is None else vol.astype(dtype)
            )
        return self._device_volume

    def _quantized_codes(self, bucket):
        """Per-channel affine uint8 quantization of the scaled volume, padded
        to the bucket with each channel's code for 0.0 (matching the zero
        constant-pad of the float staging paths).

        Returns (codes uint8 (X,Y,Z,C), step (C,) f32, vmin (C,) f32) with
        dequantization v = codes * step + vmin; max abs error is step/2 =
        (per-channel range)/510 — below bf16 rounding for values near the
        range top and ~0.2% of range elsewhere."""
        vol = self.scaled_volume
        vmin = vol.min(axis=(0, 1, 2)).astype(np.float32)
        vmax = vol.max(axis=(0, 1, 2)).astype(np.float32)
        step = np.maximum((vmax - vmin) / 255.0, np.float32(1e-12))
        q = np.clip(np.rint((vol - vmin) / step), 0, 255).astype(np.uint8)
        target = [max(bucket, -(-n // bucket) * bucket) if bucket else n
                  for n in vol.shape[:3]]
        if tuple(target) != vol.shape[:3]:
            q0 = np.clip(np.rint((0.0 - vmin) / step), 0, 255) \
                .astype(np.uint8)
            full = np.empty(tuple(target) + (vol.shape[3],), np.uint8)
            full[...] = q0  # broadcast per-channel zero code
            full[: q.shape[0], : q.shape[1], : q.shape[2]] = q
            q = full
        return q, step, vmin

    def _stage_quantized(self, bucket):
        """Ship the uint8 codes (1/2 the bytes of bf16, 1/4 of f32 — the
        remote H2D tunnel is the cohort-pipeline bottleneck) and dequantize
        to bfloat16 on device in one tiny jitted kernel."""
        import jax
        import jax.numpy as jnp

        q, step, vmin = self._quantized_codes(bucket)

        @jax.jit
        def _dequant(codes, s, m):
            return (codes.astype(jnp.float32) * s + m).astype(jnp.bfloat16)

        return _dequant(jnp.asarray(q), jnp.asarray(step), jnp.asarray(vmin))

    def device_volume_packed(self, bucket=32, dtype="bfloat16",
                             quantize=False):
        """Corner-packed scaled volume (X, Y, Z, 8, C) for the single-gather
        trilinear path (see ops.interp.pack_corners). Cached. Stored bfloat16
        by default (intensities are normalized; the trilinear blend runs in
        float32), halving the 8x packing memory; pass dtype=None for float32.

        The host->device copy ships in the TARGET dtype (bf16 halves the
        transfer — significant on remote-device transports) and the 8x corner
        packing expands on device. quantize=True ships per-channel affine
        uint8 codes instead (half again) and dequantizes on device."""
        stage_key = (int(bucket or 0), dtype, bool(quantize))
        if (self._device_volume_packed is None
                or self._device_volume_packed_key != stage_key):
            import jax.numpy as jnp

            from multiplanarunet_tpu.ops.interp import pack_corners

            if quantize and dtype == "bfloat16":
                vol = self._stage_quantized(bucket)
            elif dtype is not None and self._device_volume is None:
                np_dtype = jnp.bfloat16 if dtype == "bfloat16" else dtype
                vol = jnp.asarray(
                    self._bucket_pad(self.scaled_volume, bucket)
                    .astype(np_dtype)
                )
            else:
                vol = self.device_volume(bucket=bucket)
                if dtype is not None:
                    vol = vol.astype(
                        jnp.bfloat16 if dtype == "bfloat16" else dtype
                    )
            self._device_volume_packed = pack_corners(vol)
            self._device_volume_packed_key = stage_key
        return self._device_volume_packed

    def device_volume_unpacked(self, bucket=32, dtype="bfloat16",
                               quantize=False):
        """Plain (X, Y, Z, C) scaled volume for the shear resampler, shipped
        in bf16 (half the transfer of f32, 1/8 the HBM of the corner-packed
        form; the shear passes blend in float32). Cached separately from
        `device_volume` (whose float32 cache the training path relies on).
        quantize=True ships uint8 codes + on-device dequant (see
        `_stage_quantized`) — same bf16 result dtype, half the transfer."""
        stage_key = (int(bucket or 0), dtype, bool(quantize))
        if (self._device_volume_unpacked is None
                or self._device_volume_unpacked_key != stage_key):
            import jax.numpy as jnp

            if quantize and dtype == "bfloat16":
                self._device_volume_unpacked = self._stage_quantized(bucket)
            else:
                np_dtype = jnp.bfloat16 if dtype == "bfloat16" else dtype
                vol = self._bucket_pad(self.scaled_volume, bucket)
                if dtype is not None:
                    vol = vol.astype(np_dtype)
                self._device_volume_unpacked = jnp.asarray(vol)
            self._device_volume_unpacked_key = stage_key
        return self._device_volume_unpacked

    def padded_shape(self, bucket=32):
        """Spatial shape after `_bucket_pad` — without staging anything."""
        if not bucket:
            return tuple(int(s) for s in self.image.shape[:3])
        return tuple(
            max(bucket, -(-int(n) // bucket) * bucket)
            for n in self.image.shape[:3]
        )

    def device_labels(self, bucket=32):
        """Labels as (X, Y, Z, 1) float32 on device (nearest-gather source)."""
        import jax.numpy as jnp

        if self.labels is None:
            return None
        if self._device_labels is None:
            lab = self._bucket_pad(
                self.labels[..., None].astype(np.float32), bucket
            )
            self._device_labels = jnp.asarray(lab)
        return self._device_labels

    def device_rot(self):
        import jax.numpy as jnp

        if self.rot_mat is None:
            return jnp.eye(3, dtype=jnp.float32)
        return jnp.asarray(self.rot_mat, dtype=jnp.float32)

    def unload_device(self):
        self._device_volume = None
        self._device_volume_packed = None
        self._device_volume_packed_key = None
        self._device_volume_unpacked = None
        self._device_volume_unpacked_key = None
        self._device_labels = None
        self._scaled_cache = None
