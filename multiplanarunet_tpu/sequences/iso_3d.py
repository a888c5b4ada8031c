"""Isotropic scanner-space 3D box sampler (iso_live_3d).

Parity target: `mpunet/sequences/isotrophic_live_view_sequence_3d.py` —
training batches of randomly placed (optionally slightly rotated) isotropic
boxes with the same fg-quota rules as the 2D sampler, plus the inference
generators: deterministic base-tile coverage of scanner space and extra
random boxes. Box extraction is the fused `sample_box` gather on the staged
volume."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from multiplanarunet_tpu.ops import geometry
from multiplanarunet_tpu.ops.interp import sample_box, sample_box_batch_pool
from multiplanarunet_tpu.sequences.multi_planar import (
    MAX_TRIES,
    IsotrophicLiveViewSequence,
)


@partial(jax.jit, static_argnames=("box_dim", "n_classes"))
def _pool_candidate_boxes(label_pool, slots, origins, spacings, rots,
                          corners, box_rots, real_box_dim, box_dim,
                          bg_classes, n_classes, valid_shapes):
    labs = sample_box_batch_pool(
        label_pool, slots, origins, spacings, rots, corners, box_rots,
        real_box_dim, box_dim, bg_classes[:, None], method="nearest",
        valid_shapes=valid_shapes,
    )[..., 0].astype(jnp.int32)
    onehot = jax.nn.one_hot(labs, n_classes, dtype=jnp.bool_)
    return labs, jnp.any(onehot, axis=(1, 2, 3))


@partial(jax.jit, static_argnames=("box_dim", "n_classes"))
def _candidate_label_boxes(labels_vol, origin, spacing, rot, corners,
                           box_rots, real_box_dim, box_dim, bg_class,
                           n_classes, valid_shape):
    def one(corner, box_rot):
        return sample_box(
            labels_vol, origin, spacing, rot, corner, real_box_dim, box_rot,
            box_dim, bg_class, method="nearest", valid_shape=valid_shape,
        )[..., 0].astype(jnp.int32)

    labs = jax.vmap(one)(corners, box_rots)  # (K, d, d, d)
    onehot = jax.nn.one_hot(labs, n_classes, dtype=jnp.bool_)
    presence = jnp.any(onehot, axis=(1, 2, 3))
    return labs, presence


class IsotrophicLiveViewSequence3D(IsotrophicLiveViewSequence):
    def __init__(self, image_pair_queue, real_box_dim, no_log=False, **kwargs):
        super().__init__(image_pair_queue, **kwargs)
        self.real_box_dim = float(real_box_dim)
        self.batch_shape = (self.batch_size,) + (self.sample_dim,) * 3 + (
            self.n_classes,)
        if not no_log:
            self.log()

    def log(self):
        self.logger(f"\nIs validation:      {self.is_validation}")
        self.logger(f"Real box dim:       {self.real_box_dim}")
        self.logger(f"Sample dim:         {self.sample_dim}")
        self.logger(f"Batch size:         {self.batch_size}")
        self.logger(f"N fg boxes:         {self.n_fg_slices}")
        self.logger(f"Noise SD:           {self.noise_sd}")

    # ------------------------------------------------------------- training
    def _draw_candidates(self, image):
        corners = np.stack([
            geometry.random_box_placement(image.real_shape, self.real_box_dim)
            for _ in range(MAX_TRIES)
        ]).astype(np.float32)
        if self.noise_sd:
            rots = np.stack([
                geometry.random_box_rotation(self.noise_sd)
                for _ in range(MAX_TRIES)
            ]).astype(np.float32)
        else:
            rots = np.broadcast_to(np.eye(3, dtype=np.float32),
                                   (MAX_TRIES, 3, 3)).copy()
        return corners, rots

    def _sample_box_from(self, image, has_fg_vec, has_fg_count, cur_bs):
        sampler = image.interpolator
        corners, rots = self._draw_candidates(image)
        labs, presence = _candidate_label_boxes(
            sampler.device_labels(),
            jnp.asarray(sampler.origin), jnp.asarray(sampler.spacing),
            sampler.device_rot(), jnp.asarray(corners), jnp.asarray(rots),
            self.real_box_dim, self.sample_dim, float(image.bg_class),
            self.n_classes, jnp.asarray(sampler.valid_shape),
        )
        j, has_fg_vec, has_fg_count = self.select_candidate(
            np.asarray(presence), has_fg_vec, has_fg_count, cur_bs
        )
        im = sample_box(
            sampler.device_volume(),
            jnp.asarray(sampler.origin), jnp.asarray(sampler.spacing),
            sampler.device_rot(), jnp.asarray(corners[j]), self.real_box_dim,
            jnp.asarray(rots[j]), self.sample_dim,
            jnp.asarray(sampler.scaled_bg_value),
            valid_shape=jnp.asarray(sampler.valid_shape),
        )
        return im, labs[j], has_fg_vec, has_fg_count

    def _getitem_pooled(self, idx):
        from multiplanarunet_tpu.sequences.multi_planar import (
            IsotrophicLiveViewSequence2D,
        )

        pool = IsotrophicLiveViewSequence2D._get_pool(self)
        B, K = self.batch_size, MAX_TRIES
        slots, weights = [], []
        draws_corners = np.empty((B * K, 3), np.float32)
        draws_rots = np.empty((B * K, 3, 3), np.float32)
        for b in range(B):
            with self.image_pair_queue.get_random_image() as image:
                slots.append(pool.ensure(image))
                weights.append(image.sample_weight)
                c, r = self._draw_candidates(image)
                draws_corners[b * K:(b + 1) * K] = c
                draws_rots[b * K:(b + 1) * K] = r
        rep_slots = np.repeat(np.asarray(slots, np.int32), K)
        params = pool.params_for(rep_slots)

        labs, presence = _pool_candidate_boxes(
            pool.labels, jnp.asarray(rep_slots),
            jnp.asarray(params["origins"]), jnp.asarray(params["spacings"]),
            jnp.asarray(params["rots"]), jnp.asarray(draws_corners),
            jnp.asarray(draws_rots), self.real_box_dim, self.sample_dim,
            jnp.asarray(params["bg_classes"]), self.n_classes,
            jnp.asarray(params["valid_shapes"]),
        )
        presence_np = np.asarray(presence).reshape(B, K, self.n_classes)
        has_fg_count = 0
        has_fg_vec = np.zeros(len(self.fg_classes), bool)
        chosen = np.empty(B, np.int64)
        for b in range(B):
            j, has_fg_vec, has_fg_count = self.select_candidate(
                presence_np[b], has_fg_vec, has_fg_count, b
            )
            chosen[b] = b * K + j

        chosen_params = pool.params_for(rep_slots[chosen])
        batch_x = sample_box_batch_pool(
            pool.volumes, jnp.asarray(rep_slots[chosen]),
            jnp.asarray(chosen_params["origins"]),
            jnp.asarray(chosen_params["spacings"]),
            jnp.asarray(chosen_params["rots"]),
            jnp.asarray(draws_corners[chosen]),
            jnp.asarray(draws_rots[chosen]),
            self.real_box_dim, self.sample_dim,
            jnp.asarray(chosen_params["fills"]),
            valid_shapes=jnp.asarray(chosen_params["valid_shapes"]),
        )
        batch_y = labs[jnp.asarray(chosen)]
        batch_w = np.asarray(weights, np.float32)
        batch_x, batch_y, batch_w = self.augment(
            batch_x, batch_y, batch_w, chosen_params["fills"]
        )
        return self.prepare_batches(batch_x, batch_y, batch_w)

    def __getitem__(self, idx):
        self.seed()
        if getattr(self, "use_pool", True) and not getattr(
                self.image_pair_queue.dataset, "predict_mode", False):
            try:
                return self._getitem_pooled(idx)
            except Exception:
                if getattr(self, "_pool_failed", False):
                    raise
                self._pool_failed = True
                self.logger.warn(
                    "Pooled 3D batch sampling failed; falling back to the "
                    "per-image path."
                )
                self.use_pool = False
        has_fg_count = 0
        has_fg_vec = np.zeros(len(self.fg_classes), bool)
        xs, ys, ws, bgs = [], [], [], []
        for _ in range(self.batch_size):
            with self.image_pair_queue.get_random_image() as image:
                im, lab, has_fg_vec, has_fg_count = self._sample_box_from(
                    image, has_fg_vec, has_fg_count, len(ys)
                )
                xs.append(im)
                ys.append(lab)
                ws.append(image.sample_weight)
                bgs.append(np.asarray(image.interpolator.scaled_bg_value))
        batch_x = jnp.stack(xs)
        batch_y = jnp.stack(ys)
        batch_w = np.asarray(ws, np.float32)
        batch_x, batch_y, batch_w = self.augment(
            batch_x, batch_y, batch_w, np.stack(bgs)
        )
        return self.prepare_batches(batch_x, batch_y, batch_w)

    # ------------------------------------------------------------ inference
    def base_placements(self, image):
        """Corners of the minimal box tiling of the image's scanner space."""
        real_dims = np.asarray(image.real_shape, np.float64)
        sample_space = np.maximum(real_dims, self.real_box_dim)
        d = sample_space - self.real_box_dim
        n_per_axis = np.ceil(sample_space / self.real_box_dim).astype(int)
        axes = [
            np.linspace(0, d[i], n_per_axis[i]) - sample_space[i] / 2
            for i in range(3)
        ]
        mesh = np.meshgrid(*axes, indexing="ij")
        return np.stack([m.ravel() for m in mesh], axis=1).astype(np.float32)

    def _extract_box(self, image, corner, rot, return_y):
        sampler = image.interpolator
        im = sample_box(
            sampler.device_volume(),
            jnp.asarray(sampler.origin), jnp.asarray(sampler.spacing),
            sampler.device_rot(), jnp.asarray(corner), self.real_box_dim,
            jnp.asarray(rot), self.sample_dim,
            jnp.asarray(sampler.scaled_bg_value),
            valid_shape=jnp.asarray(sampler.valid_shape),
        )
        lab = None
        if return_y and not image.predict_mode:
            lab = sample_box(
                sampler.device_labels(),
                jnp.asarray(sampler.origin), jnp.asarray(sampler.spacing),
                sampler.device_rot(), jnp.asarray(corner), self.real_box_dim,
                jnp.asarray(rot), self.sample_dim,
                jnp.asarray(float(image.bg_class)), method="nearest",
                valid_shape=jnp.asarray(sampler.valid_shape),
            )[..., 0].astype(jnp.int32)
        return im, lab

    def get_base_patches_from(self, image, return_y=False):
        """Yield (im, [lab,] corner, axes, inv_rot, total) over base tiles."""
        placements = self.base_placements(image)
        total = len(placements)
        eye = np.eye(3, dtype=np.float32)
        for corner in placements:
            im, lab = self._extract_box(image, corner, eye, return_y)
            axes = tuple(
                np.linspace(corner[i], corner[i] + self.real_box_dim,
                            self.sample_dim).astype(np.float32)
                for i in range(3)
            )
            if return_y:
                yield im, lab, corner, axes, eye, total
            else:
                yield im, corner, axes, eye, total

    def get_N_random_patches_from(self, image, N, return_y=False):
        for _ in range(int(N)):
            corner = geometry.random_box_placement(
                image.real_shape, self.real_box_dim
            ).astype(np.float32)
            if self.noise_sd:
                rot = geometry.random_box_rotation(self.noise_sd).astype(np.float32)
            else:
                rot = np.eye(3, dtype=np.float32)
            im, lab = self._extract_box(image, corner, rot, return_y)
            axes = tuple(
                np.linspace(corner[i], corner[i] + self.real_box_dim,
                            self.sample_dim).astype(np.float32)
                for i in range(3)
            )
            inv_rot = np.linalg.inv(rot.astype(np.float64)).astype(np.float32)
            if return_y:
                yield im, lab, corner, axes, inv_rot
            else:
                yield im, corner, axes, inv_rot
