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

    def _dispatch_box_candidates(self, labels_ref, slot_arr, params,
                                 corners, rots):
        """Dispatch one candidate-box kernel (ASYNC — device arrays out,
        no host sync)."""
        return _pool_candidate_boxes(
            labels_ref, jnp.asarray(slot_arr),
            jnp.asarray(params["origins"]), jnp.asarray(params["spacings"]),
            jnp.asarray(params["rots"]), jnp.asarray(corners),
            jnp.asarray(rots), self.real_box_dim, self.sample_dim,
            jnp.asarray(params["bg_classes"]), self.n_classes,
            jnp.asarray(params["valid_shapes"]),
        )

    def _start_pooled_batch(self):
        """Draw one batch's randomness, stage its images and DISPATCH its
        depth-0 candidate kernel, without any host sync (mirror of the 2D
        plane sampler's start; candidate corners are image-dependent so the
        draws happen inside the per-image loop)."""
        from multiplanarunet_tpu.sequences.multi_planar import (
            IsotrophicLiveViewSequence2D,
        )

        # box extraction has no packed-gather path: never pay 8x HBM
        self._pool_pack = False
        pool = IsotrophicLiveViewSequence2D._get_pool(self)
        B, K = self.batch_size, MAX_TRIES
        slots, weights = [], []
        corners = np.empty((B, K, 3), np.float32)
        rots = np.empty((B, K, 3, 3), np.float32)
        for b in range(B):
            with self.image_pair_queue.get_random_image() as image:
                slots.append(pool.ensure(image))
                weights.append(image.sample_weight)
                c, r = self._draw_candidates(image)
                corners[b], rots[b] = c, r
        slots = np.asarray(slots, np.int32)
        params = pool.params_for(slots)
        labs0, pres0 = self._dispatch_box_candidates(
            pool.labels, slots, params, corners[:, 0], rots[:, 0])
        return dict(volumes=pool.volumes, labels=pool.labels, slots=slots,
                    params=params, weights=weights, corners=corners,
                    rots=rots, labs0=labs0, pres0=pres0, B=B, K=K)

    def _finish_pooled_batch(self, st):
        """Two-phase candidate fetch, exactly like the 2D sampler
        (`multi_planar.py:_finish_pooled_batch`): only rows whose FIRST
        candidate misses the fg bar can ever be rejected by
        `_accepts_candidate`, so candidates 1..K-1 are sampled only for
        those rows — cutting the (B*K, d^3) label gather to ~(B, d^3) in
        the common case; the depth-0 presence fetch was dispatched one
        batch ago (lookahead in the shared `_getitem_pooled`)."""
        B, K = st["B"], st["K"]
        slots, params = st["slots"], st["params"]
        corners, rots, labs0 = st["corners"], st["rots"], st["labs0"]
        pres0 = np.asarray(st["pres0"])
        fg = pres0[:, self.fg_classes]
        maybe_rejected = ~fg.all(1) if self.force_all_fg else ~fg.any(1)
        S = np.nonzero(maybe_rejected)[0]
        labs_rest = None
        pres_rest = np.zeros((0, K - 1, self.n_classes), bool)
        s_pos = np.full(B, -1, np.int64)
        if len(S) and K > 1:
            # pad the row count to a power of two: bounded compile shapes
            pad = 1 << int(np.ceil(np.log2(len(S))))
            S_pad = np.concatenate([S, np.repeat(S[:1], pad - len(S))])
            rep = np.repeat(S_pad, K - 1)
            rep_params = {k: v[rep] for k, v in params.items()}
            labs_rest, pres_rest = self._dispatch_box_candidates(
                st["labels"], slots[rep], rep_params,
                corners[S_pad, 1:].reshape(-1, 3),
                rots[S_pad, 1:].reshape(-1, 3, 3))
            pres_rest = np.asarray(pres_rest).reshape(pad, K - 1,
                                                      self.n_classes)
            s_pos[S] = np.arange(len(S))

        # Sequential accept/retry over the batch (reference statistics)
        has_fg_count = 0
        has_fg_vec = np.zeros(len(self.fg_classes), bool)
        chosen_t = np.empty(B, np.int64)
        for b in range(B):
            if s_pos[b] < 0:
                accept, has_fg_vec, fg_change = self._accepts_candidate(
                    pres0[b], 1, K == 1, has_fg_vec, has_fg_count, b)
                assert accept  # by construction of `maybe_rejected`
                has_fg_count += fg_change
                chosen_t[b] = 0
            else:
                presence_b = np.concatenate(
                    [pres0[b:b + 1], pres_rest[s_pos[b]]])
                j, has_fg_vec, has_fg_count = self.select_candidate(
                    presence_b, has_fg_vec, has_fg_count, b)
                chosen_t[b] = j

        chosen_corners = corners[np.arange(B), chosen_t]
        chosen_rots = rots[np.arange(B), chosen_t]
        if labs_rest is None:
            sel_idx = np.arange(B)
        else:
            from0 = chosen_t == 0
            sel_idx = np.where(
                from0, np.arange(B),
                len(labs0) + s_pos * (K - 1) + (chosen_t - 1))
        batch_x = sample_box_batch_pool(
            st["volumes"], jnp.asarray(slots),
            jnp.asarray(params["origins"]),
            jnp.asarray(params["spacings"]),
            jnp.asarray(params["rots"]),
            jnp.asarray(chosen_corners), jnp.asarray(chosen_rots),
            self.real_box_dim, self.sample_dim,
            jnp.asarray(params["fills"]),
            valid_shapes=jnp.asarray(params["valid_shapes"]),
        )
        batch_y = jnp.concatenate(
            [labs0] + ([labs_rest] if labs_rest is not None else []), 0
        )[jnp.asarray(sel_idx)]
        batch_w = np.asarray(st["weights"], np.float32)
        batch_x, batch_y, batch_w = self.augment(
            batch_x, batch_y, batch_w, params["fills"]
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
