"""Multi-planar batch samplers (iso_live): training slices + inference stacks.

Behavioral parity target: `mpunet/sequences/isotrophic_live_view_sequence.py`
and `..._2d.py`. The reference's hot loop samples one slice at a time on the
host (scipy interpolation under threads) with up to 10 resampling tries to
satisfy the foreground quota. Here the same statistics come from an
**oversample-and-select** design that keeps the heavy work on device:

  for each batch element:
    1. draw K=10 candidate (view, offset, noise) tuples on host (tiny math),
    2. ONE fused gather kernel nearest-samples all K candidate label slices
       and reduces them to per-candidate class-presence bitmasks on device,
    3. the reference's accept/retry rules run on the K presence rows
       (equivalent to its sequential max-10-tries loop),
    4. ONE gather kernel linear-samples the chosen image slice from the
       scaled volume already resident in HBM.

Per-slice normalization costs nothing (volumes are staged pre-scaled — affine
scaling commutes with linear interpolation), and augmentation happens later
on the whole batch on device."""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from multiplanarunet_tpu.logging import ScreenLogger
from multiplanarunet_tpu.ops import geometry
from multiplanarunet_tpu.ops.interp import (
    grid_gather_pool,
    plane_points,
    sample_plane,
    sample_plane_batch,
    sample_plane_batch_pool,
    sample_plane_batch_pool_packed,
    sample_plane_stack,
)
from multiplanarunet_tpu.sequences.base_sequence import BaseSequence

MAX_TRIES = 10  # candidate count; mirrors the reference's retry budget


@partial(jax.jit, static_argnames=("span", "dim", "n_classes"))
def _pool_candidate_labels(label_pool, slots, origins, spacings, rots, bases,
                           offsets, span, dim, bg_classes, n_classes,
                           valid_shapes):
    """Nearest-gather ALL candidate label slices of a batch (B*K samples
    across different pool slots) in one kernel; returns (labs (BK, d, d)
    int32 on device, presence (BK, n_classes) bool)."""
    labs = sample_plane_batch_pool(
        label_pool, slots, origins, spacings, rots, bases, offsets, span,
        dim, bg_classes[:, None], method="nearest",
        valid_shapes=valid_shapes,
    )[..., 0].astype(jnp.int32)
    onehot = jax.nn.one_hot(labs, n_classes, dtype=jnp.bool_)
    return labs, jnp.any(onehot, axis=(1, 2))


@partial(jax.jit, static_argnames=("span", "dim", "crop", "flatten_y",
                                   "with_elastic", "packed"))
def _finish_batch_fused(volumes, slots, origins, spacings, rots, bases,
                        offsets, fills, valid_shapes, labs0, labs_rest,
                        sel_idx, key, alphas, sigmas, apply_mask, bg,
                        span, dim, crop, flatten_y, with_elastic,
                        packed=None):
    """The whole batch-finish device pipeline as ONE jitted program: image
    plane gather + chosen-label select + (optional) elastic deformation +
    label crop/reshape. The nested jitted kernels trace inline (the
    megagraph pattern of `MultiViewPredictor`), so a high-latency dispatch
    transport pays ONE program launch where the sequential path paid ~5
    (gather, eager concat, eager index, elastic, eager reshape).

    `packed` is None (unpacked pool) or the static (X, Y, Z, C) grid
    shape of a FLAT corner-packed pool (`DeviceVolumePool.pack_volumes`):
    the trilinear image extraction is then ONE gather instead of eight."""
    if packed:
        X = sample_plane_batch_pool_packed(
            volumes, packed, slots, origins, spacings, rots, bases,
            offsets, span, dim, fills, valid_shapes=valid_shapes,
        )
    else:
        X = sample_plane_batch_pool(
            volumes, slots, origins, spacings, rots, bases, offsets, span,
            dim, fills, valid_shapes=valid_shapes,
        )
    y = jnp.concatenate([labs0, labs_rest], 0)[sel_idx]
    if with_elastic:
        from multiplanarunet_tpu.ops.elastic import elastic_deform_2d_batch

        X, y = elastic_deform_2d_batch(
            key, X, y.astype(jnp.float32), alphas, sigmas, apply_mask, bg)
    (l0, h0), (l1, h1) = crop
    if l0 or h0 or l1 or h1:
        y = y[:, l0:y.shape[1] - h0, l1:y.shape[2] - h1]
    if flatten_y:
        y = y.reshape(y.shape[0], -1, 1)
    else:
        y = y[..., None]
    return X, y


def _walk_select(pres0, pres_rest, s_pos, fg_classes, n_fg_slices,
                 force_all_fg):
    """In-graph replica of `select_candidate` / `_accepts_candidate`: the
    sequential fg-quota walk over the batch as a lax.scan (carry = the
    running (has_fg_vec, has_fg_count)), the K-candidate retry loop
    unrolled in the body. Returns chosen candidate index per row.

    Moving the walk on device removes the sampler's LAST per-batch
    blocking host sync (the phase-2 presence fetch — a full round-trip on
    remote-dispatch transports); the depth-0 presence fetch that decides
    WHICH rows need phase 2 rides the batch lookahead and stays host-side.
    Bit-parity with the host walk is pinned by
    tests/test_sequences.py::test_fused_finish_matches_sequential and
    ::test_device_walk_matches_host_walk."""
    B = pres0.shape[0]
    K = pres_rest.shape[1] + 1
    fg_idx = jnp.asarray(np.asarray(fg_classes, np.int32))

    def row(carry, inp):
        vec, count = carry
        p0, spos, b = inp
        rest = pres_rest[jnp.maximum(spos, 0)]          # (K-1, n_classes)
        pres = jnp.concatenate([p0[None], rest], 0)     # (K, n_classes)
        cand = jnp.take(pres, fg_idx, axis=1)           # (K, F)
        slots_left = B - b
        accepted = jnp.zeros((), bool)
        chosen = jnp.full((), K - 1, jnp.int32)
        chosen_c = cand[K - 1]
        for t in range(K):
            c = cand[t]
            if force_all_fg and t < K - 1:
                new_mask = vec | c
                unfillable = jnp.logical_and(
                    ~jnp.all(new_mask),
                    jnp.sum(~new_mask) >= slots_left)
            else:
                unfillable = jnp.zeros((), bool)
            has_fg = jnp.any(c)
            quota_ok = (n_fg_slices - count) < slots_left
            accept = jnp.logical_or(
                jnp.logical_and(~unfillable,
                                jnp.logical_or(has_fg, quota_ok)),
                t == K - 1)
            take = jnp.logical_and(accept, ~accepted)
            chosen = jnp.where(take, jnp.int32(t), chosen)
            chosen_c = jnp.where(take, c, chosen_c)
            accepted = jnp.logical_or(accepted, accept)
        # The accepted candidate's classes extend the batch fg mask except
        # on a last-try accept (mirrors _accepts_candidate, which skips
        # the force block when is_last); count grows iff it carried fg.
        if force_all_fg:
            vec = jnp.where(chosen != K - 1, vec | chosen_c, vec)
        count = count + jnp.any(chosen_c).astype(jnp.int32)
        return (vec, count), chosen

    init = (jnp.zeros((len(fg_classes),), bool),
            jnp.zeros((), jnp.int32))
    _, chosen = jax.lax.scan(
        row, init, (pres0, jnp.asarray(s_pos, jnp.int32),
                    jnp.arange(B, dtype=jnp.int32)))
    return chosen


@partial(jax.jit, static_argnames=("span", "dim", "crop", "flatten_y",
                                   "with_elastic", "fg_classes",
                                   "n_fg_slices", "force_all_fg",
                                   "packed"))
def _finish_batch_fused_walk(volumes, slots, origins, spacings, rots,
                             bases_all, offsets_all, fills, valid_shapes,
                             labs0, labs_rest, pres0, pres_rest, s_pos,
                             key, alphas, sigmas, apply_mask, bg,
                             span, dim, crop, flatten_y, with_elastic,
                             fg_classes, n_fg_slices, force_all_fg,
                             packed=None):
    """Fused finish with the candidate walk IN-GRAPH: select -> image
    gather -> label select -> elastic -> prep as one program, consuming
    the phase-2 presence on device (no host fetch). `pres_rest` arrives
    flat ((pad*(K-1), n_classes) — or a (K-1, n_classes) dummy when no
    row entered phase 2) and is reshaped here, in-graph."""
    B = pres0.shape[0]
    K = bases_all.shape[1]
    pres_rest = pres_rest.reshape(-1, K - 1, pres0.shape[1])
    chosen = _walk_select(pres0, pres_rest, s_pos, fg_classes,
                          n_fg_slices, force_all_fg)
    bidx = jnp.arange(B)
    bases = bases_all[bidx, chosen]
    offsets = offsets_all[bidx, chosen]
    sel_idx = jnp.where(
        chosen == 0, bidx,
        B + jnp.maximum(jnp.asarray(s_pos, jnp.int32), 0) * (K - 1)
        + chosen - 1)
    return _finish_batch_fused(
        volumes, slots, origins, spacings, rots, bases, offsets, fills,
        valid_shapes, labs0, labs_rest, sel_idx, key, alphas, sigmas,
        apply_mask, bg, span, dim, crop, flatten_y, with_elastic,
        packed=packed)


@partial(jax.jit, static_argnames=("span", "dim", "crop", "flatten_y",
                                   "with_elastic", "fg_classes",
                                   "n_fg_slices", "force_all_fg",
                                   "packed"))
def _finish_batch_lazy_walk(volumes, labels, slots, origins, spacings, rots,
                            bases_all, offsets_all, fills, bg_classes,
                            valid_shapes, labs0, pres0, key, alphas, sigmas,
                            apply_mask, bg, span, dim, crop, flatten_y,
                            with_elastic, fg_classes, n_fg_slices,
                            force_all_fg, packed=None):
    """Fused finish with LAZY candidate gathers: the quota walk scans rows
    in batch order and gathers candidate t's label plane (one lax.cond'd
    nearest gather of d^2 points from the label pool) only when candidates
    0..t-1 were all rejected — the exact per-try cost of the reference's
    sequential retry loop (`mpunet/sequences/
    isotrophic_live_view_sequence_2d.py` get_N_random_slices_from), where
    the two-phase path gathers all K-1 deeper candidates up front for
    every possibly-rejected row. With force_all_fg on, "possibly
    rejected" is nearly every row (a first candidate only provably
    accepts when it contains EVERY fg class), so the up-front gather is
    the single largest sampler kernel on a hardware trace (16.8 ms/batch
    at B=16/d=128 vs a 83 ms train step); typical walks accept at
    candidate 0 or 1, so this path gathers ~B planes instead of B*(K-1).

    Accept-rule semantics are `_walk_select`'s (itself pinned to the host
    `select_candidate` oracle); end-to-end bit-parity with the sequential
    path is pinned by test_fused_finish_matches_sequential."""
    B, K = bases_all.shape[0], bases_all.shape[1]
    fg_idx = jnp.asarray(np.asarray(fg_classes, np.int32))

    def gather_plane(slot, origin, spacing, rot, basis, offset, bgc, valid):
        pts = plane_points(basis, offset, span, dim,
                           dtype=jnp.asarray(origin).dtype) @ rot.T
        labs = grid_gather_pool(labels, slot, origin, spacing, pts,
                                method="nearest", fill=bgc,
                                valid_shape=valid)[..., 0]
        return labs.astype(jnp.int32)

    def row(carry, inp):
        vec, count = carry
        (b, slot, origin, spacing, rot, bases, offsets, bgc, valid,
         labs0_row, pres0_row) = inp
        slots_left = B - b
        accepted = jnp.zeros((), bool)
        chosen = jnp.zeros((), jnp.int32)
        chosen_c = jnp.take(pres0_row, fg_idx)
        chosen_labs = labs0_row
        for t in range(K):
            if t == 0:
                labs_t = labs0_row
                c = jnp.take(pres0_row, fg_idx)
            else:
                labs_t = jax.lax.cond(
                    accepted,
                    lambda: jnp.zeros((dim, dim), jnp.int32),
                    lambda t=t: gather_plane(slot, origin, spacing, rot,
                                             bases[t], offsets[t], bgc,
                                             valid))
                c = jnp.any(labs_t[None] == fg_idx[:, None, None],
                            axis=(1, 2))
            if force_all_fg and t < K - 1:
                new_mask = vec | c
                unfillable = jnp.logical_and(
                    ~jnp.all(new_mask),
                    jnp.sum(~new_mask) >= slots_left)
            else:
                unfillable = jnp.zeros((), bool)
            has_fg = jnp.any(c)
            quota_ok = (n_fg_slices - count) < slots_left
            accept = jnp.logical_or(
                jnp.logical_and(~unfillable,
                                jnp.logical_or(has_fg, quota_ok)),
                t == K - 1)
            take = jnp.logical_and(accept, ~accepted)
            chosen = jnp.where(take, jnp.int32(t), chosen)
            chosen_c = jnp.where(take, c, chosen_c)
            chosen_labs = jnp.where(take, labs_t, chosen_labs)
            accepted = jnp.logical_or(accepted, accept)
        if force_all_fg:
            vec = jnp.where(chosen != K - 1, vec | chosen_c, vec)
        count = count + jnp.any(chosen_c).astype(jnp.int32)
        return (vec, count), (chosen, chosen_labs)

    init = (jnp.zeros((len(fg_classes),), bool), jnp.zeros((), jnp.int32))
    _, (chosen, labs_sel) = jax.lax.scan(
        row, init,
        (jnp.arange(B, dtype=jnp.int32), slots, origins, spacings, rots,
         bases_all, offsets_all, bg_classes, valid_shapes, labs0, pres0))
    bidx = jnp.arange(B)
    return _finish_batch_fused(
        volumes, slots, origins, spacings, rots, bases_all[bidx, chosen],
        offsets_all[bidx, chosen], fills, valid_shapes, labs_sel,
        jnp.zeros((0, dim, dim), jnp.int32), bidx, key, alphas, sigmas,
        apply_mask, bg, span, dim, crop, flatten_y, with_elastic,
        packed=packed)


def _blob_layout(n_channels, K):
    """Column map of the packed per-batch parameter blob: every per-sample
    host param of one training batch (slot, pool geometry, candidate plane
    bases/offsets, elastic-aug draw, key counter) as ONE (B, F) float32
    array, shipped in ONE host->device transfer. On the remote-dispatch
    tunnel each `jnp.asarray` of a numpy param is its own transfer RPC
    (~17/batch before packing) and host RPC time — not device time — is
    the training e2e bottleneck (VALIDATION 32's probe attribution)."""
    cols, off = {}, 0
    for name, width in (("slot", 1), ("origin", 3), ("spacing", 3),
                        ("rot", 9), ("fill", n_channels), ("bg_class", 1),
                        ("valid", 3), ("bases", 9 * K), ("offsets", K),
                        ("alpha", 1), ("sigma", 1), ("apply", 1),
                        ("count", 1)):
        cols[name] = (off, off + width)
        off += width
    return cols, off


def _split_blob(blob, n_channels, K):
    """In-graph inverse of the `_blob_layout` host packing (free slices
    under XLA). int-valued columns round-trip exactly through f32 (slots
    < pool capacity, shapes <= volume dims, counts < 2^24)."""
    cols, _ = _blob_layout(n_channels, K)
    g = lambda n: blob[:, cols[n][0]:cols[n][1]]  # noqa: E731
    return dict(
        slots=g("slot")[:, 0].astype(jnp.int32),
        origins=g("origin"),
        spacings=g("spacing"),
        rots=g("rot").reshape(-1, 3, 3),
        fills=g("fill"),
        bg_classes=g("bg_class")[:, 0],
        valid=g("valid").astype(jnp.int32),
        bases=g("bases").reshape(-1, K, 3, 3),
        offsets=g("offsets"),
        alphas=g("alpha")[:, 0],
        sigmas=g("sigma")[:, 0],
        apply=g("apply")[:, 0] > 0.5,
        count=blob[0, cols["count"][0]].astype(jnp.int32),
    )


@partial(jax.jit,
         static_argnames=("span", "dim", "n_classes", "n_channels", "K"))
def _pool_candidate_labels_blob(label_pool, blob, span, dim, n_classes,
                                n_channels, K):
    """`_pool_candidate_labels` for depth-0 candidates only, with all
    per-sample params sliced from the packed blob (one transfer)."""
    s = _split_blob(blob, n_channels, K)
    return _pool_candidate_labels(
        label_pool, s["slots"], s["origins"], s["spacings"], s["rots"],
        s["bases"][:, 0], s["offsets"][:, 0], span, dim, s["bg_classes"],
        n_classes, s["valid"])


@partial(jax.jit, static_argnames=("span", "dim", "crop", "flatten_y",
                                   "with_elastic", "fg_classes",
                                   "n_fg_slices", "force_all_fg",
                                   "n_channels", "K", "packed"))
def _finish_batch_lazy_blob(volumes, labels, blob, labs0, pres0, key0,
                            span, dim, crop, flatten_y, with_elastic,
                            fg_classes, n_fg_slices, force_all_fg,
                            n_channels, K, packed=None):
    """`_finish_batch_lazy_walk` with params sliced from the packed blob
    and the elastic key derived IN-GRAPH (fold_in(base_key, batch count) —
    the same stream `Elastic.draw_batch_params` yields eagerly), so one
    training batch costs ONE transfer + two kernel dispatches total."""
    s = _split_blob(blob, n_channels, K)
    key = jax.random.fold_in(key0, s["count"])
    return _finish_batch_lazy_walk(
        volumes, labels, s["slots"], s["origins"], s["spacings"], s["rots"],
        s["bases"], s["offsets"], s["fills"], s["bg_classes"][:, None],
        s["valid"], labs0, pres0, key, s["alphas"], s["sigmas"], s["apply"],
        s["fills"], span, dim, crop, flatten_y, with_elastic,
        fg_classes, n_fg_slices, force_all_fg, packed=packed)


@partial(jax.jit, static_argnames=("span", "dim", "n_classes"))
def _candidate_label_slices(labels_vol, origin, spacing, rot, bases, offsets,
                            span, dim, bg_class, n_classes, valid_shape):
    """Nearest-gather K candidate label slices + per-candidate class presence.

    Returns (labs (K, d, d) int32, presence (K, n_classes) bool)."""
    labs = sample_plane_batch(
        labels_vol, origin, spacing, rot, bases, offsets, span, dim,
        fill=bg_class, method="nearest", valid_shape=valid_shape,
    )[..., 0].astype(jnp.int32)
    onehot = jax.nn.one_hot(labs, n_classes, dtype=jnp.bool_)
    presence = jnp.any(onehot, axis=(1, 2))
    return labs, presence


class IsotrophicLiveViewSequence(BaseSequence):
    """Shared batch logic: fg quotas, label crop, augment, reshape."""

    def __init__(self, image_pair_queue, dim, batch_size, n_classes,
                 real_space_span=None, noise_sd=0.0, force_all_fg="auto",
                 fg_batch_fraction=0.50, label_crop=None, logger=None,
                 is_validation=False, list_of_augmenters=None,
                 flatten_y=False, **kwargs):
        super().__init__()
        self.logger = logger or ScreenLogger()
        self.image_pair_queue = image_pair_queue
        self.sample_dim = int(dim)
        self.n_classes = int(n_classes)
        self.real_space_span = real_space_span
        self.is_validation = is_validation
        self.noise_sd = 0.0 if is_validation else noise_sd
        self.list_of_augmenters = None if is_validation else list_of_augmenters
        self.batch_size = batch_size
        self.flatten_y = flatten_y
        self.force_all_fg_switch = force_all_fg
        self.fg_batch_fraction = fg_batch_fraction
        self.fg_classes = np.arange(1, self.n_classes)
        if self.fg_classes.shape[0] == 0:
            self.fg_classes = np.array([1])
        self.label_crop = (np.array([[0, 0], [0, 0]])
                           if label_crop is None else np.asarray(label_crop))
        # In-flight pipelined batches (see _getitem_pooled); overridable via
        # env for transport-latency tuning without touching hparams.
        self.sampler_lookahead = int(
            os.environ.get("MP_SAMPLER_LOOKAHEAD", "1"))

    # ------------------------------------------------------------ fg quotas
    @property
    def n_fg_slices(self):
        """Minimum number of batch elements that must contain foreground."""
        return int(np.ceil(self.batch_size * self.fg_batch_fraction))

    @property
    def force_all_fg(self):
        """Force >=1 voxel of every fg class somewhere in the batch when the
        batch has enough slots ('auto' semantics of the reference)."""
        if (isinstance(self.force_all_fg_switch, str)
                and self.force_all_fg_switch.lower() == "auto"):
            return self.batch_size > len(self.fg_classes)
        return bool(self.force_all_fg_switch)

    def _accepts_candidate(self, presence_row, tries, is_last, has_fg_vec,
                           has_fg_count, cur_bs):
        """The reference's accept/retry rules on one candidate's class
        presence. Returns (accept, new_has_fg_vec, fg_change)."""
        cand_classes = presence_row[self.fg_classes]
        if self.force_all_fg and not is_last:
            new_mask = has_fg_vec | cand_classes
            slots_left = self.batch_size - cur_bs
            if not new_mask.all() and (~new_mask).sum() >= slots_left:
                # Candidate leaves some class unfillable -> reject
                return False, has_fg_vec, 0
            has_fg_vec = new_mask
        has_fg = bool(cand_classes.any())
        if has_fg:
            return True, has_fg_vec, 1
        slots_left = self.batch_size - cur_bs
        if (self.n_fg_slices - has_fg_count) < slots_left:
            return True, has_fg_vec, 0
        return is_last, has_fg_vec, 0

    def select_candidate(self, presence, has_fg_vec, has_fg_count, cur_bs):
        """Walk the K candidates exactly like the reference's retry loop;
        return (chosen_index, updated vec, updated count)."""
        K = presence.shape[0]
        for t in range(K):
            accept, has_fg_vec, fg_change = self._accepts_candidate(
                presence[t], t + 1, t + 1 == K, has_fg_vec, has_fg_count,
                cur_bs,
            )
            if accept:
                return t, has_fg_vec, has_fg_count + fg_change
        return K - 1, has_fg_vec, has_fg_count  # pragma: no cover

    def _draw_finish_aug_params(self, augs, B, batch_w):
        """Draw the fused finish's elastic-augmentation batch params (or
        cached constants when no augmenter — the kernel ignores them under
        a static with_elastic=False, and caching avoids per-batch eager
        PRNGKey ops / dummy host->device RPCs on remote transports)."""
        if augs:
            key, alphas, sigmas, apply_mask = augs[0].draw_batch_params(B)
            batch_w = batch_w.copy()
            batch_w[apply_mask] = augs[0].weight
            return (key, np.asarray(alphas, np.float32),
                    np.asarray(sigmas, np.float32), np.asarray(apply_mask),
                    batch_w)
        cached = getattr(self, "_noaug_finish_params", None)
        if cached is None or int(cached[1].shape[0]) != B:
            cached = self._noaug_finish_params = (
                jax.random.PRNGKey(0),
                jnp.zeros(B, jnp.float32),
                jnp.zeros(B, jnp.float32),
                jnp.zeros(B, bool),
            )
        key, alphas, sigmas, apply_mask = cached
        return key, alphas, sigmas, apply_mask, batch_w

    # ------------------------------------------------------- batch assembly
    def augment(self, batch_x, batch_y, batch_w, bg_values):
        if self.list_of_augmenters:
            for aug in self.list_of_augmenters:
                batch_x, batch_y, batch_w = aug(
                    batch_x, batch_y, batch_w=batch_w, bg_values=bg_values
                )
        return batch_x, batch_y, batch_w

    def _crop_labels(self, batch_y):
        (l0, h0), (l1, h1) = self.label_crop
        return batch_y[:, l0:batch_y.shape[1] - h0, l1:batch_y.shape[2] - h1]

    def prepare_batches(self, batch_x, batch_y, batch_w):
        batch_x = jnp.asarray(batch_x)
        batch_y = jnp.asarray(batch_y)
        batch_w = np.asarray(batch_w, np.float32)
        if self.label_crop.sum() != 0:
            batch_y = self._crop_labels(batch_y)
        if self.flatten_y:
            batch_y = batch_y.reshape(batch_y.shape[0], -1, 1)
        elif batch_y.shape[-1] != 1:
            batch_y = batch_y[..., None]
        return batch_x, batch_y, batch_w

    def _getitem_pooled(self, idx):
        """Software-pipelined batches: finish the OLDEST started batch after
        topping the in-flight queue up to `sampler_lookahead` — the candidate
        round-trip (the sampler's only unavoidable host sync) then rides
        `lookahead` batches behind dispatch, hidden under the training steps
        in between. Depth 1 = classic double buffering; on a high-latency
        dispatch transport (remote TPU tunnel, ~10-20 ms/RPC) deeper
        lookahead keeps the presence fetch always-ready. Each started state
        is self-contained (captures its pool arrays, batch size and
        randomness), so in-flight batches survive pool eviction; states
        whose captured batch size no longer matches (OOM backoff shrank
        self.batch_size between start and finish) are discarded, so the
        first retry step does not re-OOM on a stale oversized batch.

        Shared by the 2D (plane) and 3D (box) samplers — each implements
        its own `_start_pooled_batch` / `_finish_pooled_batch` pair."""
        from collections import deque

        q = getattr(self, "_pending_batches", None)
        if q is None:
            q = self._pending_batches = deque()
        if any(len(st["slots"]) != self.batch_size for st in q):
            q = self._pending_batches = deque(
                st for st in q if len(st["slots"]) == self.batch_size)
        depth = max(1, int(getattr(self, "sampler_lookahead", 1)))
        while len(q) <= depth:
            q.append(self._start_pooled_batch())
        return self._finish_pooled_batch(q.popleft())


class IsotrophicLiveViewSequence2D(IsotrophicLiveViewSequence):
    """Training batches of oblique 2D slices + inference plane stacks."""

    def __init__(self, image_pair_queue, views, no_log=False, **kwargs):
        super().__init__(image_pair_queue, **kwargs)
        self.views = np.asarray(views)
        self.batch_shape = (self.batch_size, self.sample_dim,
                            self.sample_dim, self.n_classes)
        if not no_log:
            self.log()

    def log(self):
        self.logger(f"\nIs validation:               {self.is_validation}")
        self.logger(f"Using real space span:       {self.real_space_span}")
        self.logger(f"Using sample dim:            {self.sample_dim}")
        self.logger(f"Using real space sample res: "
                    f"{self.real_space_span / self.sample_dim}")
        self.logger(f"N fg slices:                 {self.n_fg_slices}")
        self.logger(f"Batch size:                  {self.batch_size}")
        self.logger(f"Force all FG:                {self.force_all_fg}")
        self.logger(f"Noise SD:                    {self.noise_sd}")
        self.logger(f"Augmenters:                  {self.list_of_augmenters}")

    # -------------------------------------------------------- pooled batches
    def _get_pool(self):
        """Lazily build the DeviceVolumePool over the queue's dataset. The
        pool turns the per-slice sampling calls into TWO per-batch kernels
        (candidate labels for all B*K slices, then the B chosen slices)."""
        if getattr(self, "_pool", None) is None:
            from multiplanarunet_tpu.parallel.volume_pool import (
                DeviceVolumePool,
            )

            dataset = self.image_pair_queue.dataset
            shape = DeviceVolumePool.shape_for(dataset.images)
            capacity = min(
                len(dataset),
                getattr(self.image_pair_queue, "max_loaded", len(dataset))
                or len(dataset),
            )
            if capacity < self.batch_size and capacity < len(dataset):
                # A batch may draw more distinct images than the pool holds;
                # LRU eviction could then overwrite a slot already referenced
                # by an earlier sample of the SAME batch. Fall back.
                raise RuntimeError(
                    f"volume pool capacity {capacity} < batch size "
                    f"{self.batch_size}; using per-image sampling"
                )
            self._pool = DeviceVolumePool(
                shape, dataset.images[0].n_channels, capacity,
                with_labels=True,
                pack_volumes=getattr(self, "_pool_pack", None),
            )
        return self._pool

    def _dispatch_candidates(self, labels_ref, slot_arr, params, base_arr,
                             off_arr, span):
        """Dispatch one candidate-label kernel (ASYNC — returns device
        arrays, no host sync). `params` holds per-sample host arrays."""
        return _pool_candidate_labels(
            labels_ref, jnp.asarray(slot_arr),
            jnp.asarray(params["origins"]), jnp.asarray(params["spacings"]),
            jnp.asarray(params["rots"]), jnp.asarray(base_arr),
            jnp.asarray(off_arr), span, self.sample_dim,
            jnp.asarray(params["bg_classes"]), self.n_classes,
            jnp.asarray(params["valid_shapes"]),
        )

    def _fusable_finish(self):
        """True when the finish can run as one fused device program (no
        augmenters, or a single Elastic2D whose params fold into it)."""
        augs = self.list_of_augmenters or []
        return (all(type(a).__name__ == "Elastic2D" for a in augs)
                and len(augs) <= 1
                and not getattr(self, "disable_fused_finish", False)
                and os.environ.get("MP_SAMPLER_FUSED", "1") != "0")

    def _start_pooled_batch(self):
        """Draw one batch's randomness, stage its images and DISPATCH its
        depth-0 candidate kernel, without any host sync. Everything the
        finish step needs is CAPTURED here (the pool's functional jnp
        arrays + per-row host params), so later pool evictions cannot
        corrupt an in-flight batch.

        Default (lazy fused finish, MP_SAMPLER_PACKED != 0): every host
        param — including the elastic-aug draw, moved here from finish —
        packs into ONE blob transfer (`_blob_layout`); the whole batch
        then costs 1 transfer + 2 dispatches. MP_SAMPLER_PACKED=0 is the
        per-array-transfer A/B arm."""
        pool = self._get_pool()
        B, K = self.batch_size, MAX_TRIES
        span = float(self.real_space_span)
        half = span // 2

        slots, weights = [], []
        for _ in range(B):
            with self.image_pair_queue.get_random_image() as image:
                slots.append(pool.ensure(image))
                weights.append(image.sample_weight)
        slots = np.asarray(slots, np.int32)

        view_idx = np.random.randint(0, len(self.views), B * K)
        bases = geometry.plane_basis_batch(
            self.views[view_idx], noise_sd=self.noise_sd
        ).reshape(B, K, 3, 3)
        offsets = np.random.uniform(-half, half, B * K).astype(
            np.float32).reshape(B, K)
        params = pool.params_for(slots)

        packed_mode = (self._fusable_finish()
                       and os.environ.get("MP_SAMPLER_LAZY", "1") != "0"
                       and os.environ.get("MP_SAMPLER_PACKED", "1") != "0")
        if packed_mode:
            augs = self.list_of_augmenters or []
            batch_w = np.asarray(weights, np.float32)
            count = 0
            alphas = sigmas = apply_mask = 0.0
            if augs:
                count, alphas, sigmas, apply_mask = \
                    augs[0].draw_batch_params_host(B)
                batch_w = batch_w.copy()
                batch_w[apply_mask] = augs[0].weight
                key0 = augs[0].base_key
            else:
                key0 = getattr(self, "_noaug_key0", None)
                if key0 is None:
                    key0 = self._noaug_key0 = jax.random.PRNGKey(0)
            C = pool.n_channels
            cols, width = _blob_layout(C, K)
            blob = np.empty((B, width), np.float32)
            for name, val in (
                    ("slot", slots[:, None]),
                    ("origin", params["origins"]),
                    ("spacing", params["spacings"]),
                    ("rot", params["rots"].reshape(B, 9)),
                    ("fill", params["fills"]),
                    ("bg_class", np.asarray(params["bg_classes"])[:, None]),
                    ("valid", params["valid_shapes"]),
                    ("bases", bases.reshape(B, 9 * K)),
                    ("offsets", offsets),
                    ("alpha", alphas), ("sigma", sigmas),
                    ("apply", apply_mask), ("count", count)):
                lo, hi = cols[name]
                blob[:, lo:hi] = np.reshape(val, (-1, hi - lo)) \
                    if np.ndim(val) else val
            blob = jnp.asarray(blob)
            labs0, pres0 = _pool_candidate_labels_blob(
                pool.labels, blob, span, self.sample_dim, self.n_classes,
                C, K)
            return dict(volumes=pool.volumes, packed=pool.packed,
                        grid_shape=pool.grid_shape, labels=pool.labels,
                        slots=slots, weights=batch_w, blob=blob, key0=key0,
                        with_elastic=bool(augs), n_channels=C,
                        labs0=labs0, pres0=pres0, span=span, B=B, K=K,
                        mode="lazy-blob")

        labs0, pres0 = self._dispatch_candidates(
            pool.labels, slots, params, bases[:, 0], offsets[:, 0], span)
        return dict(volumes=pool.volumes, packed=pool.packed,
                    grid_shape=pool.grid_shape,
                    labels=pool.labels, slots=slots,
                    params=params, weights=weights, bases=bases,
                    offsets=offsets, labs0=labs0, pres0=pres0, span=span,
                    B=B, K=K)

    def _finish_pooled_batch(self, st):
        """Resolve the quota walk and produce the batch for a started
        state. Default (fusable augmenters): the LAZY-gather walk — one
        program that gathers each deeper candidate only when the walk
        reaches it (`_finish_batch_lazy_walk`), no host sync at all.
        MP_SAMPLER_LAZY=0 restores the two-phase fetch: the accept rules
        (`_accepts_candidate`) PROVABLY accept any first candidate that
        contains every fg class (under force_all_fg) / any fg (without),
        regardless of the sequential quota state — so only rows whose
        first candidate misses that bar ever consult candidates 1..K-1,
        cutting the up-front candidate gather 2-10x vs sampling all B*K,
        while reproducing the reference retry statistics exactly; the
        depth-0 presence fetch itself was dispatched one batch ago
        (lookahead in `_getitem_pooled`), so its device->host round-trip
        is already paid."""
        B, K, span = st["B"], st["K"], st["span"]
        pool_volumes, labs0 = st["volumes"], st["labs0"]
        packed = None
        if st.get("packed") is not None:
            pool_volumes = st["packed"]
            packed = st["grid_shape"]
        if st.get("mode") == "lazy-blob":
            # Packed-blob lazy finish: ONE dispatch, zero transfers (the
            # blob shipped at start; aug params + weights already drawn).
            batch_x, batch_y = _finish_batch_lazy_blob(
                pool_volumes, st["labels"], st["blob"], labs0, st["pres0"],
                st["key0"], span, self.sample_dim,
                tuple(tuple(int(c) for c in pair)
                      for pair in self.label_crop),
                bool(self.flatten_y), st["with_elastic"],
                tuple(int(c) for c in self.fg_classes),
                int(self.n_fg_slices), bool(self.force_all_fg),
                st["n_channels"], K, packed=packed)
            return batch_x, batch_y, st["weights"]
        slots, params = st["slots"], st["params"]
        bases, offsets = st["bases"], st["offsets"]
        batch_w = np.asarray(st["weights"], np.float32)

        augs = self.list_of_augmenters or []
        fusable = self._fusable_finish()
        if fusable:
            key, alphas, sigmas, apply_mask, batch_w = \
                self._draw_finish_aug_params(augs, B, batch_w)
            d = self.sample_dim
            if os.environ.get("MP_SAMPLER_LAZY", "1") != "0":
                # Lazy-gather walk: NO presence fetch, NO phase-2 dispatch
                # — one program does walk + per-try gathers + finish
                # (candidate gathers shrink from B*(K-1) planes to the
                # reference's actual retry count, see
                # _finish_batch_lazy_walk).
                batch_x, batch_y = _finish_batch_lazy_walk(
                    pool_volumes, st["labels"], jnp.asarray(slots),
                    jnp.asarray(params["origins"]),
                    jnp.asarray(params["spacings"]),
                    jnp.asarray(params["rots"]),
                    jnp.asarray(bases), jnp.asarray(offsets),
                    jnp.asarray(params["fills"]),
                    jnp.asarray(params["bg_classes"])[:, None],
                    jnp.asarray(params["valid_shapes"]),
                    labs0, st["pres0"], key, alphas, sigmas, apply_mask,
                    np.asarray(params["fills"], np.float32),
                    span, d,
                    tuple(tuple(int(c) for c in pair)
                          for pair in self.label_crop),
                    bool(self.flatten_y), bool(len(augs)),
                    tuple(int(c) for c in self.fg_classes),
                    int(self.n_fg_slices), bool(self.force_all_fg),
                    packed=packed,
                )
                return batch_x, batch_y, batch_w

        pres0 = np.asarray(st["pres0"])
        fg = pres0[:, self.fg_classes]
        maybe_rejected = ~fg.all(1) if self.force_all_fg else ~fg.any(1)
        S = np.nonzero(maybe_rejected)[0]
        labs_rest = None
        pres_rest_dev = None
        pad = 0
        s_pos = np.full(B, -1, np.int64)
        if len(S) and K > 1:
            # pad the row count to a power of two: bounded compile shapes
            pad = 1 << int(np.ceil(np.log2(len(S))))
            S_pad = np.concatenate([S, np.repeat(S[:1], pad - len(S))])
            rep = np.repeat(S_pad, K - 1)
            rep_params = {k: v[rep] for k, v in params.items()}
            labs_rest, pres_rest_dev = self._dispatch_candidates(
                st["labels"], slots[rep], rep_params,
                bases[S_pad, 1:].reshape(-1, 3, 3),
                offsets[S_pad, 1:].reshape(-1), span)
            s_pos[S] = np.arange(len(S))

        if fusable:
            # Two-phase fused finish (MP_SAMPLER_LAZY=0 A/B arm): the
            # phase-2 presence is consumed on device, so the batch needs
            # NO blocking host sync beyond the depth-0 presence fetch
            # (which rode the lookahead).
            rest = (labs_rest if labs_rest is not None
                    else np.zeros((0, d, d), np.int32))
            p_rest = (pres_rest_dev if pres_rest_dev is not None
                      # dummy row: every chosen index is 0 by construction
                      # when no row entered phase 2 (values never selected)
                      else np.zeros((K - 1, self.n_classes), bool))
            batch_x, batch_y = _finish_batch_fused_walk(
                pool_volumes, jnp.asarray(slots),
                jnp.asarray(params["origins"]),
                jnp.asarray(params["spacings"]),
                jnp.asarray(params["rots"]),
                jnp.asarray(bases), jnp.asarray(offsets),
                jnp.asarray(params["fills"]),
                jnp.asarray(params["valid_shapes"]),
                labs0, rest, st["pres0"], p_rest,
                jnp.asarray(s_pos, jnp.int32), key,
                alphas, sigmas, apply_mask,
                np.asarray(params["fills"], np.float32),
                span, d,
                tuple(tuple(int(c) for c in pair)
                      for pair in self.label_crop),
                bool(self.flatten_y), bool(len(augs)),
                tuple(int(c) for c in self.fg_classes),
                int(self.n_fg_slices), bool(self.force_all_fg),
                packed=packed,
            )
            return batch_x, batch_y, batch_w

        # Non-fused path (custom augmenters / A-B harnesses): fetch the
        # phase-2 presence and run the accept walk on host — the oracle
        # the device walk is pinned against.
        pres_rest = (np.asarray(pres_rest_dev).reshape(
            pad, K - 1, self.n_classes) if pres_rest_dev is not None
            else np.zeros((0, K - 1, self.n_classes), bool))

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

        chosen_bases = bases[np.arange(B), chosen_t]
        chosen_offsets = offsets[np.arange(B), chosen_t]
        # chosen label slices: depth-0 rows from labs0, deeper rows from
        # the phase-2 block (its row s_pos[b]*(K-1) + t-1)
        if labs_rest is None:
            sel_idx = np.arange(B)
        else:
            from0 = chosen_t == 0
            sel_idx = np.where(
                from0, np.arange(B),
                len(labs0) + s_pos * (K - 1) + (chosen_t - 1))

        plane_fn = (partial(sample_plane_batch_pool_packed,
                            pool_volumes, packed) if packed
                    else partial(sample_plane_batch_pool, pool_volumes))
        batch_x = plane_fn(
            jnp.asarray(slots),
            jnp.asarray(params["origins"]),
            jnp.asarray(params["spacings"]),
            jnp.asarray(params["rots"]),
            jnp.asarray(chosen_bases), jnp.asarray(chosen_offsets),
            span, self.sample_dim, jnp.asarray(params["fills"]),
            valid_shapes=jnp.asarray(params["valid_shapes"]),
        )
        batch_y = jnp.concatenate(
            [labs0] + ([labs_rest] if labs_rest is not None else []), 0
        )[jnp.asarray(sel_idx)]
        bgs = params["fills"]
        batch_x, batch_y, batch_w = self.augment(batch_x, batch_y, batch_w,
                                                 bgs)
        return self.prepare_batches(batch_x, batch_y, batch_w)

    # ------------------------------------------------------------- training
    def _sample_slice_from(self, image, has_fg_vec, has_fg_count, cur_bs):
        """Candidate-parallel version of the reference's 10-try slice loop.

        Returns (im (d,d,C) jnp, lab (d,d) jnp int32, has_fg_vec, count)."""
        sampler = image.interpolator
        span = float(self.real_space_span)
        half = span // 2

        view_idx = np.random.randint(0, len(self.views), MAX_TRIES)
        bases = geometry.plane_basis_batch(self.views[view_idx],
                                           noise_sd=self.noise_sd)
        offsets = np.random.uniform(-half, half, MAX_TRIES).astype(np.float32)

        labs, presence = _candidate_label_slices(
            sampler.device_labels(),
            jnp.asarray(sampler.origin), jnp.asarray(sampler.spacing),
            sampler.device_rot(), jnp.asarray(bases), jnp.asarray(offsets),
            span, self.sample_dim, float(image.bg_class), self.n_classes,
            jnp.asarray(sampler.valid_shape),
        )
        presence_np = np.asarray(presence)
        j, has_fg_vec, has_fg_count = self.select_candidate(
            presence_np, has_fg_vec, has_fg_count, cur_bs
        )
        im = sample_plane(
            sampler.device_volume(),
            jnp.asarray(sampler.origin), jnp.asarray(sampler.spacing),
            sampler.device_rot(), jnp.asarray(bases[j]), float(offsets[j]),
            span, self.sample_dim, jnp.asarray(sampler.scaled_bg_value),
            valid_shape=jnp.asarray(sampler.valid_shape),
        )
        return im, labs[j], has_fg_vec, has_fg_count

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
                    "Pooled batch sampling failed; falling back to the "
                    "per-image path."
                )
                self.use_pool = False
        has_fg_count = 0
        has_fg_vec = np.zeros(len(self.fg_classes), bool)
        xs, ys, ws, bgs = [], [], [], []
        for _ in range(self.batch_size):
            with self.image_pair_queue.get_random_image() as image:
                im, lab, has_fg_vec, has_fg_count = self._sample_slice_from(
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
    def plane_offsets(self, image, n_planes):
        """Resolve an n_planes spec ('same', 'same+N', 'by_radius', int) to
        the evenly spaced plane offsets of the reference
        (`isotrophic_live_view_sequence_2d.py:46-62`)."""
        span = float(self.real_space_span)
        sample_res = span / (self.sample_dim - 1)
        if n_planes == "by_radius":
            bounds = geometry.get_bounding_sphere_real_radius(image)
            n_planes = int(2 * bounds / sample_res)
        else:
            extra = 0
            if n_planes == "same":
                n_planes = self.sample_dim
            elif isinstance(n_planes, str) and n_planes.startswith("same+"):
                extra = int(n_planes.split("+")[-1])
                n_planes = self.sample_dim + extra
            bounds = (span + extra * sample_res) / 2
        return np.linspace(-bounds, bounds, int(n_planes)).astype(np.float32)

    def get_view_from(self, image, view, n_planes):
        """Sample the full plane stack of one view over an image.

        Returns (X (d, d, P, C) jnp [scaled], y (d, d, P) or None,
        (real_axis, real_axis, offsets), inv_basis) — same tuple contract as
        the reference."""
        offsets = self.plane_offsets(image, n_planes)
        basis = geometry.plane_basis(view, noise_sd=0.0)
        sampler = image.interpolator
        X = sample_plane_stack(
            sampler.device_volume(),
            jnp.asarray(sampler.origin), jnp.asarray(sampler.spacing),
            sampler.device_rot(), jnp.asarray(basis), jnp.asarray(offsets),
            float(self.real_space_span), self.sample_dim,
            jnp.asarray(sampler.scaled_bg_value),
            valid_shape=jnp.asarray(sampler.valid_shape),
        )
        y = None
        if not image.predict_mode:
            y = sample_plane_stack(
                sampler.device_labels(),
                jnp.asarray(sampler.origin), jnp.asarray(sampler.spacing),
                sampler.device_rot(), jnp.asarray(basis), jnp.asarray(offsets),
                float(self.real_space_span), self.sample_dim,
                jnp.asarray(float(image.bg_class)), method="nearest",
                valid_shape=jnp.asarray(sampler.valid_shape),
            )[..., 0].astype(jnp.int32)
        real_axis = geometry.plane_axis(self.real_space_span, self.sample_dim)
        inv_basis = np.linalg.inv(basis.astype(np.float64)).astype(np.float32)
        return X, y, (real_axis, real_axis, offsets), inv_basis
