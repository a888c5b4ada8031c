"""Fused per-volume multi-planar inference.

The reference's predict path round-trips through the host at every stage:
plane sampling (7 threads of scipy), `model.predict` on the plane stack,
then a 7-thread nearest remap of the full prediction hyper-volume
(`mpunet/utils/fusion/fuse_and_predict.py`, `bin/predict.py:294-346`). Here
each view is ONE jitted graph executed entirely on device:

    plane-stack resample  ->  U-Net over plane chunks (lax.scan)
        ->  affine remap onto the (padded) voxel grid
        ->  weighted accumulation into the fusion sum (donated buffer)

and the final fusion (learned per-class-per-view weights or plain sum) is a
bias + softmax + argmax on the accumulated volume. Because the FusionModel is
linear in the per-view probabilities, accumulating ``W[v] * mapped_v``
per view IS the fusion — the (n_voxels, n_views, n_classes) stack the
reference materializes (`bin/predict.py:349-366`) never exists.

Two resamplers drive the plane extraction / prediction remap stages:

  * ``gather``: exact single-gather trilinear over a corner-packed volume
    (reference semantics bit-for-bit; `ops.interp`). Both stages run at the
    TPU's gather throughput ceiling (~250 ms/view at 256^3).
  * ``shear`` (default via ``auto``): shear-decomposed affine resampling
    (`ops.shear`) — 6 elementary single-axis passes per stage, each a
    banded interpolation-matrix contraction on the MXU (take_along_axis on
    CPU). Catmull-Rom forward / linear backward blending; parity-gated
    against the gather path in tests/test_predict_graph.py.

``auto`` uses shear whenever every view's affine factors within the memory
guard and falls back to the exact gather path otherwise (singular planes,
very large volumes).
"""

from __future__ import annotations

from collections import OrderedDict
from functools import partial

import os

import jax
import jax.numpy as jnp
import numpy as np

from multiplanarunet_tpu.ops import geometry
from multiplanarunet_tpu.ops.interp import (
    accum_view_pred_affine,
    map_view_pred_affine,
    sample_box,
    sample_plane_stack_packed,
    scatter_box_pred,
)
from multiplanarunet_tpu.ops.shear import (
    plan_plane_stack,
    plan_view_remap,
    shear_resample,
)


def _pad_planes(n, chunk):
    return -(-n // chunk) * chunk


def _plan_signature(plan, bounds):
    """Hashable identity of a ShearPlan + exact-bounds constants (all of
    which are baked into the compiled graph)."""
    ops = tuple(
        (o.m, o.q, o.alpha, o.beta, o.gamma,
         o.in_lo, o.in_extent, o.out_lo, o.out_extent, o.q_lo)
        for o in plan.ops
    )
    N, c = np.asarray(bounds[0]), np.asarray(bounds[1])
    return (plan.perm, plan.out_perm, ops, plan.src_shape, plan.out_shape,
            N.tobytes(), c.tobytes(),
            tuple(int(s) for s in bounds[2]))


def _pack_class_map(cls_dev):
    """uint8 class map -> two-voxel-per-byte nibble pack along Z (device
    side; the padded bucket Z is always even). Halves the device->host
    transfer of the fused map — significant on remote-device transports."""
    return cls_dev[..., 0::2] | (cls_dev[..., 1::2] << 4)


def _unpack_class_map(packed, true_shape):
    """Host-side inverse of `_pack_class_map`, cropped to true_shape."""
    packed = np.asarray(packed)
    X, Y, Zh = packed.shape
    out = np.empty((X, Y, 2 * Zh), np.uint8)
    out[..., 0::2] = packed & 0x0F
    out[..., 1::2] = packed >> 4
    return out[: true_shape[0], : true_shape[1], : true_shape[2]]


@partial(jax.jit, static_argnames=("n_classes", "packed", "true_shape"))
def _class_map_counts(cls_dev, labels, n_classes, packed, true_shape):
    """Per-class (tp, rel, sel) confusion counts of a (possibly nibble-
    packed) device class map against uint8 device labels, cropped to
    true_shape. int32 sums — exact; the (3, C) result is the ONLY thing
    fetched, replacing a full per-view class-map transfer when predict
    evaluates against labels."""
    if packed:
        X, Y, Zh = cls_dev.shape
        cls = jnp.stack([cls_dev & 0x0F, cls_dev >> 4],
                        axis=-1).reshape(X, Y, 2 * Zh)
    else:
        cls = cls_dev
    cls = cls[: true_shape[0], : true_shape[1], : true_shape[2]]
    tp, rel, sel = [], [], []
    for c in range(n_classes):
        s1 = labels == c
        s2 = cls == c
        tp.append(jnp.sum(s1 & s2, dtype=jnp.int32))
        rel.append(jnp.sum(s1, dtype=jnp.int32))
        sel.append(jnp.sum(s2, dtype=jnp.int32))
    return jnp.stack([jnp.stack(tp), jnp.stack(rel), jnp.stack(sel)])


def _big_bytes():
    """Accumulator-size threshold above which predict drains the dispatch
    queue per view (async dispatch allocates every queued program's outputs
    eagerly). Env-overridable so tests can exercise the big-volume path on
    tiny CPU volumes (MP_PREDICT_BIG_BYTES=1)."""
    return float(os.environ.get("MP_PREDICT_BIG_BYTES", 1.5e9))


def _plan_stage_bytes(plan, n_channels, bytes_per=2):
    """Largest intermediate stage of a ShearPlan in bytes (bf16 passes by
    default, +1 for the validity channel). Float math — degenerate plans
    can have extents whose product overflows int64."""
    return max(
        float(np.prod([float(ext) for (_, ext) in stage]))
        for stage in plan.stages
    ) * (n_channels + 1) * bytes_per


@partial(jax.jit, static_argnames=("pack", "true_shape"),
         donate_argnums=(0,))
def _fused_argmax_graph(accum, b, pack, true_shape):
    cls = jnp.argmax(accum + b, axis=-1).astype(jnp.uint8)
    if pack:
        return _pack_class_map(cls)
    return cls[: true_shape[0], : true_shape[1], : true_shape[2]]


@partial(jax.jit, static_argnames=("fused", "true_shape"),
         donate_argnums=(0,))
def _fused_probs_graph(accum, b, n_views, fused, true_shape):
    x = jax.nn.softmax(accum + b, axis=-1) if fused else accum / n_views
    return x[: true_shape[0], : true_shape[1], : true_shape[2]]


class MultiViewPredictor:
    """Compiles and runs the fused per-view predict graph for one model
    configuration; reusable across images (recompiles only when the padded
    volume bucket shape changes)."""

    # Shear-pass implementation: the MXU einsum form is 4-5x faster than
    # take_along_axis on TPU (banded interp matrix contracted on the MXU;
    # benchmarks/shear_impl_probe.py: stack 51->10.5 ms, remap 65->20 ms
    # per 256^3 view); on CPU the gather form wins.
    @staticmethod
    def _shear_impl():
        return "take" if jax.default_backend() == "cpu" else "matmul"

    # Per-stage bf16 footprint above which a shear plan falls back to the
    # gather implementation of that stage (two stages are live at once).
    _SHEAR_STAGE_BYTES_MAX = 3.2e9
    # Peak-HBM budget for the shear REMAP specifically: its final pass
    # materializes the mapped f32 volume NEXT TO the donated f32 fusion
    # accumulator, the f32 U-Net prediction stack, and two live bf16
    # stages. 512^3 x 7 classes busts a 16 GB chip this way (measured: TPU
    # worker crash), so such volumes keep the shear plane-stack but remap
    # through the slab-scanned gather kernel instead.
    _SHEAR_REMAP_PEAK_BYTES_MAX = 11e9
    # LRU bound on cached per-geometry jitted shear/remap fns (~12 entries
    # per subject geometry: 6 views x stack+remap)
    _SHEAR_FN_CACHE_MAX = 64

    def __init__(self, model, variables, sample_dim, real_space_span,
                 n_classes, chunk=None, logger=None, resampler="auto",
                 stage_dtype="bf16", fuse_views=True):
        # Inference-time decoder restructure: upsample+Conv(2x2) as ONE
        # input-dilated 3x3 conv (models/unet.py DilatedUpConv — exact,
        # same param tree). Measured on the v5e per-view U-Net scan at
        # 256^2 chunk 46: 546.9 -> 484.3 ms (-11.4%, 55.7 -> 63.0% of
        # bf16 peak), the 2x-upsampled tensors never hit HBM.
        # MP_PREDICT_DILATED=0 restores the naive decoder for A/Bs.
        if (getattr(model, "dilated_upconv", None) is False
                and not getattr(model, "subpixel_decoder", False)
                and os.environ.get("MP_PREDICT_DILATED", "1") != "0"):
            model = model.copy(dilated_upconv=True)
        self.model = model
        self.variables = variables
        self.dim = int(sample_dim)
        self.span = float(real_space_span)
        self.n_classes = int(n_classes)
        depth = getattr(model, "depth", None)
        if depth and self.dim % (2 ** depth):
            raise ValueError(
                f"sample_dim={self.dim} is not divisible by 2^depth="
                f"{2 ** depth}: the U-Net would crop its output below the "
                f"input size and the prediction remap would fail. Use a dim "
                f"divisible by {2 ** depth} (the Auditor picks 16-divisible "
                f"dims automatically)."
            )
        # Lane-pad-8 inference channels: filters rounded up to multiples
        # of 8 with the exact zero-pad weight embedding
        # (models/unet.lane_pad_variables — identical logits, pinned by
        # test). Measured ~1.4% faster per view at 256^2/cf=2 on the
        # v5e across two independent probe runs (pad128 LOSES to its
        # extra MACs — VALIDATION 35); a no-op ladder (cf=1 powers of
        # two) skips the copy so jit caches are unaffected.
        # MP_PREDICT_LANE_PAD=0 disables, or set another multiple.
        pad = int(os.environ.get("MP_PREDICT_LANE_PAD", "8") or 0)
        if (pad and type(model).__name__ == "UNet"
                and getattr(model, "lane_pad", 0) == 0
                and isinstance(variables, dict)
                and {"params", "batch_stats"} <= set(variables)):
            ladder = [int(model.init_filters * 2 ** i * model.cf)
                      for i in range(model.depth + 1)]
            if any(f % pad for f in ladder):
                from multiplanarunet_tpu.models.unet import (
                    lane_pad_variables,
                )
                import jax as _jax
                import jax.numpy as _jnp

                variables = self.variables = _jax.tree.map(
                    _jnp.asarray,
                    lane_pad_variables(model, variables, pad))
                model = self.model = model.copy(lane_pad=pad)
        # Plane batch per U-Net scan step. With chunk=None the batch adapts
        # to each stack's plane count so no padded planes run through the
        # U-Net (P_pad = steps * 2ceil(P / 2steps)). Measured end-to-end on
        # a v5e at 276 planes (256^3, 6 views): chunk 46 -> 3.55 s/vol,
        # 32 -> 3.6-3.7, 69 -> 6.2, 92 -> 4.9 — odd batches tile poorly and
        # large ones blow the working set next to the shear stages and the
        # fusion accumulator, so the adaptive chunk stays even and <= 48.
        # (At dim > 256, measured on 512^3: chunk 16 -> 48.3 s/vol vs
        # chunk 8 -> 52.5, integrated.)
        self.chunk = None if chunk is None else int(chunk)
        self._chunk_target = 48 if self.dim <= 256 else 16
        self.logger = logger
        if resampler not in ("auto", "shear", "gather"):
            raise ValueError(
                f"resampler must be 'auto', 'shear' or 'gather'; "
                f"got {resampler!r}"
            )
        self.resampler = resampler
        if stage_dtype not in ("bf16", "u8"):
            raise ValueError(
                f"stage_dtype must be 'bf16' or 'u8'; got {stage_dtype!r}"
            )
        # 'u8' ships volumes as per-channel affine uint8 codes (half the
        # bf16 transfer — the remote H2D tunnel gates cohort pipelining)
        # and dequantizes to bf16 on device; max abs intensity error is
        # (channel range)/510.
        self.stage_dtype = stage_dtype
        # Fuse all views' stack->U-Net->remap (+ fusion accumulation) into
        # ONE jitted program when the volume footprint is below the big
        # threshold: a remote-transport dispatch costs a round-trip, and
        # the per-view structure is ~21 launches/volume. Above the
        # threshold the per-view programs + per-view sync remain (the
        # fused graph would queue every view's buffers at once).
        self.fuse_views = bool(fuse_views)
        self._chunk_cache = {}  # P_pad -> scan chunk
        self._seen_buckets = set()  # (padded shape, P) combos seen
        self._view_fn = None    # per-view gather graph (argmax side output)
        self._scan_fn = None    # single-dispatch gather view-scan graph
        self._unet_fn = None    # shared plane-stack U-Net (shear path)
        # plan signature -> jitted resample fn. Shear plans key on exact
        # per-image geometry, so a heterogeneous cohort creates new
        # entries per subject — bounded LRU so memory stays capped over
        # long cohorts (the underlying XLA executables still share via
        # the persistent compile cache when extents quantize alike).
        self._shear_fns = OrderedDict()

    def _chunk_for(self, P_pad):
        """Scan chunk for a P_pad-plane stack. P_pad (a trace-time constant)
        determines the chunk, so the jitted graphs — cached by input shape —
        recover the same chunk _prepare_offsets padded for: when adaptive,
        P_pad = steps * 2ceil(P/2steps) makes 2ceil(P/2steps) the largest
        even divisor of P_pad that is <= the target (proof: any larger even
        divisor d would give P_pad/d < steps, forcing
        d >= P_pad/(steps-1) > target)."""
        if self.chunk is not None:
            return self.chunk
        chunk = self._chunk_cache.get(P_pad)
        if chunk is None:
            t = self._chunk_target
            chunk = (P_pad if P_pad <= t else
                     max(d for d in range(2, t + 1, 2) if P_pad % d == 0))
            self._chunk_cache[P_pad] = chunk
        return chunk

    # ---------------------------------------------------------- jit factory
    def _build(self):
        model, span, dim = self.model, self.span, self.dim
        chunk_for = self._chunk_for

        @partial(jax.jit,
                 static_argnames=("out_shape", "n_valid_planes",
                                  "return_probs"),
                 donate_argnums=(10,))
        def predict_view(variables, volume, origin, spacing, rot, valid_shape,
                         basis, offsets, fill, w_v, accum, M, t,
                         out_shape, n_valid_planes, return_probs=False):
            # 1) sample the plane stack (d, d, P_pad, C) — single-gather
            # trilinear over the corner-packed volume
            stack = sample_plane_stack_packed(
                volume, origin, spacing, rot, basis, offsets, span, dim,
                fill, valid_shape=valid_shape,
            )
            planes = jnp.moveaxis(stack, 2, 0)  # (P_pad, d, d, C)
            P_pad = planes.shape[0]

            # 2) U-Net over plane chunks without leaving the graph
            chunk = chunk_for(P_pad)
            chunks = planes.reshape(P_pad // chunk, chunk, dim, dim,
                                    planes.shape[-1])

            def body(_, xs):
                return None, model.apply(variables, xs, train=False)

            _, probs = jax.lax.scan(body, None, chunks)
            probs = probs.reshape(P_pad, dim, dim, -1)
            # bf16 remap source: halves the (d, d, P, nc) stack; the fusion
            # accumulation below stays float32
            pred = jnp.moveaxis(probs, 0, 2).astype(jnp.bfloat16)

            # 3) nearest remap onto the voxel grid + weighted accumulation
            g0 = -jnp.floor_divide(jnp.asarray(span, jnp.float32), 2.0)
            g_step = (-2.0 * g0) / (dim - 1)
            o_step = offsets[1] - offsets[0]
            mapped = map_view_pred_affine(
                pred, g0, g_step, offsets[0], o_step, M, t, out_shape,
                n_valid_planes,
            ).astype(jnp.float32)
            if return_probs:
                side = mapped
            else:
                side = jnp.argmax(mapped, axis=-1).astype(jnp.uint8)
                if mapped.shape[-1] <= 16 and out_shape[2] % 2 == 0:
                    side = _pack_class_map(side)
            return accum + w_v * mapped, side

        return predict_view

    def _build_scan(self):
        """Single-dispatch gather fast path: lax.scan over stacked per-view
        parameters with the fusion accumulation as carry and bias + argmax in
        graph — no per-view dispatches, no unused per-view argmax work."""
        model, span, dim = self.model, self.span, self.dim
        chunk_for = self._chunk_for
        nc = self.n_classes

        @partial(jax.jit, static_argnames=("out_shape", "n_valid_planes",
                                           "return_probs"))
        def predict_views_scan(variables, volume, origin, spacing, rot,
                               valid_shape, offsets, fill, bases, Ms, ts, ws,
                               b, out_shape, n_valid_planes,
                               return_probs=False):
            g0 = -jnp.floor_divide(jnp.asarray(span, jnp.float32), 2.0)
            g_step = (-2.0 * g0) / (dim - 1)
            o_step = offsets[1] - offsets[0]

            def body(accum, xs):
                basis, M, t, w_v = xs
                stack = sample_plane_stack_packed(
                    volume, origin, spacing, rot, basis, offsets, span, dim,
                    fill, valid_shape=valid_shape,
                )
                planes = jnp.moveaxis(stack, 2, 0)
                chunk = chunk_for(planes.shape[0])
                chunks = planes.reshape(-1, chunk, dim, dim,
                                        planes.shape[-1])

                def unet(_, xs2):
                    return None, model.apply(variables, xs2, train=False)

                _, probs = jax.lax.scan(unet, None, chunks)
                pred = jnp.moveaxis(
                    probs.reshape(-1, dim, dim, nc), 0, 2
                ).astype(jnp.bfloat16)
                mapped = map_view_pred_affine(
                    pred, g0, g_step, offsets[0], o_step, M, t, out_shape,
                    n_valid_planes,
                ).astype(jnp.float32)
                return accum + w_v * mapped, None

            accum = jnp.zeros(out_shape + (nc,), jnp.float32)
            accum, _ = jax.lax.scan(body, accum, (bases, Ms, ts, ws))
            if return_probs:
                return accum
            # argmax is invariant to the sum-fusion 1/n_views scaling and to
            # softmax, so bias + argmax IS the fused class map
            cls = jnp.argmax(accum + b, axis=-1).astype(jnp.uint8)
            if nc <= 16 and out_shape[2] % 2 == 0:
                cls = _pack_class_map(cls)
            return cls

        return predict_views_scan

    def _build_unet_stack(self):
        """Shared plane-stack U-Net for the shear path (compiled once; the
        per-view shear graphs around it are small and recompile cheaply)."""
        model, dim = self.model, self.dim
        chunk_for = self._chunk_for

        @jax.jit
        def unet_stack(variables, stack):
            planes = jnp.moveaxis(stack, 2, 0)  # (P_pad, d, d, C)
            P_pad = planes.shape[0]
            chunk = chunk_for(P_pad)
            chunks = planes.reshape(P_pad // chunk, chunk, dim, dim,
                                    planes.shape[-1])

            def body(_, xs):
                # bf16 probabilities: both remap kernels blend in bf16, and
                # the f32 stack alone is 3.85 GB at 512^3 (it OOMed the
                # mixed-mode remap by 66 MB). Cast inside the scan so the
                # stacked output is laid out as a plain bf16 array (a cast
                # of the full stacked f32 output chose a lane layout on the
                # 7-class dim, padding it 18x to 36 GB).
                out = model.apply(variables, xs, train=False)
                return None, out.astype(jnp.bfloat16)

            _, probs = jax.lax.scan(body, None, chunks)
            return jnp.moveaxis(probs.reshape(P_pad, dim, dim, -1), 0, 2)

        return unet_stack

    # ------------------------------------------------------------ shear path
    def _grid_params(self, offsets):
        """(g0, g_step, o0, o_step) of the plane sample grid — host floats
        (identical to the device-side computation in the gather graphs)."""
        g0 = float(-(self.span // 2))
        g_step = (-2.0 * g0) / (self.dim - 1)
        return g0, g_step, float(offsets[0]), float(offsets[1] - offsets[0])

    def _shear_cache_get(self, key):
        fn = self._shear_fns.get(key)
        if fn is not None:
            self._shear_fns.move_to_end(key)
        return fn

    def _shear_cache_put(self, key, fn):
        self._shear_fns[key] = fn
        while len(self._shear_fns) > self._SHEAR_FN_CACHE_MAX:
            self._shear_fns.popitem(last=False)

    def _shear_fn(self, kind, plan, bounds, fill=None, ch_group=None):
        """Cached jitted shear resample for one (plan, bounds) — reused
        across repeated predictions with the same geometry.

        For kind="remap", `ch_group` (None = all classes at once, f32
        output) runs the pass sequence over channel groups of that size
        and concatenates bfloat16 parts: every shear stage shrinks
        proportionally to the group width, which is what lets 512^3-class
        volumes keep the fast shear remap (measured 0.2-0.5 s/view)
        instead of falling back to the slab-scanned gather (3.6 s/view —
        the per-point gather ceiling). The f32 fusion accumulation is
        unchanged; only the mapped probabilities pass through bf16."""
        key = (kind, _plan_signature(plan, bounds),
               None if fill is None else np.asarray(fill).tobytes(),
               ch_group)
        fn = self._shear_cache_get(key)
        if fn is not None:
            return fn
        if kind == "stack":
            fill = np.asarray(fill, np.float32)

            @jax.jit
            def fn(volume):
                # Catmull-Rom passes: separable linear would stack ~3 lerps
                # per axis (3x the blur variance of joint trilinear), which
                # costs real dice through a trained net; cubic keeps the
                # input sharp for 2x the taps on the cheap 2-channel stage.
                # bf16 (bandwidth-bound); the U-Net computes in bf16 anyway.
                return shear_resample(volume, plan, fill, method="cubic",
                                      compute_dtype=jnp.bfloat16,
                                      exact_bounds=bounds,
                                      impl=self._shear_impl())
        else:
            onehot_bg = np.zeros((self.n_classes,), np.float32)
            onehot_bg[0] = 1.0
            nc = self.n_classes
            groups = ([(0, nc)] if not ch_group else
                      [(lo, min(lo + ch_group, nc))
                       for lo in range(0, nc, ch_group)])

            @partial(jax.jit, static_argnames=("want_argmax",),
                     donate_argnums=(1,))
            def fn(pred, accum, w_v, want_argmax=False):
                # bf16 probability passes; f32 validity division and
                # fusion accumulation (bf16 parts when channel-grouped —
                # including ch_group >= n_classes, the full-width bf16
                # mode whose stages are half the f32 ones)
                if not ch_group:
                    mapped = shear_resample(pred, plan, onehot_bg,
                                            method="linear",
                                            compute_dtype=jnp.bfloat16,
                                            out_dtype=jnp.float32,
                                            exact_bounds=bounds,
                                            impl=self._shear_impl())
                else:
                    parts = [
                        shear_resample(pred[..., lo:hi], plan,
                                       onehot_bg[lo:hi], method="linear",
                                       compute_dtype=jnp.bfloat16,
                                       out_dtype=jnp.bfloat16,
                                       exact_bounds=bounds,
                                       impl=self._shear_impl())
                        for lo, hi in groups
                    ]
                    mapped = jnp.concatenate(parts, axis=-1)
                side = None
                if want_argmax:
                    side = jnp.argmax(mapped, axis=-1).astype(jnp.uint8)
                    if (mapped.shape[-1] <= 16
                            and mapped.shape[2] % 2 == 0):
                        side = _pack_class_map(side)
                return accum + w_v * mapped, side

        self._shear_cache_put(key, fn)
        return fn

    def _shear_mega_fn(self, shear_fns, out_shape, return_per_view):
        """One jitted program running EVERY view's stack -> U-Net -> remap
        plus the fusion accumulation: (variables, volume, ws) -> (accum,
        per-view argmax sides). The per-view jitted fns are called inside
        the outer jit (nested pjit calls trace inline), so XLA sees the
        whole liveness — each view's stack/prediction dies before the next
        view allocates — and the host pays ~3 dispatch round-trips per
        volume instead of ~21 (measured +0.27 s/vol of pure RPC latency on
        the remote transport, VALIDATION 23).

        Keyed on the per-view fn object ids: the returned closure pins
        those exact objects, so a live cache entry's ids cannot be recycled
        by different fns (CPython id = address of a live object)."""
        key = ("mega", tuple(id(f) for pair in shear_fns for f in pair),
               out_shape, bool(return_per_view))
        fn = self._shear_cache_get(key)
        if fn is not None:
            return fn
        unet, nc = self._unet_fn, self.n_classes
        fns = list(shear_fns)

        @jax.jit
        def mega(variables, volume, ws):
            accum = jnp.zeros(out_shape + (nc,), jnp.float32)
            sides = []
            for v, (stack_fn, remap_fn) in enumerate(fns):
                stack = stack_fn(volume)
                pred = unet(variables, stack)
                accum, side = remap_fn(pred, accum, ws[v],
                                       want_argmax=return_per_view)
                if return_per_view:
                    sides.append(side)
            return accum, tuple(sides)

        self._shear_cache_put(key, mega)
        return mega

    def _gather_remap_fn(self, M, t, g0, g_step, o0, o_step, out_shape,
                         n_valid):
        """Jitted slab-scanned gather remap + fusion accumulation — the
        remap stage for volumes whose shear remap would not fit in HBM
        (the plane STACK can still go through the shear kernel)."""
        M = np.asarray(M, np.float32)
        t = np.asarray(t, np.float32)
        key = ("gremap", M.tobytes(), t.tobytes(), g0, g_step, o0, o_step,
               out_shape, n_valid)
        fn = self._shear_cache_get(key)
        if fn is not None:
            return fn

        @partial(jax.jit, static_argnames=("want_argmax",),
                 donate_argnums=(1,))
        def fn(pred, accum, w_v, want_argmax=False):
            accum, side = accum_view_pred_affine(
                pred.astype(jnp.bfloat16), g0, g_step, o0, o_step,
                jnp.asarray(M), jnp.asarray(t), accum, w_v, n_valid,
                want_argmax=want_argmax,
            )
            if side is not None and (accum.shape[-1] <= 16
                                     and accum.shape[2] % 2 == 0):
                side = _pack_class_map(side)
            return accum, side

        self._shear_cache_put(key, fn)
        return fn

    def _plan_shear_views(self, image, bases, Mts, offsets, n_valid):
        """Per-view (stack_fn, remap_fn) pairs for the shear resampler, or
        None when any view's affine fails to factor or exceeds the memory
        guard (the caller falls back to the exact gather path). A view whose
        plane STACK factors but whose remap would not fit in HBM remaps
        through the slab-scanned gather kernel instead (mixed mode)."""
        sampler = image.interpolator
        rot = (np.eye(3) if sampler.rot_mat is None
               else np.asarray(sampler.rot_mat, np.float64))
        vol_shape = sampler.padded_shape()
        g0, g_step, o0, o_step = self._grid_params(offsets)
        P_pad = len(offsets)
        valid_shape = tuple(int(s) for s in sampler.valid_shape)
        fill = np.asarray(sampler.scaled_bg_value, np.float32)
        n_ch = int(sampler.n_channels)

        # Peak HBM of a shear remap: accum (donated) + mapped, both f32,
        # the bf16 U-Net prediction stack, and two live bf16 stages
        accum_bytes = float(np.prod(vol_shape)) * self.n_classes * 4
        pred_bytes = float(self.dim * self.dim * P_pad) * self.n_classes * 2

        fns = []
        for basis, (M, t) in zip(bases, Mts):
            s_plan, s_Nc = plan_plane_stack(
                basis, rot, sampler.origin, sampler.spacing,
                g0, g_step, o0, o_step, vol_shape, self.dim, P_pad,
            )
            if (not s_plan.valid
                    or _plan_stage_bytes(s_plan, n_ch)
                    > self._SHEAR_STAGE_BYTES_MAX):
                return None
            stack_fn = self._shear_fn(
                "stack", s_plan, s_Nc + (valid_shape,), fill=fill)

            r_plan, r_Nc = plan_view_remap(
                M, t, g0, g_step, o0, o_step,
                (self.dim, self.dim, P_pad), vol_shape,
            )
            r_stage = (_plan_stage_bytes(r_plan, self.n_classes)
                       if r_plan.valid else float("inf"))
            r_bounds = r_Nc + ((self.dim, self.dim, n_valid),)
            # Peak HBM of the shear remap = the larger of two moments,
            # with the f32 accumulator (donated, so counted once) and the
            # bf16 prediction stack live throughout:
            #   mid pass:   in stage + out stage        (<= 2 * stage)
            #   final pass: last stage + mapped volume  (mapped extracted
            #               from the stage by a fused slice+cast+divide)
            # Preference: all classes at once with an f32 mapped volume
            # (exact); else CHANNEL-GROUPED bf16 (every stage shrinks
            # with the group width — 512^3 x 7 classes runs at group 2);
            # else the slab-scanned gather (correct but pinned at the
            # per-point gather ceiling, 3.6 s/view at 512^3).
            base = accum_bytes + pred_bytes
            peak_f32 = max(2 * r_stage + base,
                           r_stage + accum_bytes + base)
            group = None
            forced = os.environ.get("MP_SHEAR_CH_GROUP")
            if forced and r_plan.valid:
                # Explicit group-width override (A/B harnesses + the
                # multi-chip dryrun): bypasses the budget search below.
                # Width >= n_classes still runs the grouped bf16 remap
                # body as one group — the "bf16 in/out pair" full-width
                # mode the budget logic never picks on its own.
                remap_fn = self._shear_fn(
                    "remap", r_plan, r_bounds,
                    ch_group=min(int(forced), self.n_classes))
                fns.append((stack_fn, remap_fn))
                continue
            if (r_stage > self._SHEAR_STAGE_BYTES_MAX
                    or peak_f32 > self._SHEAR_REMAP_PEAK_BYTES_MAX):
                for g in range(self.n_classes - 1, 0, -1):
                    r_g = (_plan_stage_bytes(r_plan, g)
                           if r_plan.valid else float("inf"))
                    # other groups' finished bf16 parts stay live
                    peak_g = 2 * r_g + accum_bytes / 2 + base
                    if (r_g <= self._SHEAR_STAGE_BYTES_MAX and
                            peak_g <= self._SHEAR_REMAP_PEAK_BYTES_MAX):
                        group = g
                        break
            if group is not None:
                remap_fn = self._shear_fn("remap", r_plan, r_bounds,
                                          ch_group=group)
            elif (r_stage <= self._SHEAR_STAGE_BYTES_MAX
                  and peak_f32 <= self._SHEAR_REMAP_PEAK_BYTES_MAX):
                # Padded tail planes are out-of-bounds for the remap,
                # exactly as the gather path's n_valid_planes treats them
                remap_fn = self._shear_fn("remap", r_plan, r_bounds)
            else:
                remap_fn = self._gather_remap_fn(
                    M, t, g0, g_step, o0, o_step, vol_shape, n_valid)
            fns.append((stack_fn, remap_fn))
        return fns

    def _stage_unpacked(self, sampler):
        return sampler.device_volume_unpacked(
            quantize=self.stage_dtype == "u8")

    def _stage_packed(self, sampler):
        return sampler.device_volume_packed(
            quantize=self.stage_dtype == "u8")

    def _run_shear(self, image, views, shear_fns, W, return_per_view,
                   true_shape, labels_dev=None):
        sampler = image.interpolator
        volume = self._stage_unpacked(sampler)
        out_shape = tuple(int(s) for s in volume.shape[:3])
        if self._unet_fn is None:
            self._unet_fn = self._build_unet_stack()
        # Async dispatch allocates every queued program's outputs eagerly;
        # at >= 512^3 six queued views' stacks+predictions alone exhaust
        # HBM (measured RESOURCE_EXHAUSTED), so drain the queue per view
        big = float(np.prod(out_shape)) * self.n_classes * 4 > _big_bytes()
        if os.environ.get("MP_FUSE_BIG") == "1":
            # A/B override: run the fused multi-view megagraph even above
            # the big-volume threshold (VERDICT r3 item 4 — measure, don't
            # assume, whether one-compile whole-volume fusion beats the
            # drained per-view pipeline at 512^3). XLA sees the whole
            # liveness, so the six queued views' eager output allocation
            # that motivated the drain does not apply to the fused graph.
            big = False
        if self.fuse_views and not big:
            mega = self._shear_mega_fn(shear_fns, out_shape,
                                       return_per_view)
            ws = (np.asarray(W, np.float32) if W is not None
                  else np.ones((len(shear_fns), self.n_classes),
                               np.float32))
            if self.logger:
                self.logger(f"Views 1-{len(shear_fns)}: fused multi-view "
                            f"graph (shear)")
            accum, sides = mega(self.variables, volume, jnp.asarray(ws))
            per_view = ([self._per_view_result(s, out_shape, true_shape,
                                               labels_dev)
                         for s in sides] if return_per_view else None)
            return accum, per_view
        # Above the HBM threshold the queue must be drained (async dispatch
        # allocates every queued program's outputs eagerly — six queued
        # views exhausted 16 GB, measured). MP_VIEW_INFLIGHT bounds HOW MANY
        # views may be in flight at once: 2 (default) overlaps view v's
        # remap tail with view v+1's stack + U-Net — measured 32.3 -> 28.25
        # s/vol at 512^3 back-to-back on a v5e with HBM headroom intact
        # (VALIDATION 29); 1 fully serializes each view. Only the measured
        # 512^3/7-class config is validated no-OOM at 2, so an HBM-tight
        # model/volume combination auto-falls back to 1 on
        # RESOURCE_EXHAUSTED instead of erroring (round-3 advisor).
        inflight = max(1, int(os.environ.get("MP_VIEW_INFLIGHT", "2")))
        try:
            return self._run_shear_loop(
                views, shear_fns, W, return_per_view, volume, out_shape,
                true_shape, labels_dev, big, inflight)
        except Exception as e:  # noqa: BLE001 — filtered to OOM below
            oom = ("RESOURCE_EXHAUSTED" in repr(e)
                   or "Out of memory" in repr(e))
            if not (big and inflight > 1 and oom):
                raise
            if self.logger:
                self.logger(
                    f"HBM exhausted at view inflight={inflight}; "
                    f"retrying fully serialized (inflight=1)")
            import gc
            gc.collect()  # drop the failed attempt's device buffers
            return self._run_shear_loop(
                views, shear_fns, W, return_per_view, volume, out_shape,
                true_shape, labels_dev, big, 1)

    def _run_shear_loop(self, views, shear_fns, W, return_per_view, volume,
                        out_shape, true_shape, labels_dev, big, inflight):
        accum = jnp.zeros(out_shape + (self.n_classes,), jnp.float32)
        per_view = [] if return_per_view else None
        pending = []
        for v, (stack_fn, remap_fn) in enumerate(shear_fns):
            if big and len(pending) >= inflight:
                np.asarray(pending.pop(0))  # real sync (the remote
                # transport's block_until_ready can return early)
            if self.logger:
                self.logger(f"View {v + 1}/{len(views)}: "
                            f"{np.round(views[v], 4)} (shear)")
            w_v = (jnp.asarray(W[v]) if W is not None
                   else jnp.ones((self.n_classes,), jnp.float32))
            stack = stack_fn(volume)
            pred = self._unet_fn(self.variables, stack)
            del stack  # release before the remap's HBM peak (async refs
            # keep donated-into buffers alive until dropped on host)
            accum, argmax_v = remap_fn(pred, accum, w_v,
                                       want_argmax=return_per_view)
            del pred
            if big:
                # Queue a TINY sliced sentinel, not accum itself: pinning
                # accum here would block the next remap's donation of it
                # and double the f32 accumulator in HBM
                pending.append(accum[:1, :1, :1, 0])
            if return_per_view:
                per_view.append(self._per_view_result(
                    argmax_v, out_shape, true_shape, labels_dev))
        return accum, per_view

    def _fetch_class_map(self, cls_dev, out_shape, true_shape):
        """Fetch a per-view class map that may be nibble-packed on device."""
        if self.n_classes <= 16 and out_shape[2] % 2 == 0:
            return _unpack_class_map(cls_dev, true_shape)
        return np.asarray(
            cls_dev[: true_shape[0], : true_shape[1], : true_shape[2]]
        )

    def _per_view_result(self, argmax_v, out_shape, true_shape, labels_dev):
        """Per-view eval result: the fetched class map, or — when device
        labels were staged (`predict_image(eval_labels=...)`) — the (3, C)
        on-device confusion counts, fetched lazily by the caller. The
        counts replace a full class-map device->host transfer per view."""
        if labels_dev is None:
            return self._fetch_class_map(argmax_v, out_shape, true_shape)
        packed = self.n_classes <= 16 and out_shape[2] % 2 == 0
        return _class_map_counts(argmax_v, labels_dev, self.n_classes,
                                 packed, true_shape)

    @staticmethod
    def _stage_eval_labels(eval_labels):
        if eval_labels is None:
            return None
        lab = np.asarray(eval_labels)
        if lab.ndim == 4:
            lab = lab[..., 0]
        return jnp.asarray(lab.astype(np.uint8))

    # -------------------------------------------------------------- running
    def _prepare_offsets(self, image, n_planes):
        """(chunk-padded offsets, n_valid) for an n_planes spec."""
        offsets = self._plane_offsets(image, n_planes)
        n_valid = len(offsets)
        if self.chunk is not None:
            P_pad = _pad_planes(n_valid, self.chunk)
        else:
            # Minimal padding: steps scan iterations of 2ceil(n/2steps)
            # planes (which _chunk_for recovers from P_pad as its largest
            # even divisor <= the target)
            steps = -(-n_valid // self._chunk_target)
            P_pad = steps * 2 * (-(-n_valid // (2 * steps)))
        if P_pad != n_valid:
            step = offsets[1] - offsets[0]
            extra = offsets[-1] + step * np.arange(1, P_pad - n_valid + 1)
            offsets = np.concatenate([offsets, extra]).astype(np.float32)
        return offsets, n_valid

    @staticmethod
    def _remap_transform(image, basis, true_shape):
        """(M, t) taking voxel INDEX -> plane coords for one view basis."""
        A = np.asarray(image.affine, np.float64)[:3, :3]
        center = A @ ((np.asarray(true_shape) - 1) / 2.0)
        inv_basis = np.linalg.inv(basis.astype(np.float64))
        return ((inv_basis @ A).astype(np.float32),
                (-inv_basis @ center).astype(np.float32))

    def _fusion_Wb(self, fusion_params, n_views):
        """Per-view weights W (or None for sum fusion) + bias b (zeros when
        unfused — argmax-neutral)."""
        if fusion_params is None:
            return None, np.zeros((self.n_classes,), np.float32)
        W = np.asarray(fusion_params["fusion"]["W"], np.float32)
        if W.shape[0] != n_views:
            raise ValueError(
                f"Fusion weights cover {W.shape[0]} views, got {n_views}"
            )
        b = np.asarray(fusion_params["fusion"]["b"], np.float32).reshape(-1)
        return W, b

    def _fuse_tail(self, accum, fusion_params, b, n_views, return_probs,
                   true_shape, defer=False):
        """accum -> fused output on host (argmax uint8 or probability
        volume), cropped to the true shape. With defer=True, returns a
        zero-arg callable performing the device->host fetch instead — the
        device work is already dispatched, so a caller can run the fetch on
        an IO thread and overlap it with the next image's compute.

        One jitted graph with the accumulator donated: the eager form
        materialized a second full f32 volume next to the accumulator
        (softmax then argmax), which exhausted HBM at 512^3 x 7 classes."""
        if not return_probs:
            # argmax is invariant to softmax and to the sum-fusion 1/n
            # scaling, so bias + argmax IS the fused class map (b is zeros
            # when unfused). Ship uint8, nibble-packed when classes fit —
            # the full softmax volume is nc x 4 bytes/voxel and dominates
            # wall time on remote transports.
            pack = self.n_classes <= 16 and accum.shape[2] % 2 == 0
            out = _fused_argmax_graph(accum, jnp.asarray(b), pack=pack,
                                      true_shape=true_shape)
            return self._deferred_class_fetch(out, true_shape, pack, defer)
        out = _fused_probs_graph(accum, jnp.asarray(b),
                                 np.float32(n_views),
                                 fused=fusion_params is not None,
                                 true_shape=true_shape)
        return self._deferred_class_fetch(out, true_shape, False, defer)

    @staticmethod
    def _deferred_class_fetch(out, true_shape, pack, defer):
        """Fetch (or defer-fetch) a device-side result: `out` is either a
        nibble-packed full-bucket class map (pack=True) or an already
        cropped array.

        (An X-slab-chunked fetch — 8 smaller D2H messages to let dispatch
        RPCs interleave — was measured on the axon transport and did NOT
        beat the single transfer: per-message round-trips cost more than
        the interleaving saves, and run-to-run tunnel bandwidth variance
        dominates both. Single transfer kept.)"""
        if pack:
            fetch = lambda: _unpack_class_map(out, true_shape)  # noqa: E731
        else:
            fetch = lambda: np.asarray(out)  # noqa: E731
        if defer:
            # Start the D2H copy now (enqueued behind the just-dispatched
            # compute) so the transfer rides the wire while the caller
            # dispatches the next image's graphs; the later np.asarray then
            # finds the host buffer ready. No-op on backends without async
            # host copies.
            try:
                out.copy_to_host_async()
            except Exception:
                pass
        return fetch if defer else fetch()

    def prestage(self, image, views=None, n_planes="same+20"):
        """Stage this image's volume to the device in the form the
        configured resampler will consume (call from an IO thread to overlap
        the host->device transfer with the previous image's inference)."""
        sampler = image.interpolator
        if getattr(self, "mesh", None) is not None:
            # predict_image_sharded consumes the corner-packed volume
            self._stage_packed(sampler)
            return
        if self.resampler == "shear":
            self._stage_unpacked(sampler)
            return
        if self.resampler == "auto" and views is not None:
            true_shape = tuple(int(s) for s in image.shape[:3])
            offsets, n_valid = self._prepare_offsets(image, n_planes)
            bases = [geometry.plane_basis(v, noise_sd=0.0) for v in views]
            Mts = [self._remap_transform(image, b, true_shape)
                   for b in bases]
            if self._plan_shear_views(image, bases, Mts, offsets,
                                      n_valid) is not None:
                self._stage_unpacked(sampler)
                return
        self._stage_packed(sampler)

    def predict_image(self, image, views, fusion_params=None,
                      n_planes="same+20", return_per_view=True,
                      return_probs=False, defer_fetch=False,
                      eval_labels=None):
        """Run all views over one ImagePair and fuse.

        Returns (fused, per_view_argmax list of (X, Y, Z) uint8 arrays or
        None). `fused` is the argmax class map (uint8) by default; pass
        return_probs=True for the full softmax volume (nc x the transfer
        size — significant on remote-device transports). With
        defer_fetch=True, `fused` is a zero-arg callable that performs the
        device->host fetch when invoked — call it from an output IO thread
        to overlap the (slow remote-transport) result transfer with the
        next image's inference. With eval_labels (host label volume), the
        per_view list holds device-side (3, n_classes) confusion-count
        arrays instead of class maps (tp/rel/sel vs the labels — feed
        `evaluate.metrics.dice_from_counts`); only those tiny count
        matrices ever cross device->host, not the per-view volumes."""
        sampler = image.interpolator
        labels_dev = (self._stage_eval_labels(eval_labels)
                      if return_per_view else None)
        true_shape = tuple(int(s) for s in image.shape[:3])
        offsets, n_valid = self._prepare_offsets(image, n_planes)
        bucket = (tuple(int(s) for s in sampler.padded_shape())
                  + (len(offsets),))
        if self.logger and bucket not in self._seen_buckets:
            self._seen_buckets.add(bucket)
            self.logger(
                f"Volume bucket {bucket[:3]} x {bucket[3]} planes "
                f"(cohort bucket #{len(self._seen_buckets)}; first image "
                f"of a new bucket compiles its graphs — the persistent "
                f"cache makes this one-time per machine)")
        n_views = len(views)
        W, b = self._fusion_Wb(fusion_params, n_views)

        bases = [geometry.plane_basis(view, noise_sd=0.0) for view in views]
        Mts = [self._remap_transform(image, basis, true_shape)
               for basis in bases]

        shear_fns = None
        if self.resampler in ("auto", "shear"):
            shear_fns = self._plan_shear_views(image, bases, Mts, offsets,
                                               n_valid)
            if shear_fns is None and self.resampler == "shear":
                raise ValueError(
                    "resampler='shear' requested but a view affine does not "
                    "factor within the memory guard; use 'auto' (falls back "
                    "to the exact gather path) or 'gather'"
                )

        if shear_fns is not None:
            accum, per_view = self._run_shear(
                image, views, shear_fns, W, return_per_view, true_shape,
                labels_dev=labels_dev)
            return (self._fuse_tail(accum, fusion_params, b, n_views,
                                    return_probs, true_shape,
                                    defer=defer_fetch), per_view)

        volume = self._stage_packed(sampler)
        out_shape = tuple(int(s) for s in volume.shape[:3])  # padded bucket
        common = (self.variables, volume,
                  jnp.asarray(sampler.origin), jnp.asarray(sampler.spacing),
                  sampler.device_rot(), jnp.asarray(sampler.valid_shape))

        if not return_per_view:
            # Single dispatch: scan over stacked per-view parameters
            if self._scan_fn is None:
                self._scan_fn = self._build_scan()
            ws = (W if W is not None
                  else np.ones((n_views, self.n_classes), np.float32))
            out = self._scan_fn(
                *common, jnp.asarray(offsets),
                jnp.asarray(sampler.scaled_bg_value),
                jnp.asarray(np.stack(bases)),
                jnp.asarray(np.stack([M for M, _ in Mts])),
                jnp.asarray(np.stack([t for _, t in Mts])),
                jnp.asarray(ws), jnp.asarray(b),
                out_shape=out_shape, n_valid_planes=n_valid,
                return_probs=return_probs,
            )
            if not return_probs:  # bias + argmax (packed) already in graph
                pack = self.n_classes <= 16 and out_shape[2] % 2 == 0
                if not pack:
                    out = out[: true_shape[0], : true_shape[1],
                              : true_shape[2]]
                return self._deferred_class_fetch(
                    out, true_shape, pack, defer_fetch), None
            return (self._fuse_tail(out, fusion_params, b, n_views,
                                    return_probs, true_shape,
                                    defer=defer_fetch), None)

        if self._view_fn is None:
            self._view_fn = self._build()
        accum = jnp.zeros(out_shape + (self.n_classes,), jnp.float32)
        per_view = []
        for v, view in enumerate(views):
            w_v = (jnp.asarray(W[v]) if W is not None
                   else jnp.ones((self.n_classes,), jnp.float32))
            if self.logger:
                self.logger(f"View {v + 1}/{n_views}: {np.round(view, 4)} "
                            f"({n_valid} planes)")
            accum, argmax_v = self._view_fn(
                *common, jnp.asarray(bases[v]), jnp.asarray(offsets),
                jnp.asarray(sampler.scaled_bg_value), w_v, accum,
                jnp.asarray(Mts[v][0]), jnp.asarray(Mts[v][1]),
                out_shape, n_valid,
            )
            per_view.append(self._per_view_result(
                argmax_v, out_shape, true_shape, labels_dev))

        return (self._fuse_tail(accum, fusion_params, b, n_views,
                                return_probs, true_shape,
                                defer=defer_fetch), per_view)

    # ------------------------------------------------------- multi-chip path
    def _predict_sharded_shear(self, image, views, mesh, fusion_params,
                               n_planes):
        """Multi-chip SHEAR inference: place each view's specialized shear
        programs on its own device (view v -> device v % n).

        Shear plans are per-view trace-time constants (different pass
        permutations and extents), so they cannot run as one uniform SPMD
        program without either padding every extent to the view-set max or
        compiling a lax.switch over all plan shapes on every chip. Instead
        of paying that, this path exploits jax's single-controller
        multi-device dispatch: the volume + parameters are copied to every
        participating device, each device executes its views' OWN compiled
        stack -> U-Net -> remap graphs (async dispatch runs the devices
        concurrently), and the per-device fusion partial sums reduce onto
        device 0 with explicit inter-chip copies. Zero padding overhead vs
        single-chip specialization — the same cached jitted fns run, just
        placed per device.

        Returns the fused argmax map (uint8, true shape), or None when a
        view's affine does not factor (caller falls back to the uniform
        gather shard_map path)."""
        sampler = image.interpolator
        true_shape = tuple(int(s) for s in image.shape[:3])
        offsets, n_valid = self._prepare_offsets(image, n_planes)
        bases = [geometry.plane_basis(v, noise_sd=0.0) for v in views]
        Mts = [self._remap_transform(image, b, true_shape) for b in bases]
        shear_fns = self._plan_shear_views(image, bases, Mts, offsets,
                                           n_valid)
        if shear_fns is None:
            return None
        devices = list(mesh.devices.ravel())
        n_use = min(len(devices), len(views))
        W, b = self._fusion_Wb(fusion_params, len(views))

        volume = self._stage_unpacked(sampler)
        out_shape = tuple(int(s) for s in volume.shape[:3])
        if self._unet_fn is None:
            self._unet_fn = self._build_unet_stack()

        from jax.sharding import SingleDeviceSharding

        # Inter-chip copies (volume ~bf16, params once per device); on a
        # real slice these ride ICI, never the host link. Device 0 is
        # pinned too: callers may hand in mesh-replicated variables (e.g.
        # fresh trainer state), and a replicated operand would drag the
        # whole per-view graph back to an all-device sharding.
        vols = [jax.device_put(volume, d) for d in devices[:n_use]]
        varss = [jax.device_put(self.variables, d)
                 for d in devices[:n_use]]
        zeros = [
            jax.jit(partial(jnp.zeros, out_shape + (self.n_classes,),
                            jnp.float32),
                    out_shardings=SingleDeviceSharding(d))()
            for d in devices[:n_use]
        ]
        accums = list(zeros)
        # Async dispatch eagerly allocates EVERY queued program's outputs:
        # with more views than devices, stacking a second view chain onto a
        # device at >= 512^3 scale exhausts its HBM just like the single
        # chip path (see _run_shear's guard) — so before queueing another
        # chain on a device, drain its previous one with a tiny fetch.
        big = float(np.prod(out_shape)) * self.n_classes * 4 > _big_bytes()
        for v, (stack_fn, remap_fn) in enumerate(shear_fns):
            d = v % n_use
            if big and v >= n_use:
                np.asarray(accums[d][:1, :1, :1, 0])  # real sync (remote
                # transport's block_until_ready can return early)
            if self.logger:
                self.logger(f"View {v + 1}/{len(views)}: "
                            f"{np.round(views[v], 4)} "
                            f"(shear, device {d})")
            # w_v stays an UNcommitted host array so the jitted fns follow
            # their committed operands onto device d
            w_v = (np.asarray(W[v], np.float32) if W is not None
                   else np.ones((self.n_classes,), np.float32))
            stack = stack_fn(vols[d])
            pred = self._unet_fn(varss[d], stack)
            accums[d], _ = remap_fn(pred, accums[d], w_v,
                                    want_argmax=False)
            del stack, pred
        total = accums[0]
        add = jax.jit(jnp.add)
        for a in accums[1:]:
            total = add(total, jax.device_put(a, devices[0]))
        pack = self.n_classes <= 16 and out_shape[2] % 2 == 0
        out = _fused_argmax_graph(total, jnp.asarray(b), pack, true_shape)
        if pack:
            return _unpack_class_map(np.asarray(out), true_shape)
        return np.asarray(out)

    def predict_image_sharded(self, image, views, mesh, fusion_params=None,
                              n_planes="same+20"):
        """Multi-chip inference: shard the VIEWS across the mesh.

        Each device runs the fused sample->U-Net->remap pipeline for its
        local subset of views (volume + parameters replicated) and the
        weighted fusion accumulation reduces with a psum over ICI — the
        natural scale-out of the multi-planar method (each view is
        independent until the final linear fusion). Views pad to a multiple
        of the device count with zero-weight dummies.

        Returns the fused argmax class map (uint8, true shape).

        Resampler dispatch mirrors single-chip `predict_image`: shear-
        capable geometries run `_predict_sharded_shear` (per-device view
        placement, 2.3x faster resampling); the uniform gather shard_map
        program below is the exact fallback."""
        if self.resampler in ("auto", "shear"):
            out = self._predict_sharded_shear(image, views, mesh,
                                              fusion_params, n_planes)
            if out is not None:
                return out
            if self.resampler == "shear":
                raise ValueError(
                    "resampler='shear' requested but a view affine does "
                    "not factor within the memory guard; use 'auto' or "
                    "'gather'"
                )
        from jax.sharding import PartitionSpec as P

        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map

        from multiplanarunet_tpu.parallel.mesh import DATA_AXIS

        n_dev = int(mesh.devices.size)
        sampler = image.interpolator
        volume = self._stage_packed(sampler)
        out_shape = tuple(int(s) for s in volume.shape[:3])
        true_shape = tuple(int(s) for s in image.shape[:3])

        offsets, n_valid = self._prepare_offsets(image, n_planes)

        n_views = len(views)
        V_pad = -(-n_views // n_dev) * n_dev
        bases = np.tile(np.eye(3, dtype=np.float32), (V_pad, 1, 1))
        Ms = np.tile(np.eye(3, dtype=np.float32), (V_pad, 1, 1))
        ts = np.zeros((V_pad, 3), np.float32)
        w = np.zeros((V_pad, self.n_classes), np.float32)
        W = (np.asarray(fusion_params["fusion"]["W"], np.float32)
             if fusion_params is not None
             else np.ones((n_views, self.n_classes), np.float32))
        for v, view in enumerate(views):
            basis = geometry.plane_basis(view, noise_sd=0.0)
            bases[v] = basis
            Ms[v], ts[v] = self._remap_transform(image, basis, true_shape)
            w[v] = W[v]

        model, span, dim = self.model, self.span, self.dim
        chunk_for = self._chunk_for
        nc = self.n_classes
        g0 = np.float32(-(span // 2))
        g_step = np.float32((-2.0 * g0) / (dim - 1))
        o0 = np.float32(offsets[0])
        o_step = np.float32(offsets[1] - offsets[0])

        def per_view(variables, volume, origin, spacing, rot, valid_shape,
                     offs, fill, basis, M, t, w_v, accum):
            stack = sample_plane_stack_packed(
                volume, origin, spacing, rot, basis, offs, span, dim,
                fill, valid_shape=valid_shape,
            )
            planes = jnp.moveaxis(stack, 2, 0)
            chunk = chunk_for(planes.shape[0])
            chunks = planes.reshape(-1, chunk, dim, dim, planes.shape[-1])

            def body(_, xs):
                return None, model.apply(variables, xs, train=False)

            _, probs = jax.lax.scan(body, None, chunks)
            pred = jnp.moveaxis(
                probs.reshape(-1, dim, dim, nc), 0, 2
            ).astype(jnp.bfloat16)
            mapped = map_view_pred_affine(
                pred, g0, g_step, o0, o_step, M, t, out_shape, n_valid,
            ).astype(jnp.float32)
            return accum + w_v * mapped

        def shard_fn(variables, volume, origin, spacing, rot, valid_shape,
                     offs, fill, bases_l, Ms_l, ts_l, ws_l):
            accum = jnp.zeros(out_shape + (nc,), jnp.float32)

            def body(acc, xs):
                basis, M, t, w_v = xs
                return per_view(variables, volume, origin, spacing, rot,
                                valid_shape, offs, fill, basis, M, t, w_v,
                                acc), None

            accum, _ = jax.lax.scan(body, accum, (bases_l, Ms_l, ts_l, ws_l))
            return jax.lax.psum(accum, DATA_AXIS)

        import inspect

        sm_kwargs = {}
        sig = inspect.signature(shard_map).parameters
        if "check_rep" in sig:
            sm_kwargs["check_rep"] = False
        elif "check_vma" in sig:
            sm_kwargs["check_vma"] = False
        sharded = jax.jit(shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(), P(), P(), P(),
                      P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=P(),
            **sm_kwargs,
        ))
        accum = sharded(
            self.variables, volume,
            jnp.asarray(sampler.origin), jnp.asarray(sampler.spacing),
            sampler.device_rot(), jnp.asarray(sampler.valid_shape),
            jnp.asarray(offsets), jnp.asarray(sampler.scaled_bg_value),
            jnp.asarray(bases), jnp.asarray(Ms),
            jnp.asarray(ts), jnp.asarray(w),
        )
        if fusion_params is not None:
            b = jnp.asarray(np.asarray(fusion_params["fusion"]["b"],
                                       np.float32))[0]
            accum = accum + b
        fused_cls = jnp.argmax(accum, axis=-1).astype(jnp.uint8)
        return np.asarray(
            fused_cls[: true_shape[0], : true_shape[1], : true_shape[2]]
        )

    def predict_views_mapped(self, image, views, n_planes="same+20"):
        """Per-view mapped probability volumes (for fusion training).

        Always uses the exact gather path (fusion-weight training wants
        reference-exact per-view probabilities). Returns
        (n_views, X, Y, Z, nc) float32 on host (true shape)."""
        if self._view_fn is None:
            self._view_fn = self._build()
        sampler = image.interpolator
        volume = self._stage_packed(sampler)
        out_shape = tuple(int(s) for s in volume.shape[:3])
        true_shape = tuple(int(s) for s in image.shape[:3])
        offsets, n_valid = self._prepare_offsets(image, n_planes)
        out = np.empty((len(views),) + true_shape + (self.n_classes,),
                       np.float32)
        for v, view in enumerate(views):
            basis = geometry.plane_basis(view, noise_sd=0.0)
            M, t = self._remap_transform(image, basis, true_shape)
            accum = jnp.zeros(out_shape + (self.n_classes,), jnp.float32)
            _, mapped = self._view_fn(
                self.variables, volume,
                jnp.asarray(sampler.origin), jnp.asarray(sampler.spacing),
                sampler.device_rot(), jnp.asarray(sampler.valid_shape),
                jnp.asarray(basis), jnp.asarray(offsets),
                jnp.asarray(sampler.scaled_bg_value),
                jnp.ones((self.n_classes,), jnp.float32), accum,
                jnp.asarray(M), jnp.asarray(t),
                out_shape, n_valid, return_probs=True,
            )
            out[v] = np.asarray(
                mapped[: true_shape[0], : true_shape[1], : true_shape[2]]
            )
        return out

    def predict_views_points(self, image, views, n_planes="same+20",
                             max_points=None, key=None):
        """Device-resident fusion-training points for one labelled image.

        Same exact gather path as `predict_views_mapped`, but nothing
        volume-sized ever crosses the host<->device link: each view's
        mapped probability volume is cropped and flattened ON DEVICE, the
        labels are staged once as uint8 (n_vox bytes, the only H2D
        payload), and the stacked (n_pts, n_views, n_classes) float32
        points plus int32 targets are returned as device arrays for
        `_fit_fusion` to consume in place. The reference round-trips the
        full float32 probability volumes per view
        (`mpunet/bin/train_fusion.py:148-176`) — ~n_views * n_vox * C * 4
        bytes per image, which dominates wall-clock on slow transports.

        max_points: if set and the image has more voxels, train on a
        uniform random subset (device-side permutation under `key`); the
        fusion layer has only (V+1)*C parameters, so a few million points
        are statistically equivalent to all of them."""
        if self._view_fn is None:
            self._view_fn = self._build()
        sampler = image.interpolator
        volume = self._stage_packed(sampler)
        out_shape = tuple(int(s) for s in volume.shape[:3])
        true_shape = tuple(int(s) for s in image.shape[:3])
        offsets, n_valid = self._prepare_offsets(image, n_planes)
        n_vox = int(np.prod(true_shape))
        idx = None
        if max_points and n_vox > int(max_points):
            key = key if key is not None else jax.random.PRNGKey(0)
            idx = jax.random.permutation(key, n_vox)[: int(max_points)]
        labels = np.asarray(image.labels).reshape(-1)
        tgt_dtype = np.uint8 if self.n_classes <= 256 else np.int32
        targets = jnp.asarray(labels.astype(tgt_dtype))
        if idx is not None:
            targets = targets[idx]
        # Async dispatch allocates every queued view program's outputs
        # eagerly (see _run_shear); drain per view on large volumes.
        big = float(n_vox) * self.n_classes * 4 > _big_bytes()
        per_view = []
        for view in views:
            basis = geometry.plane_basis(view, noise_sd=0.0)
            M, t = self._remap_transform(image, basis, true_shape)
            accum = jnp.zeros(out_shape + (self.n_classes,), jnp.float32)
            _, mapped = self._view_fn(
                self.variables, volume,
                jnp.asarray(sampler.origin), jnp.asarray(sampler.spacing),
                sampler.device_rot(), jnp.asarray(sampler.valid_shape),
                jnp.asarray(basis), jnp.asarray(offsets),
                jnp.asarray(sampler.scaled_bg_value),
                jnp.ones((self.n_classes,), jnp.float32), accum,
                jnp.asarray(M), jnp.asarray(t),
                out_shape, n_valid, return_probs=True,
            )
            flat = mapped[: true_shape[0], : true_shape[1],
                          : true_shape[2]].reshape(-1, self.n_classes)
            if idx is not None:
                flat = flat[idx]
            del mapped
            per_view.append(flat)
            if big:
                np.asarray(flat[:1, :1])  # real sync (remote transport's
                # block_until_ready can return early)
        points = jnp.stack(per_view, axis=1)  # (n_pts, V, C)
        return points, targets.astype(jnp.int32)

    def _plane_offsets(self, image, n_planes):
        sample_res = self.span / (self.dim - 1)
        if n_planes == "by_radius":
            bounds = geometry.get_bounding_sphere_real_radius(image)
            n = int(2 * bounds / sample_res)
        else:
            extra = 0
            if n_planes == "same":
                n = self.dim
            elif isinstance(n_planes, str) and n_planes.startswith("same+"):
                extra = int(n_planes.split("+")[-1])
                n = self.dim + extra
            else:
                n = int(n_planes)
            bounds = (self.span + extra * sample_res) / 2
        return np.linspace(-bounds, bounds, n).astype(np.float32)


# ------------------------------------------------------- plane-stack helpers
def predict_volume(predict_fn, X, batch_size=8, axis=2):
    """Chunked model application over a plane stack (host-loop fallback;
    the fused path above is preferred). X: planes on `axis`."""
    X = jnp.moveaxis(jnp.asarray(X), axis, 0)
    outs = []
    for i in range(0, X.shape[0], batch_size):
        outs.append(predict_fn(X[i:i + batch_size]))
    out = jnp.concatenate(outs, axis=0)
    return jnp.moveaxis(out, 0, axis)


def map_real_space_pred(pred, grid, inv_basis, affine, true_shape,
                        method="nearest"):
    """Standalone remap of a (d, d, P, C) stack onto the voxel grid.

    `grid` is the (real_axis, real_axis, offsets) tuple returned by
    `get_view_from`."""
    real_axis, _, offsets = grid
    A = np.asarray(affine, np.float64)[:3, :3]
    center = A @ ((np.asarray(true_shape[:3]) - 1) / 2.0)
    inv_basis = np.asarray(inv_basis, np.float64)
    M = (inv_basis @ A).astype(np.float32)
    t = (-inv_basis @ center).astype(np.float32)
    out = map_view_pred_affine(
        jnp.asarray(pred),
        jnp.asarray(np.float32(real_axis[0])),
        jnp.asarray(np.float32(real_axis[1] - real_axis[0])),
        jnp.asarray(np.float32(offsets[0])),
        jnp.asarray(np.float32(offsets[1] - offsets[0])),
        jnp.asarray(M), jnp.asarray(t),
        tuple(int(s) for s in true_shape[:3]), len(offsets), method=method,
    )
    return np.asarray(out)


# ------------------------------------------------------------------ 3D paths
_BOX_RECON_FNS = OrderedDict()


def _box_recon_fn(predict_fn, sample_dim, real_box_dim):
    """One jitted program per batch of iso boxes: lax.scan over the
    (corner, rot, inv_rot) triples, each step sampling the box on device
    (`sample_box`), running the model and scatter-adding into the recon
    volume. Replaces ~2 dispatch round-trips per box with one program.
    The cached entry pins predict_fn so its id() can't be recycled."""
    key = (id(predict_fn), int(sample_dim), float(real_box_dim))
    hit = _BOX_RECON_FNS.get(key)
    if hit is not None and hit[0] is predict_fn:
        return hit[1]
    box_dim = jnp.float32(real_box_dim)

    def _run(vol, origin, spacing, rotm, fill, valid_shape, true_shape_f,
             corners, rots, inv_rots, pred_vol):
        def body(pv, x):
            corner, rot, inv = x
            im = sample_box(vol, origin, spacing, rotm, corner,
                            float(real_box_dim), rot, sample_dim, fill,
                            valid_shape=valid_shape)
            probs = predict_fn(im[None])[0]
            pv = scatter_box_pred(pv, probs, corner, box_dim, inv, rotm,
                                  origin, spacing, sample_dim, true_shape_f)
            return pv, 0

        pred_vol, _ = jax.lax.scan(body, pred_vol,
                                   (corners, rots, inv_rots))
        return pred_vol

    fn = jax.jit(_run)
    _BOX_RECON_FNS[key] = (predict_fn, fn)
    while len(_BOX_RECON_FNS) > 8:
        _BOX_RECON_FNS.popitem(last=False)
    return fn


def pred_3D_iso(predict_fn, sequence, image, extra_boxes, min_coverage=None,
                logger=None, want_argmax=False):
    """Scanner-space box inference with on-device scatter-add recon
    (parity: `utils/fusion/fuse_and_predict.py:200-293`).

    TPU-native: all base (and all extra) boxes run as ONE jitted scan —
    sample_box -> model -> scatter_box_pred chained on device with no
    per-box host round-trips; the reference predicts per box on the host.
    want_argmax=True fetches only the uint8 class map (argmax of the box
    sums — identical to argmaxing the returned volume) instead of the full
    (X, Y, Z, n_classes) float32 sums: ~n_classes*4 x less device->host
    transfer, the dominant cost on remote-device transports."""
    n_classes = sequence.n_classes
    sampler = image.interpolator
    true_shape = tuple(int(s) for s in image.shape[:3])
    pred_vol = jnp.zeros(true_shape + (n_classes,), jnp.float32)

    base_corners = np.asarray(sequence.base_placements(image), np.float32)
    total_base = len(base_corners)
    if isinstance(extra_boxes, str):
        total_extra = int(float(extra_boxes.rstrip("x")) * total_base)
    else:
        total_extra = int(extra_boxes)

    run = _box_recon_fn(predict_fn, sequence.sample_dim,
                        float(sequence.real_box_dim))
    eye = np.eye(3, dtype=np.float32)

    def run_boxes(pred_vol, corners, rots, inv_rots, label):
        if logger:
            logger(f"   {len(corners)} {label} boxes in one device program",
                   print_calling_method=False)
        return run(
            sampler.device_volume(), jnp.asarray(sampler.origin),
            jnp.asarray(sampler.spacing), sampler.device_rot(),
            jnp.asarray(sampler.scaled_bg_value),
            jnp.asarray(sampler.valid_shape),
            jnp.asarray(true_shape, jnp.float32),
            jnp.asarray(corners), jnp.asarray(rots), jnp.asarray(inv_rots),
            pred_vol,
        )

    def draw_random(n):
        """Same np.random stream as the per-box generator it replaced
        (`get_N_random_patches_from`: placement, then rotation)."""
        corners, rots, invs = [], [], []
        for _ in range(int(n)):
            corners.append(geometry.random_box_placement(
                image.real_shape, sequence.real_box_dim).astype(np.float32))
            if sequence.noise_sd:
                rot = geometry.random_box_rotation(
                    sequence.noise_sd).astype(np.float32)
            else:
                rot = eye
            rots.append(rot)
            invs.append(np.linalg.inv(
                rot.astype(np.float64)).astype(np.float32))
        return (np.stack(corners), np.stack(rots), np.stack(invs))

    pred_vol = run_boxes(
        pred_vol, base_corners,
        np.broadcast_to(eye, (total_base, 3, 3)),
        np.broadcast_to(eye, (total_base, 3, 3)), "base")
    if total_extra:
        pred_vol = run_boxes(pred_vol, *draw_random(total_extra), "extra")

    if min_coverage:
        # Coverage check on device: one scalar fetch per round instead of
        # pulling the whole float32 volume to the host between rounds
        coverage = float(_coverage_fraction(pred_vol))
        while coverage < min_coverage:
            pred_vol = run_boxes(
                pred_vol, *draw_random(max(1, total_base // 4)), "coverage")
            coverage = float(_coverage_fraction(pred_vol))
    if want_argmax:
        return np.asarray(_argmax_u8(pred_vol))
    return np.asarray(pred_vol)  # un-normalized sums, as in the reference


@jax.jit
def _coverage_fraction(v):
    """Fraction of voxels any box touched (matches np.isclose(v, 0))."""
    return jnp.mean(~jnp.all(jnp.isclose(v, 0), axis=-1),
                    dtype=jnp.float32)


@jax.jit
def _argmax_u8(v):
    return jnp.argmax(v, -1).astype(jnp.uint8)


_PATCH_RECON_FNS = OrderedDict()


def _patch_recon_fn(predict_fn, d, want_argmax):
    """One jitted program for a whole voxel-patch recon: lax.scan over the
    patch corners, each step dynamic-slicing the staged scaled volume,
    running the model (the nested jitted predict_fn traces inline) and
    scatter-adding the softmax into the device accumulator. jit's own cache
    handles per-(volume shape, corner count) specializations."""
    # The cached entry pins predict_fn (strong ref) so an id() can never be
    # recycled by a dead function while its key is still in the cache
    key = (id(predict_fn), int(d), bool(want_argmax))
    hit = _PATCH_RECON_FNS.get(key)
    if hit is not None and hit[0] is predict_fn:
        return hit[1]

    def _run(vol, corners, recon):
        def body(recon, c):
            p = jax.lax.dynamic_slice(
                vol, (c[0], c[1], c[2], 0),
                (d, d, d, vol.shape[-1]))
            pred = predict_fn(p[None])[0].astype(jnp.float32)
            cur = jax.lax.dynamic_slice(
                recon, (c[0], c[1], c[2], 0),
                (d, d, d, recon.shape[-1]))
            return jax.lax.dynamic_update_slice(
                recon, cur + pred, (c[0], c[1], c[2], 0)), 0

        recon, _ = jax.lax.scan(body, recon, corners)
        if want_argmax:
            # argmax of the raw sums == argmax of the normalized probs
            return jnp.argmax(recon, -1).astype(jnp.uint8)
        return recon / jnp.maximum(recon.sum(-1, keepdims=True), 1e-8)

    fn = jax.jit(_run)
    _PATCH_RECON_FNS[key] = (predict_fn, fn)
    while len(_PATCH_RECON_FNS) > 8:
        _PATCH_RECON_FNS.popitem(last=False)
    return fn


def predict_3D_patches(predict_fn, patches, image, n_extra=0, n_classes=None,
                       logger=None, want_argmax=False):
    """Voxel-space patch recon: slice-add softmax sums, normalize.

    TPU-native path: when every axis fits a full patch, the whole recon is
    ONE jitted device program over all base + extra corners with a single
    host fetch — the reference (and the previous host loop here) fetches
    every patch's full softmax to the host and scatter-adds in numpy
    (reference `mpunet/utils/fusion/fuse_and_predict.py:171-197`), which is
    device->host-bandwidth-bound. Volumes smaller than the patch keep the
    host loop (center_expand padding parity). want_argmax=True fetches only
    the uint8 class map."""
    i1, i2, i3 = (int(s) for s in image.shape[:3])
    n_classes = n_classes or patches.n_classes
    d = patches.dim
    sampler = getattr(image, "interpolator", None)
    if min(i1, i2, i3) >= d and sampler is not None:
        corners = np.asarray(patches.base_corners(image), np.int64)
        if n_extra:
            extra = np.asarray(
                [patches._random_corner(image.image.shape)
                 for _ in range(int(n_extra))], np.int64)
            corners = np.concatenate([corners, extra.reshape(-1, 3)])
        if logger:
            logger(f"   {len(corners)} patches in one device program")
        run = _patch_recon_fn(predict_fn, d, want_argmax)
        out = run(
            sampler.device_volume(),
            jnp.asarray(corners.astype(np.int32)),
            jnp.zeros((i1, i2, i3, n_classes), jnp.float32),
        )
        return np.asarray(out)

    recon = np.zeros((i1, i2, i3, n_classes), np.float32)
    for patch, (i, k, v), status in patches.get_patches_from(image, n_extra):
        pred = np.asarray(predict_fn(np.asarray(patch)[None])[0])
        recon[i:i + d, k:k + d, v:v + d] += pred[
            : min(d, i1 - i), : min(d, i2 - k), : min(d, i3 - v)
        ]
    if want_argmax:
        return recon.argmax(-1).astype(np.uint8)
    recon /= np.maximum(recon.sum(-1, keepdims=True), 1e-8)
    return recon


def predict_3D_patches_binary(predict_fn, patches, image, n_extra=0,
                              logger=None, threshold=0.20):
    """Binary vote recon (parity: `fuse_and_predict.py:140-168`)."""
    i1, i2, i3 = image.shape[:3]
    d = patches.dim
    recon = np.zeros((i1, i2, i3, 2), np.uint32)
    for patch, (i, k, v), status in patches.get_patches_from(image, n_extra):
        pred = np.asarray(predict_fn(np.asarray(patch)[None])[0]).squeeze()
        mask = pred > 0.5
        sl = np.s_[i:i + d, k:k + d, v:v + d]
        recon[sl + (0,)] += ~mask[: i1 - i, : i2 - k, : i3 - v]
        recon[sl + (1,)] += mask[: i1 - i, : i2 - k, : i3 - v]
    total = recon.sum(-1)
    return (recon[..., 1] > threshold * total).astype(np.uint8)


# ------------------------------------------------------------- convenience
def predict_single(image, model, variables, hparams, views=None, logger=None):
    """Predict the full (n_views, X, Y, Z, nc) stack (iso_live) or the
    scatter-add volume (iso_live_3d) for a single ImagePair (parity:
    `utils/fusion/fuse_and_predict.py:predict_single`)."""
    import os

    import jax

    mode = hparams["fit"]["intrp_style"].lower()
    if mode not in ("iso_live", "iso_live_3d"):
        raise ValueError(f"predict_single supports iso_live modes, got {mode}")
    image.set_bg_value(hparams.get_from_anywhere("bg_value"))
    image.set_scaler(hparams.get_from_anywhere("scaler"))
    if mode == "iso_live":
        if views is None:
            views = np.load(
                os.path.join(hparams.project_path, "views.npz")
            )["arr_0"]
        predictor = MultiViewPredictor(
            model, variables, sample_dim=hparams["build"]["dim"],
            real_space_span=hparams["fit"]["real_space_span"],
            n_classes=hparams["build"]["n_classes"], logger=logger,
        )
        with image.loaded_in_context():
            return predictor.predict_views_mapped(image, views)
    from multiplanarunet_tpu.sequences import get_sequence

    seq = get_sequence(
        data_queue=_single_image_queue(image),
        is_validation=True, logger=logger,
        dim=hparams["build"]["dim"],
        n_classes=hparams["build"]["n_classes"],
        no_log=True, **hparams["fit"],
    )
    predict_fn = jax.jit(lambda x: model.apply(variables, x, train=False))
    with image.loaded_in_context():
        return pred_3D_iso(predict_fn, seq, image, extra_boxes="3x",
                           min_coverage=None)


def _single_image_queue(image):
    from contextlib import contextmanager

    class _Q:
        def get_random_image(self):
            @contextmanager
            def ctx():
                yield image

            return ctx()

    return _Q()
