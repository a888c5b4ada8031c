"""On-device elastic deformation (Simard-style) for 2D slices and 3D boxes.

The reference runs elastic augmentation per-sample on the host: scipy
gaussian_filter over a uniform random field, then per-channel scipy
interpolation (`mpunet/augmentation/elastic_deformation.py`). Here the whole
batch deforms in one fused XLA computation on device:

  * random fields come from the JAX PRNG (uniform in [-1, 1]),
  * smoothing is a separable truncated-gaussian convolution with a STATIC
    kernel radius (sized for the largest supported sigma) whose weights are
    computed from the per-sample dynamic sigma — so one compiled kernel
    serves every (alpha, sigma) draw,
  * resampling is a bilinear (2D) / trilinear (3D) gather with per-channel
    background fill for the image and nearest-neighbor for labels,
  * the per-sample apply/skip decision is a select — no host branching.

Displacements are in pixel units on the sampled slice/box grid, matching the
reference's coordinate convention (axes = arange(shape)).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from multiplanarunet_tpu.ops.interp import grid_gather

# scipy's gaussian_filter truncates at 4 sigma by default
_TRUNCATE = 4.0


def _gauss_kernel(sigma, radius):
    """(2*radius+1,) normalized gaussian weights for a DYNAMIC sigma with a
    STATIC radius; taps beyond truncate*sigma are zeroed like scipy."""
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    sigma = jnp.maximum(jnp.asarray(sigma, jnp.float32), 1e-3)
    w = jnp.exp(-0.5 * (x / sigma) ** 2)
    w = jnp.where(jnp.abs(x) <= _TRUNCATE * sigma + 0.5, w, 0.0)
    return w / jnp.sum(w)


def _blur_axis(field, kernel, axis):
    """Zero-padded 1D convolution of `field` along `axis` (any rank)."""
    moved = jnp.moveaxis(field, axis, -1)
    shape = moved.shape
    flat = moved.reshape(-1, 1, shape[-1])  # (N, 1 feature, length)
    out = jax.lax.conv_general_dilated(
        flat, kernel.reshape(1, 1, -1),
        window_strides=(1,), padding=[(kernel.shape[0] // 2,) * 2],
        dimension_numbers=("NCH", "IOH", "NCH"),
    )
    return jnp.moveaxis(out.reshape(shape), -1, axis)


def smooth_field(field, sigma, radius):
    """Separable gaussian blur of a 2D/3D field (zero boundary)."""
    kernel = _gauss_kernel(sigma, radius)
    for ax in range(field.ndim):
        field = _blur_axis(field, kernel, ax)
    return field


def _bilinear_gather_2d(img, px, py, fill):
    """img (H, W, C) sampled at pixel coords px/py (H, W) with bounds fill.

    The 4 bilinear corners of each cell are pre-packed into one row so the
    warp is a SINGLE gather (TPU gathers cost per-GATHER, not per-byte —
    a hardware trace showed the 4-gather form as 4 of the 5 largest
    sampler kernels at 2.7 ms each, batch 16 / dim 128). The pack itself
    is 4 shifted copies of a small in-VMEM plane — pure bandwidth."""
    H, W, C = img.shape
    oob = (px < 0) | (px > H - 1) | (py < 0) | (py > W - 1)
    x0 = jnp.clip(jnp.floor(px), 0, H - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(py), 0, W - 2).astype(jnp.int32)
    fx = px - x0
    fy = py - y0
    p = jnp.pad(img, ((0, 1), (0, 1), (0, 0)), mode="edge")
    packed = jnp.stack(
        [p[:H, :W], p[:H, 1:W + 1], p[1:H + 1, :W], p[1:H + 1, 1:W + 1]],
        axis=2,
    )  # (H, W, 4, C)
    rows = jnp.take(packed.reshape(-1, 4 * C),
                    (x0 * W + y0).reshape(-1), axis=0).reshape(
        x0.shape + (4, C))
    w = jnp.stack(
        [(1 - fx) * (1 - fy), (1 - fx) * fy, fx * (1 - fy), fx * fy],
        axis=-1,
    )
    out = jnp.sum(rows * w[..., None], axis=-2)
    return jnp.where(oob[..., None], fill, out)


def _nearest_gather_2d(lab, px, py, fill_class):
    H, W = lab.shape
    oob = (px < 0) | (px > H - 1) | (py < 0) | (py > W - 1)
    x0 = jnp.clip(jnp.floor(px), 0, H - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(py), 0, W - 2).astype(jnp.int32)
    xi = jnp.where(px - x0 <= 0.5, x0, x0 + 1)
    yi = jnp.where(py - y0 <= 0.5, y0, y0 + 1)
    out = jnp.take(lab.reshape(-1), (xi * W + yi).reshape(-1)).reshape(xi.shape)
    return jnp.where(oob, fill_class, out)


@partial(jax.jit, static_argnames=("radius",))
def elastic_deform_2d_batch(key, images, labels, alphas, sigmas, apply_mask,
                            bg_values, radius=64):
    """Deform a batch of 2D slices (and labels) with per-sample fields.

    Args:
      key:        PRNG key.
      images:     (B, d, d, C) float.
      labels:     (B, d, d) int/float labels (pass zeros if unused).
      alphas:     (B,) displacement magnitudes (pixels).
      sigmas:     (B,) field smoothness.
      apply_mask: (B,) bool — samples with False pass through unchanged.
      bg_values:  (B, C) per-sample per-channel fill.
      radius:     static blur kernel radius (>= 4 * max expected sigma / ~2;
                  default sized for sigma <= ~30 at the reference's defaults).

    Returns (deformed_images, deformed_labels)."""
    B, d, _, C = images.shape
    kx, ky = jax.random.split(key)
    fx = jax.random.uniform(kx, (B, d, d), minval=-1.0, maxval=1.0)
    fy = jax.random.uniform(ky, (B, d, d), minval=-1.0, maxval=1.0)

    def per_sample(img, lab, fx_i, fy_i, alpha, sigma, apply, bg):
        dx = smooth_field(fx_i, sigma, radius) * alpha
        dy = smooth_field(fy_i, sigma, radius) * alpha
        gx = jnp.arange(d, dtype=jnp.float32)[:, None] + dx
        gy = jnp.arange(d, dtype=jnp.float32)[None, :] + dy
        im_out = _bilinear_gather_2d(img, gx, gy, bg)
        lab_out = _nearest_gather_2d(lab, gx, gy, jnp.zeros((), lab.dtype))
        im_out = jnp.where(apply, im_out, img)
        lab_out = jnp.where(apply, lab_out, lab)
        return im_out, lab_out

    return jax.vmap(per_sample)(images, labels, fx, fy,
                                alphas.astype(jnp.float32),
                                sigmas.astype(jnp.float32),
                                apply_mask, bg_values)


@partial(jax.jit, static_argnames=("radius",))
def elastic_deform_3d_batch(key, images, labels, alphas, sigmas, apply_mask,
                            bg_values, radius=52):
    """3D analogue of `elastic_deform_2d_batch` for (B, d, d, d, C) boxes."""
    B, d, _, _, C = images.shape
    keys = jax.random.split(key, 3)
    fields = [
        jax.random.uniform(k, (B, d, d, d), minval=-1.0, maxval=1.0)
        for k in keys
    ]

    def per_sample(img, lab, f0, f1, f2, alpha, sigma, apply, bg):
        disp = [smooth_field(f, sigma, radius) * alpha for f in (f0, f1, f2)]
        base = [
            jnp.arange(d, dtype=jnp.float32).reshape(
                [-1 if i == ax else 1 for i in range(3)]
            )
            for ax in range(3)
        ]
        pts = jnp.stack(
            [b + dsp for b, dsp in zip(base, disp)], axis=-1
        )  # (d, d, d, 3)
        # corner-packed trilinear: ONE gather instead of eight (per-gather
        # cost dominates on TPU; the packed box is a small transient)
        from multiplanarunet_tpu.ops.interp import (
            grid_gather_packed,
            pack_corners,
        )

        im_out = grid_gather_packed(pack_corners(img), jnp.zeros(3),
                                    jnp.ones(3), pts, fill=bg)
        lab_out = grid_gather(lab[..., None].astype(jnp.float32),
                              jnp.zeros(3), jnp.ones(3), pts,
                              method="nearest", fill=0.0)[..., 0]
        im_out = jnp.where(apply, im_out, img)
        lab_out = jnp.where(apply, lab_out, lab.astype(jnp.float32))
        return im_out, lab_out

    return jax.vmap(per_sample)(images, labels, *fields,
                                alphas.astype(jnp.float32),
                                sigmas.astype(jnp.float32),
                                apply_mask, bg_values)
