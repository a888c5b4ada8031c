"""Same-window A/B of inference-graph restructurings of the 2D U-Net
(VERDICT r4 item 1 — the conv stack is ~90% of predict wall time).

Times the REAL per-view program shape (lax.scan over 6 chunks of 46
planes of 256^2 through the bench-config U-Net, bf16) for each variant:

  baseline   upsample+conv2x2, flax BatchNorm (f32 promotion pass)
  fused_bn   BN as precomputed compute-dtype affine (FusedBNAffine)
  dilated    up-conv as ONE input-dilated 3x3 conv (DilatedUpConv)
  both       fused_bn + dilated
  skip_bn    BN dropped entirely — the floor any BN rework can reach
             (NOT numerically valid; bound only)

Each timing is one dispatch of a ~0.5 s program, so the axon transport's
per-dispatch latency is noise; the fori_loop hoisting hazard that
invalidated unet_layer_probe.py does not apply (the scan consumes real
stacked input and returns the stacked output). Also checks max|delta| vs
baseline on one chunk (f32) so the numerics claim is measured, not
assumed.

Usage: python benchmarks/unet_variants_probe.py [dim] [chunk] [reps]
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    from multiplanarunet_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from multiplanarunet_tpu.models import UNet, init_model_variables

    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 46
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    n_steps = (dim + 20 + chunk - 1) // chunk  # same+20 planes per view
    n_classes = 7
    print(f"device: {jax.devices()[0]} | dim={dim} chunk={chunk} "
          f"steps={n_steps} reps={reps}", flush=True)

    base = UNet(n_classes=n_classes, dim=dim, n_channels=1, depth=4,
                complexity_factor=2, dtype=jnp.bfloat16)
    variables = init_model_variables(base, rng=jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    chunks = jnp.asarray(
        rng.rand(n_steps, chunk, dim, dim, 1).astype(np.float32),
        jnp.bfloat16)

    from multiplanarunet_tpu.utils.conv_arithmetics import unet_forward_flops
    flops = unet_forward_flops(dim, n_classes, 1, depth=4,
                               complexity_factor=2) * n_steps * chunk

    variants = [
        ("baseline", {}),
        ("fused_bn", {"predict_fused_bn": True}),
        ("dilated", {"dilated_upconv": True}),
        ("both", {"predict_fused_bn": True, "dilated_upconv": True}),
        # lane-friendly channel padding (VERDICT r4 item 3): filters
        # 90/181/362/724/1448 -> multiples of 128/8; exact zero-pad
        # embedding of the same weights (models/unet.lane_pad_variables)
        ("both+pad128", {"predict_fused_bn": True, "dilated_upconv": True,
                         "lane_pad": 128}),
        ("both+pad8", {"predict_fused_bn": True, "dilated_upconv": True,
                       "lane_pad": 8}),
        # out-conv padded to 8 classes (dummy logit -1e9 -> softmax
        # identical over the real 7; sliced after softmax) — probes the
        # pathological {1,4,3,2,0} out-conv fusion layout VALIDATION 30
        # traced at 4.4 ms/call
        ("both+out8", {"predict_fused_bn": True, "dilated_upconv": True,
                       "_out8": True}),
        ("skip_bn(floor)", {"predict_skip_bn": True}),
    ]

    def make_fn(model):
        def fwd(variables, chunks):
            def body(_, xs):
                out = model.apply(variables, xs, train=False)
                return None, out.astype(jnp.bfloat16)
            _, probs = jax.lax.scan(body, None, chunks)
            return probs
        return jax.jit(fwd)

    ref_chunk = None
    t_base = None
    from multiplanarunet_tpu.models.unet import lane_pad_variables

    def make_fn_out8(model8):
        def fwd(variables, chunks):
            def body(_, xs):
                out = model8.apply(variables, xs, train=False)
                return None, out[..., :n_classes].astype(jnp.bfloat16)
            _, probs = jax.lax.scan(body, None, chunks)
            return probs
        return jax.jit(fwd)

    def out8_setup():
        import flax
        model8 = base.copy(n_classes=n_classes + 1,
                           predict_fused_bn=True, dilated_upconv=True)
        flat = flax.traverse_util.flatten_dict(
            flax.core.unfreeze(jax.tree.map(np.asarray, variables)))
        k = ("params", "out_conv", "kernel")
        b = ("params", "out_conv", "bias")
        flat[k] = np.concatenate(
            [flat[k], np.zeros(flat[k].shape[:-1] + (1,), flat[k].dtype)],
            axis=-1)
        flat[b] = np.concatenate(
            [flat[b], np.full((1,), -1e9, flat[b].dtype)])
        vs8 = jax.tree.map(jnp.asarray,
                           flax.traverse_util.unflatten_dict(flat))
        return make_fn_out8(model8), vs8

    for name, flags in variants:
        if flags.pop("_out8", False):
            fn, vs = out8_setup()
        else:
            model = base.copy(**flags) if flags else base
            fn = make_fn(model)
            vs = (jax.tree.map(jnp.asarray,
                               lane_pad_variables(base, variables,
                                                  flags["lane_pad"]))
                  if flags.get("lane_pad") else variables)
        out = fn(vs, chunks)
        _ = float(jnp.sum(out[0, 0, 0, 0]))  # compile+run sync
        best = float("inf")
        times = []
        for _ in range(reps):
            t0 = time.time()
            out = fn(vs, chunks)
            _ = float(jnp.sum(out[0, 0, 0, 0]))
            dt = time.time() - t0
            times.append(dt)
            best = min(best, dt)
        # numerics vs baseline on one chunk (f32 compare of bf16 outputs)
        one = out[0].astype(jnp.float32)
        if ref_chunk is None:
            ref_chunk = one
            t_base = best
            delta = 0.0
        else:
            delta = float(jnp.max(jnp.abs(one - ref_chunk)))
        tf = flops / best / 1e12
        print(f"  {name:16s} best {best * 1e3:8.1f} ms "
              f"(runs {[round(t * 1e3) for t in times]}) "
              f"{tf:6.1f} TF/s  {tf / 197 * 100:5.1f}% peak  "
              f"vs base {best / t_base:5.3f}x  max|d|={delta:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
