"""jax.profiler trace + per-op attribution of the real 256^3 predict
(VERDICT r4 item 1).

The 256^3 bench is ~90% U-Net forward at ~50% of bf16 peak and every
other stage is at its floor, so the conv stack is the only headline
lever left. Synthetic fori_loop probes proved invalid (XLA hoists the
loop-invariant op even through optimization_barrier — every section
timed as pure loop overhead), so this probe traces the REAL predictor
with jax.profiler and aggregates device time per fused HLO op from the
xplane protobuf (parsed with TF's xplane_pb2; TF 2.21 is in-env).

Usage: python benchmarks/profile_predict.py [size] [--views N]
Writes the trace under /tmp/mp_profile and prints a per-op table
(top ops by total device time, grouped by op category).
"""
from __future__ import annotations

import glob
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, ".")


def run_traced_predict(size, n_views, log_dir):
    from multiplanarunet_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from multiplanarunet_tpu.image.volume_sampler import VolumeSampler
    from multiplanarunet_tpu.models import UNet, init_model_variables
    from multiplanarunet_tpu.ops import geometry
    from multiplanarunet_tpu.utils.fusion import MultiViewPredictor

    n_classes, n_channels = 7, 1
    rng = np.random.RandomState(0)
    volume = rng.rand(size, size, size, n_channels).astype(np.float32)
    affine = np.eye(4)

    class _Image:
        shape = np.array([size, size, size, n_channels])

        def __init__(self):
            self.affine = affine
            self.interpolator = VolumeSampler(
                volume, None, affine, bg_value=[0.0] * n_channels)
            self.predict_mode = True

    image = _Image()
    model = UNet(n_classes=n_classes, dim=size, n_channels=n_channels,
                 depth=4, complexity_factor=2, dtype=jnp.bfloat16)
    variables = init_model_variables(model, rng=jax.random.PRNGKey(0))
    views = geometry.sample_random_views_with_angle_restriction(
        n_views, 60, rng=np.random.RandomState(42))
    fusion_params = {"fusion": {
        "W": np.ones((n_views, n_classes), np.float32),
        "b": np.zeros((1, n_classes), np.float32)}}
    predictor = MultiViewPredictor(
        model, variables, sample_dim=size, real_space_span=float(size - 1),
        n_classes=n_classes)

    def run_once():
        t0 = time.time()
        fused, _ = predictor.predict_image(
            image, views, fusion_params=fusion_params, n_planes="same+20",
            return_per_view=False)
        return time.time() - t0

    print("warmup (compile)...", flush=True)
    print(f"warmup: {run_once():.2f} s", flush=True)
    print(f"steady: {run_once():.2f} s", flush=True)

    print("tracing...", flush=True)
    with jax.profiler.trace(log_dir):
        dt = run_once()
    print(f"traced run: {dt:.2f} s", flush=True)
    return dt


CATEGORY_RULES = (
    ("convolution", "conv"),
    ("fusion", "fusion"),
    ("dot", "dot"),
    ("gather", "gather"),
    ("scatter", "scatter"),
    ("dynamic-update-slice", "dus"),
    ("dynamic-slice", "ds"),
    ("copy", "copy"),
    ("transpose", "transpose"),
    ("reduce-window", "reduce-window"),
    ("reduce", "reduce"),
    ("all-reduce", "collective"),
    ("broadcast", "broadcast"),
    ("concatenate", "concat"),
    ("reshape", "reshape"),
    ("convert", "convert"),
    ("iota", "iota"),
    ("select", "select"),
    ("slice", "slice"),
)


def _category(name):
    low = name.lower()
    for pat, cat in CATEGORY_RULES:
        if pat in low:
            return cat
    return "other"


def parse_xplanes(log_dir, top=60):
    """Aggregate device time per op from the sync 'XLA Ops' line of the
    TPU plane. Control-flow wrappers (while/conditional/call) nest their
    children on the same line, so they are excluded from the leaf budget;
    the async line (copy-starts whose spans cover overlap/wait, not
    bandwidth) is reported separately. Per-op XStats (flops,
    bytes accessed) give achieved TFLOP/s per fusion where present."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(log_dir, "plugins/profile/*/*"
                                          ".xplane.pb")))
    if not paths:
        print(f"NO xplane.pb under {log_dir}", flush=True)
        return False
    per_op = defaultdict(lambda: [0.0, 0, 0.0, 0.0])  # ps, n, flops, bytes
    ctrl_ps = module_ps = async_ps = 0.0
    found_device = False
    for path in paths:
        xspace = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xspace.ParseFromString(f.read())
        for plane in xspace.planes:
            if "TPU" not in plane.name or "host" in plane.name.lower():
                continue
            emeta = plane.event_metadata
            smeta = plane.stat_metadata
            for line in plane.lines:
                if line.events:
                    found_device = True
                lname = line.name.lower()
                for ev in line.events:
                    name = emeta[ev.metadata_id].name
                    if "module" in lname:
                        module_ps += ev.duration_ps
                        continue
                    if "async" in lname:
                        async_ps += ev.duration_ps
                        continue
                    if "xla ops" not in lname:
                        continue
                    base = name.lstrip("%").split(" ")[0].split("=")[0]
                    if base.split(".")[0] in ("while", "conditional",
                                              "call"):
                        ctrl_ps += ev.duration_ps
                        continue
                    rec = per_op[name]
                    rec[0] += ev.duration_ps
                    rec[1] += 1
                    for st in ev.stats:
                        sname = smeta[st.metadata_id].name
                        if sname == "flops":
                            rec[2] += st.uint64_value or st.int64_value
                        elif sname in ("bytes accessed",
                                       "bytes_accessed"):
                            rec[3] += st.uint64_value or st.int64_value
    if not found_device:
        print("no device-plane events captured", flush=True)
        return False
    total = sum(r[0] for r in per_op.values())
    print(f"\nmodules total {module_ps / 1e9:.1f} ms | control-flow "
          f"wrappers {ctrl_ps / 1e9:.1f} ms | async-line (overlap spans) "
          f"{async_ps / 1e9:.1f} ms | leaf ops {total / 1e9:.1f} ms",
          flush=True)
    per_cat = defaultdict(float)
    for name, rec in per_op.items():
        per_cat[_category(name)] += rec[0]
    print(f"\n== leaf device time by op category ==", flush=True)
    for cat, ps in sorted(per_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:16s} {ps / 1e9:10.2f} ms {ps / total * 100:5.1f}%",
              flush=True)
    print(f"\n== top {top} leaf ops ==", flush=True)
    print(f"  {'ms':>9s} {'%':>5s} {'n':>5s} {'TF/s':>7s} {'GB/s':>7s}  op",
          flush=True)
    for name, (ps, n, fl, by) in sorted(per_op.items(),
                                        key=lambda kv: -kv[1][0])[:top]:
        s = ps / 1e12
        tf = fl / s / 1e12 if s and fl else 0.0
        gb = by / s / 1e9 if s and by else 0.0
        print(f"  {ps / 1e9:9.2f} {ps / total * 100:5.1f} {n:5d} "
              f"{tf:7.1f} {gb:7.0f}  {name[:200]}", flush=True)
    return True


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    size = int(args[0]) if args else 256
    n_views = 6
    if "--views" in sys.argv:
        n_views = int(sys.argv[sys.argv.index("--views") + 1])
    log_dir = os.environ.get("MP_PROFILE_DIR", "/tmp/mp_profile")
    if "--parse-only" not in sys.argv:
        # clear stale xplanes: the parser aggregates EVERY trace in the
        # dir, so a leftover run silently contaminates the op table
        import shutil

        shutil.rmtree(log_dir, ignore_errors=True)
        run_traced_predict(size, n_views, log_dir)
    parse_xplanes(log_dir)


if __name__ == "__main__":
    main()
