"""Decompose the train step: fwd / fwd+bwd / full step, batch sweep.

Usage: python benchmarks/step_breakdown_probe.py [dim] [batches ...]
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
    import optax

    from multiplanarunet_tpu.evaluate.losses import (
        SparseCategoricalCrossentropy,
    )
    from multiplanarunet_tpu.models import UNet, init_model_variables
    from multiplanarunet_tpu.train.train_step import (
        create_train_state,
        make_train_step,
    )

    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    batches = [int(b) for b in sys.argv[2:]] or [16, 32, 64]

    model = UNet(n_classes=4, dim=dim, n_channels=1, depth=4,
                 complexity_factor=2, dtype=jnp.bfloat16)
    variables = init_model_variables(model, rng=jax.random.PRNGKey(0))
    tx = optax.inject_hyperparams(optax.adam)(learning_rate=1e-4)
    loss_obj = SparseCategoricalCrossentropy()

    def sync(x):
        np.asarray(jnp.ravel(jax.tree_util.tree_leaves(x)[0])[:1])

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))

    def loss_fn(params, bs, x, y):
        out, _ = model.apply({"params": params, "batch_stats": bs},
                             x, train=True,
                             mutable=["batch_stats"])
        return loss_obj(y, out)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))

    for B in batches:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(B, dim, dim, 1).astype(np.float32))
        y = jnp.asarray(rng.randint(0, 4, (B, dim, dim, 1)))
        w = np.ones(B, np.float32)

        def best(f, n=4):
            f()  # compile
            ts = []
            for _ in range(n):
                t0 = time.time()
                f()
                ts.append(time.time() - t0)
            return min(ts)

        t_fwd = best(lambda: sync(fwd(variables, x)))
        t_grad = best(lambda: sync(grad_fn(variables["params"],
                                           variables["batch_stats"], x, y)))
        step = make_train_step(model, tx, loss_obj, {}, donate=False)
        state = create_train_state(variables, tx)
        t_step = best(lambda: sync(step(state, x, y, w)[1]))
        # rough flops: fwd ~ F, bwd ~ 2F
        print(f"B={B}: fwd {t_fwd*1e3:.1f} ms | grad {t_grad*1e3:.1f} ms "
              f"| step {t_step*1e3:.1f} ms | "
              f"{B / t_step:.1f} img/s (step only)", flush=True)


if __name__ == "__main__":
    main()
