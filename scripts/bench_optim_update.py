"""Isolate the optimizer-update cost: per-leaf fused kernels (the shipped
FusedOptimizer) vs the same math on ONE merged 151M-element buffer.

The train-step trace shows the Adam/amsgrad update at ~11.6 ms/step across
~328 per-leaf kernels while the pure HBM traffic floor (5 reads + 4 writes
of 151M fp32) is ~6.6 ms on v5e. If a single merged kernel reaches the
floor, a flat-buffer optimizer layout is worth building; if it doesn't,
the per-leaf overhead is not kernel-count-bound and the idea is dead.

Run: python scripts/bench_optim_update.py [iters]
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _time_loop(fn, state, grads, iters, warmup=3):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run_n(state, grads, n):
        def body(i, s):
            return fn(s, grads)

        return jax.lax.fori_loop(0, n, body, state)

    out = run_n(state, grads, jnp.int32(warmup))
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0].astype(jnp.float32))
    vals = []
    for _ in range(3):
        tic = time.perf_counter()
        out = run_n(state, grads, jnp.int32(iters))
        float(jax.tree_util.tree_leaves(out)[0].ravel()[0].astype(jnp.float32))
        vals.append((time.perf_counter() - tic) / iters * 1e3)
    return sorted(vals)[1]


def main(iters=64):
    import jax
    import jax.numpy as jnp

    from vtc_tpu.models import create_model
    from vtc_tpu.training.optim import build_optimizer

    module, variables = create_model(
        "PretrainedCLIP_finaltf", model_type="ViT-B/32", seed=0,
        dtype=jnp.bfloat16,
    )
    params = variables["params"]
    n_leaves = len(jax.tree_util.tree_leaves(params))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"{n_leaves} leaves, {n_params/1e6:.1f}M params")

    tx = build_optimizer(
        params,
        {"type": "Adam", "args": {"lr": 1e-5, "amsgrad": True}},
        {"type": "StepLR", "args": {"step_size": 10, "gamma": 0.1}},
        steps_per_epoch=100,
        adapter_lr=1e-4,
    )
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(
        lambda p: jnp.full(p.shape, 1e-4, jnp.float32), params
    )

    def per_leaf(state, grads):
        params, opt_state = state
        new_params, new_state = tx.apply(grads, opt_state, params)
        return (new_params, new_state)

    ms = _time_loop(per_leaf, (params, opt_state), grads, iters)
    print(f"per-leaf FusedOptimizer.apply: {ms:.2f} ms/step")

    # one merged buffer, same math (plain amsgrad, constant lr — the
    # grouped-lr bookkeeping is per-leaf scalars and costs nothing)
    N = n_params
    flat_p = jnp.zeros((N,), jnp.float32) + 0.01
    flat_g = jnp.full((N,), 1e-4, jnp.float32)
    zeros = jnp.zeros((N,), jnp.float32)
    b1, b2, eps, lr = 0.9, 0.999, 1e-8, 1e-5

    def merged(state, g):
        p, mu, nu, numax, t = state
        t = t + 1
        mu = b1 * mu + (1 - b1) * g
        nu = b2 * nu + (1 - b2) * g * g
        numax = jnp.maximum(numax, nu)
        mu_hat = mu / (1 - b1 ** t.astype(jnp.float32))
        nu_hat = numax / (1 - b2 ** t.astype(jnp.float32))
        p = p - lr * mu_hat / (jnp.sqrt(nu_hat) + eps)
        return (p, mu, nu, numax, t)

    ms = _time_loop(
        merged, (flat_p, zeros, zeros, zeros, jnp.zeros((), jnp.int32)),
        flat_g, iters,
    )
    print(f"single merged 151M-buffer update: {ms:.2f} ms/step "
          f"(HBM floor ~{9 * N * 4 / 819e9 * 1e3:.1f} ms)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64)
