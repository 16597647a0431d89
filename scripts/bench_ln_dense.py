"""Prototype: fold pre-LN LayerNorm into the following Dense as MXU ops.

Compares LN(x)@W+b (current) vs the restructured
    rstd * (x @ W') - (mu * rstd) ⊗ colsum(W') + b'
where mu/var come from x @ ones/d and x² @ ones/d (MXU lane reductions).

python scripts/bench_ln_dense.py [rows] [d] [out]
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp


def main(rows=8000, d=768, out=2304):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(rows, d)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    scale = jnp.asarray((1 + 0.1 * rng.normal(size=d)).astype(np.float32))
    bias = jnp.asarray((0.1 * rng.normal(size=d)).astype(np.float32))
    W = jnp.asarray((rng.normal(size=(d, out)) * 0.02).astype(np.float32)).astype(
        jnp.bfloat16
    )
    b = jnp.asarray((0.02 * rng.normal(size=out)).astype(np.float32))
    eps = 1e-5

    def baseline(x, scale, bias, W, b):
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + eps)
        y = (y * scale + bias).astype(x.dtype)
        return (
            jnp.matmul(y, W, preferred_element_type=jnp.float32)
            + b
        ).astype(x.dtype)

    def fused(x, scale, bias, W, b):
        Wp = (scale[:, None] * W.astype(jnp.float32)).astype(jnp.bfloat16)
        bp = bias @ W.astype(jnp.float32) + b  # [out] fp32
        wbar = jnp.sum(Wp.astype(jnp.float32), axis=0)  # [out]
        ones = jnp.full((d, 128), 1.0 / d, jnp.bfloat16)
        m = jax.lax.dot_general(
            x, ones, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[:, :1]
        s2 = jax.lax.dot_general(
            x * x, ones, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[:, :1]
        var = s2 - m * m
        rstd = jax.lax.rsqrt(var + eps)
        g = jnp.matmul(x, Wp, preferred_element_type=jnp.float32)
        y = rstd * g - (m * rstd) * wbar + bp
        return y.astype(x.dtype)

    ref = np.asarray(jax.jit(baseline)(x, scale, bias, W, b), np.float32)
    got = np.asarray(jax.jit(fused)(x, scale, bias, W, b), np.float32)
    denom = np.maximum(np.abs(ref), 1e-3)
    print("max abs err", np.max(np.abs(got - ref)),
          "max rel err", np.max(np.abs(got - ref) / denom))

    # stress: large-mean residual stream (CLIP streams drift); check cancellation
    xs = (x.astype(jnp.float32) + 30.0).astype(jnp.bfloat16)
    ref2 = np.asarray(jax.jit(baseline)(xs, scale, bias, W, b), np.float32)
    got2 = np.asarray(jax.jit(fused)(xs, scale, bias, W, b), np.float32)
    denom2 = np.maximum(np.abs(ref2), 1e-3)
    print("mean-30 stress: max abs err", np.max(np.abs(got2 - ref2)),
          "max rel err", np.max(np.abs(got2 - ref2) / denom2))

    def timed(name, fn):
        @jax.jit
        def loop(x, scale, bias, W, b, n):
            def body(i, c):
                y = fn(c, scale, bias, W, b)
                # fold back to input width to chain (cheap constant matmul)
                return c + y[:, :d] * jnp.bfloat16(1e-6)

            return jax.lax.fori_loop(0, n, body, x)

        float(jnp.sum(loop(x, scale, bias, W, b, jnp.int32(2)).astype(jnp.float32)))
        tic = time.perf_counter()
        float(jnp.sum(loop(x, scale, bias, W, b, jnp.int32(24)).astype(jnp.float32)))
        per = (time.perf_counter() - tic) / 24
        print(f"{name:<12} {per * 1e6:8.1f} us/iter (LN+GEMM+chain-add)")

    timed("baseline", baseline)
    timed("fused", fused)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
