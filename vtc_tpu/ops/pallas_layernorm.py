"""Pallas TPU LayerNorm (fp32 statistics, any activation dtype).

Profiling the flagship eval forward (scripts/profile_trace.py) showed XLA's
LayerNorm lowering (`convert_reduce_fusion`) costing ~400 µs per call at
`[160, 50, 768]` — 41% of the whole step across the towers' ~53 LayerNorms,
13× the HBM traffic floor. LayerNorm is the *good* Pallas case on this
toolchain (row-wise math, feature dim a clean multiple of 128 lanes, no
per-head 64-lane slicing — contrast PERFORMANCE.md "Pallas kernel
exploration" where attention loses): one pass over VMEM blocks with fp32
statistics.

Numerics match ``layers.LayerNorm32`` exactly in spirit: statistics and
normalization are computed in fp32 regardless of input dtype (CLIP's
fp16-aware LN, reference ``model/model.py`` LayerNorm subclass), output cast
back to the input dtype.

Forward-only: a ``jax.custom_vjp`` routes the backward through the plain XLA
implementation (training steps are compiled separately and dominated by the
matmul backward anyway).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _ln_kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)  # [rows, d]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(
        jnp.float32
    )
    o_ref[...] = y.astype(o_ref.dtype)


def _xla_layernorm(x, scale, bias, eps):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


_INTERPRET = False  # tests flip this to run the kernel on CPU


def supported(d: int) -> bool:
    """Kernel constraint: feature dim must tile the 128-lane registers."""
    return d % 128 == 0


def use_pallas() -> bool:
    import jax

    return _INTERPRET or jax.default_backend() == "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def layernorm(x, scale, bias, eps: float = 1e-5):
    """LayerNorm over the last axis; fp32 stats; Pallas forward on TPU.

    ``x``: [..., d] with d % 128 == 0 (caller checks ``supported``).
    ``scale``/``bias``: [d] fp32.
    """
    return _forward(x, scale, bias, eps)


def _forward(x, scale, bias, eps):
    d = x.shape[-1]
    if not (supported(d) and use_pallas()):
        return _xla_layernorm(x, scale, bias, eps)
    rows = 1
    for s in x.shape[:-1]:
        rows *= s
    x2 = x.reshape(rows, d)

    # block rows: big enough to amortize grid overhead, small enough for
    # VMEM (block fp32 working set = block_rows * d * 4B; 512*768*4 = 1.5 MB)
    block = 512
    while rows % block and block > 8:
        block //= 2
    if rows % block:
        return _xla_layernorm(x, scale, bias, eps)

    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(rows // block,),
        in_specs=[
            pl.BlockSpec((block, d), lambda i: (i, 0)),
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((d,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((block, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, d), x.dtype),
        interpret=_INTERPRET,
    )(x2, scale, bias)
    return out.reshape(x.shape)


def _fwd(x, scale, bias, eps):
    return _forward(x, scale, bias, eps), (x, scale, bias)


def _bwd(eps, res, g):
    # backward through the reference XLA formulation (jax.vjp gives the
    # exact gradients of fp32-stat layernorm)
    x, scale, bias = res
    _, vjp = jax.vjp(lambda *a: _xla_layernorm(*a, eps), x, scale, bias)
    return vjp(g)


layernorm.defvjp(_fwd, _bwd)
