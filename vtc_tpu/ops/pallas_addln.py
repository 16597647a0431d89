"""Fused residual-add + LayerNorm (Pallas TPU, two outputs).

The last untried instance of PERFORMANCE.md's "only removing passes
outright pays" law (VERDICT r3 item 6): IF the residual add and the
following LayerNorm run as two separate ~250-400 µs VPU passes per block,
fusing them into one VMEM pass removes up to ~25 passes from the flagship
eval step. The kernel computes ``s = a + b`` and ``y = LN(s)`` in one pass
and emits BOTH (``s`` feeds the next residual junction, ``y`` feeds the
branch), exactly the shape of the pre-LN block's attention junction
(``layers.ResidualAttentionBlock``: ``x = x + attn(ln_1(x))`` followed by
``ln_2(x)``).

**Measured (round 4): a 10.8% LOSS — parked default-off.** Clean-process
full-bench medians 6784 pairs/s baseline vs 6057/6051 with the kernel.
The premise was false: XLA had already fused the residual adds into the
neighboring reduce/epilogue fusions (no standalone ``add`` class in the
round-3 trace), so the kernel removes nothing and instead breaks that
fusion while paying an extra fp32 VMEM round-trip for ``s``. Kept
test-covered as the receipt — see PERFORMANCE.md "Round 4".

Numerics follow ``layers.LayerNorm32`` / ``ops.pallas_layernorm``: the sum
and all statistics in fp32 regardless of activation dtype, outputs cast
back. Backward routes through the plain XLA formulation via
``jax.custom_vjp`` (the pattern of ``ops/pallas_layernorm.py``).

Opt-in wiring: ``VTC_PALLAS_ADDLN=1`` switches the attention junction of
every ``ResidualAttentionBlock`` to this kernel (see ``layers.py``); the
measured receipt lives in PERFORMANCE.md next to the Pallas-LN and
LN→Dense rows.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .pallas_layernorm import _xla_layernorm, supported


def _addln_kernel(a_ref, b_ref, scale_ref, bias_ref, s_ref, y_ref, *, eps):
    a = a_ref[...].astype(jnp.float32)  # [rows, d]
    b = b_ref[...].astype(jnp.float32)
    s = a + b
    s_ref[...] = s.astype(s_ref.dtype)
    mean = jnp.mean(s, axis=-1, keepdims=True)
    sc = s - mean
    var = jnp.mean(sc * sc, axis=-1, keepdims=True)
    y = sc * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(
        jnp.float32
    )
    y_ref[...] = y.astype(y_ref.dtype)


_INTERPRET = False  # tests flip this to run the kernel on CPU


def use_pallas() -> bool:
    return _INTERPRET or jax.default_backend() == "tpu"


def addln_enabled() -> bool:
    """The layers.py wiring switch (receipt opt-in, default off)."""
    return os.environ.get("VTC_PALLAS_ADDLN") == "1"


def _xla_add_layernorm(a, b, scale, bias, eps):
    s32 = a.astype(jnp.float32) + b.astype(jnp.float32)
    return s32.astype(a.dtype), _xla_layernorm(s32, scale, bias, eps).astype(
        a.dtype
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def add_layernorm(a, b, scale, bias, eps: float = 1e-5):
    """``(a + b, LN(a + b))`` in one device pass.

    ``a``/``b``: [..., d] same shape/dtype, d % 128 == 0 for the Pallas
    path (XLA fallback otherwise). ``scale``/``bias``: [d] fp32.
    """
    return _forward(a, b, scale, bias, eps)


def _forward(a, b, scale, bias, eps):
    d = a.shape[-1]
    if not (supported(d) and use_pallas()):
        return _xla_add_layernorm(a, b, scale, bias, eps)
    rows = 1
    for s in a.shape[:-1]:
        rows *= s
    a2 = a.reshape(rows, d)
    b2 = b.reshape(rows, d)

    # block fp32 working set = 3 * block_rows * d * 4B (a, b, s);
    # 256*768*4*3 = 2.3 MB — comfortably inside VMEM
    block = 256
    while rows % block and block > 8:
        block //= 2
    if rows % block:
        return _xla_add_layernorm(a, b, scale, bias, eps)

    s_out, y_out = pl.pallas_call(
        functools.partial(_addln_kernel, eps=eps),
        grid=(rows // block,),
        in_specs=[
            pl.BlockSpec((block, d), lambda i: (i, 0)),
            pl.BlockSpec((block, d), lambda i: (i, 0)),
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((d,), lambda i: (0,)),
        ],
        out_specs=[
            pl.BlockSpec((block, d), lambda i: (i, 0)),
            pl.BlockSpec((block, d), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, d), a.dtype),
            jax.ShapeDtypeStruct((rows, d), a.dtype),
        ],
        interpret=_INTERPRET,
    )(a2, b2, scale, bias)
    return s_out.reshape(a.shape), y_out.reshape(a.shape)


def _fwd(a, b, scale, bias, eps):
    return _forward(a, b, scale, bias, eps), (a, b, scale, bias)


def _bwd(eps, res, g):
    a, b, scale, bias = res
    _, vjp = jax.vjp(
        lambda *args: _xla_add_layernorm(*args, eps), a, b, scale, bias
    )
    return vjp(g)


add_layernorm.defvjp(_fwd, _bwd)
