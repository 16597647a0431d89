"""Pallas TPU kernel: fused multi-head attention for short sequences.

The framework's towers all run attention over short sequences (ViT: 50
tokens; text: 77; TimeSformer temporal: 8, spatial: 50; CAM: 1+N). A
flash-style streaming kernel buys nothing at these lengths — the whole
(L x L) score tile fits VMEM — but fusing QK^T -> softmax -> @V into one
kernel keeps the scores out of HBM entirely and batches several (batch*head)
rows per grid step so the MXU tiles stay full.

Layout: q, k, v are [B, L, D] with B = batch*heads; the wrapper pads L and D
to lane/sublane multiples and picks a block size so all operands sit in
VMEM. Softmax runs in fp32. An optional additive mask [L, L] (the text
tower's causal mask) is applied pre-softmax.

Backward: custom_vjp with recompute in plain XLA ops (the standard
recompute-in-bwd pattern; fwd stays fused, bwd lets XLA fuse its own
matmuls).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pallas TPU backend is unavailable when running on pure CPU
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    _HAS_PLTPU = False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float,
                 l_real: int):
    q = q_ref[:]  # [TB, L, D]
    k = k_ref[:]
    v = v_ref[:]

    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [TB, L, L]
    scores = scores * scale
    scores = scores + mask_ref[:]  # padding+causal additive mask, fp32

    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    attn = (e / s).astype(q.dtype)

    out = jax.lax.dot_general(
        attn, v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = out.astype(o_ref.dtype)


def _fused_attention_fwd_impl(
    q, k, v, mask, scale: float, block_b: int, interpret: bool
):
    # CPU runs (tests, fallbacks) use the pallas interpreter automatically
    interpret = interpret or jax.default_backend() == "cpu"
    b, l, d = q.shape
    lp = _round_up(l, 128)
    dp = _round_up(d, 128)
    bp = _round_up(b, block_b)

    def pad3(x):
        return jnp.pad(x, ((0, bp - b), (0, lp - l), (0, dp - d)))

    qp, kp, vp = pad3(q), pad3(k), pad3(v)

    # additive mask: user mask (causal etc.) + key-padding -inf columns
    key_pad = jnp.where(
        jnp.arange(lp) < l, 0.0, -jnp.inf
    ).astype(jnp.float32)[None, :]
    full_mask = jnp.zeros((lp, lp), jnp.float32) + key_pad
    if mask is not None:
        full_mask = full_mask + jnp.pad(
            mask.astype(jnp.float32), ((0, lp - l), (0, lp - l))
        )
    # rows beyond l attend to column 0 (finite) to avoid NaNs in padding
    row_ids = jnp.arange(lp)[:, None]
    col_ids = jnp.arange(lp)[None, :]
    pad_rows = row_ids >= l
    full_mask = jnp.where(
        pad_rows, jnp.where(col_ids == 0, 0.0, -jnp.inf), full_mask
    )

    grid = (bp // block_b,)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, l_real=l),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, lp, dp), lambda i: (i, 0, 0)),
            pl.BlockSpec((block_b, lp, dp), lambda i: (i, 0, 0)),
            pl.BlockSpec((block_b, lp, dp), lambda i: (i, 0, 0)),
            pl.BlockSpec((lp, lp), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_b, lp, dp), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, lp, dp), q.dtype),
        interpret=interpret,
    )(qp, kp, vp, full_mask)
    return out[:b, :l, :d]


def _reference_attention(q, k, v, mask, scale):
    scores = jnp.einsum(
        "bid,bjd->bij", q, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        scores = scores + mask
    attn = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum(
        "bij,bjd->bid", attn, v, preferred_element_type=jnp.float32
    ).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_attention(
    q, k, v, mask=None, scale: Optional[float] = None, block_b: int = 8,
    interpret: bool = False,
):
    """Fused attention over [B, L, D] (B = batch*heads). ``mask`` is a
    differentiable argument (it may be a traced array); its cotangent is
    None."""
    s = scale if scale is not None else q.shape[-1] ** -0.5
    return _fused_attention_fwd_impl(q, k, v, mask, s, block_b, interpret)


def _fwd(q, k, v, mask, scale, block_b, interpret):
    s = scale if scale is not None else q.shape[-1] ** -0.5
    out = _fused_attention_fwd_impl(q, k, v, mask, s, block_b, interpret)
    return out, (q, k, v, mask)


def _bwd(scale, block_b, interpret, res, g):
    q, k, v, mask = res
    s = scale if scale is not None else q.shape[-1] ** -0.5
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _reference_attention(q_, k_, v_, mask, s),
        q, k, v,
    )
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


fused_attention.defvjp(_fwd, _bwd)


def attention_available() -> bool:
    if not _HAS_PLTPU:
        return False
    return jax.default_backend() not in ("cpu",)
