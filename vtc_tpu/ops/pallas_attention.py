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


# ---------------------------------------------------------------------------
# fused_mha: heads-packed fused attention (round-2 kernel)
# ---------------------------------------------------------------------------
#
# The round-1 kernel above takes [B*H, L, D] and pads BOTH L and D to 128
# lanes — at CLIP shapes (L=50/16, D=64) that wastes most of the MXU and
# forces two head transposes in HBM around the call. This kernel instead
# keeps the model's native [B, L, E] layout (E = H*D fills whole 128-lane
# tiles exactly: 768 = 6 tiles, 512 = 4), loops heads *inside* the kernel
# with register-level lane slicing, and keeps scores/softmax entirely in
# VMEM. HBM traffic is the theoretical minimum (q,k,v in + out, compact
# bf16), and the four XLA head transposes + fp32 logits round-trip are gone.


def _mha_kernel(q_ref, k_ref, v_ref, o_ref, *, heads: int, l_real: int,
                l_pad: int, causal: bool):
    """Packed block-diagonal attention.

    Refs are [R, E] where rows pack ``128 // l_pad`` batch items per 128-row
    supertile (l_pad | 128). Per head and supertile, attention over ALL
    packed items is ONE full [128, 128] score matmul with a static
    block-diagonal mask — cross-item products are computed and masked, a
    (128/l_pad)x flop overcount, but the MXU runs full tiles instead of
    128/l_pad tiny padded matmuls. Scores/softmax never leave VMEM.
    """
    rows = q_ref.shape[0]
    d = q_ref.shape[1] // heads
    n_super = rows // 128

    # static [128, 128] mask: same packed item, real key, (causal)
    col = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    keep = (col // l_pad == row // l_pad) & (col % l_pad < l_real)
    if causal:
        keep = keep & (col % l_pad <= row % l_pad)
    mask = jnp.where(keep, 0.0, jnp.float32(-1e30))

    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        qh = q_ref[:, sl]  # [R, D]
        kh = k_ref[:, sl]
        vh = v_ref[:, sl]
        for s in range(n_super):
            rs = slice(s * 128, (s + 1) * 128)
            scores = jnp.dot(
                qh[rs], kh[rs].T, preferred_element_type=jnp.float32
            )  # [128, 128]
            scores = scores + mask
            m = jnp.max(scores, axis=-1, keepdims=True)
            e = jnp.exp(scores - m)
            attn = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(qh.dtype)
            out = jnp.dot(attn, vh[rs], preferred_element_type=jnp.float32)
            o_ref[rs, sl] = out.astype(o_ref.dtype)


def _fused_mha_fwd_impl(q, k, v, heads: int, causal: bool, scale: float,
                        block_b: int, interpret: bool):
    interpret = interpret or jax.default_backend() == "cpu"
    b, l, e = q.shape
    if l > 128:
        raise ValueError(
            f"fused_mha packs sequences into 128-row supertiles and supports "
            f"L <= 128 (got L={l}); use the XLA attention path for longer "
            f"sequences (it wins at these shapes anyway — PERFORMANCE.md "
            f"'Pallas kernel exploration')"
        )
    # pad L to a power-of-two divisor of 128 so supertiles pack exactly
    lp = 1
    while lp < l:
        lp *= 2

    # block_b = supertiles per grid step (each supertile is 128 rows)
    rows_per_step = 128 * block_b
    bp = _round_up(b, rows_per_step // lp)

    q = q * jnp.asarray(scale, q.dtype)
    pad = ((0, bp - b), (0, lp - l), (0, 0))
    q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    q = q.reshape(bp * lp, e)
    k = k.reshape(bp * lp, e)
    v = v.reshape(bp * lp, e)

    rows = bp * lp
    out = pl.pallas_call(
        functools.partial(
            _mha_kernel, heads=heads, l_real=l, l_pad=lp, causal=causal
        ),
        grid=(rows // rows_per_step,),
        in_specs=[
            pl.BlockSpec((rows_per_step, e), lambda i: (i, 0)),
            pl.BlockSpec((rows_per_step, e), lambda i: (i, 0)),
            pl.BlockSpec((rows_per_step, e), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((rows_per_step, e), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, e), q.dtype),
        interpret=interpret,
    )(q, k, v)
    return out.reshape(bp, lp, e)[:b, :l]


def _mha_reference(q, k, v, heads: int, causal: bool, scale: float):
    b, l, e = q.shape
    d = e // heads
    qh = q.reshape(b, l, heads, d) * scale
    kh = k.reshape(b, l, heads, d)
    vh = v.reshape(b, l, heads, d)
    scores = jnp.einsum(
        "blhd,bmhd->bhlm", qh, kh, preferred_element_type=jnp.float32
    )
    if causal:
        mask = jnp.triu(jnp.full((l, l), -jnp.inf, jnp.float32), k=1)
        scores = scores + mask
    attn = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum(
        "bhlm,bmhd->blhd", attn, vh, preferred_element_type=jnp.float32
    )
    return out.reshape(b, l, e).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def fused_mha(q, k, v, heads: int, causal: bool = False,
              scale: Optional[float] = None, block_b: int = 4,
              interpret: bool = False):
    """Fused multi-head attention over [B, L, E] with E = heads*head_dim.

    Heads stay packed in the lane dimension end to end — callers pass the
    qkv-projection outputs directly, with no [B,H,L,D] transpose. Forward is
    the Pallas kernel; backward recomputes through the XLA reference
    (standard recompute-in-bwd)."""
    s = scale if scale is not None else (q.shape[-1] // heads) ** -0.5
    return _fused_mha_fwd_impl(q, k, v, heads, causal, s, block_b, interpret)


def _mha_fwd(q, k, v, heads, causal, scale, block_b, interpret):
    s = scale if scale is not None else (q.shape[-1] // heads) ** -0.5
    out = _fused_mha_fwd_impl(q, k, v, heads, causal, s, block_b, interpret)
    return out, (q, k, v)


def _mha_bwd(heads, causal, scale, block_b, interpret, res, g):
    q, k, v = res
    s = scale if scale is not None else (q.shape[-1] // heads) ** -0.5
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _mha_reference(q_, k_, v_, heads, causal, s),
        q, k, v,
    )
    return vjp(g)


fused_mha.defvjp(_mha_fwd, _mha_bwd)
