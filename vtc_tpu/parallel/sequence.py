"""Sequence (context) parallelism for the transformer block stack.

The reference handles long sequences by *factorizing* attention (divided
space-time, ``model/timesformer_clip_alt.py:135-175``) and long text by RAKE
truncation — it has no distributed sequence strategy (SURVEY §2.3: SP "not
present in reference"). This module is the beyond-parity capability for
sequences that outgrow one chip's HBM (high-frame-count video towers,
long-context text): activations are sharded over a ``"seq"`` mesh axis and
attention runs as a **ring**: each device holds its sequence shard of Q
permanently and streams the K/V shards around the ring with
``lax.ppermute`` (neighbor hops over ICI — bandwidth per step is
``2·B·L/s·E`` regardless of ring size), accumulating the softmax *online*
(flash-attention style running max / denominator), so the full ``[L, L]``
logit matrix never materializes on any chip.

Everything non-attention in the block (LayerNorm, qkv/out projections,
MLP) is pointwise over the sequence, so it runs on the local shard with no
communication at all: per block the ONLY collective traffic is the s-1 K/V
neighbor hops. The whole stack compiles as one ``lax.scan`` over layers
inside one ``shard_map``; jax autodiff differentiates straight through
(the backward pass rings the gradients the opposite way automatically).

Numerics match ``models.layers.Transformer`` exactly in fp32 (same LN32,
QuickGELU, fp32-accumulated dots; online softmax is the same sum
re-associated) — pinned by ``tests/test_sequence.py``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..models.layers import quick_gelu
from .mesh import DATA_AXIS

SEQ_AXIS = "seq"


def create_sp_mesh(n_data: int, n_seq: int, devices=None) -> Mesh:
    """``("data", "seq")`` mesh for dp×sp runs."""
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) < n_data * n_seq:
        raise ValueError(f"need {n_data * n_seq} devices, have {len(devices)}")
    arr = np.array(devices[: n_data * n_seq]).reshape(n_data, n_seq)
    # newest-mesh-wins (like create_mesh): an sp mesh has no tp axis, so
    # attention drops back to the merged single-GEMM qkv form
    from ..models import layers

    layers.set_tp_qkv(False, 1)
    return Mesh(arr, (DATA_AXIS, SEQ_AXIS))


def pad_for_sp(x: jax.Array, mask: Optional[jax.Array], n_seq: int):
    """Pad ``x`` [B, L, E] (and the additive attention mask) so the sequence
    length divides over ``n_seq`` shards.

    Real rows never attend to padding (padded *columns* get -inf for every
    real query); padded query rows attend only to themselves (finite
    diagonal) so their softmax stays well-defined — their outputs are
    garbage by construction and the caller drops them with the returned
    original length. CLIP's text towers (L=77) need this for any sp degree.
    """
    length = x.shape[1]
    padded = -(-length // n_seq) * n_seq
    if padded == length:
        if mask is None:
            mask = jnp.zeros((length, length), jnp.float32)
        return x, mask, length
    pad = padded - length
    x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    base = (
        jnp.zeros((length, length), jnp.float32) if mask is None else mask
    )
    big = jnp.full((padded, padded), -jnp.inf, jnp.float32)
    big = big.at[:length, :length].set(base)
    diag = jnp.arange(length, padded)
    big = big.at[diag, diag].set(0.0)
    return x, big, length


def _ln32(x, scale, bias, eps=1e-5):
    """``models.layers.LayerNorm32`` numerics (fp32 LN, cast back)."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(dtype)


def _ring_attention(q, k, v, mask, *, axis: str, dtype):
    """Online-softmax ring attention over the ``axis`` shards of K/V.

    q, k, v: local shards [B, Lloc, H, Dh] (q pre-scaled); mask: the FULL
    additive [L, L] fp32 mask, replicated — each ring step adds its
    [rows(me), cols(src)] tile. Returns the local [B, Lloc, H, Dh] output.
    """
    s = jax.lax.psum(1, axis)
    me = jax.lax.axis_index(axis)
    b, l_loc, h, _ = q.shape

    def tile(src):
        return jax.lax.dynamic_slice(
            mask, (me * l_loc, src * l_loc), (l_loc, l_loc)
        )

    def accumulate(carry, k_cur, v_cur, t):
        m, den, num = carry
        src = (me - t) % s  # whose K/V shard this device holds at step t
        logits = jnp.einsum(
            "blhd,bmhd->bhlm", q, k_cur, preferred_element_type=jnp.float32
        )
        logits = logits + tile(src)
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1))
        # rows masked everywhere so far have m_new = -inf: exp against a 0
        # reference keeps them finite (their num/den stay 0)
        m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        p = jnp.exp(logits - m_safe[..., None])
        corr = jnp.exp(m - m_safe)  # m=-inf -> 0: resets the empty state
        den = den * corr + jnp.sum(p, axis=-1)
        num = num * corr[..., None] + jnp.einsum(
            "bhlm,bmhd->bhld", p, v_cur, preferred_element_type=jnp.float32
        )
        return m_new, den, num

    m0 = jnp.full((b, h, l_loc), -jnp.inf, jnp.float32)
    den0 = jnp.zeros((b, h, l_loc), jnp.float32)
    num0 = jnp.zeros((b, h, l_loc, q.shape[-1]), jnp.float32)

    # step 0: the local K/V shard — no communication
    acc = accumulate((m0, den0, num0), k, v, jnp.int32(0))

    if s > 1:
        # steps 1..s-1: rotate-then-accumulate, exactly s-1 neighbor hops
        # per K and V (rotating after the last accumulate would ship a
        # shard nobody reads)
        perm = [(i, (i + 1) % s) for i in range(s)]

        def step(carry, t):
            k_cur, v_cur, m, den, num = carry
            k_cur = jax.lax.ppermute(k_cur, axis, perm)
            v_cur = jax.lax.ppermute(v_cur, axis, perm)
            m, den, num = accumulate((m, den, num), k_cur, v_cur, t)
            return (k_cur, v_cur, m, den, num), None

        (_, _, _, den, num), _ = jax.lax.scan(
            step, (k, v) + acc, jnp.arange(1, s)
        )
    else:
        _, den, num = acc
    out = jnp.where(den[..., None] > 0, num / den[..., None], 0.0)
    # [B, H, Lloc, Dh] -> [B, Lloc, H, Dh] (the sequential path's "->...lhd")
    return jnp.transpose(out, (0, 2, 1, 3)).astype(dtype)


def _block(params, x, mask, *, heads: int, axis: str, dtype):
    """One pre-LN CLIP block on a local sequence shard; ring attention is
    the only communicating op. Mirrors ``layers.ResidualAttentionBlock``
    (default, non-fused-LN path) op for op."""
    e = x.shape[-1]
    h = heads
    head_dim = e // h

    a = params["attn"]
    y = _ln32(x, params["ln_1"]["scale"], params["ln_1"]["bias"])
    # merged [E, 3E] qkv GEMM (the measured-fast single-chip form;
    # models.layers.qkv_project) — local: rows are sequence-pointwise
    qkv = (
        jnp.einsum(
            "ble,fe->blf",
            y,
            a["in_proj_weight"].reshape(3 * e, e).astype(dtype),
            preferred_element_type=jnp.float32,
        ).astype(dtype)
        + a["in_proj_bias"].reshape(3 * e).astype(dtype)
    )
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def split_heads(t):
        return t.reshape(t.shape[:-1] + (h, head_dim))

    out = _ring_attention(
        split_heads(q) * (head_dim ** -0.5),
        split_heads(k),
        split_heads(v),
        mask,
        axis=axis,
        dtype=dtype,
    )
    out = out.reshape(out.shape[:-2] + (e,))
    out = (
        jnp.einsum(
            "ble,ef->blf", out, a["out_proj"]["kernel"].astype(dtype),
            preferred_element_type=jnp.float32,
        ).astype(dtype)
        + a["out_proj"]["bias"].astype(dtype)
    )
    x = x + out

    y = _ln32(x, params["ln_2"]["scale"], params["ln_2"]["bias"])
    m = params["mlp"]
    y = (
        jnp.einsum(
            "ble,ef->blf", y, m["c_fc"]["kernel"].astype(dtype),
            preferred_element_type=jnp.float32,
        ).astype(dtype)
        + m["c_fc"]["bias"].astype(dtype)
    )
    y = quick_gelu(y)
    y = (
        jnp.einsum(
            "blf,fe->ble", y, m["c_proj"]["kernel"].astype(dtype),
            preferred_element_type=jnp.float32,
        ).astype(dtype)
        + m["c_proj"]["bias"].astype(dtype)
    )
    return x + y


def sp_transformer(
    stacked_params,
    x: jax.Array,
    mask: Optional[jax.Array],
    *,
    mesh: Mesh,
    heads: int,
    axis: str = SEQ_AXIS,
    batch_axis: Optional[str] = DATA_AXIS,
    dtype=jnp.float32,
):
    """Run the whole CLIP block stack with the sequence axis sharded.

    Args:
      stacked_params: block params with a leading layer axis
        (``pipeline.stack_layer_params`` of a tower's ``transformer``).
      x: [B, L, E]; ``L`` must divide by the ``axis`` size (``pad_for_sp``
        otherwise).
      mask: additive [L, L] fp32 mask or None.
      mesh: mesh containing ``axis`` (and optionally ``batch_axis``).
      heads: the tower's head count.
      batch_axis: mesh axis for the batch dim (dp×sp composition); None
        replicates the batch.

    Returns [B, L, E], sharded like the input.
    """
    n_seq = mesh.shape[axis]
    if x.shape[1] % n_seq:
        raise ValueError(
            f"sequence length {x.shape[1]} does not divide over {n_seq} "
            f"sequence shards; wrap with pad_for_sp"
        )
    if mask is None:
        mask = jnp.zeros((x.shape[1], x.shape[1]), jnp.float32)

    def stack_fn(params, x, mask):
        def one(h, p):
            return _block(p, h, mask, heads=heads, axis=axis, dtype=dtype), None

        return jax.lax.scan(one, x, params)[0]

    pspecs = jax.tree_util.tree_map(lambda _: P(), stacked_params)
    x_spec = P(batch_axis, axis, None)
    return shard_map(
        stack_fn,
        mesh=mesh,
        in_specs=(pspecs, x_spec, P()),
        out_specs=x_spec,
        check_rep=False,
    )(stacked_params, x, mask)
