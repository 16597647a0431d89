"""Core transformer layers shared by the CLIP towers, the TimeSformer, and
the Context Adapter Module.

Numerics follow CLIP exactly (required for checkpoint parity,
``model/timesformer_clip_alt.py:22-33``):

* LayerNorm always computes in float32 and casts back (CLIP's fp16-aware LN).
* QuickGELU ``x * sigmoid(1.702 x)``.
* Attention uses a single fused in-projection (3E x E) like
  ``nn.MultiheadAttention`` / the reference's ``Attention``
  (``timesformer_clip_alt.py:70-95``) — one big MXU matmul instead of three.

All matmuls specify ``preferred_element_type=float32`` so the MXU accumulates
in fp32 even when activations are bf16.
"""

from __future__ import annotations

import os
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class LayerNorm32(nn.Module):
    """LayerNorm computed in float32 regardless of activation dtype.

    ``__call__(x, return_params=True)`` declares the parameters and hands
    them back instead of normalizing — used by the fused LN→Dense path
    (``ln_dense``) so the parameter tree (``ln_*/scale``, ``ln_*/bias``)
    stays checkpoint-identical while the math rides the following matmul.
    """

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, return_params: bool = False):
        orig_dtype = x.dtype
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        if return_params:
            return scale, bias
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(orig_dtype)


def use_fused_ln(dtype) -> bool:
    """Opt-in (``VTC_FUSED_LN=1``, bf16 mode only): fold every pre-LN
    LayerNorm into the matmul it feeds (``ln_dense``). Measured on v5e:
    eliminates the LayerNorm reductions entirely (9.9 ms → 0.07 ms of
    ``convert_reduce_fusion`` per eval step, verified by device trace) but
    the per-row affine correction redistributes into other elementwise
    fusions and the end-to-end bench is a wash (median 5936 vs 5981 pairs/s
    unfused, 3 clean-process runs each) — so XLA's native LayerNorm stays
    the default. Kept test-covered (tests/test_fused_ln.py) as the
    documented alternative; see PERFORMANCE.md "LayerNorm exploration".

    Single-chip only: under tensor parallelism the fused path's
    [3,E,E]→[3E,E] qkv weight merge would force GSPMD to gather the
    model-sharded E axis, reintroducing the resharding collectives the
    [3,E,E] layout eliminates — so tp (``use_tp_qkv``) wins over the
    fused-LN opt-in."""
    return (
        dtype == jnp.bfloat16
        and os.environ.get("VTC_FUSED_LN", "0") == "1"
        and not use_tp_qkv()
    )


def ln_dense(x, ln_scale, ln_bias, kernel, dense_bias, eps: float = 1e-5):
    """``Dense(LayerNorm(x))`` restructured for the TPU's op economics.

    Profiling (scripts/profile_trace.py) showed XLA's LayerNorm lowering
    (`convert_reduce_fusion`, a VPU cross-lane reduction) costing ~400 µs per
    call at `[160·50, 768]` — 41% of the flagship eval step summed over ~53
    LayerNorms, while every matmul ran near the MXU roofline. Every pre-LN
    LayerNorm in CLIP feeds a matmul, so the normalization is algebraically
    foldable into it:

        mean       from  x @ ones/d          (MXU lane reduction)
        var        from  (x-mean)² @ ones/d  (centered two-pass: exact for
                                              nearby values by Sterbenz, and
                                              no E[x²]-E[x]² cancellation on
                                              large-mean residual streams)
        Dense(LN(x)) = ((x-mean)·rstd) @ (diag(scale)·W)  +  (bias @ W + b)

    The per-element work is all bf16 on the VPU, both reductions ride the
    MXU, and the scale/bias fold (`diag(scale)·W`, `bias@W + b`) is
    loop-invariant so XLA hoists it out of compiled loops. bf16-mode only
    (callers gate on ``use_fused_ln``); max observed deviation vs the fp32
    reference path is ~1 bf16 ulp (tests/test_fused_ln.py).

    No elementwise pass over x is ever materialized: the centered square
    rides the s2 dot as a fused operand, the main GEMM consumes raw x, and
    the normalization is a per-row affine correction fused into the GEMM
    epilogue:

        y = rstd · (x@W' − mean·colsum(W')) + (bias@W + b)

    (mean-correction in fp32: for a stream with |mean| ≤ ~100 the fp32
    cancellation error is ≤ 1e-5 relative — far below bf16 output quanta.)

    ``x``: [..., d]; ``kernel``: [d, out] (fp32 or bf16); returns [..., out]
    in x.dtype.
    """
    d = x.shape[-1]
    dt = x.dtype

    # ones (not 1/d): 1/d is not bf16-representable at d=768/3072, which
    # would scale the stats by bf16(1/d)·d ≈ 1.002 — divide in fp32 instead
    ones = jnp.ones((d, 128), dt)
    inv_d = jnp.float32(1.0 / d)
    m = jnp.einsum(
        "...d,dk->...k", x, ones, preferred_element_type=jnp.float32
    )[..., :1] * inv_d
    mb = m.astype(dt)
    # x - mb is exact for nearby values (Sterbenz); mb carries up to half an
    # activation-dtype ulp of the true mean — fold that fp32 residual into
    # the variance instead of the data: E[(x-mb)²] = var + (m-mb)².
    r = m - mb.astype(jnp.float32)
    xc = x - mb
    s2 = jnp.einsum(
        "...d,dk->...k", xc * xc, ones, preferred_element_type=jnp.float32
    )[..., :1] * inv_d
    var = s2 - r * r
    rstd = jax.lax.rsqrt(var + eps)

    k32 = kernel.astype(jnp.float32)
    kp = (ln_scale[:, None] * k32).astype(dt)
    wbar = jnp.sum(kp.astype(jnp.float32), axis=0)  # colsum(W'), [out]
    bp = ln_bias @ k32
    if dense_bias is not None:
        bp = bp + dense_bias
    g = jnp.einsum("...d,dk->...k", x, kp, preferred_element_type=jnp.float32)
    y = rstd * (g - m * wbar) + bp
    return y.astype(dt)


def _dot(a, b):
    return jnp.matmul(a, b, preferred_element_type=jnp.float32).astype(a.dtype)


def pick_seq_fold(batch: int, seq: int, max_packed: int = None) -> int:
    """Largest fold f such that f sequences pack into ≤ ``max_packed`` rows
    and f divides the batch. Short sequences (ViT's 50 tokens, EOT-bucketed
    text's 8-32) leave most of the MXU's 128 lanes idle in the attention
    matmuls; packing f sequences into one attention call with a
    block-diagonal mask runs the same useful FLOPs at ~f× better lane
    utilization and 1/f the op-dispatch overhead. The reshape is contiguous
    (free), and the math is exact: cross-sequence logits are masked to -inf,
    whose exp underflows to exactly 0.0.

    ``max_packed`` defaults to ``VTC_FOLD_MAX`` (128): the benched optimum —
    64 (fold=4 at 16-token texts) measured within noise of 128 on v5e."""
    if max_packed is None:
        max_packed = int(os.environ.get("VTC_FOLD_MAX", "128"))
    if seq > 32:
        # folding multiplies the fp32 logits footprint by f; above ~32
        # tokens that memory cost cancels the matmul-utilization win
        # (measured on v5e: ViT L=50 fold=2 is a wash, text L=16 fold=8
        # is -15% tower time)
        return 1
    f = max(1, max_packed // max(seq, 1))
    while f > 1 and batch % f:
        f -= 1
    return f


class MultiHeadAttention(nn.Module):
    """torch.nn.MultiheadAttention-equivalent with fused qkv projection.

    ``in_proj_weight`` is stored as **[3, E, E]** — torch's fused [3E, E]
    with the (q,k,v) axis made explicit (a pure reshape at the checkpoint
    boundary, ``torch_import.qkv_from_torch``). Two wins:

    * tensor parallelism: ``P(None, "model", None)`` row-shards each of
      q/k/v independently, so the split always lands on complete heads and
      the compiled dp×tp step needs ZERO resharding collectives (pinned by
      ``test_parallel``). A flat [3E] row split either crossed q/k/v
      boundaries (torch order) or required strided activation slicing
      (head-interleaved order — measured +3 ms/step of relayout copies on
      v5e, round 3);
    * extraction: q/k/v are free leading-axis slices of the j-batched
      projection — no 64-lane activation slicing anywhere.

    ``seq_fold``: 1 = plain attention; 0 = auto-pick a batch fold (see
    ``pick_seq_fold``); f>1 = pack f batch rows per attention call behind a
    block-diagonal mask. Requires a 3-D [B, L, E] input.
    """

    embed_dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    seq_fold: int = 1

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None, ln_params=None):
        e, h = self.embed_dim, self.num_heads
        head_dim = e // h
        assert head_dim * h == e

        in_proj_weight = self.param(
            "in_proj_weight",
            nn.initializers.truncated_normal(
                # torch trunc_normal_(std=.02): [a,b]=[-2,2] are
                # ABSOLUTE bounds = +/-100 sigma (flax's are in sigma
                # units), i.e. effectively untruncated
                0.02, lower=-100.0, upper=100.0,
            ),
            (3, e, e),
            jnp.float32,
        )
        in_proj_bias = self.param(
            "in_proj_bias", nn.initializers.zeros, (3, e), jnp.float32
        )

        if ln_params is not None:
            # fused pre-LN: the block's ln_1 rides the qkv matmul (ln_dense).
            # Single-chip path: the [3,E,E]->[3E,E] merge is a free reshape
            # (fused-LN is a single-chip opt-in, off by default)
            ln_scale, ln_bias = ln_params
            qkv = ln_dense(
                x, ln_scale, ln_bias,
                in_proj_weight.reshape(3 * e, e).T,
                in_proj_bias.reshape(3 * e),
            )
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q, k, v = qkv_project(
                x, in_proj_weight, in_proj_bias, self.dtype, num_heads=h
            )

        fold = self.seq_fold
        if fold != 1 and x.ndim == 3:
            b, l = x.shape[0], x.shape[1]
            f = pick_seq_fold(b, l) if fold == 0 else fold
            if f > 1 and b % f == 0:
                return self._folded_attention(
                    q, k, v, mask, f, h, head_dim, e
                )

        def heads(t):  # [..., L, E] -> [..., L, H, Dh]; heads stay trailing —
            # the einsum below carries H in the batch dims of the dot, so no
            # materialized [.., H, L, Dh] transpose is ever built (measured
            # -15% vs the moveaxis formulation at ViT-B/32 shapes on v5e)
            return t.reshape(t.shape[:-1] + (h, head_dim))

        q = heads(q) * (head_dim**-0.5)
        k = heads(k)
        v = heads(v)

        # XLA attention. A Pallas fused path was measured extensively on v5e
        # and loses at these short sequence lengths — Mosaic's 64-lane head
        # granularity forces relayouts that cost more than the fusion saves
        # (see PERFORMANCE.md "Pallas kernel exploration"); the kernels stay
        # in ops/pallas_attention.py as test-covered reference
        # implementations.
        logits = jnp.einsum(
            "...lhd,...mhd->...hlm", q, k, preferred_element_type=jnp.float32
        )
        if mask is not None:
            logits = logits + mask
        if self.dtype == jnp.bfloat16 and x.shape[-2] > 32:
            # long-sequence bf16 mode: materialize the logits buffer in bf16
            # (softmax still normalizes in fp32). Halves the dominant HBM
            # round-trip; measured -19% on the ViT attention layer. -inf mask
            # rows survive the cast, so masking stays exact. Short sequences
            # keep fp32 logits — at 16-lane trailing dims the bf16 round-trip
            # relayout costs more than the bytes saved (measured).
            logits = logits.astype(jnp.bfloat16)
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
            self.dtype
        )
        out = jnp.einsum(
            "...hlm,...mhd->...lhd", attn, v,
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)
        out = out.reshape(out.shape[:-2] + (e,))
        return self._out_proj(out, e)

    def _folded_attention(self, q, k, v, mask, f, h, head_dim, e):
        b, l = q.shape[0], q.shape[1]
        scale = head_dim**-0.5

        def fold(t):  # contiguous: [B, L, E] -> [B/f, f*L, H, Dh]
            return t.reshape(b // f, f * l, h, head_dim)

        logits = jnp.einsum(
            "blhd,bmhd->bhlm", fold(q) * scale, fold(k),
            preferred_element_type=jnp.float32,
        )
        # block-diagonal fold mask; per-sequence mask tiles along the diagonal
        idx = jnp.arange(f * l) // l
        same = idx[:, None] == idx[None, :]
        base = jnp.zeros((l, l), jnp.float32) if mask is None else mask
        folded_mask = jnp.where(same, jnp.tile(base, (f, f)), -jnp.inf)
        if self.dtype == jnp.bfloat16:
            # bf16 logits buffer (fp32 softmax): halves the folded fp32
            # logits footprint, the cost that capped the fold factor. -inf
            # cross-sequence entries survive the cast → exp still exactly 0.
            logits = (logits + folded_mask).astype(jnp.bfloat16)
            folded_mask = None
        attn = jax.nn.softmax(
            logits.astype(jnp.float32)
            + (0.0 if folded_mask is None else folded_mask),
            axis=-1,
        ).astype(self.dtype)
        out = jnp.einsum(
            "bhlm,bmhd->blhd", attn, fold(v),
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)
        return self._out_proj(out.reshape(b, l, e), e)

    def _out_proj(self, out, e):
        return nn.Dense(
            e,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="out_proj",
            kernel_init=nn.initializers.truncated_normal(
                # torch trunc_normal_(std=.02): [a,b]=[-2,2] are
                # ABSOLUTE bounds = +/-100 sigma (flax's are in sigma
                # units), i.e. effectively untruncated
                0.02, lower=-100.0, upper=100.0,
            ),
        )(out)


class _DenseParams(nn.Module):
    """Declares an ``nn.Dense``-identical (kernel, bias) pair without
    applying it — the fused LN→Dense path needs the raw parameters while
    keeping the checkpoint tree byte-compatible (e.g. ``mlp/c_fc/kernel``)."""

    features: int

    @nn.compact
    def __call__(self, d_in: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (d_in, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return kernel, bias


class MLPBlock(nn.Module):
    """CLIP MLP: c_fc (E -> 4E) -> QuickGELU -> c_proj (4E -> E)."""

    width: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, ln_params=None):
        if ln_params is not None:
            kernel, bias = _DenseParams(self.width * 4, name="c_fc")(
                x.shape[-1]
            )
            x = ln_dense(x, ln_params[0], ln_params[1], kernel, bias)
        else:
            x = nn.Dense(
                self.width * 4, dtype=self.dtype, param_dtype=jnp.float32,
                name="c_fc",
            )(x)
        x = quick_gelu(x)
        x = nn.Dense(
            self.width, dtype=self.dtype, param_dtype=jnp.float32, name="c_proj"
        )(x)
        return x


class ResidualAttentionBlock(nn.Module):
    """Pre-LN transformer block (CLIP layout).

    ``moe_experts > 0`` swaps the dense MLP for a mixture-of-experts FFN
    (``parallel.expert.MoEMLP``, params under ``mlp_moe`` so dense
    checkpoints are unaffected) — a beyond-reference capability; the
    reference has no MoE (SURVEY §2.3 EP "n/a")."""

    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32
    seq_fold: int = 0
    moe_experts: int = 0
    moe_top_k: int = 1

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None):
        attn = MultiHeadAttention(
            self.width, self.heads, dtype=self.dtype, name="attn",
            seq_fold=self.seq_fold,
        )
        if self.moe_experts:
            from ..parallel.expert import MoEMLP

            mlp = MoEMLP(
                self.width, self.moe_experts, router_top_k=self.moe_top_k,
                dtype=self.dtype, name="mlp_moe",
            )
            # MoE routes per token — the fused-LN opt-in does not apply
            x = x + attn(LayerNorm32(name="ln_1")(x), mask)
            return x + mlp(LayerNorm32(name="ln_2")(x))
        mlp = MLPBlock(self.width, dtype=self.dtype, name="mlp")
        if use_fused_ln(self.dtype):
            ln1 = LayerNorm32(name="ln_1")(x, return_params=True)
            x = x + attn(x, mask, ln_params=ln1)
            ln2 = LayerNorm32(name="ln_2")(x, return_params=True)
            x = x + mlp(x, ln_params=ln2)
        else:
            from ..ops.pallas_addln import (
                add_layernorm,
                addln_enabled,
                supported as addln_supported,
            )

            if addln_enabled() and addln_supported(self.width):
                # receipt opt-in (VTC_PALLAS_ADDLN=1), measured a 10.8%
                # LOSS and parked — XLA already fuses the residual add,
                # see PERFORMANCE.md "Round 4". Param tree unchanged.
                attn_out = attn(LayerNorm32(name="ln_1")(x), mask)
                scale, bias = LayerNorm32(name="ln_2")(
                    x, return_params=True
                )
                x, h2 = add_layernorm(x, attn_out, scale, bias)
                x = x + mlp(h2)
            else:
                x = x + attn(LayerNorm32(name="ln_1")(x), mask)
                x = x + mlp(LayerNorm32(name="ln_2")(x))
        return x


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch's running-stat semantics: the running variance
    is updated with the UNBIASED batch variance (n/(n-1)), while
    normalization uses the biased one — flax's ``nn.BatchNorm`` uses the
    biased variance for both, a train-path drift vs torch twins (the CAM's
    hand-rolled ``bn`` residual activation applies the same correction).
    Parameter/stat tree names match ``nn.BatchNorm`` (``scale``/``bias`` in
    params, ``mean``/``var`` in batch_stats) so checkpoints are unaffected.
    Normalizes over the last axis; leading axes are batch."""

    use_running_average: bool = True
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        use_running_average = self.use_running_average
        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (d,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", jnp.zeros, (d,))
        ra_var = self.variable("batch_stats", "var", jnp.ones, (d,))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            x32 = x.astype(jnp.float32).reshape(-1, d)
            mean = jnp.mean(x32, axis=0)
            var = jnp.var(x32, axis=0)
            if not self.is_initializing():
                n = x32.shape[0]
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * unbiased
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(self.dtype)


_TP_QKV = False
_TP_DEGREE = 1


def set_tp_qkv(enabled: bool, degree: Optional[int] = None) -> None:
    """Select the qkv projection form for subsequently traced models.
    ``parallel.mesh.create_mesh`` calls this with ``n_model > 1`` — creating
    a tp mesh enables the per-projection dots, and creating a later
    single-model-axis mesh switches back to the merged GEMM (the flag tracks
    the newest mesh rather than latching on, so tp work in a process does
    not degrade later single-chip traces).

    ``degree`` records the model-axis size so attention can verify at trace
    time that it divides the tower's head count — the one place the head
    count is actually known (``tree_shardings`` can only check parameter-dim
    divisibility, which e.g. tp=8 on a 12-head tower passes while splitting
    mid-head)."""
    global _TP_QKV, _TP_DEGREE
    _TP_QKV = bool(enabled)
    # unknown degree (legacy one-arg callers) -> 1: validation is skipped
    # rather than armed with a guess (tp_qkv_degree's contract)
    _TP_DEGREE = int(degree) if degree else 1


def tp_qkv_degree() -> int:
    """Model-axis size of the newest tp mesh (1 when tp is off or the
    degree is unknown, e.g. the ``VTC_TP_QKV=1`` force)."""
    return _TP_DEGREE if _TP_QKV else 1


def use_tp_qkv() -> bool:
    """Model-parallel qkv form: three local per-projection dots instead of
    the merged [E, 3E] GEMM. Required for zero-resharding tensor parallelism
    (GSPMD cannot merge the sharded E dim of the [3, E, E] weight into 3E
    without a gather); costs two extra HBM reads of the activations, so
    single-chip/dp keeps the merged GEMM. Managed by :func:`set_tp_qkv`
    (called by ``parallel.mesh.create_mesh``); ``VTC_TP_QKV=1`` forces it on
    for experiments."""
    return _TP_QKV or os.environ.get("VTC_TP_QKV") == "1"


def qkv_project(x, in_proj_weight, in_proj_bias, dtype, num_heads=None):
    """The [3, E, E] fused-qkv projection, in the form ``use_tp_qkv``
    selects (see :class:`MultiHeadAttention` for the layout rationale).
    Shared by every attention variant so the tp-gated policy lives in ONE
    place. Returns ``(q, k, v)``, each [..., L, E] in ``dtype``.

    ``num_heads`` (when the caller knows it) lets the tp path verify the
    model-axis degree divides the head count — the zero-collective property
    needs the E row split to land on head boundaries, and parameter-dim
    divisibility alone cannot catch e.g. tp=8 on a 12-head tower."""
    e = in_proj_weight.shape[-1]
    if use_tp_qkv():
        deg = tp_qkv_degree()
        if num_heads is not None and deg > 1 and num_heads % deg:
            raise ValueError(
                f"tensor-parallel degree {deg} does not divide this tower's "
                f"head count {num_heads}: the model-axis row split would "
                f"cross head boundaries and GSPMD would reshard (pick a tp "
                f"that divides every tower's head count; ViT-B/32: 12 "
                f"visual + 8 text heads -> tp in {{2, 4}})"
            )
        # tensor-parallel form: three LOCAL dots against the per-j weight
        # slices — each [E, E] slice is row-sharded on head boundaries by
        # P(None, "model", None), so no collective touches qkv at all.
        w = in_proj_weight.astype(dtype)
        b3 = in_proj_bias.astype(dtype)
        return (
            _dot(x, w[0].T) + b3[0],
            _dot(x, w[1].T) + b3[1],
            _dot(x, w[2].T) + b3[2],
        )
    # single-chip/dp default: ONE fused GEMM (x read once); the
    # [3,E,E]->[3E,E] weight merge is a free reshape and the j-major
    # output splits into contiguous full-lane slices (the round-2
    # measured-fast path — j-batched einsum variants force an output
    # transpose, measured -18% end-to-end on v5e)
    qkv = _dot(
        x, in_proj_weight.reshape(3 * e, e).astype(dtype).T
    ) + in_proj_bias.reshape(3 * e).astype(dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    return q, k, v


def use_remat() -> bool:
    """Rematerialize transformer blocks in backward (``VTC_REMAT=1``): trades
    recompute FLOPs for activation HBM — the standard lever for large-batch
    video finetuning."""
    return os.environ.get("VTC_REMAT") == "1"


class Transformer(nn.Module):
    """Stack of residual attention blocks. Also reused standalone as the CAM
    transformer (``clip.model.Transformer`` in ``model/model.py:396-398``)."""

    width: int
    layers: int
    heads: int
    dtype: jnp.dtype = jnp.float32
    seq_fold: int = 0  # 0 = auto batch-fold in attention (exact; see above)
    moe_experts: int = 0  # >0: MoE FFNs (parallel.expert), beyond-reference
    moe_top_k: int = 1

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None):
        if not self.is_initializing():
            # config-selected pipeline/sequence sharding of this stack
            # (train.py --pp/--sp -> parallel.stack.set_stack_parallel);
            # returns None when off or this stack is ineligible
            from ..parallel.stack import (
                stack_parallel_mode,
                transformer_stack_override,
            )

            if stack_parallel_mode() is not None:
                out = transformer_stack_override(self, x, mask)
                if out is not None:
                    return out
        block_cls = ResidualAttentionBlock
        if use_remat():
            block_cls = nn.remat(ResidualAttentionBlock, static_argnums=())
        for i in range(self.layers):
            x = block_cls(
                self.width, self.heads, dtype=self.dtype, name=f"resblocks_{i}",
                seq_fold=self.seq_fold,
                moe_experts=self.moe_experts, moe_top_k=self.moe_top_k,
            )(x, mask)
        return x


def causal_mask(length: int) -> jax.Array:
    """Additive causal mask (upper-triangular -inf), fp32 (added to fp32
    logits before any bf16 cast)."""
    mask = jnp.full((length, length), -jnp.inf, dtype=jnp.float32)
    mask = jnp.triu(mask, k=1)
    return mask


def l2_normalize(x, axis=-1):
    """x / ||x|| matching the reference ``normalize`` (``model/model.py:26``)."""
    return x / jnp.linalg.norm(x, axis=axis, keepdims=True)


def l2_normalize_eps(x, eps=1e-9, axis=-1):
    """``normalize_eps`` (``model/model.py:30``)."""
    return l2_normalize(x + eps, axis=axis)
