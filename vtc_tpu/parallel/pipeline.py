"""GPipe-style pipeline parallelism over the transformer block stack.

The reference's closest analogue is its manual 2-GPU model split of the
visual tower — one activation hop, no overlap (``model/model.py:590-613``).
SURVEY §2.3 marks pipeline parallelism "not required for parity" (ViT-B/32
fits on one chip), so this module is a beyond-parity capability for towers
that don't fit or don't batch well on one chip (ViT-L/14-scale, video
towers without rematerialization).

TPU-native design: the block stack's parameters are stacked along a leading
layer axis and sharded over a mesh axis (each device holds
``n_layers / n_stages`` contiguous blocks); microbatches stream through the
stages on a GPipe schedule — ``n_micro + n_stages - 1`` ticks, every stage
computing its blocks each tick and shifting activations to its neighbor
with ``lax.ppermute`` (point-to-point over ICI, no all-to-alls). The whole
schedule is ONE ``lax.scan`` inside ONE ``shard_map``, so XLA compiles a
single program and jax autodiff differentiates straight through it — the
backward pass is the reverse pipeline with the same neighbor shifts, no
hand-written schedule needed.

Bubble fraction is the usual (S-1)/(T+S-1); pick ``n_micro >= 4·S`` to
amortize. Activations are replicated over any other mesh axes present
(compose with dp by sharding the batch outside and running the pipeline
per data shard).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

PIPE_AXIS = "pipe"


def stack_layer_params(params: dict, n_layers: int, prefix: str = "resblocks_"):
    """Stack ``params[f"{prefix}{i}"]`` for ``i in range(n_layers)`` into one
    pytree whose leaves carry a leading layer axis — the layout
    ``pipeline_blocks`` shards over the pipeline stages."""
    blocks = []
    for i in range(n_layers):
        key = f"{prefix}{i}"
        if key not in params:
            raise KeyError(f"missing block params {key!r}")
        blocks.append(params[key])
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)


def pipeline_blocks(
    block_apply: Callable,
    stacked_params,
    x: jax.Array,
    *,
    mesh: Mesh,
    n_micro: int,
    axis: str = PIPE_AXIS,
    batch_axis: Optional[str] = None,
):
    """Apply ``n_layers`` identical blocks to ``x`` as a microbatch pipeline.

    Args:
      block_apply: ``(layer_params, h) -> h`` for ONE block (close over any
        mask / static config).
      stacked_params: pytree with leading layer axis (``stack_layer_params``).
      x: ``[B, ...]`` activations; the per-batch-shard ``B`` must divide by
        ``n_micro``.
      mesh: mesh containing ``axis``; other axes see replicated compute
        unless named by ``batch_axis``.
      n_micro: number of microbatches streamed through the stages.
      axis: mesh axis name holding the stages.
      batch_axis: mesh axis the leading (batch) dim of ``x`` is sharded
        over — the dp×pp composition: each data shard runs its own
        microbatch pipeline over the same stages. None replicates the batch
        (every data position computes the full pipeline).

    Returns ``[B, ...]`` activations, sharded like the input (the last
    stage's outputs are broadcast back along the pipe axis with one psum).
    """
    n_stages = mesh.shape[axis]
    n_layers = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if n_layers % n_stages:
        raise ValueError(
            f"{n_layers} layers do not divide over {n_stages} pipeline stages"
        )
    batch = x.shape[0]
    n_batch_shards = mesh.shape[batch_axis] if batch_axis else 1
    if batch % n_batch_shards:
        raise ValueError(
            f"batch {batch} does not divide over {n_batch_shards} "
            f"{batch_axis!r} shards"
        )
    local_batch = batch // n_batch_shards
    if local_batch % n_micro:
        raise ValueError(
            f"per-shard batch {local_batch} does not divide into "
            f"{n_micro} microbatches"
        )
    if n_stages == 1:
        # degenerate pipeline: just scan the blocks
        def one(h, p):
            return block_apply(p, h), None

        return jax.lax.scan(one, x, stacked_params)[0]

    n_ticks = n_micro + n_stages - 1

    def stage_fn(local_params, xl):
        # local_params: this stage's [n_layers/n_stages, ...] blocks;
        # xl: this data shard's [local_batch, ...] rows — the microbatch
        # split happens here, AFTER the batch sharding, so the two compose
        xm = xl.reshape(n_micro, local_batch // n_micro, *xl.shape[1:])
        stage = jax.lax.axis_index(axis)

        def run_stage(h):
            def one(h, p):
                return block_apply(p, h), None

            return jax.lax.scan(one, h, local_params)[0]

        def tick(carry, t):
            state, outs = carry
            # stage 0 injects microbatch t (clamped index; the tail ticks
            # re-inject the last microbatch into an already-drained stage 0,
            # whose output is never collected)
            inject = jax.lax.dynamic_index_in_dim(
                xm, jnp.clip(t, 0, n_micro - 1), axis=0, keepdims=False
            )
            state = jnp.where(stage == 0, inject, state)
            y = run_stage(state)
            # the last stage finishes microbatch t-(S-1) at tick t
            out_t = t - (n_stages - 1)
            idx = jnp.clip(out_t, 0, n_micro - 1)
            cur = jax.lax.dynamic_index_in_dim(outs, idx, axis=0, keepdims=False)
            upd = jnp.where((stage == n_stages - 1) & (out_t >= 0), y, cur)
            outs = jax.lax.dynamic_update_index_in_dim(outs, upd, idx, axis=0)
            # shift activations one stage down the ring (stage 0 receives
            # zeros — immediately overwritten by the next injection)
            nxt = jax.lax.ppermute(
                y, axis, [(i, i + 1) for i in range(n_stages - 1)]
            )
            return (nxt, outs), None

        init = (jnp.zeros_like(xm[0]), jnp.zeros_like(xm))
        (_, outs), _ = jax.lax.scan(tick, init, jnp.arange(n_ticks))
        # broadcast the last stage's outputs to every stage
        outs = jax.lax.psum(
            jnp.where(stage == n_stages - 1, outs, jnp.zeros_like(outs)), axis
        )
        return outs.reshape(local_batch, *xl.shape[1:])

    x_spec = P(batch_axis) if batch_axis else P()
    return shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=(P(axis), x_spec),
        out_specs=x_spec,
        check_rep=False,
    )(stacked_params, x)


def clip_block_apply(
    width: int,
    heads: int,
    dtype=jnp.float32,
    mask: Optional[jax.Array] = None,
    seq_fold: int = 0,
) -> Callable:
    """``block_apply`` for the CLIP/ViT pre-LN block (``ResidualAttentionBlock``)
    — lets the towers' ``transformer/resblocks_*`` params run pipelined
    without touching the module definitions."""
    from ..models.layers import ResidualAttentionBlock

    block = ResidualAttentionBlock(width, heads, dtype=dtype, seq_fold=seq_fold)

    def apply(layer_params, h):
        return block.apply({"params": layer_params}, h, mask)

    return apply


def timesformer_block_apply(
    width: int,
    heads: int,
    nframes: int,
    dtype=jnp.float32,
) -> Callable:
    """``block_apply`` for the divided space-time block
    (``models/timesformer.py:TimeSformerBlock``; params under
    ``transformer_resblocks_{i}`` — pass that prefix to
    ``stack_layer_params``). The video tower is where pipeline stages earn
    their keep: its activation footprint is what forces ``VTC_REMAT`` on a
    single chip."""
    from ..models.timesformer import TimeSformerBlock

    block = TimeSformerBlock(width, heads, dtype=dtype)

    def apply(layer_params, h):
        return block.apply({"params": layer_params}, h, nframes)

    return apply


def create_pipeline_mesh(n_data: int, n_pipe: int, devices=None) -> Mesh:
    """``("data", "pipe")`` mesh for dp×pp runs (tp and pp both consume the
    non-batch axis; combine at most one of them with dp per mesh)."""
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())
    if len(devices) < n_data * n_pipe:
        raise ValueError(
            f"need {n_data * n_pipe} devices, have {len(devices)}"
        )
    arr = np.array(devices[: n_data * n_pipe]).reshape(n_data, n_pipe)
    from ..models import layers
    from .mesh import DATA_AXIS

    # newest-mesh-wins (like create_mesh): a pipe mesh has no tp axis, so
    # attention drops back to the merged single-GEMM qkv form
    layers.set_tp_qkv(False, 1)
    return Mesh(arr, (DATA_AXIS, PIPE_AXIS))
