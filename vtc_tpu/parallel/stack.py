"""Config-reachable stack parallelism: route the models' transformer block
stacks through pipeline (GPipe) or sequence (ring-attention) sharding.

``parallel/pipeline.py`` and ``parallel/sequence.py`` provide the kernels
(exactness pinned by ``test_pipeline.py`` / ``test_sequence.py``); this
module makes them **training configurations**: ``train.py --pp N`` /
``--sp N`` call :func:`set_stack_parallel` after creating the matching
mesh, and every ``models.layers.Transformer`` (text tower, ViT tower, CAM
adapter) and ``models.timesformer.TimeSformer`` stack traced afterwards
dispatches through the sharded schedule instead of the sequential block
loop — no model-definition or checkpoint changes, exactly like the
``set_tp_qkv`` tensor-parallel switch.

This generalizes the reference's only user-reachable model split — the
manual 2-GPU visual-tower placement (``model/model.py:590-613``, CLI flag
``--visual_device`` at ``train.py:270``) — into proper pipeline/sequence
sharding over a TPU mesh.

Fallback policy: a stack that cannot run under the active mode (MoE FFNs,
layer count not divisible by the stage count, non-3D input, the fused-LN
opt-in) silently runs the sequential loop — the pp/sp axes are performance
layouts, never semantics, so partial coverage must not change results. The
TimeSformer's divided space-time attention supports pipeline stages
(``timesformer_block_apply``) but not ring sequence sharding (its token
layout alternates between temporal and spatial groupings per block), so
under ``--sp`` the video tower runs data-parallel while the text/CAM
stacks ring-shard.
"""

from __future__ import annotations

from typing import Optional

from jax.sharding import Mesh

from .mesh import DATA_AXIS

# active context: None | ("pipe", mesh, n_micro) | ("seq", mesh, None) —
# read at trace time (newest-mesh-wins, the set_tp_qkv idiom)
_CTX: Optional[tuple] = None


def set_stack_parallel(
    mode: Optional[str] = None, mesh: Optional[Mesh] = None, n_micro: int = 4
) -> None:
    """Select the stack execution mode for subsequently traced models.

    mode: None (sequential), "pipe" (GPipe over the mesh's ``pipe`` axis)
    or "seq" (ring attention over the mesh's ``seq`` axis). ``n_micro`` is
    the requested microbatch count for "pipe" (clamped per stack to the
    largest divisor of its per-shard batch)."""
    global _CTX
    if mode is None:
        _CTX = None
        return
    if mode not in ("pipe", "seq"):
        raise ValueError(f"unknown stack-parallel mode {mode!r}")
    if mesh is None:
        raise ValueError("set_stack_parallel needs the mesh for the mode")
    axis = {"pipe": "pipe", "seq": "seq"}[mode]
    if axis not in mesh.shape:
        raise ValueError(
            f"mode {mode!r} needs a {axis!r} mesh axis; got {mesh}"
        )
    _CTX = (mode, mesh, int(n_micro) if mode == "pipe" else None)


def stack_parallel_mode() -> Optional[str]:
    return _CTX[0] if _CTX is not None else None


def _batch_axis(mesh: Mesh, batch: int) -> Optional[str]:
    """dp composition: shard the leading dim over ``data`` when it divides
    (training batches always do — drop_last); otherwise replicate."""
    if DATA_AXIS in mesh.shape and batch % mesh.shape[DATA_AXIS] == 0:
        return DATA_AXIS
    return None


def _pick_n_micro(requested: int, local_batch: int) -> int:
    m = max(1, min(int(requested), local_batch))
    while local_batch % m:
        m -= 1
    return m


def transformer_stack_override(tf_module, x, mask):
    """Called by ``models.layers.Transformer.__call__``: returns the
    pipelined / sequence-sharded stack output, or None when the context is
    off or this stack is ineligible (it then runs the sequential loop)."""
    ctx = _CTX
    if ctx is None or tf_module.is_initializing():
        return None
    if tf_module.moe_experts or x.ndim != 3:
        return None
    from ..models.layers import use_fused_ln

    if use_fused_ln(tf_module.dtype):
        return None

    mode, mesh, n_micro = ctx
    from .pipeline import PIPE_AXIS, stack_layer_params

    params = tf_module.variables["params"]
    stacked = stack_layer_params(params, tf_module.layers)
    batch_axis = _batch_axis(mesh, x.shape[0])

    if mode == "pipe":
        from .pipeline import clip_block_apply, pipeline_blocks

        n_stages = mesh.shape[PIPE_AXIS]
        if tf_module.layers % n_stages:
            return None
        local_batch = x.shape[0] // (
            mesh.shape[DATA_AXIS] if batch_axis else 1
        )
        return pipeline_blocks(
            clip_block_apply(
                tf_module.width, tf_module.heads, dtype=tf_module.dtype,
                mask=mask, seq_fold=tf_module.seq_fold,
            ),
            stacked,
            x,
            mesh=mesh,
            n_micro=_pick_n_micro(n_micro, local_batch),
            batch_axis=batch_axis,
        )

    # mode == "seq": ring attention; pad so L divides over the shards
    from .sequence import SEQ_AXIS, pad_for_sp, sp_transformer

    xp, maskp, orig_len = pad_for_sp(x, mask, mesh.shape[SEQ_AXIS])
    # Pin the pre-shard_map activations to batch-only sharding: without the
    # constraint GSPMD back-propagates the shard_map's (data, seq) layout
    # through the embedding gather onto the raw TOKEN arrays and picks a
    # data-replicated, seq-sharded layout for them — reachable only by
    # replicate-then-partition ("Involuntary full rematerialization", the
    # round-4 dryrun tail). Pinned here, the (data,)->(data, seq) transition
    # happens at shard_map entry, a local slice.
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    xp = jax.lax.with_sharding_constraint(
        xp, NamedSharding(mesh, P(batch_axis, None, None))
    )
    out = sp_transformer(
        stacked, xp, maskp,
        mesh=mesh, heads=tf_module.heads, batch_axis=batch_axis,
        dtype=tf_module.dtype,
    )
    return out[:, :orig_len]


def timesformer_stack_override(ts_module, x, nframes: int):
    """Called by ``models.timesformer.TimeSformer``: pipeline the divided
    space-time block stack (params under ``transformer_resblocks_{i}``).
    Returns None under "seq" mode or when ineligible — see module
    docstring's fallback policy."""
    ctx = _CTX
    if ctx is None or ts_module.is_initializing():
        return None
    mode, mesh, n_micro = ctx
    if mode != "pipe":
        return None
    from ..models.layers import use_fused_ln

    if use_fused_ln(ts_module.dtype):
        return None
    from .pipeline import (
        PIPE_AXIS,
        pipeline_blocks,
        stack_layer_params,
        timesformer_block_apply,
    )

    v = ts_module.variant
    n_stages = mesh.shape[PIPE_AXIS]
    if v.vision_layers % n_stages:
        return None
    params = ts_module.variables["params"]
    stacked = stack_layer_params(
        params, v.vision_layers, prefix="transformer_resblocks_"
    )
    batch_axis = _batch_axis(mesh, x.shape[0])
    local_batch = x.shape[0] // (mesh.shape[DATA_AXIS] if batch_axis else 1)
    return pipeline_blocks(
        timesformer_block_apply(
            v.vision_width, v.vision_heads, nframes, dtype=ts_module.dtype
        ),
        stacked,
        x,
        mesh=mesh,
        n_micro=_pick_n_micro(n_micro, local_batch),
        batch_axis=batch_axis,
    )
