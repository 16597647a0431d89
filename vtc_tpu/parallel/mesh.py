"""Device mesh + sharding rules.

The reference's parallelism is single-process DataParallel plus one manual
2-GPU model split (``train.py:77-79``, ``model/model.py:590-613``). Here both
are subsumed by a single ``jax.sharding.Mesh`` with axes ``("data", "model")``:

* batch axes shard over ``data`` (gradients psum over ICI by the partitioner);
* the transformer's large GEMMs shard Megatron-style over ``model`` (qkv /
  mlp-in split by output column, out-proj / mlp-out by input row), which also
  covers the reference's visual-tower-on-its-own-device capability without a
  pipeline scheduler. The fused qkv is stored [3, E, E]
  (``models/layers.py``), so the per-projection row split lands on complete
  head groups: the compiled dp×tp step has ZERO resharding collectives
  (pinned by ``test_parallel.py::test_collective_profile_is_pinned``).
  The zero-collective property requires ``tp`` to divide EVERY tower's head
  count (ViT-B/32: 12 visual + 8 text heads -> tp in {2, 4});
  ``tree_shardings`` rejects meshes whose model axis does not divide the
  sharded parameter dims.

Everything is GSPMD: param/batch PartitionSpecs are assigned by path rules
below and XLA inserts the collectives.

Beyond the reference (which replicates the full model per GPU,
``train.py:77-79``), ``fsdp=True`` additionally shards every large parameter
— and, because the rules are path-suffix matched, its Adam moments — over
the ``data`` axis (ZeRO-3/FSDP): each chip holds 1/dp of the params and
optimizer state, XLA all-gathers weights right before use and
reduce-scatters gradients, so the memory high-water drops by ~dp× for
weight+state at the cost of one gather per weight per step (rides ICI).
Exactness is pinned by ``test_fsdp.py`` (fsdp step ≡ single-device step).
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
# multi-slice scale-out axis: data parallelism ACROSS slices. Gradient
# all-reduces are the only traffic that crosses it (DCN-friendly: one
# psum per step); tp collectives and fsdp weight gathers name the inner
# axes, so they stay on ICI within a slice — the scaling-book layout.
REPLICA_AXIS = "replica"


def create_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices=None,
    n_replica: int = 1,
) -> Mesh:
    """``("data", "model")`` mesh, or ``("replica", "data", "model")`` with
    ``n_replica > 1`` for multi-slice pods (``train.py --slices``): the
    replica axis is laid out across slices so only the gradient psum rides
    DCN, while tp/fsdp collectives stay on each slice's ICI. On hardware
    that reports slice topology the hybrid layout comes from
    ``mesh_utils.create_hybrid_device_mesh``; elsewhere (CPU test meshes)
    devices are grouped contiguously, which preserves the axis semantics."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // (n_model * n_replica)
    devices = devices[: n_replica * n_data * n_model]
    # Switch attention to the per-projection qkv dots so the [3, E, E]
    # sharding stays collective-free; read at trace time, so setting it
    # here covers every caller. tp=1 meshes switch BACK to the merged GEMM
    # (the flag tracks the newest mesh — see layers.set_tp_qkv).
    from ..models import layers

    layers.set_tp_qkv(n_model > 1, n_model)
    if n_replica == 1:
        arr = np.array(devices).reshape(n_data, n_model)
        return Mesh(arr, (DATA_AXIS, MODEL_AXIS))
    try:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_hybrid_device_mesh(
            (1, n_data, n_model), (n_replica, 1, 1), devices=devices
        )
    except (ValueError, AttributeError, KeyError):
        # no slice topology attributes (CPU backend / single-slice
        # hardware): contiguous grouping keeps each "slice" a block
        arr = np.array(devices).reshape(n_replica, n_data, n_model)
    return Mesh(arr, (REPLICA_AXIS, DATA_AXIS, MODEL_AXIS))


# (path regex, PartitionSpec) — first match wins. Paths are '/'-joined.
_PARAM_RULES = [
    # fused qkv [3, E, E]: shard each projection's E output rows over model
    # (always head-aligned when tp divides the head count)
    (re.compile(r".*attn/in_proj_weight$"), P(None, MODEL_AXIS, None)),
    (re.compile(r".*attn/in_proj_bias$"), P(None, MODEL_AXIS)),
    # attention output projection: input (head) dim sharded
    (re.compile(r".*attn/out_proj/kernel$"), P(MODEL_AXIS, None)),
    # MLP: in-proj by column, out-proj by row
    (re.compile(r".*mlp/c_fc/kernel$"), P(None, MODEL_AXIS)),
    (re.compile(r".*mlp/c_fc/bias$"), P(MODEL_AXIS)),
    (re.compile(r".*mlp/c_proj/kernel$"), P(MODEL_AXIS, None)),
    # large embedding tables: shard the vocab/table rows
    (re.compile(r".*token_embedding$"), P(MODEL_AXIS, None)),
]


def param_pspec(path: str) -> P:
    for rule, spec in _PARAM_RULES:
        if rule.match(path):
            return spec
    return P()  # replicated


# Parameters smaller than this stay replicated under fsdp: gathering a
# 3 KB LayerNorm scale costs more in collective latency than the shard
# saves in HBM. 64k fp32 elements = 256 KB — sharding starts paying there.
FSDP_MIN_SIZE = 65536


def fsdp_pspec(path: str, shape, n_data: int) -> P:
    """ZeRO/FSDP spec: the TP spec with the largest still-unsharded,
    ``n_data``-divisible dim additionally sharded over the data axis.
    Small leaves (< FSDP_MIN_SIZE elements) keep their TP spec."""
    spec = param_pspec(path)
    if int(np.prod(shape)) < FSDP_MIN_SIZE:
        return spec
    dims = tuple(spec) + (None,) * (len(shape) - len(spec))
    best = None
    for i, (d, axis) in enumerate(zip(shape, dims)):
        if axis is None and d % n_data == 0:
            if best is None or d > shape[best]:
                best = i
    if best is None:
        return spec
    return P(*dims[:best], DATA_AXIS, *dims[best + 1 :])


def _path_str(path) -> str:
    parts = []
    for p in path:
        parts.append(str(getattr(p, "key", getattr(p, "idx", p))))
    return "/".join(parts)


def tree_pspecs(tree, fsdp_n_data: Optional[int] = None):
    """Pytree of PartitionSpecs for a parameter (or whole train-state) tree.
    Rules are path-SUFFIX matched, so they apply equally under an
    ``opt_state/mu/...`` prefix — the Adam moments shard exactly like their
    parameter, which is what makes fsdp a ZeRO-3 (param+state) shard, not a
    weights-only one. Leaves whose rank is below the matched spec (the fused
    optimizer's scalar frozen-moment placeholders, step counters) degrade to
    replicated."""

    def spec_for(path, leaf):
        path = _path_str(path)
        shape = tuple(getattr(leaf, "shape", ()))
        spec = (
            fsdp_pspec(path, shape, fsdp_n_data)
            if fsdp_n_data
            else param_pspec(path)
        )
        if len(spec) > len(shape):
            return P()
        return spec

    return jax.tree_util.tree_map_with_path(spec_for, tree)


def tree_shardings(tree, mesh: Mesh, fsdp: bool = False):
    """NamedShardings for a parameter tree; raises when the mesh's model
    axis does not divide a sharded parameter dim (GSPMD would silently pad
    and reshard, voiding the pinned zero-collective profile — e.g. tp=3 on
    the text tower's E=512 rows). ``fsdp=True`` additionally shards large
    leaves over the data axis (see module docstring); fsdp_pspec only picks
    divisible dims, so no new failure mode.

    Axes absent from the mesh degrade to replicated: the tp rules name the
    ``model`` axis, which pipeline (``("data","pipe")``) and sequence
    (``("data","seq")``) meshes don't have — on those meshes the params
    replicate (their sharding lives in the shard_map schedules). On a mesh
    with an ``"expert"`` axis (``expert.create_ep_mesh``, ``train.py --ep``)
    the MoE expert stacks — and, by the same path-suffix matching, their
    Adam moments — shard their leading n_experts dim over it, so each
    device stores and updates only its own experts."""

    expert_axis = None
    if "expert" in mesh.shape:
        from .expert import EXPERT_AXIS, moe_pspec

        expert_axis = EXPERT_AXIS

    def check(path, leaf, spec):
        if expert_axis is not None:
            moe = moe_pspec(_path_str(path))
            if moe is not None and len(moe) <= len(getattr(leaf, "shape", ())):
                spec = moe
        if any(axis is not None and axis not in mesh.shape for axis in spec):
            spec = P(
                *(a if (a is None or a in mesh.shape) else None for a in spec)
            )
        for dim, axis in zip(getattr(leaf, "shape", ()), spec):
            if axis is None:
                continue
            size = mesh.shape[axis]
            if dim % size:
                raise ValueError(
                    f"mesh axis {axis!r} (size {size}) does not divide dim "
                    f"{dim} of param {_path_str(path)!r} "
                    f"(shape {tuple(leaf.shape)}); pick a tp degree that "
                    f"divides every tower's head count (ViT-B/32: tp in "
                    "{2, 4})"
                )
        return NamedSharding(mesh, spec)

    specs = tree_pspecs(
        tree, fsdp_n_data=mesh.shape[DATA_AXIS] if fsdp else None
    )
    return jax.tree_util.tree_map_with_path(check, tree, specs)


def batch_pspec(mesh: Optional[Mesh] = None):
    """Leading-axis spec for batches: over ``data``, or over
    ``(replica, data)`` together on a multi-slice mesh (each slice's data
    shards hold a disjoint block of the global batch)."""
    if mesh is not None and REPLICA_AXIS in mesh.shape:
        return P((REPLICA_AXIS, DATA_AXIS))
    return P(DATA_AXIS)


def batch_shardings(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, batch_pspec(mesh)), tree
    )


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Put a host batch on the mesh with the leading axis over the data
    axis. The leading axis must divide by the data-axis size — training
    uses drop_last so sizes always divide; eval callers pad first (e.g.
    scripts/get_clip_vit_embeddings.py).

    Multi-host (``jax.process_count() > 1``): the loaders feed each process
    its own disjoint slice of the global batch (``data/loader.py``
    per-host sharding), so the local array is one PROCESS-SHARD of the
    global array — ``jax.make_array_from_process_local_data`` assembles
    the global jax.Array from the per-host pieces. A plain ``device_put``
    against the global sharding would treat the local slice as the whole
    batch (wrong global shape / silent replication)."""
    sharding = NamedSharding(mesh, batch_pspec(mesh))
    multihost = jax.process_count() > 1

    def put(x):
        if not (hasattr(x, "shape") and getattr(x, "ndim", 0) >= 1):
            return x
        if multihost:
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            )
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)
