"""Checkpoint save / resume with the reference's semantics, on Orbax.

Mirrors ``trainer/base_trainer.py:116-219``:

* ``checkpoint-epoch{N}`` every ``save_period`` epochs + ``model_best`` when
  the monitored metric improves; payload = arch name, epoch, model params (+
  batch stats), optimizer state, monitor_best, config.
* Resume restores epoch/monitor/optimizer/lr state with the same guards:
  optimizer state is dropped when the optimizer type or lr changed; an
  architecture mismatch warns.
* **Warm-start** across architectures (image CAM model -> TimeSformer video
  model) grafts every matching-shape leaf and asserts the reference's key
  patterns: params missing from the checkpoint must be time/temporal ones,
  params only in the checkpoint must be final/mask (CAM) ones
  (``base_trainer.py:165-176``).

Also loads reference PyTorch ``.pth`` checkpoints transparently (suffix
dispatch) via ``models.torch_import``.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

logger = logging.getLogger(__name__)


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = tree
    return out


def _unflatten(flat):
    tree = {}
    for path, v in flat.items():
        node = tree
        keys = path.split("/")
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = v
    return tree


# one process-wide async checkpointer: Orbax serializes saves per
# checkpointer, and a fresh one per save would leak its writer threads
_ASYNC_CKPTR: Optional[ocp.AsyncCheckpointer] = None


def _async_checkpointer() -> ocp.AsyncCheckpointer:
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ASYNC_CKPTR


def wait_for_checkpoints() -> None:
    """Block until every async save has committed (call before reading a
    just-written checkpoint and at the end of training)."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def save_checkpoint(
    ckpt_dir: Path,
    name: str,
    *,
    arch: str,
    epoch: int,
    params,
    opt_state,
    batch_stats=None,
    monitor_best=None,
    config=None,
    async_save: bool = False,
    gather_to_host: Optional[bool] = None,
) -> Path:
    """``async_save=True`` (config ``trainer.async_checkpoint``) returns as
    soon as the device→host copy is done and commits the directory in a
    background thread, overlapping the (low-priority) disk write with the
    next epoch's steps. Saves are serialized per process; the sidecar is
    written immediately (host-only data).

    ``gather_to_host`` controls whether the tree is pulled to host in one
    bulk transfer before the save (the fast path on a tunneled dev chip).
    Default: gather when every leaf is process-addressable, hand the global
    ``jax.Array``s straight to Orbax otherwise — i.e. a multi-host fsdp/
    ZeRO-3 run saves DISTRIBUTED: each host serializes only its own shards
    and Orbax coordinates the collective commit (every process must call
    this function; the checkpoint dir must be on a filesystem all hosts
    see)."""
    import json

    path = Path(ckpt_dir) / name
    payload = {
        "epoch": epoch,
        "params": params,
        "monitor_best": np.asarray(
            monitor_best if monitor_best is not None else 0.0, dtype=np.float64
        ),
    }
    if batch_stats:
        payload["batch_stats"] = batch_stats
    if opt_state is not None:
        payload["opt_state"] = opt_state
    if gather_to_host is None:
        gather_to_host = all(
            getattr(leaf, "is_fully_addressable", True)
            for leaf in jax.tree_util.tree_leaves(payload)
        )
    if gather_to_host:
        # ONE host transfer for the whole tree — per-leaf np.asarray pays a
        # device round-trip per parameter (CLAUDE.md "per-leaf host
        # transfers")
        payload = jax.device_get(payload)

    if async_save:
        ckptr = _async_checkpointer()
        ckptr.wait_until_finished()  # serialize with any pending save
        ckptr.save(path.absolute(), payload, force=True)
    else:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path.absolute(), payload, force=True)
        ckptr.wait_until_finished()

    # strings (arch name, config) go in a sidecar the orbax dir doesn't own.
    # Rank-0-only: unlike the orbax save above (collective — every process
    # must call it; orbax's primary writes and the rest barrier), this is a
    # plain file write that would race on a shared filesystem.
    if jax.process_index() == 0:
        meta = {"arch": arch}
        if config is not None:
            meta["config"] = dict(config)
        (Path(ckpt_dir) / f"{name}.meta.json").write_text(
            json.dumps(meta, default=str)
        )
    return path


def load_checkpoint(path) -> dict:
    """Load either a vtc_tpu Orbax checkpoint or a reference torch .pth."""
    path = Path(path)
    if path.suffix in (".pth", ".pt", ".tar"):
        from ..models.torch_import import import_vtc_state_dict, load_torch_file

        obj = load_torch_file(path)
        sd = obj.get("state_dict", obj)
        timesformer = any("timeattn" in k for k in sd)
        imported = import_vtc_state_dict(sd, timesformer=timesformer)
        out = {
            "arch": obj.get("arch"),
            "epoch": obj.get("epoch", 0),
            "params": imported["params"],
            "monitor_best": obj.get("monitor_best", 0.0),
            "torch_config": obj.get("config"),
        }
        if "batch_stats" in imported:
            out["batch_stats"] = imported["batch_stats"]
        return out
    import json

    wait_for_checkpoints()  # the path may still be committing asynchronously
    ckptr = ocp.StandardCheckpointer()
    restored = dict(ckptr.restore(path.absolute()))
    meta_file = path.parent / f"{path.name}.meta.json"
    if meta_file.exists():
        meta = json.loads(meta_file.read_text())
        restored["arch"] = meta.get("arch")
        restored["config"] = meta.get("config")
    return restored


def graft_params(init_params, loaded_params, strict: bool = False):
    """Copy every matching-shape leaf of ``loaded_params`` into
    ``init_params``; return (params, missing_keys, unexpected_keys).

    The reference's warm-start contract (``base_trainer.py:165-176``):
    ``missing`` = params the model has but the checkpoint lacks (must be
    time/temporal), ``unexpected`` = checkpoint params the model lacks (must
    be final/mask).

    ``init_params`` leaves are NOT pulled to host: only their shapes are
    consulted, and leaves missing from the checkpoint are returned as-is.
    That skips a full device->host round-trip on every resume, and it is
    what lets a multi-host fsdp run resume at all — its live params are
    global ``jax.Array``s whose shards live on other hosts, so an
    ``np.asarray`` would throw (non-addressable).
    """
    flat_init = _flatten(init_params)
    flat_load = _flatten(jax.tree_util.tree_map(np.asarray, loaded_params))

    missing = sorted(set(flat_init) - set(flat_load))
    unexpected = sorted(set(flat_load) - set(flat_init))
    if strict and (missing or unexpected):
        raise ValueError(f"missing={missing} unexpected={unexpected}")

    merged = dict(flat_init)
    for k in set(flat_init) & set(flat_load):
        leaf = flat_load[k]
        if flat_init[k].shape != leaf.shape:
            # qkv storage migration: checkpoints written before the
            # [3, E, E] layout hold the torch-order flat fused qkv
            # ([3E, E] weight / [3E] bias); the new storage keeps the same
            # row order with an explicit (q,k,v) axis, so a reshape is
            # exact (models/layers.py:173).
            name = k.rsplit("/", 1)[-1]
            want = flat_init[k].shape
            legacy = (
                # weight: [3E, E] -> [3, E, E]; bias: [3E] -> [3, E].
                # EXACTLY these shapes — any other same-size layout (e.g. a
                # transposed [E, 3E] export) must still fail loudly rather
                # than be scrambled by reinterpretation.
                (name == "in_proj_weight"
                 and len(want) == 3 and want[0] == 3 and want[1] == want[2]
                 and leaf.shape == (3 * want[1], want[2]))
                or (name == "in_proj_bias"
                    and len(want) == 2 and want[0] == 3
                    and leaf.shape == (3 * want[1],))
            )
            if legacy:
                leaf = leaf.reshape(want)
            else:
                raise ValueError(
                    f"shape mismatch for {k}: {flat_init[k].shape} vs "
                    f"{leaf.shape}"
                )
        merged[k] = leaf
    return _unflatten(merged), missing, unexpected


def assert_warm_start_keys(missing, unexpected):
    """``base_trainer.py:175-176``."""
    assert all(
        "time" in m or "temporal" in m for m in missing
    ), f"unexpected missing keys: {[m for m in missing if 'time' not in m and 'temporal' not in m][:5]}"
    assert all(
        "final" in u or "mask" in u or "cam" in u for u in unexpected
    ), f"unexpected extra keys: {[u for u in unexpected if 'final' not in u and 'mask' not in u and 'cam' not in u][:5]}"
