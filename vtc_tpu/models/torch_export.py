"""Flax param pytrees -> PyTorch ``state_dict`` in the reference's format.

The exact inverse of :mod:`vtc_tpu.models.torch_import`'s VTC path
(``import_vtc_state_dict``): a model trained here can be handed back to a
user of the reference codebase as a ``.pth`` they can ``--resume`` /
``load_state_dict`` (``trainer/base_trainer.py:123-140`` saves, ``:165-176``
loads). Completes the migration story in both directions (docs/MIGRATION.md):
reference -> vtc_tpu via ``torch_import``, vtc_tpu -> reference via this.

Inverse conventions (see torch_import's module docstring for the forward):
flax Dense ``kernel`` -> torch ``weight = kernel.T``; LN ``scale/bias`` ->
``weight/bias``; the ``(width, 3*p*p)`` patchify matmul operand re-folds to
the OIHW conv weight; ``[3, E, ...]`` qkv storage re-flattens to torch's
fused ``[3E, ...]`` rows (``qkv_to_torch`` — a pure reshape).

Completeness is asserted: every param leaf must be consumed by the export
(a MoE adapter or any other beyond-reference structure has no torch-side
representation — the export raises instead of silently dropping weights).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from .torch_import import qkv_to_torch


def _np32(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


class _TreeReader:
    """Leaf access that records every path read, so the export can prove it
    consumed the whole tree (no silently dropped weights)."""

    def __init__(self, tree: Dict):
        self.tree = tree
        self.seen = set()

    def get(self, path: str):
        node = self.tree
        for k in path.split("/"):
            node = node[k]
        self.seen.add(path)
        return node

    def has(self, path: str) -> bool:
        node = self.tree
        for k in path.split("/"):
            if not isinstance(node, dict) or k not in node:
                return False
            node = node[k]
        return True

    def unconsumed(self) -> list:
        out = []

        def walk(node, prefix):
            if isinstance(node, dict):
                for k, v in node.items():
                    walk(v, f"{prefix}{k}/")
            elif prefix[:-1] not in self.seen:
                out.append(prefix[:-1])

        walk(self.tree, "")
        return out


def _export_block(r: _TreeReader, in_prefix: str, sd: Dict, out_prefix: str):
    """One ResidualAttentionBlock: flax tree -> openai naming (inverse of
    ``torch_import._import_block``)."""
    sd[f"{out_prefix}.attn.in_proj_weight"] = qkv_to_torch(
        _np32(r.get(f"{in_prefix}/attn/in_proj_weight"))
    )
    sd[f"{out_prefix}.attn.in_proj_bias"] = qkv_to_torch(
        _np32(r.get(f"{in_prefix}/attn/in_proj_bias"))
    )
    sd[f"{out_prefix}.attn.out_proj.weight"] = _np32(
        r.get(f"{in_prefix}/attn/out_proj/kernel")
    ).T
    sd[f"{out_prefix}.attn.out_proj.bias"] = _np32(
        r.get(f"{in_prefix}/attn/out_proj/bias")
    )
    for ln in ("ln_1", "ln_2"):
        sd[f"{out_prefix}.{ln}.weight"] = _np32(r.get(f"{in_prefix}/{ln}/scale"))
        sd[f"{out_prefix}.{ln}.bias"] = _np32(r.get(f"{in_prefix}/{ln}/bias"))
    for fc in ("c_fc", "c_proj"):
        sd[f"{out_prefix}.mlp.{fc}.weight"] = _np32(
            r.get(f"{in_prefix}/mlp/{fc}/kernel")
        ).T
        sd[f"{out_prefix}.mlp.{fc}.bias"] = _np32(
            r.get(f"{in_prefix}/mlp/{fc}/bias")
        )
    if r.has(f"{in_prefix}/timeattn"):
        sd[f"{out_prefix}.timeattn.in_proj_weight"] = qkv_to_torch(
            _np32(r.get(f"{in_prefix}/timeattn/in_proj_weight"))
        )
        sd[f"{out_prefix}.timeattn.in_proj_bias"] = qkv_to_torch(
            _np32(r.get(f"{in_prefix}/timeattn/in_proj_bias"))
        )
        sd[f"{out_prefix}.timeattn.out_proj.weight"] = _np32(
            r.get(f"{in_prefix}/timeattn/out_proj/kernel")
        ).T
        sd[f"{out_prefix}.timeattn.out_proj.bias"] = _np32(
            r.get(f"{in_prefix}/timeattn/out_proj/bias")
        )
        sd[f"{out_prefix}.ln_time.weight"] = _np32(r.get(f"{in_prefix}/ln_time/scale"))
        sd[f"{out_prefix}.ln_time.bias"] = _np32(r.get(f"{in_prefix}/ln_time/bias"))
        sd[f"{out_prefix}.temporal_fc.weight"] = _np32(
            r.get(f"{in_prefix}/temporal_fc/kernel")
        ).T
        sd[f"{out_prefix}.temporal_fc.bias"] = _np32(
            r.get(f"{in_prefix}/temporal_fc/bias")
        )


def _export_visual(r: _TreeReader, sd: Dict, flat_blocks: bool):
    """``clip/visual`` subtree -> ``visual.*`` keys. ``flat_blocks`` is the
    TimeSformer module layout (``transformer_resblocks_i`` hoisted flat,
    ``torch_import._flatten_tsf_visual``)."""
    conv = _np32(r.get("visual/conv1"))
    p = int(round((conv.shape[1] / 3) ** 0.5))
    assert 3 * p * p == conv.shape[1], conv.shape
    sd["model.visual.conv1.weight"] = conv.reshape(conv.shape[0], 3, p, p)
    sd["model.visual.class_embedding"] = _np32(r.get("visual/class_embedding"))
    sd["model.visual.positional_embedding"] = _np32(
        r.get("visual/positional_embedding")
    )
    for ln in ("ln_pre", "ln_post"):
        sd[f"model.visual.{ln}.weight"] = _np32(r.get(f"visual/{ln}/scale"))
        sd[f"model.visual.{ln}.bias"] = _np32(r.get(f"visual/{ln}/bias"))
    sd["model.visual.proj"] = _np32(r.get("visual/proj"))
    if r.has("visual/temporal_embed"):
        sd["model.visual.temporal_embed"] = _np32(r.get("visual/temporal_embed"))
    i = 0
    while True:
        blk = (
            f"visual/transformer_resblocks_{i}"
            if flat_blocks
            else f"visual/transformer/resblocks_{i}"
        )
        if not r.has(blk):
            break
        _export_block(r, blk, sd, f"model.visual.transformer.resblocks.{i}")
        i += 1
    if i == 0:
        raise ValueError("no visual transformer blocks found to export")


def _export_text(r: _TreeReader, sd: Dict):
    sd["model.token_embedding.weight"] = _np32(r.get("text/token_embedding"))
    sd["model.positional_embedding"] = _np32(r.get("text/positional_embedding"))
    sd["model.ln_final.weight"] = _np32(r.get("text/ln_final/scale"))
    sd["model.ln_final.bias"] = _np32(r.get("text/ln_final/bias"))
    sd["model.text_projection"] = _np32(r.get("text/text_projection"))
    i = 0
    while r.has(f"text/transformer/resblocks_{i}"):
        _export_block(
            r, f"text/transformer/resblocks_{i}", sd,
            f"model.transformer.resblocks.{i}",
        )
        i += 1


def export_vtc_state_dict(
    params: Dict, batch_stats: Optional[Dict] = None
) -> Dict[str, np.ndarray]:
    """vtc_tpu retrieval-model params -> the reference's ``state_dict``
    naming (numpy values; see :func:`save_torch_checkpoint` for a ``.pth``).

    Exact inverse of ``torch_import.import_vtc_state_dict``: CLIP towers
    under ``model.*``, CAM under ``final_transformer.*`` / ``final_linear`` /
    ``mask_embedding``, BN running stats under ``mean_center_bn.*``, the
    audio head under ``audio_model.mlp.layers.*``. Raises if any param leaf
    has no torch-side representation (e.g. a MoE adapter)."""
    import jax

    params = dict(jax.device_get(params))  # ONE bulk transfer if device-resident

    sd: Dict[str, np.ndarray] = {}
    clip = params.get("clip")
    if clip is None:
        raise ValueError("export_vtc_state_dict needs a 'clip' tower")
    rc = _TreeReader(clip)
    flat_blocks = any(k.startswith("transformer_resblocks_") for k in clip["visual"])
    _export_visual(rc, sd, flat_blocks)
    _export_text(rc, sd)
    sd["model.logit_scale"] = _np32(rc.get("logit_scale"))
    leftovers = rc.unconsumed()

    if "cam" in params:
        cam = _TreeReader(params["cam"])
        i = 0
        while cam.has(f"final_transformer/resblocks_{i}"):
            try:
                _export_block(
                    cam, f"final_transformer/resblocks_{i}", sd,
                    f"final_transformer.resblocks.{i}",
                )
            except KeyError as e:
                # e.g. a MoE adapter block stores its FFN under mlp_moe
                raise ValueError(
                    f"CAM block {i} has no reference (torch) representation "
                    f"(missing {e}; MoE adapter?) — cannot export"
                ) from e
            i += 1
        sd["final_linear.weight"] = _np32(cam.get("final_linear")).T
        sd["mask_embedding"] = _np32(cam.get("mask_embedding"))
        leftovers += [f"cam/{p}" for p in cam.unconsumed()]
        bs = (batch_stats or {}).get("cam")
        if bs:
            sd["mean_center_bn.running_mean"] = _np32(bs["mean"])
            sd["mean_center_bn.running_var"] = _np32(bs["var"])
            # torch BatchNorm1d state_dicts carry this buffer; the reference
            # uses momentum updates so the value is inert — 0 loads cleanly
            sd["mean_center_bn.num_batches_tracked"] = np.asarray(0, np.int64)

    if "audio_mlp" in params:
        au = _TreeReader(params["audio_mlp"])
        sd["audio_model.mlp.layers.1.weight"] = _np32(au.get("fc1/kernel")).T
        sd["audio_model.mlp.layers.1.bias"] = _np32(au.get("fc1/bias"))
        sd["audio_model.mlp.layers.2.weight"] = _np32(au.get("bn/scale"))
        sd["audio_model.mlp.layers.2.bias"] = _np32(au.get("bn/bias"))
        sd["audio_model.mlp.layers.4.weight"] = _np32(au.get("fc2/kernel")).T
        sd["audio_model.mlp.layers.4.bias"] = _np32(au.get("fc2/bias"))
        leftovers += [f"audio_mlp/{p}" for p in au.unconsumed()]
        abs_ = (batch_stats or {}).get("audio_mlp", {}).get("bn")
        if abs_:
            sd["audio_model.mlp.layers.2.running_mean"] = _np32(abs_["mean"])
            sd["audio_model.mlp.layers.2.running_var"] = _np32(abs_["var"])
            sd["audio_model.mlp.layers.2.num_batches_tracked"] = np.asarray(
                0, np.int64
            )

    leftovers += [
        f"{k}/..." for k in params if k not in ("clip", "cam", "audio_mlp")
    ]
    if leftovers:
        raise ValueError(
            "params contain leaves with no reference (torch) representation "
            f"— refusing to export a checkpoint that would silently drop "
            f"weights: {sorted(leftovers)[:8]}"
            + ("..." if len(leftovers) > 8 else "")
        )
    return sd


def save_torch_checkpoint(
    path,
    params: Dict,
    batch_stats: Optional[Dict] = None,
    *,
    arch: str = "",
    epoch: int = 0,
    monitor_best: float = 0.0,
    config: Optional[dict] = None,
) -> None:
    """Write a ``.pth`` in the reference trainer's save layout
    (``trainer/base_trainer.py:123-140``: ``arch``/``epoch``/``state_dict``/
    ``monitor_best``/``config``) so the reference's ``--resume`` and eval
    scripts accept it directly."""
    import torch

    sd = export_vtc_state_dict(params, batch_stats)
    payload = {
        "arch": arch,
        "epoch": int(epoch),
        # copy=True: exported views can be read-only (torch wants writable)
        "state_dict": {
            k: torch.from_numpy(np.array(v, copy=True)) for k, v in sd.items()
        },
        "monitor_best": float(monitor_best),
        "config": dict(config) if config is not None else {},
    }
    torch.save(payload, path)
