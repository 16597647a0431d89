"""PyTorch checkpoint importers: torch ``state_dict`` -> flax param pytrees.

Three formats are understood:

* **openai CLIP** (the format ``clip.load`` produces and the reference's
  models embed under ``model.*``): ``visual.transformer.resblocks.N.attn.
  in_proj_weight`` etc.
* **HuggingFace CLIPModel** (``vision_model.encoder.layers.N.self_attn.q_proj
  .weight`` etc.) — used for parity testing and as an alternative weight
  source.
* **VTC reference checkpoints** (``.pth`` dicts with ``state_dict`` holding a
  full retrieval model: ``model.*`` CLIP keys + ``final_transformer.*`` /
  ``final_linear.*`` / ``mask_embedding`` CAM keys + TimeSformer
  ``timeattn``/``temporal`` keys), enabling fp32-parity evaluation of
  reference-trained models on TPU.

Conventions: flax Dense kernels are torch ``weight.T``; LayerNorm
``weight/bias`` -> ``scale/bias``; the patch conv OIHW weight flattens to the
``(width, 3*p*p)`` matmul operand used by ``clip_model.patchify``; fused qkv
tensors gain an explicit leading (q,k,v) axis (``qkv_from_torch`` — a pure
reshape) so tensor-parallel row splits land on head boundaries
(``parallel/mesh.py``, ``models/layers.py``).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def qkv_from_torch(w):
    """torch fused-qkv [3E, E] weight / [3E] bias -> the framework's
    [3, E, E] / [3, E] storage (pure reshape)."""
    w = np.asarray(w)
    e = w.shape[0] // 3
    return w.reshape((3, e) + w.shape[1:])


def qkv_to_torch(w):
    """Inverse of :func:`qkv_from_torch` ([3, E, ...] -> torch [3E, ...])."""
    w = np.asarray(w)
    return w.reshape((w.shape[0] * w.shape[1],) + w.shape[2:])


def _np(t):
    if hasattr(t, "detach"):
        return np.asarray(t.detach().cpu().numpy(), dtype=np.float32)
    return np.asarray(t, dtype=np.float32)


def _set(tree: Dict, path: str, value) -> None:
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def _import_block(sd, prefix: str, out, out_prefix: str, has_time: bool = False):
    """One ResidualAttentionBlock: openai naming -> flax tree."""
    _set(out, f"{out_prefix}/attn/in_proj_weight",
         qkv_from_torch(_np(sd[f"{prefix}.attn.in_proj_weight"])))
    _set(out, f"{out_prefix}/attn/in_proj_bias",
         qkv_from_torch(_np(sd[f"{prefix}.attn.in_proj_bias"])))
    _set(out, f"{out_prefix}/attn/out_proj/kernel", _np(sd[f"{prefix}.attn.out_proj.weight"]).T)
    _set(out, f"{out_prefix}/attn/out_proj/bias", _np(sd[f"{prefix}.attn.out_proj.bias"]))
    for ln in ("ln_1", "ln_2"):
        _set(out, f"{out_prefix}/{ln}/scale", _np(sd[f"{prefix}.{ln}.weight"]))
        _set(out, f"{out_prefix}/{ln}/bias", _np(sd[f"{prefix}.{ln}.bias"]))
    for fc in ("c_fc", "c_proj"):
        _set(out, f"{out_prefix}/mlp/{fc}/kernel", _np(sd[f"{prefix}.mlp.{fc}.weight"]).T)
        _set(out, f"{out_prefix}/mlp/{fc}/bias", _np(sd[f"{prefix}.mlp.{fc}.bias"]))
    if has_time:
        _set(out, f"{out_prefix}/timeattn/in_proj_weight",
             qkv_from_torch(_np(sd[f"{prefix}.timeattn.in_proj_weight"])))
        _set(out, f"{out_prefix}/timeattn/in_proj_bias",
             qkv_from_torch(_np(sd[f"{prefix}.timeattn.in_proj_bias"])))
        _set(out, f"{out_prefix}/timeattn/out_proj/kernel", _np(sd[f"{prefix}.timeattn.out_proj.weight"]).T)
        _set(out, f"{out_prefix}/timeattn/out_proj/bias", _np(sd[f"{prefix}.timeattn.out_proj.bias"]))
        _set(out, f"{out_prefix}/ln_time/scale", _np(sd[f"{prefix}.ln_time.weight"]))
        _set(out, f"{out_prefix}/ln_time/bias", _np(sd[f"{prefix}.ln_time.bias"]))
        _set(out, f"{out_prefix}/temporal_fc/kernel", _np(sd[f"{prefix}.temporal_fc.weight"]).T)
        _set(out, f"{out_prefix}/temporal_fc/bias", _np(sd[f"{prefix}.temporal_fc.bias"]))


def _num_blocks(sd, prefix: str) -> int:
    n = 0
    while f"{prefix}.{n}.ln_1.weight" in sd:
        n += 1
    return n


def import_openai_visual(sd, out=None, out_prefix="visual", timesformer=False):
    """``visual.*`` keys of an openai CLIP state_dict -> VisionTransformer /
    TimeSformer params. With ``timesformer=True``, temporal keys are imported
    when present; CLIP-only checkpoints leave them to the caller (weight
    surgery, ``timesformer_clip_alt.py:322-330``)."""
    out = out if out is not None else {}
    _set(out, f"{out_prefix}/conv1", _np(sd["visual.conv1.weight"]).reshape(
        sd["visual.conv1.weight"].shape[0], -1))
    _set(out, f"{out_prefix}/class_embedding", _np(sd["visual.class_embedding"]))
    _set(out, f"{out_prefix}/positional_embedding", _np(sd["visual.positional_embedding"]))
    for ln in ("ln_pre", "ln_post"):
        _set(out, f"{out_prefix}/{ln}/scale", _np(sd[f"visual.{ln}.weight"]))
        _set(out, f"{out_prefix}/{ln}/bias", _np(sd[f"visual.{ln}.bias"]))
    _set(out, f"{out_prefix}/proj", _np(sd["visual.proj"]))
    n = _num_blocks(sd, "visual.transformer.resblocks")
    for i in range(n):
        has_time = timesformer and f"visual.transformer.resblocks.{i}.timeattn.in_proj_weight" in sd
        _import_block(
            sd,
            f"visual.transformer.resblocks.{i}",
            out,
            f"{out_prefix}/transformer/resblocks_{i}",
            has_time=has_time,
        )
    if timesformer and "visual.temporal_embed" in sd:
        _set(out, f"{out_prefix}/temporal_embed", _np(sd["visual.temporal_embed"]))
    return out


def import_openai_text(sd, out=None, out_prefix="text"):
    out = out if out is not None else {}
    _set(out, f"{out_prefix}/token_embedding", _np(sd["token_embedding.weight"]))
    _set(out, f"{out_prefix}/positional_embedding", _np(sd["positional_embedding"]))
    _set(out, f"{out_prefix}/ln_final/scale", _np(sd["ln_final.weight"]))
    _set(out, f"{out_prefix}/ln_final/bias", _np(sd["ln_final.bias"]))
    _set(out, f"{out_prefix}/text_projection", _np(sd["text_projection"]))
    n = _num_blocks(sd, "transformer.resblocks")
    for i in range(n):
        _import_block(
            sd, f"transformer.resblocks.{i}", out,
            f"{out_prefix}/transformer/resblocks_{i}",
        )
    return out


def import_openai_clip(sd) -> Dict:
    """Full openai CLIP state_dict -> ``ClipModel`` params."""
    out: Dict = {}
    import_openai_visual(sd, out)
    import_openai_text(sd, out)
    out["logit_scale"] = _np(sd["logit_scale"])
    return out


# --------------------------------------------------------------------------
# HuggingFace CLIPModel
# --------------------------------------------------------------------------


def _hf_block(sd, prefix: str, out, out_prefix: str):
    q = _np(sd[f"{prefix}.self_attn.q_proj.weight"])
    k = _np(sd[f"{prefix}.self_attn.k_proj.weight"])
    v = _np(sd[f"{prefix}.self_attn.v_proj.weight"])
    qb = _np(sd[f"{prefix}.self_attn.q_proj.bias"])
    kb = _np(sd[f"{prefix}.self_attn.k_proj.bias"])
    vb = _np(sd[f"{prefix}.self_attn.v_proj.bias"])
    _set(out, f"{out_prefix}/attn/in_proj_weight",
         qkv_from_torch(np.concatenate([q, k, v], 0)))
    _set(out, f"{out_prefix}/attn/in_proj_bias",
         qkv_from_torch(np.concatenate([qb, kb, vb], 0)))
    _set(out, f"{out_prefix}/attn/out_proj/kernel", _np(sd[f"{prefix}.self_attn.out_proj.weight"]).T)
    _set(out, f"{out_prefix}/attn/out_proj/bias", _np(sd[f"{prefix}.self_attn.out_proj.bias"]))
    _set(out, f"{out_prefix}/ln_1/scale", _np(sd[f"{prefix}.layer_norm1.weight"]))
    _set(out, f"{out_prefix}/ln_1/bias", _np(sd[f"{prefix}.layer_norm1.bias"]))
    _set(out, f"{out_prefix}/ln_2/scale", _np(sd[f"{prefix}.layer_norm2.weight"]))
    _set(out, f"{out_prefix}/ln_2/bias", _np(sd[f"{prefix}.layer_norm2.bias"]))
    _set(out, f"{out_prefix}/mlp/c_fc/kernel", _np(sd[f"{prefix}.mlp.fc1.weight"]).T)
    _set(out, f"{out_prefix}/mlp/c_fc/bias", _np(sd[f"{prefix}.mlp.fc1.bias"]))
    _set(out, f"{out_prefix}/mlp/c_proj/kernel", _np(sd[f"{prefix}.mlp.fc2.weight"]).T)
    _set(out, f"{out_prefix}/mlp/c_proj/bias", _np(sd[f"{prefix}.mlp.fc2.bias"]))


def import_hf_clip(sd) -> Dict:
    """HuggingFace ``CLIPModel.state_dict()`` -> ``ClipModel`` params."""
    out: Dict = {}
    w = _np(sd["vision_model.embeddings.patch_embedding.weight"])
    _set(out, "visual/conv1", w.reshape(w.shape[0], -1))
    _set(out, "visual/class_embedding", _np(sd["vision_model.embeddings.class_embedding"]))
    _set(out, "visual/positional_embedding", _np(sd["vision_model.embeddings.position_embedding.weight"]))
    # NB "pre_layrnorm" is HF's historical typo
    _set(out, "visual/ln_pre/scale", _np(sd["vision_model.pre_layrnorm.weight"]))
    _set(out, "visual/ln_pre/bias", _np(sd["vision_model.pre_layrnorm.bias"]))
    _set(out, "visual/ln_post/scale", _np(sd["vision_model.post_layernorm.weight"]))
    _set(out, "visual/ln_post/bias", _np(sd["vision_model.post_layernorm.bias"]))
    _set(out, "visual/proj", _np(sd["visual_projection.weight"]).T)
    n = _num_blocks_hf(sd, "vision_model.encoder.layers")
    for i in range(n):
        _hf_block(sd, f"vision_model.encoder.layers.{i}", out,
                  f"visual/transformer/resblocks_{i}")

    _set(out, "text/token_embedding", _np(sd["text_model.embeddings.token_embedding.weight"]))
    _set(out, "text/positional_embedding", _np(sd["text_model.embeddings.position_embedding.weight"]))
    _set(out, "text/ln_final/scale", _np(sd["text_model.final_layer_norm.weight"]))
    _set(out, "text/ln_final/bias", _np(sd["text_model.final_layer_norm.bias"]))
    _set(out, "text/text_projection", _np(sd["text_projection.weight"]).T)
    n = _num_blocks_hf(sd, "text_model.encoder.layers")
    for i in range(n):
        _hf_block(sd, f"text_model.encoder.layers.{i}", out,
                  f"text/transformer/resblocks_{i}")

    out["logit_scale"] = _np(sd["logit_scale"])
    return out


def _num_blocks_hf(sd, prefix: str) -> int:
    n = 0
    while f"{prefix}.{n}.layer_norm1.weight" in sd:
        n += 1
    return n


def load_torch_file(path):
    """Load a torch .pth/.pt file on CPU (weights only when possible)."""
    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=False)
    except TypeError:
        return torch.load(path, map_location="cpu")


# --------------------------------------------------------------------------
# VTC reference checkpoints (full retrieval models)
# --------------------------------------------------------------------------


def _flatten_tsf_visual(visual_tree: Dict) -> Dict:
    """Nested CLIP-visual tree -> the TimeSformer module's flat block naming
    (``transformer_resblocks_i``)."""
    out = {k: v for k, v in visual_tree.items() if k != "transformer"}
    for name, blk in visual_tree.get("transformer", {}).items():
        out[f"transformer_{name}"] = blk
    return out


def import_vtc_state_dict(sd, timesformer: bool = False) -> Dict:
    """Reference model ``state_dict`` (``trainer/base_trainer.py:133``) ->
    {"params": ..., "batch_stats": ...} for the matching vtc_tpu arch.

    Handles the ``model.*`` CLIP prefix, the CAM keys, the optional
    ``mean_center_bn`` running stats, and the optional audio MLP head.
    """
    sd = {k: v for k, v in sd.items()}
    # some reference checkpoints are saved from DataParallel ("module." prefix)
    if any(k.startswith("module.") for k in sd):
        sd = {k[len("module."):]: v for k, v in sd.items() if k.startswith("module.")}

    clip_sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}
    params: Dict = {"clip": {}}
    import_openai_visual(clip_sd, params["clip"], timesformer=timesformer)
    import_openai_text(clip_sd, params["clip"])
    params["clip"]["logit_scale"] = _np(clip_sd["logit_scale"])
    if timesformer:
        params["clip"]["visual"] = _flatten_tsf_visual(params["clip"]["visual"])

    batch_stats: Dict = {}
    if "final_linear.weight" in sd:
        cam: Dict = {}
        n = _num_blocks(sd, "final_transformer.resblocks")
        for i in range(n):
            _import_block(
                sd, f"final_transformer.resblocks.{i}", cam,
                f"final_transformer/resblocks_{i}",
            )
        cam["final_linear"] = _np(sd["final_linear.weight"]).T
        cam["mask_embedding"] = _np(sd["mask_embedding"])
        params["cam"] = cam
        if "mean_center_bn.running_mean" in sd:
            batch_stats["cam"] = {
                "mean": _np(sd["mean_center_bn.running_mean"]),
                "var": _np(sd["mean_center_bn.running_var"]),
            }

    if "audio_model.mlp.layers.1.weight" in sd:
        mlp = {
            "fc1": {
                "kernel": _np(sd["audio_model.mlp.layers.1.weight"]).T,
                "bias": _np(sd["audio_model.mlp.layers.1.bias"]),
            },
            "bn": {
                "scale": _np(sd["audio_model.mlp.layers.2.weight"]),
                "bias": _np(sd["audio_model.mlp.layers.2.bias"]),
            },
            "fc2": {
                "kernel": _np(sd["audio_model.mlp.layers.4.weight"]).T,
                "bias": _np(sd["audio_model.mlp.layers.4.bias"]),
            },
        }
        params["audio_mlp"] = mlp
        batch_stats["audio_mlp"] = {
            "bn": {
                "mean": _np(sd["audio_model.mlp.layers.2.running_mean"]),
                "var": _np(sd["audio_model.mlp.layers.2.running_var"]),
            }
        }

    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out
