"""Model factory: construct a model module + initialized variables with the
reference's initialization semantics.

* CLIP weights come from an openai-format ``.pt``/``.pth`` state dict (path
  via ``clip_weights`` arg or the ``VTC_CLIP_WEIGHTS`` env var). Without a
  weights file the towers stay randomly initialized (no network egress here;
  the reference downloads weights inside ``clip.load``, ``model/model.py:317``).
* TimeSformer models get CLIP->TimeSformer weight surgery
  (``timesformer_clip_alt.py:289-330``).
* CAM zero-init: with ``init_from_avg`` the adapter transformer starts as an
  exact average and ``final_linear`` starts at zero (``model/model.py:440-452``).
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import retrieval
from .cam import zero_init_cam_params
from .clip_model import CLIP_VARIANTS
from .r2plus1d import R2Plus1D_34_IG65M_32frames
from .timesformer import timesformer_params_from_clip_visual
from .torch_import import import_openai_clip, load_torch_file

ARCHS = {
    "MLP": retrieval.MLP,
    "JointEmbedding": retrieval.JointEmbedding,
    "CLIP": retrieval.CLIP,
    "PretrainedCLIP": retrieval.PretrainedCLIP,
    "PretrainedCLIP_finaltf": retrieval.PretrainedCLIP_finaltf,
    "PretrainedCLIP_TimeSformer": retrieval.PretrainedCLIP_TimeSformer,
    "PretrainedCLIP_TimeSformer_finaltf": retrieval.PretrainedCLIP_TimeSformer_finaltf,
    "R2Plus1D_34_IG65M_32frames": R2Plus1D_34_IG65M_32frames,
}

_CAM_ARCHS = {"PretrainedCLIP_finaltf", "PretrainedCLIP_TimeSformer_finaltf"}
_TSF_ARCHS = {"PretrainedCLIP_TimeSformer", "PretrainedCLIP_TimeSformer_finaltf"}


def _dummy_inputs(arch: str, module) -> tuple:
    if arch == "R2Plus1D_34_IG65M_32frames":
        # [b, c, t, h, w]; BN/conv shapes are independent of t/h/w, so a
        # small clip keeps init cheap (serving uses 32-frame 112x112 clips)
        return (jnp.zeros((1, 3, 4, 32, 32), jnp.float32),)
    v = CLIP_VARIANTS[getattr(module, "model_type", "ViT-B/32")]
    res = v.input_resolution
    title = jnp.zeros((1, v.context_length), jnp.int32)
    comments = jnp.zeros((1, 2, v.context_length), jnp.int32)
    if arch == "MLP":
        return (jnp.zeros((1, module.num_features), jnp.float32),)
    if arch in ("JointEmbedding", "CLIP"):
        return (
            jnp.zeros((1, module.input_dims_a), jnp.float32),
            jnp.zeros((1, module.input_dims_b), jnp.float32),
        )
    if arch in _TSF_ARCHS:
        vis = jnp.zeros((1, module.nframes, 3, res, res), jnp.float32)
    else:
        vis = jnp.zeros((1, 3, res, res), jnp.float32)
    if arch == "PretrainedCLIP":
        return (vis, title)
    if arch == "PretrainedCLIP_finaltf" and getattr(module, "init_audio_model", False):
        return (vis, title, comments, jnp.zeros((1, 5, 512), jnp.float32))
    return (vis, title, comments)


def find_clip_weights(path: Optional[str] = None) -> Optional[str]:
    for p in [path, os.environ.get("VTC_CLIP_WEIGHTS"),
              "/root/data/ViT-B-32.pt"]:
        if p and os.path.exists(p):
            return p
    return None


def load_openai_state_dict(path: str):
    """openai CLIP distributions are TorchScript archives; fall back to a
    plain state_dict load."""
    import torch

    try:
        model = torch.jit.load(path, map_location="cpu")
        return model.state_dict()
    except Exception:
        obj = load_torch_file(path)
        sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
        # reference retrieval checkpoints wrap the CLIP tower under
        # "model." (model/model.py:432-437); unwrap so the openai importer
        # sees bare keys
        if isinstance(sd, dict) and not any(
            k.startswith("visual.") for k in sd
        ):
            prefixed = {
                k[len("model."):]: v
                for k, v in sd.items()
                if k.startswith("model.")
            }
            if any(k.startswith("visual.") for k in prefixed):
                sd = prefixed
        return sd


def create_model(
    arch: str,
    seed: int = 0,
    clip_weights: Optional[str] = None,
    dtype=jnp.float32,
    **kwargs,
) -> Tuple[object, dict]:
    """Build (module, variables) for an architecture name from the registry."""
    if arch not in ARCHS:
        raise KeyError(f"Unknown arch {arch!r}; available: {sorted(ARCHS)}")
    # accepted-for-compat torch-specific args
    kwargs.pop("audio_model_ckpt", None)
    clip_audio_ckpt = kwargs.pop("clip_audio_ckpt", None)
    if isinstance(dtype, str):
        dtype = {
            "float32": jnp.float32,
            "fp32": jnp.float32,
            "bfloat16": jnp.bfloat16,
            "bf16": jnp.bfloat16,
            "float16": jnp.float16,
            "fp16": jnp.float16,
        }[dtype]
    module = ARCHS[arch](dtype=dtype, **kwargs)

    rngs = {
        "params": jax.random.PRNGKey(seed),
        "adapter_skip": jax.random.PRNGKey(seed + 1),
        "comment_mask": jax.random.PRNGKey(seed + 2),
        "dropout": jax.random.PRNGKey(seed + 3),
    }
    # jit the whole init: one compiled program instead of eager op-by-op,
    # and keep the tree on device (per-leaf host pulls are expensive on
    # remote TPU backends)
    variables = jax.jit(module.init)(rngs, *_dummy_inputs(arch, module))
    variables = dict(variables)
    params = dict(variables["params"])

    # clip_audio_ckpt supplies the CLIP tower only when the audio branch is
    # actually initialized — the reference's load sits inside
    # ``if self.init_audio_model:`` (model/model.py:409-435); with
    # init_audio_model=False it uses the stock CLIP weights
    use_audio_ckpt = clip_audio_ckpt and getattr(
        module, "init_audio_model", True
    )
    weights_path = find_clip_weights(
        clip_audio_ckpt if use_audio_ckpt else clip_weights
    )
    if weights_path is not None and "clip" in params:
        from ..data.tokenizer import get_tokenizer

        if not get_tokenizer().is_exact:
            logging.getLogger(__name__).warning(
                "Real CLIP weights (%s) combined with the FALLBACK byte-level "
                "BPE vocabulary — token ids will not match the checkpoint's "
                "training vocabulary and text embeddings will be wrong. "
                "Provision the merges file via VTC_BPE_VOCAB.",
                weights_path,
            )
        if os.path.isdir(weights_path):
            # HuggingFace CLIPModel directory (e.g. VTC_CLIP_WEIGHTS pointing
            # at an openai/clip-vit-* snapshot) — torch.load on a directory
            # raises, so route through the HF importer
            from .torch_import import import_hf_clip

            try:
                from transformers import CLIPModel
            except ImportError as e:
                raise RuntimeError(
                    f"{weights_path} is a directory (HuggingFace CLIP "
                    f"format) but transformers is unavailable: {e}"
                )
            imported = import_hf_clip(
                CLIPModel.from_pretrained(weights_path).state_dict()
            )
        else:
            sd = load_openai_state_dict(weights_path)
            imported = import_openai_clip(sd)
        if arch in _TSF_ARCHS:
            v = CLIP_VARIANTS[getattr(module, "model_type", "ViT-B/32")]
            imported["visual"] = timesformer_params_from_clip_visual(
                imported["visual"], v, nframes=getattr(module, "nframes", 8),
                seed=seed,
            )
        params["clip"] = imported

    if arch in _CAM_ARCHS:
        params["cam"] = zero_init_cam_params(
            dict(params["cam"]),
            int(getattr(module, "n_layers", 2)),
            bool(getattr(module, "init_from_avg", True)),
        )

    variables = dict(variables)
    variables["params"] = params
    return module, variables


def convert_weights(params, dtype=jnp.bfloat16):
    """Low-precision parameter cast — the TPU analogue of the reference's
    fp16 converter (``model/model.py:509-536``): matmul/conv/projection
    weights cast to ``dtype`` (bf16 by default, the MXU-native type),
    LayerNorm/BatchNorm scales+biases and embeddings kept fp32 for numerics.
    """

    def _cast(path, x):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if x.dtype not in (jnp.float32, np.float32):
            return x
        keep_fp32 = (
            "/ln" in name
            or name.endswith("scale")
            or name.endswith("bias")
            or "bn" in name.split("/")[-1]
            or "logit_scale" in name
            or "embedding" in name
            or "temporal_embed" in name
        )
        return x if keep_fp32 else jnp.asarray(x, dtype)

    return jax.tree_util.tree_map_with_path(_cast, params)
