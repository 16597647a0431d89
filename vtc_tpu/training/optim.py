"""Optimizer construction: the reference's 4-group / decay-split scheme as
optax transforms.

``train.py:94-192`` partitions trainable params by name into four groups —
CLIP final projections (``fc_lr``), time/temporal params (``time_lr``), CAM
params (``adapter_lr``), rest (base ``lr``) — each split into decay/no-decay
(bias, LayerNorm, embeddings). Frozen branches (``model/model.py:268-305``)
set ``requires_grad=False``; here they map to an ``optax.set_to_zero`` label.

torch.optim.Adam semantics are preserved: L2 weight decay is added to the
gradient *before* the Adam moments (not decoupled), and ``amsgrad`` maps to
``optax.scale_by_amsgrad``. StepLR is a per-group step-count schedule
(``gamma ** (epoch // step_size)``).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import optax

# ---------------------------------------------------------------------------
# Param-name classification (mirrors train.py:98-108)
# ---------------------------------------------------------------------------

# exact paths of CLIP's final projections in our tree
_CLIP_FINAL_LINEAR = ("clip/text/text_projection", "clip/visual/proj")
# substrings marking temporal parameters
_TIME_MATCHES = ("time", "temporal")
# CAM parameters live under the 'cam' module
_ADAPTER_PREFIX = "cam/"
# no-weight-decay matches (train.py:108): bias, layernorm, embeddings
_NODECAY_MATCHES = ("bias", "/ln", "embedding", "temporal_embed")


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def classify_param(path: str) -> str:
    """-> one of rest/adapter/fc/time (before decay split)."""
    if path in _CLIP_FINAL_LINEAR:
        return "fc"
    if any(t in path for t in _TIME_MATCHES):
        return "time"
    if path.startswith(_ADAPTER_PREFIX) or path.startswith("cam"):
        return "adapter"
    return "rest"


def is_nodecay(path: str) -> bool:
    # "/scale" catches LayerNorm/BatchNorm scales (torch names them
    # "<ln>.weight", matched by ".ln" in the reference) — but not logit_scale,
    # which the reference leaves in the decay set
    return any(t in path for t in _NODECAY_MATCHES) or path.endswith("/scale")


def frozen_predicate(branch_to_freeze) -> Callable[[str], bool]:
    """Which params are frozen (``model/model.py:268-305``). Note the
    reference's 'text' freezes only the text *transformer* (not embeddings,
    ln_final, or text_projection)."""
    if branch_to_freeze in (False, None, "none"):
        return lambda path: False

    spec = str(branch_to_freeze)

    def frozen(path: str) -> bool:
        if "all" in spec and path.startswith("clip/"):
            return True
        if "visual" in spec and path.startswith("clip/visual/"):
            return True
        if "text" in spec and path.startswith("clip/text/transformer/"):
            return True
        if "finaltf" in spec and (path.startswith("cam/") or path == "cam"):
            return True
        return False

    return frozen


def param_labels(params, branch_to_freeze=False):
    """Pytree of group labels: '<group>_<decay|nodecay>' or 'frozen'."""
    frozen = frozen_predicate(branch_to_freeze)

    def label(path, _):
        p = _path_str(path)
        if frozen(p):
            return "frozen"
        group = classify_param(p)
        return f"{group}_{'nodecay' if is_nodecay(p) else 'decay'}"

    return jax.tree_util.tree_map_with_path(label, params)


# ---------------------------------------------------------------------------
# Schedules
# ---------------------------------------------------------------------------


def make_lr_schedule(lr: float, scheduler_cfg: Optional[dict], steps_per_epoch: int):
    """Per-step lr schedule from the reference's per-epoch scheduler config."""
    if not scheduler_cfg:
        return lambda step: lr
    stype = scheduler_cfg.get("type", "StepLR")
    args = dict(scheduler_cfg.get("args", {}))
    if stype == "StepLR":
        step_size = int(args.get("step_size", 10))
        gamma = float(args.get("gamma", 0.1))

        def schedule(step):
            epoch = step // max(steps_per_epoch, 1)
            return lr * (gamma ** (epoch // step_size))

        return schedule
    if stype in ("ConstantLR", "off", None):
        return lambda step: lr
    if stype == "CosineAnnealingLR":
        t_max = int(args.get("T_max", 10)) * max(steps_per_epoch, 1)
        return optax.cosine_decay_schedule(lr, t_max)
    raise ValueError(f"Unknown lr_scheduler type {stype!r}")


# ---------------------------------------------------------------------------
# Optimizer
# ---------------------------------------------------------------------------


def _adam_like(lr_schedule, opt_args: dict):
    """torch.optim.Adam-equivalent chain: L2-into-grad decay, (ams)adam
    moments, schedule-scaled step."""
    wd = float(opt_args.get("weight_decay", 0.0) or 0.0)
    b1, b2 = opt_args.get("betas", (0.9, 0.999))
    eps = float(opt_args.get("eps", 1e-8))
    amsgrad = bool(opt_args.get("amsgrad", False))

    parts = []
    if wd:
        parts.append(optax.add_decayed_weights(wd))
    if amsgrad:
        parts.append(optax.scale_by_amsgrad(b1=b1, b2=b2, eps=eps))
    else:
        parts.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    parts.append(optax.scale_by_schedule(lambda s: -lr_schedule(s)))
    return optax.chain(*parts)


def build_optimizer(
    params,
    optimizer_cfg: dict,
    scheduler_cfg: Optional[dict] = None,
    steps_per_epoch: int = 1,
    fc_lr: Optional[float] = None,
    time_lr: Optional[float] = None,
    adapter_lr: Optional[float] = None,
    branch_to_freeze=False,
):
    """optax GradientTransformation reproducing train.py:94-192."""
    opt_type = optimizer_cfg.get("type", "Adam")
    if opt_type not in ("Adam", "AdamW"):
        raise ValueError(f"Unsupported optimizer type {opt_type!r}")
    args = dict(optimizer_cfg.get("args", {}))
    base_lr = float(args.get("lr", 1e-4))

    group_lr = {
        "rest": base_lr,
        "adapter": adapter_lr if adapter_lr is not None else base_lr,
        "fc": fc_lr if fc_lr is not None else base_lr,
        "time": time_lr if time_lr is not None else base_lr,
    }

    transforms: Dict[str, optax.GradientTransformation] = {
        "frozen": optax.set_to_zero()
    }
    for group, lr in group_lr.items():
        sched = make_lr_schedule(lr, scheduler_cfg, steps_per_epoch)
        decay_args = dict(args)
        if opt_type == "AdamW":
            # decoupled decay: approximate torch AdamW via optax.adamw per group
            transforms[f"{group}_decay"] = optax.adamw(
                learning_rate=sched,
                b1=args.get("betas", (0.9, 0.999))[0],
                b2=args.get("betas", (0.9, 0.999))[1],
                eps=float(args.get("eps", 1e-8)),
                weight_decay=float(args.get("weight_decay", 0.0) or 0.0),
            )
        else:
            transforms[f"{group}_decay"] = _adam_like(sched, decay_args)
        nodecay_args = dict(args, weight_decay=0.0)
        transforms[f"{group}_nodecay"] = _adam_like(sched, nodecay_args)

    labels = param_labels(params, branch_to_freeze)
    return optax.multi_transform(transforms, labels)


def trainable_mask(params, branch_to_freeze=False):
    """Bool pytree: True where the param receives updates."""
    frozen = frozen_predicate(branch_to_freeze)
    return jax.tree_util.tree_map_with_path(
        lambda path, _: not frozen(_path_str(path)), params
    )
