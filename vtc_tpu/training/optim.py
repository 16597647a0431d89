"""Optimizer construction: the reference's 4-group / decay-split scheme as
optax transforms.

``train.py:94-192`` partitions trainable params by name into four groups —
CLIP final projections (``fc_lr``), time/temporal params (``time_lr``), CAM
params (``adapter_lr``), rest (base ``lr``) — each split into decay/no-decay
(bias, LayerNorm, embeddings). Frozen branches (``model/model.py:268-305``)
set ``requires_grad=False``; here they map to an ``optax.set_to_zero`` label.

torch.optim.Adam semantics are preserved: L2 weight decay is added to the
gradient *before* the Adam moments (not decoupled), and ``amsgrad`` uses a
torch-exact implementation (see :func:`scale_by_amsgrad_torch` — optax's
differs). StepLR is a per-group step-count schedule
(``gamma ** (epoch // step_size)``).
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
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
    # LayerNorm scales are caught by the "/ln" match (torch names them
    # "<ln>.weight", matched by ".ln" in the reference). BatchNorm scales
    # ("bn.weight" upstream) match NEITHER "bias" nor ".ln" there, so they
    # stay in the DECAY set — as does logit_scale.
    return any(t in path for t in _NODECAY_MATCHES)


def frozen_predicate(branch_to_freeze) -> Callable[[str], bool]:
    """Which params are frozen (``model/model.py:268-305``). Note the
    reference's 'text' freezes only the text *transformer* (not embeddings,
    ln_final, or text_projection)."""
    if branch_to_freeze in (False, None, "none"):
        return lambda path: False

    spec = str(branch_to_freeze)
    known = ("all", "visual", "text", "finaltf")
    if not any(k in spec for k in known):
        # the reference raises on an unknown spec (model/model.py:304); a
        # silent no-op would turn a frozen-backbone experiment into full
        # finetuning
        raise ValueError(
            f"Unknown branch_to_freeze {branch_to_freeze!r}; expected "
            f"False/'none' or a string containing one of {known}"
        )

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
        # torch CosineAnnealingLR is PERIODIC (closed form, period 2*T_max:
        # lr rises back toward base after T_max); optax.cosine_decay_schedule
        # clamps at 0 past T_max, which kills all learning for runs longer
        # than T_max epochs
        t_max = int(args.get("T_max", 10))
        eta_min = float(args.get("eta_min", 0.0))

        def schedule(step):
            epoch = step // max(steps_per_epoch, 1)
            return eta_min + (lr - eta_min) * (
                1 + jnp.cos(jnp.pi * epoch / t_max)
            ) / 2

        return schedule
    raise ValueError(f"Unknown lr_scheduler type {stype!r}")


# ---------------------------------------------------------------------------
# Optimizer
# ---------------------------------------------------------------------------


def scale_by_amsgrad_torch(b1=0.9, b2=0.999, eps=1e-8):
    """torch.optim.Adam(amsgrad=True)-exact scaling.

    Differs from ``optax.scale_by_amsgrad``: torch keeps the running max over
    the *uncorrected* second moment and applies the bias correction to the
    max (``denom = sqrt(v_max)/sqrt(1-b2^t) + eps``); optax maxes over
    bias-corrected values, so the inflated early estimates stick and updates
    shrink (measured ~0.65 relative drift over 25 steps)."""
    import chex

    @chex.dataclass
    class State:
        count: chex.Array
        mu: optax.Updates
        nu: optax.Updates
        nu_max: optax.Updates

    def init(params):
        zeros = lambda: jax.tree_util.tree_map(  # noqa: E731
            lambda p: jnp.zeros_like(p, dtype=jnp.float32), params
        )
        return State(
            count=jnp.zeros((), jnp.int32), mu=zeros(), nu=zeros(),
            nu_max=zeros(),
        )

    def update(updates, state, params=None):
        del params
        count = state.count + 1
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g.astype(jnp.float32),
            state.mu, updates,
        )
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * jnp.square(g.astype(jnp.float32)),
            state.nu, updates,
        )
        nu_max = jax.tree_util.tree_map(jnp.maximum, state.nu_max, nu)
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)
        out = jax.tree_util.tree_map(
            lambda m, vmax: (m / bc1) / (jnp.sqrt(vmax) / jnp.sqrt(bc2) + eps),
            mu, nu_max,
        )
        return out, State(count=count, mu=mu, nu=nu, nu_max=nu_max)

    return optax.GradientTransformation(init, update)


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
        parts.append(scale_by_amsgrad_torch(b1=b1, b2=b2, eps=eps))
    else:
        parts.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    parts.append(optax.scale_by_schedule(lambda s: -lr_schedule(s)))
    return optax.chain(*parts)


def _adamw_like(lr_schedule, opt_args: dict):
    """torch.optim.AdamW-equivalent chain: (ams)adam moments, DECOUPLED
    decay added after the adaptive scaling, schedule-scaled step — the
    amsgrad branch keeps torch's max-of-uncorrected-moments semantics
    (optax.adamw has no amsgrad, so routing amsgrad AdamW through it would
    silently drop the max-moments)."""
    wd = float(opt_args.get("weight_decay", 0.0) or 0.0)
    b1, b2 = opt_args.get("betas", (0.9, 0.999))
    eps = float(opt_args.get("eps", 1e-8))
    amsgrad = bool(opt_args.get("amsgrad", False))

    parts = []
    if amsgrad:
        parts.append(scale_by_amsgrad_torch(b1=b1, b2=b2, eps=eps))
    else:
        parts.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    if wd:
        parts.append(optax.add_decayed_weights(wd))
    parts.append(optax.scale_by_schedule(lambda s: -lr_schedule(s)))
    return optax.chain(*parts)


# ---------------------------------------------------------------------------
# Fused single-pass optimizer (the default)
# ---------------------------------------------------------------------------


class FusedOptState(NamedTuple):
    """count + param-shaped fp32 moment trees. Frozen leaves hold 0-size
    placeholders so the tree structure still matches the params (keeps every
    update a single plain ``tree_map``) at zero memory cost."""

    count: jax.Array
    mu: object
    nu: object
    nu_max: object  # zeros-placeholder tree when amsgrad is off


class FusedOptimizer:
    """The reference's 4-group Adam/AdamW (train.py:94-192) as ONE fused
    elementwise pass per parameter.

    The optax chain (``build_optimizer(..., fused=False)``) expresses the
    same math as a pipeline of tree_maps — decay-into-grad, moment updates,
    amsgrad max, schedule scale, then the trainer's separate ``p + u`` — and
    XLA materializes enough of the intermediates that the update measured
    ~3x the HBM floor (14.5 ms of a 66 ms step, PERFORMANCE.md round 2).
    Computing g', mu, nu, nu_max and the new param in one lambda per leaf
    gives XLA a single fusion whose traffic is the amsgrad minimum: read
    {g, p, mu, nu, nu_max}, write {p, mu, nu, nu_max}.

    Interface: ``init``/``update`` follow optax (``update`` returns deltas so
    ``test_optim_parity`` and generic callers keep working); ``apply`` is the
    fused fast path returning ``(new_params, new_state)`` directly — the
    trainer uses it so the param write rides the same kernel.

    torch semantics preserved exactly (same as the chain): L2 decay added to
    the gradient before the moments (Adam) or decoupled (AdamW); amsgrad
    maxes the *uncorrected* second moment with bias correction applied to
    the max (torch.optim.Adam, see ``scale_by_amsgrad_torch``).
    """

    def __init__(self, labels, schedules, args, opt_type):
        self._labels = labels
        self._schedules = schedules  # {group: schedule(step) -> lr}
        b1, b2 = args.get("betas", (0.9, 0.999))
        self._b1, self._b2 = float(b1), float(b2)
        self._eps = float(args.get("eps", 1e-8))
        self._wd = float(args.get("weight_decay", 0.0) or 0.0)
        self._amsgrad = bool(args.get("amsgrad", False))
        self._decoupled = opt_type == "AdamW"
        # moment STORAGE dtype (config `optimizer.args.moments_dtype`,
        # default fp32 = torch parity). "bfloat16" halves the optimizer
        # state's HBM footprint and its read+write traffic in the update
        # pass; all arithmetic stays fp32 (load-cast-up, store-cast-down),
        # so the deviation is pure storage rounding of mu/nu/nu_max.
        # Beyond-reference memory/perf knob — measured in PERFORMANCE.md.
        self._mdt = jnp.dtype(args.get("moments_dtype") or jnp.float32)

    # -- state ------------------------------------------------------------
    def init(self, params):
        def moments(label, p):
            if label == "frozen":
                # scalar placeholder: keeps the tree structure aligned with
                # params at no memory cost (0-size arrays break Orbax saves)
                return jnp.zeros((), jnp.float32)
            return jnp.zeros_like(p, dtype=self._mdt)

        mk = lambda: jax.tree_util.tree_map(  # noqa: E731
            moments, self._labels, params
        )
        return FusedOptState(
            count=jnp.zeros((), jnp.int32), mu=mk(), nu=mk(), nu_max=mk()
        )

    # -- core fused step ---------------------------------------------------
    def _step(self, grads, state, params, *, return_new_params):
        count = state.count + 1
        cf = count.astype(jnp.float32)
        bc1 = 1 - self._b1**cf
        bc2 = 1 - self._b2**cf
        # schedules are indexed by the pre-increment step, matching
        # optax.scale_by_schedule's own counter in the unfused chain
        lrs = {g: s(state.count) for g, s in self._schedules.items()}

        labels_flat, treedef = jax.tree_util.tree_flatten(self._labels)
        flat = lambda t: treedef.flatten_up_to(t)  # noqa: E731
        outs = [
            self._leaf(label, g, p, m, v, vm, lrs, bc1, bc2, return_new_params)
            for label, g, p, m, v, vm in zip(
                labels_flat, flat(grads), flat(params),
                flat(state.mu), flat(state.nu), flat(state.nu_max),
            )
        ]
        unflat = lambda i: treedef.unflatten([o[i] for o in outs])  # noqa: E731
        new_state = FusedOptState(
            count=count, mu=unflat(1), nu=unflat(2), nu_max=unflat(3)
        )
        return unflat(0), new_state

    def _leaf(self, label, g, p, m, v, vm, lrs, bc1, bc2, return_new_params):
        if label == "frozen":
            out = p if return_new_params else jnp.zeros_like(p)
            return out, m, v, vm
        group, decay = label.rsplit("_", 1)
        lr = lrs[group]
        wd = self._wd if decay == "decay" else 0.0
        b1, b2, eps = self._b1, self._b2, self._eps

        g = g.astype(jnp.float32)
        if wd and not self._decoupled:
            g = g + wd * p.astype(jnp.float32)
        # moments may be STORED narrower (moments_dtype); math is fp32
        m = b1 * m.astype(jnp.float32) + (1 - b1) * g
        v = b2 * v.astype(jnp.float32) + (1 - b2) * jnp.square(g)
        if self._amsgrad:
            vm = jnp.maximum(vm.astype(jnp.float32), v)
            denom = jnp.sqrt(vm) / jnp.sqrt(bc2) + eps
        else:
            denom = jnp.sqrt(v) / jnp.sqrt(bc2) + eps
        upd = (m / bc1) / denom
        if wd and self._decoupled:
            upd = upd + wd * p.astype(jnp.float32)
        delta = (-lr * upd).astype(p.dtype)
        out = p + delta if return_new_params else delta
        mdt = self._mdt
        return out, m.astype(mdt), v.astype(mdt), vm.astype(mdt)

    # -- interfaces --------------------------------------------------------
    def update(self, grads, state, params=None):
        """optax-style: returns (updates, new_state)."""
        if params is None:
            raise ValueError("FusedOptimizer.update requires params")
        return self._step(grads, state, params, return_new_params=False)

    def apply(self, grads, state, params):
        """Fused fast path: returns (new_params, new_state) — the param
        write fuses into the same per-leaf kernel."""
        return self._step(grads, state, params, return_new_params=True)


def build_optimizer(
    params,
    optimizer_cfg: dict,
    scheduler_cfg: Optional[dict] = None,
    steps_per_epoch: int = 1,
    fc_lr: Optional[float] = None,
    time_lr: Optional[float] = None,
    adapter_lr: Optional[float] = None,
    branch_to_freeze=False,
    fused: bool = True,
):
    """The reference's 4-group optimizer (train.py:94-192).

    ``fused=True`` (default) returns the single-pass :class:`FusedOptimizer`;
    ``fused=False`` keeps the optax multi_transform chain (same math, more
    memory passes — retained for A/B measurement and as the optax-native
    formulation)."""
    opt_type = optimizer_cfg.get("type", "Adam")
    if opt_type not in ("Adam", "AdamW"):
        raise ValueError(f"Unsupported optimizer type {opt_type!r}")
    args = dict(optimizer_cfg.get("args", {}))
    base_lr = float(args.get("lr", 1e-3))  # torch.optim.Adam's default

    group_lr = {
        "rest": base_lr,
        "adapter": adapter_lr if adapter_lr is not None else base_lr,
        "fc": fc_lr if fc_lr is not None else base_lr,
        "time": time_lr if time_lr is not None else base_lr,
    }

    labels = param_labels(params, branch_to_freeze)

    if fused:
        schedules = {
            group: make_lr_schedule(lr, scheduler_cfg, steps_per_epoch)
            for group, lr in group_lr.items()
        }
        return FusedOptimizer(labels, schedules, args, opt_type)

    if args.get("moments_dtype"):
        # the optax chain always keeps fp32 moments; silently ignoring a
        # requested memory layout would be a footgun
        raise ValueError(
            "moments_dtype is only supported by the fused optimizer "
            "(build_optimizer(fused=True), the default)"
        )

    transforms: Dict[str, optax.GradientTransformation] = {
        "frozen": optax.set_to_zero()
    }
    for group, lr in group_lr.items():
        sched = make_lr_schedule(lr, scheduler_cfg, steps_per_epoch)
        decay_args = dict(args)
        nodecay_args = dict(args, weight_decay=0.0)
        mk = _adamw_like if opt_type == "AdamW" else _adam_like
        transforms[f"{group}_decay"] = mk(sched, decay_args)
        transforms[f"{group}_nodecay"] = mk(sched, nodecay_args)

    return optax.multi_transform(transforms, labels)


def trainable_mask(params, branch_to_freeze=False):
    """Bool pytree: True where the param receives updates."""
    frozen = frozen_predicate(branch_to_freeze)
    return jax.tree_util.tree_map_with_path(
        lambda path, _: not frozen(_path_str(path)), params
    )
