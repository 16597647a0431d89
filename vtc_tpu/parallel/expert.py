"""Expert parallelism: a mixture-of-experts MLP with the experts sharded
over an ``"expert"`` mesh axis.

The reference has no MoE anywhere (SURVEY §2.3: EP "n/a") — this is the
beyond-parity capability completing the framework's parallelism axes
(dp/tp/pp/sp/ep). Design is the standard GShard/Switch dispatch, written
the TPU way: routing, dispatch and combine are ONE-HOT EINSUMS (MXU work,
static shapes — no gathers, no dynamic slicing), expert FFNs are a single
j-batched ``[nE, C, E] × [nE, E, 4E]`` matmul, and the expert-stacked
weights + dispatched activations carry ``P("expert", ...)`` shardings so
GSPMD inserts the device all-to-all between the token-sharded and
expert-sharded layouts.

Semantics:

* top-k routing (k=1 Switch, k=2 GShard) with gates renormalized over the
  selected experts — so identical experts reproduce the dense MLP exactly
  (pinned by ``tests/test_expert.py``);
* fixed expert capacity ``ceil(cf · k · T / nE)``; tokens over capacity are
  DROPPED (their MoE output is zero — inside a pre-LN residual block they
  pass through unchanged, the standard overflow behavior);
* router computes in fp32 regardless of activation dtype; expert matmuls
  accumulate fp32 on the MXU like every other dot in the framework.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.layers import quick_gelu
from .mesh import DATA_AXIS

EXPERT_AXIS = "expert"

# newest expert mesh, consulted by MoEMLP when no mesh field is given —
# same newest-mesh-wins idiom as models.layers.set_tp_qkv
_EXPERT_MESH: Optional[Mesh] = None


def set_expert_mesh(mesh: Optional[Mesh]) -> None:
    """Select the mesh MoE layers constrain their expert shardings to.
    ``create_ep_mesh`` calls this; pass None to drop back to single-device
    (unconstrained) MoE for later traces."""
    global _EXPERT_MESH
    _EXPERT_MESH = mesh


def current_expert_mesh() -> Optional[Mesh]:
    return _EXPERT_MESH


def create_ep_mesh(n_data: int, n_expert: int, devices=None) -> Mesh:
    """``("data", "expert")`` mesh for dp×ep runs; becomes the default mesh
    for subsequently traced MoE layers (``set_expert_mesh``)."""
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) < n_data * n_expert:
        raise ValueError(
            f"need {n_data * n_expert} devices, have {len(devices)}"
        )
    arr = np.array(devices[: n_data * n_expert]).reshape(n_data, n_expert)
    from ..models import layers

    # newest-mesh-wins (like create_pipeline_mesh/create_sp_mesh): an
    # expert mesh has no tp axis, so attention drops back to the merged
    # single-GEMM qkv form
    layers.set_tp_qkv(False, 1)
    mesh = Mesh(arr, (DATA_AXIS, EXPERT_AXIS))
    set_expert_mesh(mesh)
    return mesh


def moe_pspec(path: str) -> Optional[P]:
    """PartitionSpec for an expert-stacked MoE parameter (leading nE axis
    over the expert mesh axis), or None for non-MoE params. Kept separate
    from ``mesh._PARAM_RULES`` — those target ``("data","model")`` meshes
    which have no expert axis."""
    # w_fc/bias_fc/w_proj/bias_proj are MoE-specific names repo-wide (the
    # dense MLP uses c_fc/c_proj), whether under an mlp_moe block or
    # standalone
    leaf = path.rsplit("/", 1)[-1]
    if leaf in ("w_fc", "bias_fc", "w_proj", "bias_proj"):
        return P(EXPERT_AXIS)
    return None


def moe_shardings(tree, mesh: Mesh):
    """NamedShardings for a parameter tree on an expert mesh: MoE expert
    stacks shard over ``EXPERT_AXIS``, everything else replicates."""

    def path_str(path):
        return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)

    def spec(path, _):
        s = moe_pspec(path_str(path))
        return NamedSharding(mesh, s if s is not None else P())

    return jax.tree_util.tree_map_with_path(spec, tree)


class MoEMLP(nn.Module):
    """Drop-in MoE replacement for ``models.layers.MLPBlock`` (same
    E → 4E → QuickGELU → E shape per expert).

    ``mesh``: when given, the dispatched ``[nE, C, ·]`` tensors carry
    ``P("expert", ...)`` sharding constraints so each device computes only
    its experts (GSPMD places the token→expert all-to-all). Without a mesh
    the math is identical on one device.
    """

    width: int
    n_experts: int
    router_top_k: int = 1
    capacity_factor: float = 1.25
    dtype: jnp.dtype = jnp.float32
    mesh: Optional[Mesh] = None

    @nn.compact
    def __call__(self, x):
        e = self.width
        n_exp, k = int(self.n_experts), int(self.router_top_k)
        if not 1 <= k <= n_exp:
            raise ValueError(f"router_top_k={k} with {n_exp} experts")
        lead = x.shape[:-1]
        xt = x.reshape(-1, e)
        t = xt.shape[0]
        cap = int(math.ceil(self.capacity_factor * k * t / n_exp))

        # --- router (fp32) -------------------------------------------------
        router = self.param(
            "router",
            # torch trunc_normal_(std=.02) semantics as elsewhere in the
            # repo: absolute [-2,2] bounds = effectively untruncated
            nn.initializers.truncated_normal(0.02, lower=-100.0, upper=100.0),
            (e, n_exp), jnp.float32,
        )
        probs = jax.nn.softmax(
            jnp.einsum(
                "td,dn->tn", xt.astype(jnp.float32), router,
                preferred_element_type=jnp.float32,
            ),
            axis=-1,
        )
        gates, idx = jax.lax.top_k(probs, k)  # [T, k]
        gates = gates / jnp.sum(gates, axis=-1, keepdims=True)

        # Switch/GShard load-balance auxiliary loss: n_exp · Σ_e f_e · P_e
        # (f = fraction of tokens whose TOP-1 choice is e, P = mean router
        # prob) — 1.0 at perfect balance, grows toward n_exp on collapse.
        # Sown into the "losses" collection; make_step_fns adds it to the
        # training loss (weighted), which is what prevents router collapse
        # from silently dropping over-capacity tokens every step.
        top1 = jax.nn.one_hot(idx[:, 0], n_exp, dtype=jnp.float32)
        aux = n_exp * jnp.sum(
            jnp.mean(top1, axis=0) * jnp.mean(probs, axis=0)
        )
        self.sow("losses", "moe_aux", aux)

        # --- dispatch/combine one-hots (GShard): slot s yields positions
        # after all of slot <s's assignments ---------------------------------
        dispatch = jnp.zeros((t, n_exp, cap), jnp.float32)
        combine = jnp.zeros((t, n_exp, cap), jnp.float32)
        counts = jnp.zeros((n_exp,), jnp.float32)
        for s in range(k):
            oh = jax.nn.one_hot(idx[:, s], n_exp, dtype=jnp.float32)  # [T, nE]
            pos = jnp.cumsum(oh, axis=0) - 1.0 + counts  # queue position
            counts = counts + jnp.sum(oh, axis=0)
            pos_t = jnp.sum(oh * pos, axis=-1)  # [T]
            keep = (pos_t < cap).astype(jnp.float32)
            slot = (
                oh[:, :, None]
                * jax.nn.one_hot(pos_t.astype(jnp.int32), cap, dtype=jnp.float32)[
                    :, None, :
                ]
                * keep[:, None, None]
            )
            dispatch = dispatch + slot
            combine = combine + slot * gates[:, s][:, None, None]

        # --- expert FFNs on the dispatched [nE, C, E] activations -----------
        # batch_axis=0: the expert axis is NOT receptive field — plain
        # lecun_normal on the stacked shape would count it into fan_in and
        # start every expert sqrt(n_exp)× smaller than the dense c_fc it
        # replaces
        per_expert_lecun = nn.initializers.variance_scaling(
            1.0, "fan_in", "truncated_normal", batch_axis=(0,)
        )
        w_fc = self.param(
            "w_fc", per_expert_lecun, (n_exp, e, 4 * e), jnp.float32,
        )
        # "bias" in the name keeps these in the optimizer's no-weight-decay
        # group like every other bias (optim._NODECAY_MATCHES)
        bias_fc = self.param("bias_fc", nn.initializers.zeros, (n_exp, 4 * e),
                             jnp.float32)
        w_proj = self.param(
            "w_proj", per_expert_lecun, (n_exp, 4 * e, e), jnp.float32,
        )
        bias_proj = self.param("bias_proj", nn.initializers.zeros, (n_exp, e),
                               jnp.float32)

        mesh = self.mesh if self.mesh is not None else current_expert_mesh()

        def constrain(a):
            if mesh is not None and EXPERT_AXIS in mesh.shape:
                return jax.lax.with_sharding_constraint(
                    a, NamedSharding(mesh, P(EXPERT_AXIS))
                )
            return a

        xe = jnp.einsum(
            "tec,td->ecd", dispatch.astype(self.dtype), xt.astype(self.dtype),
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)
        xe = constrain(xe)
        h = jnp.einsum(
            "ecd,edf->ecf", xe, constrain(w_fc.astype(self.dtype)),
            preferred_element_type=jnp.float32,
        ).astype(self.dtype) + constrain(bias_fc.astype(self.dtype))[:, None, :]
        h = quick_gelu(h)
        out = jnp.einsum(
            "ecf,efd->ecd", h, constrain(w_proj.astype(self.dtype)),
            preferred_element_type=jnp.float32,
        ).astype(self.dtype) + constrain(bias_proj.astype(self.dtype))[:, None, :]
        out = constrain(out)

        y = jnp.einsum(
            "tec,ecd->td", combine.astype(self.dtype), out,
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)
        return y.reshape(*lead, e)
