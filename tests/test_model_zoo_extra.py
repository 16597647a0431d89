"""R(2+1)D-34 backbone and the joint-layout TimeSformer variant."""

import jax
import jax.numpy as jnp
import numpy as np

from vtc_tpu.models.clip_model import CLIP_VARIANTS, VisionTransformer
from vtc_tpu.models.r2plus1d import R2Plus1D_34_IG65M_32frames, _midplanes
import pytest

from vtc_tpu.models.timesformer_joint import (
    TimeSformerJoint,
    joint_timesformer_params_from_clip_visual,
)

TINY = CLIP_VARIANTS["test-tiny"]
RES = 32
NF = 4


def test_r2plus1d_midplanes_matches_torchvision_rule():
    # torchvision Conv2Plus1D midplanes for the first 64->64 block is 144
    assert _midplanes(64, 64) == (64 * 64 * 27) // (64 * 9 + 3 * 64)


@pytest.mark.slow
def test_r2plus1d_forward_shape():
    model = R2Plus1D_34_IG65M_32frames()
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 3, 8, 64, 64)).astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(variables, x)
    assert y.shape == (1, 512)
    assert np.isfinite(np.asarray(y)).all()

    # pooling modes
    model_max = R2Plus1D_34_IG65M_32frames(pool_spatial="max", pool_temporal="max")
    y2 = model_max.apply(variables, x)
    assert y2.shape == (1, 512)
    assert not np.allclose(np.asarray(y), np.asarray(y2))


def test_joint_timesformer_time_attention_noop_at_init():
    """With the surgery init, TimeAttention is an exact no-op, so the joint
    model must match itself with the time path ablated."""
    vit = VisionTransformer(variant=TINY)
    vit_params = vit.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, RES, RES)))[
        "params"
    ]
    tsf = TimeSformerJoint(variant=TINY, nframes=NF)
    params = joint_timesformer_params_from_clip_visual(vit_params, TINY, NF)

    fresh = tsf.init(
        jax.random.PRNGKey(1), jnp.zeros((1, NF, 3, RES, RES))
    )["params"]
    ref_shapes = jax.tree_util.tree_map(lambda x: x.shape, fresh)
    got_shapes = jax.tree_util.tree_map(lambda x: np.asarray(x).shape, params)
    assert ref_shapes == got_shapes

    rng = np.random.default_rng(0)
    video = jnp.asarray(
        rng.normal(size=(2, NF, 3, RES, RES)).astype(np.float32)
    )
    out = np.asarray(tsf.apply({"params": params}, video))
    assert np.isfinite(out).all()

    # ablate: zeroing out_proj of timeattn too must not change anything
    # (v is already all-zero through the zero in_proj)
    import copy

    p2 = copy.deepcopy(jax.tree_util.tree_map(np.asarray, params))
    for i in range(TINY.vision_layers):
        p2[f"transformer_resblocks_{i}"]["timeattn"]["out_proj"]["kernel"][:] = 0
    out2 = np.asarray(tsf.apply({"params": p2}, video))
    np.testing.assert_allclose(out, out2, atol=1e-6)

    # but activating the time path changes the output. NB with the all-ones
    # out_proj the contribution stays constant-across-dims and is erased by
    # LayerNorm (the init trick); breaking both projections activates it.
    p3 = copy.deepcopy(jax.tree_util.tree_map(np.asarray, params))
    blk = p3["transformer_resblocks_0"]["timeattn"]
    prng = np.random.default_rng(1)
    blk["in_proj_weight"][:] = prng.normal(size=blk["in_proj_weight"].shape) * 0.1
    blk["out_proj"]["kernel"][:] = prng.normal(size=blk["out_proj"]["kernel"].shape) * 0.1
    out3 = np.asarray(tsf.apply({"params": p3}, video))
    assert not np.allclose(out, out3, atol=1e-4)


@pytest.mark.slow
def test_r2plus1d_reachable_from_factory_config():
    """The reference exports R2Plus1D_34_IG65M_32frames for config-driven
    construction (model/__init__.py:24-50); create_model must build it
    (round 1 shipped the module unregistered)."""
    import jax

    from vtc_tpu.models import create_model

    module, variables = create_model(
        "R2Plus1D_34_IG65M_32frames", pool_spatial="max", pool_temporal="mean"
    )
    assert module.pool_spatial == "max"
    x = np.random.default_rng(0).normal(size=(2, 3, 4, 32, 32)).astype(np.float32)
    out = jax.jit(lambda v, x: module.apply(v, x))(variables, x)
    assert out.shape == (2, 512)
    assert np.isfinite(np.asarray(out)).all()


def test_torch_batchnorm_running_stats_match_torch():
    """TorchBatchNorm updates running_var with the UNBIASED batch variance
    like torch.nn.BatchNorm1d — flax's nn.BatchNorm uses the biased one,
    which drifts eval-mode outputs of trained twins."""
    import torch

    from vtc_tpu.models.layers import TorchBatchNorm

    rng = np.random.default_rng(0)
    x1 = rng.normal(size=(16, 8)).astype(np.float32)
    x2 = rng.normal(size=(16, 8)).astype(np.float32) * 2 + 1

    tbn = torch.nn.BatchNorm1d(8, momentum=0.1)  # torch momentum = 1 - ours
    tbn.train()
    tbn(torch.from_numpy(x1))
    tbn(torch.from_numpy(x2))

    mod = TorchBatchNorm(use_running_average=False, momentum=0.9)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x1))
    stats = variables["batch_stats"]
    for x in (x1, x2):
        _, upd = mod.apply(
            {"params": variables["params"], "batch_stats": stats},
            jnp.asarray(x), mutable=["batch_stats"],
        )
        stats = upd["batch_stats"]

    np.testing.assert_allclose(
        np.asarray(stats["mean"]), tbn.running_mean.numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(stats["var"]), tbn.running_var.numpy(), atol=1e-5
    )

    # eval-mode forward parity on the trained stats
    tbn.eval()
    ref = tbn(torch.from_numpy(x1)).detach().numpy()
    got = np.asarray(
        TorchBatchNorm(use_running_average=True).apply(
            {"params": variables["params"], "batch_stats": stats},
            jnp.asarray(x1),
        )
    )
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.slow
def test_ig65m_import_matches_torchvision_state_dict_layout():
    """Synthesize a state_dict with torchvision VideoResNet's EXACT key
    layout and shapes (BasicBlock: conv1/conv2 are Sequentials with the BN
    at index 1; midplanes computed once per block from (inplanes, planes)
    and shared by both convs) — the importer must consume it and produce a
    tree congruent with the flax module's init."""
    from vtc_tpu.models.r2plus1d import import_ig65m_weights

    rng = np.random.default_rng(0)

    def w(*shape):
        return rng.normal(size=shape).astype(np.float32) * 0.02

    def bn(n, prefix, sd):
        sd[f"{prefix}.weight"] = np.ones(n, np.float32)
        sd[f"{prefix}.bias"] = np.zeros(n, np.float32)
        sd[f"{prefix}.running_mean"] = np.zeros(n, np.float32)
        sd[f"{prefix}.running_var"] = np.ones(n, np.float32)

    sd = {}
    sd["stem.0.weight"] = w(45, 3, 1, 7, 7)
    bn(45, "stem.1", sd)
    sd["stem.3.weight"] = w(64, 45, 3, 1, 1)
    bn(64, "stem.4", sd)

    layers, widths = (3, 4, 6, 3), (64, 128, 256, 512)
    inplanes = 64
    for li, (n, p) in enumerate(zip(layers, widths)):
        for bi in range(n):
            i = inplanes if bi == 0 else p
            m = (i * p * 3 * 3 * 3) // (i * 3 * 3 + 3 * p)  # per BLOCK
            t = f"layer{li + 1}.{bi}"
            for ci, cin in (("conv1", i), ("conv2", p)):
                sd[f"{t}.{ci}.0.0.weight"] = w(m, cin, 1, 3, 3)
                bn(m, f"{t}.{ci}.0.1", sd)
                sd[f"{t}.{ci}.0.3.weight"] = w(p, m, 3, 1, 1)
                bn(p, f"{t}.{ci}.1", sd)
            if li > 0 and bi == 0:
                sd[f"{t}.downsample.0.weight"] = w(p, i, 1, 1, 1)
                bn(p, f"{t}.downsample.1", sd)
        inplanes = p

    imported = import_ig65m_weights(sd)

    model = R2Plus1D_34_IG65M_32frames()
    x = jnp.zeros((1, 3, 4, 32, 32), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    want_shapes = jax.tree_util.tree_map(lambda a: a.shape, dict(variables))
    got_shapes = jax.tree_util.tree_map(np.shape, imported)
    assert want_shapes == got_shapes

    y = model.apply(
        {"params": imported["params"], "batch_stats": imported["batch_stats"]},
        x,
    )
    assert y.shape == (1, 512) and np.isfinite(np.asarray(y)).all()


def test_r2plus1d_transition_block_uses_block_midplanes():
    """conv2 of a transition block reuses the BLOCK's midplanes (from
    inplanes->planes), not _midplanes(planes, planes): layer2_0 must build
    a 230-wide intermediate, not 288."""
    from vtc_tpu.models.r2plus1d import R2Plus1dBlock

    blk = R2Plus1dBlock(128, (2, 2, 2))
    v = blk.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, 8, 8, 64), jnp.float32)
    )
    k2 = v["params"]["conv2"]["conv_s"]["kernel"]
    assert k2.shape[-2:] == (128, 230), k2.shape  # (cin=planes, mid=230)
