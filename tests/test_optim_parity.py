"""Optimizer numerical parity: our optax chain must reproduce
torch.optim.Adam(amsgrad=True) + StepLR stepping to fp32 tolerance over many
steps (the reference's exact update rule, train.py:185-194)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from vtc_tpu.training.optim import build_optimizer, make_lr_schedule


def test_adam_amsgrad_update_matches_torch():
    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(6, 5)).astype(np.float32)
    steps = 25
    grads = [rng.normal(size=w0.shape).astype(np.float32) for _ in range(steps)]

    lr, wd = 1e-2, 1e-3

    # torch reference
    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.Adam([wt], lr=lr, weight_decay=wd, amsgrad=True)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=2, gamma=0.1)
    steps_per_epoch = 5
    for s in range(steps):
        opt.zero_grad()
        wt.grad = torch.from_numpy(grads[s].copy())
        opt.step()
        if (s + 1) % steps_per_epoch == 0:
            sched.step()

    # ours: single param tree, 'rest' group
    params = {"clip": {"visual": {"transformer": {"resblocks_0": {"mlp": {
        "c_fc": {"kernel": jnp.asarray(w0)}}}}}}}
    tx = build_optimizer(
        params,
        {"type": "Adam", "args": {"lr": lr, "weight_decay": wd, "amsgrad": True}},
        {"type": "StepLR", "args": {"step_size": 2, "gamma": 0.1}},
        steps_per_epoch=steps_per_epoch,
    )
    state = tx.init(params)
    p = params
    for s in range(steps):
        g = jax.tree_util.tree_map(lambda x: jnp.asarray(grads[s]), p)
        updates, state = tx.update(g, state, p)
        p = jax.tree_util.tree_map(lambda a, u: a + u, p, updates)

    ours = np.asarray(
        p["clip"]["visual"]["transformer"]["resblocks_0"]["mlp"]["c_fc"]["kernel"]
    )
    np.testing.assert_allclose(ours, wt.detach().numpy(), atol=2e-6, rtol=1e-5)


def test_steplr_schedule_values():
    sched = make_lr_schedule(
        0.1, {"type": "StepLR", "args": {"step_size": 3, "gamma": 0.5}},
        steps_per_epoch=10,
    )
    assert sched(0) == 0.1            # epoch 0
    assert sched(29) == 0.1           # epoch 2
    assert np.isclose(sched(30), 0.05)  # epoch 3
    assert np.isclose(sched(60), 0.025)  # epoch 6


def _group_tree(w):
    """One param per optimizer group + a frozen one."""
    return {
        "clip": {
            "visual": {
                "proj": jnp.asarray(w(0)),                      # fc group
                "conv1": jnp.asarray(w(1)),                     # rest (frozen under 'visual')
                "transformer": {"resblocks_0": {
                    "attn": {"in_proj_bias": jnp.asarray(w(2))},  # rest_nodecay
                    "mlp": {"c_fc": {"kernel": jnp.asarray(w(3))}},  # rest_decay
                }},
            },
            "text": {"text_projection": jnp.asarray(w(4))},     # fc group
        },
        "cam": {"final_linear": {"kernel": jnp.asarray(w(5))}},  # adapter
        "visual_extra": {"temporal_fc": {"kernel": jnp.asarray(w(6))}},  # time
    }


import pytest  # noqa: E402


@pytest.mark.parametrize("opt_type,amsgrad", [
    ("Adam", True), ("Adam", False), ("AdamW", False), ("AdamW", True),
])
def test_fused_matches_chain(opt_type, amsgrad):
    """The fused single-pass optimizer is numerically identical to the optax
    multi_transform chain across all 4 groups, decay splits, a frozen
    branch, and both Adam flavors."""
    rng = np.random.default_rng(1)
    w = lambda i: rng.normal(size=(4, 3)).astype(np.float32)  # noqa: E731
    params = _group_tree(w)
    cfg = {
        "type": opt_type,
        "args": {"lr": 1e-2, "weight_decay": 1e-3, "amsgrad": amsgrad},
    }
    sched_cfg = {"type": "StepLR", "args": {"step_size": 1, "gamma": 0.5}}
    kw = dict(
        scheduler_cfg=sched_cfg, steps_per_epoch=4,
        fc_lr=5e-3, time_lr=2e-3, adapter_lr=3e-2,
        branch_to_freeze="visual",
    )
    tx_f = build_optimizer(params, cfg, fused=True, **kw)
    tx_c = build_optimizer(params, cfg, fused=False, **kw)

    sf, sc = tx_f.init(params), tx_c.init(params)
    pf = pc = params
    for s in range(10):
        g = jax.tree_util.tree_map(
            lambda x: jnp.asarray(
                np.random.default_rng(100 + s).normal(size=x.shape),
                jnp.float32,
            ),
            params,
        )
        uf, sf = tx_f.update(g, sf, pf)
        pf = jax.tree_util.tree_map(lambda a, u: a + u, pf, uf)
        uc, sc = tx_c.update(g, sc, pc)
        pc = jax.tree_util.tree_map(lambda a, u: a + u, pc, uc)
    for (kf, lf), (kc, lc) in zip(
        jax.tree_util.tree_leaves_with_path(pf),
        jax.tree_util.tree_leaves_with_path(pc),
    ):
        assert kf == kc
        np.testing.assert_allclose(
            np.asarray(lf), np.asarray(lc), atol=1e-6, rtol=1e-6,
            err_msg=str(kf),
        )
    # frozen leaf untouched
    np.testing.assert_array_equal(
        np.asarray(pf["clip"]["visual"]["conv1"]),
        np.asarray(params["clip"]["visual"]["conv1"]),
    )


def test_fused_apply_equals_update_then_add():
    rng = np.random.default_rng(2)
    w = lambda i: rng.normal(size=(3, 3)).astype(np.float32)  # noqa: E731
    params = _group_tree(w)
    cfg = {"type": "Adam", "args": {"lr": 1e-2, "weight_decay": 1e-3,
                                    "amsgrad": True}}
    tx = build_optimizer(params, cfg, fused=True)
    g = jax.tree_util.tree_map(
        lambda x: jnp.asarray(rng.normal(size=x.shape), jnp.float32), params
    )
    s0 = tx.init(params)
    u, s1 = tx.update(g, s0, params)
    p_two_step = jax.tree_util.tree_map(lambda a, d: a + d, params, u)
    p_fused, s1b = tx.apply(g, s0, params)
    for a, b in zip(
        jax.tree_util.tree_leaves(p_two_step), jax.tree_util.tree_leaves(p_fused)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    assert int(s1.count) == int(s1b.count) == 1


def test_cosine_annealing_is_periodic_like_torch():
    """torch CosineAnnealingLR rises back toward base lr after T_max (period
    2*T_max); a clamped-at-zero schedule kills all learning past T_max."""
    from vtc_tpu.training.optim import make_lr_schedule

    spe = 10
    sched = make_lr_schedule(
        0.1, {"type": "CosineAnnealingLR", "args": {"T_max": 4}}, spe
    )
    assert float(sched(0)) == pytest.approx(0.1)
    assert float(sched(4 * spe)) == pytest.approx(0.0, abs=1e-9)
    assert float(sched(8 * spe)) == pytest.approx(0.1)  # periodic, not 0
    assert float(sched(6 * spe)) == pytest.approx(0.05)


def test_frozen_predicate_rejects_unknown_spec():
    """The reference raises on an unknown freeze spec (model/model.py:304);
    a silent no-op would train the 'frozen' backbone at full lr."""
    from vtc_tpu.training.optim import frozen_predicate

    with pytest.raises(ValueError, match="branch_to_freeze"):
        frozen_predicate("vissual")
    with pytest.raises(ValueError, match="branch_to_freeze"):
        frozen_predicate(True)


def test_bf16_moments_storage():
    """`optimizer.args.moments_dtype: "bfloat16"` (fused-only, beyond
    reference): moments STORED bf16, math fp32 — the trajectory must stay
    close to the fp32-moment run (pure storage rounding), state dtypes must
    actually be bf16 (the memory contract), frozen placeholders intact, and
    the optax chain must reject the knob instead of ignoring it."""
    rng = np.random.default_rng(5)
    w = lambda i: rng.normal(size=(8, 4)).astype(np.float32)  # noqa: E731
    params = _group_tree(w)
    cfg32 = {"type": "Adam", "args": {"lr": 1e-2, "weight_decay": 1e-3,
                                      "amsgrad": True}}
    cfg16 = {"type": "Adam", "args": {**cfg32["args"],
                                      "moments_dtype": "bfloat16"}}
    kw = dict(fc_lr=5e-3, adapter_lr=3e-2, branch_to_freeze="visual")
    tx32 = build_optimizer(params, cfg32, fused=True, **kw)
    tx16 = build_optimizer(params, cfg16, fused=True, **kw)

    s32, s16 = tx32.init(params), tx16.init(params)
    # memory contract: non-frozen moment leaves stored bf16
    assert s16.mu["cam"]["final_linear"]["kernel"].dtype == jnp.bfloat16
    assert s16.nu_max["cam"]["final_linear"]["kernel"].dtype == jnp.bfloat16
    assert s16.mu["clip"]["visual"]["conv1"].dtype == jnp.float32  # frozen

    p32 = p16 = params
    for s in range(10):
        g = jax.tree_util.tree_map(
            lambda x: jnp.asarray(
                np.random.default_rng(200 + s).normal(size=x.shape),
                jnp.float32,
            ),
            params,
        )
        p32, s32 = tx32.apply(g, s32, p32)
        p16, s16 = tx16.apply(g, s16, p16)
    for (k32, l32), (k16, l16) in zip(
        jax.tree_util.tree_leaves_with_path(p32),
        jax.tree_util.tree_leaves_with_path(p16),
    ):
        assert k32 == k16
        # bf16 has ~3 decimal digits; after 10 unit-scale Adam steps the
        # param drift stays ~1e-2 relative to the ~0.1 total update
        np.testing.assert_allclose(
            np.asarray(l16), np.asarray(l32), atol=5e-3, err_msg=str(k32)
        )
    assert s16.mu["cam"]["final_linear"]["kernel"].dtype == jnp.bfloat16  # survives updates

    with pytest.raises(ValueError, match="moments_dtype"):
        build_optimizer(params, cfg16, fused=False, **kw)


def test_batchnorm_scale_is_decay_group():
    """Reference nodecay matches bias/.ln/embedding only — BatchNorm gammas
    ('bn.weight' upstream) take weight decay; LayerNorm scales do not."""
    from vtc_tpu.training.optim import is_nodecay

    assert is_nodecay("clip/visual/transformer/resblocks_0/ln_1/scale")
    assert is_nodecay("cam/ln_x/bias")
    assert not is_nodecay("audio/base/bn1/scale")
    assert not is_nodecay("cam/bn/scale")
    assert not is_nodecay("logit_scale")
