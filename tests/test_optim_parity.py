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
