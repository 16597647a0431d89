"""Expert parallelism (parallel/expert.py): GShard-style MoE MLP —
identical experts reproduce the dense MLP exactly, routing/capacity
semantics hold, expert-axis sharding does not change numerics, and the
CAM's beyond-reference MoE adapter keeps the zero-init-is-average
property."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from vtc_tpu.models.layers import MLPBlock, Transformer
from vtc_tpu.parallel.expert import (
    EXPERT_AXIS,
    MoEMLP,
    create_ep_mesh,
    moe_shardings,
    set_expert_mesh,
)

E = 64


@pytest.fixture(autouse=True)
def _no_ambient_mesh():
    """Each test opts into a mesh explicitly (the module-level default is
    process state, like layers.set_tp_qkv)."""
    set_expert_mesh(None)
    yield
    set_expert_mesh(None)


def _dense_and_moe(n_experts, top_k, capacity_factor, seed=0):
    """A dense MLPBlock and a MoEMLP whose experts all equal the dense one."""
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(4, 10, E)).astype(np.float32))
    dense = MLPBlock(E)
    dparams = jax.jit(dense.init)(jax.random.PRNGKey(0), x)["params"]
    moe = MoEMLP(E, n_experts, router_top_k=top_k,
                 capacity_factor=capacity_factor)
    mparams = dict(jax.jit(moe.init)(jax.random.PRNGKey(1), x)["params"])
    tile = lambda a: jnp.broadcast_to(a[None], (n_experts,) + a.shape)
    mparams["w_fc"] = tile(dparams["c_fc"]["kernel"])
    mparams["bias_fc"] = tile(dparams["c_fc"]["bias"])
    mparams["w_proj"] = tile(dparams["c_proj"]["kernel"])
    mparams["bias_proj"] = tile(dparams["c_proj"]["bias"])
    return dense, dparams, moe, mparams, x


@pytest.mark.parametrize("top_k", [1, 2])
def test_identical_experts_match_dense(top_k):
    """Renormalized gates sum to 1, so with every expert equal to the dense
    MLP the MoE output IS the dense output (capacity ample -> no drops)."""
    dense, dparams, moe, mparams, x = _dense_and_moe(
        4, top_k, capacity_factor=4.0
    )
    want = dense.apply({"params": dparams}, x)
    got = moe.apply({"params": mparams}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_routing_is_top1_expert():
    """With an unambiguous router, each token's output is exactly its
    selected expert's FFN (k=1 renormalized gate = 1)."""
    rng = np.random.default_rng(1)
    moe = MoEMLP(E, 2, router_top_k=1, capacity_factor=2.0)
    x = np.zeros((8, E), np.float32)
    x[:, 1:] = rng.normal(size=(8, E - 1)) * 0.1
    x[:, 0] = np.where(np.arange(8) % 2 == 0, 5.0, -5.0)  # routing feature
    x = jnp.asarray(x)
    params = dict(jax.jit(moe.init)(jax.random.PRNGKey(0), x)["params"])
    router = np.zeros((E, 2), np.float32)
    router[0, 0] = 1.0  # +feature -> expert 0
    router[0, 1] = -1.0  # -feature -> expert 1
    params["router"] = jnp.asarray(router)

    out = np.asarray(moe.apply({"params": params}, x))

    def expert(i, xt):
        h = xt @ np.asarray(params["w_fc"][i]) + np.asarray(params["bias_fc"][i])
        h = h * (1.0 / (1.0 + np.exp(-1.702 * h)))
        return h @ np.asarray(params["w_proj"][i]) + np.asarray(
            params["bias_proj"][i]
        )

    xt = np.asarray(x)
    for t in range(8):
        want = expert(0 if t % 2 == 0 else 1, xt[t])
        np.testing.assert_allclose(out[t], want, atol=2e-5)


def test_capacity_overflow_drops_tokens():
    """All tokens routed to expert 0 with capacity 2: the first two tokens
    (queue order) compute, the rest get a ZERO MoE output (the residual
    block passes them through unchanged — standard Switch behavior)."""
    moe = MoEMLP(E, 2, router_top_k=1, capacity_factor=0.5)  # cap = 2 of 8
    rng = np.random.default_rng(2)
    x = np.zeros((8, E), np.float32)
    x[:, 1:] = rng.normal(size=(8, E - 1)) * 0.1
    x[:, 0] = 5.0  # everyone picks expert 0
    x = jnp.asarray(x)
    params = dict(jax.jit(moe.init)(jax.random.PRNGKey(0), x)["params"])
    router = np.zeros((E, 2), np.float32)
    router[0, 0] = 1.0
    params["router"] = jnp.asarray(router)

    out = np.asarray(moe.apply({"params": params}, x))
    assert np.abs(out[:2]).max() > 0
    np.testing.assert_allclose(out[2:], 0.0, atol=0)


def test_ep_sharding_matches_single_device():
    """dp2×ep4 mesh: expert-stacked params sharded over the expert axis,
    tokens over data — numerics identical to the unsharded module."""
    dense, dparams, moe_plain, mparams, x = _dense_and_moe(
        4, 2, capacity_factor=4.0, seed=3
    )
    want = np.asarray(moe_plain.apply({"params": mparams}, x))

    mesh = create_ep_mesh(2, 4)  # also sets the process default mesh
    moe = MoEMLP(E, 4, router_top_k=2, capacity_factor=4.0, mesh=mesh)
    sharded = jax.device_put(mparams, moe_shardings(mparams, mesh))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    got = jax.jit(lambda p, x: moe.apply({"params": p}, x))(sharded, xs)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)

    # the expert stacks really are distributed: one shard holds 1 of 4 experts
    w = sharded["w_fc"]
    assert w.sharding.spec == P(EXPERT_AXIS)
    assert w.addressable_shards[0].data.shape[0] == 1


def test_moe_gradients_flow():
    """Router and every expert that received tokens get nonzero grads."""
    moe = MoEMLP(E, 2, router_top_k=2, capacity_factor=2.0)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(16, E)).astype(np.float32))
    params = jax.jit(moe.init)(jax.random.PRNGKey(0), x)["params"]

    def loss(p):
        y = moe.apply({"params": p}, x)
        return jnp.sum(y * y)

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["router"]).max()) > 0
    assert float(jnp.abs(g["w_fc"]).max()) > 0
    assert float(jnp.abs(g["w_proj"]).max()) > 0


def test_transformer_moe_flag_param_tree():
    """moe_experts=0 keeps the exact dense tree (checkpoint compatibility);
    moe_experts>0 swaps mlp -> mlp_moe and still runs forward."""
    x = jnp.zeros((2, 5, E))
    dense_tree = jax.jit(Transformer(E, 1, 4).init)(
        jax.random.PRNGKey(0), x
    )["params"]
    assert "mlp" in dense_tree["resblocks_0"]
    assert "mlp_moe" not in dense_tree["resblocks_0"]

    moe_mod = Transformer(E, 1, 4, moe_experts=2)
    moe_tree = jax.jit(moe_mod.init)(jax.random.PRNGKey(0), x)["params"]
    assert "mlp_moe" in moe_tree["resblocks_0"]
    assert "mlp" not in moe_tree["resblocks_0"]
    out = moe_mod.apply({"params": moe_tree}, x)
    assert out.shape == x.shape and bool(jnp.all(jnp.isfinite(out)))


def test_cam_moe_zero_init_is_average():
    """The MoE adapter preserves the reference's starts-as-average property:
    zero_init_cam_params zeroes every expert's output projection, so the
    adapter transformer is the identity (test_cam.py's dense oracle)."""
    from vtc_tpu.models.cam import ContextAdapter, zero_init_cam_params

    dim = 32
    cam = ContextAdapter(feature_dim=dim, n_layers=2, n_heads=4,
                         moe_experts=2)
    rng = np.random.default_rng(5)
    main = rng.normal(size=(4, dim)).astype(np.float32)
    aux = rng.normal(size=(3, 4, dim)).astype(np.float32)
    params = cam.init(
        {"params": jax.random.PRNGKey(0),
         "adapter_skip": jax.random.PRNGKey(1)},
        jnp.asarray(main), jnp.asarray(aux),
    )["params"]
    params = zero_init_cam_params(dict(params), 2, True)

    out = cam.apply({"params": params}, jnp.asarray(main), jnp.asarray(aux))

    stack = np.concatenate([main[None], aux], axis=0)
    stack = stack / np.linalg.norm(stack, axis=-1, keepdims=True)
    res = np.mean(stack, axis=0)
    res = res / np.linalg.norm(res, axis=-1, keepdims=True)
    mainn = main / np.linalg.norm(main, axis=-1, keepdims=True)
    expected = mainn + res
    expected = expected / np.linalg.norm(expected, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_moe_validation():
    x = jnp.zeros((2, E))
    with pytest.raises(ValueError, match="router_top_k"):
        MoEMLP(E, 2, router_top_k=3).init(jax.random.PRNGKey(0), x)
    with pytest.raises(ValueError, match="devices"):
        create_ep_mesh(8, 2)


@pytest.mark.slow
def test_moe_cam_learns_to_use_comments():
    """The quality-slice mechanism test (test_quality_slice.py) with a
    mixture-of-experts adapter: frozen towers, adapter-only training must
    still lift comment-conditioned retrieval far above the no-comment
    baseline — i.e. the MoE adapter is trainable end-to-end through the
    one-hot dispatch (router + experts get gradient)."""
    from vtc_tpu.data import tokenizer as tk
    from vtc_tpu.models import create_model
    from vtc_tpu.ops.losses import clip_loss
    from vtc_tpu.ops.retrieval import recall_at_k
    from vtc_tpu.training.optim import build_optimizer
    from vtc_tpu.training.trainer import TrainState, make_step_fns

    n = 48
    rng = np.random.default_rng(0)
    letters = list("abcdefghijklmnopqrstuvwxyz")

    module, variables = create_model(
        "PretrainedCLIP_finaltf", model_type="test-tiny", freeze="all",
        random_skip_adapter=False, seed=0, moe_experts=2, moe_top_k=2,
    )
    assert "mlp_moe" in variables["params"]["cam"]["final_transformer"][
        "resblocks_0"
    ]

    titles = [f"video {i // 2}" for i in range(n)]  # ambiguous
    comments = [["".join(rng.choice(letters, 12)), ""] for _ in range(n)]
    title_tok = tk.tokenize(titles)
    comment_tok = np.stack([tk.tokenize(c) for c in comments])
    first_comments = tk.tokenize([c[0] for c in comments])
    vis = np.asarray(
        module.apply(
            variables,
            jnp.asarray(first_comments),
            method=lambda m, t: m.clip.encode_text(t),
        )
    )
    vis = (vis / np.linalg.norm(vis, axis=-1, keepdims=True)).astype(np.float32)
    data = (jnp.asarray(vis), jnp.asarray(title_tok), jnp.asarray(comment_tok))

    tx = build_optimizer(
        variables["params"], {"type": "Adam", "args": {"lr": 0.02}}, None, 1,
        branch_to_freeze="all",
    )
    train_step, eval_step = make_step_fns(module, clip_loss, tx, donate=False)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        opt_state=tx.init(variables["params"]), batch_stats={},
    )
    key = jax.random.PRNGKey(0)
    losses = []
    for s in range(80):
        state, loss, _ = train_step(state, data, {}, jax.random.fold_in(key, s))
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 1.0

    # the experts really moved (zero-init w_proj grew nonzero)
    blk = state.params["cam"]["final_transformer"]["resblocks_0"]
    assert float(jnp.abs(blk["mlp_moe"]["w_proj"]).max()) > 0

    _, out_cam = eval_step(state, data, {})
    _, out_skip = eval_step(state, data, {}, branch_override="skip")
    r1_cam = dict(recall_at_k(np.asarray(out_cam[0]), np.asarray(out_cam[1]), [1]))[1]
    r1_skip = dict(recall_at_k(np.asarray(out_skip[0]), np.asarray(out_skip[1]), [1]))[1]
    assert r1_skip <= 0.2, r1_skip
    assert r1_cam >= r1_skip + 0.4, (r1_cam, r1_skip)


def test_expert_init_scale_matches_dense():
    """Per-expert kernels must start at the dense MLP's lecun scale — the
    expert axis is a batch axis, not receptive field (a plain stacked-shape
    lecun_normal would shrink every expert by sqrt(n_experts))."""
    x = jnp.zeros((4, E))
    mparams = jax.jit(MoEMLP(E, 4).init)(jax.random.PRNGKey(0), x)["params"]
    dparams = jax.jit(MLPBlock(E).init)(
        jax.random.PRNGKey(0), jnp.zeros((4, 1, E))
    )["params"]
    moe_std = float(jnp.std(mparams["w_fc"]))
    dense_std = float(jnp.std(dparams["c_fc"]["kernel"]))
    assert abs(moe_std - dense_std) / dense_std < 0.1, (moe_std, dense_std)


def test_expert_biases_are_nodecay():
    """bias_fc/bias_proj must land in the optimizer's no-weight-decay group
    like every other bias (the reference's decay split, train.py:108)."""
    from vtc_tpu.training.optim import is_nodecay

    assert is_nodecay("cam/final_transformer/resblocks_0/mlp_moe/bias_fc")
    assert is_nodecay("cam/final_transformer/resblocks_0/mlp_moe/bias_proj")
    assert not is_nodecay("cam/final_transformer/resblocks_0/mlp_moe/w_fc")
    assert not is_nodecay("cam/final_transformer/resblocks_0/mlp_moe/router")


def test_load_balance_aux_loss():
    """The sown Switch aux loss is ~1 at perfect balance and ~n_experts on
    router collapse — the signal that keeps capacity drops from silently
    degrading a trained MoE adapter."""
    rng = np.random.default_rng(6)
    moe = MoEMLP(E, 2, router_top_k=1, capacity_factor=2.0)
    x = np.zeros((16, E), np.float32)
    x[:, 1:] = rng.normal(size=(16, E - 1)) * 0.1
    x[:, 0] = np.where(np.arange(16) % 2 == 0, 8.0, -8.0)  # perfectly split
    params = dict(jax.jit(moe.init)(jax.random.PRNGKey(0), x)["params"])
    router = np.zeros((E, 2), np.float32)
    router[0, 0], router[0, 1] = 1.0, -1.0
    params["router"] = jnp.asarray(router)

    _, var = moe.apply({"params": params}, jnp.asarray(x), mutable=["losses"])
    balanced = float(jax.tree_util.tree_leaves(var["losses"])[0])
    assert abs(balanced - 1.0) < 0.05, balanced

    x[:, 0] = 8.0  # collapse: everyone picks expert 0
    _, var = moe.apply({"params": params}, jnp.asarray(x), mutable=["losses"])
    collapsed = float(jax.tree_util.tree_leaves(var["losses"])[0])
    assert collapsed > 1.8, collapsed


def test_train_step_adds_aux_loss():
    """make_step_fns folds the sown MoE aux loss into the training loss:
    the router gets gradient from balance pressure even while the zero-init
    experts still output nothing."""
    from vtc_tpu.data import tokenizer as tk
    from vtc_tpu.models import create_model
    from vtc_tpu.ops.losses import clip_loss
    from vtc_tpu.training.optim import build_optimizer
    from vtc_tpu.training.trainer import TrainState, make_step_fns

    module, variables = create_model(
        "PretrainedCLIP_finaltf", model_type="test-tiny", freeze="all",
        random_skip_adapter=False, seed=0, moe_experts=2,
    )
    rng = np.random.default_rng(7)
    vis = rng.normal(size=(8, 32)).astype(np.float32)  # feature passthrough
    title = tk.tokenize([f"title {i}" for i in range(8)])
    comments = np.stack([tk.tokenize([f"comment {i}", ""]) for i in range(8)])
    data = (jnp.asarray(vis), jnp.asarray(title), jnp.asarray(comments))

    tx = build_optimizer(
        variables["params"], {"type": "Adam", "args": {"lr": 0.01}}, None, 1,
        branch_to_freeze="all",
    )
    train_step, eval_step = make_step_fns(module, clip_loss, tx, donate=False)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        opt_state=tx.init(variables["params"]), batch_stats={},
    )
    new_state, loss, out = train_step(state, data, {}, jax.random.PRNGKey(0))
    eval_loss, _ = eval_step(state, data, {})
    # train loss = clip loss + 0.01 * aux (aux in [1, 2] here)
    diff = float(loss) - float(eval_loss)
    assert 0.005 < diff < 0.025, diff
    # the router moved on step 1 (balance pressure), not only the experts
    old = state.params["cam"]["final_transformer"]["resblocks_0"]["mlp_moe"]
    new = new_state.params["cam"]["final_transformer"]["resblocks_0"]["mlp_moe"]
    assert not np.allclose(np.asarray(new["router"]), np.asarray(old["router"]))
